"""Sequence packing — assign token sequences to fixed-capacity context bins.

The training-data op every pretraining pipeline runs after curation:
concatenate the curated sequence stream in a deterministic order and cut it
into fixed-size context windows ("packing"). Semantics here are the
concat-and-cut form used for GPT-style pretraining (documents straddle
window boundaries; a sequence is attributed to the bin where it STARTS):

    order within a source: (ts_s, doc_id, seq_no)   -- deterministic
    cum_before = sum of n_tok over all prior sequences of the source
    bin_id     = floor(cum_before / capacity)
    bin_offset = cum_before % capacity              -- where the seq starts

Entirely built-in expressions: one window cumsum + one groupBy — the whole
op is two shuffles on `source`, no UDFs, full codegen.

Scale notes (100 TB): the running sum is per-source SEQUENTIAL by
definition (packing order is part of the output contract), so a single
giant source key serializes its own cumsum — the same hot-key shape the
engine's salted partitioner handles elsewhere. The production cut for
10^12 sequences: pack per (source, time-bucket) so each window-function
partition is bounded, exactly how this module's `bucket_s` knob shards the
order key; bins then number independently per bucket, which real pipelines
accept (packing is per-shard anyway). Catalyst pushes the column pruning to
the scan (only n_tok + keys read; token arrays never move).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_CAPACITY = 2048


def pack_bins(
    seq: DataFrame, capacity: int = DEFAULT_CAPACITY, bucket_s: int | None = None
) -> DataFrame:
    """Per-sequence bin assignment: (source [, bucket], bin_id, bin_offset)
    for every (doc_id, seq_no). `bucket_s` shards the packing order into
    time buckets so no window partition is unbounded (the 10^12-row form);
    None = one global order per source (exact concat-and-cut)."""
    keys = ["source"] + (["bucket"] if bucket_s else [])
    s = seq
    if bucket_s:
        s = s.withColumn(
            "bucket", F.expr(f"cast(floor(ts_s / {bucket_s}) as bigint)")
        )
    w = (
        Window.partitionBy(*keys)
        .orderBy("ts_s", "doc_id", "seq_no")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(F.col("n_tok").cast("bigint")).over(w), F.lit(0))
    return s.select(
        *keys,
        "doc_id",
        "seq_no",
        "n_tok",
        cum.alias("_cum_before"),
    ).select(
        *keys,
        "doc_id",
        "seq_no",
        "n_tok",
        F.expr(f"cast(floor(_cum_before / {capacity}) as bigint)").alias("bin_id"),
        F.expr(f"cast(_cum_before % {capacity} as int)").alias("bin_offset"),
    )


def pack_stats(
    seq: DataFrame, capacity: int = DEFAULT_CAPACITY
) -> DataFrame:
    """Per-bin packing stats: how many sequences start in each context
    window and how many tokens they contribute. Output: source, bin_id,
    n_seqs, tok_sum."""
    bins = pack_bins(seq, capacity)
    return bins.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum(F.col("n_tok").cast("bigint")).alias("tok_sum"),
    )
