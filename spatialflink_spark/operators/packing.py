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


def pack_emit(
    seq: DataFrame, capacity: int = DEFAULT_CAPACITY, bucket_s: int | None = None
) -> DataFrame:
    """Emit the PACKED BINS themselves — the production output of packing
    (pack_stats only grades stats about the assignment): each context bin's
    token payload, including the boundary-straddling splits of sequences
    that cross a bin edge.

    A sequence starting at offset o in bin b with n tokens contributes a
    slice to every bin it overlaps: for span j, bin b+j receives its tokens
    [max(0, j*cap - o), min(n, (j+1)*cap - o)) placed at in-bin position
    o + st - j*cap (= o for j=0, else 0). Bins are graded on a
    position-weighted checksum instead of the raw 2048-token arrays:
    chk += (pos_in_bin + i + 1) * (token + 1), summed over every token of
    every contributing slice — order-independent across slices (each token
    has a unique in-bin position) so it aggregates with a plain sum, yet
    sensitive to any misplacement or misordering.

    All codegen: the span explode fans out over a tiny int range (almost
    always length 1), slices/checksums are array expressions, then one
    groupBy. `seq` should be the persisted sequences table — exploding over
    a lazily-derived tokens column would re-run the derivation per output
    row (the CLAUDE.md generate-amplification trap).

    `bucket_s` is the same 10^12-row shard knob as pack_bins: pack per
    (source, time bucket) so no window partition is unbounded; bins number
    independently per bucket (real pipelines pack per shard anyway), and
    the output carries the bucket column. None = exact global concat-and-cut
    (equivalence when all rows share one bucket is tested).

    Output: [bucket,] source, bin_id, n_parts, n_tok_bin, tok_checksum.
    """
    cap = capacity
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
    placed = s.select(
        *keys, "doc_id", "seq_no", "n_tok", "tokens", cum.alias("_cb")
    ).where(F.col("n_tok") > 0).select(
        *keys,
        "tokens",
        "n_tok",
        F.expr(f"cast(floor(_cb / {cap}) as bigint)").alias("_b0"),
        F.expr(f"cast(_cb % {cap} as int)").alias("_o"),
    )
    spans = placed.select(
        *keys,
        "tokens",
        "n_tok",
        "_b0",
        "_o",
        F.explode(
            F.expr(f"sequence(0, cast(floor((_o + n_tok - 1) / {cap}) as int))")
        ).alias("_j"),
    )
    sliced = spans.select(
        *keys,
        (F.col("_b0") + F.col("_j")).alias("bin_id"),
        F.expr(f"greatest(0, _j * {cap} - _o)").alias("_st"),
        F.expr(f"least(n_tok, (_j + 1) * {cap} - _o) - greatest(0, _j * {cap} - _o)").alias("_ln"),
        F.expr(f"_o + greatest(0, _j * {cap} - _o) - _j * {cap}").alias("_pos0"),
        "tokens",
    )
    part = sliced.select(
        *keys,
        "bin_id",
        "_ln",
        F.expr(
            "aggregate(transform(slice(tokens, _st + 1, _ln), "
            "(t, i) -> (cast(_pos0 as bigint) + i + 1) * (cast(t as bigint) + 1)), "
            "cast(0 as bigint), (s, v) -> s + v)"
        ).alias("_chk"),
    )
    return part.groupBy(*keys, "bin_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_parts"),
        F.sum(F.col("_ln").cast("bigint")).alias("n_tok_bin"),
        F.sum("_chk").alias("tok_checksum"),
    )
