"""Corpus selection & training-export layout operators — the step between
curation (dedup/decontaminate/mix) and the training run (no single reference
analog; part of the training-data operator family like operators/corpus.py):

- quality_topk_per_source: "keep the best k documents per source" selection,
  computed with the same two-stage cut the batch-ANN family uses
  (similarity._batch_topk_two_stage's shape) so no single task ever sorts a
  whole source.
- shard_assign: a deterministic, content-independent global shuffle into
  training shards — hash order instead of a global sort, the way a 100 TB
  export actually randomizes sample order.

Both pure built-in column expressions with bit-identical DuckDB twins
(oracle/sql_data.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spatialflink_spark.operators.dedup import wide_hash_chain

SEL_K = 10
SEL_BUCKETS = 16
SHARD_SEED = 982451653  # distinct from WIDE_SEED_H1/H2; same vetted mixer
N_SHARDS = 8


def quality_topk_per_source(
    docs: DataFrame, k: int = SEL_K, buckets: int = SEL_BUCKETS
) -> DataFrame:
    """Top-k documents per source by quality score (ties: smaller doc_id) —
    the per-domain "keep the best" curation selection.

    Two-stage cut, answer-identical to one row_number window per source:
    stage 1 ranks within (source, doc_id % buckets) — every final top-k row
    is necessarily inside its own bucket's top-k — so the per-key sorted
    state is ~1/buckets of a source, never a whole source in one task (a
    single web-crawl source can be most of a 100 TB corpus; a one-window
    plan would put all of it through one sort partition).
    Output: source, rank, doc_id, quality."""
    from spatialflink_spark.operators.text import with_quality
    from spatialflink_spark.session import spread

    q = with_quality(spread(docs).select("doc_id", "source", "text")).select(
        "source", "doc_id", "quality"
    )
    s1 = q.withColumn("_b", F.expr(f"pmod(doc_id, {buckets})"))
    w1 = Window.partitionBy("source", "_b").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    survivors = (
        s1.withColumn("_r", F.row_number().over(w1))
        .where(F.col("_r") <= k)
        .drop("_r", "_b")
    )
    w2 = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w2).cast("int"))
        .where(F.col("rank") <= k)
        .select("source", "rank", "doc_id", "quality")
    )


def shard_assign(docs: DataFrame, n_shards: int = N_SHARDS) -> DataFrame:
    """Deterministic training-export layout: every doc gets a pseudo-random
    shard and a stable position inside it, derived from the property-tested
    xorshift-multiply hash (dedup.wide_hash_chain) of doc_id — a
    reproducible global shuffle with NO global sort. The only ordering work
    is per-shard (partition-local), which a sharded export pays anyway to
    write each shard's records in order; re-running the op on the same
    corpus reproduces the exact same sample order, the property a training
    restart needs.
    Output: doc_id, shard, pos."""
    from spatialflink_spark.session import spread

    h = f"element_at({wide_hash_chain('array(doc_id)', SHARD_SEED, 'spark')}, 1)"
    d = spread(docs).select("doc_id", F.expr(h).alias("_h"))
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col("doc_id").asc())
    return (
        d.withColumn("shard", F.expr(f"cast(_h % {n_shards} as int)"))
        .withColumn("pos", F.row_number().over(w).cast("int"))
        .select("doc_id", "shard", "pos")
    )
