"""Source mixing — quota sampling to hit a target per-source token share.

The data-mixing step of a pretraining pipeline: given target weights per
source and the observed per-source token mass, compute a keep-rate per
source (capped at 1) and sample documents deterministically so the kept
corpus approaches the target mix.

All arithmetic is INTEGER (basis points + bigint floor division) and the
sampling hash is a portable LCG on doc_id, so the DuckDB twin
(oracle/sql_data.source_mix) agrees bit-for-bit — no float drift, no RNG.

    w_s       = target weight of source s        (here: N % 5 + 1 derived
                deterministically from the source name, standing in for a
                config table of mixture weights)
    rate_bp_s = min(10000, (10000 * w_s * total_toks) div (W * toks_s))
    keep doc  <=> ((doc_id * 1103515245 + 12345) mod 2^31) mod 10000 < rate_bp_s

Plan shape at 100 TB: one agg for per-source token mass (tiny result), the
rate table stays in-plan and BROADCASTS back onto the doc stream (no
driver collect), the filter is pure codegen. Token mass = word count
(size of the portable word split), pruned to (doc_id, source, text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spatialflink_spark.functions import tokens as T

LCG_A = 1103515245
LCG_C = 12345
BP = 10000


def source_mix_sample(docs: DataFrame) -> DataFrame:
    """Per-source kept-document stats after quota sampling. Output:
    source, rate_bp, n_kept, tok_kept."""
    from spatialflink_spark.session import spread

    t = spread(docs).select(
        "doc_id",
        "source",
        F.expr(f"size({T.spark_words('text')})").alias("n_w"),
        F.expr("cast(substr(source, 4) as int) % 5 + 1").alias("w"),
    )
    per_src = t.groupBy("source", "w").agg(
        F.sum(F.col("n_w").cast("bigint")).alias("src_toks")
    )
    totals = per_src.agg(
        F.sum("src_toks").alias("total_toks"),
        # NB: not "W" — Spark resolves case-insensitively, colliding with "w"
        F.sum(F.col("w").cast("bigint")).alias("w_sum"),
    )
    rates = per_src.crossJoin(F.broadcast(totals)).select(
        "source",
        F.expr(
            f"cast(least({BP}, ({BP} * w * total_toks) div (w_sum * src_toks)) as int)"
        ).alias("rate_bp"),
    )
    kept = t.join(F.broadcast(rates), "source").where(
        F.expr(f"((doc_id * {LCG_A} + {LCG_C}) % 2147483648) % {BP}")
        < F.col("rate_bp")
    )
    return kept.groupBy("source", "rate_bp").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("n_w").cast("bigint")).alias("tok_kept"),
    )
