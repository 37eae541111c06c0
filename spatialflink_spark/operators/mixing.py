"""Source mixing — quota sampling to hit a target per-source token share.

The data-mixing step of a pretraining pipeline: given target weights per
source and the observed per-source token mass, compute a keep-rate per
source (capped at 1) and sample documents deterministically so the kept
corpus approaches the target mix.

All arithmetic is INTEGER (basis points + bigint floor division) and the
sampling hash is a portable LCG on doc_id, so the DuckDB twin
(oracle/sql_data.source_mix) agrees bit-for-bit — no float drift, no RNG.

    w_s       = target weight of source s        (here: N % 5 + 1 derived
                deterministically from the source name via try_cast with
                default 1, standing in for a config table of mixture
                weights)
    rate_bp_s = min(10000, (10000 * w_s * total_toks) div (W * toks_s)),
                or 10000 when toks_s = 0 (zero mass costs no quota)
    keep doc  <=> (((doc_id mod 2^31) * 1103515245 + 12345) mod 2^31)
                  mod 10000 < rate_bp_s

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

# try_cast + default weight 1: source names outside 'src<digits>' must not
# kill the job under Spark 4 ANSI (CLAUDE.md rule)
WEIGHT_EXPR = "coalesce(try_cast(substr(source, 4) as int) % 5 + 1, 1)"

# doc_id folded mod 2^31 BEFORE the multiply: bigint doc_ids beyond ~8.36e9
# would overflow doc_id * LCG_A under ANSI at the claimed 10^12-row envelope;
# identical results for doc_id < 2^31
LCG_KEEP_EXPR = (
    f"(((doc_id % 2147483648) * {LCG_A} + {LCG_C}) % 2147483648) % {BP}"
)


def quota_rates(t: DataFrame) -> DataFrame:
    """(source, rate_bp) from a per-row mass table t(source, n_w, w) —
    the shared rate kernel of the batch and streaming mixing faces."""
    per_src = t.groupBy("source", "w").agg(
        F.sum(F.col("n_w").cast("bigint")).alias("src_toks")
    )
    totals = per_src.agg(
        F.sum("src_toks").alias("total_toks"),
        # NB: not "W" — Spark resolves case-insensitively, colliding with "w"
        F.sum(F.col("w").cast("bigint")).alias("w_sum"),
    )
    # overflow headroom for the 10^12-row envelope: 10000 * w * total_toks
    # exceeds bigint past ~1.8e14 tokens. Token masses are expressed in a
    # deterministic coarser unit once totals get large (unit chosen so the
    # numerator fits with 100x slack); exact at any realistic test scale
    # (unit = 1), bounded <0.1% rate error at exatoken scale — identical
    # arithmetic in the DuckDB twin.
    unit = (
        f"cast(greatest(1, total_toks div {2**43}) as bigint)"
    )
    return per_src.crossJoin(F.broadcast(totals)).select(
        "source",
        # src_toks = 0 (a source with no tokenizable words) keeps everything:
        # zero mass costs no quota, and ANSI would otherwise DIVIDE_BY_ZERO
        F.expr(
            f"cast(case when src_toks div {unit} = 0 then {BP} else "
            f"least({BP}, ({BP} * w * (total_toks div {unit})) "
            f"div (w_sum * (src_toks div {unit}))) "
            "end as int)"
        ).alias("rate_bp"),
    )


def mix_rates_snapshot(seq_snapshot: DataFrame) -> DataFrame:
    """(source, rate_bp) for the STREAMING mixing face: quota rates computed
    over a static (or periodically refreshed) snapshot of the sequence
    stream, token mass = n_tok. The caller materializes the tiny result
    (localCheckpoint) before broadcasting it onto the live stream — a lazy
    static side of a stream-static join re-derives per micro-batch."""
    t = seq_snapshot.select(
        "source",
        F.col("n_tok").alias("n_w"),
        F.expr(WEIGHT_EXPR).alias("w"),
    )
    return quota_rates(t)


def source_mix_sample(docs: DataFrame) -> DataFrame:
    """Per-source kept-document stats after quota sampling. Output:
    source, rate_bp, n_kept, tok_kept."""
    from spatialflink_spark.session import spread

    # t feeds BOTH the rate computation and the sampling filter; without a
    # materialization point the word-split scan runs twice (the same
    # branch-reuse recomputation decontaminate materializes away). Only 4
    # small columns are stored.
    t = (
        spread(docs)
        .select(
            "doc_id",
            "source",
            F.expr(f"size({T.spark_words('text')})").alias("n_w"),
            F.expr(WEIGHT_EXPR).alias("w"),
        )
        .localCheckpoint(eager=False)
    )
    rates = quota_rates(t)
    kept = t.join(F.broadcast(rates), "source").where(
        F.expr(LCG_KEEP_EXPR) < F.col("rate_bp")
    )
    return kept.groupBy("source", "rate_bp").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("n_w").cast("bigint")).alias("tok_kept"),
    )


# tau = 0.5 temperature sampling: keep_s ∝ 1/sqrt(tok_s) so kept token mass
# ∝ sqrt(tok_s) — i.e. the sampled share q_s ∝ p_s^0.5, the multilingual
# rebalancing rule of mT5/XLM-R. rate_bp = floor(sqrt(SCALE * min/toks)):
# the DIV runs first so the sqrt argument is <= SCALE = 1e8 (exact in a
# double), sqrt is IEEE-correctly-rounded in both engines (the same
# pinning length_quality_corr relies on), and the smallest source keeps
# 100%. SCALE * min_toks needs decimal(38) past ~9e10 tokens in the
# smallest source — same documented upgrade as quota_rates' numerator.
TEMP_SCALE = 100_000_000


def temperature_rates(t: DataFrame) -> DataFrame:
    """(source, rate_bp) for tau=0.5 temperature sampling over a per-row
    mass table t(source, n_w). Zero-mass sources keep everything (zero
    mass costs no quota — and ANSI would otherwise DIVIDE_BY_ZERO)."""
    per_src = t.groupBy("source").agg(
        F.sum(F.col("n_w").cast("bigint")).alias("src_toks")
    )
    mn = per_src.where(F.col("src_toks") > 0).agg(
        F.min("src_toks").alias("min_toks")
    )
    return per_src.crossJoin(F.broadcast(mn)).select(
        "source",
        F.expr(
            f"cast(case when src_toks = 0 then {BP} else "
            f"least({BP}, cast(floor(sqrt(cast("
            f"({TEMP_SCALE} * min_toks) div src_toks as double))) as int)) "
            "end as int)"
        ).alias("rate_bp"),
    )


def temperature_mix_sample(docs: DataFrame) -> DataFrame:
    """Per-source kept-document stats after tau=0.5 temperature sampling —
    the same deterministic LCG keep-filter as source_mix_sample, rates
    from temperature_rates. Output: source, rate_bp, n_kept, tok_kept."""
    from spatialflink_spark.session import spread

    t = (
        spread(docs)
        .select(
            "doc_id",
            "source",
            F.expr(f"size({T.spark_words('text')})").alias("n_w"),
        )
        .localCheckpoint(eager=False)
    )
    rates = temperature_rates(t)
    kept = t.join(F.broadcast(rates), "source").where(
        F.expr(LCG_KEEP_EXPR) < F.col("rate_bp")
    )
    return kept.groupBy("source", "rate_bp").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("n_w").cast("bigint")).alias("tok_kept"),
    )


def temperature_rates_snapshot(seq_snapshot: DataFrame) -> DataFrame:
    """(source, rate_bp) for a STREAMING temperature-mixing face: tau=0.5
    rates over a static (or periodically refreshed) snapshot of the
    sequence stream, token mass = n_tok — the temperature analog of
    mix_rates_snapshot, pluggable into the same stream-static broadcast
    join the mixing pipeline uses (streaming/pipeline.py). The caller
    materializes the tiny result before broadcasting it onto the live
    stream."""
    t = seq_snapshot.select("source", F.col("n_tok").alias("n_w"))
    return temperature_rates(t)
