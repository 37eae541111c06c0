"""Continuous-processing (per-record) RT queries — the reference's
per-element trigger, for real.

GeoFlink's RealTime query mode fires its window trigger on EVERY element
(`realTimeWindowTrigger`, tJoin/TJoinQuery.java:215-260; RT dispatch
PointPointRangeQuery.java:44-107): each arriving point is evaluated and
emitted immediately, no batching. Spark's micro-batch mode can only
approximate that (small update-mode triggers — SURVEY §4); its CONTINUOUS
processing mode (`trigger(continuous=...)`) is the exact analog: long-running
per-partition tasks process records one at a time with ~millisecond latency,
checkpointing by epoch.

Continuous mode's plan restrictions are severe — Project and Filter only (no
joins, no Generate/explode, no aggregation, no LogicalRDD). The RT range
query fits: the static query set is inlined as an ARRAY LITERAL and evaluated
with higher-order functions (`filter`/`transform` are projections), so the
whole per-record pipeline is one codegen'd map over the stream. Matches per
record are an array column instead of exploded rows (explode is a Generate —
unsupported); downstream consumers explode micro-batch-side if they need
row-per-match.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spatialflink_spark.config import QueryPoint, VOCAB_SIZE


def synthetic_rate_sequences(
    spark: SparkSession, rows_per_second: int = 500, num_partitions: int = 2
) -> DataFrame:
    """SyntheticGpsSource RT analog (sncb/tests/SyntheticGpsSource.java:8-57,
    rate-limited seeded generator): the rate source's (timestamp, value)
    mapped deterministically to the canonical sequence schema with
    projection-only expressions — valid in continuous mode."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .option("numPartitions", str(num_partitions))
        .load()
    )
    return rate.select(
        F.col("timestamp").alias("event_ts"),
        F.col("value").alias("doc_id"),
        F.expr("cast(value % 3 as int)").alias("seq_no"),
        F.expr(f"cast(1 + (value * 37) % {min(VOCAB_SIZE, 127)} as int)").alias(
            "n_tok"
        ),
        F.expr("concat('src_', cast(value % 4 as string))").alias("source"),
    )


def continuous_range_alerts(
    stream: DataFrame, qs: Iterable[QueryPoint]
) -> DataFrame:
    """Per-record RT range query: emit each arriving row the instant it
    matches >= 1 query, with the matching query ids as an array column.
    Project/Filter only — runs under trigger(continuous=...)."""
    qlits = ", ".join(
        f"named_struct('q_id', '{q.q_id}', 'q_n_tok', {q.q_n_tok}, "
        f"'radius', {q.radius})"
        for q in qs
    )
    matched = stream.select(
        "event_ts",
        "doc_id",
        "seq_no",
        "n_tok",
        "source",
        F.expr(
            f"transform(filter(array({qlits}), "
            "q -> abs(n_tok - q.q_n_tok) <= q.radius), q -> q.q_id)"
        ).alias("matched_q_ids"),
    )
    return matched.where(F.expr("size(matched_q_ids) > 0"))


def continuous_join_alerts(
    stream: DataFrame, others: list[tuple[int, int]], radius: int
) -> DataFrame:
    """Per-record RT join — the reference's per-element join trigger
    (tJoin/TJoinQuery.java:215-260: every arriving point immediately joins
    the other stream's registered objects and emits its pairs). Continuous
    mode forbids joins, but the small side is exactly the broadcast state
    the reference keeps per cell — inlined as an ARRAY LITERAL of
    (o_id, o_n_tok) structs, the whole per-record pipeline is Project/Filter
    (higher-order filter/transform) and runs under trigger(continuous=...).

    Emits each arriving row the instant it has >= 1 partner within `radius`
    (id-skip like the self-join), partner ids as an array column."""
    olits = ", ".join(
        f"named_struct('o_id', cast({oid} as bigint), 'o_n_tok', {ont})"
        for oid, ont in others
    )
    # empty partner list: array() is element-type NULL, so o.o_n_tok fails
    # analysis — inline a TYPED empty array and emit the (empty) alert
    # stream instead of a confusing AnalysisException
    arr = (
        f"array({olits})"
        if others
        else "cast(array() as array<struct<o_id: bigint, o_n_tok: int>>)"
    )
    matched = stream.select(
        "event_ts",
        "doc_id",
        "seq_no",
        "n_tok",
        "source",
        F.expr(
            f"transform(filter({arr}, "
            f"o -> abs(n_tok - o.o_n_tok) <= {radius} AND o.o_id != doc_id), "
            "o -> o.o_id)"
        ).alias("matched_ids"),
    )
    return matched.where(F.expr("size(matched_ids) > 0"))


def with_synthetic_tokens(stream: DataFrame, max_tok: int = 24) -> DataFrame:
    """Deterministic `tokens array<int>` derived from (doc_id, n_tok) with
    PROJECTION-ONLY expressions (`sequence` the expression, not the Generate
    operator) — continuous-mode-safe stand-in for a token-carrying stream."""
    return stream.withColumn(
        "tokens",
        F.expr(
            f"transform(sequence(1, least(n_tok, {max_tok})), "
            f"i -> cast((doc_id * 31 + i * 7) % {VOCAB_SIZE} as int))"
        ),
    )


def continuous_contamination_alerts(
    stream: DataFrame, probe_hashes: Iterable[int], min_overlap: int = 3
) -> DataFrame:
    """Per-record contamination alert — the continuous-mode face of
    stream_decontaminate: the eval benchmark's token k-gram hash set is
    inlined as an ARRAY LITERAL (continuous mode rejects joins, even
    stream-static broadcasts — same trick as continuous_range_alerts'
    query table), and each arriving row is flagged the instant its shingle
    overlap reaches `min_overlap`. Project/Filter only (transform /
    array_distinct / array_intersect are projections) — runs under
    trigger(continuous=...). Emits the CONTAMINATED rows (the thing to act
    on); production caveat: a literal is fine for eval-benchmark-sized
    probes, a huge probe belongs in the micro-batch broadcast path."""
    from spatialflink_spark.streaming.pipeline import token_shingle_expr

    plits = ", ".join(f"cast({int(h)} as bigint)" for h in sorted(set(probe_hashes)))
    flagged = stream.withColumn(
        "_sh", F.expr(token_shingle_expr())
    ).withColumn(
        "n_shared_shingles",
        F.expr(f"cast(size(array_intersect(_sh, array({plits}))) as int)"),
    )
    return flagged.where(F.col("n_shared_shingles") >= min_overlap).drop("_sh")


def continuous_mix_filter(
    stream: DataFrame, rates: Iterable[tuple[str, int]]
) -> DataFrame:
    """Per-record source mixing — the continuous-mode face of
    stream_source_mix: the quota-rate table (one basis-point rate per
    source, from mixing.mix_rates_snapshot on a static/periodic snapshot)
    is inlined as a MAP LITERAL, and each arriving row passes the instant
    its deterministic LCG draw lands under its source's rate. Project/Filter
    only (map lookup + integer arithmetic are projections) — runs under
    trigger(continuous=...). A source missing from the snapshot keeps
    everything (rate 10000), matching the batch op's zero-mass rule: unseen
    mass costs no quota. Rate tables are one row per source — literal-sized
    by construction."""
    from spatialflink_spark.operators.mixing import BP, LCG_KEEP_EXPR

    # escape quotes/backslashes: arbitrary source names must not kill the
    # job (the mixing module's stated contract) nor inject into the literal
    def esc(s: str) -> str:
        return s.replace("\\", "\\\\").replace("'", "\\'")

    pairs = ", ".join(f"'{esc(s)}', {int(bp)}" for s, bp in rates)
    mexpr = f"map({pairs})" if pairs else "cast(map() as map<string, int>)"
    enriched = stream.withColumn(
        "rate_bp",
        F.expr(f"coalesce(try_element_at({mexpr}, source), {BP})"),
    )
    return enriched.where(F.expr(LCG_KEEP_EXPR) < F.col("rate_bp"))
