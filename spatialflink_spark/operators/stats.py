"""Per-key running trajectory statistics — TStats analog.

Reference semantics (tStats/TStatsQuery.java:44-145): per-trajectory
ValueState holding (lastTs, last position, cumulative spatial length,
cumulative temporal length); each IN-ORDER point extends the totals and
emits; OUT-OF-ORDER points (p.ts <= lastTs) are DROPPED (guard at :118).

Token-domain mapping: "spatial hop length" = |n_tok - prev n_tok| (the
1-D distance between consecutive events of a doc), temporal length =
ts - prev ts, rate = spatial/temporal.

Batch-portable form (below): the accepted set is exactly the rows whose ts is
a strict running maximum over the per-doc prefix — because lastTs only
advances on accepted rows, and a row is accepted iff it beats every
previously-seen ts (an accepted row's ts IS the running max). Expressed with
window functions, identical in DuckDB. Streaming form with real per-key state
lives in streaming/stateful.py (applyInPandasWithState).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


ORDER = "seq_no"  # arrival order within a doc (monotone per doc by fixture)


def windowed_stats(seq: DataFrame) -> DataFrame:
    """TStats WINDOW-BASED form (tStats/TStatsQuery.java:148-189): per
    (doc, window) the apply() function iterates the window contents in
    arrival order with the SAME in-loop out-of-order guard as the RT form —
    but state resets every window (locals, not ValueState), so the guard's
    running max is per (doc_id, ws), not global per doc.

    `seq` must already carry the window column `ws`. Output: doc_id, ws,
    n_points (window size), n_accepted (guard survivors), win_len
    (sum |Δn_tok| over accepted), win_dt (sum Δts), rate_milli
    (floor(1000*win_len/win_dt), 0 when win_dt = 0 — the reference emits a
    raw division, Infinity on single-point windows; clamped here like the
    RT form so the column is exact-SQL portable)."""
    df = seq.select("doc_id", "ws", "seq_no", "n_tok", "ts_s")
    accepted = df.withColumn(
        "_prev_max",
        F.expr(
            "max(ts_s) OVER (PARTITION BY doc_id, ws ORDER BY seq_no "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        ),
    ).where(F.expr("_prev_max IS NULL OR ts_s > _prev_max"))
    hops = accepted.withColumn(
        "_p_ts",
        F.expr("lag(ts_s) OVER (PARTITION BY doc_id, ws ORDER BY seq_no)"),
    ).withColumn(
        "_p_nt",
        F.expr("lag(n_tok) OVER (PARTITION BY doc_id, ws ORDER BY seq_no)"),
    )
    per_win = hops.groupBy("doc_id", "ws").agg(
        F.count(F.lit(1)).alias("n_accepted"),
        F.coalesce(F.sum(F.expr("abs(n_tok - _p_nt)")), F.lit(0)).cast("bigint").alias("win_len"),
        F.coalesce(F.sum(F.expr("ts_s - _p_ts")), F.lit(0)).cast("bigint").alias("win_dt"),
    )
    totals = df.groupBy("doc_id", "ws").agg(F.count(F.lit(1)).alias("n_points"))
    out = totals.join(per_win, ["doc_id", "ws"])
    return out.select(
        "doc_id",
        "ws",
        "n_points",
        "n_accepted",
        "win_len",
        "win_dt",
        F.expr(
            "CASE WHEN win_dt > 0 THEN cast(floor(1000 * win_len / win_dt) as bigint) "
            "ELSE cast(0 as bigint) END"
        ).alias("rate_milli"),
    )


def running_stats(seq: DataFrame) -> DataFrame:
    """Final per-doc cumulative stats over in-order rows.

    Output: doc_id, n_seen, n_accepted, cum_len (sum |Δn_tok|),
    cum_dt (sum Δts over accepted), rate_milli (1000*cum_len/cum_dt, int).
    """
    seq.sparkSession  # noqa: B018 — documents the session dependency
    df = seq.select("doc_id", "seq_no", "n_tok", "ts_s")
    # strict running-max acceptance guard (TStatsQuery.java:118)
    accepted = df.withColumn(
        "_prev_max",
        F.expr(
            "max(ts_s) OVER (PARTITION BY doc_id ORDER BY seq_no "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        ),
    ).where(F.expr("_prev_max IS NULL OR ts_s > _prev_max"))
    hops = accepted.withColumn(
        "_p_ts",
        F.expr("lag(ts_s) OVER (PARTITION BY doc_id ORDER BY seq_no)"),
    ).withColumn(
        "_p_nt",
        F.expr("lag(n_tok) OVER (PARTITION BY doc_id ORDER BY seq_no)"),
    )
    per_doc = hops.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_accepted"),
        F.coalesce(F.sum(F.expr("abs(n_tok - _p_nt)")), F.lit(0)).cast("bigint").alias("cum_len"),
        F.coalesce(F.sum(F.expr("ts_s - _p_ts")), F.lit(0)).cast("bigint").alias("cum_dt"),
    )
    totals = seq.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_seen"))
    out = totals.join(per_doc, "doc_id")
    return out.select(
        "doc_id",
        "n_seen",
        "n_accepted",
        "cum_len",
        "cum_dt",
        F.expr(
            "CASE WHEN cum_dt > 0 THEN cast(floor(1000 * cum_len / cum_dt) as bigint) "
            "ELSE cast(0 as bigint) END"
        ).alias("rate_milli"),
    )
