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
