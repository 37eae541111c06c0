"""Interval-object operators — the Polygon/LineString type-combo analog.

The reference implements 9 type combinations of range/kNN/join over
Point/Polygon/LineString (spatialOperators/join/PointPolygonJoinQuery.java,
tRange/PointPolygonTRangeQuery.java:75-86 containment, etc.). In the token
domain the extended-object analog of a polygon is an n_tok INTERVAL
[lo, hi] (a 1-D bounding box): containment = lo <= n_tok <= hi; distance =
max(0, lo - n_tok, n_tok - hi) (the 1-D point-to-bbox distance,
utils/DistanceFunctions.java:150-200).

Interval objects carry a SET of covered cells (like Polygon.gridIDsSet,
spatialObjects/Polygon.java:17-23) and are replicated per covered cell so
the join is a pure equi-join — the same replicate→equi-join→θ-filter shape
as the point case (JoinQuery.java:93-115 replicates polygons the same way).

The interval stream is derived deterministically from the sequence stream:
one interval per (doc, seq): [n_tok - (doc_id%5+1), n_tok + (doc_id%7+2)].
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spatialflink_spark.config import GridConfig
from spatialflink_spark.operators.cells import with_cell

LO_EXPR = "cast(greatest(n_tok - (doc_id % 5 + 1), 0) as int)"
HI_EXPR = "cast(n_tok + (doc_id % 7 + 2) as int)"


def interval_stream(seq_ws: DataFrame) -> DataFrame:
    """(ws, iv_id, iv_seq, lo, hi, iv_ts) derived from the windowed
    sequence stream — the second (extended-object) stream."""
    return seq_ws.select(
        "ws",
        F.col("doc_id").alias("iv_id"),
        F.col("seq_no").alias("iv_seq"),
        F.expr(LO_EXPR).alias("lo"),
        F.expr(HI_EXPR).alias("hi"),
        F.col("ts_s").alias("iv_ts"),
    )


def _replicate_intervals(iv: DataFrame, grid: GridConfig) -> DataFrame:
    """Explode each interval to every cell it covers (Polygon.gridIDsSet
    analog, HelperClass.java:123-143)."""
    lo_c = f"cast(least(greatest(floor(lo / {grid.cell_len}), 0), {grid.num_cells - 1}) as int)"
    hi_c = f"cast(least(greatest(floor(hi / {grid.cell_len}), 0), {grid.num_cells - 1}) as int)"
    return iv.withColumn("cell", F.explode(F.expr(f"sequence({lo_c}, {hi_c})")))


def interval_containment_join(seq_ws: DataFrame, grid: GridConfig) -> DataFrame:
    """Windowed point-in-interval join (PointPolygonJoinQuery shape,
    θ = containment): pairs (row, interval) in the same tumbling window with
    lo <= n_tok <= hi, deduped to one row per (ws, doc, iv) keeping the
    latest (pair_ts, seqs) match — PointPointTJoinQuery.java:133-177.

    Output: ws, doc_id, iv_id, n_tok, lo, hi, pair_ts.
    """
    iv = _replicate_intervals(interval_stream(seq_ws), grid)
    pts = with_cell(seq_ws, grid).select(
        "ws", "cell", "doc_id", "seq_no", "n_tok", "ts_s"
    )
    pairs = pts.join(iv, ["ws", "cell"]).where(
        (F.col("n_tok") >= F.col("lo")) & (F.col("n_tok") <= F.col("hi"))
    )
    latest = pairs.groupBy("ws", "doc_id", "iv_id").agg(
        F.max(
            F.struct(
                F.greatest("ts_s", "iv_ts").alias("pair_ts"),
                F.col("seq_no"),
                F.col("iv_seq"),
                F.col("n_tok"),
                F.col("lo"),
                F.col("hi"),
            )
        ).alias("_m")
    )
    return latest.select(
        "ws",
        "doc_id",
        "iv_id",
        F.col("_m.n_tok").alias("n_tok"),
        F.col("_m.lo").alias("lo"),
        F.col("_m.hi").alias("hi"),
        F.col("_m.pair_ts").alias("pair_ts"),
    )


def interval_range_count(seq_ws: DataFrame, q_n_tok: int) -> DataFrame:
    """Windowed range over the INTERVAL stream: per window, how many
    intervals contain the query point (1-D bbox distance == 0) — the
    Polygon-stream range query (tRange/PointPolygonTRangeQuery.java:75-86).
    Output: ws, n_containing, n_intervals."""
    iv = interval_stream(seq_ws)
    return iv.groupBy("ws").agg(
        F.sum(
            F.when(
                (F.lit(q_n_tok) >= F.col("lo")) & (F.lit(q_n_tok) <= F.col("hi")), 1
            ).otherwise(0)
        ).cast("bigint").alias("n_containing"),
        F.count(F.lit(1)).alias("n_intervals"),
    )
