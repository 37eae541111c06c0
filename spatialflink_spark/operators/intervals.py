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


def interval_knn(seq_ws: DataFrame, grid: GridConfig, qs) -> DataFrame:
    """Point-query kNN over the INTERVAL stream — the Point-Polygon kNN type
    combo (knn/PointPolygonKNNQuery.java): top-k intervals per (window,
    query) by the 1-D point-to-bbox distance max(0, lo - q, q - hi)
    (DistanceFunctions.java:150-200 getPointPolygonBBoxMinEuclideanDistance).

    Same two-stage shape as knn.knn_windowed: radius-bounded candidates via
    the replicated covered-cell broadcast equi-join (guaranteed-cell bypass
    is sound for extended objects: an interval overlapping a guaranteed cell
    contains a point within the radius, so its bbox distance <= radius),
    per-cell partial top-k after per-interval dedup-keep-min, bounded global
    merge. Output: ws, q_id, rank, iv_id, iv_seq, dist."""
    from pyspark.sql.window import Window

    from spatialflink_spark.operators.range_query import query_cells_df

    spark = seq_ws.sparkSession
    qcells = query_cells_df(spark, grid, qs)
    iv = _replicate_intervals(interval_stream(seq_ws), grid)
    dist = F.expr("greatest(0, lo - q_n_tok, q_n_tok - hi)")
    cand = (
        iv.join(F.broadcast(qcells), "cell")
        .withColumn("dist", dist)
        .where(F.col("guaranteed") | (F.col("dist") <= F.col("radius")))
    )
    # stage 1: per-cell dedup-keep-min per interval object, cut to k per cell
    cell_iv_min = cand.repartition("ws", "q_id", "cell").groupBy("ws", "q_id", "k", "cell", "iv_id").agg(
        F.min(F.struct("dist", "iv_seq")).alias("_m")
    )
    w_cell = Window.partitionBy("ws", "q_id", "cell").orderBy(
        F.col("_m.dist"), F.col("iv_id")
    )
    partial = (
        cell_iv_min.withColumn("_r", F.row_number().over(w_cell))
        .where(F.col("_r") <= F.col("k"))
        .drop("_r")
    )
    # stage 2: bounded global merge (<= cells*k rows per (ws, q_id))
    per_iv = partial.repartition("ws", "q_id").groupBy("ws", "q_id", "k", "iv_id").agg(
        F.min("_m").alias("_m2")
    )
    w_final = Window.partitionBy("ws", "q_id").orderBy(
        F.col("_m2.dist"), F.col("iv_id")
    )
    return (
        per_iv.withColumn("rank", F.row_number().over(w_final).cast("int"))
        .where(F.col("rank") <= F.col("k"))
        .select(
            "ws", "q_id", "rank", "iv_id",
            F.col("_m2.iv_seq").alias("iv_seq"),
            F.col("_m2.dist").alias("dist"),
        )
    )


def interval_interval_join(
    seq_ws: DataFrame, grid: GridConfig, radius: int
) -> DataFrame:
    """Windowed interval-interval self-join — the Polygon-Polygon join type
    combo (join/PolygonPolygonJoinQuery shape): pairs of extended objects in
    the same tumbling window whose 1-D bbox-to-bbox distance
    max(0, l_lo - r_hi, r_lo - l_hi) <= radius
    (DistanceFunctions.java polygon-polygon bbox distance), id-skip like the
    point self-join (tJoin runSingle :341-435), latest-per-pair dedup.

    Replication: the LEFT stream is exploded to the cells covering its
    radius-EXPANDED span [lo-r, hi+r], the right to its plain covered cells
    (JoinQuery.java:73-90 replicates one side by the neighboring-cell layer
    the same way) — if dist <= radius the two clamped cell ranges overlap, so
    every qualifying pair meets in >= 1 cell and the join is a pure
    (ws, cell) equi-join. Output: ws, left_iv, right_iv, l_lo, l_hi, r_lo,
    r_hi, dist, pair_ts."""
    iv = interval_stream(seq_ws)
    lo_c = f"cast(least(greatest(floor((lo - {radius}) / {grid.cell_len}), 0), {grid.num_cells - 1}) as int)"
    hi_c = f"cast(least(greatest(floor((hi + {radius}) / {grid.cell_len}), 0), {grid.num_cells - 1}) as int)"
    l = iv.withColumn("cell", F.explode(F.expr(f"sequence({lo_c}, {hi_c})"))).select(
        "ws", "cell",
        F.col("iv_id").alias("left_iv"), F.col("iv_seq").alias("l_seq"),
        F.col("lo").alias("l_lo"), F.col("hi").alias("l_hi"),
        F.col("iv_ts").alias("l_ts"),
    )
    r = _replicate_intervals(iv, grid).select(
        F.col("ws").alias("r_ws"), F.col("cell").alias("r_cell"),
        F.col("iv_id").alias("right_iv"), F.col("iv_seq").alias("r_seq"),
        F.col("lo").alias("r_lo"), F.col("hi").alias("r_hi"),
        F.col("iv_ts").alias("r_ts"),
    )
    dist = F.greatest(
        F.lit(0), F.col("l_lo") - F.col("r_hi"), F.col("r_lo") - F.col("l_hi")
    )
    pairs = (
        l.join(
            r,
            (l.ws == r.r_ws) & (l.cell == r.r_cell) & (l.left_iv != r.right_iv),
        )
        .withColumn("dist", dist)
        .where(F.col("dist") <= radius)
    )
    latest = pairs.groupBy("ws", "left_iv", "right_iv").agg(
        F.max(
            F.struct(
                F.greatest("l_ts", "r_ts").alias("pair_ts"),
                F.col("l_seq"), F.col("r_seq"),
                F.col("l_lo"), F.col("l_hi"),
                F.col("r_lo"), F.col("r_hi"),
                F.col("dist"),
            )
        ).alias("_m")
    )
    return latest.select(
        "ws",
        "left_iv",
        "right_iv",
        F.col("_m.l_lo").alias("l_lo"),
        F.col("_m.l_hi").alias("l_hi"),
        F.col("_m.r_lo").alias("r_lo"),
        F.col("_m.r_hi").alias("r_hi"),
        F.col("_m.dist").alias("dist"),
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
