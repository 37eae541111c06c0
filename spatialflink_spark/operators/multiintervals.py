"""Multi-interval objects — the multi-geometry stream analog.

Reference: MultiPoint / MultiPolygon / MultiLineString / GeometryCollection
streams (spatialStreams/Deserialization.java:588-621 MultiPoint, :837-870
MultiPolygon, :1208-1241 GeometryCollection; spatialObjects/MultiPolygon.java)
— a multi object is a SET of parts whose gridIDsSet is the UNION of the
parts' covered cells and whose distance to a point is the MIN over parts
(the same min-over-parts the reference's DistanceFunctions apply per part).

Token analog: a MULTI-INTERVAL object — an array of [lo, hi] spans per
(doc, seq), derived deterministically from the sequence stream:

    m spans, m = doc_id % 3 + 1, span j at stride 17:
      lo_j = max(n_tok + 17*j - (doc_id % 5 + 1), 0)
      hi_j =     n_tok + 17*j + (doc_id % 7 + 2)

    distance(point p) = min_j max(0, lo_j - p, p - hi_j)
    covered cells     = union_j cells(lo_j .. hi_j)   (gridIDsSet of parts)

The stride spreads a multi object across non-adjacent cells, so the
union-of-parts cell set is genuinely non-contiguous — the property that
distinguishes multi objects from plain intervals. The same arithmetic is
emitted as DuckDB SQL (oracle/sql_apps.py) for bit-identical goldens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spatialflink_spark.config import GridConfig
from spatialflink_spark.operators.cells import with_cell

SPAN_STRIDE = 17

# array<struct<lo int, hi int>> — the parts array (MultiPolygon.polygons analog)
SPANS_EXPR = (
    "transform(sequence(0, cast(doc_id % 3 as int)), j -> "
    f"struct(cast(greatest(n_tok + {SPAN_STRIDE}*j - (doc_id % 5 + 1), 0) as int) as lo, "
    f"cast(n_tok + {SPAN_STRIDE}*j + (doc_id % 7 + 2) as int) as hi))"
)


def mi_stream(seq_ws: DataFrame) -> DataFrame:
    """(ws, mi_id, mi_seq, spans, mi_ts) derived from the windowed sequence
    stream — the multi-geometry (array-of-parts) stream."""
    return seq_ws.select(
        "ws",
        F.col("doc_id").alias("mi_id"),
        F.col("seq_no").alias("mi_seq"),
        F.expr(SPANS_EXPR).alias("spans"),
        F.col("ts_s").alias("mi_ts"),
    )


def _covered_cells_expr(grid: GridConfig, expand: int = 0) -> str:
    """UNION of the cells covered by each span (expanded by `expand` on both
    sides for join replication) — Polygon.gridIDsSet over parts
    (HelperClass.java:123-143 applied per part, then unioned)."""
    lo_c = (
        f"cast(least(greatest(floor((s.lo - {expand}) / {grid.cell_len}), 0), "
        f"{grid.num_cells - 1}) as int)"
    )
    hi_c = (
        f"cast(least(greatest(floor((s.hi + {expand}) / {grid.cell_len}), 0), "
        f"{grid.num_cells - 1}) as int)"
    )
    return f"array_distinct(flatten(transform(spans, s -> sequence({lo_c}, {hi_c}))))"


def _mi_dist(p: str) -> str:
    """min-over-parts 1-D bbox distance of a spans array to point `p`."""
    return f"array_min(transform(spans, s -> greatest(0, s.lo - {p}, {p} - s.hi)))"


def multiinterval_range(seq_ws: DataFrame, grid: GridConfig, qs) -> DataFrame:
    """Point-query range over the MULTI-INTERVAL stream — the multi-geometry
    range combo (PointMultiPolygonRangeQuery shape): objects whose
    min-over-parts distance to the query point is <= radius.

    Grid pruning via the union-of-parts covered cells: if dist <= r, some
    span intersects [q-r, q+r], so one of its covered cells is a candidate
    or guaranteed cell — the broadcast equi-join on cell loses nothing. The
    guaranteed-cell bypass is sound for multi objects for the same reason as
    intervals: a part overlapping a guaranteed cell has a point within the
    radius. Output: ws, q_id, mi_id, mi_seq, dist."""
    from spatialflink_spark.operators.range_query import query_cells_df

    spark = seq_ws.sparkSession
    qcells = query_cells_df(spark, grid, qs)
    rep = mi_stream(seq_ws).withColumn(
        "cell", F.explode(F.expr(_covered_cells_expr(grid)))
    )
    scored = (
        rep.join(F.broadcast(qcells), "cell")
        .withColumn("dist", F.expr(_mi_dist("q_n_tok")))
        .where(F.col("guaranteed") | (F.col("dist") <= F.col("radius")))
    )
    # an object meets a query in >= 1 covered cell; every copy carries the
    # same object-level dist — collapse to one row per (window, query, object)
    return scored.groupBy("ws", "q_id", "mi_id", "mi_seq").agg(
        F.min("dist").alias("dist")
    )


def multiinterval_join(seq_ws: DataFrame, grid: GridConfig, radius: int) -> DataFrame:
    """Windowed point-multiinterval join — the Point-MultiPolygon join combo:
    pairs (point row, multi object) in the same tumbling window with
    min-over-parts distance <= radius, id-skip, latest-per-pair dedup
    (PointPointTJoinQuery.java:133-177 dedup shape).

    Replication: each object is exploded to the cells covering its spans
    EXPANDED by the radius (JoinQuery.java:73-90 replicates one side by the
    neighboring layer the same way) — if dist <= radius the point's cell is
    inside some expanded span's cell range, so every qualifying pair meets in
    >= 1 cell and the join is a pure (ws, cell) equi-join. Output: ws,
    doc_id, mi_id, dist, pair_ts."""
    rep = mi_stream(seq_ws).withColumn(
        "cell", F.explode(F.expr(_covered_cells_expr(grid, expand=radius)))
    )
    pts = with_cell(seq_ws, grid).select(
        "ws", "cell", "doc_id", "seq_no", "n_tok", "ts_s"
    )
    pairs = (
        pts.join(rep, ["ws", "cell"])
        .where(F.col("mi_id") != F.col("doc_id"))
        .withColumn("dist", F.expr(_mi_dist("n_tok")))
        .where(F.col("dist") <= radius)
    )
    latest = pairs.groupBy("ws", "doc_id", "mi_id").agg(
        F.max(
            F.struct(
                F.greatest("ts_s", "mi_ts").alias("pair_ts"),
                F.col("seq_no"),
                F.col("mi_seq"),
                F.col("dist"),
            )
        ).alias("_m")
    )
    return latest.select(
        "ws",
        "doc_id",
        "mi_id",
        F.col("_m.dist").alias("dist"),
        F.col("_m.pair_ts").alias("pair_ts"),
    )


def multiinterval_knn(seq_ws: DataFrame, grid: GridConfig, qs) -> DataFrame:
    """Point-query kNN over the MULTI-INTERVAL stream — the Point-
    MultiPolygon kNN combo (knn/PointPolygonKNNQuery applied per part,
    min over parts): top-k multi objects per (window, query) by the
    min-over-parts 1-D bbox distance.

    Same two-stage shape as knn.knn_windowed: radius-bounded candidates via
    the union-of-parts covered-cell broadcast equi-join (guaranteed-cell
    bypass sound — a part overlapping a guaranteed cell has a point within
    the radius), per-cell partial top-k after per-object dedup-keep-min,
    bounded global merge. Output: ws, q_id, rank, mi_id, mi_seq, dist."""
    from pyspark.sql.window import Window

    from spatialflink_spark.operators.range_query import query_cells_df

    spark = seq_ws.sparkSession
    qcells = query_cells_df(spark, grid, qs)
    rep = mi_stream(seq_ws).withColumn(
        "cell", F.explode(F.expr(_covered_cells_expr(grid)))
    )
    cand = (
        rep.join(F.broadcast(qcells), "cell")
        .withColumn("dist", F.expr(_mi_dist("q_n_tok")))
        .where(F.col("guaranteed") | (F.col("dist") <= F.col("radius")))
    )
    cell_mi_min = cand.repartition("ws", "q_id", "cell").groupBy("ws", "q_id", "k", "cell", "mi_id").agg(
        F.min(F.struct("dist", "mi_seq")).alias("_m")
    )
    w_cell = Window.partitionBy("ws", "q_id", "cell").orderBy(
        F.col("_m.dist"), F.col("mi_id")
    )
    partial = (
        cell_mi_min.withColumn("_r", F.row_number().over(w_cell))
        .where(F.col("_r") <= F.col("k"))
        .drop("_r")
    )
    per_mi = partial.repartition("ws", "q_id").groupBy("ws", "q_id", "k", "mi_id").agg(
        F.min("_m").alias("_m2")
    )
    w_final = Window.partitionBy("ws", "q_id").orderBy(
        F.col("_m2.dist"), F.col("mi_id")
    )
    return (
        per_mi.withColumn("rank", F.row_number().over(w_final).cast("int"))
        .where(F.col("rank") <= F.col("k"))
        .select(
            "ws", "q_id", "rank", "mi_id",
            F.col("_m2.mi_seq").alias("mi_seq"),
            F.col("_m2.dist").alias("dist"),
        )
    )
