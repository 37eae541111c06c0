"""GeometryCollection objects — heterogeneous MIXED-TYPE parts.

Reference: GeometryCollection streams (spatialStreams/Deserialization.java:
1208-1241; spatialObjects/GeometryCollection.java) — a collection holds parts
of DIFFERENT geometry types (points, polygons, linestrings together); its
distance to a point is the min over the TYPED distance of each part, and its
gridIDsSet is the union of the parts' covered cells. The homogeneous
multi-part case is operators/multiintervals.py; this module closes the one
§2.1 row it left open: parts of mixed kinds in one object.

Token analog: per (doc, seq) a collection with up to three typed parts,
derived deterministically from the sequence stream (stride 23 so collection
intervals land in different cells than the multi-interval family's stride-17
spans):

    always        : POINT      p = n_tok
    doc_id % 2 = 0: INTERVAL   [max(n_tok + 23 - (doc_id%5+1), 0),
                                n_tok + 23 + (doc_id%7+2)]
    doc_id % 3 = 0: LINESTRING vertices = tokens (bbox [min, max])

    distance(q) = min over parts of the part's OWN distance function:
        point      -> |p - q|            (degenerate bbox clamp)
        interval   -> max(0, lo - q, q - hi)
        linestring -> min over vertices |t - q|
    covered cells = union over parts (point cell, interval cell range,
                    linestring BBOX cell range)

Pruning soundness: the bbox distance lower-bounds every part's typed
distance (for 'ls' the vertices lie inside the bbox), so candidate
generation via the union-of-parts covered cells loses nothing; the
guaranteed-cell bypass is deliberately NOT used — a linestring part's bbox
overlapping a guaranteed cell does not imply a VERTEX there (same reasoning
as linestrings.py:34-37). The identical arithmetic is emitted as DuckDB SQL
(oracle/sql_apps.py) for bit-identical goldens.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spatialflink_spark.config import GridConfig, QueryPoint

GC_STRIDE = 23

_PART_T = "struct<kind: string, lo: int, hi: int, vertices: array<int>>"

# array of typed parts; absent parts (odd doc_id / doc_id % 3 != 0) are
# filtered out so every collection has 1-3 parts
GC_PARTS_EXPR = f"""
filter(array(
  named_struct('kind', 'pt', 'lo', n_tok, 'hi', n_tok,
               'vertices', cast(null as array<int>)),
  if(doc_id % 2 = 0,
     named_struct('kind', 'iv',
       'lo', cast(greatest(n_tok + {GC_STRIDE} - (doc_id % 5 + 1), 0) as int),
       'hi', cast(n_tok + {GC_STRIDE} + (doc_id % 7 + 2) as int),
       'vertices', cast(null as array<int>)),
     cast(null as {_PART_T})),
  if(doc_id % 3 = 0 AND size(tokens) > 0,
     named_struct('kind', 'ls', 'lo', array_min(tokens),
                  'hi', array_max(tokens), 'vertices', tokens),
     cast(null as {_PART_T}))
), p -> p is not null)
"""
# NB the size(tokens) > 0 guard: an empty token array would make the 'ls'
# part's bbox NULL, the covered-cells sequence NULL, and explode(NULL) then
# DROPS the whole row — including its always-present point part — while the
# oracle's least() would keep it (latent parity break, caught in review; no
# current fixture has empty sequences but pack_emit explicitly models them)


def gc_stream(seq_ws: DataFrame) -> DataFrame:
    """(ws, gc_id, gc_seq, parts, gc_ts): the mixed-part collection stream."""
    return seq_ws.select(
        "ws",
        F.col("doc_id").alias("gc_id"),
        F.col("seq_no").alias("gc_seq"),
        F.expr(GC_PARTS_EXPR).alias("parts"),
        F.col("ts_s").alias("gc_ts"),
    )


def _gc_dist(q: str) -> str:
    """min over parts of the part's TYPED distance to point `q` —
    GeometryCollection distance = min over per-type DistanceFunctions."""
    return (
        "array_min(transform(parts, p -> CASE WHEN p.kind = 'ls' "
        f"THEN array_min(transform(p.vertices, t -> abs(t - {q}))) "
        f"ELSE greatest(0, p.lo - {q}, {q} - p.hi) END))"
    )


def _covered_cells_expr(grid: GridConfig, expand: int = 0) -> str:
    """Union of the cells covered by each part's bbox, expanded by `expand`
    for join replication — gridIDsSet over mixed parts."""
    lo_c = (
        f"cast(least(greatest(floor((p.lo - {expand}) / {grid.cell_len}), 0), "
        f"{grid.num_cells - 1}) as int)"
    )
    hi_c = (
        f"cast(least(greatest(floor((p.hi + {expand}) / {grid.cell_len}), 0), "
        f"{grid.num_cells - 1}) as int)"
    )
    return f"array_distinct(flatten(transform(parts, p -> sequence({lo_c}, {hi_c}))))"


def geomcollection_range(
    seq_ws: DataFrame, grid: GridConfig, qs: Iterable[QueryPoint]
) -> DataFrame:
    """Point-query range over the collection stream: candidates via the
    broadcast union-of-parts covered-cell equi-join, exact min-over-typed-
    parts distance filter (no guaranteed-cell bypass — 'ls' parts make it
    unsound). Output: ws, q_id, gc_id, gc_seq, dist."""
    from spatialflink_spark.operators.range_query import query_cells_df

    spark = seq_ws.sparkSession
    qcells = query_cells_df(spark, grid, qs)
    rep = gc_stream(seq_ws).withColumn(
        "cell", F.explode(F.expr(_covered_cells_expr(grid)))
    )
    hit = (
        rep.join(F.broadcast(qcells), "cell")
        .withColumn("dist", F.expr(_gc_dist("q_n_tok")))
        .where(F.col("dist") <= F.col("radius"))
    )
    # a collection meets a query in >= 1 covered cell; collapse duplicates
    return hit.groupBy("ws", "q_id", "gc_id", "gc_seq").agg(
        F.min("dist").alias("dist")
    )


def geomcollection_knn(
    seq_ws: DataFrame, grid: GridConfig, qs: Iterable[QueryPoint]
) -> DataFrame:
    """Point-query kNN over the collection stream — completes the mixed-part
    combo row (range / join / kNN): same two-stage radius-bounded plan as
    the other geometry kNNs — covered-cell broadcast candidates, exact
    mixed-type distance, per-cell partial top-k after per-object
    dedup-keep-min, bounded global merge (knn.py:35 shape).
    Output: ws, q_id, rank, gc_id, gc_seq, dist."""
    from pyspark.sql.window import Window

    from spatialflink_spark.operators.range_query import query_cells_df

    spark = seq_ws.sparkSession
    qcells = query_cells_df(spark, grid, qs)
    rep = gc_stream(seq_ws).withColumn(
        "cell", F.explode(F.expr(_covered_cells_expr(grid)))
    )
    cand = (
        rep.join(F.broadcast(qcells), "cell")
        .withColumn("dist", F.expr(_gc_dist("q_n_tok")))
        .where(F.col("dist") <= F.col("radius"))
    )
    per_obj = cand.repartition("ws", "q_id", "cell").groupBy("ws", "q_id", "k", "cell", "gc_id").agg(
        F.min(F.struct("dist", "gc_seq")).alias("_m")
    )
    w_cell = Window.partitionBy("ws", "q_id", "cell").orderBy(
        F.col("_m.dist"), F.col("gc_id")
    )
    partial = (
        per_obj.withColumn("_r", F.row_number().over(w_cell))
        .where(F.col("_r") <= F.col("k"))
        .drop("_r")
    )
    per_gc = partial.repartition("ws", "q_id").groupBy("ws", "q_id", "k", "gc_id").agg(
        F.min("_m").alias("_m2")
    )
    w_final = Window.partitionBy("ws", "q_id").orderBy(
        F.col("_m2.dist"), F.col("gc_id")
    )
    return (
        per_gc.withColumn("rank", F.row_number().over(w_final).cast("int"))
        .where(F.col("rank") <= F.col("k"))
        .select(
            "ws", "q_id", "rank", "gc_id",
            F.col("_m2.gc_seq").alias("gc_seq"),
            F.col("_m2.dist").alias("dist"),
        )
    )


def geomcollection_join(
    seq_ws: DataFrame, grid: GridConfig, radius: int
) -> DataFrame:
    """Windowed point-collection join: collections replicated to their
    radius-EXPANDED union-of-parts cells, pure (ws, cell) equi-join against
    the point stream, exact mixed-type distance θ-filter, id-skip,
    latest-per-pair dedup (PointPointTJoinQuery.java:133-177 dedup shape).
    Output: ws, doc_id, gc_id, dist, pair_ts."""
    from spatialflink_spark.operators.cells import with_cell

    rep = gc_stream(seq_ws).withColumn(
        "cell", F.explode(F.expr(_covered_cells_expr(grid, expand=radius)))
    )
    pts = with_cell(seq_ws, grid).select(
        "ws", "cell", "doc_id", "seq_no", "n_tok", "ts_s"
    )
    pairs = (
        pts.join(rep, ["ws", "cell"])
        .where(F.col("gc_id") != F.col("doc_id"))
        .withColumn("dist", F.expr(_gc_dist("n_tok")))
        .where(F.col("dist") <= radius)
    )
    latest = pairs.groupBy("ws", "doc_id", "gc_id").agg(
        F.max(
            F.struct(
                F.greatest("ts_s", "gc_ts").alias("pair_ts"),
                F.col("seq_no"),
                F.col("gc_seq"),
                F.col("dist"),
            )
        ).alias("_m")
    )
    return latest.select(
        "ws",
        "doc_id",
        "gc_id",
        F.col("_m.dist").alias("dist"),
        F.col("_m.pair_ts").alias("pair_ts"),
    )
