"""Windowed kNN — two-stage top-k with per-doc dedup-keep-min.

Reference semantics (knn/PointPointKNNQuery.java:132-201 + merge
knn/KNNQuery.java:204-308):
1. per (gridID, window): size-k max-heap by distance, radius-bounded d <= r
2. windowAll final merge: union all per-cell heaps, dedup per objID keeping
   the MINIMUM distance (KNNQuery.java:226-238), re-cut to k.

Spark-first re-expression: the two stages are two aggregations —
partial per (cell, window) top-k, then final per (window) top-k — which is
exactly Spark's partial/final aggregate shape, except top-k isn't a built-in
agg. We express each stage as min-per-doc + rank, all in codegen window
functions; no Python, no single-threaded windowAll (the reference's
parallelism-1 merge is the anti-pattern at scale — our final stage only sees
<= num_cells * k rows per window, so the merge input is tiny by construction;
the prefix-sum/min-heap candidate cut happens in stage 1's rank).

Tie-break is the deterministic total order (dist, doc_id, seq_no) — the
reference's PriorityQueue tie behavior is arbitrary; the oracle fixes it
(SURVEY.md §7 risk register).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spatialflink_spark.config import GridConfig, QueryPoint
from spatialflink_spark.operators.range_query import range_query


def knn_windowed(
    seq_with_ws: DataFrame,
    grid: GridConfig,
    qs: Iterable[QueryPoint],
) -> DataFrame:
    """Top-k nearest rows (by |n_tok - q_n_tok|) per (window, query).

    `seq_with_ws` must already carry a `ws` window-start column (compose with
    functions/windows.py). Returns (ws, q_id, rank, doc_id, seq_no, dist).
    """
    # stage 0: radius-bounded candidate generation via the grid (d <= r bound,
    # PointPointKNNQuery.java:150-155). k > survivors => return-all
    # (README.md:161 semantics) falls out naturally.
    cand = range_query(seq_with_ws, grid, qs)

    # stage 1: per-cell partial top-k. First dedup per doc WITHIN the cell
    # (keep its min (dist, seq_no) row), THEN cut to the k best docs per cell.
    # Deduping before the cut is what makes the two-stage result provably
    # equal to global dedup-then-rank: a doc in the global top-k has fewer
    # than k docs beating it in its own cell, so it survives the cut. (The
    # reference cuts raw points per cell, KNNQuery.java:204-308 — a hot doc
    # there can evict a qualifying doc; our oracle defines truth, SURVEY §7.)
    # This is the map-side combine: the final stage input is bounded by
    # num_cells * k rows per (ws, q_id) regardless of data volume.
    cell_doc_min = cand.groupBy("ws", "q_id", "k", "cell", "doc_id").agg(
        F.min(F.struct("dist", "seq_no")).alias("_m")
    )
    w_cell = Window.partitionBy("ws", "q_id", "cell").orderBy(
        F.col("_m.dist"), F.col("doc_id")
    )
    partial = (
        cell_doc_min.withColumn("_r", F.row_number().over(w_cell))
        .where(F.col("_r") <= F.col("k"))
        .drop("_r")
    )

    # stage 2: global merge per (ws, q_id): dedup per doc_id keep min dist
    # (KNNQuery.java:226-238), then re-rank and cut to k.
    per_doc = partial.groupBy("ws", "q_id", "k", "doc_id").agg(
        F.min("_m").alias("_m2")
    ).select(
        "ws", "q_id", "k", "doc_id",
        F.col("_m2.dist").alias("dist"),
        F.col("_m2.seq_no").alias("seq_no"),
    )
    w_final = Window.partitionBy("ws", "q_id").orderBy("dist", "doc_id")
    return (
        per_doc.withColumn("rank", F.row_number().over(w_final))
        .where(F.col("rank") <= F.col("k"))
        .select("ws", "q_id", "rank", "doc_id", "seq_no", "dist")
    )


def knn_windowed_qdf(seq_with_ws: DataFrame, grid: GridConfig, qs) -> DataFrame:
    """Convenience alias mirroring the reference's run() naming."""
    return knn_windowed(seq_with_ws, grid, qs)


def knn_unbounded(seq_with_ws: DataFrame, grid: GridConfig, qs) -> DataFrame:
    """Unbounded kNN — no radius cut. The reference reaches this via
    iterative grid-layer expansion (UniformGrid.getNeighboringLayerCells /
    getAllNeighboringLayers, UniformGrid.java:447-501): grow the cell ring
    until k neighbors are found. Declaratively the fixpoint of that loop is
    simply the global per-doc min-distance top-k with NO candidate bound —
    Catalyst's partial aggregation gives the per-partition pruning the layer
    loop hand-codes. Output shape matches knn_windowed."""
    from pyspark.sql import functions as F2

    spark = seq_with_ws.sparkSession
    qdf = spark.createDataFrame(
        [(q.q_id, q.q_n_tok, q.k) for q in qs], "q_id string, q_n_tok int, k int"
    )
    cand = seq_with_ws.join(F2.broadcast(qdf)).withColumn(
        "dist", F2.expr("abs(n_tok - q_n_tok)")
    )
    per_doc = cand.groupBy("ws", "q_id", "k", "doc_id").agg(
        F2.min(F2.struct("dist", "seq_no")).alias("_m")
    )
    w = Window.partitionBy("ws", "q_id").orderBy(F2.col("_m.dist"), F2.col("doc_id"))
    return (
        per_doc.withColumn("rank", F2.row_number().over(w).cast("int"))
        .where(F2.col("rank") <= F2.col("k"))
        .select(
            "ws", "q_id", "rank", "doc_id",
            F2.col("_m.seq_no").alias("seq_no"),
            F2.col("_m.dist").alias("dist"),
        )
    )
