"""Windowed range query — guaranteed/candidate grid pruning.

Reference semantics (range/PointPointRangeQuery.java:110-187):
1. compute guaranteed + candidate cell sets for each query point
   (UniformGrid.java:165-190, 368-395; r=0 -> all cells, :264-266)
2. filter the stream to candidate ∪ guaranteed cells (:135-140)
3. keyBy(gridID) shuffle (:144-149)
4. rows in guaranteed cells emit WITHOUT a distance check; candidate rows get
   the exact `dist <= r` check (:150-187); approximate mode skips the check
   (QueryConfiguration.java:10,50-56).

Spark-first re-expression: the query set is tiny and static, so instead of
capturing cell sets in a closure we materialize (q_id, cell, guaranteed) rows
and BROADCAST hash-join on cell — the replicate-query-to-cells trick of
JoinQuery.java:73-90, with Catalyst picking BroadcastHashJoin (no shuffle of
the data stream at all for the filter stage). The guaranteed-cell bypass is a
single vectorized `guaranteed OR abs(n_tok - q) <= r` predicate inside
whole-stage codegen.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spatialflink_spark.config import GridConfig, QueryPoint
from spatialflink_spark.operators.cells import with_cell


def query_cells_df(
    spark: SparkSession, grid: GridConfig, qs: Iterable[QueryPoint]
) -> DataFrame:
    """Materialize (q_id, q_n_tok, radius, cell, guaranteed) — one row per
    (query, prunable cell). Tiny; always broadcast."""
    rows = []
    for q in qs:
        g = grid.guaranteed_cells(q.q_n_tok, q.radius)
        c = grid.candidate_cells(q.q_n_tok, q.radius)
        for cell in sorted(g):
            rows.append((q.q_id, q.q_n_tok, q.radius, q.k, cell, True))
        for cell in sorted(c):
            rows.append((q.q_id, q.q_n_tok, q.radius, q.k, cell, False))
    return spark.createDataFrame(
        rows,
        "q_id string, q_n_tok int, radius int, k int, cell int, guaranteed boolean",
    )


def range_query(
    seq: DataFrame,
    grid: GridConfig,
    qs: Iterable[QueryPoint],
    approximate: bool = False,
) -> DataFrame:
    """All rows within radius of each query point (no windowing — compose
    with functions/windows.py builders for the windowed variants).

    Output: q_id + every sequence column + dist.
    """
    spark = seq.sparkSession
    qcells = query_cells_df(spark, grid, qs)
    s = with_cell(seq, grid)
    joined = s.join(F.broadcast(qcells), "cell")
    dist = F.expr("abs(n_tok - q_n_tok)")
    if approximate:
        # approximate mode: candidates pass unchecked (QueryConfiguration.java:50-56)
        pred = F.lit(True)
    else:
        pred = F.col("guaranteed") | (dist <= F.col("radius"))
    return joined.where(pred).withColumn("dist", dist)
