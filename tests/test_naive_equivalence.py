"""Pruned vs naive equivalence — the reference's RealTimeNaive (RTN) paths
exist exactly to validate the grid-pruned paths (QueryType.java:3-8,
PointPointJoinQuery.java:186-243 naive single-key join). Here: the pruned
operator output must equal a brute-force computation with no grid at all."""

from __future__ import annotations

from pyspark.sql import functions as F

from spatialflink_spark import gate
from spatialflink_spark.config import DEFAULT_CONFIG as C, DEFAULT_QUERY_POINTS
from tests.conftest import SF_SMALL


def _pdf(df, keys):
    return df.toPandas().sort_values(keys).reset_index(drop=True)


def test_range_pruned_equals_naive(spark):
    pruned = gate.q_range_rows(spark, SF_SMALL).select(
        "ws", "q_id", "doc_id", "seq_no", "dist"
    )
    seq = gate._seq_t(spark, SF_SMALL)
    qp = spark.createDataFrame(
        [(q.q_id, q.q_n_tok, q.radius) for q in DEFAULT_QUERY_POINTS],
        "q_id string, q_n_tok int, radius int",
    )
    naive = (
        seq.crossJoin(qp)
        .where(F.expr("abs(n_tok - q_n_tok) <= radius"))
        .select("ws", "q_id", "doc_id", "seq_no", F.expr("abs(n_tok - q_n_tok)").alias("dist"))
    )
    keys = ["ws", "q_id", "doc_id", "seq_no"]
    a, b = _pdf(pruned, keys), _pdf(naive, keys)
    assert a.equals(b[a.columns])


def test_join_pruned_equals_naive(spark):
    seq = gate._seq_t(spark, SF_SMALL)
    pruned = gate.q_join_self_tumbling(spark, SF_SMALL)
    l = seq.select(F.col("ws").alias("l_ws"), F.col("doc_id").alias("left_doc"),
                   F.col("seq_no").alias("left_seq"), F.col("n_tok").alias("l_nt"),
                   F.col("ts_s").alias("l_ts"))
    r = seq.select(F.col("ws").alias("r_ws"), F.col("doc_id").alias("right_doc"),
                   F.col("seq_no").alias("right_seq"), F.col("n_tok").alias("r_nt"),
                   F.col("ts_s").alias("r_ts"))
    naive_pairs = l.join(
        r,
        (F.col("l_ws") == F.col("r_ws"))
        & (F.abs(F.col("l_nt") - F.col("r_nt")) <= C.join_radius)
        & (F.col("left_doc") != F.col("right_doc")),
    ).select(
        F.col("l_ws").alias("ws"), "left_doc", "right_doc",
        "left_seq", "right_seq",
        F.abs(F.col("l_nt") - F.col("r_nt")).alias("dist"),
        F.greatest("l_ts", "r_ts").alias("pair_ts"),
    )
    naive = naive_pairs.groupBy("ws", "left_doc", "right_doc").agg(
        F.max(F.struct("pair_ts", "left_seq", "right_seq", "dist")).alias("_m")
    ).select(
        "ws", "left_doc", "right_doc",
        F.col("_m.left_seq").alias("left_seq"),
        F.col("_m.right_seq").alias("right_seq"),
        F.col("_m.dist").alias("dist"),
        F.col("_m.pair_ts").alias("pair_ts"),
    )
    keys = ["ws", "left_doc", "right_doc"]
    a, b = _pdf(pruned, keys), _pdf(naive, keys)
    assert a.equals(b[a.columns])


def test_knn_pruned_equals_naive(spark):
    pruned = gate.q_knn_sliding(spark, SF_SMALL)
    seq = gate._seq_s(spark, SF_SMALL)
    qp = spark.createDataFrame(
        [(q.q_id, q.q_n_tok, q.radius, q.k) for q in DEFAULT_QUERY_POINTS],
        "q_id string, q_n_tok int, radius int, k int",
    )
    cand = seq.crossJoin(qp).where(F.expr("abs(n_tok - q_n_tok) <= radius"))
    per_doc = cand.withColumn("dist", F.expr("abs(n_tok - q_n_tok)")).groupBy(
        "ws", "q_id", "k", "doc_id"
    ).agg(F.min(F.struct("dist", "seq_no")).alias("_m"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("ws", "q_id").orderBy(F.col("_m.dist"), F.col("doc_id"))
    naive = (
        per_doc.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= F.col("k"))
        .select("ws", "q_id", "rank", "doc_id",
                F.col("_m.seq_no").alias("seq_no"), F.col("_m.dist").alias("dist"))
    )
    keys = ["ws", "q_id", "rank"]
    a, b = _pdf(pruned, keys), _pdf(naive, keys)
    assert a.equals(b[a.columns])
