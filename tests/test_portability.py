"""Tokenizer portability + fast-path equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from spatialflink_spark.functions import tokens as T
from tests.conftest import SF_SMALL


def test_spark_duck_tokenizer_identical(spark, duck):
    """The parity linchpin: same token ids from both engines on real text."""
    sp = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .orderBy("doc_id")
        .limit(50)
        .select("doc_id", F.expr(T.spark_tokenize("text")).alias("toks"))
        .collect()
    )
    dk = duck.execute(
        f"SELECT doc_id, {T.duck_tokenize('text')} AS toks "
        "FROM documents ORDER BY doc_id LIMIT 50"
    ).fetchall()
    for row, (b_id, b) in zip(sp, dk):
        assert row.doc_id == b_id and list(row.toks) == list(b), row.doc_id


def test_fast_tokenizer_same_shape(spark):
    """spark_tokenize_fast segments identically: n_tok (and hence cells,
    windows, every n_tok-derived operator result) match the portable path."""
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    cmp = d.select(
        F.expr(f"size({T.spark_tokenize('text')})").alias("a"),
        F.expr(f"size({T.spark_tokenize_fast('text')})").alias("b"),
    )
    assert cmp.where(F.col("a") != F.col("b")).count() == 0
    # values DO differ (different hash family) — guard against accidental alias
    vals = d.select(
        F.expr(T.spark_tokenize("text"))[0].alias("a"),
        F.expr(T.spark_tokenize_fast("text"))[0].alias("b"),
    )
    assert vals.where(F.col("a") != F.col("b")).count() > 0
