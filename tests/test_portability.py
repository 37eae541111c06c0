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


def test_wide_hash_bit_independence():
    """The wide-SimHash per-token hash halves must be statistically
    independent ACROSS all 60 fingerprint bit positions over the full token
    domain — the property a first LCG attempt violated (bits 0-2 of the two
    halves were exact complements: multiply-add mod 2^k is affine in the
    low bits). Pinned: per-bit set fractions near 0.5 and no bit pair with
    agreement outside [0.45, 0.55]."""
    import itertools

    from spatialflink_spark.config import VOCAB_SIZE
    from spatialflink_spark.operators.dedup import (
        WIDE_SEED_H1,
        WIDE_SEED_H2,
        wide_hash_py,
    )

    n = VOCAB_SIZE
    cols = [[0] * n for _ in range(60)]
    for t in range(n):
        x, y = wide_hash_py(t, WIDE_SEED_H1), wide_hash_py(t, WIDE_SEED_H2)
        for j in range(30):
            cols[j][t] = (x >> j) & 1
            cols[30 + j][t] = (y >> j) & 1
    for c in cols:
        assert 0.45 <= sum(c) / n <= 0.55
    for i, j in itertools.combinations(range(60), 2):
        agree = sum(1 for a, b in zip(cols[i], cols[j]) if a == b) / n
        assert 0.45 <= agree <= 0.55, (i, j, agree)


def test_wide_hash_py_matches_both_dialects(spark):
    """wide_hash_py (the property-test mirror) == the Spark chain == the
    DuckDB chain on a token sample — one builder, three consistent faces."""
    import duckdb

    from spatialflink_spark.operators.dedup import (
        WIDE_SEED_H1,
        wide_hash_chain,
        wide_hash_py,
    )

    toks = list(range(0, 50257, 997))
    expected = [wide_hash_py(t, WIDE_SEED_H1) for t in toks]
    [spark_row] = (
        spark.createDataFrame([(toks,)], "arr array<int>")
        .selectExpr(f"{wide_hash_chain('arr', WIDE_SEED_H1, 'spark')} as h")
        .collect()
    )
    assert list(spark_row.h) == expected
    [duck_col] = duckdb.connect().execute(
        f"SELECT {wide_hash_chain(f'{toks}', WIDE_SEED_H1, 'duck')}"
    ).fetchone()
    assert list(duck_col) == expected


def test_packed_wide_simhash_fold_matches_reference(spark):
    """The single-pass packed vote fold in with_wide_simhash must be
    bit-identical to the definitional per-bit +-1 vote sum (the old 60-
    aggregate kernel), INCLUDING across the 1023-token block boundary the
    packed counters roll over at. Reference computed in pure Python from
    wide_hash_py."""
    from spatialflink_spark.operators.dedup import (
        SIMHASH_WIDE_BITS,
        WIDE_SEED_H1,
        WIDE_SEED_H2,
        wide_hash_py,
        with_wide_simhash,
    )

    def ref_simhash(toks: list[int]) -> int:
        h1 = [wide_hash_py(t, WIDE_SEED_H1) for t in toks]
        h2 = [wide_hash_py(t, WIDE_SEED_H2) for t in toks]
        out = 0
        for j in range(SIMHASH_WIDE_BITS):
            hs = h1 if j < 30 else h2
            votes = sum(1 if (h >> (j % 30)) & 1 else -1 for h in hs)
            if votes > 0:
                out |= 1 << j
        return out

    # lengths straddling the packed-block boundary + tiny/empty arrays;
    # deterministic LCG-ish token streams (nonnegative, < vocab-sized)
    cases = []
    for n in (0, 1, 2, 7, 1022, 1023, 1024, 2047, 2048, 2500):
        toks = [(i * 2654435761 + n * 97) % 50261 for i in range(n)]
        cases.append((n, toks))
    df = spark.createDataFrame(cases, "case_id int, toks array<int>")
    got = {
        r["case_id"]: r["simhash"]
        for r in with_wide_simhash(df, "toks").select("case_id", "simhash").collect()
    }
    for n, toks in cases:
        assert got[n] == ref_simhash(toks), f"len={n}"
