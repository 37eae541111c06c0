"""Skew handling — the salted repartition must bound the largest partition.

The fixture's `source` column is skewed; hash-partitioning on (source) alone
puts the hot source's rows in one partition. salted_repartition(source) must
spread them across ~salt_buckets partitions (north_rule: explicit salted
hash-partitioner over (source, doc_id) with skew-aware repartitioning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spatialflink_spark.config import DEFAULT_CONFIG as C
from spatialflink_spark.operators.cells import salted_repartition
from spatialflink_spark.sources.sequences import sequences
from tests.conftest import SF_SMALL


def _max_partition_rows(df) -> int:
    counts = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    return max(r["count"] for r in counts)


def test_salted_repartition_bounds_hot_keys(spark):
    seq = sequences(spark, SF_SMALL)
    n_parts = 16
    # artificially concentrate: partition on a single constant-ish key (the
    # degenerate hot-key case — everything lands in one partition)
    hot = seq.withColumn("k", F.lit("hot")).repartition(n_parts, "k")
    salted = salted_repartition(
        seq.withColumn("k", F.lit("hot")), n_parts, C.salt_buckets, "k"
    )
    max_hot = _max_partition_rows(hot)
    max_salted = _max_partition_rows(salted)
    total = seq.count()
    assert max_hot == total  # unsalted: one reducer takes everything
    # salted: largest partition bounded well below the full stream
    assert max_salted <= total / 2
    # and no rows lost
    assert salted.count() == total


def test_ngram_df_cap_bounds_hot_shingle_buckets(spark):
    """Hot-shingle skew bound: with a corpus where one stopword shingle
    appears in EVERY document, the uncapped inverted index would join that
    bucket quadratically (n^2/2 candidate pairs). The DF cap removes it from
    candidate generation, bounding every join bucket at <= cap rows/side,
    while pairs that also share rare shingles keep their EXACT jaccard."""
    from spatialflink_spark.operators.dedup import (
        ngram_jaccard_pairs,
        with_shingle_hashes,
    )

    n_docs = 60
    # every doc: the same hot prefix (shared 3-shingles) + a distinctive
    # tail; consecutive pairs (2i, 2i+1) also share a rare middle phrase
    rows = []
    for i in range(n_docs):
        pair_phrase = f"rare phrase number {i // 2} marker"
        rows.append((i, f"the quick brown fox {pair_phrase} tail{i} end{i} z{i}"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    # cap=8: the 'the quick brown'/'quick brown fox' shingles (DF=60) and the
    # pair phrases' boundary shingles stay iff DF <= 8
    capped = ngram_jaccard_pairs(docs, threshold=0.1, df_cap=8).toPandas()
    uncapped = ngram_jaccard_pairs(docs, threshold=0.1, df_cap=None).toPandas()

    # every planted consecutive pair shares >= 3 rare shingles -> found, with
    # jaccard identical to the uncapped op (verification uses full sets)
    cap_pairs = {(r.left_doc, r.right_doc): r.jaccard for r in capped.itertuples()}
    unc_pairs = {(r.left_doc, r.right_doc): r.jaccard for r in uncapped.itertuples()}
    for i in range(0, n_docs, 2):
        assert (i, i + 1) in cap_pairs, f"planted pair ({i},{i+1}) missed"
        assert cap_pairs[(i, i + 1)] == unc_pairs[(i, i + 1)], "jaccard drifted"
    # and the capped candidate index has NO bucket above the cap
    from pyspark.sql import functions as F

    ex = with_shingle_hashes(docs).select("doc_id", F.explode("_hs").alias("g"))
    freq = ex.groupBy("g").count()
    kept = freq.where(F.col("count") <= 8)
    assert kept.agg(F.max("count")).first()[0] <= 8
    # uncapped max bucket is the full corpus — the quadratic bomb the cap defuses
    assert freq.agg(F.max("count")).first()[0] == n_docs


def test_dedup_components_long_chain(spark):
    """Label propagation must survive a long chain (worst-case diameter) and
    match a pure-python union-find on a mixed chain+clique+singleton graph."""
    from spatialflink_spark.operators.dedup import dedup_components

    pairs = [(i, i + 1) for i in range(0, 20)]            # chain 0..20
    pairs += [(100 + a, 100 + b) for a in range(5) for b in range(a + 1, 5)]
    pairs += [(200, 201)]
    pdf = spark.createDataFrame(pairs, "left_doc bigint, right_doc bigint")
    got = {
        (r.doc_id, r.component)
        for r in dedup_components(pdf, max_iters=30).collect()
    }

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in pairs:
        union(a, b)
    nodes = {n for p in pairs for n in p}
    expect = {(n, find(n)) for n in nodes}
    assert got == expect


def test_components_star_equals_propagation(spark):
    """Large-star/small-star components == plain min-label propagation ==
    python union-find, on adversarial shapes: a hot hub (the skew case the
    star variant exists for), a long chain (worst diameter for propagation),
    and seeded random graphs."""
    import random

    from spatialflink_spark.operators.dedup import (
        dedup_components,
        dedup_components_star,
    )

    def union_find(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    rng = random.Random(42)
    cases = {
        "hub": [(0, i) for i in range(1, 40)],  # star skew: one hot node
        "chain": [(i, i + 1) for i in range(60)],  # max diameter
        "rand1": [(rng.randrange(50), rng.randrange(50)) for _ in range(70)],
        "rand2": [(rng.randrange(80), rng.randrange(80)) for _ in range(50)],
    }
    for name, raw in cases.items():
        edges = [(a, b) for a, b in raw if a != b]
        pairs = spark.createDataFrame(
            [(min(a, b), max(a, b)) for a, b in edges],
            "left_doc bigint, right_doc bigint",
        ).dropDuplicates()
        exp = union_find(edges)
        star = {
            r.doc_id: r.component
            for r in dedup_components_star(pairs).collect()
        }
        # plain propagation needs O(diameter) rounds (60 for the chain) —
        # exactly the regime the O(log^2 n)-round star variant exists for
        prop = {
            r.doc_id: r.component
            for r in dedup_components(pairs, max_iters=100).collect()
        }
        assert star == exp == prop, name
