"""Property / mirror tests for the lexical + hybrid retrieval family
(operators/retrieval.py) and the CCNet corpus split (corpus.ccnet_buckets)
beyond the auto-derived oracle parity in test_oracle_parity.py:

- bm25_topk vs an independent pure-Python BM25 over the portable tokenizer
- rank-list shape invariants (dense ranks, self-exclusion, query selector)
- rrf_fusion internal consistency against its two component rankers
- ccnet_buckets vs a pure-pandas tertile mirror
- plan shape: broadcast df/query-term joins, partitioned windows
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from spatialflink_spark import plans
from spatialflink_spark.config import VOCAB_SIZE
from spatialflink_spark.operators.retrieval import (
    BM25_K,
    BM25_QUERY_MOD,
    BM25_S1,
    BM25_S2,
    RRF_DEPTH,
    RRF_K0,
    RRF_SCALE,
    bm25_topk,
    rrf_fusion,
)
from tests.conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def _emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def _py_tokenize(text: str) -> list[int]:
    words = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    out = []
    for w in words:
        a = 0
        for c in w:
            a = (a * 31 + ord(c)) % VOCAB_SIZE
        out.append(a)
    return out


def test_bm25_matches_pure_python(spark):
    """Full independent mirror: integerized BM25 computed in plain Python
    from the raw parquet must reproduce every (q_id, rank, doc_id, bm25)."""
    rows = _docs(spark).select("doc_id", "text").collect()
    tf = {}  # doc_id -> Counter(tok)
    for r in rows:
        tf[r.doc_id] = Counter(_py_tokenize(r.text))
    tf = {d: c for d, c in tf.items() if c}  # postings exclude token-less docs
    dl = {d: sum(c.values()) for d, c in tf.items()}
    df_ = Counter()
    for c in tf.values():
        df_.update(c.keys())
    n, l_tot = len(tf), sum(dl.values())

    want = []
    for q in sorted(d for d in tf if d % BM25_QUERY_MOD == 0):
        scores = {}
        for d, c in tf.items():
            if d == q:
                continue
            s = 0
            for t in tf[q]:
                if t in c:
                    idf = BM25_S1 * (2 * n - 2 * df_[t] + 1) // (2 * df_[t] + 1)
                    tfn = (
                        BM25_S2 * 22 * c[t] * l_tot
                        // (10 * c[t] * l_tot + 3 * l_tot + 9 * dl[d] * n)
                    )
                    s += idf * tfn
            if s > 0:
                scores[d] = s
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:BM25_K]
        want += [(q, i + 1, d, s) for i, (d, s) in enumerate(top)]

    got = [
        (r.q_id, r.rank, r.doc_id, r.bm25)
        for r in bm25_topk(_docs(spark)).orderBy("q_id", "rank").collect()
    ]
    assert got == want


def test_bm25_rank_shape(spark):
    out = bm25_topk(_docs(spark)).collect()
    by_q = {}
    for r in out:
        assert r.doc_id != r.q_id
        assert r.q_id % BM25_QUERY_MOD == 0
        assert r.bm25 > 0
        by_q.setdefault(r.q_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
        assert len(ranks) <= BM25_K


def test_rrf_consistent_with_components(spark):
    """rrf must be exactly the integer fusion of the two component rank
    lists at RRF_DEPTH, and a doc ranked 1 by both rankers must fuse to
    rank 1 for its query."""
    from spatialflink_spark.operators.similarity import cosine_topk_batch

    lex = {
        (r.q_id, r.doc_id): r.rank
        for r in bm25_topk(_docs(spark), k=RRF_DEPTH).collect()
    }
    sem = {
        (r.q_id, r.vec_id): r.rank
        for r in cosine_topk_batch(
            _emb(spark), k=RRF_DEPTH, query_mod=BM25_QUERY_MOD
        ).collect()
    }
    fused = rrf_fusion(_docs(spark), _emb(spark)).collect()
    assert fused
    for r in fused:
        rl = lex.get((r.q_id, r.doc_id), 0)
        rs = sem.get((r.q_id, r.doc_id), 0)
        assert (r.r_lex, r.r_sem) == (rl, rs)
        expect = (RRF_SCALE // (RRF_K0 + rl) if rl else 0) + (
            RRF_SCALE // (RRF_K0 + rs) if rs else 0
        )
        assert r.rrf == expect
    double_winners = {
        q for (q, d), k in lex.items() if k == 1 and sem.get((q, d)) == 1
    }
    top1 = {r.q_id: r.doc_id for r in fused if r.rank == 1}
    for q in double_winners:
        winner = next(d for (qq, d), k in lex.items() if qq == q and k == 1)
        assert top1[q] == winner


def test_ccnet_buckets_matches_pandas_mirror(spark):
    """Exact pure-pandas tertile mirror over the engine's own rarity rows."""
    from spatialflink_spark.operators.corpus import (
        CCNET_GRID,
        ccnet_buckets,
        unigram_rarity,
    )

    r = unigram_rarity(_docs(spark)).toPandas()
    src = {
        row.doc_id: row.source
        for row in _docs(spark).select("doc_id", "source").collect()
    }
    r["gkey"] = r.rarity_sum // (r.n_tok * CCNET_GRID)
    n = len(r)
    csum, cut1, cut2 = 0, None, None
    for gk, cnt in sorted(Counter(r.gkey).items()):
        csum += cnt
        if cut1 is None and 3 * csum >= n:
            cut1 = gk
        if cut2 is None and 3 * csum >= 2 * n:
            cut2 = gk
    r["bucket"] = [
        "head" if g <= cut1 else ("middle" if g <= cut2 else "tail")
        for g in r.gkey
    ]
    r["source"] = [src[d] for d in r.doc_id]
    want = {
        (s, b): (len(g), int(g.n_tok.sum()),
                 round(float(g.rarity_sum.sum()) / float(g.n_tok.sum()), 6))
        for (s, b), g in r.groupby(["source", "bucket"])
    }
    got = {
        (row.source, row.bucket): (row.n_docs, row.n_tok_total, row.rarity_mean)
        for row in ccnet_buckets(_docs(spark)).collect()
    }
    assert got == want
    # tertile property: head and head+middle reach their thirds
    heads = sum(v[0] for (s, b), v in got.items() if b == "head")
    hm = heads + sum(v[0] for (s, b), v in got.items() if b == "middle")
    assert 3 * heads >= n and 3 * hm >= 2 * n


def test_bm25_plan_broadcasts_and_partitions(spark):
    """df / query-term / scalar relations join as broadcasts (the postings
    stream never shuffles for them), aggs keep map-side partials, and the
    final rank window is partitioned by q_id — never global."""
    df = bm25_topk(_docs(spark))
    p = plans.simple_plan(df)
    assert plans.has_broadcast_join(df), p
    assert "CartesianProduct" not in p
    assert plans.has_partial_aggregate(df)
    specs = plans.window_specs(df)
    # two windows: per-doc dl (partitioned by doc_id) and the per-query
    # rank (partitioned by q_id) — neither may run global
    assert specs and all(("q_id" in s or "doc_id" in s) for s in specs), specs


def test_bm25_index_search_equals_inline(spark, tmp_path):
    """Searching the persisted index with a query doc's distinct terms
    (self excluded) must reproduce bm25_topk's rows for that q_id —
    index and inline op share _postings, so any drift is a bug."""
    from spatialflink_spark.operators.retrieval import (
        build_bm25_index,
        search_bm25_index,
    )

    path = str(tmp_path / "bm25")
    build_bm25_index(_docs(spark), path)
    inline = {}
    for r in bm25_topk(_docs(spark)).orderBy("q_id", "rank").collect():
        inline.setdefault(r.q_id, []).append((r.rank, r.doc_id, r.bm25))
    q = 0
    terms = set(_py_tokenize(
        _docs(spark).where(F.col("doc_id") == q).collect()[0].text
    ))
    got = [
        (r.rank, r.doc_id, r.bm25)
        for r in search_bm25_index(
            spark, path, sorted(terms), exclude_doc_id=q
        ).orderBy("rank").collect()
    ]
    assert got == inline[q]


def test_bm25_index_search_prunes_partitions(spark, tmp_path):
    """The search must reach the postings scan as a PARTITION filter on
    tbucket (Hive-style pruning over partitionBy('tbucket')) — a search
    for |T| terms opens only the buckets those terms hash to."""
    import re as _re

    from spatialflink_spark.operators.retrieval import (
        build_bm25_index,
        search_bm25_index,
    )

    path = str(tmp_path / "bm25p")
    build_bm25_index(_docs(spark), path)
    df = search_bm25_index(spark, path, [5, 7, 11])
    p = plans.formatted_plan(df)
    pf = _re.findall(r"PartitionFilters: \[([^\]]*)\]", p)
    assert any("tbucket" in f and "IN" in f for f in pf), p
    # and the term predicate itself pushes to the scan
    assert "PushedFilters" in p and "tok" in p, p


def test_hard_negatives_disjoint_and_ordered(spark):
    """Negatives must be exactly the BM25 list minus the semantic list,
    in BM25 order with dense ranks."""
    from spatialflink_spark.operators.similarity import cosine_topk_batch

    from spatialflink_spark.operators.retrieval import hard_negatives

    lex = {
        (r.q_id, r.doc_id): (r.rank, r.bm25)
        for r in bm25_topk(_docs(spark), k=RRF_DEPTH).collect()
    }
    sem = {
        (r.q_id, r.vec_id)
        for r in cosine_topk_batch(
            _emb(spark), k=RRF_DEPTH, query_mod=BM25_QUERY_MOD
        ).collect()
    }
    got = hard_negatives(_docs(spark), _emb(spark)).collect()
    assert got
    by_q = {}
    for r in got:
        assert (r.q_id, r.doc_id) in lex and (r.q_id, r.doc_id) not in sem
        assert (r.r_lex, r.bm25) == lex[(r.q_id, r.doc_id)]
        by_q.setdefault(r.q_id, []).append((r.rank, r.r_lex))
    for q, pairs in by_q.items():
        pairs.sort()
        assert [p[0] for p in pairs] == list(range(1, len(pairs) + 1)), q
        assert [p[1] for p in pairs] == sorted(p[1] for p in pairs), q
    # completeness: every lex entry outside sem with few-enough lex rank
    # appears (the cut is on the re-rank, so the first k survivors per q)
    for q in {qq for qq, _ in lex}:
        survivors = sorted(
            rl for (qq, d), (rl, _) in lex.items()
            if qq == q and (qq, d) not in sem
        )[:10]
        assert sorted(p[1] for p in by_q.get(q, [])) == survivors, q


def test_temperature_mix_sqrt_rebalance(spark):
    """tau=0.5 semantics: the smallest source keeps 100% (rate 10000),
    rates are non-increasing in source token mass, and each rate equals
    the pure-python floor(sqrt(SCALE * min // toks))."""
    import math

    from spatialflink_spark.operators.mixing import (
        BP,
        TEMP_SCALE,
        temperature_mix_sample,
    )

    words = {
        r.source: r.n_w
        for r in _docs(spark)
        .selectExpr(
            "source",
            "size(filter(split(lower(text), '[^a-z0-9]+'), w -> w <> '')) AS n_w",
        )
        .groupBy("source")
        .agg(F.expr("cast(sum(n_w) as bigint)").alias("n_w"))
        .collect()
    }
    mn = min(v for v in words.values() if v > 0)
    got = {r.source: r.rate_bp for r in temperature_mix_sample(_docs(spark)).collect()}
    assert got
    for s, rate in got.items():
        toks = words[s]
        want = BP if toks == 0 else min(
            BP, math.floor(math.sqrt((TEMP_SCALE * mn) // toks))
        )
        assert rate == want, (s, rate, want)
    assert max(got.values()) == BP  # the smallest source keeps everything


def test_temperature_rates_snapshot_matches_batch(spark):
    """The streaming-face rate table over a sequence snapshot must agree
    with the batch kernel fed the same masses."""
    from spatialflink_spark.operators.mixing import (
        temperature_rates,
        temperature_rates_snapshot,
    )
    from spatialflink_spark.sources.sequences import sequences

    snap = sequences(spark, SF_SMALL)
    got = {
        r.source: r.rate_bp for r in temperature_rates_snapshot(snap).collect()
    }
    want = {
        r.source: r.rate_bp
        for r in temperature_rates(
            snap.select("source", F.col("n_tok").alias("n_w"))
        ).collect()
    }
    assert got == want and got
