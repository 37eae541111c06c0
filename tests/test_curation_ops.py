"""Property / equivalence tests for the round-5 selection & repetition
operators (operators/{text,corpus,selection,dedup}.py additions) beyond the
auto-derived oracle parity in test_oracle_parity.py:

- two-stage per-source top-k == the single-window reference plan
- keep-best canonicalization invariants (one canonical per component,
  canonical = argmax quality with doc_id tiebreak)
- shard layout invariants (total partition, dense per-shard positions,
  determinism across runs)
- doc_repetition / token_diversity vs a pure-Python mirror of the portable
  tokenizer pipeline
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from spatialflink_spark.config import VOCAB_SIZE
from tests.conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def _py_words(text: str) -> list[str]:
    """Pure-python mirror of functions/tokens.py spark_words."""
    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


def _py_tokenize(text: str) -> list[int]:
    """Pure-python mirror of functions/tokens.py spark_tokenize."""
    words = _py_words(text)
    out = []
    for w in words:
        a = 0
        for c in w:
            a = (a * 31 + ord(c)) % VOCAB_SIZE
        out.append(a)
    return out


def test_quality_topk_two_stage_equals_window(spark):
    """The bucketed two-stage cut must be answer-identical to one
    row_number window per source."""
    from pyspark.sql.window import Window

    from spatialflink_spark.operators.selection import (
        SEL_K,
        quality_topk_per_source,
    )
    from spatialflink_spark.operators.text import with_quality

    got = quality_topk_per_source(_docs(spark)).orderBy("source", "rank")
    q = with_quality(_docs(spark).select("doc_id", "source", "text")).select(
        "source", "doc_id", "quality"
    )
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    want = (
        q.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= SEL_K)
        .select("source", "rank", "doc_id", "quality")
        .orderBy("source", "rank")
    )
    assert got.collect() == want.collect()


def test_keep_best_invariants(spark):
    from spatialflink_spark.operators.dedup import dedup_keep_best

    rows = dedup_keep_best(_docs(spark)).collect()
    assert rows, "no near-dup components at sf0.001 — vacuous"
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    for comp, members in by_comp.items():
        keeps = [r for r in members if r.keep == 1]
        assert len(keeps) == 1, f"component {comp}: {len(keeps)} canonicals"
        best = max(members, key=lambda r: (r.quality, -r.doc_id))
        assert keeps[0].doc_id == best.doc_id
        # every member of a component resolves to the same root
        assert all(r.component == comp for r in members)


def test_shard_assign_layout(spark):
    from spatialflink_spark.operators.selection import N_SHARDS, shard_assign

    docs = _docs(spark)
    n = docs.count()
    rows = shard_assign(docs).collect()
    assert len(rows) == n, "shard layout must partition the corpus exactly"
    assert len({r.doc_id for r in rows}) == n
    per = Counter(r.shard for r in rows)
    assert set(per) == set(range(N_SHARDS)), "empty shard at 500 docs"
    for s, cnt in per.items():
        pos = sorted(r.pos for r in rows if r.shard == s)
        assert pos == list(range(1, cnt + 1)), f"shard {s}: positions not dense"
    # deterministic: a second run reproduces the exact layout
    again = {(r.doc_id, r.shard, r.pos) for r in shard_assign(docs).collect()}
    assert again == {(r.doc_id, r.shard, r.pos) for r in rows}


def test_doc_repetition_matches_python(spark):
    from spatialflink_spark.operators.text import REP_NGRAM, doc_repetition

    sample = {
        r.doc_id: r.text
        for r in _docs(spark).where("doc_id < 20").collect()
    }
    got = {
        r.doc_id: r
        for r in doc_repetition(_docs(spark).where("doc_id < 20")).collect()
    }
    n = REP_NGRAM
    for doc_id, text in sample.items():
        toks = _py_tokenize(text)
        if len(toks) < n:
            assert doc_id not in got
            continue
        grams = []
        for i in range(len(toks) - n + 1):
            g = toks[i]
            for j in range(1, n):
                g = g * VOCAB_SIZE + toks[i + j]
            grams.append(g)
        c = Counter(grams)
        r = got[doc_id]
        assert r.n_grams == len(grams)
        # rounded-float compare with tolerance: Spark round() is HALF_UP,
        # Python's HALF_EVEN — exact equality lives with the DuckDB oracle
        assert abs(r.dup_gram_frac - (1.0 - len(c) / len(grams))) < 1e-6
        assert abs(r.top_gram_frac - max(c.values()) / len(grams)) < 1e-6


def test_token_diversity_matches_python(spark):
    from spatialflink_spark.operators.text import token_diversity

    sample = {
        r.doc_id: r.text
        for r in _docs(spark).where("doc_id < 20").collect()
    }
    got = {
        r.doc_id: r
        for r in token_diversity(_docs(spark).where("doc_id < 20")).collect()
    }
    for doc_id, text in sample.items():
        toks = _py_tokenize(text)
        if not toks:
            assert doc_id not in got
            continue
        c = Counter(toks)
        r = got[doc_id]
        assert r.n_tok == len(toks)
        assert r.n_distinct == len(c)
        assert abs(r.ttr - len(c) / len(toks)) < 1e-6
        ss = sum(v * v for v in c.values())
        assert abs(r.simpson - (1.0 - ss / len(toks) / len(toks))) < 1e-6


def test_boilerplate_topk_is_bounded_sort(spark):
    """The final cut must be TakeOrderedAndProject (per-partition heap),
    never a global single-task sort."""
    from spatialflink_spark.operators.corpus import boilerplate_ngrams

    plan = boilerplate_ngrams(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_per_row_repetition_plan_has_no_shuffle_ops(spark):
    """doc_repetition and quality_filter are per-row rewrites: their plans
    must contain NO aggregate and NO window operator (the only allowed
    Exchange is session.spread's repartition of the single-file scan)."""
    from spatialflink_spark.operators.text import doc_repetition, quality_filter

    for op in (doc_repetition, quality_filter):
        plan = op(_docs(spark))._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" not in plan, op.__name__
        assert "Window" not in plan, op.__name__
        assert "SortMergeJoin" not in plan, op.__name__


def test_quality_filter_flags_consistent(spark):
    """keep == AND of the four rule flags, and every rule fires somewhere
    on the fixture (no vacuous threshold)."""
    from spatialflink_spark.operators.text import quality_filter

    df = quality_filter(_docs(spark)).toPandas()
    assert (
        df.keep == (df.pass_len & df.pass_rep & df.pass_quality & df.pass_lang)
    ).all()
    for flag in ("pass_len", "pass_rep", "pass_quality"):
        assert df[flag].min() == 0, f"{flag} never fails — vacuous threshold"
        assert df[flag].max() == 1, f"{flag} never passes"
    assert 0 < df.keep.sum() < len(df)


# ---- span_dedup (duplicate-span removal) ------------------------------------


def _py_checksum(toks: list[int]) -> int:
    from spatialflink_spark.config import HASH_MOD

    a = 0
    for t in toks:
        a = (a * 131 + t) % HASH_MOD
    return a


def test_span_dedup_hand_fixture(spark):
    """Hand-computed removal: inter-doc duplicated span (kept only at its
    globally-first occurrence), intra-doc repeat (second occurrence
    removed), short doc (no grams), untouched doc."""
    from spatialflink_spark.operators.dedup import span_dedup

    rows = [
        # doc 0 holds the canonical "alpha beta gamma delta eps" span
        (0, "alpha beta gamma delta eps tail0 tail1"),
        # doc 1 repeats that span at positions 3..7 -> removed
        (1, "x0 y0 alpha beta gamma delta eps"),
        # doc 2: same 5-token span twice (pos 1 and pos 8); pos-8 copy removed
        (2, "p q r s t f0 f1 p q r s t"),
        # doc 3: shorter than the span width -> no grams, untouched
        (3, "one two"),
        # doc 4: all-unique tokens, untouched
        (4, "u0 u1 u2 u3 u4 u5"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r for r in span_dedup(df).collect()
    }
    assert len(got) == 5

    t0 = _py_tokenize(rows[0][1])
    assert got[0]["n_tok"] == 7 and got[0]["n_dup_occ"] == 0
    assert got[0]["n_removed"] == 0
    assert got[0]["kept_checksum"] == _py_checksum(t0)

    t1 = _py_tokenize(rows[1][1])
    assert got[1]["n_dup_occ"] == 1 and got[1]["n_removed"] == 5
    assert got[1]["keep_frac"] == round(2 / 7, 6)
    assert got[1]["kept_checksum"] == _py_checksum(t1[:2])

    t2 = _py_tokenize(rows[2][1])
    assert got[2]["n_tok"] == 12 and got[2]["n_dup_occ"] == 1
    assert got[2]["n_removed"] == 5
    assert got[2]["kept_checksum"] == _py_checksum(t2[:7])

    assert got[3]["n_tok"] == 2 and got[3]["n_removed"] == 0
    assert got[3]["kept_checksum"] == _py_checksum(_py_tokenize(rows[3][1]))
    assert got[4]["n_removed"] == 0


def test_span_dedup_overlapping_spans_union_coverage(spark):
    """Two removed spans overlapping in one doc: covered positions are the
    UNION (no double count)."""
    from spatialflink_spark.operators.dedup import span_dedup

    # doc 10 canonical; doc 11 contains the same 6-token run, so BOTH its
    # 5-gram occurrences (pos 1 and pos 2) are non-canonical -> covered
    # union is pos 1..6 of 8 tokens
    rows = [
        (10, "a1 a2 a3 a4 a5 a6 z0 z1"),
        (11, "a1 a2 a3 a4 a5 a6 w0 w1"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in span_dedup(df).collect()}
    assert got[10]["n_removed"] == 0
    assert got[11]["n_dup_occ"] == 2  # grams at pos 1 and pos 2
    assert got[11]["n_removed"] == 6  # union of [1..5] and [2..6]
    t11 = _py_tokenize(rows[1][1])
    assert got[11]["kept_checksum"] == _py_checksum(t11[6:])


def test_span_dedup_plan_no_cartesian(spark):
    """Candidate generation is an equi-join on the gram hash — never a
    cartesian/nested-loop product."""
    from spatialflink_spark.operators.dedup import span_dedup

    plan = (
        span_dedup(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---- tfidf_topk_terms -------------------------------------------------------


def test_tfidf_matches_python_mirror(spark):
    """Log-free TF-IDF top-k per doc vs a pure-Python mirror over the
    portable tokenizer (exact score + deterministic tie order)."""
    from spatialflink_spark.operators.corpus import TFIDF_TOPK, tfidf_topk_terms

    docs = _docs(spark)
    rows = docs.select("doc_id", "text").collect()
    n_docs = len(rows)
    tf: dict[tuple[int, int], int] = Counter()
    for r in rows:
        for t in _py_tokenize(r["text"]):
            tf[(r["doc_id"], t)] += 1
    df: dict[int, int] = Counter()
    for (_, t) in tf:
        df[t] += 1
    expected = {}
    by_doc: dict[int, list] = {}
    for (d, t), c in tf.items():
        by_doc.setdefault(d, []).append(
            (round(c * n_docs / df[t], 6), t, c)
        )
    for d, terms in by_doc.items():
        terms.sort(key=lambda x: (-x[0], x[1]))
        for rank, (score, t, c) in enumerate(terms[:TFIDF_TOPK], 1):
            expected[(d, rank)] = (t, c, df[t], score)

    got = tfidf_topk_terms(docs).collect()
    assert len(got) == len(expected)
    for r in got:
        t, c, dfv, score = expected[(r["doc_id"], r["rank"])]
        assert (r["tok"], r["tf"], r["df"], r["score"]) == (t, c, dfv, score)


def test_tfidf_df_join_is_broadcast(spark):
    """The vocab-bounded df relation must come back as a broadcast join —
    no shuffle for the idf lookup at any corpus size."""
    from spatialflink_spark.operators.corpus import tfidf_topk_terms

    plan = (
        tfidf_topk_terms(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---- source_overlap_matrix --------------------------------------------------


def test_source_overlap_consistent_with_pair_kernel(spark):
    """Matrix cells sum to the wide-fingerprint pair count, every cell is
    canonically ordered, and n_docs never exceeds 2*n_pairs."""
    from spatialflink_spark.operators.corpus import source_overlap_matrix
    from spatialflink_spark.operators.dedup import simhash_wide_dup_pairs

    docs = _docs(spark)
    m = source_overlap_matrix(docs).collect()
    total_pairs = simhash_wide_dup_pairs(docs).count()
    assert sum(r["n_pairs"] for r in m) == total_pairs
    for r in m:
        assert r["source_a"] <= r["source_b"]
        assert 0 < r["n_docs"] <= 2 * r["n_pairs"]


# ---- source_vocab_divergence ------------------------------------------------


def test_source_vocab_divergence_properties(spark):
    """One row per unordered source pair; tvd in [0,1]; vocab_jaccard in
    (0,1]; n_shared bounded by either side's vocabulary; and tvd agrees
    with a pure-python recomputation on a small slice."""
    from spatialflink_spark.operators.corpus import source_vocab_divergence

    docs = _docs(spark)
    n_src = docs.select("source").distinct().count()
    rows = source_vocab_divergence(docs).collect()
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0.0 <= r["tvd"] <= 1.0
        assert 0.0 < r["vocab_jaccard"] <= 1.0

    # python recomputation for the two lexicographically-first sources
    a, b = sorted({d["source"] for d in docs.select("source").collect()})[:2]
    texts = {
        s: [t["text"] for t in docs.where(F.col("source") == s).collect()]
        for s in (a, b)
    }
    from collections import Counter

    ca = Counter(t for x in texts[a] for t in _py_tokenize(x))
    cb = Counter(t for x in texts[b] for t in _py_tokenize(x))
    ta, tb = sum(ca.values()), sum(cb.values())
    tvd = 0.5 * sum(
        abs(ca.get(t, 0) / ta - cb.get(t, 0) / tb) for t in set(ca) | set(cb)
    )
    got = next(
        r for r in rows if r["source_a"] == a and r["source_b"] == b
    )
    assert abs(got["tvd"] - tvd) < 1e-5
    shared = len(set(ca) & set(cb))
    assert got["n_shared"] == shared
    assert abs(
        got["vocab_jaccard"] - shared / (len(ca) + len(cb) - shared)
    ) < 1e-5


# ---- dedup_size_histogram ---------------------------------------------------


def test_dedup_size_histogram_partitions_corpus(spark):
    """Histogram cells partition the corpus: n_docs sums to the document
    count, the singleton row complements the paired docs, and multi-doc
    cells agree with component sizes recomputed from the star kernel."""
    from collections import Counter

    from spatialflink_spark.operators.dedup import (
        dedup_components_star,
        dedup_size_histogram,
        simhash_wide_dup_pairs,
    )

    docs = _docs(spark)
    hist = {r["size"]: r for r in dedup_size_histogram(docs).collect()}
    n = docs.count()
    assert sum(r["n_docs"] for r in hist.values()) == n
    for size, r in hist.items():
        assert r["n_docs"] == size * r["n_components"]
        assert r["n_components"] > 0

    comps = dedup_components_star(simhash_wide_dup_pairs(docs)).collect()
    by_comp = Counter(r["component"] for r in comps)
    expect = Counter(by_comp.values())
    for size, cnt in expect.items():
        assert hist[size]["n_components"] == cnt
    assert hist[1]["n_components"] == n - len(comps)


# ---- vocab_growth -----------------------------------------------------------


def test_vocab_growth_matches_python_scan(spark):
    """cum_vocab is the running distinct-token count in doc_id order;
    the final bucket's cum_vocab equals the corpus vocabulary; per-bucket
    doc counts partition the corpus."""
    from spatialflink_spark.operators.corpus import (
        VOCAB_GROWTH_BUCKET,
        vocab_growth,
    )

    docs = _docs(spark)
    rows = sorted(vocab_growth(docs).collect(), key=lambda r: r["bucket"])
    texts = sorted(
        ((r["doc_id"], r["text"]) for r in docs.collect()), key=lambda x: x[0]
    )
    assert sum(r["n_docs"] for r in rows) == len(texts)

    seen: set[int] = set()
    per_bucket: dict[int, int] = {}
    for doc_id, text in texts:
        b = doc_id // VOCAB_GROWTH_BUCKET
        for t in _py_tokenize(text):
            if t not in seen:
                seen.add(t)
                per_bucket[b] = per_bucket.get(b, 0) + 1
    cum = 0
    for r in rows:
        assert r["n_new_tokens"] == per_bucket.get(r["bucket"], 0)
        cum += r["n_new_tokens"]
        assert r["cum_vocab"] == cum
        assert r["first_doc"] == r["bucket"] * VOCAB_GROWTH_BUCKET
    assert cum == len(seen)


# ---- length_quality_corr ----------------------------------------------------


def test_length_quality_corr_matches_python(spark):
    """Per-source Pearson r against a pure-python recomputation from the
    same quality table (quantized identically), and r in [-1, 1]."""
    import math

    from spatialflink_spark.operators.corpus import (
        CORR_QSCALE,
        length_quality_corr,
    )
    from spatialflink_spark.operators.text import with_quality

    docs = _docs(spark)
    got = {r["source"]: r for r in length_quality_corr(docs).collect()}
    base = with_quality(docs.select("doc_id", "source", "text")).select(
        "source", "n_words", "quality"
    ).collect()
    by_src: dict[str, list[tuple[int, int]]] = {}
    for r in base:
        # Spark round() is HALF_UP; python round() is HALF_EVEN
        y = int(math.floor(r["quality"] * CORR_QSCALE + 0.5))
        by_src.setdefault(r["source"], []).append((r["n_words"], y))
    assert set(by_src) == set(got)
    for src, pts in by_src.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        r = got[src]
        assert r["n_docs"] == n
        assert abs(r["mean_words"] - sx / n) < 5e-7
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx == 0 or vy == 0:
            assert r["corr_len_quality"] is None
        else:
            want = (n * sxy - sx * sy) / math.sqrt(vx * vy)
            assert abs(r["corr_len_quality"] - want) < 5e-7
            assert -1.0 <= r["corr_len_quality"] <= 1.0


# ---- source_profile_approx (sketch face) ------------------------------------


def test_source_profile_approx_bounded_by_exact(spark):
    """The single-pass sketch profile is accuracy-bounded by the exact
    verifiers: approx quantiles within the length distribution's observed
    span per source (t-digest with accuracy 10000 is exact-ish at this
    cardinality), approx vocabulary within 5% relative error of the exact
    distinct count."""
    from spatialflink_spark.operators.corpus import (
        source_length_quantiles,
        source_profile_approx,
    )
    from spatialflink_spark.sources.sequences import sequences
    from tests.conftest import SF_SMALL

    seq = sequences(spark, SF_SMALL)
    approx = {r["source"]: r for r in source_profile_approx(seq).collect()}
    exact = {r["source"]: r for r in source_length_quantiles(seq).collect()}
    exact_vocab = {
        r["source"]: r["v"]
        for r in seq.select("source", F.explode("tokens").alias("tok"))
        .groupBy("source")
        .agg(F.expr("count(distinct tok)").alias("v"))
        .collect()
    }
    assert set(approx) == set(exact)
    for src, a in approx.items():
        e = exact[src]
        assert a["n_rows"] == e["n_rows"]
        # t-digest at accuracy 10000 over a few hundred rows: quantile must
        # land within the exact [p50, p99] span with generous slack
        for q in ("p50", "p90", "p99"):
            assert e["p50"] * 0.5 <= a[q] <= e["p99"] * 1.5, (src, q)
        # ordered like a quantile vector
        assert a["p50"] <= a["p90"] <= a["p99"]
        ev = exact_vocab[src]
        assert abs(a["approx_vocab"] - ev) <= max(2, 0.05 * ev), (src, ev)


def _py_str_hash(s: str) -> int:
    from spatialflink_spark.config import HASH_MOD

    a = 0
    for c in s:
        a = (a * 31 + ord(c)) % HASH_MOD
    return a


def test_pii_redact_hand_fixture_and_completeness(spark):
    """Hand fixture with known entities: counts match, and the redacted
    hash equals a pure-Python re.sub mirror — which also proves the
    redaction is COMPLETE (the mirror's output provably contains no
    remaining match)."""
    import re as _re

    from spatialflink_spark.operators.text import (
        PII_EMAIL_RE,
        PII_IP_RE,
        PII_PHONE_RE,
        pii_redact,
    )

    rows = [
        # doc_id 1: no injection (1 % {3,5,7} != 0), hand-written PII
        (1, "reach bob.smith+x@mail-host.org or 10.1.2.3 or 555-123-4567 ok"),
        # doc_id 4: uppercase email — (?i) must still catch it
        (4, "ping Bob.X@Example.COM today"),
        # doc_id 2: clean
        (2, "plain text with numbers 123 and dots . but no entities"),
        # doc_id 105 = 3*5*7: all three injected by the operator itself
        (105, "word soup body"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in pii_redact(df).collect()}

    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (1, 1, 1)
    assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_phones"]) == (0, 0, 0)
    assert out[4]["n_emails"] == 1  # case-insensitive match
    assert (out[105]["n_emails"], out[105]["n_ips"], out[105]["n_phones"]) == (
        1, 1, 1,
    )
    assert out[105]["n_pii"] == 3

    # python mirror of inject + redact for every row
    for doc_id, text in rows:
        t = text
        if doc_id % 3 == 0:
            t += f" mail user{doc_id}@example.com"
        if doc_id % 5 == 0:
            t += f" call 555-{doc_id % 1000:03d}-{doc_id % 10000:04d}"
        if doc_id % 7 == 0:
            t += f" host 10.{doc_id % 256}.{doc_id % 250}.{doc_id % 97}"
        red = _re.sub(PII_EMAIL_RE, "<EMAIL>", t)
        red = _re.sub(PII_IP_RE, "<IP>", red)
        red = _re.sub(PII_PHONE_RE, "<PHONE>", red)
        assert out[doc_id]["red_hash"] == _py_str_hash(red), doc_id
        assert out[doc_id]["red_len"] == len(red), doc_id
        # completeness: nothing PII-shaped survives in the mirror output
        for pat in (PII_EMAIL_RE, PII_IP_RE, PII_PHONE_RE):
            assert not _re.search(pat, red), (doc_id, pat)


def test_unigram_rarity_matches_python(spark):
    """rarity_sum / n_hapax vs a pure-Python mirror of the portable
    tokenizer + corpus counts at sf0.001."""
    import math

    from spatialflink_spark.operators.corpus import RARITY_SCALE, unigram_rarity

    docs = _docs(spark).select("doc_id", "text").collect()
    toks = {r["doc_id"]: _py_tokenize(r["text"]) for r in docs}
    cnt = Counter(t for ts in toks.values() for t in ts)
    out = {r["doc_id"]: r for r in unigram_rarity(_docs(spark)).collect()}
    assert set(out) == set(toks)
    for doc_id, ts in toks.items():
        exp_sum = sum(math.floor(RARITY_SCALE / cnt[t]) for t in ts)
        assert out[doc_id]["n_tok"] == len(ts)
        assert out[doc_id]["rarity_sum"] == exp_sum, doc_id
        assert out[doc_id]["n_hapax"] == sum(1 for t in ts if cnt[t] == 1)


def test_semantic_dedup_drop_rule_exact(spark):
    """Given the operator's own cluster assignment, keep/drop must match
    the published rule exactly: drop x iff some lower-id member of x's
    cluster has round-6 cosine >= threshold (left-to-right fold mirror of
    the engine's cosine)."""
    from spatialflink_spark.operators.similarity import (
        SEMDEDUP_THRESHOLD,
        semantic_dedup,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    res = semantic_dedup(emb)
    # the within-cluster stage must be an equi-join, never a cross product
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan

    rows = res.collect()
    assert len(rows) == len(vecs)

    def cos6(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
        na = 0.0
        for x in a:
            na += float(x) * float(x)
        nb = 0.0
        for y in b:
            nb += float(y) * float(y)
        return round(dot / (na**0.5 * nb**0.5), 6)

    by_cid: dict[int, list[int]] = {}
    for r in rows:
        by_cid.setdefault(r["cid"], []).append(r["vec_id"])
    keep = {r["vec_id"]: r["keep"] for r in rows}
    n_dropped = 0
    for cid, members in by_cid.items():
        members.sort()
        for i, v in enumerate(members):
            has_lower_dup = any(
                cos6(vecs[u], vecs[v]) >= SEMDEDUP_THRESHOLD
                for u in members[:i]
            )
            assert keep[v] == (not has_lower_dup), (cid, v)
            n_dropped += has_lower_dup
    assert n_dropped > 0, "fixture produced no semantic dups — vacuous"


def test_bpe_merges_matches_python(spark):
    """Full 6-round trainer vs a pure-Python mirror at sf0.001: pair
    choice (count desc, encoded pair asc), minted ids, raw pair counts,
    and post-merge corpus totals — the totals pin the greedy
    left-to-right NON-OVERLAPPING merge semantics (a run of k equal
    tokens under a self-pair merges floor(k/2) times, not k-1)."""
    from collections import Counter

    from spatialflink_spark.config import VOCAB_SIZE
    from spatialflink_spark.operators.corpus import (
        BPE_MERGES,
        BPE_PAIR_BASE,
        bpe_merges,
    )

    toks = {
        r["doc_id"]: _py_tokenize(r["text"])
        for r in _docs(spark).select("doc_id", "text").collect()
    }

    def merge(ts, a, b, nid):
        out, i = [], 0
        while i < len(ts):
            if i + 1 < len(ts) and ts[i] == a and ts[i + 1] == b:
                out.append(nid)
                i += 2
            else:
                out.append(ts[i])
                i += 1
        return out

    exp = []
    for r in range(1, BPE_MERGES + 1):
        c: Counter = Counter()
        for ts in toks.values():
            c.update(x * BPE_PAIR_BASE + y for x, y in zip(ts, ts[1:]))
        assert c, "corpus ran out of pairs — vacuous"
        n_pairs = max(c.values())
        bg = min(k for k, v in c.items() if v == n_pairs)
        a, b = bg // BPE_PAIR_BASE, bg % BPE_PAIR_BASE
        nid = VOCAB_SIZE + r - 1
        toks = {d: merge(ts, a, b, nid) for d, ts in toks.items()}
        exp.append((r, a, b, nid, n_pairs, sum(len(t) for t in toks.values())))
    got = sorted(
        (
            (r["rank"], r["tok_a"], r["tok_b"], r["new_id"], r["n_pairs"],
             r["total_tok_after"])
            for r in bpe_merges(_docs(spark)).collect()
        )
    )
    assert got == exp
    # non-vacuous overlap semantics: some round merged fewer times than
    # its raw pair count OR pair counts strictly... (overlap shows as
    # total drop < n_pairs); assert at least the totals strictly decrease
    totals = [t for *_, t in exp]
    assert all(x > y for x, y in zip(totals, totals[1:]))


def test_bpe_merge_fold_on_adversarial_runs(spark):
    """The per-row merge fold on crafted inputs the corpus may lack: long
    equal runs under a self-pair (greedy non-overlap = floor(k/2) merges),
    interleavings, and the no-match identity — via one round of the
    trainer on a tiny in-memory corpus engineered so the chosen top pair
    is the self-pair (7, 7)."""
    from spatialflink_spark.config import VOCAB_SIZE
    from spatialflink_spark.operators.corpus import bpe_merges

    rows = [
        (0, "a a a a a"),        # run of 5 equal tokens
        (1, "a a a a"),          # run of 4
        (2, "a b a b a"),        # no adjacent equal pair
        (3, "a a b a a"),        # two isolated pairs
        (4, "c"),                # single token
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["rank"]: r for r in bpe_merges(docs, n_merges=1).collect()}
    r1 = out[1]
    # token id of 'a' via the portable tokenizer
    a = _py_tokenize("a")[0]
    assert (r1["tok_a"], r1["tok_b"]) == (a, a)
    assert r1["new_id"] == VOCAB_SIZE
    # raw adjacent (a, a) count: 4 + 3 + 0 + 2 = 9
    assert r1["n_pairs"] == 9
    # greedy merge count (each merge removes ONE token):
    # floor(5/2) + floor(4/2) + 0 + 2 = 6 — NOT the raw pair count 9
    before = 5 + 4 + 5 + 5 + 1
    assert r1["total_tok_after"] == before - 6


def test_blocklist_filter_matches_python(spark):
    """Counts and keep vs a pure-Python mirror of the injection + word
    split; every rule fires somewhere and keep = (n_blocked == 0)."""
    from spatialflink_spark.operators.text import BLOCKLIST, blocklist_filter

    docs = _docs(spark).select("doc_id", "text").collect()
    out = {r["doc_id"]: r for r in blocklist_filter(_docs(spark)).collect()}
    n_dropped = 0
    for r in docs:
        doc_id, t = r["doc_id"], r["text"]
        if doc_id % 4 == 1:
            t += f" {BLOCKLIST[0]}"
        if doc_id % 6 == 2:
            t += f" {BLOCKLIST[1]} and {BLOCKLIST[1]}"
        if doc_id % 9 == 5:
            t += f" {BLOCKLIST[2]}."
        ws = _py_words(t)
        exp = sum(1 for w in ws if w in BLOCKLIST)
        got = out[doc_id]
        assert got["n_words"] == len(ws), doc_id
        assert got["n_blocked"] == exp, doc_id
        assert got["keep"] == (1 if exp == 0 else 0), doc_id
        n_dropped += exp > 0
    assert 0 < n_dropped < len(docs)


def test_chunk_documents_matches_python(spark):
    """Chunk boundaries, sizes, and checksums vs a pure-Python mirror;
    chunks cover every token (sum of non-overlapped spans == n_tok)."""
    from spatialflink_spark.config import HASH_MOD
    from spatialflink_spark.operators.text import (
        CHUNK_S,
        CHUNK_W,
        chunk_documents,
    )

    docs = _docs(spark).select("doc_id", "text").collect()
    out: dict[tuple, object] = {}
    for r in chunk_documents(_docs(spark)).collect():
        out[(r["doc_id"], r["chunk_idx"])] = r
    n_seen = 0
    for r in docs:
        toks = _py_tokenize(r["text"])
        if not toks:
            continue
        starts = list(range(0, len(toks), CHUNK_S))
        for i, s in enumerate(starts):
            c = toks[s : s + CHUNK_W]
            row = out[(r["doc_id"], i)]
            assert row["offset"] == s
            assert row["n_chunk_tok"] == len(c)
            a = 0
            for t in c:
                a = (a * 131 + t) % HASH_MOD
            assert row["chunk_hash"] == a, (r["doc_id"], i)
            n_seen += 1
        # stride covers every token: last start within CHUNK_S of the end
        assert starts[-1] + CHUNK_W >= len(toks) or CHUNK_S <= CHUNK_W
    assert n_seen == len(out)


def test_cardinality_kmv_matches_python(spark):
    """Minima, counts, estimator, and err_bp vs a pure-Python mirror of the
    shingle-hash + permutation chain at sf0.001; the 16-minima estimate
    must land within 3x of truth on every source (k=16 => ~25% stderr; 3x
    is a loose determinism-preserving sanity band, not a precision
    claim)."""
    from spatialflink_spark.config import HASH_MOD
    from spatialflink_spark.operators.corpus import KMV_SPACE, cardinality_kmv
    from spatialflink_spark.operators.dedup import MINHASH_A, MINHASH_B, N_HASHES

    docs = _docs(spark).select("doc_id", "source", "text").collect()

    def shingle_hashes(text):
        ws = _py_words(text)
        sh = (
            [" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)]
            if len(ws) >= 3
            else [" ".join(ws)]
        )
        out = []
        for s in sh:
            a = 0
            for c in s:
                a = (a * 31 + ord(c)) % HASH_MOD
            out.append(a)
        return set(out)

    per_src: dict[str, list] = {}
    occ: dict[str, int] = {}
    for r in docs:
        hs = shingle_hashes(r["text"])
        per_src.setdefault(r["source"], set()).update(hs)
        occ[r["source"]] = occ.get(r["source"], 0) + len(hs)
    out = {r["source"]: r for r in cardinality_kmv(_docs(spark)).collect()}
    assert set(out) == set(per_src)
    for src, hs in per_src.items():
        r = out[src]
        assert r["n_occurrences"] == occ[src]
        assert r["exact_distinct"] == len(hs)
        sum_m = sum(
            min((h * a + b) % KMV_SPACE for h in hs)
            for a, b in zip(MINHASH_A, MINHASH_B)
        )
        est = N_HASHES * KMV_SPACE // max(sum_m, 1) - 1
        assert r["est_distinct"] == est, src
        assert r["err_bp"] == abs(est - len(hs)) * 10000 // len(hs)
        assert len(hs) / 3 <= est <= len(hs) * 3, (src, est, len(hs))


def test_l2_topk_batch_two_stage_equals_window(spark):
    """The two-stage per-(query, bucket) cut must be answer-identical to
    one direct row_number window per query."""
    from pyspark.sql.window import Window

    from spatialflink_spark.operators.similarity import (
        DEFAULT_K,
        QUERY_MOD,
        _km_quant,
        l2_topk_batch,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    got = l2_topk_batch(emb).orderBy("q_id", "rank").collect()
    base = emb.select("vec_id", F.expr(_km_quant("embedding")).alias("qv"))
    q = base.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"), F.col("qv").alias("q_qv")
    )
    scored = base.join(F.broadcast(q), F.col("vec_id") != F.col("q_id")).select(
        "q_id",
        "vec_id",
        F.expr(
            "aggregate(zip_with(qv, q_qv, (a, b) -> (a - b) * (a - b)),"
            " cast(0 as bigint), (s, v) -> s + v)"
        ).alias("d2"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("d2").asc(), F.col("vec_id").asc())
    want = (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= DEFAULT_K)
        .select("q_id", "rank", "vec_id", "d2")
        .orderBy("q_id", "rank")
        .collect()
    )
    assert got == want


def test_pq_batch_recall_shape_and_floor(spark):
    """Every query reports k exact rows and a recall in [0, 1]; the mean
    recall clears the adversarial floor. RANDOM 64-dim vectors are the
    worst case for 4x8 codebooks (no structure to compress — measured
    mean 0.16 at sf0.001 vs a random top-k overlap of k/(n-1) ~ 0.08);
    assert >= 1.5x random. The regime PQ exists for (real clusters) is
    asserted as cluster precision in test_naive_equivalence."""
    from spatialflink_spark.operators.similarity import DEFAULT_K, pq_batch_recall

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    n = emb.count()
    rows = pq_batch_recall(emb).collect()
    assert rows
    for r in rows:
        assert r["n_exact"] == DEFAULT_K
        assert 0 <= r["n_hit"] <= DEFAULT_K
        assert abs(r["recall"] - r["n_hit"] / DEFAULT_K) < 1e-9
    mean = sum(r["recall"] for r in rows) / len(rows)
    assert mean >= 1.5 * DEFAULT_K / (n - 1), mean


def test_decontaminate_bloom_equals_exact(spark):
    """The Bloom prefilter must be answer-invisible: identical rows to the
    exact decontamination at sf0.001 (same-golden contract)."""
    from spatialflink_spark.operators.dedup import (
        decontaminate,
        decontaminate_bloom,
    )

    for t in (3, 10):
        exact = {
            (r["doc_id"], r["n_shared_shingles"])
            for r in decontaminate(_docs(spark), min_overlap=t).collect()
        }
        bloom = {
            (r["doc_id"], r["n_shared_shingles"])
            for r in decontaminate_bloom(_docs(spark), min_overlap=t).collect()
        }
        assert bloom == exact, t
        assert exact, f"fixture has no contaminated docs at t={t} — vacuous"


def test_decon_index_search_equals_inline(spark, tmp_path):
    """Build-once/probe-many: searching the PERSISTED decon index
    (build_decon_index -> search_decon_index) must reproduce the inline
    decontaminate_bloom exactly — the index layout changes I/O, never the
    answer."""
    from spatialflink_spark.operators.dedup import (
        build_decon_index,
        decontaminate_bloom,
        search_decon_index,
    )

    docs = _docs(spark)
    path = str(tmp_path / "decon_idx")
    build_decon_index(docs, path)
    got = {
        (r["doc_id"], r["n_shared_shingles"])
        for r in search_decon_index(
            spark, path, docs.where("doc_id % 13 <> 0")
        ).collect()
    }
    want = {
        (r["doc_id"], r["n_shared_shingles"])
        for r in decontaminate_bloom(docs).collect()
    }
    assert got == want and want


def test_bloom_prefilter_sound_and_effective(spark):
    """Soundness: bloom_hits >= the exact per-doc shared-shingle count for
    EVERY doc (no false negatives — the property the same-golden contract
    rests on). Effectiveness: the candidate set is smaller than the corpus
    (the prefilter actually prunes)."""
    from spatialflink_spark.operators.dedup import (
        bloom_flagged,
        with_shingle_hashes,
    )

    docs = _docs(spark)
    probe_hs: set = set()
    for r in with_shingle_hashes(docs.where("doc_id % 13 = 0")).collect():
        probe_hs.update(r["_hs"])
    rows = bloom_flagged(docs).collect()
    n_cand = n_true = n_cand50 = n_true50 = 0
    for r in rows:
        exact = sum(1 for h in r["_hs"] if h in probe_hs)
        assert r["bloom_hits"] >= exact, r["doc_id"]
        n_cand += r["bloom_hits"] >= 3
        n_true += exact >= 3
        n_cand50 += r["bloom_hits"] >= 10
        n_true50 += exact >= 10
    assert n_true <= n_cand < len(rows)
    # at the gate's high-threshold operating point the prefilter must
    # actually prune: candidates a strict minority of the corpus
    assert n_true50 <= n_cand50 < len(rows) // 2


def test_prototypicality_matches_python(spark):
    """cid/d2 must equal the brute-force argmin against the engine's own
    centroid table in exact integer math; ranks and the basis-point keep
    cut mirror in python."""
    from spatialflink_spark.operators.similarity import (
        KM_QSCALE,
        PROTO_DROP_BP,
        kmeans_centroids,
        prototypicality,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    cents = {r["cid"]: r["cq"] for r in kmeans_centroids(emb).collect()}
    qvs = {
        r["vec_id"]: [round(float(x) * KM_QSCALE) for x in r["embedding"]]
        for r in emb.collect()
    }
    out = {r["vec_id"]: r for r in prototypicality(emb).collect()}
    assert set(out) == set(qvs)
    by_cid: dict[int, list] = {}
    for vid, qv in qvs.items():
        best = min(
            (sum((a - b) * (a - b) for a, b in zip(qv, cq)), cid)
            for cid, cq in cents.items()
        )
        assert (out[vid]["cid"], out[vid]["d2"]) == (best[1], best[0]), vid
        by_cid.setdefault(best[1], []).append((best[0], vid))
    n_dropped = 0
    for cid, members in by_cid.items():
        members.sort()
        cut = len(members) * PROTO_DROP_BP // 10000
        for rank0, (_, vid) in enumerate(members):
            assert out[vid]["rank_c"] == rank0 + 1, vid
            assert out[vid]["keep"] == (rank0 + 1 > cut), vid
            n_dropped += rank0 + 1 <= cut
    assert n_dropped > 0, "fixture dropped nothing — vacuous"


def test_bigram_lift_matches_python(spark):
    """Full-result equivalence vs a pure-Python mirror (counts, lift,
    ordering) at sf0.001, plus key-encoding round-trip."""
    from spatialflink_spark.config import VOCAB_SIZE
    from spatialflink_spark.operators.corpus import (
        BIGRAM_MIN_SUPPORT,
        BIGRAM_TOPK,
        bigram_lift_topk,
    )

    docs = _docs(spark).select("doc_id", "text").collect()
    uni: Counter = Counter()
    big: Counter = Counter()
    for r in docs:
        ts = _py_tokenize(r["text"])
        uni.update(ts)
        big.update(zip(ts, ts[1:]))
    m = sum(big.values())
    scored = [
        (round(m * c / (uni[a] * uni[b]), 6), a, b, c)
        for (a, b), c in big.items()
        if c >= BIGRAM_MIN_SUPPORT
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    exp = scored[:BIGRAM_TOPK]

    out = bigram_lift_topk(_docs(spark)).collect()
    assert len(out) == len(exp)
    for row, (lift, a, b, c) in zip(sorted(out, key=lambda r: r["rank"]), exp):
        assert (row["tok_a"], row["tok_b"]) == (a, b), row
        assert row["c_xy"] == c
        assert row["c_x"] == uni[a] and row["c_y"] == uni[b]
        assert row["lift"] == lift
        # encoding round-trip stays in range
        assert 0 <= a < VOCAB_SIZE and 0 <= b < VOCAB_SIZE


def test_bigram_fluency_matches_python(spark):
    """Exact-integer fluency sums vs a pure-Python mirror of the tokenizer
    + corpus bigram/prefix counts at sf0.001."""
    from spatialflink_spark.operators.corpus import FLUENCY_SCALE, bigram_fluency

    docs = _docs(spark).select("doc_id", "text").collect()
    uni: Counter = Counter()
    big: Counter = Counter()
    toks = {}
    for r in docs:
        ts = _py_tokenize(r["text"])
        toks[r["doc_id"]] = ts
        uni.update(ts)
        big.update(zip(ts, ts[1:]))
    out = {r["doc_id"]: r for r in bigram_fluency(_docs(spark)).collect()}
    exp_ids = {d for d, ts in toks.items() if len(ts) >= 2}
    assert set(out) == exp_ids
    for doc_id in exp_ids:
        ts = toks[doc_id]
        ps = [big[(a, b)] * FLUENCY_SCALE // uni[a] for a, b in zip(ts, ts[1:])]
        assert out[doc_id]["n_bigrams"] == len(ps), doc_id
        assert out[doc_id]["fluency_sum"] == sum(ps), doc_id
        assert out[doc_id]["fluency_mean"] == sum(ps) // len(ps), doc_id
        # every contribution is a probability in the fixed-point domain
        assert all(0 <= p <= FLUENCY_SCALE for p in ps)


def test_source_card_consistent_with_kernels(spark):
    """The card must agree with its three source kernels run standalone:
    total docs partition the corpus, keep_rate == quality_filter keep
    fraction, neardup_docs == wide-pair id union per source, pii_docs ==
    pii_redact incidence per source."""
    from spatialflink_spark.operators.corpus import source_card
    from spatialflink_spark.operators.dedup import simhash_wide_dup_pairs
    from spatialflink_spark.operators.text import pii_redact, quality_filter

    docs = _docs(spark)
    card = {r["source"]: r for r in source_card(docs).collect()}
    n_total = docs.count()
    assert sum(r["n_docs"] for r in card.values()) == n_total

    src = {r["doc_id"]: r["source"] for r in docs.select("doc_id", "source").collect()}

    keep = {r["doc_id"]: r["keep"] for r in quality_filter(docs).collect()}
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for d, s in src.items():
        agg[s][0] += 1
        agg[s][1] += keep[d]
    for s, (n, k) in agg.items():
        assert card[s]["n_docs"] == n
        assert card[s]["keep_rate"] == round(k / n, 6), s

    wp = simhash_wide_dup_pairs(docs).collect()
    nd_ids = {r["left_doc"] for r in wp} | {r["right_doc"] for r in wp}
    nd_by_src = defaultdict(int)
    for d in nd_ids:
        nd_by_src[src[d]] += 1
    for s, r in card.items():
        assert r["neardup_docs"] == nd_by_src.get(s, 0), s

    pii = {r["doc_id"]: r["n_pii"] for r in pii_redact(docs).collect()}
    pii_by_src = defaultdict(int)
    for d, n in pii.items():
        pii_by_src[src[d]] += 1 if n > 0 else 0
    for s, r in card.items():
        assert r["pii_docs"] == pii_by_src.get(s, 0), s


def test_dsir_importance_matches_python_and_separates(spark):
    """Exact python mirror of the hashed-bigram ratio sums at sf0.001,
    plus the behavioral property the op exists for: target-slice docs
    must score higher on average than raw docs."""
    import math

    from spatialflink_spark.config import VOCAB_SIZE
    from spatialflink_spark.operators.corpus import (
        DSIR_BUCKETS,
        DSIR_SCALE,
        dsir_importance,
    )

    docs = _docs(spark).select("doc_id", "text").collect()
    feats = {}
    for r in docs:
        ts = _py_tokenize(r["text"])
        feats[r["doc_id"]] = [
            (a * VOCAB_SIZE + b) % DSIR_BUCKETS for a, b in zip(ts, ts[1:])
        ]
    tgt: Counter = Counter()
    raw: Counter = Counter()
    for d, fs in feats.items():
        raw.update(fs)
        if d % 13 == 0:
            tgt.update(fs)
    t_tot, r_tot = sum(tgt.values()), sum(raw.values())
    out = {r["doc_id"]: r for r in dsir_importance(_docs(spark)).collect()}
    assert set(out) == {d for d, fs in feats.items() if fs}
    for d, fs in feats.items():
        if not fs:
            continue
        exp = sum(
            math.floor(
                (DSIR_SCALE * (tgt.get(f, 0) + 1) * (r_tot + DSIR_BUCKETS))
                / ((raw[f] + 1) * (t_tot + DSIR_BUCKETS))
            )
            for f in fs
        )
        assert out[d]["imp_sum"] == exp, d
        assert out[d]["n_feat"] == len(fs)
        assert out[d]["is_target"] == (1 if d % 13 == 0 else 0)

    t_means = [r["imp_mean"] for r in out.values() if r["is_target"] == 1]
    r_means = [r["imp_mean"] for r in out.values() if r["is_target"] == 0]
    assert sum(t_means) / len(t_means) > sum(r_means) / len(r_means)


def test_media_dedup_ranks_and_hashes(spark):
    """Rank mechanics on a crafted duplicate-payload fixture (the sf0.01
    corpus has no raw-byte duplicates — hash parity alone grades there)
    plus md5 agreement with hashlib over the utf-8 payload bytes."""
    import hashlib

    from spatialflink_spark.operators.multimodal import media_dedup

    rows = [(0, "same text"), (5, "same text"), (3, "same text"), (1, "other")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in media_dedup(docs).collect()}
    assert len(out) == 4
    h = hashlib.md5("same text".encode()).hexdigest()
    assert [out[d]["payload_hash"] for d in (0, 3, 5)] == [h, h, h]
    assert [out[d]["dup_rank"] for d in (0, 3, 5)] == [1, 2, 3]
    assert out[1]["dup_rank"] == 1
    assert out[1]["payload_hash"] == hashlib.md5(b"other").hexdigest()
    for d, r in out.items():
        assert r["media_type"] == ("image", "audio", "video")[d % 3]
