"""Corpus-analytics operators — the diagnostics a curation pipeline sets its
thresholds from (no single reference analog; part of the training-data
operator family like operators/text.py): exact token heavy hitters and exact
per-source length quantiles.

Scale notes (100 TB):
- token_freq_topk: explode -> groupBy(token) is one shuffle whose key space
  is the VOCABULARY (bounded, ~50k here), not the corpus — map-side partial
  aggregation collapses each partition to <= |vocab| rows before the
  exchange, and the final cut is TakeOrderedAndProject (per-partition heap,
  driver merge of k). The lossy alternative (Misra-Gries / count-min) is
  only needed when the key space itself is unbounded (e.g. n-gram counts);
  for token ids the exact plan is already scale-safe.
- source_length_quantiles: quantiles are computed on the per-(source,
  n_tok) COUNT distribution — the window cumsum runs over distinct lengths
  per source (bounded by the model context, not by row count), so no
  per-row sort ever happens. Exact type-1 quantiles (smallest value whose
  cumulative count reaches ceil(q/100 * n)) — deterministic integer
  arithmetic, identical in the DuckDB twin; at petabyte scale the same
  shape serves as the exact verifier for approx_percentile sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TOPK_DEFAULT = 20
QUANTILES = (50, 90, 99)


def token_freq_topk(seq: DataFrame, k: int = TOPK_DEFAULT) -> DataFrame:
    """Exact top-k tokens by occurrence count (ties broken by token id),
    with the distinct-document frequency alongside — the heavy-hitters
    table quality filters and tokenizer audits read.
    Output: rank, token, n_occurrences, n_docs."""
    from spatialflink_spark.session import spread

    tok = spread(seq).select(F.explode("tokens").alias("token"), "doc_id")
    agg = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    top = agg.orderBy(
        F.col("n_occurrences").desc(), F.col("token").asc()
    ).limit(k)
    return (
        top.withColumn(
            "rank",
            F.expr(
                "row_number() OVER (ORDER BY n_occurrences DESC, token ASC)"
            ).cast("int"),
        )
        .select("rank", "token", "n_occurrences", "n_docs")
    )


def source_length_quantiles(seq: DataFrame) -> DataFrame:
    """Exact per-source token-length quantiles (type 1: the smallest n_tok
    whose cumulative count reaches ceil(q/100 * n)) — the distribution
    curation length-filters are tuned from.
    Output: source, n_rows, p50, p90, p99."""
    dist = seq.groupBy("source", "n_tok").agg(F.count(F.lit(1)).alias("_c"))
    w = (
        Window.partitionBy("source")
        .orderBy("n_tok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dist.withColumn("_cum", F.sum("_c").over(w))
    tot = dist.groupBy("source").agg(F.sum("_c").alias("n_rows"))
    j = cum.join(tot, "source")
    # cum >= ceil(q*n/100)  <=>  100*cum >= q*n   (cum integer)
    quants = [
        F.min(
            F.when(F.expr(f"100 * _cum >= {q} * n_rows"), F.col("n_tok"))
        ).alias(f"p{q}")
        for q in QUANTILES
    ]
    return j.groupBy("source", "n_rows").agg(*quants)


BOILERPLATE_MIN_BP = 30  # DF floor under the top-k cut: basis points of docs
BOILERPLATE_TOPK = 20


def boilerplate_ngrams(
    docs: DataFrame, min_bp: int = BOILERPLATE_MIN_BP, k: int = BOILERPLATE_TOPK
) -> DataFrame:
    """Corpus-level boilerplate shingle detection (the prerequisite of
    CCNet-style boilerplate removal): word-shingle hashes that occur in at
    least min_bp basis points (0.01%) of documents, ranked by document
    frequency.

    Scale: per-doc DISTINCT shingle hashes (dedup.with_shingle_hashes, the
    staged once-per-row pipeline) -> explode -> groupBy(hash) doc-frequency
    count — map-side partial aggregation collapses each partition before
    the exchange; the threshold compare is integer (10000*df >= min_bp*n),
    the corpus size rides a broadcast one-row crossJoin, and the final cut
    is orderBy().limit(k) = TakeOrderedAndProject. At an unbounded n-gram
    key space a count-min pre-filter would front this shuffle; the exact
    form is its verifier (same posture as token_freq_topk above).
    Output: rank, gram_hash, df, df_frac."""
    from spatialflink_spark.operators.dedup import with_shingle_hashes

    # MATERIALIZE the shingle arrays before the explode (CLAUDE.md
    # invariant: generate re-evaluates an inlined producing expression well
    # beyond once per row — the un-checkpointed form measured 56s vs 6s at
    # the 10x spot check, same 6x-plus blowup decontaminate hit)
    hs = (
        with_shingle_hashes(docs)
        .localCheckpoint(eager=False)
        .select("doc_id", F.explode("_hs").alias("gram_hash"))
    )
    dfreq = hs.groupBy("gram_hash").agg(
        F.expr("cast(count(1) as bigint)").alias("df")
    )
    nd = docs.agg(F.expr("cast(count(1) as bigint)").alias("n_docs"))
    hits = dfreq.crossJoin(F.broadcast(nd)).where(
        F.expr(f"10000 * df >= {min_bp} * n_docs")
    )
    top = hits.orderBy(F.col("df").desc(), F.col("gram_hash").asc()).limit(k)
    return top.withColumn(
        "rank",
        F.expr("row_number() OVER (ORDER BY df DESC, gram_hash ASC)").cast("int"),
    ).select(
        "rank",
        "gram_hash",
        "df",
        F.expr("round(cast(df as double) / n_docs, 6)").alias("df_frac"),
    )


TFIDF_TOPK = 5


def tfidf_topk_terms(docs: DataFrame, k: int = TFIDF_TOPK) -> DataFrame:
    """Per-document top-k distinguishing terms by LOG-FREE TF-IDF
    (score = tf * N / df): the keyword-extraction diagnostic a curation
    pipeline uses to label sources/clusters. log() is deliberately avoided
    (not bit-pinned across engines — same rationale as token_diversity's
    Shannon exclusion); tf * N / df is one IEEE double division of exact
    integers, identical in both dialects, and is order-equivalent to
    tf * log-idf within a document for ranking purposes up to monotonicity
    of the idf transform.

    Scale: tf is the (doc_id, token)-keyed groupBy (map-side combined);
    df aggregates tf by token — key space is the VOCABULARY, so the df
    relation is bounded (~50k rows) and the join back is a BROADCAST at
    any corpus size; N rides a one-row broadcast cross join. The final
    rank window partitions by doc_id over the doc's distinct tokens —
    bounded by document length, never a corpus-wide sort.
    Output: doc_id, rank, tok, tf, df, score."""
    from spatialflink_spark.functions import tokens as T
    from spatialflink_spark.session import spread

    toks = spread(docs).select(
        "doc_id", F.expr(T.spark_tokenize("text")).alias("_t")
    )
    t = toks.select("doc_id", F.explode("_t").alias("tok"))
    # MATERIALIZE: tf feeds BOTH the df aggregation and the score join —
    # un-checkpointed, each consumer re-ran the tokenize+explode+groupBy
    # (3 parquet scans in the plan; the multi-consumer invariant)
    tf = t.groupBy("doc_id", "tok").agg(
        F.expr("cast(count(1) as bigint)").alias("tf")
    ).localCheckpoint(eager=False)
    df = tf.groupBy("tok").agg(F.expr("cast(count(1) as bigint)").alias("df"))
    n = docs.agg(F.expr("cast(count(1) as bigint)").alias("n_docs"))
    s = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.expr("cast(tok as bigint)").alias("tok"),
            "tf",
            "df",
            F.expr("round(cast(tf * n_docs as double) / df, 6)").alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("tok").asc()
    )
    return (
        s.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "tok", "tf", "df", "score")
    )


def source_overlap_matrix(docs: DataFrame) -> DataFrame:
    """Source-level contamination report: near-duplicate pair counts
    BETWEEN (and within) sources — the diagnostic that tells a curation
    pipeline which source pairs share content (mirror sites, scraped
    re-posts, cross-source boilerplate) before mixing rates are set.

    Composes the production wide-fingerprint candidate kernel
    (dedup.simhash_wide_dup_pairs — banded equi-join, never all-pairs),
    joins each pair side to its source, canonicalizes the unordered source
    pair, and aggregates. Scale: the source lookup is a doc_id-keyed join;
    the final groupBy key space is |sources|^2 — tiny at any corpus size.
    Output: source_a, source_b (source_a <= source_b), n_pairs, n_docs
    (distinct documents participating in those pairs)."""
    from spatialflink_spark.operators.dedup import simhash_wide_dup_pairs

    pairs = simhash_wide_dup_pairs(docs).select("left_doc", "right_doc")
    src = docs.select("doc_id", "source")
    j = (
        pairs.join(
            src.withColumnRenamed("doc_id", "left_doc").withColumnRenamed(
                "source", "source_l"
            ),
            "left_doc",
        ).join(
            src.withColumnRenamed("doc_id", "right_doc").withColumnRenamed(
                "source", "source_r"
            ),
            "right_doc",
        )
    )
    e = j.select(
        F.expr("least(source_l, source_r)").alias("source_a"),
        F.expr("greatest(source_l, source_r)").alias("source_b"),
        F.explode(F.expr("array(left_doc, right_doc)")).alias("doc"),
    )
    return e.groupBy("source_a", "source_b").agg(
        F.expr("cast(count(1) div 2 as bigint)").alias("n_pairs"),
        F.expr("cast(count(distinct doc) as bigint)").alias("n_docs"),
    )


def source_vocab_divergence(docs: DataFrame) -> DataFrame:
    """Pairwise vocabulary divergence between sources — the domain-mixing
    diagnostic (how lexically distinct are two sources?) a curation
    pipeline reads before setting mix rates: total-variation distance
    between the per-source token unigram distributions, plus the vocab
    Jaccard overlap.

    LOG-FREE on purpose (same rationale as tfidf_topk_terms / the
    token_diversity Shannon exclusion): TVD needs only |p - q| sums. All
    accumulation stays in EXACT integer space — per shared token the term
    |cnt_a*tot_b - cnt_b*tot_a| (bigint), and the one-sided mass is
    recovered as tot - sum(shared cnt) — so both engines sum identical
    integers in any order; the only doubles are three final divisions of
    exact integers. (At extreme corpus scale the cross term needs
    decimal(38) — tot_a*tot_b overflows bigint past ~3e9 tokens/source;
    documented upgrade, irrelevant at test SFs.)

    Scale: the unigram relation is vocab-bounded (|sources| x |vocab|
    rows after one map-side-combined groupBy), so the token self-join and
    everything after it runs on a bounded relation regardless of corpus
    size; the final output is |sources|^2 rows. Output: source_a,
    source_b, n_shared, vocab_jaccard, tvd."""
    from spatialflink_spark.functions import tokens as T
    from spatialflink_spark.session import spread

    t = spread(docs).select(
        "source", F.explode(F.expr(T.spark_tokenize("text"))).alias("tok")
    )
    # vocab-bounded: materialize the unigram relation once — tot, both
    # sides of the token self-join, and the pair scaffold all fan out from
    # it, and without a barrier each would re-tokenize the whole corpus
    cnt = (
        t.groupBy("source", "tok")
        .agg(F.expr("cast(count(1) as bigint)").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    tot = cnt.groupBy("source").agg(
        F.expr("cast(sum(cnt) as bigint)").alias("tot"),
        F.expr("cast(count(1) as bigint)").alias("vocab"),
    )
    f = cnt.join(F.broadcast(tot.select("source", "tot")), "source")
    a = f.select(
        F.col("source").alias("source_a"),
        "tok",
        F.col("cnt").alias("cnt_a"),
        F.col("tot").alias("tot_a"),
    )
    b = f.select(
        F.col("source").alias("source_b"),
        "tok",
        F.col("cnt").alias("cnt_b"),
        F.col("tot").alias("tot_b"),
    )
    shared = (
        a.join(b, "tok")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.expr("cast(count(1) as bigint)").alias("n_shared"),
            F.expr(
                "cast(sum(abs(cnt_a * tot_b - cnt_b * tot_a)) as bigint)"
            ).alias("s_int"),
            F.expr("cast(sum(cnt_a) as bigint)").alias("sh_a"),
            F.expr("cast(sum(cnt_b) as bigint)").alias("sh_b"),
        )
    )
    ta = tot.select(
        F.col("source").alias("source_a"),
        F.col("tot").alias("tot_a"),
        F.col("vocab").alias("vocab_a"),
    )
    tb = tot.select(
        F.col("source").alias("source_b"),
        F.col("tot").alias("tot_b"),
        F.col("vocab").alias("vocab_b"),
    )
    scaffold = ta.crossJoin(tb).where(F.col("source_a") < F.col("source_b"))
    return scaffold.join(shared, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        F.expr("cast(coalesce(n_shared, 0) as bigint)").alias("n_shared"),
        F.expr(
            "round(cast(coalesce(n_shared, 0) as double)"
            " / (vocab_a + vocab_b - coalesce(n_shared, 0)), 6)"
        ).alias("vocab_jaccard"),
        F.expr(
            "round(0.5 * (cast(coalesce(s_int, 0) as double) / (tot_a * tot_b)"
            " + cast(tot_a - coalesce(sh_a, 0) as double) / tot_a"
            " + cast(tot_b - coalesce(sh_b, 0) as double) / tot_b), 6)"
        ).alias("tvd"),
    )


VOCAB_GROWTH_BUCKET = 100


def vocab_growth(docs: DataFrame, bucket: int = VOCAB_GROWTH_BUCKET) -> DataFrame:
    """Vocabulary growth curve (Heaps-law diagnostic): how many NEW distinct
    tokens each successive block of `bucket` documents contributes, and the
    cumulative vocabulary — the saturation signal that tells a curation
    pipeline when additional data from a source stops adding lexical
    novelty. "First occurrence" is doc_id order (the corpus's canonical
    ingest order), ties within a document collapse to the document.

    Scale: one corpus scan -> groupBy(token) min(doc_id) (vocab-bounded,
    map-side combined); everything after runs on <= |vocab| rows, and the
    cumulative window orders over |vocab|/bucket buckets — never a
    corpus-wide sort. Output: bucket, first_doc, n_docs, n_new_tokens,
    cum_vocab."""
    from spatialflink_spark.functions import tokens as T
    from spatialflink_spark.session import spread

    t = spread(docs).select(
        "doc_id", F.explode(F.expr(T.spark_tokenize("text"))).alias("tok")
    )
    first = t.groupBy("tok").agg(F.expr("min(doc_id)").alias("first_doc"))
    new_per = (
        first.groupBy(F.expr(f"cast(first_doc div {bucket} as bigint)").alias("bucket"))
        .agg(F.expr("cast(count(1) as bigint)").alias("n_new_tokens"))
    )
    docs_per = docs.groupBy(
        F.expr(f"cast(doc_id div {bucket} as bigint)").alias("bucket")
    ).agg(F.expr("cast(count(1) as bigint)").alias("n_docs"))
    w = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs_per.join(new_per, "bucket", "left")
        .select(
            "bucket",
            F.expr(f"cast(bucket * {bucket} as bigint)").alias("first_doc"),
            "n_docs",
            F.expr("cast(coalesce(n_new_tokens, 0) as bigint)").alias(
                "n_new_tokens"
            ),
        )
        .withColumn("cum_vocab", F.sum("n_new_tokens").over(w).cast("bigint"))
    )


CORR_QSCALE = 10_000


def length_quality_corr(docs: DataFrame) -> DataFrame:
    """Per-source Pearson correlation between document length (words) and
    the quality heuristic — the threshold-coupling diagnostic: a source
    where quality is mostly a length proxy needs decoupled filters, one
    where they're independent doesn't.

    Deterministic across engines WITHOUT floating sums: quality (already
    round(,6) and bit-identical in both dialects) is quantized to an
    integer (* CORR_QSCALE, round), then every accumulation is an exact
    bigint sum (n, Σx, Σy, Σx², Σy², Σxy — order-free); the final Pearson
    assembly is a handful of IEEE-pinned double ops (*, -, /, sqrt are all
    correctly rounded) on identical operands. Zero-variance sides yield
    NULL by integer compare, not NaN. (Bigint headroom: n·Σy² stays below
    2^63 up to ~10M docs/source at this QSCALE; past that the sums move to
    decimal(38) — same upgrade note as source_vocab_divergence.)

    Scale: one scan + one map-side-combined groupBy(source); output is
    |sources| rows. Output: source, n_docs, mean_words, mean_quality,
    corr_len_quality."""
    from spatialflink_spark.operators.text import with_quality
    from spatialflink_spark.session import spread

    q = with_quality(spread(docs).select("doc_id", "source", "text"))
    v = q.select(
        "source",
        F.expr("cast(n_words as bigint)").alias("x"),
        F.expr(f"cast(round(quality * {CORR_QSCALE}) as bigint)").alias("y"),
    )
    agg = v.groupBy("source").agg(
        F.expr("cast(count(1) as bigint)").alias("n"),
        F.expr("cast(sum(x) as bigint)").alias("sx"),
        F.expr("cast(sum(y) as bigint)").alias("sy"),
        F.expr("cast(sum(x * x) as bigint)").alias("sxx"),
        F.expr("cast(sum(y * y) as bigint)").alias("syy"),
        F.expr("cast(sum(x * y) as bigint)").alias("sxy"),
    )
    return agg.select(
        "source",
        F.col("n").alias("n_docs"),
        F.expr("round(cast(sx as double) / n, 6)").alias("mean_words"),
        F.expr(f"round(cast(sy as double) / n / {CORR_QSCALE}, 6)").alias(
            "mean_quality"
        ),
        F.expr(
            "case when n * sxx - sx * sx = 0 or n * syy - sy * sy = 0 "
            "then cast(null as double) else "
            "round(cast(n * sxy - sx * sy as double) / "
            "sqrt(cast(n * sxx - sx * sx as double) "
            "* cast(n * syy - sy * sy as double)), 6) end"
        ).alias("corr_len_quality"),
    )


def source_profile_approx(seq: DataFrame) -> DataFrame:
    """SKETCH face of the per-source profile — the single-pass form a
    petabyte run uses where the exact ops are the small-scale verifiers
    (the posture this module's header documents, delivered): t-digest
    quantiles (`percentile_approx`) for the length distribution and
    HyperLogLog++ (`approx_count_distinct`) for the per-source vocabulary,
    one map-side-combined groupBy, mergeable state, NO exact count
    distribution or distinct set ever materialized.

    Deliberately NOT gate-graded: sketch outputs are implementation-defined
    (accuracy-bounded, not value-pinned), so no bit-identical DuckDB twin
    can exist — tests/test_curation_ops.py bounds it against the exact
    source_length_quantiles + a distinct count instead.
    Output: source, n_rows, p50, p90, p99, approx_vocab."""
    # quantiles must weight each ROW once, so aggregate rows and exploded
    # tokens separately: rows for the t-digest, tokens for the HLL
    tok = seq.select("source", F.explode("tokens").alias("tok"))
    lengths = seq.groupBy("source").agg(
        F.expr("cast(count(1) as bigint)").alias("n_rows"),
        F.expr("percentile_approx(n_tok, array(0.5, 0.9, 0.99), 10000)").alias("_q"),
    )
    vocab = tok.groupBy("source").agg(
        F.expr("cast(approx_count_distinct(tok) as bigint)").alias("approx_vocab")
    )
    return (
        lengths.join(vocab, "source")
        .select(
            "source",
            "n_rows",
            F.expr("_q[0]").alias("p50"),
            F.expr("_q[1]").alias("p90"),
            F.expr("_q[2]").alias("p99"),
            "approx_vocab",
        )
    )


RARITY_SCALE = 1_000_000_000


def unigram_rarity(docs: DataFrame) -> DataFrame:
    """Corpus-LM document rarity score — the log-free analog of CCNet-style
    unigram-LM perplexity filtering (Wenzek et al. 2020): score each doc by
    the mean INVERSE corpus frequency of its tokens. log(p) is deliberately
    avoided (not bit-pinned across engines — same rationale as
    token_diversity's Shannon exclusion); floor(RARITY_SCALE / count) is an
    exact bigint per token, so the per-doc accumulation is an
    order-insensitive integer sum and the only double is one final
    division. High score = rare-token-heavy (candidate noise), low score =
    common-token soup — the two tails a curation pipeline clips.

    Scale (100 TB): the count relation is VOCAB-bounded after one map-side-
    combined groupBy, so the join back onto the exploded token stream is a
    BROADCAST at any corpus size; the per-doc sum is a second map-side-
    combined groupBy keyed by doc_id. Two bounded shuffles, zero Python.
    Output: doc_id, n_tok, rarity_sum, rarity_mean, n_hapax."""
    from spatialflink_spark.functions import tokens as T
    from spatialflink_spark.session import spread

    # MATERIALIZE the token arrays: the exploded stream feeds BOTH the
    # vocab count and the rarity join — un-checkpointed, each consumer
    # re-ran the tokenize (2 parquet scans in the plan)
    toks = spread(docs).select(
        "doc_id", F.expr(T.spark_tokenize("text")).alias("_t")
    ).localCheckpoint(eager=False)
    t = toks.select("doc_id", F.explode("_t").alias("tok"))
    cnt = t.groupBy("tok").agg(F.expr("cast(count(1) as bigint)").alias("c"))
    j = t.join(F.broadcast(cnt), "tok")
    return (
        j.groupBy("doc_id")
        .agg(
            F.expr("cast(count(1) as bigint)").alias("n_tok"),
            F.expr(
                f"cast(sum(cast(floor({RARITY_SCALE} / c) as bigint)) as bigint)"
            ).alias("rarity_sum"),
            F.expr(
                "cast(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) as bigint)"
            ).alias("n_hapax"),
        )
        .select(
            "doc_id",
            "n_tok",
            "rarity_sum",
            F.expr(
                "round(cast(rarity_sum as double) / n_tok, 6)"
            ).alias("rarity_mean"),
            "n_hapax",
        )
    )


BIGRAM_MIN_SUPPORT = 5
BIGRAM_TOPK = 20


def bigram_lift_topk(
    docs: DataFrame,
    min_support: int = BIGRAM_MIN_SUPPORT,
    k: int = BIGRAM_TOPK,
) -> DataFrame:
    """Collocation mining: top-k adjacent token bigrams by LIFT
    (m * c_xy / (c_x * c_y), the log-free monotone equivalent of PMI —
    log() excluded as not bit-pinned across engines, same rationale as
    tfidf_topk_terms). Complements boilerplate_ngrams (document-frequency
    heavy hitters) with association STRENGTH — the phrase-detection signal
    a tokenizer-merge or stopword audit reads.

    Bigrams are encoded as ONE bigint key (a * VOCAB_SIZE + b) so the
    count shuffle carries a primitive key, decoded only for the final k
    rows. Scale (100 TB): the bigram groupBy is map-side combined and its
    key space is bounded by min(|V|^2, corpus bigram volume); the
    min_support filter prunes the relation BEFORE the unigram joins; the
    unigram count relation is vocab-bounded (broadcast both joins); m and
    the final cut is TakeOrderedAndProject. m * c_xy needs decimal(38)
    past ~3e9 bigrams x top-pair counts (same documented upgrade as
    source_vocab_divergence's cross term).
    Output: rank, tok_a, tok_b, c_xy, c_x, c_y, lift."""
    from spatialflink_spark.config import VOCAB_SIZE
    from spatialflink_spark.functions import tokens as T
    from spatialflink_spark.session import spread

    # MATERIALIZE the token arrays: they feed BOTH the bigram derivation
    # and the unigram counts — un-checkpointed, each re-ran the tokenize
    toks = spread(docs).select(
        "doc_id", F.expr(T.spark_tokenize("text")).alias("_t")
    ).localCheckpoint(eager=False)
    # MATERIALIZE before the explode (CLAUDE.md invariant — generate
    # re-evaluates an inlined producing expression well beyond once/row)
    bg = (
        toks.select(
            F.expr(
                "CASE WHEN size(_t) >= 2 THEN transform(sequence(1, size(_t) - 1),"
                f" i -> cast(element_at(_t, i) as bigint) * {VOCAB_SIZE}"
                " + element_at(_t, i + 1))"
                " ELSE array() END"
            ).alias("_bg")
        )
        .localCheckpoint(eager=False)
        .select(F.explode("_bg").alias("bg"))
    )
    cxy = bg.groupBy("bg").agg(F.expr("cast(count(1) as bigint)").alias("c_xy"))
    m = cxy.agg(F.expr("cast(sum(c_xy) as bigint)").alias("m"))
    # unigram counts from the SAME token relation (vocab-bounded)
    uni = (
        toks.select(F.explode("_t").alias("tok"))
        .groupBy("tok")
        .agg(F.expr("cast(count(1) as bigint)").alias("c"))
    )
    sup = cxy.where(F.col("c_xy") >= min_support).select(
        "bg",
        "c_xy",
        F.expr(f"cast(bg div {VOCAB_SIZE} as int)").alias("tok_a"),
        F.expr(f"cast(bg % {VOCAB_SIZE} as int)").alias("tok_b"),
    )
    scored = (
        sup.join(
            F.broadcast(uni.select(F.col("tok").alias("tok_a"),
                                   F.col("c").alias("c_x"))),
            "tok_a",
        )
        .join(
            F.broadcast(uni.select(F.col("tok").alias("tok_b"),
                                   F.col("c").alias("c_y"))),
            "tok_b",
        )
        .crossJoin(F.broadcast(m))
        .select(
            "tok_a",
            "tok_b",
            "c_xy",
            "c_x",
            "c_y",
            F.expr(
                "round(cast(m * c_xy as double) / (c_x * c_y), 6)"
            ).alias("lift"),
        )
    )
    top = scored.orderBy(
        F.col("lift").desc(), F.col("tok_a").asc(), F.col("tok_b").asc()
    ).limit(k)
    return top.withColumn(
        "rank",
        F.expr(
            "row_number() OVER (ORDER BY lift DESC, tok_a ASC, tok_b ASC)"
        ).cast("int"),
    ).select("rank", "tok_a", "tok_b", "c_xy", "c_x", "c_y", "lift")


def source_card(docs: DataFrame) -> DataFrame:
    """Per-source DATASET CARD — the one-row-per-source summary a corpus
    release ships (cf. datasheets/data-cards practice): document and word
    volume, quality-filter keep rate, near-duplicate contamination, and
    PII incidence, composed from the engine's own kernels
    (text.with_quality_filter verdicts, dedup.simhash_wide_dup_pairs wide
    fingerprints, text.pii_redact counts) so the card can never drift from
    what the pipeline actually computes.

    Scale (100 TB): each kernel keeps its own bounded shape (per-row
    verdict pass; banded fingerprint equi-join; per-row regex); everything
    after them is |sources|-keyed aggregation, and the final assembly
    joins |sources|-row relations (broadcast). Exact integer sums, three
    final double divisions.
    Output: source, n_docs, n_words, keep_rate, neardup_docs,
    neardup_frac, pii_docs, pii_frac."""
    from spatialflink_spark.operators import dedup as dedup_ops
    from spatialflink_spark.operators.text import pii_redact, with_quality_filter
    from spatialflink_spark.session import spread

    d = spread(docs).select("doc_id", "source", "text")
    src = d.select("doc_id", "source")

    qf = with_quality_filter(d.select("doc_id", "text")).select(
        "doc_id", "n_words", "keep"
    )
    base = (
        qf.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.expr("cast(count(1) as bigint)").alias("n_docs"),
            F.expr("cast(sum(n_words) as bigint)").alias("n_words"),
            # keep is an INT flag (qf_flag_sql casts the CASE to int)
            F.expr("cast(sum(keep) as bigint)").alias("n_keep"),
        )
    )

    wp = dedup_ops.simhash_wide_dup_pairs(d)
    nd = (
        wp.select(F.col("left_doc").alias("doc_id"))
        .union(wp.select(F.col("right_doc").alias("doc_id")))
        .distinct()
    )
    nds = (
        nd.join(src, "doc_id")
        .groupBy("source")
        .agg(F.expr("cast(count(1) as bigint)").alias("neardup_docs"))
    )

    ps = (
        pii_redact(d.select("doc_id", "text"))
        .join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.expr(
                "cast(sum(CASE WHEN n_pii > 0 THEN 1 ELSE 0 END) as bigint)"
            ).alias("pii_docs")
        )
    )

    return (
        base.join(F.broadcast(nds), "source", "left")
        .join(F.broadcast(ps), "source")
        .select(
            "source",
            "n_docs",
            "n_words",
            F.expr("round(cast(n_keep as double) / n_docs, 6)").alias(
                "keep_rate"
            ),
            F.expr("cast(coalesce(neardup_docs, 0) as bigint)").alias(
                "neardup_docs"
            ),
            F.expr(
                "round(cast(coalesce(neardup_docs, 0) as double) / n_docs, 6)"
            ).alias("neardup_frac"),
            "pii_docs",
            F.expr("round(cast(pii_docs as double) / n_docs, 6)").alias(
                "pii_frac"
            ),
        )
    )


DSIR_BUCKETS = 10_007
DSIR_SCALE = 1_000_000


def dsir_importance(
    docs: DataFrame, target_pred: str = "doc_id % 13 = 0"
) -> DataFrame:
    """DSIR-style importance signal for data selection (Xie et al. 2023,
    Data Selection with Importance Resampling): score each document by how
    much its hashed-BIGRAM feature distribution looks like a target slice
    (here the deterministic `doc_id % 13 = 0` probe, the same eval-set
    stand-in decontaminate uses) versus the raw corpus. Log-free variant:
    per feature the Laplace-smoothed frequency ratio
    floor(SCALE·(c_t+1)·R1 / ((c_r+1)·T1)) is an exact bigint, so the
    per-doc accumulation is an order-insensitive integer sum and the
    score is its mean — a monotone per-feature transform of the published
    product-of-ratios weight (log() is not bit-pinned across engines; for
    tail selection the mean-ratio ranking serves the same resampling
    role, and the variant is documented, not hidden).

    Scale (100 TB): the feature space is HASHED to DSIR_BUCKETS buckets
    (the paper's own trick), so both count relations and the totals are
    bucket-bounded — every join is a broadcast at any corpus size; the
    only corpus-scale shuffles are the two bounded count groupBys and the
    per-doc sum. The SCALE·c_t·R1 product needs decimal(38) past ~1e13
    raw features (same documented upgrade as source_vocab_divergence).
    Output: doc_id, is_target, n_feat, imp_sum, imp_mean."""
    from spatialflink_spark.config import VOCAB_SIZE
    from spatialflink_spark.functions import tokens as T
    from spatialflink_spark.session import spread

    toks = spread(docs).select(
        "doc_id", F.expr(T.spark_tokenize("text")).alias("_t")
    )
    feats = (
        toks.select(
            "doc_id",
            F.expr(
                "CASE WHEN size(_t) >= 2 THEN transform(sequence(1, size(_t) - 1),"
                f" i -> (cast(element_at(_t, i) as bigint) * {VOCAB_SIZE}"
                f" + element_at(_t, i + 1)) % {DSIR_BUCKETS})"
                " ELSE array() END"
            ).alias("_f"),
        )
        .localCheckpoint(eager=False)
        .select("doc_id", F.explode("_f").alias("f"))
    )
    tgt = feats.where(F.expr(target_pred)).groupBy("f").agg(
        F.expr("cast(count(1) as bigint)").alias("c_t")
    )
    raw = feats.groupBy("f").agg(
        F.expr("cast(count(1) as bigint)").alias("c_r")
    )
    tot = tgt.agg(F.expr("cast(sum(c_t) as bigint)").alias("t_tot")).crossJoin(
        raw.agg(F.expr("cast(sum(c_r) as bigint)").alias("r_tot"))
    )
    j = (
        feats.join(F.broadcast(tgt), "f", "left")
        .join(F.broadcast(raw), "f")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.expr(
                f"cast(floor(cast({DSIR_SCALE} * (coalesce(c_t, 0) + 1)"
                f" * (r_tot + {DSIR_BUCKETS}) as double)"
                f" / (cast((c_r + 1) as double) * (t_tot + {DSIR_BUCKETS})))"
                " as bigint)"
            ).alias("w"),
        )
    )
    return (
        j.groupBy("doc_id")
        .agg(
            F.expr("cast(count(1) as bigint)").alias("n_feat"),
            F.expr("cast(sum(w) as bigint)").alias("imp_sum"),
        )
        .select(
            "doc_id",
            F.expr("CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END")
            .cast("int")
            .alias("is_target"),
            "n_feat",
            "imp_sum",
            F.expr("round(cast(imp_sum as double) / n_feat, 6)").alias(
                "imp_mean"
            ),
        )
    )


CCNET_GRID = 100_000  # rarity-mean units per grid cell -> <= 10,001 cells


def ccnet_buckets(docs: DataFrame) -> DataFrame:
    """CCNet-style head/middle/tail corpus split (Wenzek et al. 2020): cut
    the per-document unigram-rarity distribution at its tertiles and report
    the per-(source, bucket) volume and mean rarity. `head` = the most
    common-token (lowest-rarity / best-"perplexity") third, `tail` = the
    rarest third — the three slices CCNet samples at different rates.

    Tertile cuts are computed on a BOUNDED rarity grid, not the raw score:
    gkey = rarity_sum div (n_tok * CCNET_GRID) maps the [0, RARITY_SCALE]
    mean-rarity range onto <= 10,001 integer cells, so the cut-point
    cumsum runs over a grid-bounded distribution (the same exact-type-1
    posture as source_length_quantiles) no matter the corpus size —
    never a per-row sort, never a corpus-sized window. Cuts are the
    smallest grid cell whose cumulative count reaches 1/3 (2/3) of docs;
    all arithmetic integer until the one final rounded mean.

    Scale (100 TB): unigram_rarity's two bounded shuffles + one doc_id
    join to recover source + one grid groupBy (<= 10,001 rows, map-side
    combined) + broadcast cut row + one (source, bucket) groupBy.
    Output: source, bucket, n_docs, n_tok_total, rarity_mean."""
    # MATERIALIZE the rarity rows before the fan-out: g feeds both the
    # cut derivation (dist -> cum -> cuts) and the bucket join, and the
    # un-checkpointed form re-evaluated the whole rarity kernel at every
    # consumer (measured 12 Generate / 14 scan nodes in the plan)
    g = (
        unigram_rarity(docs)
        .select(
            "doc_id",
            "n_tok",
            "rarity_sum",
            F.expr(
                f"cast(rarity_sum div (n_tok * {CCNET_GRID}) as bigint)"
            ).alias("gkey"),
        )
        .localCheckpoint(eager=False)
    )
    dist = g.groupBy("gkey").agg(F.expr("cast(count(1) as bigint)").alias("_c"))
    wcum = Window.orderBy("gkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = dist.withColumn("_cum", F.sum("_c").over(wcum))
    tot = dist.agg(F.expr("cast(sum(_c) as bigint)").alias("n"))
    cuts = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.min(F.when(F.expr("3 * _cum >= n"), F.col("gkey"))).alias("cut1"),
            F.min(F.when(F.expr("3 * _cum >= 2 * n"), F.col("gkey"))).alias(
                "cut2"
            ),
        )
    )
    b = g.crossJoin(F.broadcast(cuts)).withColumn(
        "bucket",
        F.expr(
            "CASE WHEN gkey <= cut1 THEN 'head' "
            "WHEN gkey <= cut2 THEN 'middle' ELSE 'tail' END"
        ),
    )
    j = b.join(docs.select("doc_id", "source"), "doc_id")
    return j.groupBy("source", "bucket").agg(
        F.expr("cast(count(1) as bigint)").alias("n_docs"),
        F.expr("cast(sum(n_tok) as bigint)").alias("n_tok_total"),
        F.expr("round(cast(sum(rarity_sum) as double) / sum(n_tok), 6)").alias(
            "rarity_mean"
        ),
    )


FLUENCY_SCALE = 1_000_000


def bigram_fluency(docs: DataFrame) -> DataFrame:
    """Bigram-LM document fluency score — the log-free analog of KenLM
    perplexity filtering (the model-based quality gate CCNet runs after its
    rarity split; Wenzek et al. 2020): score each document by the mean
    corpus-estimated conditional probability of its adjacent token bigrams,
    P(b|a) = c_ab / c_a. High mean = the document's transitions are the
    corpus's common transitions (fluent under the corpus LM); low mean =
    improbable token soup. log(p) is deliberately avoided (not bit-pinned
    across engines — the token_diversity rationale); each occurrence
    contributes the exact bigint floor(c_ab * FLUENCY_SCALE / c_a)
    (c_ab <= c_a always, so contributions live in [0, FLUENCY_SCALE]), and
    the per-doc mean is one exact integer division — order-insensitive,
    zero rounding contract.

    Complements unigram_rarity (unigram statistics cannot see word ORDER;
    a shuffled document scores identically there but collapses here) and
    bigram_lift (corpus-level collocations vs per-document scoring).

    Scale (100 TB): bigrams ride ONE bigint key (a * VOCAB_SIZE + b,
    the bigram_lift encoding); the c_ab relation is bounded by
    min(|V|^2, corpus bigram volume) after a map-side-combined groupBy
    and joins back on the SAME key the explode emits (co-partitioned
    equi-shuffle, AQE-coalesced); the prefix-count relation is
    vocab-bounded -> broadcast; the per-doc sum is a second map-side-
    combined groupBy. c_ab * FLUENCY_SCALE needs decimal(38) past ~9e12
    occurrences of one bigram (the bigram_lift cross-term upgrade note).
    Documents with < 2 tokens have no bigrams and are dropped (the
    doc_repetition contract). Output: doc_id, n_bigrams, fluency_sum,
    fluency_mean (both exact bigints)."""
    from spatialflink_spark.config import VOCAB_SIZE
    from spatialflink_spark.functions import tokens as T
    from spatialflink_spark.session import spread

    # toks feeds BOTH the bigram and the prefix-count derivations; the
    # bigram array feeds the explode (Generate re-evaluates an inlined
    # producer well beyond once/row) — materialize each once (CLAUDE.md
    # multi-consumer invariant)
    toks = (
        spread(docs)
        .select("doc_id", F.expr(T.spark_tokenize("text")).alias("_t"))
        .localCheckpoint(eager=False)
    )
    bgx = (
        toks.where(F.expr("size(_t) >= 2"))
        .select(
            "doc_id",
            F.expr(
                "transform(sequence(1, size(_t) - 1),"
                f" i -> cast(element_at(_t, i) as bigint) * {VOCAB_SIZE}"
                " + element_at(_t, i + 1))"
            ).alias("_bg"),
        )
        .localCheckpoint(eager=False)
        .select("doc_id", F.explode("_bg").alias("bg"))
    )
    # bgx feeds the c_ab groupBy AND the join, but the producer behind the
    # explode is the CHECKPOINTED _bg array — re-running the Generate over
    # cached arrays is cheaper than materializing the exploded relation
    # (measured: ~1.3x faster at sf0.1 without the extra checkpoint)
    cab = bgx.groupBy("bg").agg(F.expr("cast(count(1) as bigint)").alias("c_ab"))
    uni = (
        toks.select(F.explode("_t").alias("tok"))
        .groupBy("tok")
        .agg(F.expr("cast(count(1) as bigint)").alias("c_a"))
    )
    p = (
        bgx.join(cab, "bg")
        .select(
            "doc_id",
            F.expr(f"cast(bg div {VOCAB_SIZE} as int)").alias("tok"),
            "c_ab",
        )
        .join(F.broadcast(uni), "tok")
        .select(
            "doc_id",
            F.expr(f"(c_ab * {FLUENCY_SCALE}) div c_a").alias("_p"),
        )
    )
    agg = p.groupBy("doc_id").agg(
        F.expr("cast(count(1) as bigint)").alias("n_bigrams"),
        F.expr("cast(sum(_p) as bigint)").alias("fluency_sum"),
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        "fluency_sum",
        F.expr("fluency_sum div n_bigrams").alias("fluency_mean"),
    )


KMV_SPACE = 1_000_000_007  # HASH_MOD — the permuted-hash value space


def cardinality_kmv(docs: DataFrame) -> DataFrame:
    """Deterministic cardinality-sketch calibration report — the engine's
    HLL analog: estimate each source's DISTINCT shingle count from 16
    seeded hash minima (the k-minima / MinHash cardinality estimator:
    E[min of n uniforms over [0,S)] ~ S/(n+1), so n ~ k*S/sum(min_i) - 1),
    next to the exact distinct count it approximates.

    Built-in approx_count_distinct (HLL++) is NOT reproducible in another
    engine; this sketch is — the 16 permutations are the MinHash family's
    (a*h+b) % HASH_MOD chains, every minimum is an exact bigint in both
    dialects, and the estimator is one integer division. min() is
    duplicate-INSENSITIVE, so the sketch needs no distinct: it is ONE
    map-side-combined groupBy over the exploded shingle stream with 16
    bounded min aggregates — state per source is 16 bigints at any corpus
    size (the 100 TB path; the exact count's distinct shuffle is the
    calibration basis this report exists to sanity-check, exactly like
    ann_recall carries its exact ranker). Output: source, n_occurrences,
    exact_distinct, est_distinct, err_bp."""
    from spatialflink_spark.operators.dedup import (
        MINHASH_A,
        MINHASH_B,
        N_HASHES,
        with_shingle_hashes,
    )

    hs = (
        with_shingle_hashes(docs.select("doc_id", "text"))
        .join(docs.select("doc_id", "source"), "doc_id")
        .localCheckpoint(eager=False)  # feeds the sketch AND the exact count
        .select("source", F.explode("_hs").alias("h"))
    )
    mins = [
        F.expr(f"min((h * {a} + {b}) % {KMV_SPACE})").alias(f"_m{i}")
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    sk = hs.groupBy("source").agg(
        F.expr("cast(count(1) as bigint)").alias("n_occurrences"), *mins
    )
    exact = hs.groupBy("source").agg(
        F.expr("cast(count(distinct h) as bigint)").alias("exact_distinct")
    )
    sum_m = " + ".join(f"_m{i}" for i in range(N_HASHES))
    est = sk.select(
        "source",
        "n_occurrences",
        F.expr(
            f"cast({N_HASHES} as bigint) * {KMV_SPACE}"
            f" div greatest({sum_m}, 1) - 1"
        ).alias("est_distinct"),
    )
    return est.join(exact, "source").select(
        "source",
        "n_occurrences",
        "exact_distinct",
        "est_distinct",
        F.expr(
            "abs(est_distinct - exact_distinct) * 10000 div exact_distinct"
        ).alias("err_bp"),
    )


BPE_MERGES = 6
BPE_PAIR_BASE = 1 << 17  # > any token id incl. minted ones: unique pair keys


def bpe_merges(docs: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """Mini-BPE tokenizer training IN-ENGINE (Sennrich et al. 2016): for
    `n_merges` rounds, find the corpus's most frequent adjacent token pair
    (ties by (tok_a, tok_b) ascending) and merge its occurrences greedily
    left-to-right (non-overlapping — a run like a,a,a under pair (a,a)
    merges positions 1-2, not 2-3) into a freshly minted id
    VOCAB_SIZE + round. Returns the merge TABLE — the artifact a tokenizer
    trainer ships — plus the post-merge corpus token total per round,
    which grades the merged arrays themselves (every round's counts
    depend on every previous round's merges, so the table is a deep
    end-to-end check of the whole iterative pipeline).

    Scale (100 TB): each round = ONE map-side-combined bigram-count
    shuffle on the encoded single-bigint pair key + a TakeOrdered(1) cut
    + a broadcast one-row crossJoin + a PER-ROW merge fold (aggregate
    with struct state — zero shuffle; the fold's array append is
    O(len^2) worst-case per row in Catalyst's copy-on-append, fine at
    document lengths) + one sum aggregate. The corpus relation is
    localCheckpointed per round (the kmeans posture: round r feeds both
    round r+1's counts and the stats row — unbounded lineage otherwise).
    n_merges is fixed and small like KM_ITERS; a production 32k-merge
    trainer batches rounds with the same plan shape.
    Output: rank, tok_a, tok_b, new_id, n_pairs, total_tok_after."""
    from spatialflink_spark.config import VOCAB_SIZE
    from spatialflink_spark.functions import tokens as T
    from spatialflink_spark.session import spread

    toks = (
        spread(docs)
        .select(
            "doc_id",
            F.expr(
                f"transform({T.spark_tokenize('text')},"
                " x -> cast(x as bigint))"
            ).alias("_t"),
        )
        .localCheckpoint(eager=False)
    )
    stats = None
    for r in range(1, n_merges + 1):
        new_id = VOCAB_SIZE + r - 1
        bg = (
            toks.where(F.expr("size(_t) >= 2"))
            .select(
                F.expr(
                    "transform(sequence(1, size(_t) - 1),"
                    f" i -> element_at(_t, i) * {BPE_PAIR_BASE}"
                    " + element_at(_t, i + 1))"
                ).alias("_bg")
            )
            .localCheckpoint(eager=False)
            .select(F.explode("_bg").alias("bg"))
        )
        top1 = (
            bg.groupBy("bg")
            .agg(F.expr("cast(count(1) as bigint)").alias("n_pairs"))
            .orderBy(F.col("n_pairs").desc(), F.col("bg").asc())
            .limit(1)
            .select(
                F.expr(f"bg div {BPE_PAIR_BASE}").alias("_a"),
                F.expr(f"bg % {BPE_PAIR_BASE}").alias("_b"),
                "n_pairs",
            )
            .localCheckpoint(eager=False)  # feeds the merge AND the stats row
        )
        # greedy left-to-right NON-OVERLAPPING merge via one JVM string
        # replace — r5 ran a per-row aggregate() fold whose
        # concat(acc, array(x)) append is O(len) per element (O(len^2)
        # copy-on-append per row per round, the dominant cost of the op).
        # Encoding: each token wrapped in single commas, tokens joined so
        # separators are DOUBLE commas (",t1,,t2,,t3,"); the search string
        # ",a,,b," can then only match at token boundaries on exact full
        # tokens, and Spark's replace() scans left-to-right consuming each
        # match (never rescanning its own output) — exactly the old fold's
        # pending-token semantics, a run of k equal tokens under a
        # self-pair merging floor(k/2) times (pinned by
        # tests/test_curation_ops.py's adversarial-run + python-mirror
        # tests). Linear in string length, all UTF8String intrinsics.
        parse = (
            "CASE WHEN size(_t) < 2 THEN _t ELSE "
            "transform(split(substring(_m, 2, length(_m) - 2), ',,'), "
            "x -> cast(x as bigint)) END"
        )
        toks = (
            toks.crossJoin(F.broadcast(top1))
            .withColumn(
                "_s",
                F.expr(
                    "concat(',', concat_ws(',,', "
                    "transform(_t, x -> cast(x as string))), ',')"
                ),
            )
            .withColumn(
                "_m",
                F.expr(
                    "replace(_s, concat(',', cast(_a as string), ',,', "
                    f"cast(_b as string), ','), ',{new_id},')"
                ),
            )
            .select("doc_id", F.expr(parse).alias("_t"))
            .localCheckpoint(eager=False)
        )
        after = toks.agg(
            F.expr("cast(sum(size(_t)) as bigint)").alias("total_tok_after")
        )
        row = top1.crossJoin(after).select(
            F.lit(r).cast("int").alias("rank"),
            F.col("_a").alias("tok_a"),
            F.col("_b").alias("tok_b"),
            F.lit(new_id).cast("bigint").alias("new_id"),
            "n_pairs",
            "total_tok_after",
        )
        stats = row if stats is None else stats.unionByName(row)
    return stats
