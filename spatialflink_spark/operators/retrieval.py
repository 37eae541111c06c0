"""Lexical + hybrid retrieval over the documents table — the text-side
counterpart of operators/similarity.py's embedding retrieval family and the
other half of what a training-data curation pipeline runs (hard-negative
mining, eval-set contamination lookups, seed-document expansion).

Reference analog: the query-set kNN shape (knn/KNNQuery.java:49 takes a
query set against the full stream; PointPointTKNNQuery.java:181-380 ranks
per query id) — re-expressed over an inverted token index instead of a
spatial grid, per SURVEY.md §2.7's top-k family.

Design notes (the repo's dialect contract):
- BM25 is computed LOG-FREE and ALL-INTEGER. Classic BM25 is
  sum_t log((N - df + 0.5)/(df + 0.5)) * tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl)).
  log() is excluded (not bit-pinned across engines — the same rationale as
  tfidf_topk_terms / bigram_lift_topk in operators/corpus.py), so the idf
  factor keeps the Robertson ratio un-logged, and every per-term
  contribution is the product of two exact integer floors:
      idf_i = S1 * (2N - 2df + 1) div (2df + 1)           -- x2 clears 0.5
      tfn_i = S2 * 22 * tf * L div (10*tf*L + 3*L + 9*dl*N)
  where k1 = 1.2 and b = 0.75 are folded into the integer constants
  (multiply numerator and denominator by 10*L; avgdl = L/N stays exact as
  the L/N pair). The per-(query, doc) score is an order-insensitive BIGINT
  sum of those products — bit-identical in Spark (`div`) and DuckDB (`//`).
- Overflow headroom: S2 * 22 * tf * L must fit int64 — holds through
  ~4e14/tf_max total corpus tokens at S2 = 1000; past that the documented
  upgrade is decimal(38,0) on the tfn numerator (same note as
  bigram_lift_topk's cross term).

Scale notes (100 TB):
- The postings relation (doc_id, tok, tf) is ONE map-side-combined groupBy
  of the exploded token stream; dl rides a window over the same partitioning
  (no second scan, no join). df is vocab-bounded -> broadcast; the query
  term table is |queries| x |distinct terms per doc| -> broadcast; N and L
  ride a one-row broadcast crossJoin. The only corpus-sized shuffles are
  the postings groupBy and the per-(q_id, doc_id) score sum.
- The final cut is a per-query row_number window: each partition holds one
  query's candidates (bounded by the posting lists its terms touch), the
  same posture as _batch_topk_two_stage's stage-2 in similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# query table: every 41st doc — the SAME selector as the embedding-side
# query_table (similarity.py QUERY_MOD), so lexical and semantic rank lists
# share query ids and rrf_fusion can join them.
BM25_QUERY_MOD = 41
BM25_K = 10
BM25_S1 = 10_000  # idf scale
BM25_S2 = 1_000  # tf-norm scale (bounded by 2.2 * S2 per term)

RRF_K0 = 60  # the standard RRF dampening constant
RRF_SCALE = 1_000_000  # rrf_i = SCALE div (K0 + rank): exact integer
RRF_DEPTH = 20  # how deep each ranker's list goes before fusion


def _bm25_contrib_sql(s1: int, s2: int) -> str:
    """Per-term BM25 contribution over columns tf, dl, df, n_docs, l_tot —
    two exact integer floors multiplied (see module docstring)."""
    idf = f"(cast({s1} as bigint) * (2 * n_docs - 2 * df + 1) div (2 * df + 1))"
    tfn = (
        f"(cast({s2} as bigint) * 22 * tf * l_tot "
        f"div (10 * tf * l_tot + 3 * l_tot + 9 * dl * n_docs))"
    )
    return f"({idf} * {tfn})"


def _postings(docs: DataFrame):
    """Shared inverted-index derivation: returns (toks, postings, dfreq,
    scal) where postings = (doc_id, tok, tf, dl), dfreq = (tok, df) is
    vocab-bounded, and scal is the one-row (n_docs, l_tot) corpus stats
    relation. Used by both the inline bm25_topk and build_bm25_index so
    the index can never drift from the inline op."""
    from spatialflink_spark.functions import tokens as T
    from spatialflink_spark.session import spread

    toks = (
        spread(docs)
        .select("doc_id", F.expr(T.spark_tokenize("text")).alias("_t"))
        # materialize before the explodes (CLAUDE.md invariant: generate
        # re-evaluates an inlined producing expression well beyond once/row)
        .localCheckpoint(eager=False)
    )
    # dl (doc length) = size of the token array, attached BEFORE the
    # explode: it is constant per row, so carrying it through the groupBy
    # key (functionally dependent on doc_id — group set unchanged) replaces
    # the old sum(tf)-over-doc WINDOW and its extra Exchange with zero work
    # (sum of tf over a doc IS the token count, by construction).
    t = toks.select(
        "doc_id",
        F.expr("cast(size(_t) as bigint)").alias("dl"),
        F.explode("_t").alias("tok"),
    )
    # MATERIALIZE: postings feeds three consumers (dfreq, scal, the
    # candidate join) — un-checkpointed, each re-ran the explode+groupBy
    # (8 Generate nodes in the plan). At cluster scale this is a
    # write-once intermediate table, the minhash_lsh_pairs posture.
    #
    # The repartition("doc_id") is LOAD-BEARING for the scoring stage, not
    # cosmetic: the per-(q_id, doc_id) score sum does map-side partial
    # aggregation over |Q| x posting-list candidates, and it only collapses
    # a (query, doc) pair's shared-term rows BEFORE the shuffle when the
    # doc's postings are co-located. Leaving the groupBy's (doc_id, dl,
    # tok) partitioning scattered each doc's terms across partitions and
    # tripled the sf1 scoring wall (measured 10.5s vs 3.3s; the old window
    # form got the same co-location implicitly from its partitionBy
    # exchange — this keeps the exchange and drops the window's sort).
    postings = (
        t.groupBy("doc_id", "dl", "tok")
        .agg(F.expr("cast(count(1) as bigint)").alias("tf"))
        .select("doc_id", "tok", "tf", "dl")
        .repartition("doc_id")
        .localCheckpoint(eager=False)
    )
    dfreq = postings.groupBy("tok").agg(
        F.expr("cast(count(1) as bigint)").alias("df")
    )
    scal = postings.agg(
        F.expr("cast(count(distinct doc_id) as bigint)").alias("n_docs"),
        F.expr("cast(sum(tf) as bigint)").alias("l_tot"),
    )
    return toks, postings, dfreq, scal


def bm25_topk(
    docs: DataFrame, k: int = BM25_K, query_mod: int = BM25_QUERY_MOD
) -> DataFrame:
    """Exact top-k BM25 retrieval of corpus documents per query document
    (the query's distinct tokens form a bag-of-words query; self-matches
    excluded, every other document is a candidate through the inverted
    index). Scores are exact BIGINTs (log-free integerized BM25, module
    docstring). Output: q_id, rank, doc_id, bm25."""
    toks, postings, dfreq, scal = _postings(docs)
    qterms = (
        toks.where(F.col("doc_id") % query_mod == 0)
        .select(F.col("doc_id").alias("q_id"), F.explode("_t").alias("tok"))
        .distinct()
    )
    cand = (
        postings.join(F.broadcast(qterms), "tok")
        .where(F.col("doc_id") != F.col("q_id"))
        .join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(scal))
    )
    scored = cand.groupBy("q_id", "doc_id").agg(
        F.expr(f"cast(sum({_bm25_contrib_sql(BM25_S1, BM25_S2)}) as bigint)").alias(
            "bm25"
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "doc_id", "bm25")
    )


def rrf_fusion(
    docs: DataFrame,
    emb: DataFrame,
    k: int = BM25_K,
    depth: int = RRF_DEPTH,
    query_mod: int = BM25_QUERY_MOD,
) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion (Cormack et al. 2009):
    fuse the lexical BM25 rank list with the semantic exact-cosine rank
    list for the SAME query ids (doc_id and vec_id share the id space in
    the test tables; the embedding of document d is the row vec_id = d).

    rrf = SCALE div (K0 + r_lex) + SCALE div (K0 + r_sem), a missing side
    contributing 0 — exact integer arithmetic, so the fused ranking is
    bit-pinned. r_lex / r_sem are reported with 0 = absent from that
    ranker's depth-deep list.

    Scale: both inputs are already top-`depth` per query (|queries| x depth
    rows each), so the fusion join and final window are bounded by the
    query count — negligible next to the rankers themselves.
    Output: q_id, rank, doc_id, rrf, r_lex, r_sem."""
    from spatialflink_spark.operators.similarity import cosine_topk_batch

    lex = bm25_topk(docs, k=depth, query_mod=query_mod).select(
        "q_id", "doc_id", F.col("rank").alias("r_lex")
    )
    sem = cosine_topk_batch(emb, k=depth, query_mod=query_mod).select(
        "q_id", F.col("vec_id").alias("doc_id"), F.col("rank").alias("r_sem")
    )
    # full-outer ALIGNMENT as union + groupBy instead of a full_outer join:
    # a full outer join of two stats-less relations plans as a sort-merge
    # join (two sorted exchanges); the union form is ONE hash aggregation
    # over the same |Q| x depth rows. Ranks are >= 1 when present, so
    # max(r, 0-fill) recovers exactly the coalesce(r, 0) of the join form
    # and "rank 0 = absent from that list" is unchanged.
    both = lex.select(
        "q_id", "doc_id", "r_lex", F.lit(0).alias("r_sem")
    ).unionByName(
        sem.select("q_id", "doc_id", F.lit(0).alias("r_lex"), "r_sem")
    )
    fused = both.groupBy("q_id", "doc_id").agg(
        F.max("r_lex").alias("_rl"), F.max("r_sem").alias("_rs")
    ).select(
        "q_id",
        "doc_id",
        F.expr(
            f"cast(CASE WHEN _rl = 0 THEN 0 "
            f"ELSE {RRF_SCALE} div ({RRF_K0} + _rl) END "
            f"+ CASE WHEN _rs = 0 THEN 0 "
            f"ELSE {RRF_SCALE} div ({RRF_K0} + _rs) END as bigint)"
        ).alias("rrf"),
        F.expr("cast(_rl as int)").alias("r_lex"),
        F.expr("cast(_rs as int)").alias("r_sem"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "doc_id", "rrf", "r_lex", "r_sem")
    )


# ---------------------------------------------------------------------------
# Persisted inverted index — the BUILD-once/SEARCH-many face of bm25_topk,
# mirroring similarity.build_ivf_index (reference analog: the grid index
# built once per stream config and reused by every query,
# UniformGrid.java:74-85). At 100 TB a retrieval service never re-derives
# postings per query: it builds the index in one batch pass and serves
# term lookups against a token-bucketed layout.
# ---------------------------------------------------------------------------

N_TBUCKETS = 64  # postings partition key: tok % N_TBUCKETS


def build_bm25_index(docs: DataFrame, path: str, n_buckets: int = N_TBUCKETS) -> None:
    """Persist the BM25 inverted index:

    - <path>/postings: (tok, doc_id, tf, dl, df) PARTITIONED BY
      tbucket = tok % n_buckets — df denormalized onto each posting so a
      search needs no join beyond the one-row stats broadcast.
    - <path>/stats: one row (n_docs, l_tot, n_buckets).

    The partitionBy('tbucket') layout is the point at scale: a search for
    |T| terms reads ONLY the <= |T| buckets those terms hash to
    (Hive-style partition pruning at the scan, asserted in tests), not the
    whole postings relation. Built from the SAME _postings derivation as
    the inline op, so index and inline results cannot drift."""
    _, postings, dfreq, scal = _postings(docs)
    full = (
        postings.join(F.broadcast(dfreq), "tok")
        .withColumn("tbucket", F.expr(f"cast(tok % {n_buckets} as int)"))
    )
    full.write.mode("overwrite").partitionBy("tbucket").parquet(f"{path}/postings")
    scal.withColumn("n_buckets", F.lit(n_buckets).cast("int")).write.mode(
        "overwrite"
    ).parquet(f"{path}/stats")


def search_bm25_index(
    spark,
    path: str,
    terms: list[int],
    k: int = BM25_K,
    exclude_doc_id: int | None = None,
) -> DataFrame:
    """SEARCH half over a persisted index: score the bag-of-words `terms`
    against the postings, reading ONLY the token buckets the terms hash to
    (tbucket IN (...) is a partition filter — unprobed buckets' files are
    never opened; tok IN (...) then prunes within the bucket, and both
    predicates push down to the parquet scan). Same integer BM25 as
    bm25_topk — answer-identical for the same term set (pinned by an
    equivalence test). For query-TABLE workloads join a term relation
    instead of inlining literals; this entry point serves the
    single-query/service shape. Output: rank, doc_id, bm25."""
    stats = spark.read.parquet(f"{path}/stats")
    srow = stats.collect()[0]
    n_buckets = int(srow["n_buckets"])
    tset = sorted({int(t) for t in terms})
    if not tset:
        raise ValueError("search_bm25_index: empty term set")
    buckets = sorted({t % n_buckets for t in tset})
    scan = (
        spark.read.parquet(f"{path}/postings")
        .where(F.col("tbucket").isin(buckets))
        .where(F.col("tok").isin(tset))
    )
    if exclude_doc_id is not None:
        scan = scan.where(F.col("doc_id") != exclude_doc_id)
    cand = scan.crossJoin(F.broadcast(stats.select("n_docs", "l_tot")))
    scored = cand.groupBy("doc_id").agg(
        F.expr(f"cast(sum({_bm25_contrib_sql(BM25_S1, BM25_S2)}) as bigint)").alias(
            "bm25"
        )
    )
    top = scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(k)
    return top.withColumn(
        "rank",
        F.expr("row_number() OVER (ORDER BY bm25 DESC, doc_id ASC)").cast("int"),
    ).select("rank", "doc_id", "bm25")


HARDNEG_K = 10


def hard_negatives(
    docs: DataFrame,
    emb: DataFrame,
    k: int = HARDNEG_K,
    depth: int = RRF_DEPTH,
    query_mod: int = BM25_QUERY_MOD,
) -> DataFrame:
    """Hard-negative mining for contrastive training (the DPR/ANCE recipe:
    BM25-retrieved candidates that the semantic ranker does NOT consider
    close are the hardest negatives — lexically confusable, semantically
    distant). For each query: the depth-deep BM25 list anti-joined against
    the depth-deep exact-cosine list, keeping BM25 order, cut to k.

    Scale: both inputs are already per-query top-`depth` (bounded), so the
    anti-join and re-rank window are |queries| x depth — negligible next
    to the rankers. Output: q_id, rank, doc_id, bm25, r_lex."""
    from spatialflink_spark.operators.similarity import cosine_topk_batch

    lex = bm25_topk(docs, k=depth, query_mod=query_mod).select(
        "q_id", "doc_id", F.col("rank").alias("r_lex"), "bm25"
    )
    sem = cosine_topk_batch(emb, k=depth, query_mod=query_mod).select(
        "q_id", F.col("vec_id").alias("doc_id")
    )
    # sem is |Q| x depth by construction — explicit broadcast (the ranked
    # list has no stats, so the anti-join would otherwise sort-merge)
    neg = lex.join(F.broadcast(sem), ["q_id", "doc_id"], "left_anti")
    w = Window.partitionBy("q_id").orderBy(F.col("r_lex").asc())
    return (
        neg.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "doc_id", "bm25", "r_lex")
    )
