"""Similarity search over embedding vectors — brute-force + LSH-bucketed ANN.

First-class training-data ops over the `embeddings` table
(vec_id bigint, embedding array<float>, label int):

- cosine_topk: exact brute-force top-k by cosine vs a query vector. The
  baseline (and the oracle for ANN recall). Dot products run entirely in
  codegen via zip_with + aggregate in double precision — no Python.
- cosine_topk_ivf: sign-bit bucket (random-hyperplane LSH with axis-aligned
  planes on the first `sign_bits` dims); the query probes only its own
  bucket. At 100 TB scale the bucket id is the shuffle/partition key and the
  probe touches 1/2^bits of the data; brute force stays as the verification
  path. Same output shape, bucketed semantics (documented approximation).

Both have exact DuckDB oracle twins (same summation order, double math,
round(6)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUERY_VEC_ID = 0  # deterministic query: the embedding of vec_id 0
DEFAULT_K = 10
SIGN_BITS = 4


def _cos_expr(a: str, b: str) -> str:
    """cosine(a, b) in double precision, left-to-right summation."""
    dot = (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        "cast(0.0 as double), (s, v) -> s + v)"
    )
    na = (
        f"aggregate({a}, cast(0.0 as double), "
        "(s, x) -> s + cast(x as double) * cast(x as double))"
    )
    nb = (
        f"aggregate({b}, cast(0.0 as double), "
        "(s, x) -> s + cast(x as double) * cast(x as double))"
    )
    return f"round({dot} / (sqrt({na}) * sqrt({nb})), 6)"


def _norm_expr(col: str) -> str:
    """sqrt of the squared-norm aggregate — EXACTLY the factor _cos_expr
    divides by, staged once per VECTOR instead of recomputed once per
    scored PAIR (guide §2.3 "don't compute things you throw away": the old
    per-pair form re-ran both norm passes |pairs| times; same doubles, same
    order, so cos_sim is bit-identical)."""
    return (
        f"sqrt(aggregate({col}, cast(0.0 as double), "
        "(s, x) -> s + cast(x as double) * cast(x as double)))"
    )


def _cos_pre_expr(a: str, b: str, sna: str, snb: str) -> str:
    """cosine(a, b) with PRE-STAGED per-vector norms sna/snb — the same
    double-precision operations in the same order as _cos_expr (sqrt(na)
    and sqrt(nb) are just column references now), only the dot product is
    per-pair work."""
    dot = (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        "cast(0.0 as double), (s, v) -> s + v)"
    )
    return f"round({dot} / ({sna} * {snb}), 6)"


def _with_query(emb: DataFrame) -> DataFrame:
    from spatialflink_spark.session import spread

    q = emb.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_emb"),
        F.expr(_norm_expr("embedding")).alias("_snq"),
    )
    # spread: a single-file embeddings scan otherwise scores every cosine
    # serially on one core
    return (
        spread(emb.where(F.col("vec_id") != QUERY_VEC_ID))
        .withColumn("_snv", F.expr(_norm_expr("embedding")))
        .crossJoin(F.broadcast(q))
    )


def _topk_ranked(scored: DataFrame, k: int) -> DataFrame:
    """Bounded top-k of a scored relation: (rank, vec_id, label, cos_sim).

    orderBy().limit(k) compiles to TakeOrderedAndProject — a per-partition
    size-k heap cut merged on the driver — so no task ever sorts more than
    its own partition and the merge sees <= partitions * k rows. The rank
    window that follows runs over <= k rows (single task, bounded by k —
    fine at any scale). This replaces the round-3 un-partitioned
    row_number() window, which sorted EVERY scored row in one task — the
    same windowAll anti-pattern the grid kNN avoids (knn.py:9-16)."""
    top = scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(k)
    return (
        top.withColumn(
            "rank",
            F.expr(
                "row_number() OVER (ORDER BY cos_sim DESC, vec_id ASC)"
            ).cast("int"),
        )
        .select("rank", "vec_id", "label", "cos_sim")
    )


def cosine_topk(emb: DataFrame, k: int = DEFAULT_K) -> DataFrame:
    """Exact top-k by (cosine desc, vec_id asc) vs the query vector."""
    scored = _with_query(emb).select(
        "vec_id",
        "label",
        F.expr(_cos_pre_expr("embedding", "q_emb", "_snv", "_snq")).alias("cos_sim"),
    )
    return _topk_ranked(scored, k)


def bucket_expr(col: str, bits: int = SIGN_BITS) -> Column:
    """IVF/LSH bucket id: sign bits of the first `bits` dimensions."""
    terms = " + ".join(
        f"(CASE WHEN element_at({col}, {i + 1}) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )
    return F.expr(f"cast({terms} as int)")


def cosine_topk_ivf(emb: DataFrame, k: int = DEFAULT_K, bits: int = SIGN_BITS) -> DataFrame:
    """ANN variant: probe only the query's sign bucket, then exact top-k
    within it. Recall < 1 by design; the brute-force op is the oracle for
    measuring it."""
    b = emb.withColumn("bucket", bucket_expr("embedding", bits)).withColumn(
        "_snv", F.expr(_norm_expr("embedding"))
    )
    qb = b.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("bucket").alias("q_bucket"),
        F.col("embedding").alias("q_emb"),
        F.col("_snv").alias("_snq"),
    )
    cand = (
        b.where(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(qb), F.col("bucket") == F.col("q_bucket"))
        .select(
            "vec_id",
            "label",
            F.expr(_cos_pre_expr("embedding", "q_emb", "_snv", "_snq")).alias(
                "cos_sim"
            ),
        )
    )
    return _topk_ranked(cand, k)


DUP_COS_THRESHOLD = 0.4


def embedding_dup_pairs(emb: DataFrame, threshold: float = DUP_COS_THRESHOLD) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all pairs (a < b) with
    cosine >= threshold — the exact baseline for embedding dedup.

    Scale path: at 10^9+ vectors the candidate generation becomes the
    sign-bucket equi-join (bucket_expr) or IVF-centroid blocking, with this
    exact pairwise check only inside blocks; the all-pairs form here is the
    oracle those approximations are measured against (same role as the
    reference's RealTimeNaive paths)."""
    norm = (
        "sqrt(aggregate(embedding, cast(0.0 as double), "
        "(s, x) -> s + cast(x as double) * cast(x as double)))"
    )
    from spatialflink_spark.session import spread

    base = spread(emb).select("vec_id", "embedding", F.expr(norm).alias("_n"))
    l = base.select(
        F.col("vec_id").alias("left_vec"),
        F.col("embedding").alias("l_emb"),
        F.col("_n").alias("l_n"),
    )
    r = base.select(
        F.col("vec_id").alias("right_vec"),
        F.col("embedding").alias("r_emb"),
        F.col("_n").alias("r_n"),
    )
    dot = (
        "aggregate(zip_with(l_emb, r_emb, (x, y) -> cast(x as double) * cast(y as double)), "
        "cast(0.0 as double), (s, v) -> s + v)"
    )
    # norms precomputed per vector (once, not per pair) — the division
    # happens in the same double order as the oracle, so round(6) agrees
    pairs = l.join(r, F.col("left_vec") < F.col("right_vec")).select(
        "left_vec",
        "right_vec",
        F.expr(f"round({dot} / (l_n * r_n), 6)").alias("cos_sim"),
    )
    return pairs.where(F.col("cos_sim") >= threshold)


def _hamming_masks(bits: int, radius: int) -> list[int]:
    """All XOR masks of `bits` bits with popcount <= radius, ascending."""
    return sorted(m for m in range(1 << bits) if bin(m).count("1") <= radius)


# default blocking config: tuned for the production dedup regime (true
# near-dups, cos >= 0.9, where sign bits almost all agree) — 9/256 buckets
# probed. For weak thresholds (cos ~0.4) blocking fundamentally can't prune
# much (per-bit agreement is only ~0.63); use (bits=4, hamming=2) for 92%
# recall at ~70% of pairs probed, or fall back to the all-pairs baseline.
DUP_BLOCK_BITS = 8
DUP_BLOCK_HAMMING = 1


def embedding_dup_pairs_blocked(
    emb: DataFrame,
    threshold: float = DUP_COS_THRESHOLD,
    bits: int = DUP_BLOCK_BITS,
    hamming: int = DUP_BLOCK_HAMMING,
) -> DataFrame:
    """Scale-safe embedding near-dup pairs: sign-bucket blocking + exact
    cosine only within blocks — the production form of embedding_dup_pairs
    (which stays as the all-pairs oracle this is measured against; analog of
    the reference's grid candidate pruning, UniformGrid.java:368-395).

    Candidate generation is a pure EQUI-join: the left side explodes each
    vector to its probe buckets (own bucket XOR every mask with popcount <=
    `hamming`), the right side keeps its own bucket. A pair (a < b) is a
    candidate iff their sign buckets differ in <= `hamming` bits; probe
    buckets are distinct, so each candidate pair joins exactly once (no
    dedup pass needed). Exact cosine then verifies candidates only.

    Cost: each vector appears sum(C(bits, i), i<=hamming) times on the left;
    the join shuffles on the bucket id. Defaults (8 bits, hamming 1) probe
    9/256 of the bucket space; at production scale bits ~ 16 probes
    17/65536. True near-dups (cos >= 0.9) agree on almost every sign bit,
    so recall stays ~1 there (tested on planted duplicates); on the
    fixture's much weaker cos ~0.4 pairs, (bits=4, hamming=2) recovers 92%
    recall at the cost of probing most of the space — measured in
    tests/test_naive_equivalence.py.
    """
    norm = (
        "sqrt(aggregate(embedding, cast(0.0 as double), "
        "(s, x) -> s + cast(x as double) * cast(x as double)))"
    )
    from spatialflink_spark.session import spread

    base = spread(emb).select(
        "vec_id",
        "embedding",
        F.expr(norm).alias("_n"),
        bucket_expr("embedding", bits).alias("bucket"),
    )
    masks = _hamming_masks(bits, hamming)
    probes = ", ".join(f"bucket ^ {m}" for m in masks)
    l = base.select(
        F.col("vec_id").alias("left_vec"),
        F.col("embedding").alias("l_emb"),
        F.col("_n").alias("l_n"),
        F.explode(F.expr(f"array({probes})")).alias("probe"),
    )
    r = base.select(
        F.col("vec_id").alias("right_vec"),
        F.col("embedding").alias("r_emb"),
        F.col("_n").alias("r_n"),
        F.col("bucket").alias("r_bucket"),
    )
    dot = (
        "aggregate(zip_with(l_emb, r_emb, (x, y) -> cast(x as double) * cast(y as double)), "
        "cast(0.0 as double), (s, v) -> s + v)"
    )
    cand = l.join(
        r,
        (F.col("probe") == F.col("r_bucket"))
        & (F.col("left_vec") < F.col("right_vec")),
    )
    pairs = cand.select(
        "left_vec",
        "right_vec",
        F.expr(f"round({dot} / (l_n * r_n), 6)").alias("cos_sim"),
    )
    return pairs.where(F.col("cos_sim") >= threshold)


def cosine_topk_ivf_multiprobe(
    emb: DataFrame, k: int = DEFAULT_K, bits: int = SIGN_BITS
) -> DataFrame:
    """Multi-probe ANN: probe the query's sign bucket plus every bucket at
    Hamming distance 1 (bits+1 buckets of 2^bits) — the standard recall
    recovery for sign-LSH, still touching only (bits+1)/2^bits of the data.
    Same output shape as cosine_topk; recall measured against it in tests."""
    b = emb.withColumn("bucket", bucket_expr("embedding", bits)).withColumn(
        "_snv", F.expr(_norm_expr("embedding"))
    )
    qb = b.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("bucket").alias("q_bucket"),
        F.col("embedding").alias("q_emb"),
        F.col("_snv").alias("_snq"),
    )
    probe = " OR ".join(
        ["bucket = q_bucket"]
        + [f"bucket = (q_bucket ^ {1 << i})" for i in range(bits)]
    )
    cand = (
        b.where(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(qb), F.expr(probe))
        .select(
            "vec_id",
            "label",
            F.expr(_cos_pre_expr("embedding", "q_emb", "_snv", "_snq")).alias(
                "cos_sim"
            ),
        )
    )
    return _topk_ranked(cand, k)


# ---------------------------------------------------------------------------
# k-means IVF — real learned-centroid inverted-file ANN (the production IVF
# shape: Lloyd iterations -> cluster assignment -> probe nearest clusters),
# alongside the cheap sign-bucket variants above. All clustering arithmetic
# runs in deterministic QUANTIZED INTEGER space (round(x * QSCALE)):
# integer sums are associative, so Spark's unordered partial aggregation and
# DuckDB's sequential one agree bit-for-bit — the float-mean summation-order
# trap that would otherwise flip near-tie assignments between dialects never
# arises (production IVF quantizes anyway — this is PQ-style honesty, not a
# test crutch). The exact re-rank inside probed clusters uses the ORIGINAL
# float vectors via the same _cos_expr as every other op.
# ---------------------------------------------------------------------------

KM_QSCALE = 10_000
KM_CENTROIDS = 8
KM_ITERS = 3
KM_PROBE = 2


def _km_quant(col: str) -> str:
    """array<bigint> quantization of a float vector."""
    return f"transform({col}, x -> cast(round(cast(x as double) * {KM_QSCALE}) as bigint))"


# per-row squared-L2 to one packed centroid struct `c`
_KM_CDIST = (
    "aggregate(zip_with(qv, c.cq, (a, b) -> (a - b) * (a - b)), "
    "cast(0 as bigint), (s, v) -> s + v)"
)

# argmin over the packed centroid array with (dist, cid) tie-break — struct
# ordering is lexicographic, so array_min IS the deterministic argmin. Pure
# per-row codegen: assignment costs NO shuffle (the centroid table is one
# packed broadcast row), where a crossJoin+groupBy assignment would shuffle
# an n_centroids-amplified corpus with the embedding inside the grouping key.
_KM_ASSIGN = f"array_min(transform(_cents, c -> struct({_KM_CDIST} as d, c.cid as cid))).cid"


def _packed_centroids(cent: DataFrame) -> DataFrame:
    """One row: _cents array<struct<cid int, cq array<bigint>>> — the
    broadcastable packed form of the centroid table (order fixed by sort)."""
    return cent.agg(
        F.expr("array_sort(collect_list(struct(cid, cq)))").alias("_cents")
    )


def kmeans_centroids(
    emb: DataFrame, n_centroids: int = KM_CENTROIDS, iters: int = KM_ITERS
) -> DataFrame:
    """(cid int, cq array<bigint>): quantized centroids after `iters` Lloyd
    iterations. Deterministic: init = the vectors with the `n_centroids`
    smallest vec_ids; assignment = argmin by (squared-L2, cid); update =
    per-dimension floor(mean) in integer space; an emptied cluster keeps its
    previous centroid. Everything stays in-plan (broadcast centroid table,
    posexplode + groupBy update) — no driver collect; the per-iteration
    centroid relation is n_centroids rows."""
    from spatialflink_spark.session import spread

    q = spread(emb).select(
        "vec_id", F.expr(_km_quant("embedding")).alias("qv")
    ).localCheckpoint(eager=False)
    cent = q.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("qv").alias("cq")
    )
    for _ in range(iters):
        # checkpoint the (tiny) centroid relation per round: cent_{i-1}
        # feeds cent_i twice (assignment AND the emptied-cluster fallback),
        # so without a materialization point the lineage doubles per
        # iteration — 2^iters - 1 full-corpus aggregation subtrees in the
        # plan (same fix as dedup_components_star's per-round checkpoint)
        cent = cent.localCheckpoint(eager=False)
        assigned = q.crossJoin(F.broadcast(_packed_centroids(cent))).select(
            "vec_id", "qv", F.expr(_KM_ASSIGN).alias("cid")
        )
        upd = (
            assigned.select("cid", F.posexplode("qv").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(
                F.expr(
                    "cast(floor(cast(sum(v) as double) / count(1)) as bigint)"
                ).alias("mv")
            )
            .groupBy("cid")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, mv))), s -> s.mv)"
                ).alias("new_cq")
            )
        )
        # an emptied cluster keeps its previous centroid
        cent = cent.join(upd, "cid", "left").select(
            "cid", F.expr("coalesce(new_cq, cq)").alias("cq")
        )
    return cent


def cosine_topk_ivf_kmeans(
    emb: DataFrame,
    k: int = DEFAULT_K,
    n_centroids: int = KM_CENTROIDS,
    iters: int = KM_ITERS,
    n_probe: int = KM_PROBE,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN with LEARNED centroids: assign the corpus to its nearest
    k-means centroid (the inverted file), probe the query's `n_probe`
    nearest centroids, exact cosine re-rank (original floats) within the
    probed clusters only. At scale the centroid id is the partition key and
    the probe touches ~n_probe/n_centroids of the data with data-adaptive
    (not axis-aligned) boundaries — the production IVF the sign-bucket
    variants approximate. Output shape matches cosine_topk; recall measured
    against it in tests; full-probe (n_probe = n_centroids) == exact."""
    from spatialflink_spark.session import spread

    packed = _packed_centroids(
        centroids if centroids is not None
        else kmeans_centroids(emb, n_centroids, iters)
    ).localCheckpoint(eager=False)
    base = spread(emb).select(
        "vec_id",
        "label",
        "embedding",
        F.expr(_km_quant("embedding")).alias("qv"),
        F.expr(_norm_expr("embedding")).alias("_snv"),
    )
    assigned = base.crossJoin(F.broadcast(packed)).select(
        "vec_id", "label", "embedding", "_snv", F.expr(_KM_ASSIGN).alias("cid")
    )
    qrow = base.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_emb"),
        F.col("qv").alias("qv"),
        F.col("_snv").alias("_snq"),
    )
    # n_probe nearest centroids per query: sort the packed (dist, cid)
    # structs per row, slice — again no shuffle
    probed = (
        qrow.crossJoin(F.broadcast(packed))
        .select(
            "q_emb",
            "_snq",
            F.explode(
                F.expr(
                    f"slice(array_sort(transform(_cents, c -> "
                    f"struct({_KM_CDIST} as d, c.cid as cid))), 1, {n_probe})"
                )
            ).alias("_p"),
        )
        .select(F.col("_p.cid").alias("cid"), "q_emb", "_snq")
    )
    cand = (
        assigned.where(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(probed), "cid")
        .select(
            "vec_id",
            "label",
            F.expr(_cos_pre_expr("embedding", "q_emb", "_snv", "_snq")).alias(
                "cos_sim"
            ),
        )
    )
    return _topk_ranked(cand, k)


def cosine_topk_batch_kmeans(
    emb: DataFrame,
    k: int = DEFAULT_K,
    n_centroids: int = KM_CENTROIDS,
    iters: int = KM_ITERS,
    n_probe: int = KM_PROBE,
    query_mod: int | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Batch retrieval over the learned IVF — the production retrieval op:
    every query in the query TABLE probes its n_probe nearest k-means
    centroids, candidates are the corpus vectors assigned to those clusters
    (a pure equi-join on centroid id), exact cosine re-rank per query via
    the two-stage cut (stage-1 key = cluster id). Composes the round-4
    batch machinery with the learned inverted file.
    Output: q_id, rank, vec_id, label, cos_sim."""
    from spatialflink_spark.session import spread

    qm = QUERY_MOD if query_mod is None else query_mod
    packed = _packed_centroids(
        centroids if centroids is not None
        else kmeans_centroids(emb, n_centroids, iters)
    ).localCheckpoint(eager=False)
    base = spread(emb).select(
        "vec_id",
        "label",
        "embedding",
        F.expr(_km_quant("embedding")).alias("qv"),
        F.expr(_norm_expr("embedding")).alias("_snv"),
    )
    assigned = base.crossJoin(F.broadcast(packed)).select(
        "vec_id", "label", "embedding", "_snv", F.expr(_KM_ASSIGN).alias("bucket")
    )
    qset = base.where(F.col("vec_id") % qm == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("_snv").alias("_snq"),
        "qv",
    )
    qprobe = (
        qset.crossJoin(F.broadcast(packed))
        .select(
            "q_id",
            "q_emb",
            "_snq",
            F.explode(
                F.expr(
                    f"slice(array_sort(transform(_cents, c -> "
                    f"struct({_KM_CDIST} as d, c.cid as cid))), 1, {n_probe})"
                )
            ).alias("_p"),
        )
        .select("q_id", "q_emb", "_snq", F.col("_p.cid").alias("bucket"))
    )
    scored = assigned.join(
        F.broadcast(qprobe),
        (assigned["bucket"] == qprobe["bucket"])
        & (assigned["vec_id"] != qprobe["q_id"]),
    ).select(
        "q_id",
        "vec_id",
        "label",
        assigned["bucket"].alias("bucket"),
        F.expr(_cos_pre_expr("embedding", "q_emb", "_snv", "_snq")).alias(
            "cos_sim"
        ),
    )
    return _batch_topk_two_stage(scored, k)


def kmeans_label_purity(
    emb: DataFrame,
    n_centroids: int = KM_CENTROIDS,
    iters: int = KM_ITERS,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Per-cluster label profile of the learned k-means partition — the
    SemDeDup-style diagnostic for embedding-space curation: how coherent is
    each cluster against the ground-truth labels (majority label, its
    count, purity fraction)? Used to decide whether cluster-level sampling
    / dedup is safe and which clusters to inspect.

    Composes the deterministic quantized-Lloyd assignment (kmeans_centroids
    + packed-broadcast argmin, zero shuffle) with a (cid, label)-keyed
    groupBy — key space n_centroids x |labels|, so everything after the
    assignment scan is bounded regardless of corpus size. Majority ties
    break to the smallest label. Output: cid, n_vecs, top_label, n_top,
    purity."""
    from pyspark.sql.window import Window
    from spatialflink_spark.session import spread

    packed = _packed_centroids(
        centroids if centroids is not None
        else kmeans_centroids(emb, n_centroids, iters)
    ).localCheckpoint(eager=False)
    base = spread(emb).select(
        "vec_id", "label", F.expr(_km_quant("embedding")).alias("qv")
    )
    assigned = base.crossJoin(F.broadcast(packed)).select(
        "label", F.expr(_KM_ASSIGN).alias("cid")
    )
    per = assigned.groupBy("cid", "label").agg(
        F.expr("cast(count(1) as bigint)").alias("n")
    )
    w = Window.partitionBy("cid").orderBy(F.col("n").desc(), F.col("label").asc())
    top = (
        per.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "cid", F.col("label").alias("top_label"), F.col("n").alias("n_top")
        )
    )
    tot = per.groupBy("cid").agg(F.expr("cast(sum(n) as bigint)").alias("n_vecs"))
    return tot.join(top, "cid").select(
        "cid",
        "n_vecs",
        "top_label",
        "n_top",
        F.expr("round(cast(n_top as double) / n_vecs, 6)").alias("purity"),
    )


def build_ivf_index(
    emb: DataFrame,
    path: str,
    n_centroids: int = KM_CENTROIDS,
    iters: int = KM_ITERS,
) -> None:
    """Persist the learned inverted file — the BUILD half of production IVF
    (build once, search many; the reference's analog is the grid index built
    once per stream config, UniformGrid.java:74-85, reused by every query):

    - <path>/centroids: the (cid, cq) quantized k-means centroid table
    - <path>/corpus:    the cluster-assigned corpus, PARTITIONED BY cid

    The partitionBy('cid') layout is the point at 100 TB: a search probing
    n_probe clusters reads ONLY those clusters' files (Hive-style partition
    pruning at the scan — asserted in tests), i.e. probe I/O is
    ~n_probe/n_centroids of the corpus, not a full scan plus a filter."""
    cent = kmeans_centroids(emb, n_centroids, iters).localCheckpoint(eager=False)
    cent.write.mode("overwrite").parquet(f"{path}/centroids")
    from spatialflink_spark.session import spread

    packed = _packed_centroids(cent)
    base = spread(emb).select(
        "vec_id", "label", "embedding", F.expr(_km_quant("embedding")).alias("qv")
    )
    assigned = base.crossJoin(F.broadcast(packed)).select(
        "vec_id", "label", "embedding", "qv", F.expr(_KM_ASSIGN).alias("cid")
    )
    assigned.write.mode("overwrite").partitionBy("cid").parquet(f"{path}/corpus")


def search_ivf_index(
    spark,
    path: str,
    k: int = DEFAULT_K,
    n_probe: int = KM_PROBE,
) -> DataFrame:
    """SEARCH half over a persisted index: fetch the query row (ONE lookup
    scan — a production server takes the query vector as an argument and
    skips even that), pick its n_probe nearest centroids DRIVER-SIDE over
    the tiny centroid table (quantized-integer squared-L2 with the same
    (dist, cid) tie-break as _KM_ASSIGN — Python bigints reproduce it
    exactly), then scan ONLY those cid partitions of the corpus (cid IN
    (...literals...) is a partition filter — the files of unprobed clusters
    are never opened) with the query embedding inlined as a one-row literal
    relation. The probed scan is the only corpus-wide I/O in the plan.
    Answer-identical to cosine_topk_ivf_kmeans at the same (n_centroids,
    iters, n_probe) — pinned by an equivalence test."""
    corpus = spark.read.parquet(f"{path}/corpus")
    qrows = (
        corpus.where(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding", "qv")
        .collect()
    )
    if not qrows:
        raise ValueError(
            f"search_ivf_index: query vec_id {QUERY_VEC_ID} not present in "
            f"the index corpus at {path}"
        )
    q_emb_vals = list(qrows[0]["embedding"])
    qv = [int(v) for v in qrows[0]["qv"]]
    cents = spark.read.parquet(f"{path}/centroids").collect()
    ranked = sorted(
        (sum((a - b) * (a - b) for a, b in zip(qv, row["cq"])), int(row["cid"]))
        for row in cents
    )
    probed_cids = [cid for _, cid in ranked[:n_probe]]
    q_lit = spark.createDataFrame([(q_emb_vals,)], "q_emb array<float>").withColumn(
        "_snq", F.expr(_norm_expr("q_emb"))
    )
    cand = (
        corpus.where(F.col("cid").isin(probed_cids))
        .where(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("_snv", F.expr(_norm_expr("embedding")))
        .crossJoin(F.broadcast(q_lit))
        .select(
            "vec_id",
            "label",
            F.expr(_cos_pre_expr("embedding", "q_emb", "_snv", "_snq")).alias(
                "cos_sim"
            ),
        )
    )
    return _topk_ranked(cand, k)


# ---------------------------------------------------------------------------
# Query-TABLE batch top-k — the op an LLM retrieval/dedup pipeline actually
# runs: top-k per query over a query SET, mirroring the reference's kNN which
# takes a query set (knn/KNNQuery.java:49; the grid engine's own
# query_cells_df, range_query.py:32), applied to embeddings.
# ---------------------------------------------------------------------------

QUERY_MOD = 41  # deterministic query table: every 41st vec_id


def query_table(emb: DataFrame, query_mod: int = QUERY_MOD) -> DataFrame:
    """Deterministic query set drawn from the embeddings table: (q_id, q_emb).
    Small by construction (1/query_mod of the corpus) — broadcast side."""
    return emb.where(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )


def _batch_topk_two_stage(scored: DataFrame, k: int) -> DataFrame:
    """Per-query two-stage top-k over (q_id, vec_id, label, bucket, cos_sim).

    Stage 1 cuts to the k best per (q_id, bucket) — the map-side combine:
    each window task sorts only one bucket's candidates for one query, never
    a whole query's candidate set. Stage 2 ranks the <= buckets * k
    survivors per query. Answer-identical to a direct per-query rank: a row
    in the global top-k has < k rows beating it overall (by the total order
    (cos_sim desc, vec_id asc)), hence < k in its own bucket, so it survives
    the stage-1 cut — same argument as the grid kNN's per-cell cut
    (knn.py:50-69), without the dedup step because each (q_id, vec_id) pair
    occurs exactly once."""
    from pyspark.sql.window import Window

    w1 = Window.partitionBy("q_id", "bucket").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    partial = (
        scored.withColumn("_r", F.row_number().over(w1))
        .where(F.col("_r") <= k)
        .drop("_r", "bucket")
    )
    w2 = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w2).cast("int"))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "label", "cos_sim")
    )


def cosine_topk_batch(
    emb: DataFrame,
    k: int = DEFAULT_K,
    bits: int = SIGN_BITS,
    query_mod: int = QUERY_MOD,
) -> DataFrame:
    """EXACT top-k per query over the query table — every corpus vector is a
    candidate for every query (self-matches excluded); the sign bucket is
    used only as the stage-1 cut key, so the result is exact while no task
    ever holds more than one (query, bucket) candidate slice. The brute-force
    truth the ANN variant below is recall-measured against, and itself
    scale-safe. Output: q_id, rank, vec_id, label, cos_sim."""
    from spatialflink_spark.session import spread

    q = query_table(emb, query_mod).withColumn(
        "_snq", F.expr(_norm_expr("q_emb"))
    )
    corpus = spread(emb).select(
        "vec_id",
        "label",
        "embedding",
        bucket_expr("embedding", bits).alias("bucket"),
        F.expr(_norm_expr("embedding")).alias("_snv"),
    )
    scored = corpus.join(
        F.broadcast(q), F.col("vec_id") != F.col("q_id")
    ).select(
        "q_id",
        "vec_id",
        "label",
        "bucket",
        F.expr(_cos_pre_expr("embedding", "q_emb", "_snv", "_snq")).alias(
            "cos_sim"
        ),
    )
    return _batch_topk_two_stage(scored, k)


# batch-ANN probe config: 4 sign bits, Hamming radius 1 -> 5/16 of the
# bucket space probed per query
BATCH_ANN_BITS = 4
BATCH_ANN_HAMMING = 1


def cosine_topk_batch_ann(
    emb: DataFrame,
    k: int = DEFAULT_K,
    bits: int = BATCH_ANN_BITS,
    hamming: int = BATCH_ANN_HAMMING,
    query_mod: int = QUERY_MOD,
) -> DataFrame:
    """ANN form of cosine_topk_batch: each query probes only its own sign
    bucket plus buckets within `hamming` bit flips (multi-probe sign-LSH,
    same mask scheme as embedding_dup_pairs_blocked) — candidate generation
    is a pure equi-join on bucket id, touching sum(C(bits,i), i<=hamming) /
    2^bits of the corpus per query. Probe buckets are distinct, so each
    (query, candidate) joins exactly once; the same two-stage cut then ranks.
    Recall < 1 by design; measured against cosine_topk_batch in tests.
    Output: q_id, rank, vec_id, label, cos_sim."""
    from spatialflink_spark.session import spread

    corpus = spread(emb).select(
        "vec_id",
        "label",
        "embedding",
        bucket_expr("embedding", bits).alias("bucket"),
        F.expr(_norm_expr("embedding")).alias("_snv"),
    )
    masks = _hamming_masks(bits, hamming)
    q = query_table(emb, query_mod).select(
        "q_id",
        "q_emb",
        F.expr(_norm_expr("q_emb")).alias("_snq"),
        bucket_expr("q_emb", bits).alias("_qb"),
    )
    probes = ", ".join(f"_qb ^ {m}" for m in masks)
    qp = q.select(
        "q_id", "q_emb", "_snq",
        F.explode(F.expr(f"array({probes})")).alias("probe"),
    )
    scored = corpus.join(
        F.broadcast(qp),
        (F.col("bucket") == F.col("probe")) & (F.col("vec_id") != F.col("q_id")),
    ).select(
        "q_id",
        "vec_id",
        "label",
        "bucket",
        F.expr(_cos_pre_expr("embedding", "q_emb", "_snv", "_snq")).alias(
            "cos_sim"
        ),
    )
    return _batch_topk_two_stage(scored, k)


SEMDEDUP_THRESHOLD = DUP_COS_THRESHOLD


def semantic_dedup(
    emb: DataFrame,
    threshold: float = SEMDEDUP_THRESHOLD,
    n_centroids: int = KM_CENTROIDS,
    iters: int = KM_ITERS,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate pruning via
    k-means clustering — pairwise cosine is computed only WITHIN a
    cluster, and a vector is dropped when a lower-id member of its own
    cluster is cosine-similar above `threshold` (the deterministic min-id
    keeper rule; greedy single-pass exactly as published, not a transitive
    closure — two dups split across cluster boundaries are deliberately
    both kept, that is the documented recall/cost trade of the method).

    Scale (100 TB): the centroid fit + assignment reuse the shuffle-free
    broadcast-argmin kernel (kmeans_centroids); the only pairwise stage is
    the within-cluster self-join on the cid equi-key, O(sum s_i^2) — at
    scale n_centroids grows with the corpus so s_i stays bounded (the
    paper runs 50k clusters for LAION-scale), and the join is a plain
    equi-shuffle on cid, never a cross join. `assigned` is materialized
    once (lazy localCheckpoint) because it feeds BOTH sides of the
    self-join — without the barrier the Lloyd chain would execute twice.
    Output: vec_id, cid, keep."""
    from spatialflink_spark.session import spread

    packed = _packed_centroids(
        centroids if centroids is not None
        else kmeans_centroids(emb, n_centroids, iters)
    ).localCheckpoint(eager=False)
    base = spread(emb).select(
        "vec_id",
        "embedding",
        F.expr(_km_quant("embedding")).alias("qv"),
        F.expr(_norm_expr("embedding")).alias("_sn"),
    )
    assigned = (
        base.crossJoin(F.broadcast(packed))
        .select("vec_id", "embedding", "_sn", F.expr(_KM_ASSIGN).alias("cid"))
        .localCheckpoint(eager=False)
    )
    left = assigned.select(
        F.col("cid").alias("cid"),
        F.col("vec_id").alias("l_vec"),
        F.col("embedding").alias("l_emb"),
        F.col("_sn").alias("l_sn"),
    )
    right = assigned.select(
        F.col("cid").alias("cid"),
        F.col("vec_id").alias("r_vec"),
        F.col("embedding").alias("r_emb"),
        F.col("_sn").alias("r_sn"),
    )
    drops = (
        left.join(right, "cid")
        .where(F.col("l_vec") < F.col("r_vec"))
        .where(F.expr(_cos_pre_expr("l_emb", "r_emb", "l_sn", "r_sn")) >= threshold)
        .select(F.col("r_vec").alias("vec_id"))
        .distinct()
        .withColumn("_drop", F.lit(True))
    )
    return assigned.join(drops, "vec_id", "left").select(
        "vec_id",
        F.col("cid").cast("int").alias("cid"),
        F.expr("NOT coalesce(_drop, false)").alias("keep"),
    )


# ---- Product Quantization (Jégou et al. 2011) -----------------------------

PQ_M = 4          # subspaces (64-dim vectors -> 4 x 16-dim slices)
PQ_K = 8          # centroids per subspace -> 3-bit codes, m*k = 32 table rows
PQ_ITERS = KM_ITERS


def pq_codebooks(
    emb: DataFrame, m: int = PQ_M, k: int = PQ_K, iters: int = PQ_ITERS
) -> DataFrame:
    """Per-subspace PQ codebooks: (j, cid, cq) — the deterministic
    quantized-integer Lloyd kernel (kmeans_centroids) run independently on
    each of the m dimension slices. Output rows: m * k."""
    d = len(emb.select("embedding").first()["embedding"])
    assert d % m == 0, (d, m)
    sub = d // m
    parts = []
    for j in range(m):
        sliced = emb.select(
            "vec_id",
            F.expr(f"slice(embedding, {j * sub + 1}, {sub})").alias(
                "embedding"
            ),
        )
        parts.append(
            kmeans_centroids(sliced, k, iters).select(
                F.lit(j).cast("int").alias("j"), "cid", "cq"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _pq_packed(cb: DataFrame) -> DataFrame:
    """One row: _cb array<struct<j,cid,cq>> sorted by (j, cid) — the
    broadcastable packed codebook."""
    return cb.agg(
        F.expr("array_sort(collect_list(struct(j, cid, cq)))").alias("_cb")
    )


def _pq_code_expr(m: int, sub: int) -> str:
    """codes array<int>: per subspace, argmin centroid by (sq-L2, cid) over
    the packed codebook — pure per-row codegen, same shuffle-free shape as
    _KM_ASSIGN."""
    dist = (
        f"aggregate(zip_with(slice(qv, j * {sub} + 1, {sub}), c.cq,"
        " (a, b) -> (a - b) * (a - b)), cast(0 as bigint), (s, v) -> s + v)"
    )
    return (
        f"transform(sequence(0, {m - 1}), j -> "
        f"array_min(transform(filter(_cb, c -> c.j = j), "
        f"c -> struct({dist} as d, c.cid as cid))).cid)"
    )


def pq_topk_adc(
    emb: DataFrame,
    k: int = DEFAULT_K,
    m: int = PQ_M,
    n_cent: int = PQ_K,
    iters: int = PQ_ITERS,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """PQ top-k via Asymmetric Distance Computation: vectors are stored as
    m small codes (here 4 x 3 bits vs 64 floats — the vector-compression
    half of the classic IVF+PQ pairing); the query builds ONE m*n_cent
    distance table and every candidate's distance is m table lookups.

    Everything after quantization is EXACT INTEGER math (squared-L2 in the
    KM_QSCALE fixed-point domain): codes, the ADC table, and the summed
    distances are bigints, so both dialects agree bit-for-bit with no
    rounding contract at all. Scale (100 TB): the codebook (m*n_cent rows)
    and the distance table (m*n_cent entries, DENSIFIED into one flat
    array — the nullable-index-inside-transform NPE trap from CLAUDE.md
    does not apply to a dense j*n_cent+code layout) ride one broadcast
    row; encoding and scoring are pure per-row codegen; the only
    corpus-scale operation is the TakeOrderedAndProject final cut. ADC is
    an approximation of true distance (that is the PQ trade) — the recall
    test pins it against the exact quantized-L2 ranking.
    Output: rank, vec_id, adc."""
    from spatialflink_spark.session import spread

    d = len(emb.select("embedding").first()["embedding"])
    sub = d // m
    packed = _pq_packed(
        codebooks if codebooks is not None
        else pq_codebooks(emb, m, n_cent, iters)
    ).localCheckpoint(eager=False)
    base = spread(emb).select(
        "vec_id", F.expr(_km_quant("embedding")).alias("qv")
    )
    # query row -> dense ADC table: dt[j * n_cent + cid] = sqL2(q_j, c_jcid)
    dist = (
        f"aggregate(zip_with(slice(qv, c.j * {sub} + 1, {sub}), c.cq,"
        " (a, b) -> (a - b) * (a - b)), cast(0 as bigint), (s, v) -> s + v)"
    )
    qrow = (
        base.where(F.col("vec_id") == QUERY_VEC_ID)
        .crossJoin(F.broadcast(packed))
        .select(
            # _cb is sorted by (j, cid), so transform preserves the dense
            # j * n_cent + cid order by construction
            F.expr(f"transform(_cb, c -> {dist})").alias("dt")
        )
    )
    coded = (
        base.where(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(packed))
        .select("vec_id", F.expr(_pq_code_expr(m, sub)).alias("codes"))
    )
    scored = coded.crossJoin(F.broadcast(qrow)).select(
        "vec_id",
        F.expr(
            f"aggregate(sequence(0, {m - 1}), cast(0 as bigint), (s, j) -> "
            f"s + element_at(dt, j * {n_cent} + element_at(codes, j + 1) + 1))"
        ).alias("adc"),
    )
    top = scored.orderBy(F.col("adc").asc(), F.col("vec_id").asc()).limit(k)
    return top.withColumn(
        "rank",
        F.expr("row_number() OVER (ORDER BY adc ASC, vec_id ASC)").cast("int"),
    ).select("rank", "vec_id", "adc")


def build_ivfpq_index(
    emb: DataFrame,
    path: str,
    n_centroids: int = KM_CENTROIDS,
    iters: int = KM_ITERS,
    m: int = PQ_M,
    pq_k: int = PQ_K,
) -> None:
    """Persist the classic IVF+PQ index (Jégou et al.) — coarse inverted
    file for I/O pruning + PQ codes for in-memory compression:

    - <path>/centroids: coarse (cid, cq) quantized k-means table
    - <path>/codebooks: per-subspace PQ codebooks (j, cid, cq)
    - <path>/corpus:    (vec_id, label, codes) PARTITIONED BY cid — a
      probe reads only the probed clusters' files, and each row carries
      m small codes instead of the embedding (here 4 x 3-bit vs 64
      floats; at 100 TB that is the difference between an index that
      fits executor memory and one that does not)
    - <path>/qv:        (vec_id, qv) sidecar, used ONLY for the sandbox's
      query-by-vec_id convention (one-row lookup); a production server
      receives the query vector as an argument and this sidecar would
      not exist — the SEARCH scan touches only the codes corpus

    Codes encode RAW vectors (not residuals), so a FULL-probe search is
    bit-identical to pq_topk_adc — the equivalence oracle the tests pin.
    Residual encoding (code the vector minus its coarse centroid) is the
    production refinement; it changes accuracy, not the plan shape."""
    coarse = kmeans_centroids(emb, n_centroids, iters).localCheckpoint(
        eager=False
    )
    coarse.write.mode("overwrite").parquet(f"{path}/centroids")
    cb = pq_codebooks(emb, m, pq_k, iters).localCheckpoint(eager=False)
    cb.write.mode("overwrite").parquet(f"{path}/codebooks")
    from spatialflink_spark.session import spread

    d = len(emb.select("embedding").first()["embedding"])
    sub = d // m
    base = spread(emb).select(
        "vec_id", "label", F.expr(_km_quant("embedding")).alias("qv")
    )
    base = base.localCheckpoint(eager=False)  # feeds corpus AND qv sidecar
    assigned = (
        base.crossJoin(F.broadcast(_packed_centroids(coarse)))
        .crossJoin(F.broadcast(_pq_packed(cb)))
        .select(
            "vec_id",
            "label",
            F.expr(_pq_code_expr(m, sub)).alias("codes"),
            F.expr(_KM_ASSIGN).alias("cid"),
        )
    )
    assigned.write.mode("overwrite").partitionBy("cid").parquet(
        f"{path}/corpus"
    )
    base.select("vec_id", "qv").write.mode("overwrite").parquet(f"{path}/qv")


def search_ivfpq_index(
    spark,
    path: str,
    k: int = DEFAULT_K,
    n_probe: int = KM_PROBE,
    m: int = PQ_M,
    pq_k: int = PQ_K,
) -> DataFrame:
    """SEARCH over a persisted IVF+PQ index: probe cids are ranked
    DRIVER-SIDE over the tiny coarse table (python bigints — exact), the
    ADC distance table is built DRIVER-SIDE from the persisted codebooks
    (exact integers again) and inlined as one literal array, and the only
    corpus-wide work is the pruned scan of the probed cid partitions plus
    m array lookups per row. Full probe == pq_topk_adc exactly."""
    corpus = spark.read.parquet(f"{path}/corpus")
    qrows = (
        spark.read.parquet(f"{path}/qv")
        .where(F.col("vec_id") == QUERY_VEC_ID)
        .select("qv")
        .collect()
    )
    if not qrows:
        raise ValueError(
            f"search_ivfpq_index: query vec_id {QUERY_VEC_ID} not in {path}"
        )
    qv = [int(v) for v in qrows[0]["qv"]]
    sub = len(qv) // m
    cents = spark.read.parquet(f"{path}/centroids").collect()
    ranked = sorted(
        (sum((a - b) * (a - b) for a, b in zip(qv, row["cq"])), int(row["cid"]))
        for row in cents
    )
    probed_cids = [cid for _, cid in ranked[:n_probe]]
    cb = spark.read.parquet(f"{path}/codebooks").collect()
    dt = [0] * (m * pq_k)
    for row in cb:
        j, cid = int(row["j"]), int(row["cid"])
        qs = qv[j * sub : (j + 1) * sub]
        dt[j * pq_k + cid] = sum(
            (a - b) * (a - b) for a, b in zip(qs, row["cq"])
        )
    dt_lit = ", ".join(f"cast({v} as bigint)" for v in dt)
    cand = (
        corpus.where(F.col("cid").isin(probed_cids))
        .where(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id",
            F.expr(
                f"aggregate(sequence(0, {m - 1}), cast(0 as bigint), (s, j) -> "
                f"s + element_at(array({dt_lit}), "
                f"j * {pq_k} + element_at(codes, j + 1) + 1))"
            ).alias("adc"),
        )
    )
    top = cand.orderBy(F.col("adc").asc(), F.col("vec_id").asc()).limit(k)
    return top.withColumn(
        "rank",
        F.expr("row_number() OVER (ORDER BY adc ASC, vec_id ASC)").cast("int"),
    ).select("rank", "vec_id", "adc")


def batch_ann_recall(emb: DataFrame, k: int = DEFAULT_K) -> DataFrame:
    """Per-query recall@k of the multi-probe batch ANN against the exact
    batch ranker — the calibration signal an ANN deployment monitors when
    tuning (bits, hamming): recall = |ANN top-k ∩ exact top-k| / k.
    Composes the two existing batch ops; both inputs are bounded
    (|queries| x k rows), so the hit join and per-query counts are
    negligible next to the rankers themselves. All-integer counts, one
    final rounded division. Output: q_id, n_exact, n_hit, recall."""
    # MATERIALIZE: exact feeds both the hit join and the per-query base —
    # un-checkpointed, the whole exact ranker re-evaluates per consumer
    # (the multi-consumer invariant, CLAUDE.md); the relation is
    # |queries| x k rows
    exact = (
        cosine_topk_batch(emb, k=k)
        .select("q_id", "vec_id")
        .localCheckpoint(eager=False)
    )
    ann = cosine_topk_batch_ann(emb, k=k).select("q_id", "vec_id")
    # explicit broadcasts: both rank lists are |Q| x k BY CONSTRUCTION, but
    # the checkpointed side has no stats, so the planner would fall back to
    # a sort-merge join (two sorted exchanges for a bounded relation)
    hits = exact.join(F.broadcast(ann), ["q_id", "vec_id"]).groupBy("q_id").agg(
        F.expr("cast(count(1) as bigint)").alias("_h")
    )
    base = exact.groupBy("q_id").agg(
        F.expr("cast(count(1) as bigint)").alias("n_exact")
    )
    return base.join(F.broadcast(hits), "q_id", "left").select(
        "q_id",
        "n_exact",
        F.expr("cast(coalesce(_h, 0) as bigint)").alias("n_hit"),
        F.expr(
            "round(cast(coalesce(_h, 0) as double) / n_exact, 6)"
        ).alias("recall"),
    )


PROTO_DROP_BP = 2500  # drop the most-prototypical quarter of each cluster


def prototypicality(
    emb: DataFrame,
    n_centroids: int = KM_CENTROIDS,
    iters: int = KM_ITERS,
    drop_bp: int = PROTO_DROP_BP,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SSL-prototypes data pruning (Sorscher et al. 2022, the metric D4
    pairs with SemDeDup): rank every vector by its distance to its own
    k-means centroid and DROP the most prototypical (closest) `drop_bp`
    basis points per cluster — with abundant data, easy/redundant examples
    near the cluster core teach the least, so curation keeps the outskirts.

    Deterministic and exact: distances are quantized-integer squared-L2
    (the shared Lloyd kernel domain), ranking ties break by vec_id, and the
    keep cut is integer basis-point math — no rounding contract anywhere.

    Scale (100 TB): centroid fit + assignment are the shuffle-free
    broadcast-argmin kernel (kmeans_centroids); the only new work is ONE
    rank window partitioned by cid — and as with semantic_dedup,
    n_centroids grows with the corpus so per-cluster partitions stay
    bounded (the paper's regime: cluster count scales, cluster size
    doesn't). Output: vec_id, cid, d2, rank_c, keep."""
    from spatialflink_spark.session import spread

    packed = _packed_centroids(
        centroids if centroids is not None
        else kmeans_centroids(emb, n_centroids, iters)
    ).localCheckpoint(eager=False)
    base = spread(emb).select(
        "vec_id", F.expr(_km_quant("embedding")).alias("qv")
    )
    assigned = (
        base.crossJoin(F.broadcast(packed))
        .select(
            "vec_id",
            F.expr(
                f"array_min(transform(_cents, c -> struct({_KM_CDIST} as d,"
                " c.cid as cid)))"
            ).alias("_a"),
        )
        .select(
            "vec_id",
            F.expr("cast(_a.cid as int)").alias("cid"),
            F.expr("_a.d").alias("d2"),
        )
    )
    ranked = assigned.select(
        "*",
        F.expr(
            "cast(row_number() OVER (PARTITION BY cid ORDER BY d2, vec_id)"
            " as int)"
        ).alias("rank_c"),
        F.expr(
            "cast(count(1) OVER (PARTITION BY cid) as bigint)"
        ).alias("n_c"),
    )
    return ranked.select(
        "vec_id",
        "cid",
        "d2",
        "rank_c",
        F.expr(f"rank_c > (n_c * {drop_bp}) div 10000").alias("keep"),
    )


def pq_topk_batch(
    emb: DataFrame,
    k: int = DEFAULT_K,
    m: int = PQ_M,
    n_cent: int = PQ_K,
    iters: int = PQ_ITERS,
    query_mod: int = QUERY_MOD,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """PQ/ADC retrieval over the query TABLE — the batch face of
    pq_topk_adc (one query row) the way cosine_topk_batch is the batch face
    of cosine_topk: every corpus vector is scored for every query via m
    table lookups into that query's dense ADC table.

    Scale (100 TB): the codebook rides one broadcast row; every vector is
    encoded ONCE (m small argmins, per-row codegen) and scored per query by
    m element_at lookups — the candidate relation is |Q| x n pairs exactly
    like the exact batch ranker, but each pair costs m lookups instead of d
    multiplies and the corpus side carries m small codes instead of d
    floats (the PQ memory/bandwidth trade; for candidate PRUNING compose
    with the IVF side — build_ivfpq_index). The per-query ADC tables are
    |Q| rows x m*n_cent bigints -> broadcast. Top-k via the two-stage
    per-(query, bucket) cut with the subspace-0 code as stage-1 key
    (any bucketing is answer-invisible — the _batch_topk_two_stage proof).
    Everything after quantization is exact bigint. Output: q_id, rank,
    vec_id, adc."""
    from pyspark.sql.window import Window

    from spatialflink_spark.session import spread

    d = len(emb.select("embedding").first()["embedding"])
    sub = d // m
    packed = _pq_packed(
        codebooks if codebooks is not None
        else pq_codebooks(emb, m, n_cent, iters)
    ).localCheckpoint(eager=False)
    base = spread(emb).select(
        "vec_id", F.expr(_km_quant("embedding")).alias("qv")
    ).localCheckpoint(eager=False)  # feeds the coded corpus AND the queries
    coded = base.crossJoin(F.broadcast(packed)).select(
        "vec_id", F.expr(_pq_code_expr(m, sub)).alias("codes")
    )
    dist = (
        f"aggregate(zip_with(slice(qv, c.j * {sub} + 1, {sub}), c.cq,"
        " (a, b) -> (a - b) * (a - b)), cast(0 as bigint), (s, v) -> s + v)"
    )
    qdt = (
        base.where(F.col("vec_id") % query_mod == 0)
        .crossJoin(F.broadcast(packed))
        .select(
            F.col("vec_id").alias("q_id"),
            # _cb is (j, cid)-sorted -> dense j * n_cent + cid layout
            F.expr(f"transform(_cb, c -> {dist})").alias("dt"),
        )
    )
    scored = coded.join(
        F.broadcast(qdt), F.col("vec_id") != F.col("q_id")
    ).select(
        "q_id",
        "vec_id",
        F.expr("element_at(codes, 1)").alias("bucket"),
        F.expr(
            f"aggregate(sequence(0, {m - 1}), cast(0 as bigint), (s, j) -> "
            f"s + element_at(dt, j * {n_cent} + element_at(codes, j + 1) + 1))"
        ).alias("adc"),
    )
    w1 = Window.partitionBy("q_id", "bucket").orderBy(
        F.col("adc").asc(), F.col("vec_id").asc()
    )
    partial = (
        scored.withColumn("_r", F.row_number().over(w1))
        .where(F.col("_r") <= k)
        .drop("_r", "bucket")
    )
    w2 = Window.partitionBy("q_id").orderBy(
        F.col("adc").asc(), F.col("vec_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w2).cast("int"))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "adc")
    )


def l2_topk_batch(
    emb: DataFrame, k: int = DEFAULT_K, query_mod: int = QUERY_MOD
) -> DataFrame:
    """EXACT quantized-squared-L2 top-k per query — the ground truth the PQ
    batch ranker approximates (ADC error comes only from code loss, so this
    is the right recall basis). Same |Q| x n candidate shape and two-stage
    cut as cosine_topk_batch (bucket = vec_id mod 16: any deterministic
    bucketing is answer-invisible). Exact bigint distances end-to-end.
    Output: q_id, rank, vec_id, d2."""
    from pyspark.sql.window import Window

    from spatialflink_spark.session import spread

    base = spread(emb).select(
        "vec_id", F.expr(_km_quant("embedding")).alias("qv")
    ).localCheckpoint(eager=False)  # feeds corpus AND query sides
    q = base.where(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("q_id"), F.col("qv").alias("q_qv")
    )
    scored = base.join(F.broadcast(q), F.col("vec_id") != F.col("q_id")).select(
        "q_id",
        "vec_id",
        F.expr("pmod(vec_id, 16)").alias("bucket"),
        F.expr(
            "aggregate(zip_with(qv, q_qv, (a, b) -> (a - b) * (a - b)),"
            " cast(0 as bigint), (s, v) -> s + v)"
        ).alias("d2"),
    )
    w1 = Window.partitionBy("q_id", "bucket").orderBy(
        F.col("d2").asc(), F.col("vec_id").asc()
    )
    partial = (
        scored.withColumn("_r", F.row_number().over(w1))
        .where(F.col("_r") <= k)
        .drop("_r", "bucket")
    )
    w2 = Window.partitionBy("q_id").orderBy(
        F.col("d2").asc(), F.col("vec_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w2).cast("int"))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "d2")
    )


def pq_batch_recall(
    emb: DataFrame, k: int = DEFAULT_K, codebooks: DataFrame | None = None
) -> DataFrame:
    """Per-query recall@k of the PQ/ADC batch ranker against the exact
    quantized-L2 ranker — the code-loss calibration an IVF+PQ deployment
    monitors when sizing (m, n_cent). Mirrors batch_ann_recall's shape:
    both rank lists are |Q| x k, the exact list is materialized once for
    its two consumers. Output: q_id, n_exact, n_hit, recall."""
    exact = (
        l2_topk_batch(emb, k=k)
        .select("q_id", "vec_id")
        .localCheckpoint(eager=False)
    )
    ann = pq_topk_batch(emb, k=k, codebooks=codebooks).select("q_id", "vec_id")
    # bounded |Q| x k sides -> explicit broadcast (see batch_ann_recall)
    hits = exact.join(F.broadcast(ann), ["q_id", "vec_id"]).groupBy("q_id").agg(
        F.expr("cast(count(1) as bigint)").alias("_h")
    )
    base = exact.groupBy("q_id").agg(
        F.expr("cast(count(1) as bigint)").alias("n_exact")
    )
    return base.join(F.broadcast(hits), "q_id", "left").select(
        "q_id",
        "n_exact",
        F.expr("cast(coalesce(_h, 0) as bigint)").alias("n_hit"),
        F.expr(
            "round(cast(coalesce(_h, 0) as double) / n_exact, 6)"
        ).alias("recall"),
    )


def cluster_quality_profile(
    emb: DataFrame,
    docs: DataFrame,
    n_centroids: int = KM_CENTROIDS,
    iters: int = KM_ITERS,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Per-cluster TEXT-quality profile of the learned embedding partition
    — the D4-style cluster-inspection table: join each cluster's members
    back to their documents (vec_id == doc_id in the fixture's alignment,
    the same contract the retrieval fusion ops use) and report document
    volume, token mass, mean quality, and the quality-filter keep rate per
    cluster. The decision surface for cluster-level curation: a cluster
    with low mean quality / keep rate is pruned wholesale, a high-quality
    one is kept even if semantically dense.

    Scale (100 TB): assignment is the shuffle-free broadcast-argmin
    kernel; the per-doc quality columns come from ONE per-row pass
    (with_quality_filter, materialized before the keep-filter aggregation
    — the pushdown-inline trap); the join is a doc-keyed equi-shuffle and
    the final groupBy is n_centroids rows. Quality integerized at 1e6
    before summing (order-insensitive), one rounded division per mean.
    Output: cid, n_docs, n_words, mean_quality, keep_rate."""
    from spatialflink_spark.operators.text import with_quality_filter
    from spatialflink_spark.session import spread

    packed = _packed_centroids(
        centroids if centroids is not None
        else kmeans_centroids(emb, n_centroids, iters)
    ).localCheckpoint(eager=False)
    base = spread(emb).select(
        "vec_id", F.expr(_km_quant("embedding")).alias("qv")
    )
    assigned = base.crossJoin(F.broadcast(packed)).select(
        "vec_id", F.expr(f"cast({_KM_ASSIGN} as int)").alias("cid")
    )
    q = (
        with_quality_filter(
            spread(docs).select("doc_id", "text")
        )
        .localCheckpoint(eager=False)
        .select(
            F.col("doc_id").alias("vec_id"),
            "n_words",
            F.expr("cast(round(quality * 1000000) as bigint)").alias("_q"),
            "keep",
        )
    )
    j = assigned.join(q, "vec_id")
    return j.groupBy("cid").agg(
        F.expr("cast(count(1) as bigint)").alias("n_docs"),
        F.expr("cast(sum(n_words) as bigint)").alias("n_words"),
        F.expr(
            "round(cast(sum(_q) as double) / (count(1) * 1000000), 6)"
        ).alias("mean_quality"),
        F.expr("round(cast(sum(keep) as double) / count(1), 6)").alias(
            "keep_rate"
        ),
    )
