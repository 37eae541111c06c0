"""Physical-plan property tests — the plan we'd want at 100 TB, asserted.

These catch silent regressions correctness tests can't: a lost filter
pushdown, a broadcast that became a shuffle, a final agg without its partial.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spatialflink_spark import gate, plans
from spatialflink_spark.sources.sequences import load_documents, sequences
from tests.conftest import SF_SMALL


def test_range_query_broadcasts_query_cells(spark):
    df = gate.q_range_tumbling_count(spark, SF_SMALL)
    assert plans.has_broadcast_join(df), plans.simple_plan(df)
    # counting agg must have a map-side partial before the exchange
    assert plans.has_partial_aggregate(df)


def test_documents_scan_prunes_columns(spark):
    """The sequences derivation reads only (doc_id, text, source) — column
    pruning must reach the parquet scan (ReadSchema)."""
    from spatialflink_spark.sources.sequences import sequences

    df = sequences(spark, SF_SMALL)
    schemas = plans.read_schemas(df)
    assert schemas, plans.formatted_plan(df)[:500]
    assert all("lang" not in s and "n_chars" not in s for s in schemas), schemas


def test_filter_pushdown_reaches_scan(spark):
    """A predicate on a raw scan column compiles to PushedFilters."""
    df = load_documents(spark, SF_SMALL).where(F.col("doc_id") > 100).select("doc_id")
    pf = plans.pushed_filters(df)
    assert any("doc_id" in f for f in pf), plans.formatted_plan(df)[:800]


def test_trajectory_restricted_pushes_box_filter(spark):
    """Q4 analog: the n_tok box filter can't reach the scan (n_tok is
    derived), but the plan must not shuffle AFTER filtering except for the
    groupBy — allowed exchanges: the deliberate small-scan spread()
    repartition (before any compute), the groupBy, and AQE reads."""
    df = gate.q_trajectory_restricted(spark, SF_SMALL)
    assert plans.exchange_count(df) <= 3, plans.simple_plan(df)


def test_exclude_cells_is_broadcast_anti_join(spark):
    df = gate.q_exclude_cells(spark, SF_SMALL)
    s = plans.simple_plan(df)
    assert "Broadcast" in s, s


def test_join_replication_stays_equi_join(spark):
    """The windowed join must plan as a hash/sort-merge EQUI join on
    (cell, ws) — never a cartesian/nested-loop product."""
    df = gate.q_join_self_tumbling(spark, SF_SMALL)
    s = plans.simple_plan(df)
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s


def test_interval_interval_join_stays_equi_join(spark):
    """Polygon-Polygon combo: radius-expanded cell replication must keep the
    join a (ws, cell) equi-join — no cartesian/nested-loop fallback."""
    df = gate.q_interval_interval_join(spark, SF_SMALL)
    s = plans.simple_plan(df)
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s


def test_point_linestring_join_stays_equi_join(spark):
    df = gate.q_point_linestring_join(spark, SF_SMALL)
    s = plans.simple_plan(df)
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s


def test_linestring_range_broadcasts_query_cells(spark):
    df = gate.q_linestring_range(spark, SF_SMALL)
    assert plans.has_broadcast_join(df), plans.simple_plan(df)


def test_simhash_dup_pairs_is_bucketed(spark):
    """The banded SimHash join must be a (band_id, band_key) equi-join —
    candidate generation never leaves its buckets."""
    df = gate.q_simhash_dup_pairs(spark, SF_SMALL)
    s = plans.simple_plan(df)
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s


def test_simhash_wide_pairs_bucketed_over_joined_input(spark):
    """The curation pipeline mines wide near-dup pairs over the
    post-exact-dedup SURVIVOR relation (itself a join output); the banded
    candidate join must stay a band-key equi-join there too — a composed
    input must not degrade it to a cartesian/nested-loop."""
    from spatialflink_spark.operators import dedup as D

    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    canon = D.exact_dedup(d).where("dup_rank = 1").select("doc_id")
    surv = d.join(canon, "doc_id")
    s = plans.simple_plan(D.simhash_wide_dup_pairs(surv))
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s


def test_staytime_normalized_single_shuffle_key(spark):
    """Join of two agg streams on (cell, ws): both sides aggregate on the
    join key, so the join adds no cartesian and stays hash/SMJ."""
    df = gate.q_staytime_normalized(spark, SF_SMALL)
    s = plans.simple_plan(df)
    assert "CartesianProduct" not in s


def test_spread_parallelizes_single_partition_scan(spark):
    """spread() must lift a 1-partition scan to session parallelism and be a
    no-op when the input already has enough partitions."""
    from spatialflink_spark.session import spread

    docs = load_documents(spark, SF_SMALL)
    assert docs.rdd.getNumPartitions() == 1
    s = spread(docs)
    assert s.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    again = spread(s)
    assert again is s  # no extra shuffle when already spread


def test_multiinterval_range_broadcasts_query_cells(spark):
    """Multi-geometry range: union-of-parts replication joins the tiny
    (query, cell) table by BROADCAST — the data stream never shuffles for
    the filter stage."""
    df = gate.q_multiinterval_range(spark, SF_SMALL)
    assert plans.has_broadcast_join(df), plans.simple_plan(df)


def test_multiinterval_join_stays_equi_join(spark):
    """Point-MultiPolygon combo: radius-expanded union-of-parts replication
    must keep the join a (ws, cell) equi-join — no cartesian fallback."""
    df = gate.q_multiinterval_join(spark, SF_SMALL)
    s = plans.simple_plan(df)
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s


def test_knn_unbounded_pruned_no_cartesian(spark):
    """The pruned unbounded kNN's final merge (over the checkpointed
    radius-bounded cuts) must stay free of cartesian/nested-loop joins; the
    cut pass itself broadcasts the O(windows x queries) radii table (hinted
    in knn.knn_unbounded_pruned)."""
    df = gate.q_knn_unbounded_pruned(spark, SF_SMALL)
    s = plans.simple_plan(df)
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s


def test_pack_sequences_codegen_only(spark):
    """Sequence packing must stay entirely JVM-side: no Python evals in the
    plan, bounded shuffles (window partition + final agg on the same
    `source` key — AQE may reuse the exchange), column pruning keeping the
    token arrays out of the cumsum (only n_tok + keys flow)."""
    df = gate.q_pack_sequences(spark, SF_SMALL)
    s = plans.simple_plan(df)
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert "mapInPandas" not in s.lower()
    assert plans.exchange_count(df) <= 3, s  # derive spread + window + agg


def test_decontaminate_broadcasts_probe(spark):
    """Decontamination must broadcast the benchmark shingle set (eval
    benchmarks are small by definition); the exploded training side never
    shuffles for the join — only the per-doc overlap count does."""
    df = gate.q_decontaminate(spark, SF_SMALL)
    assert plans.has_broadcast_join(df), plans.simple_plan(df)


def test_source_mix_broadcasts_rates_no_collect(spark):
    """The quota-rate table must flow back onto the document stream as an
    in-plan BROADCAST (no driver collect round trip), and the sampling
    filter stays in codegen (no Python evals)."""
    df = gate.q_source_mix(spark, SF_SMALL)
    s = plans.simple_plan(df)
    assert plans.has_broadcast_join(df), s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_pack_bins_bucket_shard_equivalence(spark):
    """pack_bins(bucket_s=...) — the 10^12-row shard knob — must (a) equal
    the global packing when all rows fall in one time bucket, and (b) reset
    bin numbering per bucket when they don't (bins are per-shard)."""
    from spatialflink_spark.operators.packing import pack_bins

    rows = [(i, 0, 100, "s", 10 + i) for i in range(8)]  # all within 60s
    df = spark.createDataFrame(
        rows, "doc_id bigint, seq_no int, n_tok int, source string, ts_s bigint"
    )
    glob = {(r.doc_id, r.bin_id, r.bin_offset)
            for r in pack_bins(df, capacity=250).collect()}
    one_bucket = {(r.doc_id, r.bin_id, r.bin_offset)
                  for r in pack_bins(df, capacity=250, bucket_s=3600).collect()}
    assert glob == one_bucket
    # two buckets: each restarts at bin 0 offset 0
    sharded = pack_bins(df, capacity=250, bucket_s=14).collect()
    by_bucket = {}
    for r in sharded:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert len(by_bucket) == 2
    for rs in by_bucket.values():
        first = min(rs, key=lambda r: r.doc_id)
        assert (first.bin_id, first.bin_offset) == (0, 0)


def test_similarity_topk_bounded_sort(spark):
    """The single-query top-k family must cut via TakeOrderedAndProject —
    round 3 ranked with an un-partitioned row_number() window, a single-task
    sort of every scored row at scale (VERDICT r3 What's-wrong #2)."""
    from spatialflink_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    for op in (sim.cosine_topk, sim.cosine_topk_ivf, sim.cosine_topk_ivf_multiprobe):
        df = op(emb)
        sp = plans.simple_plan(df)
        assert plans.has_bounded_topk(df), sp
        # the only allowed single-partition stage is the residual rank
        # window over the k-row TakeOrdered result — the scored relation
        # itself must not be globally exchanged
        assert sp.count("Exchange SinglePartition") <= 1, sp


def test_batch_topk_windows_partitioned(spark):
    """Both stages of the batch top-k partition their windows (by
    (q_id, bucket) then q_id) — no window may run global."""
    from spatialflink_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    for op in (sim.cosine_topk_batch, sim.cosine_topk_batch_ann):
        specs = plans.window_specs(op(emb))
        assert specs, "expected Window nodes in the batch top-k plan"
        assert all("q_id" in s for s in specs), specs


def test_pack_emit_straddle_hand_computed(spark):
    """pack_emit against a hand-computed straddling case: capacity 10,
    one source, sequences of 4, 9, and 3 tokens -> seq1 straddles the
    bin-0/bin-1 edge (6 tokens at positions 4..9 of bin 0, 3 tokens at
    positions 0..2 of bin 1); seq2 lands at offset 3 of bin 1."""
    from spatialflink_spark.operators.packing import pack_emit

    rows = [
        ("a", 1, 0, list(range(10, 14)), 4, 100),
        ("a", 2, 0, list(range(20, 29)), 9, 200),
        ("a", 3, 0, list(range(30, 33)), 3, 300),
    ]
    seq = spark.createDataFrame(
        rows, "source string, doc_id bigint, seq_no int, tokens array<int>, n_tok int, ts_s bigint"
    )
    got = {
        (r.source, r.bin_id): (r.n_parts, r.n_tok_bin, r.tok_checksum)
        for r in pack_emit(seq, capacity=10).collect()
    }

    def chk(parts):
        # parts: list of (pos0, tokens)
        return sum(
            (p0 + i + 1) * (t + 1) for p0, toks in parts for i, t in enumerate(toks)
        )

    # bin 0: seq1 fully (pos 0..3), seq2's first 6 tokens (pos 4..9)
    assert got[("a", 0)] == (2, 10, chk([(0, list(range(10, 14))), (4, list(range(20, 26)))]))
    # bin 1: seq2's last 3 tokens (pos 0..2), seq3 fully (pos 3..5)
    assert got[("a", 1)] == (2, 6, chk([(0, list(range(26, 29))), (3, list(range(30, 33)))]))
    assert set(got) == {("a", 0), ("a", 1)}


def test_geomcollection_range_broadcasts_query_cells(spark):
    """Mixed-part collection range: union-of-typed-parts cell replication
    joins the tiny query-cell table by BROADCAST."""
    df = gate.q_geomcollection_range(spark, SF_SMALL)
    assert plans.has_broadcast_join(df), plans.simple_plan(df)


def test_geomcollection_join_stays_equi_join(spark):
    """Point-collection combo: radius-expanded mixed-part replication must
    keep the join a (ws, cell) equi-join — no cartesian fallback."""
    df = gate.q_geomcollection_join(spark, SF_SMALL)
    s = plans.simple_plan(df)
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s


def test_pack_emit_randomized_vs_python_reference(spark):
    """pack_emit against an independent pure-Python packer on seeded random
    data chosen to stress the edges: tiny capacities (many straddles),
    sequences several times the capacity (3+ bin spans), zero-length
    sequences (no payload, no cum contribution), duplicate timestamps
    (tie-break by doc_id, seq_no)."""
    import random

    from spatialflink_spark.operators.packing import pack_emit

    rng = random.Random(20260817)
    rows = []
    for s in range(6):
        src = f"s{s}"
        for i in range(40):
            n = rng.choice([0, 1, 2, 3, 5, 8, 13, 21, 25])
            # (ts_s, doc_id, seq_no) must be a UNIQUE ordering key per
            # source (the packing-order contract; the real sequences table
            # guarantees it) — duplicate ts_s stress the tie-break, doc_id
            # stays unique per source
            rows.append(
                (
                    src,
                    i,                           # doc_id, unique per source
                    i % 3,                       # seq_no
                    [rng.randrange(1000) for _ in range(n)],
                    n,
                    rng.randrange(50),           # ts_s, heavy duplication
                )
            )

    def reference(capacity):
        out = {}
        by_src = {}
        for src, d, q, toks, n, ts in rows:
            by_src.setdefault(src, []).append((ts, d, q, toks, n))
        for src, seqs in by_src.items():
            seqs.sort(key=lambda t: (t[0], t[1], t[2]))
            cum = 0
            for ts, d, q, toks, n in seqs:
                for i, t in enumerate(toks):
                    pos = cum + i
                    b = pos // capacity
                    key = (src, b)
                    parts, ntb, chk, last_seq = out.get(key, (0, 0, 0, None))
                    if last_seq != (d, q, ts):
                        parts += 1
                    out[key] = (
                        parts,
                        ntb + 1,
                        chk + (pos % capacity + 1) * (t + 1),
                        (d, q, ts),
                    )
                cum += n
        return {k: v[:3] for k, v in out.items()}

    seq = spark.createDataFrame(
        rows,
        "source string, doc_id bigint, seq_no int, tokens array<int>, n_tok int, ts_s bigint",
    )
    for cap in (7, 16):
        got = {
            (r.source, r.bin_id): (r.n_parts, r.n_tok_bin, r.tok_checksum)
            for r in pack_emit(seq, capacity=cap).collect()
        }
        assert got == reference(cap), f"capacity {cap}"


def test_pack_emit_bucket_shard_equivalence(spark):
    """pack_emit(bucket_s=...) must equal the global emission when all rows
    fall in one time bucket (same guarantee pack_bins' knob is tested for),
    and shard independently when they don't."""
    from spatialflink_spark.operators.packing import pack_emit

    rows = [(f"s{i % 2}", i, 0, list(range(i, i + 5)), 5, 100 + i) for i in range(12)]
    seq = spark.createDataFrame(
        rows,
        "source string, doc_id bigint, seq_no int, tokens array<int>, n_tok int, ts_s bigint",
    )
    glob = {
        (r.source, r.bin_id): (r.n_parts, r.n_tok_bin, r.tok_checksum)
        for r in pack_emit(seq, capacity=8).collect()
    }
    one_bucket = {
        (r.source, r.bin_id): (r.n_parts, r.n_tok_bin, r.tok_checksum)
        for r in pack_emit(seq, capacity=8, bucket_s=10_000).collect()
    }
    assert glob == one_bucket
    sharded = pack_emit(seq, capacity=8, bucket_s=4).collect()
    assert {r.bucket for r in sharded} == {25, 26, 27}  # 100..111 / 4
    # sharded bins renumber per bucket: every bucket starts at bin 0
    assert all(
        any(r.bin_id == 0 and r.bucket == b for r in sharded)
        for b in {25, 26, 27}
    )


def test_bucketed_sequences_join_skips_shuffle(spark, tmp_path):
    """A doc_id self-join over the bucketed sequence table must plan with
    ZERO shuffle Exchanges — both sides read co-located buckets (the
    write-time shuffle replaces every query-time one). Broadcast is
    disabled for the assertion so the join can't sidestep the question."""
    from spatialflink_spark.sources.sequences import write_bucketed_sequences

    tbl = "seq_bucketed_plan_test"
    write_bucketed_sequences(
        spark, SF_SMALL, tbl, str(tmp_path / "seqb"), buckets=8
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        t = spark.table(tbl)
        l = t.select("doc_id", F.col("seq_no").alias("l_seq"), "n_tok")
        r = t.select("doc_id", F.col("seq_no").alias("r_seq"))
        j = l.join(r, "doc_id")
        s = plans.simple_plan(j)
        assert "Exchange hashpartitioning" not in s, s
        # and the layout changes I/O, never the answer
        n_bucketed = j.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    seq = sequences(spark, SF_SMALL)
    n_plain = (
        seq.select("doc_id", F.col("seq_no").alias("l_seq"))
        .join(seq.select("doc_id", F.col("seq_no").alias("r_seq")), "doc_id")
        .count()
    )
    assert n_bucketed == n_plain > 0


def test_ivf_index_search_prunes_partitions(spark, tmp_path):
    """The persisted-IVF search must reach the corpus scan as a PARTITION
    filter on cid (Hive-style pruning over the partitionBy('cid') layout) —
    the probe reads only the probed clusters' files, the 100 TB point of
    the index. A cid filter that degraded to a post-scan predicate would
    still be correct but would read every cluster."""
    from spatialflink_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    sim.build_ivf_index(emb, path)
    p = plans.formatted_plan(sim.search_ivf_index(spark, path))
    import re

    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", p)
    assert any("cid" in f and "IN" in f for f in pf), p


def test_kmeans_family_no_cartesian_broadcast_centroids(spark):
    """The k-means retrieval ops must broadcast the packed centroid row and
    never fall back to a cartesian product; the corpus side's only shuffles
    are the Lloyd update aggregations and the final cut."""
    from spatialflink_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    for op in (sim.cosine_topk_ivf_kmeans, sim.cosine_topk_batch_kmeans):
        s = plans.simple_plan(op(emb))
        assert "CartesianProduct" not in s
        assert "Broadcast" in s, s


def test_unigram_rarity_count_join_is_broadcast(spark):
    """The vocab-bounded count relation must join back as a broadcast —
    a shuffle join here would shuffle the full exploded token stream."""
    from spatialflink_spark.operators.corpus import unigram_rarity

    df = unigram_rarity(load_documents(spark, SF_SMALL))
    assert plans.has_broadcast_join(df), plans.simple_plan(df)
    assert plans.has_partial_aggregate(df)
    assert "CartesianProduct" not in plans.simple_plan(df)


def test_bigram_lift_joins_broadcast_no_cartesian(spark):
    """Support-pruned bigram relation joins the two unigram count tables
    and the one-row total as broadcasts; the final cut must be a bounded
    TakeOrderedAndProject, never a global sort."""
    from spatialflink_spark.operators.corpus import bigram_lift_topk

    df = bigram_lift_topk(load_documents(spark, SF_SMALL))
    p = plans.simple_plan(df)
    assert plans.has_broadcast_join(df), p
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p, p


def test_dsir_count_joins_broadcast(spark):
    """Both bucket-bounded count relations and the totals row must
    broadcast — the exploded feature stream never shuffles for the join."""
    from spatialflink_spark.operators.corpus import dsir_importance

    df = dsir_importance(load_documents(spark, SF_SMALL))
    p = plans.simple_plan(df)
    assert plans.has_broadcast_join(df), p
    assert "CartesianProduct" not in p
    # per-doc sum keeps its map-side partial
    assert plans.has_partial_aggregate(df)


def test_ivfpq_index_full_probe_equals_pq_and_prunes(spark, tmp_path):
    """The persisted IVF+PQ index: (a) FULL-probe search must equal
    pq_topk_adc bit-for-bit (raw-vector codes, same codebooks, same
    exact-integer ADC); (b) a partial probe must reach the corpus scan as
    a cid PARTITION filter (only probed clusters' files are read); (c)
    the stored row carries codes, never the embedding."""
    import re

    from spatialflink_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    path = str(tmp_path / "ivfpq")
    sim.build_ivfpq_index(emb, path)

    full = [
        (r.rank, r.vec_id, r.adc)
        for r in sim.search_ivfpq_index(
            spark, path, n_probe=sim.KM_CENTROIDS
        ).collect()
    ]
    plain = [
        (r.rank, r.vec_id, r.adc) for r in sim.pq_topk_adc(emb).collect()
    ]
    assert full == plain and len(full) == sim.DEFAULT_K

    p = plans.formatted_plan(sim.search_ivfpq_index(spark, path))
    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", p)
    assert any("cid" in f and "IN" in f for f in pf), p

    corpus_cols = spark.read.parquet(f"{path}/corpus").columns
    assert "codes" in corpus_cols
    # compression is the point: neither the floats nor the quantized
    # vectors ride in the scanned corpus — codes only
    assert "embedding" not in corpus_cols and "qv" not in corpus_cols


def test_bigram_fluency_prefix_join_is_broadcast(spark):
    """The vocab-bounded prefix-count relation must join back as a
    broadcast; the c_ab join rides the encoded bigram equi-key (never a
    cartesian); the per-doc sum keeps its map-side partial."""
    from spatialflink_spark.operators.corpus import bigram_fluency

    df = bigram_fluency(load_documents(spark, SF_SMALL))
    assert plans.has_broadcast_join(df), plans.simple_plan(df)
    assert plans.has_partial_aggregate(df)
    assert "CartesianProduct" not in plans.simple_plan(df)


def test_decontaminate_bloom_verify_join_on_candidates_only(spark):
    """The Bloom gate's exact verify stage must join the CANDIDATE side
    (post-bloom filter), and the probe set must ride a broadcast — a
    SortMergeJoin anywhere here means the bitset prefilter fell out of
    the plan."""
    df = gate.q_decontaminate_bloom(spark, SF_SMALL)
    p = plans.simple_plan(df)
    assert plans.has_broadcast_join(df), p
    assert "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_pq_topk_batch_two_stage_windows_partitioned(spark):
    """Both rank windows must be PARTITIONED (by (q_id, bucket) then
    q_id) — an unpartitioned window is a single-task global sort; and the
    per-query ADC tables must ride broadcasts, never a shuffle join."""
    from spatialflink_spark.operators.similarity import pq_topk_batch

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    df = pq_topk_batch(emb)
    p = plans.formatted_plan(df)
    assert "SortMergeJoin" not in p, p[:800]
    import re

    # every Window node's partition spec must be non-empty
    for m in re.finditer(r"Window \[.*?windowspecdefinition\(([^)]*)\)", p):
        assert m.group(1).strip(), p[:800]


def test_prototypicality_assignment_is_broadcast_argmin(spark):
    """Centroid assignment must stay the shuffle-free broadcast-argmin
    (no cartesian, no sort-merge); the only shuffle is the rank window's
    cid exchange."""
    from spatialflink_spark.operators.similarity import prototypicality

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    df = prototypicality(emb)
    p = plans.simple_plan(df)
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" not in p, p
