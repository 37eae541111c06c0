"""Benchmark harness — driver contract.

Runs the headline gate queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (full execution, no driver
collect). Scaling evidence (local[8] vs local[32]) lives in
bench/scaling.py -> BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

HEADLINE = [
    # streaming-semantics core (SURVEY.md §2)
    "range_tumbling_count",
    "range_prefix_counts",
    "range_rows",
    "knn_sliding",
    "join_self_tumbling",
    "variation_sliding",
    "variance_sliding",
    "trajectory_tumbling",
    "heatmap_sliding",
    "tstats_running",
    "tstats_windowed",
    "events_sessionize",
    "events_sliding_stats",
    # SNCB-analog app queries + intervals + skew/format paths
    "range_approx",
    "trajectory_restricted",
    "fence_speed_alert",
    "exclude_cells",
    "include_cells",
    "staytime_cells",
    "staytime_normalized",
    "checkin_fill",
    "checkin_occupancy",
    "tknn_trajectories",
    "trange_trajectories",
    "join_two_streams",
    "variation_salted",
    "events_json_props",
    "serde_roundtrip",
    "csv_ingest",
    "binfmt_ingest",
    "count_windows_tumbling",
    "interval_containment_join",
    "interval_range_count",
    "interval_interval_join",
    "interval_knn",
    # knn_unbounded is gate-graded but bench-excluded like embedding_dup_pairs:
    # it is the deliberate NO-PRUNE baseline (all rows are candidates for
    # every query — O(rows x queries) work that only looks cheap at sf0.1
    # because 180k rows fit one codegen pass). Its production form — the
    # prefix-count layer probe + verified radius-bounded cut, whose scan
    # volume is O(candidate cells) — IS benchmarked; at toy scale its 2-3
    # fixed probe/verify jobs make it SLOWER than the brute scan (~2s vs
    # ~1s), the crossover favoring pruning as row count grows:
    "knn_unbounded_pruned",
    "multiinterval_range",
    "multiinterval_join",
    "multiinterval_knn",
    "geomcollection_range",
    "geomcollection_join",
    "geomcollection_knn",
    "linestring_range",
    "linestring_knn",
    "point_linestring_join",
    "interval_linestring_join",
    # end-to-end Structured Streaming path (stage->watermark->sink)
    "stream_range_e2e",
    "stream_knn_e2e",
    "stream_decon_e2e",
    "stream_mix_e2e",
    "stream_vocab_e2e",
    # training-data ops
    "dedup_exact",
    "decontaminate",
    "source_mix",
    "curation_pipeline",
    "dedup_minhash_lsh",
    "dedup_components",
    "dedup_components_star",
    "simhash",
    "simhash_dup_pairs",
    "simhash_wide",
    "simhash_wide_dup_pairs",
    "dedup_components_wide",
    "dedup_ngram_jaccard",
    "cosine_topk",
    "cosine_topk_ivf",
    "cosine_topk_ivf_multiprobe",
    # query-TABLE batch top-k (round 4): exact two-stage + multi-probe ANN
    "cosine_topk_batch",
    "cosine_topk_batch_ann",
    # learned-centroid IVF (round 4): quantized-integer Lloyd iterations
    "cosine_topk_ivf_kmeans",
    "cosine_topk_batch_kmeans",
    # embedding_dup_pairs is gate-graded (exact all-pairs oracle at sf0.01)
    # but excluded here: at sf0.1 it is a deliberate O(n^2) exact baseline
    # (2M pairs, ~28s). Its production form IS benchmarked:
    "embedding_dup_pairs_blocked",
    "lang_id",
    "quality_score",
    "token_counts",
    "doc_fingerprint",
    "pack_sequences",
    "pack_bins_emit",
    "token_freq_topk",
    "source_length_quantiles",
    "media_features",
    # round-5 curation additions: repetition / diversity / boilerplate /
    # per-source selection / shard layout / quality-keep near-dup
    "doc_repetition",
    "token_diversity",
    "boilerplate_ngrams",
    "quality_topk_per_source",
    "shard_assign",
    "dedup_keep_best",
    # composed per-row document filter + duplicate-span removal + TF-IDF
    "quality_filter",
    "span_dedup",
    "tfidf_terms",
    "source_overlap",
    "source_vocab_divergence",
    "kmeans_purity",
    "dedup_size_histogram",
    "vocab_growth",
    "length_quality_corr",
    # final round-5 additions: PII scrub / LM rarity / SemDeDup / lift
    "pii_redact",
    "unigram_rarity",
    "semantic_dedup",
    "bigram_lift",
    "source_card",
    "dsir_importance",
    "pq_topk_adc",
    # lexical + hybrid retrieval and the CCNet corpus split
    "bm25_topk",
    "rrf_fusion",
    "ccnet_buckets",
    "hard_negatives",
    "ann_recall",
    "temperature_mix",
    "stream_tmix_e2e",
    "lsh_calibration",
    # closing round-5 additions: bigram-LM fluency, prototype pruning,
    # Bloom-prefiltered decon, the PQ batch family, streaming near-dup
    "bigram_fluency",
    "prototypicality",
    "decontaminate_bloom",
    "pq_topk_batch",
    "l2_topk_batch",
    "pq_batch_recall",
    "stream_neardup_e2e",
    "cardinality_kmv",
    "blocklist_filter",
    "chunk_documents",
    "bpe_merges",
    "stream_chunk_e2e",
    "cluster_quality_profile",
    "media_dedup",
]


# the previous round's benchmarked query list (BENCH_r03.json, 66 queries):
# totals are only comparable across rounds on the common subset, so bench
# emits a common_subset_total alongside the full total as queries get added
PREV_ROUND_QUERIES = [
    "range_tumbling_count", "range_prefix_counts", "range_rows", "knn_sliding",
    "join_self_tumbling", "variation_sliding", "variance_sliding",
    "trajectory_tumbling", "heatmap_sliding", "tstats_running",
    "tstats_windowed", "events_sessionize", "events_sliding_stats",
    "range_approx", "trajectory_restricted", "fence_speed_alert",
    "exclude_cells", "include_cells", "staytime_cells", "staytime_normalized",
    "checkin_fill", "checkin_occupancy", "tknn_trajectories",
    "trange_trajectories", "join_two_streams", "variation_salted",
    "events_json_props", "serde_roundtrip", "csv_ingest", "binfmt_ingest",
    "count_windows_tumbling", "interval_containment_join",
    "interval_range_count", "interval_interval_join", "interval_knn",
    "knn_unbounded_pruned", "multiinterval_range", "multiinterval_join",
    "multiinterval_knn", "linestring_range", "linestring_knn",
    "point_linestring_join", "interval_linestring_join", "stream_range_e2e",
    "stream_knn_e2e", "stream_decon_e2e", "dedup_exact", "decontaminate",
    "source_mix", "curation_pipeline", "dedup_minhash_lsh",
    "dedup_components", "dedup_components_star", "simhash",
    "simhash_dup_pairs", "dedup_ngram_jaccard", "cosine_topk",
    "cosine_topk_ivf", "cosine_topk_ivf_multiprobe",
    "embedding_dup_pairs_blocked", "lang_id", "quality_score", "token_counts",
    "doc_fingerprint", "pack_sequences", "media_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from spatialflink_spark.session import get_spark

    spark = get_spark("spatialflink-bench", cores=cpus,
                      shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # warm-up: JVM/codegen/parquet-footer caches (excluded from timings)
    qs["range_tumbling_count"](spark, sf_dir).count()

    # best-of-2 per query: the first pass pays whole-stage-codegen compile
    # (a fixed per-plan-shape JVM cost) and absorbs host noise (this VM
    # showed up to 8x run-to-run variance on identical queries); the min is
    # the steady-state throughput a long-running job sees
    runs = 2
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = None
        for _ in range(runs):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            best = wall if best is None else min(best, wall)
            # each headline query is an independent job in production; drop
            # the caches operators persisted so one query's intermediates
            # never squeeze the next one's execution memory (sequences_cached
            # re-persists itself on the next use). The gc.collect() lets the
            # ContextCleaner reclaim localCheckpoint blocks too — clearCache
            # alone leaves them pinned until their Python refs are collected
            # (measured ~400 MB of checkpoint blocks per iterative-CC call)
            spark.catalog.clearCache()
            import gc

            gc.collect()
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    common = [q for q in PREV_ROUND_QUERIES if q in timings]
    out = {
        "metric": "gate_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "runs_per_query": runs,  # value = sum of per-query minimums
        # apples-to-apples vs the previous round's BENCH json
        "common_subset_total": round(sum(timings[q] for q in common), 3),
        "common_subset_n": len(common),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
