"""Headline benchmark: runs the engine's representative queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed three times and the best time kept (early runs
pay one-off file-listing / codegen / JIT costs that a warm cluster
amortizes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q10_returned_revenue",
    "q18_large_orders",
    "w_sessionize_events",
    "rag_context_block",
    "g_events_stats",
    "t_top3_orders_per_customer",
    "w_hourly_event_rollup",
    "p_props_extraction",
    "x_text_stats",
    "e_rag_verdicts",
    "v_cosine_top8",
    "v_knn_join",
    "v_lsh_knn_join",
    "d_exact_dup_groups",
    "d_minhash_lsh_candidates",
    "s_confidence_scores",
    "q7_nation_trade",
    "j_asof_click_before_purchase",
    "w_session_window_rollup",
    "tx_langid",
    "tx_fingerprints",
    "mm_media_features",
    "rag_answer_end_to_end",
    "q9_nation_profit",
    "q13_order_count_distribution",
    "q17_small_quantity_revenue",
    "q21_sole_blocking_supplier",
    "g_grouping_sets_revenue",
    "j_price_band_join",
    "d_dup_clusters",
    "g_sketch_aggregates",
    "tx_redact_pii",
    "v_label_centroids",
    "pipeline_corpus_prep",
    "w_gapfill_hourly",
    "tx_topk_bigrams",
    "d_stratified_sample",
    "v_quantize_int8",
    "tx_gopher_quality_flags",
    "d_contamination_5gram",
    "v_two_stage_rerank",
    "w_funnel_conversion",
    "pipeline_pack_sequences",
    "pipeline_token_budget_select",
    "tx_unigram_surprisal",
    "d_domain_mixture",
    "d_semantic_dedup",
    "j_salted_brand_revenue",
    "j_fuzzy_name_pairs",
    "t_bm25_keyword_topk",
    "v_hybrid_rrf_fusion",
    "d_weighted_sample",
    "w_scd2_user_state",
    "g_zorder_orders",
    "s_winsorized_quality",
    "d_pagerank_neardup",
    "g_hll_partitioned_merge",
    "v_pq_adc_topk",
    "tx_vocab_build",
    "d_difficulty_buckets",
    "v_negative_samples",
    "w_cohort_retention",
    "tx_chunk_overlap",
    "d_duplicate_spans",
    "dq_numeric_profile",
    "g_triangle_counts",
    "g_histogram_totalprice",
    "tx_bpe_merges",
    "tx_unicode_normalize",
    "tx_c4_sentence_filter",
    "t_global_dense_ids",
    "pipeline_shard_manifest",
    "t_inverted_index",
    "w_event_transitions",
    "j_point_in_time_enrich",
    "mm_ahash_dup_groups",
    "w_time_weighted_avg",
    "d_span_dup_pairs",
    "g_value_trend",
    "v_chunk_sum_pool",
    "dq_psi_drift",
    "v_lsh_recall_at_k",
    "d_containment_pairs",
    "d_split_leakage_check",
    "p_variant_extraction",
    "s_target_encoding",
    "dq_median_impute",
    "tx_bpe_tokenize",
    "tx_bpe_tokenize_fold",
    "v_ivfadc_topk",
    "tx_textrank_keywords",
    "d_minhash_lsh_md5_pairs",
    "g_countmin_heavy_hitters",
    "t_tfidf_topk",
    "v_sign_hamming_topk",
    "v_matryoshka_prefix_topk",
    "v_mmr_rerank",
    "tx_dedup_chunks_rebuild",
    "s_quality_classifier",
    "v_kmeans_clusters",
    "d_lpa_communities",
    "d_personalized_pagerank",
    "pipeline_clean_corpus",
]


def main() -> None:
    from ingestion_pipeline_spark.plans import query_map
    from ingestion_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark("bench")
    qs = query_map()
    # Session warmup: JVM + parquet footer caches, one tiny action.
    spark.range(1).count()

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        # Per-query fault isolation (VERDICT r1 #2): one broken query must
        # not take down the other timings — record the error, keep going,
        # and ALWAYS emit the final JSON line.
        try:
            fn = qs[name]
            best = float("inf")
            # best-of-3: run 1 pays file-listing/codegen, run 2 can still
            # catch a JIT compile — observed 3x spikes on subquery-heavy
            # plans with best-of-2 (q21 4.3s cold vs 1.4s warm)
            for _ in range(3):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                # noop sink executes the FULL plan (count() would let
                # Catalyst prune computed columns and under-measure).
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 3)
            print(f"# {name}: {times[name]}s", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — isolation is the point
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: ERROR {errors[name][:120]}", file=sys.stderr)

    total = round(sum(times.values()), 3)
    detail = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    if errors:
        detail["errors"] = errors
    # Per-query detail goes to stderr + a side file; stdout's FINAL line is
    # a compact summary only. The driver captures a bounded tail of stdout
    # and parses the last line — a 93-entry map overflowed it in rounds 1-2
    # (BENCH_r02.json: rc=0 but parsed=null), so keep this line short.
    print(f"# detail: {json.dumps(detail)}", file=sys.stderr)
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"),
            "w",
        ) as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass
    slowest = sorted(times, key=times.get, reverse=True)[:3]
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(times),
        "n_errors": len(errors),
        # keep the contract's "queries" key but bounded (3 slowest) so the
        # line always fits the driver's tail window; full map in
        # bench_detail.json and on stderr.
        "queries": {k: times[k] for k in slowest},
    }))


if __name__ == "__main__":
    main()
