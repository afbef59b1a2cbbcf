from github_etl_pipeline_spark.plans.registry import REGISTRY, QuerySpec, register

# importing these modules populates REGISTRY
from github_etl_pipeline_spark.plans import relational  # noqa: F401
from github_etl_pipeline_spark.plans import domain  # noqa: F401
from github_etl_pipeline_spark.plans import extensions  # noqa: F401
from github_etl_pipeline_spark.plans import curation  # noqa: F401
from github_etl_pipeline_spark.plans import rolling  # noqa: F401
from github_etl_pipeline_spark.plans import shapes  # noqa: F401
from github_etl_pipeline_spark.plans import training  # noqa: F401

# ---------------------------------------------------------------------------
# Driver-sample ordering. The driver's per-round correctness gate checks a
# PREFIX of the registry (~50 names). The prefix ROTATES each round toward
# the queries whose last driver-green row is oldest, so every family keeps
# fresh independent evidence (VERDICT r5 "Next round" #2):
#   r1-r4: the relational/TPC-H block (original registration order)
#   r5:    the extension surface (dedup/ANN/text/curation/...)
#   r6:    the 21 never-driver-sampled queries + pricing_summary +
#          streaming + 13 r4-stale TPC-H queries.
#   r7:    the 4 never-hash-green IVF queries, then 26 r4-stale names, then
#          20 r5-green fillers. After r7 every registered query has been
#          hash-green in at least one of r5/r6/r7.
#   r8:    (this list) the 27 queries whose newest green row is r5 (the
#          text/curation/sampling/sketch block — VERDICT r7 "What's wrong"
#          #3), then 23 single-evidence r6 names to fill the ~50 prefix.
# CHECK_LOCAL.json re-verifies EVERY registered query each round regardless
# of this order. Recompute for r9 from the committed CORRECTNESS_r*.json:
# lead with the ~50 names whose newest green row is oldest.
# ---------------------------------------------------------------------------
DRIVER_SAMPLE_PRIORITY = [
    # --- newest green row is r5 (27 queries) ---
    "stratified_sample_documents",
    "top_terms_by_source",
    "cms_user_purchase_counts",
    "hll_registers_events",
    "vocabulary_documents",
    "bm25_search_documents",
    "embedding_centroid_outliers",
    "unigram_logprob_outliers",
    "bigram_lm_outliers",
    "quantize_embeddings_int8",
    "fuzzy_pairs_documents",
    "weighted_sample_documents",
    "quantile_sketch_lineitem",
    "ann_topk_gemm",
    "decontaminate_documents",
    "boilerplate_ngrams_documents",
    "dup_span_documents",
    "dup_span_keep_first_documents",
    "remove_dup_spans_documents",
    "quality_percentile_gate_documents",
    "chunk_documents",
    "pack_sequences_documents",
    "quality_filter_documents",
    "temperature_sample_documents",
    "embedding_dup_clusters",
    "curation_pipeline_documents",
    "exact_k_sample_documents",
    # --- r6-green names with only one green row (fill the ~50 prefix) ---
    "cohort_retention_events",
    "overlap_click_purchase_windows",
    "grouping_sets_orders",
    "frame_sample_media",
    "props_variant_events",
    "media_ahash_documents",
    "media_dup_pairs_documents",
    "sliding_event_counts",
    "kmv_distinct_users_events",
    "bpe_top_pairs_documents",
    "source_overlap_documents",
    "session_window_events",
    "rolling_7d_revenue",
    "anomaly_zscore_daily",
    "user_value_trend_events",
    "latency_percentiles_events",
    "top3_orders_per_priority",
    "unpivot_order_status_counts",
    "snapshot_diff_orders",
    "profile_columns_orders",
    "window_rank_extras_events",
    "split_documents_hash",
    "shuffle_documents_shards",
]


def _apply_driver_sample_order() -> None:
    ordered = {
        name: REGISTRY[name] for name in DRIVER_SAMPLE_PRIORITY if name in REGISTRY
    }
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_sample_order()

__all__ = ["REGISTRY", "QuerySpec", "register", "DRIVER_SAMPLE_PRIORITY"]
