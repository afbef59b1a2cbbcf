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
#   r6:    (this list) the 21 never-driver-sampled queries, the two queries
#          last sampled in r1, then pricing_summary + the streaming family
#          + 16 TPC-H queries from the r4-stale block.
# CHECK_LOCAL.json re-verifies EVERY registered query each round regardless
# of this order. Recompute for r7 from the committed CORRECTNESS_r*.json:
# lead with the ~50 names whose newest green row is oldest.
# ---------------------------------------------------------------------------
DRIVER_SAMPLE_PRIORITY = [
    # --- never driver-sampled (r1-r5 prefixes missed these 21) ---
    "frame_sample_media",
    "media_ahash_documents",
    "media_dup_pairs_documents",
    "split_documents_hash",
    "shuffle_documents_shards",
    "zorder_key_events",
    "snapshot_diff_orders",
    "profile_columns_orders",
    "cohort_retention_events",
    "overlap_click_purchase_windows",
    "grouping_sets_orders",
    "props_variant_events",
    "sliding_event_counts",
    "session_window_events",
    "rolling_7d_revenue",
    "anomaly_zscore_daily",
    "user_value_trend_events",
    "latency_percentiles_events",
    "top3_orders_per_priority",
    "unpivot_order_status_counts",
    "window_rank_extras_events",
    # --- last driver-sampled in round 1 ---
    "multimodal_features_documents",
    "props_parse_events",
    # --- r4-stale: flagship + streaming + joins + TPC-H ---
    "pricing_summary",
    "windowed_event_counts",
    "stream_join_click_purchase",
    "sessionize_events",
    "hypertable_rollup_events",
    "dedup_latest_events",
    "asof_click_before_error",
    "range_join_clicks_after_error",
    "cube_lineitem",
    "set_ops_users",
    "pivot_user_cohort_events",
    "tpch_q2_min_price_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q14_promo_revenue",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_orders",
    "tpch_q20_dominant_supplier",
    "tpch_q21_waiting_supplier",
    # --- new in r6 (never sampled; swapped in for q13/q16/q19 — 13
    # TPC-H queries remain in the prefix, above the >=10 floor) ---
    "kmv_distinct_users_events",
    "source_overlap_documents",
    "bpe_top_pairs_documents",
    # NOTE: ivf_index_build still precedes ann_topk_ivf_served in the
    # remainder (r5 order is preserved for non-prefix queries), so the
    # served query keeps finding the index the build writes.
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
