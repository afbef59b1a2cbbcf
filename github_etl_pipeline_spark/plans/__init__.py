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
#   r7:    (this list) the ONLY 4 queries never driver-hash-green (the IVF
#          family — their exact oracles landed in r6 after the r6 sample was
#          fixed), then the 26 queries whose newest green row is r4, then 20
#          r5-green names to fill the prefix.
# CHECK_LOCAL.json re-verifies EVERY registered query each round regardless
# of this order. Recompute for r8 from the committed CORRECTNESS_r*.json:
# lead with the ~50 names whose newest green row is oldest.
# ---------------------------------------------------------------------------
DRIVER_SAMPLE_PRIORITY = [
    # --- never driver-hash-green: the IVF family. Build MUST run before the
    # served/recall queries so they find the persisted index it writes. ---
    "ivf_index_build",
    "ann_topk_ivf",
    "ann_topk_ivf_served",
    "ann_ivf_recall_floor",
    # --- newest green row is r4 (26 queries) ---
    "summary_stats_orders",
    "type_distribution_events",
    "pct_of_total_events",
    "value_histogram_lineitem",
    "first_last_k_events",
    "region_rollup",
    "top_orders",
    "rollup_orders",
    "quantiles_lineitem",
    "corr_quantity_price",
    "semi_anti_customers",
    "window_analytics_events",
    "gapfill_daily_purchases",
    "full_outer_nation_balance",
    "gapfill_user_activity",
    "dq_expectations_orders",
    "skew_profile_orders",
    "funnel_events",
    "tpch_q4_order_priority",
    "tpch_q11_important_stock",
    "tpch_q12_late_shipments",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_count",
    "tpch_q19_discounted_revenue",
    "tpch_q22_idle_customers",
    # --- oldest r5-green names (fill the ~50 prefix) ---
    "pool_kpis_synth",
    "pool_distribution_synth",
    "token_stats_documents",
    "text_profile_documents",
    "source_profile_documents",
    "exact_dedup_documents",
    "minhash_signatures_documents",
    "minhash_dup_pairs_documents",
    "ngram_jaccard_pairs_documents",
    "dup_clusters_documents",
    "dedup_canonical_documents",
    "winnowing_fingerprints_documents",
    "simhash_documents",
    "simhash_dup_pairs",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "embedding_high_sim_pairs",
    "audio_features_documents",
    "repetition_profile_documents",
    "pii_profile_documents",
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
