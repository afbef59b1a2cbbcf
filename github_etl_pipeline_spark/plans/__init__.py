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
#   r8:    the 27 queries whose newest green row was r5 (the
#          text/curation/sampling/sketch block — VERDICT r7 "What's wrong"
#          #3), then 23 single-evidence r6 names to fill the ~50 prefix.
#   r9:    (this list) the 27 queries whose newest green row is r6 —
#          TPC-H q2/q3/q5-q10/q14/q17/q18/q20/q21 + the session/window/
#          as-of/range-join/set-ops/pivot/cube block — then 23 fillers
#          ordered by FEWEST lifetime green rows (the 4 IVF queries have
#          exactly one green row each, then the 2-green and 3-green r7
#          names). After r9 registry max staleness becomes r7.
# CHECK_LOCAL.json re-verifies EVERY registered query each round regardless
# of this order. Recompute for r10 from the committed CORRECTNESS_r*.json:
# lead with the ~50 names whose newest green row is oldest, tie-break by
# fewest lifetime green rows.
# ---------------------------------------------------------------------------
DRIVER_SAMPLE_PRIORITY = [
    # --- newest green row is r6 (27 queries) ---
    "asof_click_before_error",
    "cube_lineitem",
    "dedup_latest_events",
    "hypertable_rollup_events",
    "multimodal_features_documents",
    "pivot_user_cohort_events",
    "pricing_summary",
    "props_parse_events",
    "range_join_clicks_after_error",
    "sessionize_events",
    "set_ops_users",
    "stream_join_click_purchase",
    "tpch_q10_returned_items",
    "tpch_q14_promo_revenue",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_orders",
    "tpch_q20_dominant_supplier",
    "tpch_q21_waiting_supplier",
    "tpch_q2_min_price_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "windowed_event_counts",
    "zorder_key_events",
    # --- r7-green fillers, fewest lifetime green rows first ---
    # 1 green row ever (r7 only):
    "ivf_index_build",
    "ann_topk_ivf",
    "ann_topk_ivf_served",
    "ann_ivf_recall_floor",
    # 2 green rows (r5 + r7):
    "ann_topk_lsh",
    "audio_features_documents",
    "dedup_canonical_documents",
    "dup_clusters_documents",
    "pii_profile_documents",
    "repetition_profile_documents",
    "simhash_dup_pairs",
    "source_profile_documents",
    "winnowing_fingerprints_documents",
    # 3 green rows:
    "ann_topk_bruteforce",
    "embedding_high_sim_pairs",
    "exact_dedup_documents",
    "funnel_events",
    "gapfill_daily_purchases",
    "gapfill_user_activity",
    "minhash_dup_pairs_documents",
    "minhash_signatures_documents",
    "ngram_jaccard_pairs_documents",
    "pool_distribution_synth",
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
