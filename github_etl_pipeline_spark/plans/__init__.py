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
#   r9:    the 27 queries whose newest green row was r6 — TPC-H
#          q2/q3/q5-q10/q14/q17/q18/q20/q21 + the session/window/as-of/
#          range-join/set-ops/pivot/cube block — then 23 fillers ordered
#          by FEWEST lifetime green rows. After r9 max staleness = r7.
#   r10:   (this list; VERDICT r9 "Next round" #1/#3) LEAD with the two
#          r9-re-seeded pair queries — media_dup_pairs_documents' only
#          driver rows (r6/r8) attest the OLD vacuous 0-row query text, so
#          it must get a hash-green row with spark_rows > 0 on the new
#          seeded corpus; embedding_high_sim_pairs pins its new seed a
#          second time. Then the 27 queries whose newest green row is r7
#          (recomputed from CORRECTNESS_r01-r09: the TPC-H
#          q4/q11/q12/q13/q15/q16/q19/q22 + stats/window/profile block),
#          fewest lifetime greens first. Then the 4 IVF queries to pin the
#          r9-rewritten native-partitioning build path. Then 17 fillers
#          (fewest lifetime greens: the 2-green r8 block, alphabetical).
#          After r10 registry max staleness becomes r8.
#   r11:   (this list; VERDICT r10 "Next round" #1-#4) LEAD with the
#          four queries REGISTERED this round (never driver-checked):
#          embedding_lsh_recall_floor + embedding_lsh_recall_tuned +
#          ivf_index_append + dsir_importance_documents. Then the 32
#          queries whose newest green row is r8 (recomputed from
#          CORRECTNESS_r01-r10: the 31 two-green r8 fillers +
#          top_terms_by_source), then fillers ordered by fewest lifetime
#          greens (zorder_key_events, the 3-green r9 block, first four
#          4-green r9 names). After r11 registry max staleness becomes r9.
#   r12:   (this list; VERDICT r11 #1-#3) LEAD with the two recall-floor
#          queries REGISTERED this round (knn_graph_recall_floor +
#          minhash_recall_floor, never driver-checked), then ALL 44
#          queries whose newest green row is r9 (recomputed from
#          CORRECTNESS_r01-r11: the 3-green media/text/pair block, the
#          4-green dedup/streaming block, the 5-green TPC-H block,
#          cube/dedup_latest/pricing), fewest lifetime greens first,
#          then 4 single-evidence r10/r11 fillers. After r12 registry
#          max staleness becomes r10.
# CHECK_LOCAL.json re-verifies EVERY registered query each round regardless
# of this order. Recompute for r13 from the committed CORRECTNESS_r*.json:
# lead with the ~50 names whose newest green row is oldest, tie-break by
# fewest lifetime green rows.
# ---------------------------------------------------------------------------
DRIVER_SAMPLE_PRIORITY = [
    # r12 rotation (VERDICT r11 #3): recomputed from CORRECTNESS_r01-r11
    # — newest-green distribution was exactly {r9: 44, r10: 50, r11: 50}.
    # LEAD with the three queries REGISTERED this round (never
    # driver-checked): the two recall floors VERDICT r11 #1/#2 demanded
    # plus the minhash_bands_for_recall scale-sibling that restores the
    # floor the first one measures.
    "knn_graph_recall_floor",
    "minhash_recall_floor",
    "minhash_recall_tuned",
    # (also registered this round: Bloom-digest exact dedup of a new
    # batch against corpus history without joining the history, and
    # asymmetric containment pairs — the subset duplication symmetric
    # Jaccard misses)
    "bloom_dedup_documents",
    "containment_pairs_documents",
    # --- the 44 queries whose newest green row is r9, fewest lifetime
    # greens first (ties alphabetical) ---
    # 3 lifetime greens:
    "ann_topk_lsh",
    "audio_features_documents",
    "dedup_canonical_documents",
    "dup_clusters_documents",
    "multimodal_features_documents",
    "pii_profile_documents",
    "props_parse_events",
    "repetition_profile_documents",
    "simhash_dup_pairs",
    "source_profile_documents",
    "winnowing_fingerprints_documents",
    # 4 lifetime greens:
    "ann_topk_bruteforce",
    "exact_dedup_documents",
    "funnel_events",
    "gapfill_daily_purchases",
    "gapfill_user_activity",
    "hypertable_rollup_events",
    "minhash_dup_pairs_documents",
    "minhash_signatures_documents",
    "ngram_jaccard_pairs_documents",
    "pool_distribution_synth",
    "range_join_clicks_after_error",
    "stream_join_click_purchase",
    # 5 lifetime greens:
    "asof_click_before_error",
    "pivot_user_cohort_events",
    "sessionize_events",
    "set_ops_users",
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
    # 6 lifetime greens:
    "cube_lineitem",
    "dedup_latest_events",
    "pricing_summary",
    # --- fillers to the ~50 prefix: single-evidence r10/r11 names
    # (1 lifetime green, alphabetical) ---
    "ann_pq_recall_floor",
    "ann_topk_ivfpq_served",
    "ann_topk_pq",
    "cluster_balanced_sample_embeddings",
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
