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
#   r12:   (see git history) LEAD with knn_graph_recall_floor +
#          minhash_recall_floor + minhash_recall_tuned (registered that
#          round), then ALL 44 r9-stale names, then 4 single-evidence
#          fillers. After r12 max staleness became r10 (the driver took
#          the first 50 of the 53 listed — the 3 trailing fillers rolled).
#   r13:   (this list; VERDICT r12 #5) LEAD with the three queries
#          REGISTERED this round (never driver-checked):
#          knn_graph_recall_tuned (the measured probe-ladder lever,
#          VERDICT r12 #1), containment_gram_documents (the low-J
#          gram-index regime, #4), dim_ambiguity_guard_synth (the J1
#          boundary in anger, #6). Then the 50 queries whose newest
#          green row is r10 (recomputed from CORRECTNESS_r01-r12:
#          newest-green distribution was exactly {r10: 50, r11: 49,
#          r12: 50} over the 149 pre-existing names), fewest lifetime
#          greens first, ties alphabetical. 3 + 50 = 53 entries vs the
#          driver's 50-name prefix, so the 3 TRAILING names (top_orders,
#          type_distribution_events, value_histogram_lineitem — the
#          most-evidenced 6-green tier) roll to r14; after r13 those
#          three are the only r10-stale names left.
# CHECK_LOCAL.json re-verifies EVERY registered query each round regardless
# of this order. Recompute for r14 from the committed CORRECTNESS_r*.json:
# lead with the ~50 names whose newest green row is oldest, tie-break by
# fewest lifetime green rows.
# ---------------------------------------------------------------------------
DRIVER_SAMPLE_PRIORITY = [
    # never driver-checked (registered r13) — the 9 extension-block
    # queries from the r13 continuation session lead, then the 3 from
    # the r13 verdict tasks; 12 never-checked names take precedence
    # over rotation because they have ZERO driver evidence. With the
    # driver's 50-name prefix, 38 of the 50 r10-stale names fit behind
    # them; the 12 tail r10-stale + the 3 trailing 6-green names roll
    # to r14 (recompute newest-green over CORRECTNESS_r01-r13 as
    # always: lead r14 with whatever r10-stale names remain).
    "quality_metrics_lineitem",
    "frequent_brand_pairs_lineitem",
    "k_anonymity_events",
    "triangle_stats_similarity_graph",
    "kcenter_coreset_embeddings",
    "scd2_user_status_events",
    "activity_streaks_events",
    "record_linkage_customers",
    "term_drift_documents",
    "knn_graph_recall_tuned",
    "containment_gram_documents",
    "dim_ambiguity_guard_synth",
    # --- the 50 r10-stale names, fewest lifetime greens first ---
    # 3 lifetime greens:
    "ann_ivf_recall_floor",
    "ann_topk_gemm",
    "ann_topk_ivf",
    # ivf_index_build precedes the served search out of alphabetical
    # order deliberately: bench runs in registry order and the served
    # query reuses the just-built index (hardening test pins this)
    "ivf_index_build",
    "ann_topk_ivf_served",
    "anomaly_zscore_daily",
    "bigram_lm_outliers",
    "bm25_search_documents",
    "boilerplate_ngrams_documents",
    "bpe_top_pairs_documents",
    "chunk_documents",
    "cms_user_purchase_counts",
    "cohort_retention_events",
    "curation_pipeline_documents",
    "decontaminate_documents",
    "dup_span_documents",
    "dup_span_keep_first_documents",
    "embedding_centroid_outliers",
    "embedding_dup_clusters",
    "exact_k_sample_documents",
    "frame_sample_media",
    "media_dup_pairs_documents",
    # 4 lifetime greens:
    "pool_kpis_synth",
    "simhash_documents",
    "text_profile_documents",
    "token_stats_documents",
    "tpch_q12_late_shipments",
    # 5 lifetime greens:
    "dq_expectations_orders",
    "embedding_high_sim_pairs",
    "full_outer_nation_balance",
    "skew_profile_orders",
    "tpch_q11_important_stock",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_count",
    "tpch_q19_discounted_revenue",
    "tpch_q22_idle_customers",
    "tpch_q4_order_priority",
    "window_analytics_events",
    # 6 lifetime greens:
    "corr_quantity_price",
    "first_last_k_events",
    "pct_of_total_events",
    "quantiles_lineitem",
    "region_rollup",
    "rollup_orders",
    "semi_anti_customers",
    "summary_stats_orders",
    # (positions 51-53 — roll to r14 under the driver's 50-name prefix)
    "top_orders",
    "type_distribution_events",
    "value_histogram_lineitem",
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
