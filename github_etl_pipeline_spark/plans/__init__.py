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
# CHECK_LOCAL.json re-verifies EVERY registered query each round regardless
# of this order. Recompute for r12 from the committed CORRECTNESS_r*.json:
# lead with the ~50 names whose newest green row is oldest, tie-break by
# fewest lifetime green rows.
# ---------------------------------------------------------------------------
DRIVER_SAMPLE_PRIORITY = [
    # --- never driver-checked: the queries registered this round ---
    # (VERDICT r10 #2: the depth-adaptive miner's recall on cos~=0.85
    # seeded near-dups; #3: the bands_for_recall scale-sibling; #4: the
    # steady-state index append)
    "embedding_lsh_recall_floor",
    "embedding_lsh_recall_tuned",
    "ivf_index_append",
    "dsir_importance_documents",
    # (also registered this round, second batch: the semantic-curation
    # block — SemDeDup cluster-then-cosine dedup, cluster-balanced
    # diversity sampling, BM25+dense hybrid retrieval via RRF)
    "semdedup_embeddings",
    "cluster_balanced_sample_embeddings",
    "hybrid_rrf_search_documents",
    # (third batch: product quantization — the compression half of IVF-PQ,
    # its served IVF-PQ composition, and its two measured-quality gates)
    "pq_codes_embeddings",
    "ann_topk_pq",
    "ann_topk_ivfpq_served",
    "pq_reconstruction_error",
    "ann_pq_recall_floor",
    "ivfpq_index_append",
    # (fourth batch: graph centrality + token-budget data mixing)
    "pagerank_similarity_graph",
    "token_budget_mix_documents",
    # (fifth batch: LPA community detection over the same k-NN graph +
    # the train/eval near-dup leakage audit of the shipped split)
    "lpa_communities_similarity_graph",
    "split_leakage_audit_documents",
    # --- newest green row is r8 (32 queries), fewest greens first ---
    # 2 lifetime greens (alphabetical):
    "fuzzy_pairs_documents",
    "grouping_sets_orders",
    "hll_registers_events",
    "kmv_distinct_users_events",
    "latency_percentiles_events",
    "media_ahash_documents",
    "overlap_click_purchase_windows",
    "pack_sequences_documents",
    "profile_columns_orders",
    "props_variant_events",
    "quality_filter_documents",
    "quality_percentile_gate_documents",
    "quantile_sketch_lineitem",
    "quantize_embeddings_int8",
    "remove_dup_spans_documents",
    "rolling_7d_revenue",
    "session_window_events",
    "shuffle_documents_shards",
    "sliding_event_counts",
    "snapshot_diff_orders",
    "source_overlap_documents",
    "split_documents_hash",
    "stratified_sample_documents",
    "temperature_sample_documents",
    "top3_orders_per_priority",
    "unigram_logprob_outliers",
    "unpivot_order_status_counts",
    "user_value_trend_events",
    "vocabulary_documents",
    "weighted_sample_documents",
    "window_rank_extras_events",
    # 3 lifetime greens:
    "top_terms_by_source",
    # --- fillers: newest green r9, fewest lifetime greens first ---
    # 2 lifetime greens:
    "zorder_key_events",
    # 3 lifetime greens (alphabetical):
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
    # 4 lifetime greens (alphabetical, to fill the ~50 prefix):
    "ann_topk_bruteforce",
    "exact_dedup_documents",
    "funnel_events",
    "gapfill_daily_purchases",
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
