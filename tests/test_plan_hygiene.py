"""Registry-wide physical-plan hygiene: the scale contract, enforced.

Every registered query's executed plan is checked for all-pairs join
nodes. The single allowed BroadcastNestedLoopJoin is the declared exact
ANN baseline (corpus x broadcast 5-row query set — linear in the corpus,
not quadratic); everything else must be hash/sort-merge joins or
aggregations. This is the EXPLAIN-level guarantee behind the operator
docstrings' 100-TB claims.
"""

from __future__ import annotations

import pytest

from github_etl_pipeline_spark.plans import REGISTRY

SF_DIR = "/root/testdata/sf0.001"

# nested-loop joins that are LINEAR in the corpus, not quadratic:
#   ann_topk_bruteforce — corpus x broadcast 5-row query set (the
#     declared exact ANN verify baseline)
#   top_terms_by_source — crossJoin of a broadcast SINGLE-ROW aggregate
#     (the corpus doc count) onto the tf relation, i.e. a scalar attach
#   boilerplate_ngrams_documents — same scalar attach: the 1-row corpus
#     total broadcast onto the gram doc-frequency relation
#   vocabulary_documents — 1-row total-token-count broadcast attached
#     onto the top-V vocab relation
#   skew_profile_orders — 1-row table-total broadcast onto the top-10
#     heavy-hitter relation
#   unigram_logprob_outliers — 1-row corpus-token-total broadcast onto
#     the unigram vocab relation
#   user_value_trend_events — 1-row corpus-min-timestamp broadcast
#     attached before the per-user OLS aggregate (scalar attach)
#   bm25_search_documents — 1-row (n_docs, avgdl) corpus-stats broadcast
#     attached to the <= |query terms| posting aggregate
#   quality_percentile_gate_documents — 1-row exact-percentile threshold
#     broadcast onto the scored corpus
#   bigram_lm_outliers — same scalar attach as its unigram sibling: the
#     1-row corpus bigram-total broadcast onto the bigram vocab relation
#   ann_ivf_recall_floor — embeds the exact-ANN baseline (the same
#     corpus x broadcast 5-row query set as ann_topk_bruteforce) to
#     grade the IVF side against it
#   dsir_importance_documents — 1-row (raw-total, target-total, vocab)
#     broadcast onto the unigram model relation (scalar attach)
#   hybrid_rrf_search_documents — embeds BOTH declared-linear shapes:
#     the exact dense top-k (corpus x broadcast 1-row query vector) and
#     bm25's 1-row corpus-stats attach; fusion itself runs at topk scale
#   ann_pq_recall_floor — embeds the exact-ANN baseline (corpus x
#     broadcast 5-row query set) to grade the ADC side against it, plus
#     the codes x broadcast 5-row query-id attach for the ADC scan
#   knn_graph_recall_tuned — 1-row exact-edge-count aggregate broadcast
#     onto the 4-row probe ladder (scalar attach; the exact side itself
#     rides the GEMM mapInPandas path, no corpus-scale nested loop)
# (knn_graph_recall_floor's exact ground-truth side moved to the GEMM
# mapInPandas path in r12 — no nested-loop join remains in its plan, so
# it needs no allowance)
#   kmv_source_overlap_documents — the pair stage joins the per-group
#     sketch relation to itself on grp_a < grp_b: both sides are
#     #sources-sized (k-element arrays), corpus-INDEPENDENT — the
#     corpus-scale work is the sketch's equi-shuffle, not this join
#   join_size_estimate_orders — composes the 1-row sketch estimate with
#     the 1-row exact count (1x1 crossJoin, rollup.py-style)
#   profile_columns_orders — composes the 1-row plain-aggregate result
#     with the 1-row multi-distinct result (1x1 crossJoin; splitting the
#     two aggregates keeps the plain aggs out of the multi-distinct
#     Expand — r13, 6.2s -> 1.8s at sf0.1)
ALLOWED_NESTED_LOOP = {
    # 1-row scalar-attach cross joins (n_baskets / corpus totals ride a
    # broadcast of ONE aggregate row so the whole job stays a lazy plan
    # with no driver action) — the nested-loop side is a single row
    "frequent_brand_pairs_lineitem",
    "term_drift_documents",
    "join_size_estimate_orders",
    "profile_columns_orders",
    "kmv_source_overlap_documents",
    "knn_graph_recall_tuned",
    "hybrid_rrf_search_documents",
    "ann_pq_recall_floor",
    "dsir_importance_documents",
    "quality_percentile_gate_documents",
    "bigram_lm_outliers",
    "ann_ivf_recall_floor",
    "ann_topk_bruteforce",
    "bm25_search_documents",
    "top_terms_by_source",
    "boilerplate_ngrams_documents",
    "vocabulary_documents",
    "skew_profile_orders",
    "unigram_logprob_outliers",
    "user_value_trend_events",
}


def test_topk_windows_are_group_limited(spark):
    """The rank<=k filters must reach the plan as partial top-k — either
    WindowGroupLimit (partitioned window) or TakeOrderedAndProject
    (global window via limit-through-window pushdown) — so no task ever
    buffers a full stratum/vocabulary."""
    plan = (
        REGISTRY["exact_k_sample_documents"]
        .builder(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan
    plan = (
        REGISTRY["vocabulary_documents"]
        .builder(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_all_pairs_join(name, spark):
    plan = (
        REGISTRY[name]
        .builder(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if name not in ALLOWED_NESTED_LOOP:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested-loop join in plan"


# queries whose SEMANTICS are a scan-stage filter over a derived
# expression — the pushdown is the point (prunes rows before any
# exchange), not an accident:
#   stratified_sample_documents / exact_k_sample_documents /
#   temperature_sample_documents — the deterministic md5-coin IS the
#     sampling predicate
#   decontaminate_documents, curation_pipeline_documents — the
#     benchmark-source prefilter + quality rules ARE row pruning (at
#     fleet scale the scan stage is parallel, so filtering there is
#     strictly better than after a shuffle)
ALLOWED_HEAVY_SCAN_FILTER = {
    "stratified_sample_documents",
    "exact_k_sample_documents",
    "temperature_sample_documents",
    "decontaminate_documents",
    "curation_pipeline_documents",
    "quality_filter_documents",
}

_HEAVY_FILTER = __import__("re").compile(
    r"DataFilters: \[[^\]]*(regexp_extract_all|md5\(|transform\(|aggregate\(|zip_with)"
)


@pytest.mark.parametrize(
    "name", sorted(set(REGISTRY) - ALLOWED_HEAVY_SCAN_FILTER)
)
def test_no_heavy_expression_in_scan_filter(name, spark):
    """No ACCIDENTALLY duplicated heavy expression (tokenize / md5 /
    higher-order array fold) in a scan's DataFilters: Catalyst pushes
    filters on derived columns below the fan-out exchange, re-running
    the expensive chain serially in the (locally single-partition) scan
    stage AND again in the post-exchange project — the winnowing query
    was 5x slower for it. Queries whose sampling/pruning predicate is
    genuinely scan-stage (ALLOWED_HEAVY_SCAN_FILTER) are excluded from
    the parametrization rather than skipped at runtime — a skip is a
    report of something NOT verified, but the allow-list is a design
    decision, not a gap."""
    plan = (
        REGISTRY[name]
        .builder(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = _HEAVY_FILTER.search(plan)
    assert not m, f"{name}: heavy expression in scan DataFilters ({m.group(1)})"


@pytest.mark.parametrize(
    "name",
    [
        "simhash_dup_pairs",
        "media_dup_pairs_documents",
        "embedding_high_sim_pairs",
        "minhash_dup_pairs_documents",
        "curation_pipeline_documents",
    ],
)
def test_pair_mining_heavy_relation_cached(name, spark):
    """Self-join pair miners must read their heavy relation (band keys /
    signatures / shingles / signal base) through a persisted cache:
    both join sides re-project it under different aliases, so without
    the cache the tokenize/signing chain runs once PER SIDE (r8 fix —
    measured 2x at sf3). Executed AFTER collect so the adaptive plan is
    final."""
    df = REGISTRY[name].builder(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    spark.catalog.clearCache()
    assert "InMemoryTableScan" in plan, f"{name}: heavy relation not cached"


def test_top_terms_single_tokenize_pass(spark):
    """top_terms_by_source must tokenize the corpus exactly ONCE: the r9
    rewrite derives document frequency from the (term, source)
    aggregate via a window SUM instead of a second explode branch
    (column pruning diverges the two pre-agg subtrees, so ReusedExchange
    never rescues the naive tf/df formulation — each branch would rerun
    regexp_extract_all+explode over every document)."""
    df = REGISTRY["top_terms_by_source"].builder(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the finalized adaptive plan prints "== Final Plan ==" followed by
    # "== Initial Plan ==" — count only the plan that executed
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Generate explode") == 1, (
        "document text must be tokenized exactly once:\n" + plan
    )
