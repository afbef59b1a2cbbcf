"""Recall floor for the MinHash-LSH banding at the production config
(VERDICT r11 #2): every MinHash-family query is hash-exact because the
oracle mirrors the banding — parity, not quality. These tests quantify
the banding's RECALL on constructed near-dup pairs at known shingle
Jaccard (the embedding_lsh_recall_floor pattern transplanted to text),
i.e. the probability a true Jaccard-J pair survives the 4-band x 4-row
scheme — the number split_leakage_audit (threshold 0.2) inherits.

Reference parity note: the reference repo has no dedup surface — this
is part of the training-data-pipeline extension block."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators.dedup import (
    jaccard_pairs,
    minhash_dedup_pairs,
)
from github_etl_pipeline_spark.plans.extensions import (
    _MH_SEED_MOD,
    _MH_SEED_OFFSET_A,
    _MH_SEED_OFFSET_B,
    _MH_TIERS,
    minhash_recall_expected,
    minhash_recall_seed_union,
)
from github_etl_pipeline_spark.sources.tables import read_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, SF, "documents").select("doc_id", "text")


def test_seed_pairs_hit_their_target_jaccard_exactly(spark, docs):
    """The construction must realize its advertised Jaccard EXACTLY:
    both members are synthetic token sequences sharing S of N=50 tokens,
    so the distinct-bigram sets share exactly S-1 of 49 shingles each —
    jaccard = (S-1)/(2N-S-1), verified here through the production
    exact-verify path (tokenize -> bigram -> hash -> set Jaccard)."""
    from github_etl_pipeline_spark.session import sweep_caches

    seeds_only = minhash_recall_seed_union(docs).where(
        F.col("doc_id") >= _MH_SEED_OFFSET_A
    )
    # brute-force exact verify over just the seed docs (60 at sf0.01)
    got = jaccard_pairs(seeds_only, threshold=0.2).collect()
    sweep_caches(spark)
    by_pair = {(r["id_a"], r["id_b"]): r["jaccard"] for r in got}
    expected = minhash_recall_expected(docs).collect()
    assert len(expected) == 30
    for r in expected:
        realized = by_pair.get((r["id_a"], r["id_b"]))
        assert realized is not None, f"seed pair {r['id_a']} missing from exact verify"
        assert realized == pytest.approx(r["target_jaccard"], abs=1e-6)


def test_banding_recall_s_curve(spark, docs):
    """Measured banding recall per tier must follow the LSH S-curve:
    high-Jaccard pairs nearly always survive, threshold-region pairs
    mostly do not (expected 1-(1-J^4)^4 = 0.90 / 0.24 / 0.02; measured
    at sf0.01: 1.0 / 0.2 / 0.1). This is the honest number the
    split_leakage_audit docstring quotes — banding at threshold 0.2
    does NOT see most true 0.2-0.5 Jaccard pairs."""
    from github_etl_pipeline_spark.session import sweep_caches

    corpus = minhash_recall_seed_union(docs)
    pairs = minhash_dedup_pairs(corpus, threshold=0.2)
    hits = pairs.select("id_a", "id_b").withColumn("_hit", F.lit(1))
    flags = (
        minhash_recall_expected(docs)
        .join(hits, ["id_a", "id_b"], "left")
        .select("tier", F.coalesce(F.col("_hit"), F.lit(0)).alias("found"))
        .collect()
    )
    sweep_caches(spark)
    by_tier: dict[str, list[int]] = {}
    for r in flags:
        by_tier.setdefault(r["tier"], []).append(r["found"])
    recall = {t: sum(v) / len(v) for t, v in by_tier.items()}
    assert set(recall) == {lbl for _, lbl, _ in _MH_TIERS.values()}
    # high tier must be near-perfect; low tier must NOT be (if it were,
    # the banding config would have silently changed and the audit's
    # documented recall profile would be stale)
    assert recall["j81"] >= 0.9
    assert recall["j51"] <= 0.7
    assert recall["j26"] <= 0.3
    assert recall["j81"] >= recall["j51"] >= recall["j26"]


def test_seed_ids_disjoint_from_corpus(spark, docs):
    """Seed ids must never collide with organic ids at any replicated
    tier (make_sf1 steps doc_id by 1M per copy -> max ~1e8 at .sf10)."""
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    assert max_id < _MH_SEED_OFFSET_A < _MH_SEED_OFFSET_B
    n_seeds = docs.where(F.col("doc_id") % _MH_SEED_MOD == 0).count()
    corpus = minhash_recall_seed_union(docs)
    assert corpus.count() == docs.count() + 2 * n_seeds


def test_tuned_query_params_match_helper():
    """The registered minhash_recall_tuned literals must be exactly what
    minhash_bands_for_recall selects for the audit threshold — a helper
    change must surface here, not as a cross-engine config divergence."""
    from github_etl_pipeline_spark.operators.dedup import minhash_bands_for_recall
    from github_etl_pipeline_spark.plans.extensions import _MH_TUNED

    kw = minhash_bands_for_recall(0.2, target_recall=0.9, rows=2)
    assert not kw.pop("capped")
    assert kw == _MH_TUNED


def test_tuned_banding_restores_recall(spark, docs):
    """The recall-tuned banding must lift the low-J tiers the production
    config misses (measured at sf0.01: j51 0.2 -> 1.0, j26 0.1 -> 1.0;
    theory 1-(1-J^2)^57 = 0.9996 / 0.979)."""
    from github_etl_pipeline_spark.plans.extensions import _MH_TUNED
    from github_etl_pipeline_spark.session import sweep_caches

    corpus = minhash_recall_seed_union(docs)
    pairs = minhash_dedup_pairs(corpus, threshold=0.2, **_MH_TUNED)
    hits = pairs.select("id_a", "id_b").withColumn("_hit", F.lit(1))
    flags = (
        minhash_recall_expected(docs)
        .join(hits, ["id_a", "id_b"], "left")
        .select("tier", F.coalesce(F.col("_hit"), F.lit(0)).alias("found"))
        .collect()
    )
    sweep_caches(spark)
    by_tier: dict[str, list[int]] = {}
    for r in flags:
        by_tier.setdefault(r["tier"], []).append(r["found"])
    recall = {t: sum(v) / len(v) for t, v in by_tier.items()}
    assert recall["j81"] >= 0.9
    assert recall["j51"] >= 0.9
    assert recall["j26"] >= 0.8


def test_minhash_coeffs_prefix_stability():
    """minhash_coeffs(114)[:16] must equal the production constants —
    the tuned family is a SUPERSET, so signatures sig_0..sig_15 are
    identical between modes (and any cached sig relation stays valid)."""
    from github_etl_pipeline_spark.functions.hashing import (
        MINHASH_A,
        MINHASH_B,
        minhash_coeffs,
    )

    a, b = minhash_coeffs(114)
    assert a[:16] == MINHASH_A
    assert b[:16] == MINHASH_B


def test_tuned_audit_surfaces_low_j_clusters_prod_misses(spark, docs):
    """split_leakage_audit with the tuned banding must surface seeded
    near-dup clusters (multi-member, possibly cross-split) that the
    production banding never sees — the end-to-end payoff of the
    recall-tuned mode."""
    from github_etl_pipeline_spark.operators.curation import split_leakage_audit
    from github_etl_pipeline_spark.plans.extensions import _MH_TUNED
    from github_etl_pipeline_spark.session import sweep_caches

    corpus = minhash_recall_seed_union(docs)
    n_seeds = minhash_recall_expected(docs).count()
    # a found seed pair surfaces as a 2-member cluster whose id is the
    # A-side id (the min) — synthetic tokens share nothing with organic
    # text, so seed clusters never merge with organic ones
    def seed_clusters(kw):
        out = {
            r["cluster_id"]
            for r in split_leakage_audit(corpus, **kw).collect()
            if r["cluster_id"] >= _MH_SEED_OFFSET_A
        }
        sweep_caches(spark)
        return out

    prod = seed_clusters({})
    tuned = seed_clusters(dict(bands=_MH_TUNED["bands"], num_hashes=_MH_TUNED["num_hashes"]))
    assert prod < tuned  # strictly more seed clusters surfaced
    assert len(tuned) == n_seeds  # the tuned audit sees every seeded pair
    assert len(tuned) - len(prod) >= 10


def test_containment_params_match_helper():
    from github_etl_pipeline_spark.operators.dedup import minhash_bands_for_recall
    from github_etl_pipeline_spark.plans.extensions import _CONT_LSH

    kw = minhash_bands_for_recall(0.5, target_recall=0.9, rows=2)
    assert not kw.pop("capped")
    assert kw == _CONT_LSH


def test_containment_catches_wrapped_docs_jaccard_misses(spark, docs):
    """Every seeded wrapper pair must surface at containment EXACTLY 1.0
    (the base doc's bigrams are all present in the wrapper), while its
    symmetric Jaccard sits strictly below the containment threshold for
    docs shorter than ~9x the junk suffix — the asymmetric-duplication
    regime minhash_dedup_pairs is blind to by design."""
    from github_etl_pipeline_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )
    from github_etl_pipeline_spark.plans.extensions import (
        _CONT_LSH,
        _CONT_SEED_MOD,
        _CONT_SEED_OFFSET,
        _CONT_JUNK_N,
    )
    from github_etl_pipeline_spark.session import sweep_caches

    junk = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(_CONT_JUNK_N)),
            lambda i: F.concat(
                F.lit("w"), F.col("doc_id").cast("string"), F.lit("x"), i.cast("string")
            ),
        ),
        " ",
    )
    seeds = (
        docs.where(F.col("doc_id") % _CONT_SEED_MOD == 0)
        .select(F.col("doc_id"), F.concat(F.col("text"), F.lit(" "), junk).alias("text"))
        .select((F.col("doc_id") + F.lit(_CONT_SEED_OFFSET)).alias("doc_id"), "text")
    )
    corpus = docs.unionAll(seeds)
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(corpus, threshold=0.9, **_CONT_LSH).collect()
    }
    sweep_caches(spark)
    base_ids = [r["doc_id"] for r in docs.where(F.col("doc_id") % _CONT_SEED_MOD == 0).collect()]
    assert len(base_ids) >= 10
    for b in base_ids:
        assert got.get((b, b + _CONT_SEED_OFFSET)) == 1.0, b
    # the same wrapper pairs under the exact symmetric-Jaccard verify:
    # every one reads BELOW 1.0 (the junk bigrams dilute the union), so
    # a Jaccard-0.9+ dedup pass would drop them all
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(
            corpus.where(
                (F.col("doc_id") % _CONT_SEED_MOD == 0)
                | (F.col("doc_id") >= _CONT_SEED_OFFSET)
            ),
            threshold=0.0,
        ).collect()
    }
    sweep_caches(spark)
    wrapper_jacs = [jac[(b, b + _CONT_SEED_OFFSET)] for b in base_ids if (b, b + _CONT_SEED_OFFSET) in jac]
    assert len(wrapper_jacs) == len(base_ids)
    assert all(j < 1.0 for j in wrapper_jacs)
    assert min(wrapper_jacs) < 0.9  # at least one wrapped doc a 0.9-Jaccard pass drops
