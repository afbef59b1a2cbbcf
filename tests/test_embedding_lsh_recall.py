"""Recall floor for the depth-adaptive embedding-LSH pair miner
(VERDICT r10 #2/#3): the r10 adaptive-depth fix bounded candidate volume
by trading recall at moderate cosine — these tests quantify that trade
on CONSTRUCTED cos=0.85 near-dups (deterministic in-plane rotations, not
copies, so they are NOT depth-invariant like the exact-dup seeds) and
pin the ``bands_for_recall`` scale mode that restores the floor at the
deeper depths large corpora select.

Reference parity note: the reference repo has no ANN/recall surface —
this is part of the training-data-pipeline extension block (brief:
dedup/similarity first-class at 100 TB)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators.dedup import (
    adaptive_lsh_depth,
    bands_for_recall,
    embedding_dup_pairs_lsh,
)
from github_etl_pipeline_spark.plans.extensions import (
    _EMB_PAIR_LSH,
    _RECALL_SEED_MOD,
    _RECALL_SEED_OFFSET,
    recall_seed_union,
)
from github_etl_pipeline_spark.sources.tables import read_table

SF = "/root/testdata/sf0.01"


def _recall_of(corpus, pairs_df) -> tuple[int, int]:
    """(found, expected) for the constructed seed pairs in ``corpus``."""
    expected = corpus.where(
        (F.col("vec_id") % _RECALL_SEED_MOD == 0)
        & (F.col("vec_id") < _RECALL_SEED_OFFSET)
    ).select(
        F.col("vec_id").alias("id_a"),
        (F.col("vec_id") + F.lit(_RECALL_SEED_OFFSET)).alias("id_b"),
    )
    n_expected = expected.count()
    found = expected.join(pairs_df, ["id_a", "id_b"]).count()
    return found, n_expected


def test_recall_floor_at_driver_scale(spark):
    """At sf0.01 (n=518, depth 7) the PRODUCTION miner keeps a high
    recall on cos=0.85 near-dups — the registered query's floor."""
    emb = read_table(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    corpus = recall_seed_union(emb)
    pairs = embedding_dup_pairs_lsh(corpus, threshold=0.45, **_EMB_PAIR_LSH)
    found, n = _recall_of(corpus, pairs)
    assert n >= 10  # the seeding produced a meaningful sample
    assert found / n >= 0.75, (found, n)


def _scaled_corpus(spark, copies: int):
    """Key-offset replication (the make_sf1 scheme: +1M per copy) of the
    sf0.01 embeddings — big enough that adaptive depth is genuinely
    deeper than the driver tier's."""
    emb = read_table(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    shifted = (
        spark.range(copies)
        .crossJoin(emb)
        .select(
            (F.col("vec_id") + F.col("id") * F.lit(1_000_000)).alias("vec_id"),
            "embedding",
        )
    )
    return recall_seed_union(shifted)


def _candidate_count(corpus, n: int, kw: dict) -> int:
    """Deduped candidate-pair count of the banding stage under ``kw`` —
    mirrors embedding_dup_pairs_lsh's candidate generation."""
    from github_etl_pipeline_spark.operators.similarity import (
        _hyperplanes,
        lsh_band_keys,
    )

    bands, n_planes = kw["bands"], kw["n_planes"]
    rows = n_planes // bands
    depth = adaptive_lsh_depth(n, kw["target_bucket"], rows)
    keyed = lsh_band_keys(
        corpus, "embedding", "vec_id", _hyperplanes(64, n_planes), bands, rows
    )
    if depth < rows:
        keyed = keyed.select(
            "vec_id", "band", F.substring("bh", 1, depth).alias("bh")
        )
    a = keyed.select("band", "bh", F.col("vec_id").alias("id_a"))
    b = keyed.select("band", "bh", F.col("vec_id").alias("id_b"))
    return (
        a.join(b, ["band", "bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
        .count()
    )


def test_bands_for_recall_restores_floor_at_depth(spark):
    """At 16x driver scale (n~8.3k, adaptive depth 11 > the sf0.01
    tier's 7) the fixed-band production config measurably loses recall;
    bands_for_recall's log-grown band count restores >= 0.85 while
    candidate volume stays within the linear bound L*n*target."""
    corpus = _scaled_corpus(spark, 16).persist()
    n = corpus.count()
    rows = _EMB_PAIR_LSH["n_planes"] // _EMB_PAIR_LSH["bands"]
    depth = adaptive_lsh_depth(n, _EMB_PAIR_LSH["target_bucket"], rows)
    assert depth >= 10, depth  # genuinely deeper than the driver tier

    fixed = embedding_dup_pairs_lsh(corpus, threshold=0.45, **_EMB_PAIR_LSH)
    f_found, f_n = _recall_of(corpus, fixed)

    # ask the formula for 0.95 and assert the 0.85 floor: the closed form
    # is an EXPECTATION over ideal random planes; the md5 planes + the
    # replicated corpus's correlated trials sit a few points under it
    # (measured: target 0.90 -> 0.848, target 0.95 -> ~0.91 here)
    kw = bands_for_recall(n, target_recall=0.95, cos_threshold=0.85, target_bucket=8)
    assert not kw.pop("capped")
    tuned = embedding_dup_pairs_lsh(corpus, threshold=0.45, **kw)
    t_found, t_n = _recall_of(corpus, tuned)

    assert f_n == t_n and f_n >= 100
    fixed_recall, tuned_recall = f_found / f_n, t_found / t_n
    # the decay is real at this depth (else the scale mode is pointless)
    assert fixed_recall < 0.85, fixed_recall
    assert tuned_recall >= 0.85, tuned_recall
    assert tuned_recall > fixed_recall + 0.1

    cands = _candidate_count(corpus, n, kw)
    assert cands <= kw["bands"] * n * kw["target_bucket"], (cands, kw)
    corpus.unpersist()


def test_bands_for_recall_math():
    """Closed-form properties: the returned depth matches the adaptive
    depth the miner will re-derive, band count grows with n (the n^rho
    law), and the overall-recall formula clears the target."""
    for n in (500, 5_000, 50_000, 500_000):
        kw = bands_for_recall(n, target_recall=0.9, cos_threshold=0.85)
        depth = kw["n_planes"] // kw["bands"]
        assert depth == adaptive_lsh_depth(n, kw["target_bucket"], 16)
        p_band = (1.0 - math.acos(0.85) / math.pi) ** depth
        if not kw["capped"]:
            assert 1.0 - (1.0 - p_band) ** kw["bands"] >= 0.9
    l_prev = 0
    for n in (500, 5_000, 50_000):
        bands = bands_for_recall(n, 0.9, 0.85)["bands"]
        assert bands >= l_prev
        l_prev = bands
    # the cap is reported, never silently applied
    kw = bands_for_recall(10_000_000, target_recall=0.99, cos_threshold=0.85,
                          max_bands=16)
    assert kw["capped"] and kw["bands"] == 16


def test_tuned_query_params_match_helper(spark):
    """The registered embedding_lsh_recall_tuned query's FIXED literals
    must equal what bands_for_recall selects for the driver tier's
    seeded corpus size (518 = 500 embeddings + 18 seeds at sf0.01) —
    the literals exist only because the oracle's band CTEs are a fixed
    string; this pin is where a corpus-size change must surface."""
    from github_etl_pipeline_spark.plans.extensions import _EMB_RECALL_TUNED

    emb = read_table(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n = recall_seed_union(emb).count()
    kw = bands_for_recall(
        n, target_recall=0.95, cos_threshold=0.85,
        target_bucket=_EMB_RECALL_TUNED["target_bucket"],
    )
    kw.pop("capped")
    assert kw == _EMB_RECALL_TUNED, (n, kw)


def test_seeded_pairs_sit_at_constructed_cosine(spark):
    """The rotation construction actually lands cos(v, v') = 0.85 (to
    fp rounding) and preserves the norm — the ground truth the recall
    is measured against."""
    from github_etl_pipeline_spark.operators.similarity import dot_expr, norm_expr

    emb = read_table(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    corpus = recall_seed_union(emb)
    orig = corpus.where(
        (F.col("vec_id") % _RECALL_SEED_MOD == 0)
        & (F.col("vec_id") < _RECALL_SEED_OFFSET)
    ).select("vec_id", F.col("embedding").alias("va"))
    seed = corpus.where(F.col("vec_id") >= _RECALL_SEED_OFFSET).select(
        (F.col("vec_id") - _RECALL_SEED_OFFSET).alias("vec_id"),
        F.col("embedding").alias("vb"),
    )
    rows = (
        orig.join(seed, "vec_id")
        .select(
            (
                dot_expr(F.col("va"), F.col("vb"))
                / (norm_expr(F.col("va")) * norm_expr(F.col("vb")))
            ).alias("cos"),
            (norm_expr(F.col("vb")) / norm_expr(F.col("va"))).alias("norm_ratio"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert r.cos == pytest.approx(0.85, abs=1e-9)
        assert r.norm_ratio == pytest.approx(1.0, abs=1e-9)


def test_recall_target_kwarg_routes_through_bands_for_recall(spark):
    """embedding_dup_pairs_lsh(recall_target=...) must mine exactly the
    pair set of an explicit bands_for_recall(...) call — the kwarg is a
    router, not a second implementation (VERDICT r11 #5)."""
    from github_etl_pipeline_spark.session import sweep_caches

    emb = read_table(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    corpus = recall_seed_union(emb)
    n = corpus.count()
    kw = bands_for_recall(n, target_recall=0.95, cos_threshold=0.85, target_bucket=8)
    kw.pop("capped")
    explicit = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs_lsh(corpus, threshold=0.45, **kw).collect()
    }
    sweep_caches(spark)
    routed = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs_lsh(
            corpus, threshold=0.45, recall_target=0.95, recall_cos=0.85
        ).collect()
    }
    sweep_caches(spark)
    assert routed == explicit and len(routed) > 0
