"""Cluster-balanced diversity sampling and reciprocal-rank fusion:
independent math on hand-built inputs plus determinism / plan-shape
checks. The k-means assignment underneath cluster_balanced_sample is
pinned by tests/test_ivf_index.py."""

import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators.similarity import (
    cluster_balanced_sample,
    rrf_fuse,
)
from github_etl_pipeline_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# cluster_balanced_sample
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def sample(spark):
    emb = read_table(spark, SF, "embeddings")
    return cluster_balanced_sample(emb, per_cell=4, n_centroids=8).collect()


def test_quota_respected_per_cell(sample):
    by_cell: dict[int, list[int]] = {}
    for r in sample:
        by_cell.setdefault(r["cell"], []).append(r["cell_rank"])
    assert by_cell  # at least one populated cell
    for ranks in by_cell.values():
        # dense 1..k ranks, never more than the quota
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 4


def test_sample_is_deterministic(spark, sample):
    emb = read_table(spark, SF, "embeddings")
    again = cluster_balanced_sample(emb, per_cell=4, n_centroids=8).collect()
    key = lambda rows: sorted((r["cell"], r["cell_rank"], r["vec_id"]) for r in rows)
    assert key(again) == key(sample)


def test_sample_follows_md5_order_within_cell(spark, sample):
    """Independent math: the picked ids per cell must be exactly the
    per_cell lowest md5(id) digests among that cell's members."""
    import hashlib

    emb = read_table(spark, SF, "embeddings")
    cells = {
        r["vec_id"]: r["cell"]
        for r in cluster_balanced_sample(
            emb, per_cell=10**9, n_centroids=8
        ).collect()  # quota larger than the corpus -> full assignment
    }
    members: dict[int, list[int]] = {}
    for vid, cell in cells.items():
        members.setdefault(cell, []).append(vid)
    expected = set()
    for cell, vids in members.items():
        vids.sort(key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v))
        expected |= {(cell, i + 1, v) for i, v in enumerate(vids[:4])}
    actual = {(r["cell"], r["cell_rank"], r["vec_id"]) for r in sample}
    assert actual == expected


def test_window_rank_collapses_to_partial_topk(spark):
    emb = read_table(spark, SF, "embeddings")
    out = cluster_balanced_sample(emb, per_cell=4, n_centroids=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # partial per-partition top-k


# ---------------------------------------------------------------------------
# rrf_fuse
# ---------------------------------------------------------------------------
def test_rrf_hand_computed(spark):
    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(20, 1), (10, 2), (40, 3)], "doc_id long, rank long"
    )
    got = {
        r["doc_id"]: (r["fused_rank"], r["rrf_score"], r["n_lists"])
        for r in rrf_fuse([a, b], k_const=60, topk=10).collect()
    }
    exp_score = {
        10: round(1 / 61 + 1 / 62, 9),
        20: round(1 / 62 + 1 / 61, 9),
        30: round(1 / 63, 9),
        40: round(1 / 63, 9),
    }
    assert {k: v[1] for k, v in got.items()} == exp_score
    # 10 and 20 tie exactly -> lower id first; 30/40 tie -> 30 first
    assert got[10][0] == 1 and got[20][0] == 2
    assert got[30][0] == 3 and got[40][0] == 4
    assert got[10][2] == 2 and got[30][2] == 1


def test_rrf_topk_cutoff(spark):
    a = spark.createDataFrame(
        [(i, i) for i in range(1, 8)], "doc_id long, rank long"
    )
    out = rrf_fuse([a], topk=3).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["fused_rank"])] == [1, 2, 3]
