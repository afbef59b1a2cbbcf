"""k-center greedy coreset (operators/similarity.py::kcenter_coreset):
hand-checkable geometry, duplicate exclusion, k>n truncation, coverage
monotonicity."""

import math

import pandas as pd

from github_etl_pipeline_spark.operators.similarity import kcenter_coreset


def _df(spark, vecs):
    return spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(len(vecs)), "embedding": [list(map(float, v)) for v in vecs]}
        )
    )


def test_farthest_first_geometry(spark):
    # unit vectors at angles 0, 90, 180 deg plus a near-copy of 0 deg.
    # seed = id 0; round 2 must take the antipode (id 2, cos dist 2);
    # round 3 the orthogonal (id 1, dist 1); the near-copy last.
    vecs = [(1, 0), (0, 1), (-1, 0), (0.999, 0.01)]
    out = {r["pos"]: r for r in kcenter_coreset(_df(spark, vecs), k=4).collect()}
    assert [out[p]["vec_id"] for p in (1, 2, 3, 4)] == [0, 2, 1, 3]
    assert out[1]["radius"] is None
    assert out[2]["radius"] == 2.0
    assert out[3]["radius"] == 1.0
    # near-copy's distance to center 0: 1 - cos(theta), tiny but > 0
    exp = round(1 - 0.999 / math.hypot(0.999, 0.01), 9)
    assert out[4]["radius"] == exp
    # coverage curve is non-increasing after the seed
    radii = [out[p]["radius"] for p in (2, 3, 4)]
    assert radii == sorted(radii, reverse=True)


def test_duplicate_exclusion(spark):
    # exact duplicates of the seed must not be re-selected while any
    # distinct vector remains
    vecs = [(1, 0), (1, 0), (1, 0), (0, 1)]
    out = kcenter_coreset(_df(spark, vecs), k=3).collect()
    ids = [r["vec_id"] for r in sorted(out, key=lambda r: r["pos"])]
    assert ids[0] == 0
    assert ids[1] == 3  # the distinct vector beats the dist-0 duplicates
    assert ids[2] in (1, 2) and out[2]["radius"] == 0.0


def test_k_exceeds_corpus(spark):
    out = kcenter_coreset(_df(spark, [(1, 0), (0, 1)]), k=5).collect()
    assert len(out) == 2  # truncates, no duplicate re-selection


def test_k_one_and_validation(spark):
    import pytest

    df = _df(spark, [(1, 0), (0, 1)])
    out = kcenter_coreset(df, k=1).collect()
    assert len(out) == 1 and out[0]["vec_id"] == 0 and out[0]["radius"] is None
    with pytest.raises(ValueError):
        kcenter_coreset(df, k=0)
