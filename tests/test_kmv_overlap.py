"""KMV set operations (operators/sketches.py::kmv_pair_overlap).

Accuracy oracle: synthetic integer-key groups with KNOWN union /
intersection / Jaccard — the estimates must land within the sketch's
theoretical error band (~1/sqrt(k)); below-k groups must be EXACT.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators.sketches import (
    KMV_PAIR_K,
    kmv_pair_overlap,
)


def _groups(spark, spec: dict[str, range]):
    rows = [(g, int(v)) for g, r in spec.items() for v in r]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["g", "v"]))


def test_exact_below_k(spark):
    """Groups with < k distinct keys carry their COMPLETE hash sets, so
    every estimate is exact."""
    df = _groups(spark, {"a": range(0, 100), "b": range(60, 160)})
    row = kmv_pair_overlap(df, "v", "g", k=KMV_PAIR_K).collect()[0]
    assert (row["grp_a"], row["grp_b"]) == ("a", "b")
    assert row["n_a"] == 100 and row["n_b"] == 100
    assert row["union_est"] == 160.0
    assert row["matched"] == 40 and row["k_eff"] == 160
    assert row["jaccard_est"] == 40 / 160
    assert row["inter_est"] == pytest.approx(40.0)


def test_estimates_within_error_band(spark):
    """50k-vs-50k keys with 20k shared: union 80k, J=0.25. k=256 gives
    sigma ~ 1/16; assert within 4 sigma (deterministic md5 hashes, so
    this is a fixed number — the bound just documents the regime)."""
    df = _groups(spark, {"a": range(0, 50_000), "b": range(30_000, 80_000)})
    row = kmv_pair_overlap(df, "v", "g").collect()[0]
    assert row["n_a"] == KMV_PAIR_K and row["k_eff"] == KMV_PAIR_K
    assert row["union_est"] == pytest.approx(80_000, rel=0.25)
    assert row["jaccard_est"] == pytest.approx(0.25, abs=0.11)
    assert row["inter_est"] == pytest.approx(20_000, rel=0.45)


def test_disjoint_and_identical(spark):
    df = _groups(
        spark,
        {"a": range(0, 3_000), "b": range(0, 3_000), "c": range(50_000, 53_000)},
    )
    rows = {
        (r["grp_a"], r["grp_b"]): r
        for r in kmv_pair_overlap(df, "v", "g").collect()
    }
    ab = rows[("a", "b")]
    assert ab["jaccard_est"] == 1.0 and ab["matched"] == ab["k_eff"]
    ac = rows[("a", "c")]
    assert ac["jaccard_est"] == 0.0 and ac["inter_est"] == 0.0
    assert len(rows) == 3  # C(3,2)


def test_pair_stage_is_corpus_independent(spark):
    """The nested-loop pair join must sit ABOVE the sketch aggregate
    (group-count-sized relations), never against corpus-scale rows: the
    plan's sole corpus-side exchanges are the distinct + window
    shuffles, and output pair count is C(groups, 2) regardless of
    corpus rows."""
    df = _groups(spark, {g: range(0, 2_000) for g in "abcde"})
    out = kmv_pair_overlap(df, "v", "g")
    assert out.count() == 10
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan  # partial top-k before the exchange


def test_k_validation(spark):
    df = _groups(spark, {"a": range(3)})
    with pytest.raises(ValueError, match="k must be"):
        kmv_pair_overlap(df, "v", "g", k=1)
