"""Generalized as-of join (operators/joins.py::asof_join).

Parity oracle: pandas.merge_asof on identical data across every
(direction, tolerance, allow_exact_matches) combination — times are
generated UNIQUE per key so the two engines' tie rules can't diverge
(asof_join pins its own tie-break; merge_asof's is input-order-
dependent). The pinned tie semantics get their own hand-built cases.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators.joins import asof_join


def _mk(seed: int):
    """Random (left, right) frames: ~40 left / ~30 right rows across 4
    keys, integer times unique within each (key, side-union)."""
    rng = np.random.default_rng(seed)
    times = rng.choice(np.arange(1, 20_000, dtype=np.int64), size=300, replace=False)
    lt, rt = times[:160], times[160:]
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 4, size=160),
            "t": lt,
            "lid": np.arange(160, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 4, size=140),
            "rt": rt[:140],
            "val": rng.integers(0, 1_000, size=140),
        }
    )
    return left, right


def _expected(left, right, direction, tolerance, allow_exact):
    out = pd.merge_asof(
        left.sort_values("t", kind="stable"),
        right.sort_values("rt", kind="stable").rename(columns={"rt": "t"}),
        on="t",
        by="k",
        direction=direction,
        tolerance=tolerance,
        allow_exact_matches=allow_exact,
    )
    return (
        out.sort_values("lid")
        .reset_index(drop=True)[["lid", "val"]]
        .astype({"val": "float64"})
    )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 500])
@pytest.mark.parametrize("allow_exact", [True, False])
def test_merge_asof_parity(spark, direction, tolerance, allow_exact):
    seed = (
        ["backward", "forward", "nearest"].index(direction) * 4
        + (0 if tolerance is None else 2)
        + int(allow_exact)
    )
    left, right = _mk(seed=seed)
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            left_on="t",
            right_on="rt",
            values=["val"],
            by=["k"],
            direction=direction,
            tolerance=tolerance,
            allow_exact_matches=allow_exact,
        )
        .select("lid", "val")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
        .astype({"val": "float64"})
    )
    exp = _expected(left, right, direction, tolerance, allow_exact)
    pd.testing.assert_frame_equal(got, exp, check_like=True)


def test_asof_dt_sign_and_null(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": [1, 1, 1], "t": [100, 200, 900]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "rt": [150, 220], "val": [7, 8]})
    )
    rows = {
        r["t"]: r
        for r in asof_join(
            left, right, "t", "rt", values=["val"], by=["k"],
            direction="nearest", tolerance=100,
        ).collect()
    }
    assert rows[100]["val"] == 7 and rows[100]["asof_dt"] == 50
    assert rows[200]["val"] == 8 and rows[200]["asof_dt"] == 20  # +20 beats -50
    assert rows[900]["val"] is None and rows[900]["asof_dt"] is None


def test_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [200]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "rt": [150, 250], "val": [7, 8]})
    )
    row = asof_join(
        left, right, "t", "rt", values=["val"], by=["k"], direction="nearest"
    ).collect()[0]
    assert row["val"] == 7 and row["asof_dt"] == -50


def test_equal_time_tie_is_pinned(spark):
    """Among right rows at the SAME time, backward takes the greatest
    (rt, *values) tuple and forward the least — partition-order-free."""
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [200]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 1], "rt": [100, 100, 300], "val": [3, 9, 5]})
    ).repartition(4)
    back = asof_join(left, right, "t", "rt", ["val"], ["k"], "backward").collect()[0]
    assert back["val"] == 9
    fwd_left = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [50]}))
    fwd = asof_join(fwd_left, right, "t", "rt", ["val"], ["k"], "forward").collect()[0]
    assert fwd["val"] == 3 and fwd["asof_dt"] == 50


def test_exact_match_toggle(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [100]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "rt": [100, 40], "val": [7, 2]})
    )
    inc = asof_join(left, right, "t", "rt", ["val"], ["k"], "backward").collect()[0]
    exc = asof_join(
        left, right, "t", "rt", ["val"], ["k"], "backward", allow_exact_matches=False
    ).collect()[0]
    assert inc["val"] == 7 and inc["asof_dt"] == 0
    assert exc["val"] == 2 and exc["asof_dt"] == -60


def test_validation_raises(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [1], "val": [1]}))
    r = spark.createDataFrame(pd.DataFrame({"k": [1], "rt": [1], "val": [1]}))
    with pytest.raises(ValueError, match="direction"):
        asof_join(df, r, "t", "rt", ["val"], ["k"], direction="sideways")
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(df, r, "t", "rt", ["val"], ["k"], tolerance=-1)
    with pytest.raises(ValueError, match="collision"):
        asof_join(df, r, "t", "rt", ["val"], ["k"])  # left already has val
    # a by/time/value column missing from its side would be silently
    # null-filled by the union merge — must refuse instead
    with pytest.raises(ValueError, match="right.kk"):
        asof_join(df.drop("val"), r, "t", "rt", ["val"], ["kk"])
    with pytest.raises(ValueError, match="right.missing"):
        asof_join(df.drop("val"), r, "t", "rt", ["missing"], ["k"])


def test_single_shuffle_plan(spark):
    """The whole join is ONE exchange + ONE sort + ONE window node (both
    direction frames share the WindowExec ordering) — never a non-equi
    nested-loop join."""
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [1], "lid": [1]}))
    right = spark.createDataFrame(pd.DataFrame({"k": [1], "rt": [1], "val": [1]}))
    plan = (
        asof_join(left, right, "t", "rt", ["val"], ["k"], "nearest")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_global_asof_without_by(spark):
    """by=() is the single-partition (dimension-sized) mode: still
    correct, documented as wrong for corpus scale."""
    left = spark.createDataFrame(pd.DataFrame({"t": [10, 25, 40]}))
    right = spark.createDataFrame(
        pd.DataFrame({"rt": [5, 20, 35], "val": [1, 2, 3]})
    )
    rows = {r["t"]: r["val"] for r in
            asof_join(left, right, "t", "rt", ["val"]).collect()}
    assert rows == {10: 1, 25: 2, 40: 3}


# ---------------------------------------------------------------------------
# Property test: merge_asof parity on ARBITRARY integer time sets
# (unique times per key keep tie rules out of scope — those are pinned
# by the deterministic hand cases above)
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def asof_instance(draw):
    times = draw(
        st.lists(
            st.integers(min_value=0, max_value=10_000),
            min_size=2, max_size=40, unique=True,
        )
    )
    cut = draw(st.integers(min_value=1, max_value=len(times) - 1))
    direction = draw(st.sampled_from(["backward", "forward", "nearest"]))
    tolerance = draw(st.sampled_from([None, 0, 7, 100]))
    allow = draw(st.booleans())
    return times[:cut], times[cut:], direction, tolerance, allow


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(inst=asof_instance())
def test_merge_asof_parity_property(spark, inst):
    lt, rt, direction, tolerance, allow = inst
    left = pd.DataFrame(
        {"k": 1, "t": pd.array(lt, dtype="int64"),
         "lid": np.arange(len(lt), dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"k": 1, "rt": pd.array(rt, dtype="int64"),
         "val": np.arange(100, 100 + len(rt), dtype=np.int64)}
    )
    got = (
        asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            "t", "rt", ["val"], ["k"], direction, tolerance, allow,
        )
        .select("lid", "val")
        .toPandas().sort_values("lid").reset_index(drop=True)
        .astype({"val": "float64"})
    )
    exp = _expected(left, right, direction, tolerance, allow)
    pd.testing.assert_frame_equal(got, exp, check_like=True)
