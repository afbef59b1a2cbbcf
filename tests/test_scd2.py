"""Type-2 SCD rebuild (operators/diff.py::scd2_intervals): interval
correctness, unchanged-state collapse, null-safe transitions, multi-
attribute change detection, tie ordering."""

import pandas as pd

from github_etl_pipeline_spark.operators.diff import scd2_intervals


def _run(spark, rows, attrs=("status",), ties=("eid",)):
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", *attrs, "ts", "eid"]).astype(
            {"ts": "int64", "eid": "int64"}
        )
    )
    return sorted(
        scd2_intervals(df, ["k"], list(attrs), "ts", list(ties)).collect(),
        key=lambda r: (r["k"], r["valid_from"]),
    )


def test_intervals_and_collapse(spark):
    rows = [
        ("u", "a", 10, 1),
        ("u", "a", 20, 2),   # unchanged -> collapsed
        ("u", "b", 30, 3),
        ("u", "a", 40, 4),   # back to a -> NEW version (not merged with 1st)
    ]
    out = _run(spark, rows)
    assert [(r["status"], r["valid_from"], r["valid_to"], r["is_current"]) for r in out] == [
        ("a", 10, 30, False),
        ("b", 30, 40, False),
        ("a", 40, None, True),
    ]


def test_null_safe_transitions(spark):
    rows = [
        ("u", None, 10, 1),  # first version with NULL attr
        ("u", None, 20, 2),  # NULL -> NULL: no change
        ("u", "x", 30, 3),   # NULL -> value: change
        ("u", None, 40, 4),  # value -> NULL: change
    ]
    out = _run(spark, rows)
    assert [(r["status"], r["valid_from"]) for r in out] == [
        (None, 10),
        ("x", 30),
        (None, 40),
    ]
    assert out[0]["valid_to"] == 30 and out[-1]["is_current"]


def test_multi_attribute_change(spark):
    rows = [
        ("u", "a", 1, 10, 1),
        ("u", "a", 2, 20, 2),  # second attr changes -> new version
        ("u", "a", 2, 30, 3),  # unchanged pair -> collapse
    ]
    out = _run(spark, rows, attrs=("s1", "s2"))
    assert [(r["s1"], r["s2"], r["valid_from"]) for r in out] == [
        ("a", 1, 10),
        ("a", 2, 20),
    ]


def test_tiebreak_orders_simultaneous(spark):
    # two observations at the same ts: eid orders them deterministically
    rows = [("u", "a", 10, 2), ("u", "b", 10, 1)]
    out = _run(spark, rows)
    assert [(r["status"], r["valid_from"], r["valid_to"]) for r in out] == [
        ("b", 10, 10),
        ("a", 10, None),
    ]


def test_keys_independent(spark):
    rows = [("u", "a", 10, 1), ("v", "a", 5, 2), ("v", "b", 7, 3)]
    out = _run(spark, rows)
    per_key = {}
    for r in out:
        per_key.setdefault(r["k"], []).append(r)
    assert len(per_key["u"]) == 1 and per_key["u"][0]["is_current"]
    assert [r["valid_to"] for r in per_key["v"]] == [7, None]
