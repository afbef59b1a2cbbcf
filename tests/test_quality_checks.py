"""Declarative data-quality constraint verification
(operators/profile.py::check_constraints / check_foreign_key)."""

from __future__ import annotations

import pandas as pd
import pytest

from github_etl_pipeline_spark.operators.profile import (
    between,
    check_constraints,
    check_foreign_key,
    complete,
    in_set,
    matches,
    primary_key,
)


@pytest.fixture()
def table(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1, 2, 3, 4, 4],          # duplicate id -> PK fails
                "status": ["A", "A", "B", "C", "Z"],  # Z outside set
                "code": ["x-1", "x-2", "y-3", "bad", "x-5"],
                "price": [10.0, 20.0, -5.0, 30.0, None],  # one negative, one null
            }
        )
    )


def _rows(df):
    return {r["check"]: r for r in df.collect()}


def test_check_report_values(table):
    rep = _rows(
        check_constraints(
            table,
            [
                complete("price", threshold=0.9),
                primary_key("id"),
                in_set("status", ["A", "B", "C"]),
                matches("code", "^[xy]-"),
                between("price", 0, 100, threshold=0.75),
            ],
        )
    )
    assert len(rep) == 5
    c = rep["complete(price)"]
    assert (c["num"], c["den"], c["ratio"], c["passed"]) == (4, 5, 0.8, False)
    pk = rep["primary_key(id)"]
    assert (pk["num"], pk["den"], pk["passed"]) == (4, 5, False)
    s = rep["in_set(status)"]
    assert (s["num"], s["den"], s["passed"]) == (4, 5, False)
    m = rep["matches(code)"]
    assert (m["num"], m["den"], m["passed"]) == (4, 5, False)
    b = rep["between(price,0,100)"]
    assert (b["num"], b["den"], b["ratio"], b["passed"]) == (3, 4, 0.75, True)


def test_vacuous_check_passes_loudly(spark):
    df = spark.createDataFrame(pd.DataFrame({"v": [None, None]}, dtype="float64"))
    r = _rows(check_constraints(df, [between("v", 0, 1)]))["between(v,0,1)"]
    assert (r["num"], r["den"], r["ratio"], r["passed"]) == (0, 0, 1.0, True)


def test_foreign_key(spark):
    fact = spark.createDataFrame(
        pd.DataFrame({"fk": [1, 1, 2, 9, None]}, dtype="Int64")
    )
    dim = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3]}))
    r = check_foreign_key(fact, "fk", dim, "k").collect()[0]
    # nulls are not applicable; 3 of 4 non-null values resolve
    assert (r["num"], r["den"], r["passed"]) == (3, 4, False)
    assert r["ratio"] == 0.75


def test_single_scan_plan(spark, tmp_path):
    """However many constraints run, the suite is ONE aggregate over ONE
    scan — constraint count must not multiply scans."""
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        pd.DataFrame({"a": [1, 2], "b": ["x", "y"], "c": [0.5, 1.5]})
    ).write.parquet(p)
    df = spark.read.parquet(p)
    plan = (
        check_constraints(
            df,
            [
                complete("a"),
                primary_key("a"),
                in_set("b", ["x", "y"]),
                matches("b", "^[a-z]$"),
                between("c", 0, 1),
            ],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1, plan


def test_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": [1]}))
    with pytest.raises(ValueError, match="non-empty"):
        check_constraints(df, [])
    with pytest.raises(ValueError, match="unknown check kind"):
        check_constraints(df, [{"kind": "nope", "column": "a", "threshold": 1.0}])


def test_metric_kinds(spark):
    from github_etl_pipeline_spark.operators.profile import (
        distinctness,
        mean_at_least,
        mean_at_most,
        row_count_at_least,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"v": [10.0, 20.0, None, 30.0], "g": [1, 1, 2, 2]})
    )
    rep = _rows(
        check_constraints(
            df,
            [
                mean_at_least("v", 15.0),   # mean = 20.0 -> pass
                mean_at_most("v", 15.0),    # 20.0 > 15 -> fail
                distinctness("g", 0.75),    # 2 distinct / 4 -> 0.5 fail
                row_count_at_least(4),      # 4 rows -> pass
            ],
        )
    )
    m = rep["mean_at_least(v)"]
    assert (m["num"], m["den"], m["ratio"], m["passed"]) == (3, 3, 20.0, True)
    assert rep["mean_at_most(v)"]["passed"] is False
    d = rep["distinctness(g)"]
    assert (d["ratio"], d["passed"]) == (0.5, False)
    rc = rep["row_count_at_least(*)"]
    assert (rc["ratio"], rc["passed"]) == (4.0, True)


def test_metric_kinds_vacuous(spark):
    from github_etl_pipeline_spark.operators.profile import mean_at_least

    df = spark.createDataFrame(pd.DataFrame({"v": [None, None]}, dtype="float64"))
    r = _rows(check_constraints(df, [mean_at_least("v", 7.0)]))["mean_at_least(v)"]
    # empty support: observed pinned to the bound itself -> vacuous pass
    assert (r["num"], r["den"], r["ratio"], r["passed"]) == (0, 0, 7.0, True)


def test_k_anonymity_report(spark):
    from github_etl_pipeline_spark.operators.profile import k_anonymity_report

    # groups: (a: 3 rows, 2 users) ok; (b: 2 rows, 1 user) violates k=3
    # and l=2; (c: 4 rows, 1 user) meets k but fails diversity
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "qi": ["a", "a", "a", "b", "b", "c", "c", "c", "c"],
                "u": [1, 2, 1, 3, 3, 4, 4, 4, 4],
            }
        )
    )
    r = k_anonymity_report(df, ["qi"], k=3, sensitive_col="u").collect()[0]
    assert (r["n_rows"], r["n_groups"]) == (9, 3)
    assert (r["n_violating_groups"], r["rows_at_risk"]) == (1, 2)
    assert r["risk_fraction"] == round(2 / 9, 6)
    assert r["retained_fraction"] == round(7 / 9, 6)
    assert (r["min_group_size"], r["max_group_size"]) == (2, 4)
    assert (r["n_low_diversity_groups"], r["min_l_diversity"]) == (2, 1)


def test_k_anonymity_all_safe(spark):
    from github_etl_pipeline_spark.operators.profile import k_anonymity_report

    df = spark.createDataFrame(
        pd.DataFrame({"qi": ["a"] * 5, "u": [1, 2, 3, 4, 5]})
    )
    r = k_anonymity_report(df, ["qi"], k=5, sensitive_col="u").collect()[0]
    assert (r["n_violating_groups"], r["rows_at_risk"], r["risk_fraction"]) == (0, 0, 0.0)
    assert r["retained_fraction"] == 1.0
    assert r["min_l_diversity"] == 5
