"""Semantic tests for the sketch operators (operators/sketches.py):
CMS never under-counts, is exact when width >> distinct keys, and the
HLL estimate lands within the expected error band; cross-engine value
equality is covered by test_oracle_contract.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators.sketches import (
    cms_estimate,
    cms_sketch,
    hll_estimate,
    hll_registers,
)


def _keys(spark, ks):
    return spark.createDataFrame([(k,) for k in ks], "k string")


def test_cms_never_undercounts_and_exact_when_sparse(spark):
    ks = ["a"] * 7 + ["b"] * 3 + ["c"] * 1
    df = _keys(spark, ks)
    sketch = cms_sketch(df, "k")
    est = {
        r.user_key: r.est_count
        for r in cms_estimate(sketch, df.distinct(), "k").collect()
    }
    exact = {"a": 7, "b": 3, "c": 1}
    for k, n in exact.items():
        assert est[k] >= n  # CMS upper bound
    # 3 keys into 4x256 counters: no collisions, estimates are exact
    assert est == exact


def test_cms_sketch_is_constant_size(spark):
    df = _keys(spark, [str(i % 50) for i in range(5000)])
    assert cms_sketch(df, "k", depth=4, width=16).count() <= 4 * 16


def test_hll_registers_dedup_invariant(spark):
    once = _keys(spark, [str(i) for i in range(200)])
    thrice = _keys(spark, [str(i) for i in range(200)] * 3)
    r1 = {r.bucket: r.register for r in hll_registers(once, "k").collect()}
    r3 = {r.bucket: r.register for r in hll_registers(thrice, "k").collect()}
    assert r1 == r3  # registers depend only on the distinct key set


def test_hll_estimate_within_error_band(spark):
    n = 1000
    df = _keys(spark, [f"user-{i}" for i in range(n)])
    regs = {r.bucket: r.register for r in hll_registers(df, "k").collect()}
    est = hll_estimate(regs)
    # m=64 -> relative error ~1.04/sqrt(64) = 13%; allow 3 sigma
    assert abs(est - n) / n < 0.40
