"""Bucketized join operators vs brute-force reference: every true match
emitted EXACTLY once (the canonical-bucket trick must neither drop nor
duplicate), across bucket widths smaller/larger than interval lengths,
with and without equi-keys, including touching-boundary intervals."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators.joins import interval_overlap_join, range_join


def _intervals(spark, n, seed, key_mod, prefix):
    rng = random.Random(seed)
    rows = [
        (
            i,
            i % key_mod,
            (s := rng.randrange(0, 1000)),
            s + rng.randrange(0, 120),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, f"{prefix}_id int, k int, {prefix}_start long, {prefix}_end long"
    )


@pytest.mark.parametrize("width", [7, 50, 400])
def test_overlap_join_matches_bruteforce(spark, width):
    a = _intervals(spark, 60, seed=1, key_mod=3, prefix="a")
    b = _intervals(spark, 50, seed=2, key_mod=3, prefix="b")
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            a, b, "a_start", "a_end", "b_start", "b_end", keys=("k",), bucket_width=width
        ).collect()
    )
    want = sorted(
        (r["a_id"], r["b_id"])
        for r in a.join(b, "k")
        .where((F.col("a_start") <= F.col("b_end")) & (F.col("b_start") <= F.col("a_end")))
        .collect()
    )
    assert want, "fixture should produce overlaps"
    assert got == want  # exactly-once: sorted lists equal => no dups, no misses


def test_overlap_join_unkeyed_and_touching_bounds(spark):
    a = spark.createDataFrame([(1, 0, 10), (2, 100, 200)], "a_id int, a_start long, a_end long")
    b = spark.createDataFrame(
        [(1, 10, 20), (2, 21, 99), (3, 200, 300)], "b_id int, b_start long, b_end long"
    )
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            a, b, "a_start", "a_end", "b_start", "b_end", bucket_width=16
        ).collect()
    )
    # closed intervals: touching endpoints (10,10) and (200,200) DO match
    assert got == [(1, 1), (2, 3)]


def test_range_join_matches_bruteforce(spark):
    facts = spark.createDataFrame(
        [(i, i % 2, (i * 37) % 500) for i in range(80)], "f_id int, k int, t long"
    )
    iv = _intervals(spark, 40, seed=3, key_mod=2, prefix="b")
    got = sorted(
        (r["f_id"], r["b_id"])
        for r in range_join(facts, iv, "t", "b_start", "b_end", keys=("k",), bucket_width=30).collect()
    )
    want = sorted(
        (r["f_id"], r["b_id"])
        for r in facts.join(iv, "k")
        .where((F.col("t") >= F.col("b_start")) & (F.col("t") <= F.col("b_end")))
        .collect()
    )
    assert want
    assert got == want


def test_overlap_join_rejects_bad_width(spark):
    a = spark.createDataFrame([(1, 0, 1)], "a_id int, a_start long, a_end long")
    with pytest.raises(ValueError):
        interval_overlap_join(a, a, "a_start", "a_end", "a_start", "a_end", bucket_width=0)
