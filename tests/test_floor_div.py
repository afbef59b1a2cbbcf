"""bucket_div_sql contract: the integer bucketing division must agree
between Spark and the DuckDB oracle for ALL operands, negatives included
(pre-epoch timestamps, negative keys).

Measured ground truth on the baked-in DuckDB 1.0.0: integer ``//``
TRUNCATES toward zero (``-101 // 10 = -10``, ``-5 // 10 = 0``) — the
same semantics as Spark's ``div``, and NOT Python's floor division. The
repo pins Spark `div` against oracle `//` on that basis; this test
re-measures DuckDB every run so a DuckDB upgrade that silently switches
``//`` to floor semantics fails here first, not in a driver hash
mismatch."""

import duckdb
import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.functions.epoch import bucket_div_sql

VALS = [-101, -100, -99, -25, -21, -20, -19, -10, -5, -1, 0, 1, 9, 10, 11, 19, 20, 99, 100, 101]


@pytest.mark.parametrize("divisor", [10, 24, 3_600_000_000])
def test_bucket_div_matches_duckdb(spark, divisor):
    df = spark.createDataFrame([(v,) for v in VALS], "x long")
    got = [
        r.y
        for r in df.select("x", F.expr(bucket_div_sql("x", divisor)).alias("y"))
        .orderBy("x")
        .collect()
    ]
    vals_sql = ", ".join(f"({v})" for v in VALS)
    want_duck = [
        r[0]
        for r in duckdb.sql(
            f"SELECT x // {divisor} FROM (VALUES {vals_sql}) t(x) ORDER BY x"
        ).fetchall()
    ]
    assert got == want_duck
    # document the semantics being pinned: truncation toward zero
    want_trunc = [int(v / divisor) for v in sorted(VALS)]
    assert got == want_trunc


def test_duckdb_integer_div_truncates_not_floors():
    """The measured DuckDB behavior the whole oracle suite relies on. If
    this starts failing after a DuckDB upgrade, every `//` bucket oracle
    needs an explicit trunc()/floor alignment pass."""
    assert duckdb.sql("SELECT -101 // 10, -5 // 10").fetchall() == [(-10, 0)]


def test_bucket_div_rejects_nonpositive_divisor():
    with pytest.raises(ValueError):
        bucket_div_sql("x", 0)
