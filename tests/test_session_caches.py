"""managed_caches (VERDICT r9 #6): the cache contract made structural.

Operators that persist-and-return document "caller must sweep"; the
context manager turns that into an enforceable scope — every cached
relation is dropped on exit, success or exception, so a long-lived
session composing two operators over a rewritten table cannot be
served stale CacheManager hits."""

import pytest

from github_etl_pipeline_spark.session import managed_caches


def _n_persistent_rdds(spark) -> int:
    return len(spark.sparkContext._jsc.getPersistentRDDs())


def test_managed_caches_sweeps_on_exit(spark):
    with managed_caches(spark) as s:
        assert s is spark
        df = spark.range(100).persist()
        df.count()  # materialize the cache
        assert _n_persistent_rdds(spark) >= 1
    assert _n_persistent_rdds(spark) == 0, "exit must sweep every persist"


def test_managed_caches_sweeps_on_exception(spark):
    with pytest.raises(RuntimeError, match="boom"):
        with managed_caches(spark):
            df = spark.range(50).persist()
            df.count()
            assert _n_persistent_rdds(spark) >= 1
            raise RuntimeError("boom")
    assert _n_persistent_rdds(spark) == 0, "exception path must sweep too"


def test_managed_caches_prevents_stale_reads_over_rewritten_table(spark, tmp_path):
    """The failure mode the contract exists for: cache a relation over a
    parquet path, REWRITE the path, re-run the same plan. Inside one
    managed block per phase, the second run sees the new rows; without
    the sweep the CacheManager would serve the old ones (same analyzed
    plan -> cache hit, no re-scan)."""
    p = str(tmp_path / "t.parquet")
    spark.range(10).write.mode("overwrite").parquet(p)

    with managed_caches(spark):
        df = spark.read.parquet(p).persist()
        assert df.count() == 10

    spark.range(25).write.mode("overwrite").parquet(p)
    spark.catalog.refreshByPath(p)  # drop the stale file-status listing

    with managed_caches(spark):
        df2 = spark.read.parquet(p).persist()
        assert df2.count() == 25, "post-sweep read must see the rewrite"
