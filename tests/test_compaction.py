"""Compaction sink: file-count reduction, row preservation, and the
data-skipping property the rewrite exists for (non-overlapping per-file
key ranges)."""

from __future__ import annotations

from pyspark.sql import functions as F

from github_etl_pipeline_spark.sinks.compact import compact_parquet


def _fragmented_table(spark, path, n_files=40, rows_per_file=50):
    """Simulate streaming-ingest damage: many tiny files, each spanning
    the WHOLE key range (worst case for data skipping)."""
    df = (
        spark.range(n_files * rows_per_file)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 7 % 1000).alias("v"),
        )
        # round-robin scatter: every output file gets keys from the full range
        .repartition(n_files)
    )
    df.write.mode("overwrite").parquet(str(path))
    return df


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    _fragmented_table(spark, src)
    stats = compact_parquet(spark, src, dst, sort_cols=["k"], target_rows_per_file=500)
    assert stats["rows"] == 2000
    assert stats["files_before"] >= 30
    assert stats["files_after"] <= 5
    out = spark.read.parquet(str(dst))
    assert out.count() == 2000
    # content identical, schema identical
    assert sorted(out.columns) == ["k", "v"]
    assert out.agg(F.sum("k"), F.sum("v")).collect() == spark.read.parquet(
        str(src)
    ).agg(F.sum("k"), F.sum("v")).collect()


def test_compact_produces_nonoverlapping_key_ranges(spark, tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    _fragmented_table(spark, src)
    compact_parquet(spark, src, dst, sort_cols=["k"], target_rows_per_file=500)
    ranges = (
        spark.read.parquet(str(dst))
        .select(F.col("k"), F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(ranges) >= 2
    for prev, cur in zip(ranges, ranges[1:]):
        # range partitioning: every file's span is disjoint -> a point
        # lookup on k prunes to exactly one file
        assert prev["hi"] < cur["lo"]


def test_compact_requires_sort_cols(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        compact_parquet(spark, tmp_path, tmp_path / "o", sort_cols=[])
