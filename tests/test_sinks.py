"""Sink tests: parquet upsert semantics + idempotence (S8 property from
SURVEY §5), consolidated JSON format parity, reports."""

import json

import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.sinks.upsert import upsert_parquet, write_consolidated_json


def _pools_df(spark, rows):
    return spark.createDataFrame(rows, "source_file string, rtp double")


def test_upsert_insert_update_preserve(spark, tmp_path):
    table = tmp_path / "store"
    upsert_parquet(spark, _pools_df(spark, [("a", 1.0), ("b", 2.0)]), table)
    # update a, insert c, preserve b
    upsert_parquet(spark, _pools_df(spark, [("a", 9.0), ("c", 3.0)]), table)
    got = {r.source_file: r.rtp for r in spark.read.parquet(str(table)).collect()}
    assert got == {"a": 9.0, "b": 2.0, "c": 3.0}


def test_upsert_idempotent(spark, tmp_path):
    table = tmp_path / "store"
    df = _pools_df(spark, [("a", 1.0), ("b", 2.0)])
    upsert_parquet(spark, df, table)
    once = sorted(map(str, spark.read.parquet(str(table)).collect()))
    upsert_parquet(spark, df, table)
    twice = sorted(map(str, spark.read.parquet(str(table)).collect()))
    assert once == twice


def test_consolidated_json_upsert_and_shape(spark, tmp_path):
    out = tmp_path / "all_pools_data.json"
    full = spark.createDataFrame(
        [
            (
                "Pool_0201_395.pol", "0201", "395", ["9493"], 25.0, 1000.0, 4749.78,
                56.52, 0, ["GAB", "PFB"], 100000, None, "p/Pool_0201_395.pol",
                "Pool_0201_395.pol", "p", 100.0,
            )
        ],
        "pool_name string, pool_id string, pool_type string, game_ids array<string>, "
        "min_bet double, max_win_factor double, rtp double, volatility double, "
        "is_flat int, tag array<string>, size long, max_multiplier string, "
        "source_file string, file_name string, folder_path string, hit_frequency double",
    ).withColumn("processed_at", F.current_timestamp())
    write_consolidated_json(full, out)
    data = json.loads(out.read_text())
    rec = data["p/Pool_0201_395.pol"]
    # reference record shape (etl/transform.py:237-256)
    assert rec["rtp"] == 4749.78 and rec["tag"] == ["GAB", "PFB"]
    assert rec["metadata"]["hit_frequency"] == 100.0
    assert set(rec) == {
        "pool_name", "pool_id", "pool_type", "game_ids", "min_bet", "max_win_factor",
        "rtp", "volatility", "is_flat", "tag", "size", "max_multiplier", "metadata",
    }
    # upsert: second write updates in place, no duplicate keys
    write_consolidated_json(full, out)
    assert len(json.loads(out.read_text())) == 1


def test_full_output_surface(spark, tmp_path):
    from github_etl_pipeline_spark.pipeline import run_pipeline

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "Pool_0201_941.pol").write_text("100\n0 TB1\n250 TB2 10\n")
    (d / "Pool_0202_888.pol").write_text("garbage\n")
    dim = spark.createDataFrame(
        [("G", "9493", "201", 25.0)], "Game string, Game_id string, Pool_id string, Bet double"
    )
    out = tmp_path / "Meta_data"
    run_pipeline(spark, d, dim=dim, output_dir=out)

    data = json.loads((out / "all_pools_data.json").read_text())
    assert len(data) == 2
    rec = data["Pool_0201_941.pol"]
    assert rec["size"] == 3 and rec["game_ids"] == ["9493"]

    summary = json.loads((out / "_pipeline_summary.json").read_text())
    assert summary["files_processed"] == 2
    assert summary["files_succeeded"] == 1
    assert summary["files_failed"] == 1
    assert summary["aggregated_summary"]["total_records_across_all_files"] == 3

    index = json.loads((out / "_index.json").read_text())
    assert index["total_files"] == 2
    csv_text = (out / "_all_files_summary.csv").read_text()
    assert csv_text.splitlines()[0].startswith("source_file,pool_name")
    assert len(csv_text.strip().splitlines()) == 3


def _has_delta() -> bool:
    try:
        import delta.tables  # noqa: F401

        return True
    except ImportError:
        return False


def test_merge_into_upserts_and_is_idempotent(spark, tmp_path):
    from github_etl_pipeline_spark.sinks.upsert import merge_into

    table = tmp_path / "merged"
    merge_into(spark, table, _pools_df(spark, [("a", 1.0), ("b", 2.0)]), backend="parquet")
    merge_into(spark, table, _pools_df(spark, [("a", 9.0), ("c", 3.0)]), backend="parquet")
    got = {r.source_file: r.rtp for r in spark.read.parquet(str(table)).collect()}
    assert got == {"a": 9.0, "b": 2.0, "c": 3.0}  # matched update + insert
    # MERGE of the same updates twice == once
    merge_into(spark, table, _pools_df(spark, [("a", 9.0), ("c", 3.0)]), backend="parquet")
    again = {r.source_file: r.rtp for r in spark.read.parquet(str(table)).collect()}
    assert again == got


@pytest.mark.skipif(not _has_delta(), reason="delta-spark not installed")
def test_merge_into_delta_backend(spark, tmp_path):
    """Same MERGE semantics through the transactional Delta backend
    (first call CREATES the Delta table; later calls are literal
    MERGE INTO)."""
    from github_etl_pipeline_spark.sinks.upsert import merge_into

    table = tmp_path / "merged_delta"
    merge_into(spark, table, _pools_df(spark, [("a", 1.0), ("b", 2.0)]), backend="delta")
    merge_into(spark, table, _pools_df(spark, [("a", 9.0), ("c", 3.0)]), backend="delta")
    read = spark.read.format("delta").load(str(table))
    got = {r.source_file: r.rtp for r in read.collect()}
    assert got == {"a": 9.0, "b": 2.0, "c": 3.0}
    merge_into(spark, table, _pools_df(spark, [("a", 9.0), ("c", 3.0)]), backend="delta")
    again = {r.source_file: r.rtp for r in spark.read.format("delta").load(str(table)).collect()}
    assert again == got


@pytest.mark.skipif(_has_delta(), reason="delta-spark installed")
def test_merge_into_delta_backend_fails_loudly_without_delta(spark, tmp_path):
    """backend='delta' must raise, never silently degrade to the
    last-writer-wins parquet emulation."""
    from github_etl_pipeline_spark.sinks.upsert import merge_into

    with pytest.raises(ImportError):
        merge_into(
            spark, tmp_path / "t", _pools_df(spark, [("a", 1.0)]), backend="delta"
        )
    assert not (tmp_path / "t").exists()


def test_upsert_schema_evolution(spark, tmp_path):
    """A new column appearing in updates must not break the upsert:
    existing rows carry NULL for it (parquet schema evolution), updated/
    inserted rows carry the value — the Delta MERGE schema-evolution
    semantics the emulation mirrors."""
    path = tmp_path / "tbl"
    v1 = spark.createDataFrame(
        [("a.pol", 1.0), ("b.pol", 2.0)], "source_file string, rtp double"
    )
    upsert_parquet(spark, v1, path)
    v2 = spark.createDataFrame(
        [("b.pol", 2.5, 60.0), ("c.pol", 3.0, 70.0)],
        "source_file string, rtp double, hit_frequency double",
    )
    upsert_parquet(spark, v2, path)
    got = {
        r["source_file"]: (r["rtp"], r["hit_frequency"])
        for r in spark.read.parquet(str(path)).collect()
    }
    assert got == {"a.pol": (1.0, None), "b.pol": (2.5, 60.0), "c.pol": (3.0, 70.0)}


def test_upsert_schema_narrowing(spark, tmp_path):
    """Updates MISSING a column the table has must also merge (their
    rows get NULL for it) — allowMissingColumns covers both directions."""
    path = tmp_path / "tbl2"
    v1 = spark.createDataFrame(
        [("a.pol", 1.0, 50.0)], "source_file string, rtp double, hit_frequency double"
    )
    upsert_parquet(spark, v1, path)
    v2 = spark.createDataFrame([("b.pol", 2.0)], "source_file string, rtp double")
    upsert_parquet(spark, v2, path)
    got = {
        r["source_file"]: (r["rtp"], r["hit_frequency"])
        for r in spark.read.parquet(str(path)).collect()
    }
    assert got == {"a.pol": (1.0, 50.0), "b.pol": (2.0, None)}
