"""M7: incremental processing via streaming file source + checkpoint
(reference S2/S3/EP2 — the git-diff loop re-expressed as Structured
Streaming with Trigger.AvailableNow)."""

import pytest

from github_etl_pipeline_spark.sinks.upsert import read_store
from github_etl_pipeline_spark.sources.lookup import prepare_dim
from github_etl_pipeline_spark.streaming.incremental import run_incremental


@pytest.fixture()
def dim_agg(spark):
    dim = spark.createDataFrame(
        [("G", "9493", "201", 25.0)], "Game string, Game_id string, Pool_id string, Bet double"
    )
    return prepare_dim(dim)


def test_incremental_two_runs(spark, tmp_path, dim_agg):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    ckpt = tmp_path / "ckpt"
    store = tmp_path / "store"

    (corpus / "Pool_0201_941.pol").write_text("100\n200\n")
    n1 = run_incremental(spark, corpus, ckpt, store, dim_agg)
    assert n1 >= 1
    got1 = {r.source_file: r.size for r in read_store(spark, store).collect()}
    assert got1 == {"Pool_0201_941.pol": 2}

    # second run with a NEW file: only it is processed; old record preserved
    (corpus / "Pool_0201_395.pol").write_text("50\n")
    n2 = run_incremental(spark, corpus, ckpt, store, dim_agg)
    assert n2 >= 1
    got2 = {r.source_file: r.size for r in read_store(spark, store).collect()}
    assert got2 == {"Pool_0201_941.pol": 2, "Pool_0201_395.pol": 1}

    # third run, nothing new -> no batches with data, store unchanged
    n3 = run_incremental(spark, corpus, ckpt, store, dim_agg)
    got3 = {r.source_file: r.size for r in read_store(spark, store).collect()}
    assert got3 == got2


def test_incremental_kpis_match_batch(spark, tmp_path, dim_agg):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "Pool_0201_941.pol").write_text("0\n100\n200\n300\n")
    run_incremental(spark, corpus, tmp_path / "ck", tmp_path / "st", dim_agg)
    row = spark.read.parquet(str(tmp_path / "st")).first()
    # size=4, total=600, bet=25: rtp = 600/(4*25)*100 = 600.0
    assert row.size == 4 and row.rtp == 600.0 and row.hit_frequency == 75.0


def test_incremental_mtime_reprocesses_in_place_edit(spark, tmp_path, dim_agg):
    """The (path, mtime)-keyed ledger (run_incremental_mtime) must match
    the reference's git-diff change model: an IN-PLACE edit of an
    already-processed file is detected and its KPI row updated — the
    case the path-keyed streaming checkpoint cannot see."""
    import os
    import time

    from github_etl_pipeline_spark.streaming.incremental import run_incremental_mtime

    corpus = tmp_path / "corpus_m"
    corpus.mkdir()
    ledger = tmp_path / "ledger_m"
    store = tmp_path / "store_m"

    f = corpus / "Pool_0201_941.pol"
    f.write_text("100\n200\n")
    n1 = run_incremental_mtime(spark, corpus, ledger, store, dim_agg)
    assert n1 == 1
    got1 = {r.source_file: r.size for r in read_store(spark, store).collect()}
    assert got1 == {"Pool_0201_941.pol": 2}

    # no changes -> nothing processed
    assert run_incremental_mtime(spark, corpus, ledger, store, dim_agg) == 0

    # IN-PLACE edit (same path, new content, strictly newer mtime)
    f.write_text("100\n200\n300\n")
    later = time.time() + 2
    os.utime(f, (later, later))
    n2 = run_incremental_mtime(spark, corpus, ledger, store, dim_agg)
    assert n2 == 1, "in-place edit must be detected"
    got2 = {r.source_file: r.size for r in read_store(spark, store).collect()}
    assert got2 == {"Pool_0201_941.pol": 3}, "KPI row must reflect the edit"

    # a NEW file alongside: only it is processed, edited row preserved
    (corpus / "Pool_0201_395.pol").write_text("50\n")
    n3 = run_incremental_mtime(spark, corpus, ledger, store, dim_agg)
    assert n3 == 1
    got3 = {r.source_file: r.size for r in read_store(spark, store).collect()}
    assert got3 == {"Pool_0201_941.pol": 3, "Pool_0201_395.pol": 1}


def test_incremental_mtime_first_run_is_directory_scan(spark, tmp_path, dim_agg):
    """The FIRST mtime-CDC run (no ledger) must plan ONE directory-rooted
    scan, not a driver-collected per-path file list (VERDICT r4 #4): at
    fleet scale the full-corpus path list cannot round-trip the driver.
    The churn run keeps the bounded path-list read."""
    from github_etl_pipeline_spark.streaming.incremental import (
        _full_scan_text,
        run_incremental_mtime,
    )

    corpus = tmp_path / "corpus_d"
    (corpus / "sub").mkdir(parents=True)
    (corpus / "Pool_0201_941.pol").write_text("100\n200\n")
    (corpus / "sub" / "Pool_0201_395.pol").write_text("50\n")

    # the full-scan read is rooted at the scan dir: its FileScan location
    # lists exactly one root path (the directory), not per-file paths
    raw = _full_scan_text(spark, str(corpus))
    plan = raw._jdf.queryExecution().executedPlan().toString()
    loc = plan.split("Location:")[1].split("PartitionFilters")[0]
    # ONE root path in the file index (the directory), not one per file
    assert "(1 paths)" in loc, f"expected a single-rooted file index: {loc}"
    # the one root is the scan directory (plan truncates long paths, so
    # match on the untruncated prefix)
    assert f"file:{str(corpus)}"[:40] in loc

    # and the first run over that scan produces the full-store result
    ledger = tmp_path / "ledger_d"
    store = tmp_path / "store_d"
    assert run_incremental_mtime(spark, corpus, ledger, store, dim_agg) == 2
    got = {r.source_file: r.size for r in read_store(spark, store).collect()}
    assert got == {"Pool_0201_941.pol": 2, "sub/Pool_0201_395.pol": 1}

    # steady state unchanged: nothing to do, then churn processes one
    assert run_incremental_mtime(spark, corpus, ledger, store, dim_agg) == 0
    (corpus / "Pool_0201_999.pol").write_text("1\n2\n3\n")
    assert run_incremental_mtime(spark, corpus, ledger, store, dim_agg) == 1
