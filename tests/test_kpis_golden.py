"""Golden-parity tests: run the engine over the reference's own sample
corpus and compare field-for-field against the committed outputs
(Meta_data/all_pools_data.json) and the README worked example.

The committed goldens were generated with a richer lookup xlsx than the
one in the repo (pool 0201 -> Bet 25, game 9493 — not present in
game_id_to_pools.xlsx), so the dimension is reconstructed from the
goldens themselves and injected.
"""

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.pipeline import run_pipeline

REFERENCE_ROOT = Path("/root/reference")
GOLDEN = REFERENCE_ROOT / "Meta_data" / "all_pools_data.json"


@pytest.fixture(scope="module")
def goldens():
    data = json.loads(GOLDEN.read_text())
    return {v["pool_name"]: v for v in data.values()}


@pytest.fixture(scope="module")
def pipeline_out(spark, goldens):
    # dimension reconstructed from goldens (+ the repo xlsx's own row)
    dim_rows = [("Pharaoh", "9493", "0201", 25.0), ("Pharaoh", "6371", "6371", 10.0)]
    dim = spark.createDataFrame(dim_rows, "Game string, Game_id string, Pool_id string, Bet double")
    pools, summary = run_pipeline(spark, REFERENCE_ROOT, dim=dim)
    pools = pools.persist()  # tiny per-pool aggregate; reused by the sink test
    yield pools, summary
    pools.unpersist()


@pytest.fixture(scope="module")
def results(pipeline_out):
    pools, summary = pipeline_out
    return {r["file_name"]: r.asDict() for r in pools.collect()}, summary


def test_all_sample_files_processed(results):
    rows, _ = results
    # 28 sample files under samples/pools2 (one of them twice at two depths
    # is two distinct source files but collect keyed by file_name -> 27 names)
    assert len(rows) >= 27


def test_golden_kpis_match(results, goldens):
    rows, _ = results
    checked = 0
    for name, got in rows.items():
        g = goldens.get(name)
        if g is None:
            continue
        checked += 1
        assert got["pool_id"] == g["pool_id"], name
        assert got["pool_type"] == g["pool_type"], name
        assert got["size"] == g["size"], name
        assert got["min_bet"] == g["min_bet"], name
        assert got["game_ids"] == g["game_ids"], name
        assert got["is_flat"] == g["is_flat"], name
        assert got["tag"] == g["tag"], name
        assert got["max_multiplier"] == g["max_multiplier"], name
        assert got["rtp"] == pytest.approx(g["rtp"], abs=0.011), (name, got["rtp"], g["rtp"])
        assert got["volatility"] == pytest.approx(g["volatility"], abs=0.011), (
            name,
            got["volatility"],
            g["volatility"],
        )
        assert got["hit_frequency"] == pytest.approx(
            g["metadata"]["hit_frequency"], abs=0.011
        ), name
        if "max_win_factor" in g:
            assert got["max_win_factor"] == pytest.approx(g["max_win_factor"], abs=0.011), name
    assert checked >= 27


def test_readme_worked_example(results):
    # README.md:53-105 stats for Pool_0201_395.pol (verified in SURVEY §5)
    rows, _ = results
    got = rows["Pool_0201_395.pol"]
    assert got["size"] == 100000
    assert got["total_win"] == 118744550
    assert got["max_win"] == 25000
    assert got["rtp"] == pytest.approx(4749.78)
    assert got["hit_frequency"] == pytest.approx(100.0)
    assert got["max_win_factor"] == pytest.approx(1000.0)


def test_unmatched_pool_has_null_metrics(results):
    rows, _ = results
    # pool_6371_9999.pol matches the 6371 lookup row -> has metrics;
    # instead verify the null path via a synthetic missing id below.
    assert "pool_6371_9999.pol" in rows


def test_null_metric_path(spark):
    lines = spark.createDataFrame(
        [("100", "x/Pool_9999_941.pol", "Pool_9999_941.pol", "x", "x", 1, None)],
        "value string, source_file string, file_name string, folder_path string, "
        "parent_folder string, file_size long, file_mtime timestamp",
    )
    from github_etl_pipeline_spark.operators.kpis import pool_kpis
    from github_etl_pipeline_spark.sources.lookup import prepare_dim
    from github_etl_pipeline_spark.sources.pol import parse_pol_lines

    dim = spark.createDataFrame(
        [("G", "1", "0201", 25.0)], "Game string, Game_id string, Pool_id string, Bet double"
    )
    out = pool_kpis(parse_pol_lines(lines), dim_agg=prepare_dim(dim)).first()
    assert out.min_bet is None
    assert out.rtp is None and out.volatility is None and out.hit_frequency is None
    assert out.game_ids == []
    assert out.size == 1


def test_consolidated_json_byte_parity(pipeline_out, goldens, tmp_path):
    """Lock the sink's serialization byte-for-byte against the reference's
    writer (etl/load.py:73: json.dump(..., indent=2, ensure_ascii=False,
    default=str) over a sorted-insertion dict): regenerate the expected
    document text independently with the reference's construction and
    compare whole-file bytes. Golden VALUE parity is covered field-wise
    above; additionally, entries whose committed golden numerics match
    ours exactly must render byte-identically modulo source paths and
    processed_at."""
    import json as _json

    from github_etl_pipeline_spark.sinks.upsert import write_consolidated_json

    pools, _ = pipeline_out
    out = write_consolidated_json(pools, tmp_path / "all_pools_data.json")
    written_text = out.read_text(encoding="utf-8")
    written = _json.loads(written_text)

    # 1) whole-file byte parity vs an independent reference-style dump
    def ref_entry(rec: dict) -> dict:
        return {
            "pool_name": rec["pool_name"],
            "pool_id": rec["pool_id"],
            "pool_type": rec["pool_type"],
            "game_ids": rec["game_ids"],
            "min_bet": rec["min_bet"],
            "max_win_factor": rec["max_win_factor"],
            "rtp": rec["rtp"],
            "volatility": rec["volatility"],
            "is_flat": rec["is_flat"],
            "tag": rec["tag"],
            "size": rec["size"],
            "max_multiplier": rec["max_multiplier"],
            "metadata": rec["metadata"],
        }

    expected = {k: ref_entry(v) for k, v in sorted(written.items())}
    expected_text = _json.dumps(expected, indent=2, ensure_ascii=False, default=str)
    assert written_text == expected_text
    assert list(written) == sorted(written)  # deterministic insertion order

    # 2) per-entry byte parity against the committed golden text where the
    # values agree (path prefix + processed_at substituted)
    compared = 0
    for key, rec in written.items():
        g = goldens.get(rec["pool_name"])
        if g is None or "max_win_factor" not in g:
            continue
        g2 = ref_entry({**g, "metadata": dict(g["metadata"])})
        g2["metadata"]["source_file"] = rec["metadata"]["source_file"]
        g2["metadata"]["folder_path"] = rec["metadata"]["folder_path"]
        g2["metadata"]["processed_at"] = rec["metadata"]["processed_at"]
        ours = _json.dumps(rec, indent=2, ensure_ascii=False, default=str)
        theirs = _json.dumps(g2, indent=2, ensure_ascii=False, default=str)
        if ours == theirs:
            compared += 1
    assert compared >= 20, f"only {compared} golden entries matched byte-for-byte"


def test_summary_rollup(results):
    _, summary = results
    row = summary.first()
    assert row.total_files_processed >= 27
    assert row.total_records_across_all_files > 20_000_000
    assert row.tags_distribution.get("REG", 0) > 0
    assert row.rtp_stats.min <= row.rtp_stats.avg <= row.rtp_stats.max
    # folder bug fix: real folders, not {'root': N}
    assert "0201" in row.files_by_folder
