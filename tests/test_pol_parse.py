"""P1/P2 parser unit tests (reference etl/transform.py:61-95, 181-186)."""

import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.sources.pol import parse_pol_lines, pol_file_inventory


def _lines_df(spark, rows):
    return spark.createDataFrame(
        [
            (
                v,
                "samples/Pool_0201_395.pol",
                "Pool_0201_395.pol",
                "samples",
                "samples",
                100,
                None,
            )
            for v in rows
        ],
        "value string, source_file string, file_name string, folder_path string, "
        "parent_folder string, file_size long, file_mtime timestamp",
    )


def test_parse_basic_and_lenient(spark):
    df = _lines_df(
        spark,
        [
            "1800 TB2",          # value + type code
            "900 TB3 100",       # third column added in
            "515",               # value only
            "",                  # blank -> dropped
            "abc TB2",           # non-int first token -> dropped
            "700 TB1 xyz",       # non-int third token -> ignored
            "  25  TF1  5  ",    # whitespace tolerant
            "0",                 # zero win kept
        ],
    )
    got = parse_pol_lines(df).select("game_win", "type_code").orderBy("game_win").collect()
    assert [(r.game_win, r.type_code) for r in got] == [
        (0, None),
        (30, "TF1"),
        (515, None),
        (700, "TB1"),
        (1000, "TB3"),
        (1800, "TB2"),
    ]


def test_filename_parse(spark):
    df = _lines_df(spark, ["5"])
    row = parse_pol_lines(df).first()
    assert row.pool_id == "0201" and row.pool_type == "395"


def test_filename_parse_missing_parts(spark):
    df = spark.createDataFrame(
        [("5", "x/weird.pol", "weird.pol", "x", "x", 1, None)],
        "value string, source_file string, file_name string, folder_path string, "
        "parent_folder string, file_size long, file_mtime timestamp",
    )
    row = parse_pol_lines(df).first()
    assert row.pool_id is None and row.pool_type is None


def test_inventory_counts_raw_lines(spark):
    df = _lines_df(spark, ["1", "garbage", "2"])
    inv = pol_file_inventory(df).first()
    assert inv.line_count == 3
    assert inv.pool_id == "0201"
