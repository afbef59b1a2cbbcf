"""J1 join-key normalization (reference etl/transform.py:199-215)."""

import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.functions.keys import normalize_pool_id
from github_etl_pipeline_spark.sources.lookup import (
    assert_dim_unambiguous,
    prepare_dim,
)


def test_normalize_pool_id(spark):
    df = spark.createDataFrame(
        [("0201",), ("201",), ("6371",), ("0",), ("000",), ("12345",)], "x string"
    )
    got = {r.x: r.n for r in df.select("x", normalize_pool_id("x").alias("n")).collect()}
    assert got == {
        "0201": "0201",
        "201": "0201",
        "6371": "6371",
        "0": "0000",
        "000": "0000",
        "12345": "12345",
    }


def _dim(spark, rows):
    return spark.createDataFrame(rows, "Game string, Game_id string, Pool_id string, Bet double")


def test_prepare_dim_first_bet_and_all_game_ids(spark):
    dim = _dim(
        spark,
        [
            ("A", "11", "201", 25.0),   # unpadded spelling joins 0201 facts
            ("B", "22", "201", 50.0),   # second row: Bet ignored, Game_id kept
            ("C", "33", "6371", 10.0),
        ],
    )
    agg = prepare_dim(dim)
    rows = {r.norm_pool_id: r for r in agg.collect()}
    assert rows["0201"].min_bet == 25.0  # FIRST row's Bet, source order
    assert rows["0201"].game_ids == ["11", "22"]
    assert rows["6371"].game_ids == ["33"]
    assert_dim_unambiguous(agg)


def test_dim_ambiguity_detected(spark):
    dim = _dim(spark, [("A", "1", "201", 25.0), ("B", "2", "0201", 30.0)])
    with pytest.raises(ValueError):
        assert_dim_unambiguous(prepare_dim(dim))
