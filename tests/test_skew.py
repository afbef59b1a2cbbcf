"""salted_join equals a plain join on skewed data for every join type
(the explicit skew lever documented in functions/skew.py)."""

import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.functions.skew import salted_join
from github_etl_pipeline_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    # events.user_id is mildly skewed; join against a synthetic dim
    events = read_table(spark, SF, "events")
    dim = events.select("user_id").distinct().withColumn(
        "segment", (F.col("user_id") % 3).cast("string")
    )
    plain = (
        events.join(dim, "user_id")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s"))
    )
    salted = (
        salted_join(events, dim, "user_id", salt_factor=8, salt_source="event_id")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def _skewed_fixtures(spark):
    """A hot-keyed fact (one key dominates), plus a dim with unmatched
    rows and a null key — the cases outer joins must get exactly right."""
    fact_rows = [(7, f"hot{i}") for i in range(500)] + [
        (1, "a"), (2, "b"), (None, "nullfact")
    ]
    fact = spark.createDataFrame(fact_rows, "k long, v string")
    dim = spark.createDataFrame(
        [(7, "dim7"), (1, "dim1"), (99, "unmatched99"), (None, "nulldim")],
        "k long, d string",
    )
    return fact, dim


def _rows(df):
    rows = [tuple(r[c] for c in sorted(df.columns)) for r in df.collect()]
    return sorted(rows, key=lambda t: tuple((v is None, str(v)) for v in t))


@pytest.mark.parametrize("how", ["inner", "left", "right", "full"])
def test_salted_join_matches_plain_all_types(spark, how):
    fact, dim = _skewed_fixtures(spark)
    plain = fact.join(dim, "k", how).select("k", "v", "d")
    salted = salted_join(fact, dim, "k", salt_factor=4, salt_source="v", how=how).select(
        "k", "v", "d"
    )
    assert _rows(salted) == _rows(plain)


@pytest.mark.parametrize("how", ["right_outer", "fullouter", "outer"])
def test_salted_join_accepts_aliases(spark, how):
    fact, dim = _skewed_fixtures(spark)
    plain = fact.join(dim, "k", how).select("k", "v", "d")
    salted = salted_join(fact, dim, "k", salt_factor=4, salt_source="v", how=how).select(
        "k", "v", "d"
    )
    assert _rows(salted) == _rows(plain)


def test_salted_join_rejects_unknown_type(spark):
    fact = spark.createDataFrame([(1, "a")], "k long, v string")
    dim = spark.createDataFrame([(1, "x")], "k long, d string")
    with pytest.raises(ValueError, match="unsupported join type"):
        salted_join(fact, dim, "k", how="cross")
    with pytest.raises(ValueError, match="unsupported join type"):
        salted_join(fact, dim, "k", how="left_anti")
