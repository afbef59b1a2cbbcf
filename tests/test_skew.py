"""salted_join equals a plain join on skewed data (the explicit skew
lever documented in functions/skew.py)."""

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


def test_salted_join_rejects_outer(spark):
    import pytest
    from github_etl_pipeline_spark.functions.skew import salted_join

    fact = spark.createDataFrame([(1, "a")], "k long, v string")
    dim = spark.createDataFrame([(1, "x")], "k long, d string")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(fact, dim, "k", how="full")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(fact, dim, "k", how="right")
