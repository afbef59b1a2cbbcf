"""Bucketed co-located join: pre-bucketing both sides of a recurring join
on the join key removes the per-query shuffle — the 100-TB lever for the
engine's repeated pool/dimension and fact/fact joins (SURVEY §4 partition
strategy). The assertion is on the PLAN: no Exchange on either side."""

import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    orders = read_table(spark, SF, "orders")
    customer = read_table(spark, SF, "customer")

    (
        orders.write.mode("overwrite")
        .option("path", str(tmp_path / "orders_b"))
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("orders_bucketed")
    )
    (
        customer.write.mode("overwrite")
        .option("path", str(tmp_path / "customer_b"))
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("customer_bucketed")
    )
    try:
        ob = spark.table("orders_bucketed")
        cb = spark.table("customer_bucketed")
        # disable auto-broadcast so the join would OTHERWISE shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey).groupBy("c_mktsegment").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange")
        # the join itself must be exchange-free; only the final tiny
        # groupBy aggregate may shuffle
        assert "SortMergeJoin" in plan
        assert n_exchanges <= 1, plan

        # and the result is right
        got = {r.c_mktsegment: r["count"] for r in joined.collect()}
        expect = {
            r.c_mktsegment: r["count"]
            for r in orders.join(customer, orders.o_custkey == customer.c_custkey)
            .groupBy("c_mktsegment")
            .count()
            .collect()
        }
        assert got == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS customer_bucketed")
