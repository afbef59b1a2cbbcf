"""Relational shape queries (round 3): per-group top-k and UNPIVOT —
the two common reshaping operators the registry didn't yet exercise.

Per-group top-k is the shape to get RIGHT at 100 TB: rank + filter over
a window compiles to Spark's WindowGroupLimit, which pushes the k-limit
into the shuffle (each map task keeps only its local top-k per group
before exchanging) — verified by tests/test_plan_hygiene.py style plan
inspection in tests/test_shapes.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from github_etl_pipeline_spark.plans.registry import register
from github_etl_pipeline_spark.sources.tables import read_table as _t


@register(
    "top3_orders_per_priority",
    oracle="""
WITH r AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
)
SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= 3
""",
    doc="per-group top-k (3 priciest orders per priority, deterministic "
    "orderkey tie-break) — rank+filter compiles to WindowGroupLimit: map "
    "tasks keep local top-3 per group pre-shuffle, so exchanged bytes are "
    "O(groups x k), not O(rows)",
)
def top3_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select("o_orderpriority", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .withColumn("rk", F.col("rk").cast("long"))
    )


@register(
    "unpivot_order_status_counts",
    oracle="""
WITH wide AS (
  SELECT o_orderpriority,
         CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_orders,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS filled_orders,
         CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS partial_orders
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, 'open_orders' AS status_metric, open_orders AS n FROM wide
UNION ALL
SELECT o_orderpriority, 'filled_orders', filled_orders FROM wide
UNION ALL
SELECT o_orderpriority, 'partial_orders', partial_orders FROM wide
""",
    doc="UNPIVOT (wide->long melt via DataFrame.unpivot / Expand): the inverse of "
    "pivot_user_cohort_events — one aggregate pass builds the wide table, the "
    "melt is a zero-shuffle Expand projection (3 output rows per input row)",
)
def unpivot_order_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")

    def cnt(status: str):
        return F.sum(
            F.when(F.col("o_orderstatus") == status, 1).otherwise(0)
        ).cast("long")

    wide = o.groupBy("o_orderpriority").agg(
        cnt("O").alias("open_orders"),
        cnt("F").alias("filled_orders"),
        cnt("P").alias("partial_orders"),
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["open_orders", "filled_orders", "partial_orders"],
        variableColumnName="status_metric",
        valueColumnName="n",
    )
