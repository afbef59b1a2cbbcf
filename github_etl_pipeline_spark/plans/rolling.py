"""Time-series window operators (round 3): native session windows,
trailing RANGE-frame rolling aggregates, and window-based anomaly
detection. These complete the event-analytics surface next to
sessionize/gapfill/hypertable (plans/relational.py).

Scale notes: every query here aggregates raw events down to (key, day)
or (key, session) FIRST — the expensive corpus-sized shuffle happens
once, and all window functions run over the small aggregate. RANGE
frames on integer day keys are O(n log n) sort + linear scan per
partition; none of these plans materializes per-key arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from github_etl_pipeline_spark.functions.epoch import (
    event_micros,
    event_time,
    bucket_div_sql,
)
from github_etl_pipeline_spark.plans.registry import register
from github_etl_pipeline_spark.sources.tables import read_table as _t

_GAP_MIN = 30
_GAP_US = _GAP_MIN * 60 * 1_000_000
_DAY_US = 86_400_000_000


@register(
    "session_window_events",
    oracle=f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS tsu FROM events),
m AS (
  SELECT user_id, tsu,
         CASE WHEN tsu - LAG(tsu) OVER w >= {_GAP_US} OR LAG(tsu) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu)
),
s AS (
  SELECT user_id, tsu,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY tsu
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM m
)
SELECT user_id,
       MIN(tsu) AS session_start_us,
       MAX(tsu) + {_GAP_US} AS session_end_us,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, session_idx
""",
    doc="Spark-NATIVE session windows (F.session_window, the built-in gap-merge "
    "operator, batch/streaming unified) vs the oracle's lag+running-sum emulation. "
    "Native semantics: a session half-open [start, last+gap) — an event landing "
    "exactly at last+gap starts a NEW session (hence >= in the oracle, where the "
    "lag/sum sessionizer uses >); window end = last event + gap.",
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    e = ev.select("user_id", event_time(ev, "ts").alias("_et"))
    s = e.groupBy(
        "user_id", F.session_window("_et", f"{_GAP_MIN} minutes").alias("_w")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return s.select(
        "user_id",
        F.unix_micros(F.col("_w.start")).alias("session_start_us"),
        F.unix_micros(F.col("_w.end")).alias("session_end_us"),
        "n_events",
    )


@register(
    "rolling_7d_revenue",
    oracle=f"""
WITH daily AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day,
         SUM(CAST(value AS DECIMAL(18,2))) AS rev
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT day,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(SUM(rev) OVER w AS DOUBLE) AS rolling_7d_revenue,
       CAST(COUNT(*) OVER w AS BIGINT) AS active_days_7d
FROM daily
WINDOW w AS (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
    doc="trailing 7-day rolling revenue via a RANGE frame on the integer day key "
    "(gap-aware: a missing day narrows the frame, unlike a ROWS frame) — the "
    "window runs over the daily AGGREGATE, never raw events; decimal-exact sums",
)
def rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type") == "purchase")
        .select(event_micros(ev, "ts").alias("tsu"), F.col("value").cast("decimal(18,2)").alias("_v"))
        .select(F.expr(bucket_div_sql("tsu", _DAY_US)).alias("day"), "_v")
        .groupBy("day")
        .agg(F.sum("_v").alias("rev"))
    )
    w = Window.orderBy("day").rangeBetween(-6, 0)
    return daily.select(
        "day",
        F.col("rev").cast("double").alias("revenue"),
        F.sum("rev").over(w).cast("double").alias("rolling_7d_revenue"),
        F.count(F.lit(1)).over(w).cast("long").alias("active_days_7d"),
    )


@register(
    "anomaly_zscore_daily",
    oracle=f"""
WITH daily AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day,
         COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,2))) AS rev
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
t AS (
  SELECT day, CAST(rev AS DOUBLE) AS revenue,
         CAST(SUM(rev) OVER w AS DOUBLE) AS s,
         CAST(SUM(rev * rev) OVER w AS DOUBLE) AS s2,
         CAST(COUNT(*) OVER w AS BIGINT) AS k
  FROM daily
  WINDOW w AS (ORDER BY day RANGE BETWEEN 28 PRECEDING AND 1 PRECEDING)
)
SELECT day, revenue,
       ROUND((revenue - s / k) / SQRT((s2 - s * s / k) / (k - 1)), 4) AS zscore
FROM t WHERE k >= 2
""",
    doc="windowed anomaly detection: each day's revenue z-scored against the "
    "TRAILING-EXCLUSIVE 28-day baseline (RANGE 28 PRECEDING TO 1 PRECEDING — the "
    "current day never contaminates its own baseline); variance from decimal-exact "
    "sum/sumsq so both engines divide identical IEEE inputs",
)
def anomaly_zscore_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type") == "purchase")
        .select(event_micros(ev, "ts").alias("tsu"), F.col("value").cast("decimal(18,2)").alias("_v"))
        .select(F.expr(bucket_div_sql("tsu", _DAY_US)).alias("day"), "_v")
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_v").alias("rev"))
    )
    w = Window.orderBy("day").rangeBetween(-28, -1)
    t = daily.select(
        "day",
        F.col("rev").cast("double").alias("revenue"),
        F.sum("rev").over(w).cast("double").alias("s"),
        F.sum(F.col("rev") * F.col("rev")).over(w).cast("double").alias("s2"),
        F.count(F.lit(1)).over(w).cast("long").alias("k"),
    )
    s, s2, k = F.col("s"), F.col("s2"), F.col("k")
    z = (F.col("revenue") - s / k) / F.sqrt((s2 - s * s / k) / (k - 1))
    return t.where(k >= 2).select("day", "revenue", F.round(z, 4).alias("zscore"))


@register(
    "user_value_trend_events",
    oracle=f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tsu, value FROM events WHERE event_type = 'purchase'
),
b AS (SELECT MIN(tsu) AS t0 FROM e),
s AS (
  SELECT user_id,
         COUNT(*) AS n,
         SUM(CAST((tsu - t0) // {_DAY_US} AS DECIMAL(18,2))) AS sx,
         SUM(CAST(value AS DECIMAL(18,2))) AS sy,
         SUM(CAST((tsu - t0) // {_DAY_US} AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS sxy,
         SUM(CAST((tsu - t0) // {_DAY_US} AS DECIMAL(18,2)) * CAST((tsu - t0) // {_DAY_US} AS DECIMAL(18,2))) AS sx2
  FROM e CROSS JOIN b
  GROUP BY user_id
)
SELECT user_id, n,
       ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
       ROUND((CAST(sy AS DOUBLE) - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE)) / n, 6) AS intercept
FROM s
WHERE n >= 3 AND n * sx2 <> sx * sx
""",
    doc="per-user spend trend: closed-form OLS (slope/intercept) from ONE "
    "grouped pass of decimal-exact sums (n, sx, sy, sxy, sx2) — per-key "
    "regression without applyInPandas; day offsets from the corpus min keep "
    "x small so decimal squares never overflow; degenerate (constant-x or "
    "n<3) groups filtered identically in both engines",
)
def user_value_trend_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    e = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        event_micros(ev, "ts").alias("tsu"),
        F.col("value").cast("decimal(18,2)").alias("_y"),
    )
    t0 = e.agg(F.min("tsu").alias("t0"))
    e = e.crossJoin(F.broadcast(t0)).select(
        "user_id",
        F.expr(f"CAST({bucket_div_sql('tsu - t0', _DAY_US)} AS DECIMAL(18,2))").alias("_x"),
        "_y",
    )
    s = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sx2"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sx2 = F.col("sxy").cast("double"), F.col("sx2").cast("double")
    slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    intercept = (sy - slope * sx) / n
    return s.where(
        (n >= 3) & (n * F.col("sx2") != F.col("sx") * F.col("sx"))
    ).select(
        "user_id", "n", F.round(slope, 6).alias("slope"), F.round(intercept, 6).alias("intercept")
    )


@register(
    "latency_percentiles_events",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       ROUND(quantile_cont(value, 0.50), 6) AS p50,
       ROUND(quantile_cont(value, 0.90), 6) AS p90,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
""",
    doc="per-group exact interpolated percentiles (the p50/p90/p99 service "
    "report shape): Spark percentile() == DuckDB quantile_cont (same "
    "linear-interpolation definition; 6dp rounding absorbs the engines' "
    "differing-but-equivalent interpolation expressions); one shuffle, "
    "sort-based percentile within each group",
)
def latency_percentiles_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.90)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )
