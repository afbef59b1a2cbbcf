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


# ---------------------------------------------------------------------------
# Snapshot diff (CDC between two table versions) — r3
# ---------------------------------------------------------------------------
@register(
    "snapshot_diff_orders",
    oracle="""
WITH old AS (
  SELECT o_orderkey AS k, o_orderstatus AS s, o_orderpriority AS p,
         CAST(o_totalprice AS DECIMAL(18,2)) AS t
  FROM orders
),
new AS (
  SELECT k, s, p, CASE WHEN k % 101 = 0 THEN t + 1 ELSE t END AS t
  FROM old WHERE k % 97 <> 0
  UNION ALL
  SELECT k + 10000000, s, p, t FROM old WHERE k % 103 = 0
),
d AS (
  SELECT COALESCE(o.k, n.k) AS k,
         CASE WHEN o.k IS NULL THEN 'added'
              WHEN n.k IS NULL THEN 'removed'
              WHEN o.s <> n.s OR o.p <> n.p OR o.t <> n.t THEN 'changed'
              ELSE 'unchanged' END AS change_type
  FROM old o FULL JOIN new n ON o.k = n.k
)
SELECT change_type, COUNT(*) AS n,
       CAST(MIN(k) AS BIGINT) AS min_key, CAST(MAX(k) AS BIGINT) AS max_key
FROM d GROUP BY change_type
""",
    doc="snapshot CDC diff (operators/diff.py::snapshot_diff): added/removed/"
    "changed/unchanged per key via ONE full-outer hash join comparing md5 row "
    "fingerprints (16 bytes per matched key, independent of column count) — "
    "the new snapshot is the old one with deterministic synthetic drops (k%97), "
    "price bumps (k%101) and inserts (k%103); decimals in the fingerprint so "
    "the canonical string encoding is engine-portable (the oracle compares "
    "columns directly — same semantics, different mechanism)",
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from github_etl_pipeline_spark.operators.diff import snapshot_diff

    o = _t(spark, sf_dir, "orders")
    old = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("s"),
        F.col("o_orderpriority").alias("p"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("t"),
    )
    k, t = F.col("k"), F.col("t")
    new = old.where(k % 97 != 0).withColumn(
        "t", F.when(k % 101 == 0, t + 1).otherwise(t)
    ).unionByName(
        old.where(k % 103 == 0).withColumn("k", k + 10_000_000)
    )
    d = snapshot_diff(old, new, key="k", compare_cols=["s", "p", "t"])
    return d.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("k").cast("long").alias("min_key"),
        F.max("k").cast("long").alias("max_key"),
    )


# ---------------------------------------------------------------------------
# One-pass all-columns table profiler — r3
# ---------------------------------------------------------------------------
@register(
    "profile_columns_orders",
    oracle="""
WITH c AS (
  SELECT o_orderkey AS o_orderkey, o_custkey,
         o_orderstatus, o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS o_totalprice,
         CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate
  FROM orders
)
SELECT 'o_orderkey' AS column_name, COUNT(*) - COUNT(o_orderkey) AS n_nulls,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_s, CAST(MAX(o_orderkey) AS VARCHAR) AS max_s FROM c
UNION ALL
SELECT 'o_custkey', COUNT(*) - COUNT(o_custkey), COUNT(DISTINCT o_custkey),
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR) FROM c
UNION ALL
SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus),
       MIN(o_orderstatus), MAX(o_orderstatus) FROM c
UNION ALL
SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority), COUNT(DISTINCT o_orderpriority),
       MIN(o_orderpriority), MAX(o_orderpriority) FROM c
UNION ALL
SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice), COUNT(DISTINCT o_totalprice),
       MIN(o_totalprice), MAX(o_totalprice) FROM c
UNION ALL
SELECT 'o_orderdate', COUNT(*) - COUNT(o_orderdate), COUNT(DISTINCT o_orderdate),
       MIN(o_orderdate), MAX(o_orderdate) FROM c
""",
    doc="one-pass all-columns profiler (the DESCRIBE/data-catalog surface): "
    "per column null count, exact distinct count, canonical min/max strings — "
    "ONE aggregate over the scan (Catalyst plans multi-distinct via Expand), "
    "then a zero-shuffle unpivot; doubles profiled through DECIMAL(18,2) and "
    "timestamps through DATE so min/max strings are engine-canonical",
)
def profile_columns_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from github_etl_pipeline_spark.operators.profile import profile_columns
    from github_etl_pipeline_spark.sources.tables import fan_out

    # widen a single-row-group scan first: the multi-distinct Expand
    # multiplies rows ~10x in the partial phase, which otherwise runs on
    # the scan's one task (2x wall at sf0.1; no-op on wide fleet scans)
    return profile_columns(fan_out(spark, _t(spark, sf_dir, "orders")))


# ---------------------------------------------------------------------------
# Declarative data-quality constraint verification (Deequ-style): the
# ingest gate a training pipeline runs before accepting a table. All
# single-table checks ride ONE aggregate over ONE scan; the FK check
# adds one broadcast join; reports unionAll into one inventory.
# The between(o_totalprice, 0, 250000, 0.95) check FAILS by design
# (ratio ~0.50 at every tier) so the gate's failure path is continuously
# hash-verified, not just its happy path.
# ---------------------------------------------------------------------------
@register(
    "quality_checks_orders",
    oracle="""
WITH r AS (
  SELECT 'complete(o_custkey)' AS "check", 'o_custkey' AS column_name,
         CAST(COUNT(o_custkey) AS BIGINT) AS num, CAST(COUNT(*) AS BIGINT) AS den,
         CAST(1.0 AS DOUBLE) AS threshold
  FROM orders
  UNION ALL
  SELECT 'primary_key(o_orderkey)', 'o_orderkey',
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT), CAST(COUNT(o_orderkey) AS BIGINT),
         CAST(1.0 AS DOUBLE)
  FROM orders
  UNION ALL
  SELECT 'in_set(o_orderstatus)', 'o_orderstatus',
         CAST(COUNT_IF(o_orderstatus IN ('F', 'O', 'P')) AS BIGINT),
         CAST(COUNT(o_orderstatus) AS BIGINT), CAST(1.0 AS DOUBLE)
  FROM orders
  UNION ALL
  SELECT 'matches(o_orderpriority)', 'o_orderpriority',
         CAST(COUNT_IF(regexp_matches(o_orderpriority, '^[1-5]-')) AS BIGINT),
         CAST(COUNT(o_orderpriority) AS BIGINT), CAST(1.0 AS DOUBLE)
  FROM orders
  UNION ALL
  SELECT 'between(o_totalprice,0,250000)', 'o_totalprice',
         CAST(COUNT_IF(o_totalprice >= 0 AND o_totalprice <= 250000) AS BIGINT),
         CAST(COUNT(o_totalprice) AS BIGINT), CAST(0.95 AS DOUBLE)
  FROM orders
  UNION ALL
  SELECT 'foreign_key(o_custkey)', 'o_custkey',
         CAST(COUNT_IF(o_custkey IN (SELECT c_custkey FROM customer)) AS BIGINT),
         CAST(COUNT(o_custkey) AS BIGINT), CAST(1.0 AS DOUBLE)
  FROM orders WHERE o_custkey IS NOT NULL
)
SELECT "check", column_name, num, den,
       CASE WHEN den = 0 THEN 1.0
            ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS ratio,
       threshold,
       (CASE WHEN den = 0 THEN 1.0
             ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END) >= threshold
         AS passed
FROM r
""",
    doc="declarative data-quality gate (Deequ-style): completeness, primary-key distinctness, set containment, regex compliance, numeric bounds — ALL compiled into ONE whole-stage-codegen aggregate over ONE scan (cost independent of the number of constraints), plus a broadcast-join referential-integrity check unioned into the same report; one deliberately failing bound keeps the gate's failure path hash-verified",
)
def quality_checks_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from github_etl_pipeline_spark.operators.profile import (
        between,
        check_constraints,
        check_foreign_key,
        complete,
        in_set,
        matches,
        primary_key,
    )

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    single = check_constraints(
        orders,
        [
            complete("o_custkey"),
            primary_key("o_orderkey"),
            in_set("o_orderstatus", ["F", "O", "P"]),
            matches("o_orderpriority", "^[1-5]-"),
            between("o_totalprice", 0, 250000, threshold=0.95),
        ],
    )
    fk = check_foreign_key(orders, "o_custkey", customer, "c_custkey")
    return single.unionAll(fk)


# ---------------------------------------------------------------------------
# Metric-kind quality checks: observed-value gates (decimal-exact means,
# distinctness fraction, row count) in the same one-pass report shape.
# mean_at_most(l_quantity, 25) and distinctness(l_partkey, 0.5) FAIL by
# design at every tier (~25.4 and ~0.03 observed), keeping the metric
# failure path hash-verified alongside quality_checks_orders' bound.
# ---------------------------------------------------------------------------
@register(
    "quality_metrics_lineitem",
    oracle="""
WITH m AS (
  SELECT CAST(COUNT(l_quantity) AS BIGINT) AS n,
         CASE WHEN COUNT(l_quantity) = 0 THEN NULL
              ELSE CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                   / CAST(COUNT(l_quantity) AS DOUBLE) END AS mean_q,
         CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS pk_distinct,
         CAST(COUNT(l_partkey) AS BIGINT) AS pk_n,
         CAST(COUNT(*) AS BIGINT) AS rows_n
  FROM lineitem
),
r AS (
  SELECT 'mean_at_least(l_quantity)' AS "check", 'l_quantity' AS column_name,
         n AS num, n AS den,
         COALESCE(mean_q, 20.0) AS ratio, CAST(20.0 AS DOUBLE) AS threshold,
         COALESCE(mean_q, 20.0) >= 20.0 AS passed
  FROM m
  UNION ALL
  SELECT 'mean_at_most(l_quantity)', 'l_quantity', n, n,
         COALESCE(mean_q, 25.0), CAST(25.0 AS DOUBLE),
         COALESCE(mean_q, 25.0) <= 25.0
  FROM m
  UNION ALL
  SELECT 'distinctness(l_partkey)', 'l_partkey', pk_distinct, pk_n,
         CASE WHEN pk_n = 0 THEN 1.0
              ELSE CAST(pk_distinct AS DOUBLE) / CAST(pk_n AS DOUBLE) END,
         CAST(0.5 AS DOUBLE),
         (CASE WHEN pk_n = 0 THEN 1.0
               ELSE CAST(pk_distinct AS DOUBLE) / CAST(pk_n AS DOUBLE) END) >= 0.5
  FROM m
  UNION ALL
  SELECT 'row_count_at_least(*)', '*', rows_n, rows_n,
         CAST(rows_n AS DOUBLE), CAST(1000.0 AS DOUBLE),
         CAST(rows_n AS DOUBLE) >= 1000.0
  FROM m
)
SELECT * FROM r
""",
    doc="metric-kind quality gates in the same one-pass report: decimal-exact mean bounds (sum through DECIMAL(18,6), one double division — order-independent, engine-identical, unlike native avg over doubles), distinctness fraction, and row-count floor; two checks fail by design at every tier so the metric failure path stays hash-verified",
)
def quality_metrics_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from github_etl_pipeline_spark.operators.profile import (
        check_constraints,
        distinctness,
        mean_at_least,
        mean_at_most,
        row_count_at_least,
    )

    return check_constraints(
        _t(spark, sf_dir, "lineitem"),
        [
            mean_at_least("l_quantity", 20.0),
            mean_at_most("l_quantity", 25.0),
            distinctness("l_partkey", 0.5),
            row_count_at_least(1000),
        ],
    )


@register(
    "window_rank_extras_events",
    oracle="""
WITH r AS (
  SELECT event_type, event_id, value,
         ROUND(percent_rank() OVER w, 6) AS pct_rank,
         ROUND(cume_dist() OVER w, 6) AS cume,
         nth_value(event_id, 2) OVER (PARTITION BY event_type ORDER BY value, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_id,
         ROW_NUMBER() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
)
SELECT event_type, event_id, pct_rank, cume, second_id
FROM r WHERE rn <= 50
""",
    doc="rank-family completion (percent_rank / cume_dist / nth_value) per "
    "event_type over (value, event_id) — deterministic total order so the "
    "relative-rank doubles are formula-identical across engines (6dp "
    "rounding); limited to the 50 lowest rows per group to keep the "
    "registered output bounded",
)
def window_rank_extras_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r = e.select(
        "event_type",
        "event_id",
        "value",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("event_id", 2).over(wf).alias("second_id"),
        F.row_number().over(w).alias("rn"),
    )
    return r.where(F.col("rn") <= 50).select(
        "event_type", "event_id", "pct_rank", "cume", "second_id"
    )


# ---------------------------------------------------------------------------
# Privacy governance: k-anonymity / l-diversity release-gate audit
# (operators/profile.py::k_anonymity_report). Quasi-identifier =
# (event_type, event day, value bucket); sensitive = user_id. ONE summary
# row so the query is never vacuous at any tier (at larger SFs the same
# quasi-identifier groups GROW, so the violating-group list would thin
# out; the counts always remain).
# ---------------------------------------------------------------------------
@register(
    "k_anonymity_events",
    oracle="""
WITH g AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(value / 50.0) AS BIGINT) AS value_bucket,
         CAST(COUNT(*) AS BIGINT) AS _n,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS _l
  FROM events
  GROUP BY 1, 2, 3
)
SELECT CAST(SUM(_n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(COUNT(*) FILTER (WHERE _n < 5) AS BIGINT) AS n_violating_groups,
       CAST(SUM(CASE WHEN _n < 5 THEN _n ELSE 0 END) AS BIGINT) AS rows_at_risk,
       ROUND(CAST(SUM(CASE WHEN _n < 5 THEN _n ELSE 0 END) AS DOUBLE)
             / CAST(SUM(_n) AS DOUBLE), 6) AS risk_fraction,
       ROUND(CAST(SUM(_n) - SUM(CASE WHEN _n < 5 THEN _n ELSE 0 END) AS DOUBLE)
             / CAST(SUM(_n) AS DOUBLE), 6) AS retained_fraction,
       CAST(MIN(_n) AS BIGINT) AS min_group_size,
       CAST(MAX(_n) AS BIGINT) AS max_group_size,
       CAST(COUNT(*) FILTER (WHERE _l < 2) AS BIGINT) AS n_low_diversity_groups,
       CAST(MIN(_l) AS BIGINT) AS min_l_diversity
FROM g
""",
    doc="k-anonymity / l-diversity release-gate audit (k=5, l=2) over quasi-identifier (event_type, event day, value bucket) with user_id sensitive: ONE shuffle on the quasi-identifier computing group size + distinct-sensitive count in the same aggregate, then a tiny group-level rollup to a single summary row (n_rows, violating groups, rows_at_risk, risk/retained fractions 6dp, min/max group size, low-diversity groups) — the pre-export privacy gate for user-linked training corpora, paired with redact_pii for free text; day derives from event_micros (physical-type-drift-proof), bucket from FLOOR of a double division (engine-identical)",
)
def k_anonymity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from github_etl_pipeline_spark.functions.epoch import bucket_div_sql, event_micros
    from github_etl_pipeline_spark.operators.profile import k_anonymity_report

    ev = _t(spark, sf_dir, "events")
    qi = ev.select(
        "event_type",
        event_micros(ev, "ts").alias("tsu"),
        F.floor(F.col("value") / F.lit(50.0)).alias("value_bucket"),
        "user_id",
    ).select(
        "event_type",
        F.expr(bucket_div_sql("tsu", 86400000000)).alias("day"),
        "value_bucket",
        "user_id",
    )
    return k_anonymity_report(
        qi, ["event_type", "day", "value_bucket"], k=5, sensitive_col="user_id"
    )
