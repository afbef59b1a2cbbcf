"""Domain operator queries: the pool-KPI engine (A1-A7, J1/J2, F1, P1)
exercised on the driver's test tables by reshaping `events` into pool
lines — `user_id % 40` becomes the pool, `event_id`-derived integers the
prize values, and a dimension with deliberately UNPADDED pool ids
exercises the J1 key normalization. The DuckDB oracles replicate the
exact arithmetic including the reference's observable per-term
round(...,4) inside volatility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators.kpis import pool_kpis
from github_etl_pipeline_spark.plans.registry import register
from github_etl_pipeline_spark.sources.lookup import prepare_dim
from github_etl_pipeline_spark.sources.tables import read_table

# shared reshaping (keep Spark and SQL in lockstep)
_POOL_TYPE_CASE_SQL = """CASE (user_id % 40) % 5
  WHEN 0 THEN '395' WHEN 1 THEN '50940020' WHEN 2 THEN '550940020'
  WHEN 3 THEN '40920160' ELSE '941' END"""

_LINES_SQL = f"""
  SELECT user_id,
         LPAD(CAST(user_id % 40 AS VARCHAR), 4, '0') AS pool_id,
         {_POOL_TYPE_CASE_SQL} AS pool_type,
         CASE WHEN event_id % 3 = 0 THEN 0 ELSE (event_id % 13) * 100 END AS game_win
  FROM events
"""


def _pool_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    pool_num = F.col("user_id") % 40
    pool_id = F.lpad(pool_num.cast("string"), 4, "0")
    pool_type = (
        F.when(pool_num % 5 == 0, "395")
        .when(pool_num % 5 == 1, "50940020")
        .when(pool_num % 5 == 2, "550940020")
        .when(pool_num % 5 == 3, "40920160")
        .otherwise("941")
    )
    file_name = F.concat(F.lit("Pool_"), pool_id, F.lit("_"), pool_type, F.lit(".pol"))
    return e.select(
        F.col("user_id"),
        F.concat(F.lit("events/"), file_name).alias("source_file"),
        file_name.alias("file_name"),
        F.lit("events").alias("folder_path"),
        F.lit("events").alias("parent_folder"),
        pool_id.alias("pool_id"),
        pool_type.alias("pool_type"),
        F.when(F.col("event_id") % 3 == 0, F.lit(0))
        .otherwise((F.col("event_id") % 13) * 100)
        .cast("long")
        .alias("game_win"),
    )


def _pool_dim(lines: DataFrame) -> DataFrame:
    """Dimension with UNPADDED Pool_id spellings (J1 normalization path);
    one game row per distinct user mapping to the pool."""
    pool_num = F.col("user_id") % 40
    return (
        lines.select("user_id")
        .distinct()
        .select(
            F.concat(F.lit("G"), F.col("user_id")).alias("Game"),
            F.col("user_id").cast("string").alias("Game_id"),
            pool_num.cast("string").alias("Pool_id"),  # e.g. '7', not '0007'
            (5.0 + (pool_num % 4).cast("double") * 5.0).alias("Bet"),
        )
    )


@register(
    "pool_kpis_synth",
    oracle=f"""
WITH lines AS ({_LINES_SQL}),
dim AS (
  SELECT (user_id % 40) AS pool_num,
         5.0 + CAST((user_id % 40) % 4 AS DOUBLE) * 5.0 AS bet
  FROM events GROUP BY 1
),
game_ids AS (
  SELECT pool_num, STRING_AGG(uid, ',' ORDER BY uid) AS game_ids_csv
  FROM (SELECT DISTINCT (user_id % 40) AS pool_num, CAST(user_id AS VARCHAR) AS uid FROM events)
  GROUP BY pool_num
),
stats AS (
  SELECT pool_id, pool_type,
         COUNT(*) AS size,
         CAST(SUM(game_win) AS BIGINT) AS total_win,
         CAST(SUM(CASE WHEN game_win > 0 THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         MAX(game_win) AS max_win,
         CAST(pool_id AS BIGINT) AS pool_num
  FROM lines GROUP BY pool_id, pool_type
),
kpi AS (
  SELECT s.*, d.bet, g.game_ids_csv,
         ROUND(CAST(s.total_win AS DOUBLE) / (s.size * d.bet) * 100, 2) AS rtp,
         ROUND(CAST(s.hits AS DOUBLE) / s.size * 100, 2) AS hit_frequency,
         s.max_win / d.bet AS max_win_factor
  FROM stats s JOIN dim d ON d.pool_num = s.pool_num
  JOIN game_ids g ON g.pool_num = s.pool_num
),
dist AS (SELECT pool_id, game_win, COUNT(*) AS cnt FROM lines GROUP BY pool_id, game_win),
vols AS (
  SELECT d.pool_id,
         ROUND(1.645 * SQRT(SUM(ROUND(
           (CAST(d.cnt AS DOUBLE) / k.size)
           * (d.game_win / k.bet - k.rtp / 100) * (d.game_win / k.bet - k.rtp / 100), 4))), 2) AS volatility
  FROM dist d JOIN kpi k ON k.pool_id = d.pool_id
  GROUP BY d.pool_id
)
SELECT k.pool_id, k.pool_type, k.size, k.total_win, k.bet AS min_bet,
       k.game_ids_csv, k.rtp, k.hit_frequency, v.volatility, k.max_win_factor,
       CASE WHEN k.pool_type = '395' THEN 'GAB,PFB'
            WHEN LENGTH(k.pool_type) > 4 AND k.pool_type LIKE '5%' THEN 'PFB'
            ELSE 'REG' END AS tag_csv,
       CASE WHEN LENGTH(k.pool_type) > 4 AND k.pool_type LIKE '4%' THEN 1 ELSE 0 END AS is_flat,
       CASE WHEN LENGTH(k.pool_type) > 4 AND k.pool_type LIKE '4%'
            THEN SUBSTR(k.pool_type, LENGTH(k.pool_type) - 3, 4) END AS max_multiplier
FROM kpi k JOIN vols v ON v.pool_id = k.pool_id
""",
    doc="A1-A7 + J1/J2 + F1 + P5: the full pool-KPI engine on events reshaped as pools; volatility reproduces the per-term round(...,4)",
)
def pool_kpis_synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = _pool_lines(spark, sf_dir)
    dim_agg = prepare_dim(_pool_dim(lines))
    out = pool_kpis(lines.drop("user_id"), dim_agg=dim_agg, rounding="half_up", with_processed_at=False)
    return out.select(
        "pool_id",
        "pool_type",
        "size",
        "total_win",
        "min_bet",
        F.array_join(F.array_sort("game_ids"), ",").alias("game_ids_csv"),
        "rtp",
        "hit_frequency",
        "volatility",
        "max_win_factor",
        F.array_join("tag", ",").alias("tag_csv"),
        "is_flat",
        "max_multiplier",
    )


@register(
    "pool_distribution_synth",
    oracle=f"""
WITH lines AS ({_LINES_SQL})
SELECT pool_id, game_win, COUNT(*) AS cnt
FROM lines GROUP BY pool_id, game_win
""",
    doc="A5 value_counts distribution: the engine's single large shuffle, exposed directly",
)
def pool_distribution_synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _pool_lines(spark, sf_dir)
        .groupBy("pool_id", "game_win")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "token_stats_documents",
    oracle="""
WITH t AS (SELECT doc_id, text, regexp_extract_all(text, '\\S+') AS toks FROM documents)
SELECT doc_id,
       LEN(toks) AS n_tokens,
       LEN(list_filter(toks, x -> TRY_CAST(x AS BIGINT) IS NOT NULL)) AS n_int_tokens,
       CAST(COALESCE(list_sum(list_transform(list_filter(toks, x -> TRY_CAST(x AS BIGINT) IS NOT NULL),
                                             x -> TRY_CAST(x AS BIGINT))), 0) AS BIGINT) AS sum_int_tokens,
       TRY_CAST(toks[1] AS BIGINT) AS first_token_int,
       LENGTH(text) AS n_chars_computed
FROM t
""",
    doc="P1 lenient tokenizer surface: tokenize, try_cast, filter non-castable, sum castable (documents.text)",
)
def token_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from github_etl_pipeline_spark.plans.extensions import _fan_out

    d = _fan_out(spark, read_table(spark, sf_dir, "documents"))
    # staged projection: tokenize ONCE, derive from the arrays. Catalyst's
    # CollapseProject keeps the stages separate (merging would duplicate
    # the non-cheap regexp/lambda expressions 4x per row — measured 2.3x
    # slower when inlined).
    toks = F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)
    staged = d.select(
        "doc_id",
        F.length("text").alias("n_chars_computed"),
        toks.alias("_toks"),
        F.filter(
            F.transform(toks, lambda x: x.try_cast("long")), lambda x: x.isNotNull()
        ).alias("_ints"),
    )
    return staged.select(
        "doc_id",
        F.size("_toks").alias("n_tokens"),
        F.size("_ints").alias("n_int_tokens"),
        F.coalesce(
            F.aggregate("_ints", F.lit(0).cast("long"), lambda a, x: a + x), F.lit(0)
        ).alias("sum_int_tokens"),
        F.get("_toks", 0).try_cast("long").alias("first_token_int"),
        "n_chars_computed",
    )


# ---------------------------------------------------------------------------
# J1 dimension-ambiguity boundary, exercised in anger (VERDICT r12 #6): a
# multi-thousand-row dimension (gid = event_id % 5000 -> 5000 keys at
# sf >= 0.01) where four pools (pool % 10 == 3) deliberately carry BOTH
# the unpadded and the zero-padded Pool_id spelling — the J1 edge SURVEY
# §4 warns about (the reference's exact-match-first fallback would be
# ambiguous there). prepare_dim must aggregate the big dim through its
# source-order window WITHOUT tripping its own size guard and SURFACE the
# collision as _n_spellings = 2 instead of silently picking a spelling.
# Every output column is order-invariant (Bet is a function of the pool,
# counts are set-cardinalities), so the source-order pin never leaks into
# the checked values.
# ---------------------------------------------------------------------------
_DIM_GIDS = 5000
_DIM_AMBIG_SQL = f"""
WITH gids AS (SELECT DISTINCT event_id % {_DIM_GIDS} AS gid FROM events),
dim AS (
  SELECT gid, CAST(gid % 40 AS VARCHAR) AS spelling,
         5.0 + CAST((gid % 40) % 4 AS DOUBLE) * 5.0 AS bet
  FROM gids
  UNION ALL
  SELECT gid, LPAD(CAST(gid % 40 AS VARCHAR), 4, '0'),
         5.0 + CAST((gid % 40) % 4 AS DOUBLE) * 5.0
  FROM gids WHERE (gid % 40) % 10 = 3
)
SELECT LPAD(CAST(gid % 40 AS VARCHAR), 4, '0') AS norm_pool_id,
       MIN(bet) AS min_bet,
       CAST(COUNT(*) AS BIGINT) AS n_games,
       CAST(COUNT(DISTINCT spelling) AS BIGINT) AS n_spellings
FROM dim GROUP BY 1
"""


@register(
    "dim_ambiguity_guard_synth",
    oracle=_DIM_AMBIG_SQL,
    doc=f"J1 boundary in anger (VERDICT r12 #6): prepare_dim over a {_DIM_GIDS}-key dimension derived from events where pools 3/13/23/33 carry BOTH the unpadded and zero-padded Pool_id spelling — the normalized-key pre-aggregation runs its source-order window over thousands of rows (well under the loud max_rows guard) and SURFACES the zero-padding collision as _n_spellings = 2 (assert_dim_unambiguous would raise; the query checks the surfacing, tests check the raise); min_bet/min counts are spelling-invariant by construction so the source-order pin cannot leak into checked values; oracle mirrors the seeding, normalization (strip-zeros + zfill 4 == LPAD for <= 2-digit pools), and set-cardinality aggregates",
)
def dim_ambiguity_guard_synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    gids = e.select((F.col("event_id") % _DIM_GIDS).alias("gid")).distinct()
    pool = F.col("gid") % 40
    bet = (5.0 + (pool % 4).cast("double") * 5.0).alias("Bet")

    def rows(spelling, id_offset):
        return gids.select(
            F.concat(F.lit("G"), F.col("gid").cast("string")).alias("Game"),
            (F.col("gid") + id_offset).cast("string").alias("Game_id"),
            spelling.alias("Pool_id"),
            bet,
        )

    base = rows(pool.cast("string"), 0)
    seeds = rows(F.lpad(pool.cast("string"), 4, "0"), 1_000_000).where(
        F.col("Pool_id").isin([f"{p:04d}" for p in (3, 13, 23, 33)])
    )
    agg = prepare_dim(base.unionAll(seeds))
    return agg.select(
        "norm_pool_id",
        "min_bet",
        F.size("game_ids").cast("long").alias("n_games"),
        F.col("_n_spellings").cast("long").alias("n_spellings"),
    )
