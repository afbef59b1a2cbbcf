"""Per-pool KPI aggregation: size, total win, RTP, hit frequency,
volatility@90%CI, max_win_factor, classification.

Reference semantics (etl/transform.py:165-258 + calculate_volatility
:98-127 + output-only max_win_factor, SURVEY §0.1/§2.4):

  size        = row count after lenient parse                      (A1)
  total_win   = sum(game_win)                                      (A2)
  rtp         = round(total_win / (size*min_bet) * 100, 2)         (A3)
  hit_freq    = round(count(game_win>0) / size * 100, 2)           (A4)
  volatility  = round(1.645 * sqrt(sum_i round(f_i*(w_i/bet - rtp/100)^2, 4)), 2)
                over the distinct-value distribution (A5+A6); the per-term
                4dp round is observable reference behavior and reproduced
  max_win_factor = max(game_win) / min_bet                         (A7)
  all metrics NULL unless min_bet > 0 and size > 0                 (P5)

Execution shape (the 100-TB story): the ONLY full-data shuffle is
``groupBy(pool, game_win).count()`` — with partial (map-side) aggregation
this reduces ~1M rows/pool to the pool's distinct-prize-value cardinality
(~30 rows observed in the reference corpus) before any network transfer.
Everything after operates on that tiny ``dist`` relation: per-pool stats,
the rtp-dependent variance pass (a second agg over dist), the dimension
broadcast join. At 1000 executors the scan dominates; the shuffle payload
is ~#pools x #distinct_values rows regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from github_etl_pipeline_spark.functions.keys import normalize_pool_id, reference_match_expr
from github_etl_pipeline_spark.operators.classify import (
    is_flat_expr,
    max_multiplier_expr,
    tag_expr,
)
from github_etl_pipeline_spark.sources.pol import POOL_KEY_COLS

Z_90_CI = 1.645


def _rounder(mode: str):
    if mode == "bankers":
        return F.bround  # parity with numpy/pandas half-even (golden tests)
    if mode == "half_up":
        return F.round  # parity with DuckDB round (oracle queries)
    raise ValueError(f"unknown rounding mode: {mode}")


def pool_distribution(parsed: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """(pool, game_win) -> cnt. The single large shuffle (A5)."""
    key_cols = key_cols or POOL_KEY_COLS
    return parsed.groupBy(*key_cols, "game_win").agg(F.count(F.lit(1)).alias("cnt"))


def pool_kpis(
    parsed: DataFrame,
    dim_agg: DataFrame | None = None,
    inventory: DataFrame | None = None,
    z: float = Z_90_CI,
    rounding: str = "bankers",
    key_cols: list[str] | None = None,
    with_processed_at: bool = True,
) -> DataFrame:
    """Full per-pool KPI record from parsed lines.

    parsed     — output of ``parse_pol_lines`` (or anything with key_cols +
                 ``game_win``).
    dim_agg    — output of ``prepare_dim`` (norm_pool_id, min_bet, game_ids);
                 broadcast-joined. None -> all lookup-dependent metrics NULL.
    inventory  — output of ``pol_file_inventory``; when given, files whose
                 every line failed the parse still emit a size=0 record
                 (reference per-file loop behavior).
    rounding   — 'bankers' (reference parity) or 'half_up' (DuckDB parity).
    """
    key_cols = key_cols or POOL_KEY_COLS
    rnd = _rounder(rounding)

    # Narrow-key optimization: every other pool key column (file_name,
    # folder_path, parent_folder, pool_id, pool_type) is a pure string
    # function of source_file, so the per-row aggregation key is just
    # (source_file, game_win) — the map-side hash agg hashes/compares one
    # string per input row instead of six; the derived columns are
    # recomputed on the tiny per-pool aggregate afterwards.
    derivable = key_cols == POOL_KEY_COLS
    agg_keys = ["source_file"] if derivable else key_cols

    # The single large shuffle. dist is tiny (#pools x distinct prize
    # values, +1 NULL group per pool in single-pass mode) — persist it so
    # the stats pass and the rtp-dependent variance pass don't each
    # re-scan the raw data.
    dist = pool_distribution(parsed.select(*agg_keys, "game_win"), agg_keys).persist()
    valid = F.col("game_win").isNotNull()
    stats = dist.groupBy(*agg_keys).agg(
        F.sum(F.col("cnt")).alias("line_count"),
        F.coalesce(F.sum(F.when(valid, F.col("cnt"))), F.lit(0)).alias("size"),
        F.sum(F.when(valid, F.col("game_win") * F.col("cnt"))).alias("total_win"),
        F.coalesce(
            F.sum(F.when(valid & (F.col("game_win") > 0), F.col("cnt"))), F.lit(0)
        ).alias("hits"),
        F.max("game_win").alias("max_win"),
    )
    if derivable:
        # re-derive the file-identity columns from source_file (must stay
        # in lockstep with sources/pol.py read_pol_lines/parse_pol_lines)
        folder = F.when(
            F.col("source_file").contains("/"),
            F.regexp_replace("source_file", r"/[^/]+$", ""),
        ).otherwise(F.lit("root"))
        parts = F.split(
            F.regexp_replace(F.element_at(F.split("source_file", "/"), -1), r"\.pol$", ""), "_"
        )
        stats = (
            stats.withColumn("file_name", F.element_at(F.split("source_file", "/"), -1))
            .withColumn("folder_path", folder)
            .withColumn("parent_folder", F.element_at(F.split(folder, "/"), -1))
            .withColumn("pool_id", F.get(parts, 1))
            .withColumn("pool_type", F.get(parts, 2))
        )

    if inventory is not None:
        inv_keys = [c for c in key_cols if c in inventory.columns]
        stats = (
            inventory.select(*inv_keys)
            .join(
                stats.select("source_file", "line_count", "size", "total_win", "hits", "max_win"),
                "source_file",
                "left",
            )
            .withColumn("size", F.coalesce(F.col("size"), F.lit(0)))
            .withColumn("hits", F.coalesce(F.col("hits"), F.lit(0)))
        )

    if dim_agg is not None:
        stats = stats.join(
            F.broadcast(dim_agg.select("norm_pool_id", "dim_pool_id", "min_bet", "game_ids")),
            normalize_pool_id(F.col("pool_id")) == F.col("norm_pool_id"),
            "left",
        )
        # post-join gate restoring the reference's asymmetric 3-stage
        # fallback (see functions/keys.py): normalized-key matches the
        # reference would NOT have made (fact '00201' / '201' vs dim
        # '0201') revert to lookup-miss semantics
        matched = reference_match_expr(F.col("pool_id"), F.col("dim_pool_id"))
        stats = (
            stats.withColumn("min_bet", F.when(matched, F.col("min_bet")))
            .withColumn("game_ids", F.when(matched, F.col("game_ids")))
            .drop("norm_pool_id", "dim_pool_id")
        )
    else:
        stats = stats.withColumn("min_bet", F.lit(None).cast("double")).withColumn(
            "game_ids", F.lit(None).cast("array<string>")
        )
    stats = stats.withColumn("game_ids", F.coalesce("game_ids", F.array()))

    gate = F.col("min_bet").isNotNull() & (F.col("min_bet") > 0) & (F.col("size") > 0)
    kpi = stats.select(
        *[c for c in key_cols if c in stats.columns],
        "line_count",
        "size",
        "total_win",
        "max_win",
        "min_bet",
        "game_ids",
        F.when(gate, rnd(F.col("total_win") / (F.col("size") * F.col("min_bet")) * 100, 2))
        .alias("rtp"),
        F.when(gate, rnd(F.col("hits") / F.col("size") * 100, 2)).alias("hit_frequency"),
        F.when(
            F.col("min_bet").isNotNull() & (F.col("min_bet") > 0) & F.col("max_win").isNotNull(),
            F.col("max_win") / F.col("min_bet"),
        ).alias("max_win_factor"),
    )

    # Volatility: second pass over the tiny dist relation with the
    # pool-level (size, min_bet, rtp) attached. AQE broadcasts the smaller
    # side at runtime; both inputs are #pools-scale, never raw-data-scale.
    pool_ctx = kpi.where(F.col("rtp").isNotNull()).select(
        "source_file", F.col("size").alias("_n"), F.col("min_bet").alias("_bet"), F.col("rtp").alias("_rtp")
    )
    # square via multiplication, not pow(): bit-deterministic across
    # engines/libm implementations (matters for the DuckDB oracle compare)
    diff = F.col("game_win") / F.col("_bet") - F.col("_rtp") / 100
    var_term = rnd((F.col("cnt") / F.col("_n")) * diff * diff, 4)
    vols = (
        dist.where(F.col("game_win").isNotNull())
        .select("source_file", "game_win", "cnt")
        .join(pool_ctx, "source_file")
        .groupBy("source_file")
        .agg(rnd(F.lit(z) * F.sqrt(F.sum(var_term)), 2).alias("volatility"))
    )
    out = kpi.join(vols, "source_file", "left")

    out = out.select(
        F.col("file_name").alias("pool_name") if "file_name" in out.columns else F.col("source_file").alias("pool_name"),
        *[c for c in out.columns],
        tag_expr("pool_type").alias("tag"),
        is_flat_expr("pool_type").alias("is_flat"),
        max_multiplier_expr("pool_type").alias("max_multiplier"),
    )
    if with_processed_at:
        out = out.withColumn("processed_at", F.current_timestamp())
    return out
