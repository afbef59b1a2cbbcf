"""Deterministic sampling and mixing for training-data curation.

Corpus curation needs REPRODUCIBLE sampling — the same rows selected on
every run, engine, and retry (resumable pipelines, auditable data
lineage) — so this is Bernoulli-by-hash, not ``rand()``: a row is kept
iff its md5-derived bucket (0..9999) falls below the stratum's rate.
Pure column expressions: one scan, no shuffle, no RNG state, and the
DuckDB oracles reproduce the exact bucket values bit-for-bit (same
md5-prefix construction as functions/hashing.py).

At 100 TB this is the shape you want: sampling happens inside the scan
(combined with predicate pushdown and column pruning), and changing the
rate later re-selects a SUPERSET/SUBSET of the previous sample (buckets
are stable), which makes incremental mixture rebalancing cheap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SAMPLE_SEED = "spark-graft-sample"
BUCKETS = 10_000


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def sample_bucket(id_col: Column | str, seed: str = SAMPLE_SEED) -> Column:
    """Stable bucket 0..9999 from md5(seed ':' id) — the sampling coin."""
    h = F.md5(F.concat(F.lit(seed + ":"), _c(id_col).cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % BUCKETS


def hash_sample(
    df: DataFrame, id_col: str = "doc_id", rate: float = 0.1, seed: str = SAMPLE_SEED
) -> DataFrame:
    """Deterministic Bernoulli sample: keep ~rate of rows, stably."""
    return df.where(sample_bucket(id_col, seed) < int(round(rate * BUCKETS)))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: str = SAMPLE_SEED,
) -> DataFrame:
    """Per-stratum deterministic sampling — the mixture-weighting step of
    a training-data pipeline (e.g. books at 1.0, web at 0.25). Rows in
    strata missing from ``rates`` keep ``default_rate``."""
    threshold: Column = F.lit(int(round(default_rate * BUCKETS)))
    for key in sorted(rates):
        threshold = F.when(
            _c(strata_col) == key, F.lit(int(round(rates[key] * BUCKETS)))
        ).otherwise(threshold)
    return df.where(sample_bucket(id_col, seed) < threshold)


def exact_k_per_stratum(
    df: DataFrame,
    k: int = 10,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: str = SAMPLE_SEED,
) -> DataFrame:
    """Exactly-k deterministic sample per stratum (distributed reservoir
    sampling with a portable coin): rank each stratum's rows by their md5
    sample bucket (ties by id) and keep the k smallest.

    Rate-based sampling (``stratified_sample``) can't promise exact
    cardinality; eval sets and per-source audits need exactly k. The
    ``row_number() <= k`` filter is rewritten by Spark's
    InferWindowGroupLimit into a per-partition partial top-k BEFORE the
    stratum shuffle, so each map task forwards at most k rows per
    stratum — the window never materializes a full stratum even when one
    source dominates the corpus (the plan test asserts WindowGroupLimit
    is present). Re-runs, engines, and retries select identical rows.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        sample_bucket(id_col, seed).asc(), _c(id_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )


WEIGHTED_SEED = "spark-graft-wsample"
_U_HEX_DIGITS = 13  # 52 bits -> exact double


def weighted_sample_wor(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: str = WEIGHTED_SEED,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: k rows where
    inclusion probability tracks ``weight_col`` (Efraimidis-Spirakis
    exponential-keys, "Weighted random sampling with a reservoir", IPL
    2006; public technique): draw u ~ U(0,1] per row, rank by
    -ln(u)/w ascending, keep the k smallest.

    Determinism/cross-engine notes: u is md5-derived (52 hex bits ->
    exactly representable double), so re-runs and both engines draw the
    SAME u. The ranking key is rounded to 12 decimals before comparison:
    ln() may differ by 1 ulp between libm and the JVM, and an unrounded
    1-ulp flip at the k-th place would change the selected SET — after
    rounding, a flip requires two keys within 1e-12 of a rounding edge.
    Ties (including exact weight+u collisions) break by id.

    Scale shape: one scan computing the key + a global top-k — Catalyst
    plans the empty-partition rank<=k as TakeOrderedAndProject(limit=k):
    each task keeps its local k smallest, one tiny merge on the driver-
    side reduce, never a full sort (verified in the committed plan).
    """
    w = _c(weight_col).cast("double")
    hex13 = F.substring(F.md5(F.concat(F.lit(seed + ":"), _c(id_col).cast("string"))), 1, _U_HEX_DIGITS)
    u = (F.conv(hex13, 16, 10).cast("double") + F.lit(1.0)) / F.lit(float(16**_U_HEX_DIGITS))
    key = F.round(-F.log(u) / w, 12)
    ranked = df.where(w > 0).withColumn("_wkey", key)
    win = Window.orderBy(F.col("_wkey").asc(), _c(id_col).asc())
    return (
        ranked.withColumn("_rn", F.row_number().over(win))
        .where(F.col("_rn") <= k)
        .drop("_wkey", "_rn")
    )
