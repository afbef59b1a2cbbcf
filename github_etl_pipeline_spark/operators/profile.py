"""Generic one-pass table profiler — the DESCRIBE / data-catalog surface
for ANY DataFrame (null counts, exact distinct counts, canonical min/max
strings per column).

One aggregate over one scan: Catalyst plans the multi-column DISTINCT
set with a single Expand (rows x distinct-columns intermediate, each
slice partially aggregated map-side), then the wide 4xN-column result
melts to one row per column through a zero-shuffle ``stack`` projection.
No per-column jobs, no driver loops.

Canonicalization (why min/max go through casts): float-to-string and
timestamp-to-string renderings differ across engines/locales, so
profiles meant for cross-engine comparison stringify doubles through
DECIMAL and timestamps through DATE — both render identically in Spark
and DuckDB. Callers profiling for human eyes can pass ``raw=True`` to
skip the casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _canonical(df: DataFrame, raw: bool) -> DataFrame:
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if not raw:
            if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
                c = c.cast("decimal(18,2)").cast("string")
            elif isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
                c = c.cast("date").cast("string")
        cols.append(c.alias(f.name))
    return df.select(*cols)


def profile_columns(df: DataFrame, raw: bool = False) -> DataFrame:
    """(column_name, n_nulls, n_distinct, min_s, max_s) for every column
    of ``df`` — two aggregate passes + zero-shuffle unpivot.

    The distinct counts and the plain aggregates run as SEPARATE
    aggregates whose single-row results cross-join (r13): mixing
    count_distinct with plain aggs in one agg makes Catalyst route every
    plain agg through the multi-distinct Expand (rows x columns
    intermediate, each plain agg re-evaluated gid-guarded on every
    slice) — measured 6.2s at sf0.1/orders where the two split
    aggregates cost 1.0s + 0.85s. Expressions are unchanged, so the
    report is value-identical; the extra scan is the cheap part of
    either plan."""
    c = _canonical(df, raw)
    plain, dist = [], []
    for col in c.columns:
        plain += [
            (F.count(F.lit(1)) - F.count(col)).alias(f"{col}__nulls"),
            F.min(col).cast("string").alias(f"{col}__min"),
            F.max(col).cast("string").alias(f"{col}__max"),
        ]
        dist.append(F.count_distinct(F.col(col)).alias(f"{col}__distinct"))
    wide = c.agg(*plain).crossJoin(c.agg(*dist))
    stack_args = ", ".join(
        f"'{col}', `{col}__nulls`, `{col}__distinct`, `{col}__min`, `{col}__max`"
        for col in c.columns
    )
    return wide.selectExpr(
        f"stack({len(c.columns)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, min_s, max_s)"
    )


# ---------------------------------------------------------------------------
# Declarative data-quality constraint verification (the Deequ-style
# check suite a 100-TB ingest runs BEFORE training): every single-table
# constraint compiles to count_if aggregates evaluated in ONE pass over
# ONE scan, melted to a row per check — no per-constraint jobs.
# ---------------------------------------------------------------------------
def complete(column: str, threshold: float = 1.0) -> dict:
    """Fraction of rows with ``column`` non-null >= threshold."""
    return {"kind": "complete", "column": column, "threshold": threshold}


def primary_key(column: str) -> dict:
    """Every non-null value distinct (distinct/count == 1)."""
    return {"kind": "primary_key", "column": column, "threshold": 1.0}


def in_set(column: str, values: list, threshold: float = 1.0) -> dict:
    """Fraction of NON-NULL values inside ``values`` >= threshold
    (nullability is `complete`'s job, not containment's)."""
    return {"kind": "in_set", "column": column, "threshold": threshold,
            "values": list(values)}


def matches(column: str, regex: str, threshold: float = 1.0) -> dict:
    """Fraction of non-null values matching ``regex`` (rlike / partial
    match semantics, identical in DuckDB regexp_matches)."""
    return {"kind": "matches", "column": column, "threshold": threshold,
            "regex": regex}


def between(column: str, lo, hi, threshold: float = 1.0) -> dict:
    """Fraction of non-null values inside [lo, hi] >= threshold."""
    return {"kind": "between", "column": column, "threshold": threshold,
            "lo": lo, "hi": hi}


def _check_name(c: dict) -> str:
    k = c["kind"]
    if k == "in_set":
        return f"in_set({c['column']})"
    if k == "matches":
        return f"matches({c['column']})"
    if k == "between":
        return f"between({c['column']},{c['lo']},{c['hi']})"
    return f"{k}({c['column']})"


def distinctness(column: str, threshold: float) -> dict:
    """distinct/count(non-null) >= threshold — the relaxed form of
    :func:`primary_key` (which is distinctness at exactly 1.0)."""
    return {"kind": "distinctness", "column": column, "threshold": threshold}


def mean_at_least(column: str, bound: float) -> dict:
    """Column mean >= bound. The mean is decimal-exact: sum through
    DECIMAL(18,6) (order-independent), one double division by the
    non-null count — engine-identical, unlike native avg() over doubles.
    In the report, ``ratio`` holds the OBSERVED MEAN and ``threshold``
    the bound."""
    return {"kind": "mean_at_least", "column": column, "threshold": bound}


def mean_at_most(column: str, bound: float) -> dict:
    """Column mean <= bound (see :func:`mean_at_least` for exactness)."""
    return {"kind": "mean_at_most", "column": column, "threshold": bound}


def row_count_at_least(n: int) -> dict:
    """Table has at least ``n`` rows. ``ratio`` holds the observed row
    count; column_name reports '*'."""
    return {"kind": "row_count_at_least", "column": "*", "threshold": float(n)}


def check_constraints(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Evaluate every declarative check in ONE aggregate over ONE scan.

    Output one row per check: (check, column_name, num, den, ratio,
    threshold, passed). For ratio-kind checks (complete / primary_key /
    distinctness / in_set / matches / between) ratio = num/den
    (exact-operand BIGINT -> DOUBLE division, engine-identical) and
    passed = ratio >= threshold; den counts the APPLICABLE rows (all
    rows for completeness, non-null values otherwise) — a vacuous check
    (den = 0) reports ratio 1.0 and passes, loudly visible via den in
    the report. For METRIC-kind checks, ratio holds the observed metric:
    mean_at_least / mean_at_most report the decimal-exact mean (num =
    den = the non-null support; empty support passes vacuously),
    row_count_at_least reports the row count (passed = count >= n).

    Scale shape: the whole suite is count_if / count_distinct /
    decimal-sum expressions inside one whole-stage-codegen aggregate —
    cost is one corpus scan regardless of how many constraints run,
    output is |checks| rows. Referential integrity needs a second
    relation and lives in :func:`check_foreign_key` (same output shape,
    unionAll the reports).
    """
    if not checks:
        raise ValueError("checks must be non-empty")
    aggs = []
    for i, c in enumerate(checks):
        k = c["kind"]
        col = F.col(c["column"]) if c["column"] != "*" else None
        ratio = None  # default: num/den with the den-0 guard
        op = ">="
        if k == "complete":
            num, den = F.count(col), F.count(F.lit(1))
        elif k in ("primary_key", "distinctness"):
            num, den = F.count_distinct(col), F.count(col)
        elif k == "in_set":
            num = F.count_if(col.isin(c["values"]))
            den = F.count(col)
        elif k == "matches":
            num = F.count_if(col.rlike(c["regex"]))
            den = F.count(col)
        elif k == "between":
            num = F.count_if((col >= F.lit(c["lo"])) & (col <= F.lit(c["hi"])))
            den = F.count(col)
        elif k in ("mean_at_least", "mean_at_most"):
            num = den = F.count(col)
            mean = F.sum(col.cast("decimal(18,6)")).cast("double") / F.count(
                col
            ).cast("double")
            # empty support -> vacuous pass at the bound itself
            ratio = F.when(F.count(col) == 0, F.lit(float(c["threshold"]))).otherwise(
                mean
            )
            op = ">=" if k == "mean_at_least" else "<="
        elif k == "row_count_at_least":
            num = den = F.count(F.lit(1))
            ratio = F.count(F.lit(1)).cast("double")
        else:
            raise ValueError(f"unknown check kind {k!r}")
        if ratio is None:
            ratio = F.when(den == 0, F.lit(1.0)).otherwise(
                num.cast("double") / den.cast("double")
            )
        passed = ratio >= F.lit(float(c["threshold"])) if op == ">=" else (
            ratio <= F.lit(float(c["threshold"]))
        )
        aggs += [
            num.alias(f"n{i}"),
            den.alias(f"d{i}"),
            ratio.alias(f"r{i}"),
            passed.alias(f"p{i}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{_check_name(c)}', '{c['column']}', n{i}, d{i}, r{i}, "
        f"CAST({c['threshold']!r} AS DOUBLE), p{i}"
        for i, c in enumerate(checks)
    )
    return wide.selectExpr(
        f"stack({len(checks)}, {stack_args}) AS "
        "(check, column_name, num, den, ratio, threshold, passed)"
    )


def check_foreign_key(
    df: DataFrame, column: str, ref: DataFrame, ref_column: str,
    threshold: float = 1.0,
) -> DataFrame:
    """Referential-integrity check in the same report shape as
    :func:`check_constraints`: fraction of non-null ``column`` values
    with a match in ``ref.ref_column``. The distinct reference keys
    join BROADCAST (dimension-sized by assumption); the fact side
    aggregates in the same pass as the join — one scan each side."""
    keys = ref.select(F.col(ref_column).alias("_fk")).dropDuplicates()
    joined = df.select(F.col(column)).where(F.col(column).isNotNull()).join(
        F.broadcast(keys), F.col(column) == F.col("_fk"), "left"
    )
    wide = joined.agg(
        F.count("_fk").alias("num"), F.count(F.lit(1)).alias("den")
    )
    ratio = F.when(F.col("den") == 0, F.lit(1.0)).otherwise(
        F.col("num").cast("double") / F.col("den").cast("double")
    )
    return wide.select(
        F.lit(f"foreign_key({column})").alias("check"),
        F.lit(column).alias("column_name"),
        "num",
        "den",
        ratio.alias("ratio"),
        F.lit(float(threshold)).alias("threshold"),
        (ratio >= F.lit(float(threshold))).alias("passed"),
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list,
    k: int,
    sensitive_col: str,
    l_diversity: int = 2,
) -> DataFrame:
    """k-anonymity / l-diversity audit over quasi-identifier columns.

    A row is re-identifiable when its quasi-identifier combination (the
    columns an adversary can link from outside data) is shared by fewer
    than ``k`` rows; a group is sensitive-value-poor when it holds fewer
    than ``l_diversity`` distinct values of ``sensitive_col`` (homogeneity
    attack: the adversary learns the sensitive value without pinpointing
    the row). This is the release-gate audit for training corpora built
    from user-linked records — run it before export, after
    :func:`~github_etl_pipeline_spark.operators.text.redact_pii` handles
    free text.

    ONE summary row — tier-robust (never vacuous, counts are counts):
      n_rows, n_groups, n_violating_groups (size < k), rows_at_risk
      (rows in violating groups), risk_fraction = rows_at_risk/n_rows
      (6dp), retained_fraction after suppressing violating groups,
      min/max_group_size, n_low_diversity_groups (< l_diversity distinct
      sensitive values), min_l_diversity.

    Scale shape: groupBy(quasi_cols) with count + count_distinct(sensitive)
    is ONE shuffle on the quasi-identifier (map-side partials; the
    count_distinct re-expands within the same agg), then a second tiny
    aggregate over one row per GROUP (already << corpus). Suppression /
    generalization itself stays with the caller: a semi-join of the
    violating keys (small by definition when risk is low) or a coarser
    quasi-identifier bucketing re-audited through this same report.
    """
    quasi = [F.col(c) if isinstance(c, str) else c for c in quasi_cols]
    groups = df.groupBy(*quasi).agg(
        F.count(F.lit(1)).alias("_n"),
        F.count_distinct(F.col(sensitive_col)).alias("_l"),
    )
    n_rows = F.sum("_n")
    at_risk = F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(F.lit(0)))
    return groups.agg(
        n_rows.alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.count_if(F.col("_n") < k).alias("n_violating_groups"),
        at_risk.alias("rows_at_risk"),
        F.round(at_risk.cast("double") / n_rows.cast("double"), 6).alias(
            "risk_fraction"
        ),
        F.round(
            (n_rows - at_risk).cast("double") / n_rows.cast("double"), 6
        ).alias("retained_fraction"),
        F.min("_n").alias("min_group_size"),
        F.max("_n").alias("max_group_size"),
        F.count_if(F.col("_l") < l_diversity).alias("n_low_diversity_groups"),
        F.min("_l").alias("min_l_diversity"),
    )
