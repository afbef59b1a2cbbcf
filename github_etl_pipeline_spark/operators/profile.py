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
    of ``df`` — one aggregate pass + zero-shuffle unpivot."""
    c = _canonical(df, raw)
    aggs = []
    for col in c.columns:
        aggs += [
            (F.count(F.lit(1)) - F.count(col)).alias(f"{col}__nulls"),
            F.count_distinct(F.col(col)).alias(f"{col}__distinct"),
            F.min(col).cast("string").alias(f"{col}__min"),
            F.max(col).cast("string").alias(f"{col}__max"),
        ]
    wide = c.agg(*aggs)
    stack_args = ", ".join(
        f"'{col}', `{col}__nulls`, `{col}__distinct`, `{col}__min`, `{col}__max`"
        for col in c.columns
    )
    return wide.selectExpr(
        f"stack({len(c.columns)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, min_s, max_s)"
    )
