"""Z-order (Morton) interleaved sort keys for multi-dimensional data
skipping.

Sorting a table by one column gives parquet min/max row-group pruning on
that column only; interleaving the bits of several normalized columns
gives locality on ALL of them at once, so point/range filters on any
participating column skip most row groups (the standard Delta/Iceberg
OPTIMIZE ZORDER technique, here as a plain expression usable with any
sorted parquet write, e.g. sinks/compact.py).

The key is built from pure integer shift/and/or arithmetic, generated as
a SQL string so the IDENTICAL expression runs on Spark (F.expr) and
DuckDB (oracle) — no UDF, whole-stage-codegen friendly, O(bits) ops/row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """SQL expression interleaving the low ``bits`` bits of each (already
    bucketized, non-negative integer) column in ``cols``. Bit b of column
    i lands at output position ``b * len(cols) + i`` — the classic Morton
    layout. len(cols) * bits must fit a BIGINT (<= 62)."""
    n = len(cols)
    if not cols:
        raise ValueError("zorder_sql: need at least one column")
    if n * bits > 62:
        raise ValueError(f"zorder_sql: {n} cols x {bits} bits exceeds BIGINT")
    terms = [
        f"((({c} >> {b}) & 1) << {b * n + i})"
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return " + ".join(terms)


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Z-order key column over ``cols``, each first clamped into
    [0, 2^bits) by ranking-free min/max-independent bucketing: the caller
    is expected to pass already-bucketized integer columns (e.g.
    ``F.expr("value_bucket")``); this just interleaves."""
    return F.expr(zorder_sql(cols, bits))
