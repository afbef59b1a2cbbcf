"""Pool classification expressions (reference F1, etl/transform.py:130-162;
spec confirmed by the design spreadsheet "config fields" sheet3 rows
tag / isFlat / max_multiplier).

Truth table:
  pool_type == '395'                      -> tag ['GAB','PFB']
  len > 4 and startswith '5'              -> tag ['PFB']
  otherwise                               -> tag ['REG']
  len > 4 and startswith '4'              -> is_flat = 1, max_multiplier = last 4 chars
  NULL or EMPTY pool_type                 -> tag ['UNKNOWN'], is_flat 0, mult NULL
    (the reference's check is FALSY (etl/transform.py:231), so '' — e.g. a
    file named 'Pool_0201_.pol' — classifies UNKNOWN exactly like None; the
    reference returns the bare string 'UNKNOWN' here — we normalize to a
    one-element array so the column type is stable; documented deviation)

Pure ``when/otherwise`` column expressions — fully codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tag_expr(pool_type: Column | str) -> Column:
    # falsy check: '' behaves like NULL (reference etl/transform.py:231)
    pt = F.nullif(_c(pool_type), F.lit(""))
    return (
        F.when(pt.isNull(), F.array(F.lit("UNKNOWN")))
        .when(pt == "395", F.array(F.lit("GAB"), F.lit("PFB")))
        .when((F.length(pt) > 4) & pt.startswith("5"), F.array(F.lit("PFB")))
        .otherwise(F.array(F.lit("REG")))
    )


def is_flat_expr(pool_type: Column | str) -> Column:
    pt = _c(pool_type)
    return F.when((F.length(pt) > 4) & pt.startswith("4"), F.lit(1)).otherwise(F.lit(0)).cast("int")


def max_multiplier_expr(pool_type: Column | str) -> Column:
    pt = _c(pool_type)
    return F.when(
        (F.length(pt) > 4) & pt.startswith("4"), F.substring(pt, -4, 4)
    ).otherwise(F.lit(None).cast("string"))
