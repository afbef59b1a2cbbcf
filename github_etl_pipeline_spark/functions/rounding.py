"""Rounding helpers (reference F3).

The reference rounds with numpy/pandas/python ``round`` — banker's
rounding (half-to-even). Spark's ``F.round`` is HALF_UP; ``F.bround`` is
HALF_EVEN and is the parity-correct choice for golden comparison against
the reference's committed outputs (e.g. the per-term ``round(...,4)``
inside volatility, etl/transform.py:121).

For the DuckDB-oracle queries we instead use plain ``F.round`` paired
with DuckDB ``round`` (both half-away-from-zero for positives) so both
engines round identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bround2(col: Column) -> Column:
    return F.bround(col, 2)


def bround4(col: Column) -> Column:
    return F.bround(col, 4)
