"""Key-normalization scalar expressions (reference F2, J1).

The reference joins pool ids against the lookup with a 3-stage fallback
(exact, leading-zeros-stripped, lookup-side zfill(4) — etl/transform.py:202-211).
All three collapse into ONE equi-join when both sides are normalized to
"strip leading zeros, then left-pad to 4": ``'0201' -> '0201'``,
``'201' -> '0201'``, ``'6371' -> '6371'``, ``'0' / '000' -> '0000'``.

Edge where the fallback and the normalized join could diverge: a dimension
containing two rows whose Pool_ids differ only in zero padding. The dim
loader asserts normalized-key consistency (sources/lookup.py) to surface
that case instead of silently picking one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_pool_id(col: Column | str, width: int = 4) -> Column:
    """Strip leading zeros then left-pad with zeros to ``width``.

    ``lstrip('0') or '0'`` semantics: an all-zeros id becomes '0' before
    padding (reference etl/transform.py:206).
    """
    col = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(col, r"^0+", "")
    base = F.coalesce(F.nullif(stripped, F.lit("")), F.lit("0"))
    # zfill semantics: pad when short, never truncate (lpad alone would)
    return F.when(F.length(base) >= width, base).otherwise(F.lpad(base, width, "0"))
