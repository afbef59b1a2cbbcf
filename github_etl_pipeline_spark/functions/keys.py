"""Key-normalization scalar expressions (reference F2, J1).

The reference joins pool ids against the lookup with a 3-stage fallback
(exact, leading-zeros-stripped, lookup-side zfill(4) — etl/transform.py:202-211).
All three collapse into ONE equi-join when both sides are normalized to
"strip leading zeros, then left-pad to 4": ``'0201' -> '0201'``,
``'201' -> '0201'``, ``'6371' -> '6371'``, ``'0' / '000' -> '0000'``.

Edges where the fallback and the plain normalized join diverge:

  * dim side: two dim rows whose Pool_ids differ only in zero padding.
    The dim loader asserts normalized-key consistency (sources/lookup.py)
    to surface that case instead of silently picking one.
  * fact side: the reference's stages are ASYMMETRIC — stage 2 compares
    the STRIPPED fact id against the RAW dim id, and stage 3 the zfilled
    dim id against the RAW fact id. So fact '00201' (extra zeros beyond
    width 4) or fact '201' against dim '0201' match NOTHING in the
    reference, while a both-sides normalized join would match. The exact
    reference acceptance set, given a normalized-key match, is
    ``reference_match_expr`` below; pool_kpis applies it as a post-join
    gate so the single broadcast equi-join keeps reference fidelity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_zeros(col: Column | str) -> Column:
    """``lstrip('0') or '0'``: an all-zeros id becomes '0'
    (reference etl/transform.py:206)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.nullif(F.regexp_replace(col, r"^0+", ""), F.lit("")), F.lit("0"))


def zfill(col: Column | str, width: int = 4) -> Column:
    """``str.zfill(width)``: pad when short, never truncate (lpad alone
    would truncate longer ids)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(col) >= width, col).otherwise(F.lpad(col, width, "0"))


def normalize_pool_id(col: Column | str, width: int = 4) -> Column:
    """Strip leading zeros then left-pad with zeros to ``width`` — the
    shared join key that makes all of the reference's fallback stages
    land in ONE equi-join bucket."""
    return zfill(strip_zeros(col), width)


def reference_match_expr(fact_id: Column | str, dim_raw_id: Column | str) -> Column:
    """True iff the reference's 3-stage fallback (etl/transform.py:202-211)
    would match this (fact, dim) pair:

      stage 1: dim_raw == fact_raw
      stage 2: dim_raw == lstrip0(fact_raw)
      stage 3: zfill4(dim_raw) == fact_raw

    Applied AFTER the normalized equi-join it restores exact reference
    semantics: normalized equality over-matches only on pairs where the
    dim id carries leading zeros and the fact spelling is neither the raw
    nor the zfilled dim spelling (e.g. fact '00201' or '201' vs dim
    '0201') — those must stay unmatched, as the reference leaves them."""
    f = F.col(fact_id) if isinstance(fact_id, str) else fact_id
    d = F.col(dim_raw_id) if isinstance(dim_raw_id, str) else dim_raw_id
    return (f == d) | (strip_zeros(f) == d) | (zfill(d) == f)
