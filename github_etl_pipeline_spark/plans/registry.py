"""Query registry: every operator from SURVEY §2 exposed as a named query
(spark, sf_dir) -> DataFrame with a matching DuckDB oracle SQL string.

Hash-stability rules (the driver compares order-insensitive value hashes
between the Spark result and the DuckDB oracle):
  * every computed column is aliased IDENTICALLY in both engines
  * sums over the 2dp double columns go through DECIMAL(18,2) casts in
    BOTH engines (exact, order-independent), then cast back to double
  * averages are sum_decimal/count divisions in double (IEEE-identical),
    never engine-native avg() over doubles (accumulation-order dependent)
  * squares are x*x, never pow(x,2) (libm vs JVM last-ulp differences)
  * no timestamps in output columns (timezone-representation risk);
    ordering BY timestamps is fine
  * arrays are emitted as sorted CSV strings
  * rounding is half-up (Spark F.round == DuckDB round for positives)
  * epoch conversions go through functions.epoch.event_micros (dtype-
    dispatching: unix_micros/timestampdiff for timestamp columns,
    integer `div 1000` for bigint nanos) — NEVER a hard-coded physical
    type (the driver's parquet types drift between rounds), and never
    F.floor(col / 1000): nanos (~1.7e18) exceed double's 53-bit exact
    range, so the double quotient can floor one micro off the oracle's
    exact epoch_us()
  * integer-typed SUMs in oracle SQL are wrapped CAST(... AS BIGINT)
    (DuckDB sums integers to HUGEINT -> float64 in pandas -> hash drift)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None -> non-SQL-expressible, rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, doc=doc)
        return fn

    return deco
