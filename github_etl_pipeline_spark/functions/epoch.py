"""Dtype-robust event-time epoch conversion.

The driver regenerates ``/root/testdata`` between rounds and the physical
parquet type of ``events.ts`` has changed across regenerations:
TIMESTAMP(NANOS) (read as BIGINT nanos under
``spark.sql.legacy.parquet.nanosAsLong``) in round 1-2 testdata,
``timestamp[us]`` (read as TIMESTAMP_NTZ) since. Hard-coding either
representation breaks the moment the driver flips it — round 2 lost 11
queries to an AnalysisException on ``ts div 1000`` against TIMESTAMP_NTZ.

``event_micros`` dispatches on the *resolved* Spark dtype and always
returns BIGINT microseconds since the epoch, the representation every
time-math plan in this repo (sessionize, as-of, range join, hypertable
rollup, gap fill, funnel, cohort, interval overlap, streaming windows)
is written against. Integer micros are also what DuckDB's ``epoch_us(ts)``
yields for both physical types, so the oracle SQL needs no per-type
branches.

Timezone robustness: the NTZ branch measures ``timestampdiff`` from a
TIMESTAMP_NTZ epoch literal — a naive-to-naive difference that never
consults ``spark.sql.session.timeZone`` — so a driver tz change cannot
shift epochs (DuckDB likewise treats naive parquet timestamps as-is).
The TIMESTAMP (LTZ) branch uses ``unix_micros``, which is an
instant-to-instant conversion and equally tz-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def bucket_div_sql(expr: str, divisor: int) -> str:
    """SQL fragment for the integer bucketing division used across every
    time-bucket / decile plan, PINNED to the oracle's semantics.

    Both engines truncate toward zero on integer division: Spark's
    ``div`` by definition, and DuckDB's integer ``//`` as measured on the
    baked-in DuckDB 1.0.0 (``-101 // 10 = -10``, ``-5 // 10 = 0`` — NOT
    Python's floor). So ``expr div N`` on the Spark side and
    ``expr // N`` in oracle SQL agree for ALL operands, negative
    included (pre-epoch timestamps, negative keys). That cross-engine
    agreement is a load-bearing contract, not a coincidence —
    tests/test_floor_div.py re-measures DuckDB on every run and fails
    loudly if a DuckDB upgrade ever changes ``//`` to floor semantics.
    Pure integer arithmetic, stays inside whole-stage codegen.
    """
    if divisor <= 0:
        raise ValueError(f"bucket_div_sql: divisor must be positive, got {divisor}")
    return f"(({expr}) div {divisor})"


def event_micros(df: DataFrame, col: str = "ts") -> Column:
    """BIGINT microseconds-since-epoch for an event-time column, whatever
    its physical type.

    * TIMESTAMP_NTZ  -> naive micros via ``timestampdiff`` from the NTZ
      epoch (session-tz independent; matches DuckDB ``epoch_us``).
    * TIMESTAMP      -> ``unix_micros`` (an instant; tz-independent).
    * BIGINT/INT     -> assumed integer NANOS since epoch (the
      ``nanosAsLong`` legacy read) -> integral ``div 1000``. Integral
      DIV, not double division: ``/1000`` as a double rounds half-up at
      ~1.7e15 magnitude while DuckDB's nanos->micros read truncates.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, T.TimestampNTZType):
        return F.expr(f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, `{col}`)")
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(F.col(col))
    if isinstance(dt, (T.LongType, T.IntegerType)):
        return F.expr(f"`{col}` div 1000")
    raise TypeError(
        f"event_micros: column {col!r} has unsupported dtype {dt.simpleString()} "
        "(expected timestamp, timestamp_ntz, or integral nanos)"
    )


def event_time(df: DataFrame, col: str = "ts") -> Column:
    """Event time as a proper TIMESTAMP column (for ``window()`` /
    ``withWatermark`` semantics), derived from :func:`event_micros` so the
    instant is identical across physical source types."""
    return F.timestamp_micros(event_micros(df, col))
