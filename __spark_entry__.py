"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``github_etl_pipeline_spark``; this module just
adapts the query registry (plans/registry.py) to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from github_etl_pipeline_spark.plans import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full pool-KPI engine
    (scan -> distribution agg -> normalized-key broadcast dim join -> RTP /
    hit-frequency / volatility / classification)."""
    return REGISTRY["pool_kpis_synth"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys with no SQL-expressible
    equivalent are omitted (driver then records a rows-only check)."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
