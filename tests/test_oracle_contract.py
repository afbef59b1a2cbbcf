"""Self-check harness replicating the driver's correctness gate: run every
registered query on Spark AND its DuckDB oracle over the same parquet,
then compare row count, column names, and (order-insensitively) values.

Float columns are compared EXACTLY — the registry's hash-stability rules
(decimal-cast sums, manual averages, x*x squares) are designed to make
both engines produce bit-identical doubles; any drift should fail here,
not in the driver.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from github_etl_pipeline_spark.plans import REGISTRY
from github_etl_pipeline_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _normalize(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]

    def key(row):
        return tuple((v is None or (isinstance(v, float) and math.isnan(v)), str(v)) for v in row)

    return cols, sorted(rows, key=key)


def _values_equal(a, b):
    """String-level equality, mirroring the driver's value-hash: int vs
    float dtype drift (650 vs 650.0) must FAIL here even though the
    numeric values compare equal."""
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float) and math.isnan(a) and math.isnan(b):
        return True
    return str(a) == str(b)


@pytest.mark.parametrize("name", [n for n, s in REGISTRY.items() if s.oracle is not None])
def test_query_matches_oracle(name, spark, con):
    spec = REGISTRY[name]
    got = spec.builder(spark, SF_DIR).toPandas()
    exp = con.execute(spec.oracle).df()

    assert len(got) == len(exp), f"{name}: row count {len(got)} vs oracle {len(exp)}"
    gc, gr = _normalize(got)
    ec, er = _normalize(exp)
    assert gc == ec, f"{name}: columns {gc} vs oracle {ec}"
    mismatches = []
    for i, (r1, r2) in enumerate(zip(gr, er)):
        for c, (v1, v2) in zip(gc, zip(r1, r2)):
            if not _values_equal(v1, v2):
                mismatches.append((i, c, v1, v2))
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_registry_nonempty():
    assert len(REGISTRY) >= 10
