"""Registry-wide hardening gates, born from the round-2 regression where a
driver testdata regeneration flipped ``events.ts`` from BIGINT nanos to
TIMESTAMP_NTZ and 11 queries raised AnalysisException at the first driver
sample:

* **schema smoke** — every registered builder must ANALYZE (resolve its
  plan / produce a schema) against every on-disk sf dir. Pure analysis, no
  job execution, so the whole registry checks in seconds; any future
  physical-type drift in the testdata fails here first.
* **no bare integer SUM in oracle SQL** — DuckDB sums integers to HUGEINT,
  which pandas renders as float64 ("453.0"), while Spark's BIGINT sum
  renders "453" — a string-level value-hash mismatch even when values are
  identical (the round-2 tpch_q12 failure). Every integer SUM emitted as
  an output column must be wrapped CAST(... AS BIGINT).
* **epoch math never hard-codes the physical type** — no `ts div 1000` /
  F.floor(ts/1000) on the raw column outside functions/epoch.py.
"""

from __future__ import annotations

import os
import re

import pytest

from github_etl_pipeline_spark.plans import REGISTRY  # import populates REGISTRY

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_schema_smoke_all_sf_dirs(spark, name):
    """Analysis-only: builder(spark, sf_dir).schema must resolve for every
    scale factor on disk. Catches dtype drift (the round-2 class of
    breakage: AnalysisException on a changed parquet physical type) at
    pytest speed, without executing a single job."""
    spec = REGISTRY[name]
    for sf_dir in SF_DIRS:
        schema = spec.builder(spark, sf_dir).schema
        assert schema.fields, f"{name} @ {sf_dir}: empty schema"


def _depth_at(sql: str, pos: int) -> int:
    d = 0
    for ch in sql[:pos]:
        if ch == "(":
            d += 1
        elif ch == ")":
            d -= 1
    return d


def _final_select_pos(sql: str) -> int:
    """Position of the last SELECT at paren depth 0 — the outermost
    statement whose select list becomes the hashed output columns."""
    last = 0
    for m in re.finditer(r"\bSELECT\b", sql, re.I):
        if _depth_at(sql, m.start()) == 0:
            last = m.start()
    return last


def _sum_sites(sql: str):
    """Yield (arg, following_text, wrapped_in_cast, in_output_list) for
    each SUM( in sql. in_output_list = the SUM sits at paren depth 0 in
    the final top-level SELECT, i.e. its result dtype reaches the driver's
    value hash directly (CTE/subquery SUMs take their effective type from
    whatever consumes them)."""
    final_sel = _final_select_pos(sql)
    for m in re.finditer(r"SUM\s*\(", sql, re.I):
        depth, i = 1, m.end()
        while depth and i < len(sql):
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        arg = sql[m.end() : i - 1]
        before = sql[: m.start()].rstrip()
        wrapped = bool(re.search(r"CAST\s*\($", before, re.I))
        in_output = m.start() > final_sel and _depth_at(sql, m.start()) == 0
        yield arg, sql[i : i + 40], wrapped, in_output


def test_no_bare_integer_sum_output_in_oracle_sql():
    """Any SUM over an integer expression that is emitted directly as an
    output column (``SUM(...) AS name``) must be CAST(... AS BIGINT):
    DuckDB's HUGEINT -> pandas float64 rendering breaks the driver's
    string-level value hash against Spark's BIGINT (round-2 tpch_q12).
    SUMs that feed further arithmetic (ratios, comparisons, window
    denominators) take their type from the consumer and are exempt."""
    offenders = []
    for name, spec in REGISTRY.items():
        if not spec.oracle:
            continue
        for arg, after, wrapped, in_output in _sum_sites(spec.oracle):
            up = arg.upper()
            if "DECIMAL" in up or "DOUBLE" in up or "FLOAT" in up:
                continue  # decimal/double sums agree across engines
            if wrapped or not in_output:
                continue
            if re.match(r"\s*AS\s+\w+", after, re.I):
                offenders.append(f"{name}: SUM({arg.strip()[:60]}...) {after[:20]!r}")
    assert not offenders, (
        "bare integer SUM emitted as an output column in oracle SQL "
        "(wrap in CAST(... AS BIGINT)):\n" + "\n".join(offenders)
    )


def test_no_hardcoded_epoch_div_outside_epoch_module():
    """All event-time epoch conversions go through functions/epoch.py
    (dtype-dispatching); a raw `ts div 1000` hard-codes BIGINT nanos and
    breaks the moment the driver regenerates the testdata with a
    timestamp physical type."""
    root = os.path.join(os.path.dirname(__file__), "..", "github_etl_pipeline_spark")
    offenders = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".py") or fn == "epoch.py":
                continue
            path = os.path.join(dirpath, fn)
            with open(path) as fh:
                for lineno, line in enumerate(fh, 1):
                    if re.search(r"\bts\s+div\s+1000\b", line, re.I) and not line.lstrip().startswith("#"):
                        offenders.append(f"{os.path.relpath(path, root)}:{lineno}: {line.strip()}")
    assert not offenders, "hard-coded nanos epoch math:\n" + "\n".join(offenders)


def test_driver_sample_priority_is_a_valid_prefix():
    """Every DRIVER_SAMPLE_PRIORITY name must exist in the registry (a
    typo would silently drop a query from the driver's sampled prefix)
    and the registry must actually lead with the priority list in order;
    the IVF build must precede the served search (bench runs in registry
    order and the served query reuses the just-built index)."""
    from github_etl_pipeline_spark.plans import DRIVER_SAMPLE_PRIORITY, REGISTRY

    assert [n for n in DRIVER_SAMPLE_PRIORITY if n not in REGISTRY] == []
    names = list(REGISTRY)
    assert names[: len(DRIVER_SAMPLE_PRIORITY)] == DRIVER_SAMPLE_PRIORITY
    assert names.index("ivf_index_build") < names.index("ann_topk_ivf_served")
