#!/usr/bin/env python
"""Regenerate QUERIES.md from the plan registry. Run from the repo
root: ``python tools/dump_queries.py``."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from github_etl_pipeline_spark.plans import REGISTRY  # noqa: E402

HEADER = """# Query inventory

Auto-generated from `github_etl_pipeline_spark/plans/` (the registry
behind `__spark_entry__.queries()` / `oracle_sql()`) by
`tools/dump_queries.py`. Every query is a `(spark, sf_dir) -> DataFrame`
builder; 'exact oracle' means the driver's order-insensitive value hash
matches DuckDB bit-for-bit.

| # | query | check | what it covers |
|---|---|---|---|
"""


def main() -> None:
    rows = []
    for i, (name, spec) in enumerate(REGISTRY.items(), 1):
        check = "exact oracle" if spec.oracle else "rows-only (non-SQL-expressible)"
        rows.append(f"| {i} | `{name}` | {check} | {spec.doc} |")
    out = HEADER + "\n".join(rows) + "\n"
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(path, "w") as f:
        f.write(out)
    print(f"wrote {path}: {len(rows)} queries")


if __name__ == "__main__":
    main()
