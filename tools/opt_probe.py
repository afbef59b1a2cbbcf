#!/usr/bin/env python
"""r13 optimization probe: isolate named registry queries at
$SPARK_GRAFT_SF_DIR (default sf0.1), time min-of-$REPS noop-sink
executions with caches swept between reps (bench discipline), and
optionally dump explain("formatted") to a file.

Usage:
  python tools/opt_probe.py QUERY [QUERY ...]
  SPARK_GRAFT_OPT_REPS=3 python tools/opt_probe.py QUERY
  SPARK_GRAFT_OPT_PLAN_DIR=plans/r13 python tools/opt_probe.py QUERY  # writes <dir>/<query>.txt
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

import pandas as pd  # noqa: F401  (pandas_udf warmup type hints)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from github_etl_pipeline_spark.plans import REGISTRY
from github_etl_pipeline_spark.session import get_spark, managed_caches, sweep_caches


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_OPT_REPS", "3"))
    plan_dir = os.environ.get("SPARK_GRAFT_OPT_PLAN_DIR")
    plan_suffix = os.environ.get("SPARK_GRAFT_OPT_PLAN_SUFFIX", "")
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="opt_probe")
    spark.sparkContext.setLogLevel("ERROR")
    with managed_caches(spark):
        # same warmup set as bench.py
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        spark.read.parquet(f"{sf_dir}/region.parquet").groupBy("r_name").count().collect()
        from pyspark.sql import functions as _F

        @_F.pandas_udf("double")
        def _wu(s: pd.Series) -> pd.Series:
            return s

        spark.range(1000).select(_wu(_F.col("id").cast("double"))).collect()
        first = next(iter(REGISTRY.values()))
        first.builder(spark, sf_dir).write.mode("overwrite").format("noop").save()
        sweep_caches(spark)

        for name in names:
            spec = REGISTRY[name]
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                spark.sparkContext.setJobDescription(f"opt_probe:{name}")
                spec.builder(spark, sf_dir).write.mode("overwrite").format("noop").save()
                times.append(time.perf_counter() - t0)
                sweep_caches(spark)
            print(f"{name}: min {min(times):.3f}s  all {[round(t, 3) for t in times]}")
            if plan_dir:
                os.makedirs(plan_dir, exist_ok=True)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    spec.builder(spark, sf_dir).explain("formatted")
                with open(os.path.join(plan_dir, f"{name}{plan_suffix}.txt"), "w") as fh:
                    fh.write(buf.getvalue())
                sweep_caches(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
