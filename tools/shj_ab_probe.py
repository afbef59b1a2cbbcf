#!/usr/bin/env python
"""r14 same-session A/B for the shuffled-hash-join session config
(session.py: preferSortMergeJoin=false + AQE local-map threshold):
both are runtime-settable SQL confs, so ONE session alternates
  old: preferSortMergeJoin=true,  maxShuffledHashJoinLocalMapThreshold=0
  new: preferSortMergeJoin=false, maxShuffledHashJoinLocalMapThreshold=64m
around noop-sink executions of the named registry queries (caches swept
between reps, bench warmups). Join strategy cannot change a query's
rows; ``--compare`` additionally exact-compares the two outputs at the
probe SF to prove it on the spot.

Usage:
  SPARK_GRAFT_SF_DIR=.sf3 python tools/shj_ab_probe.py Q [Q...]
  SPARK_GRAFT_OPT_REPS=2 ... [--compare]
"""

from __future__ import annotations

import os
import sys
import time

import pandas as pd  # noqa: F401  (pandas_udf warmup type hints)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from github_etl_pipeline_spark.plans import REGISTRY
from github_etl_pipeline_spark.session import get_spark, managed_caches, sweep_caches

OLD_CONF = {
    "spark.sql.join.preferSortMergeJoin": "true",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0",
}
NEW_CONF = {
    "spark.sql.join.preferSortMergeJoin": "false",
    # AQE SMJ->SHJ rewrite stays OFF in the shipped config (see
    # session.py: it cost tpch_q18 a reproducible ~10% at 30x)
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0",
}


def wait_idle(th: float = 2.0, limit: float = 420.0) -> None:
    t0 = time.monotonic()
    while time.monotonic() - t0 < limit and os.getloadavg()[0] > th:
        time.sleep(5)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_OPT_REPS", "2"))
    args = list(sys.argv[1:])
    do_compare = "--compare" in args
    names = [a for a in args if not a.startswith("--")]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(
        app_name="shj_ab_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def set_conf(conf):
        for k, v in conf.items():
            spark.conf.set(k, v)

    with managed_caches(spark):
        spark.range(1_000_000).selectExpr("sum(id)").collect()

        @F.pandas_udf("double")
        def _wu(s: pd.Series) -> pd.Series:
            return s

        spark.range(1000).select(_wu(F.col("id").cast("double"))).collect()

        def run(name, conf):
            set_conf(conf)
            try:
                t0 = time.perf_counter()
                spark.sparkContext.setJobDescription(f"shj_ab:{name}")
                REGISTRY[name].builder(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                return time.perf_counter() - t0
            finally:
                set_conf(NEW_CONF)
                sweep_caches(spark)

        def collect_sorted(name, conf):
            set_conf(conf)
            try:
                pdf = REGISTRY[name].builder(spark, sf_dir).toPandas()
                return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
            finally:
                set_conf(NEW_CONF)
                sweep_caches(spark)

        for name in names:
            if do_compare:
                o = collect_sorted(name, OLD_CONF)
                n = collect_sorted(name, NEW_CONF)
                same = o.shape == n.shape and o.equals(n)
                print(
                    f"{name}: COMPARE {'EXACT-MATCH' if same else 'MISMATCH'} "
                    f"old{o.shape} new{n.shape}",
                    flush=True,
                )
                if not same:
                    continue
            run(name, OLD_CONF)
            run(name, NEW_CONF)
            olds, news = [], []
            for _ in range(reps):
                wait_idle()
                olds.append(run(name, OLD_CONF))
                news.append(run(name, NEW_CONF))
            print(
                f"{name}: old min {min(olds):.3f}s {[round(x,3) for x in olds]}  "
                f"new min {min(news):.3f}s {[round(x,3) for x in news]}  "
                f"speedup {min(olds)/min(news):.2f}x",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
