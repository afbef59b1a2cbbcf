#!/usr/bin/env python
"""r14 adjudication probe (VERDICT r13 #2a): same-session old-vs-new A/B
of the pol source_file path-strip — regexp_replace('^.*?'+marker) (r12
form) vs instr+substring (r13 form) — over the FULL reference-corpus
pool ETL, alternating A/B/A/B so a degrading window cannot favor either
side. Waits for idle before timing (the sandbox's documented
kernel-reclaim poison).

Usage: python tools/pol_ab_probe.py [reps_per_side]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from github_etl_pipeline_spark.session import get_spark, sweep_caches
from github_etl_pipeline_spark.sources import pol as pol_mod


def wait_idle(th: float = 1.5, limit: float = 600.0) -> None:
    t0 = time.monotonic()
    while time.monotonic() - t0 < limit and os.getloadavg()[0] > th:
        time.sleep(5)


def strip_regex(col, marker: str):
    return F.regexp_replace(col, "^.*?" + re.escape(marker), "")


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(
        app_name="pol_ab_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    dim = spark.createDataFrame(
        [("Pharaoh", "9493", "0201", 25.0), ("Pharaoh", "6371", "6371", 10.0)],
        "Game string, Game_id string, Pool_id string, Bet double",
    )
    from github_etl_pipeline_spark.pipeline import run_pipeline

    new_impl = pol_mod._strip_through_marker

    def one(tag: str, impl) -> float:
        pol_mod._strip_through_marker = impl
        try:
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"pol_ab:{tag}")
            pools, _ = run_pipeline(spark, "/root/reference", dim=dim)
            pools.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
        finally:
            pol_mod._strip_through_marker = new_impl
            sweep_caches(spark)
        return dt

    # warmup (not timed): one full pass so codegen/JIT state is shared
    one("warmup", new_impl)
    results: dict[str, list[float]] = {"old_regex": [], "new_substr": []}
    for _ in range(reps):
        wait_idle()
        results["old_regex"].append(one("old_regex", strip_regex))
        wait_idle()
        results["new_substr"].append(one("new_substr", new_impl))
    for k, v in results.items():
        print(f"{k}: min {min(v):.3f}s  all {[round(x, 3) for x in v]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
