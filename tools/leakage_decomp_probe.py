#!/usr/bin/env python
"""r14 decomposition probe for split_leakage_audit (VERDICT r13 #5):
times the audit's stages cumulatively at $SPARK_GRAFT_SF_DIR (noop
sink, caches swept, one session) and prints the runtime pair counts
that pick the closure mode:

  sig    : shingle base + 16-hash signature (production 4x4 config)
  cand   : + banding + distinct candidate pairs (with sizes)
  verify : + size prune + exact jaccard >= 0.2  (minhash_dedup_pairs)
  full   : the registered query (clusters + split labels + aggregate)
"""

from __future__ import annotations

import os
import sys
import time

import pandas as pd  # noqa: F401

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators import dedup as D
from github_etl_pipeline_spark.plans import REGISTRY
from github_etl_pipeline_spark.session import get_spark, managed_caches, sweep_caches
from github_etl_pipeline_spark.sources.tables import read_table


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.sf3")
    spark = get_spark(
        app_name="leakage_decomp",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    k, threshold = 2, 0.2

    def build(stage: str):
        docs = read_table(spark, sf_dir, "documents")
        base = docs.select(
            F.col("doc_id"),
            D.shingle_hashes("text", k).alias("_hs", metadata={"shingle_k": k}),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        sig = D.minhash_signature(base, "_hs", "doc_id", k, with_size=True)
        if stage == "sig":
            return sig
        cand = D.lsh_candidate_pairs(sig, "doc_id", 4)
        if stage == "cand":
            return cand
        return D.jaccard_pairs(base, "_hs", "doc_id", k, threshold, candidates=cand)

    with managed_caches(spark):
        spark.range(1_000_000).selectExpr("sum(id)").collect()

        @F.pandas_udf("double")
        def _wu(s: pd.Series) -> pd.Series:
            return s

        spark.range(1000).select(_wu(F.col("id").cast("double"))).collect()
        c_cand = build("cand").count()
        sweep_caches(spark)
        c_pairs = build("verify").count()
        sweep_caches(spark)
        print(f"candidates={c_cand}  surviving_pairs={c_pairs} "
              f"(driver union-find iff <= 1,000,000)", flush=True)
        for stage in ("sig", "cand", "verify"):
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                spark.sparkContext.setJobDescription(f"leak_decomp:{stage}")
                build(stage).write.mode("overwrite").format("noop").save()
                times.append(time.perf_counter() - t0)
                sweep_caches(spark)
            print(f"{stage}: min {min(times):.3f}s  all {[round(t,3) for t in times]}",
                  flush=True)
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription("leak_decomp:full")
            REGISTRY["split_leakage_audit_documents"].builder(
                spark, sf_dir
            ).write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
            sweep_caches(spark)
        print(f"full: min {min(times):.3f}s  all {[round(t,3) for t in times]}",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
