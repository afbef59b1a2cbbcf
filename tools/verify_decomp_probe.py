#!/usr/bin/env python
"""r14 decomposition probe for the tuned-MinHash verify join: times the
pipeline's stages cumulatively at $SPARK_GRAFT_SF_DIR (noop sink, cache
swept between runs, one session):

  sig   : shingle base + 114-hash signature
  cand  : + 57-band banding + distinct candidate pairs (with sizes)
  prune : + size-ratio prefilter (count of surviving pairs)
  join1 : + attach sh_a (one corpus join)
  full  : + attach sh_b + intersect + threshold (the registered shape)

Also prints candidate counts so per-pair costs can be normalized.
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
from github_etl_pipeline_spark.plans.extensions import (
    _MH_TUNED,
    _docs,
    minhash_recall_seed_union,
)
from github_etl_pipeline_spark.session import get_spark, managed_caches, sweep_caches


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.sf3")
    spark = get_spark(
        app_name="verify_decomp",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    bands, num_hashes = _MH_TUNED["bands"], _MH_TUNED["num_hashes"]
    threshold, k = 0.2, 2

    def build(stage: str):
        docs = minhash_recall_seed_union(_docs(spark, sf_dir))
        base = docs.select(
            F.col("doc_id"),
            D.shingle_hashes("text", k).alias("_hs", metadata={"shingle_k": k}),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        sig = D.minhash_signature(base, "_hs", "doc_id", k, with_size=True,
                                  num_hashes=num_hashes)
        if stage == "sig":
            return sig
        cand = D.lsh_candidate_pairs(sig, "doc_id", bands)
        if stage == "cand":
            return cand
        pruned = cand.where(
            F.least("_na", "_nb") >= F.lit(threshold) * F.greatest("_na", "_nb")
        ).select("id_a", "id_b")
        if stage == "prune":
            return pruned
        a = base.select(F.col("doc_id").alias("id_a"), F.col("_hs").alias("sh_a"))
        j1 = pruned.join(a, "id_a")
        if stage == "join1":
            return j1
        b = base.select(F.col("doc_id").alias("id_b"), F.col("_hs").alias("sh_b"))
        j2 = j1.join(b, "id_b")
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
        return j2.where(jac >= threshold).select(
            "id_a", "id_b", F.round(jac, 6).alias("jaccard")
        )

    with managed_caches(spark):
        spark.range(1_000_000).selectExpr("sum(id)").collect()

        @F.pandas_udf("double")
        def _wu(s: pd.Series) -> pd.Series:
            return s

        spark.range(1000).select(_wu(F.col("id").cast("double"))).collect()
        # counts once (not timed against stages)
        c_cand = build("cand").count()
        sweep_caches(spark)
        c_prune = build("prune").count()
        sweep_caches(spark)
        print(f"candidates={c_cand}  after_size_prune={c_prune}", flush=True)
        for stage in ("sig", "cand", "prune", "join1", "full"):
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                spark.sparkContext.setJobDescription(f"decomp:{stage}")
                build(stage).write.mode("overwrite").format("noop").save()
                times.append(time.perf_counter() - t0)
                sweep_caches(spark)
            print(f"{stage}: min {min(times):.3f}s  all {[round(t,3) for t in times]}",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
