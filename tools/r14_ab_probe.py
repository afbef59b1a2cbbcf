#!/usr/bin/env python
"""r14 same-session old-vs-new A/B probe: monkeypatches the r13 (old)
implementations of the operators this round rewrites and alternates
old/new noop-sink executions of the named registry queries in ONE Spark
session (the only timing methodology this sandbox's reclaim daemons
don't poison — see OPTIMIZATION_r13.md). Also exact-compares old-vs-new
OUTPUT rows (sorted, bit-level via parquet-free pandas compare) at the
probe SF before timing, so a semantics drift fails loudly here.

Old forms carried: lsh_candidate_pairs (md5 band keys),
semdedup (cells self-join + expression cosine + distinct),
pq_reconstruction_error (element_at codeword + per-subspace fold).

Usage:
  SPARK_GRAFT_SF_DIR=.sf3 python tools/r14_ab_probe.py [--compare-sf DIR] Q [Q...]
  SPARK_GRAFT_OPT_REPS=2 ... --no-compare  (timing only)
"""

from __future__ import annotations

import os
import sys
import time

import pandas as pd  # noqa: F401  (pandas_udf warmup type hints)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators import dedup as D
from github_etl_pipeline_spark.operators import pq as PQ
from github_etl_pipeline_spark.operators import similarity as S
from github_etl_pipeline_spark.plans import REGISTRY
from github_etl_pipeline_spark.session import get_spark, managed_caches, sweep_caches


# --------------------------------------------------------------------------
# r13 (old) implementations, verbatim
# --------------------------------------------------------------------------
def old_lsh_candidate_pairs(sig, id_col="doc_id", bands=4):
    n_sigs = sum(1 for c in sig.columns if c.startswith("sig_"))
    rows_per_band = D._validate_banding(n_sigs, bands)
    with_sizes = "_n" in sig.columns
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws(",", *cols)).alias("bh"))
        )
    key = (
        F.struct(F.col(id_col).alias("_pid"), F.col("_n").alias("_pn"))
        if with_sizes
        else F.col(id_col)
    )
    exploded = sig.select(key.alias("_key"), F.explode(F.array(*band_cols)).alias("bk")).select(
        "_key", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
    )
    grouped = exploded.groupBy("band", "bh").agg(
        F.sort_array(F.collect_list("_key")).alias("ids")
    )
    expanded = (
        grouped.where(F.size("ids") > 1)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ids",
                        lambda a, i: F.transform(
                            F.slice("ids", i + 2, F.size("ids")),
                            lambda b: F.struct(a.alias("a"), b.alias("b")),
                        ),
                    )
                )
            ).alias("p")
        )
    )
    if with_sizes:
        return expanded.select(
            F.col("p.a._pid").alias("id_a"),
            F.col("p.b._pid").alias("id_b"),
            F.col("p.a._pn").alias("_na"),
            F.col("p.b._pn").alias("_nb"),
        ).distinct()
    return expanded.select(
        F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b")
    ).distinct()


def old_semdedup(emb, threshold=0.45, n_centroids=None, lloyd_iterations=2,
                 id_col="vec_id", vec_col="embedding"):
    n = emb.count()
    if n_centroids is None:
        n_centroids = S.cells_for_corpus(n)
    spark = emb.sparkSession
    parallelism = spark.sparkContext.defaultParallelism
    if n >= S._FAN_OUT_ROWS and emb.rdd.getNumPartitions() < parallelism:
        emb = emb.repartition(parallelism)
    emb = emb.persist()
    centroids = S._sample_centroids(emb, id_col, vec_col, n_centroids)
    if lloyd_iterations > 0:
        centroids = S._lloyd_refine(emb, vec_col, centroids, lloyd_iterations)
    cells = S._assign_cells(emb, centroids, id_col, vec_col).persist()
    a = cells.select(F.col("cell"), F.col(id_col).alias("_ida"),
                     F.col(vec_col).alias("_va"), F.col("_ne").alias("_na"))
    b = cells.select(F.col("cell"), F.col(id_col).alias("_idb"),
                     F.col(vec_col).alias("_vb"), F.col("_ne").alias("_nb"))
    removed = (
        a.join(b, "cell")
        .where(F.col("_ida") < F.col("_idb"))
        .where(
            F.round(
                S.dot_expr(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 9
            )
            >= F.lit(float(threshold))
        )
        .select(F.col("_idb").alias(id_col))
        .distinct()
    )
    return cells.join(
        removed.withColumn("_dup", F.lit(1)), id_col, "left"
    ).select(
        F.col(id_col), F.col("cell"),
        F.coalesce(F.col("_dup"), F.lit(0)).cast("long").alias("is_dup"),
    )


def old_pq_reconstruction_error(emb, books, id_col="vec_id", vec_col="embedding"):
    dd = len(books[0][0])
    codes = PQ._encode_udf(books)
    t = emb.select(F.col(id_col), F.col(vec_col), codes(F.col(vec_col)).alias("codes"))
    err = None
    for ms, book in enumerate(books):
        cw = F.element_at(
            F.array(*[F.array(*[F.lit(float(x)) for x in cv]) for cv in book]),
            F.element_at(F.col("codes"), ms + 1) + F.lit(1),
        )
        s = F.slice(F.col(vec_col), ms * dd + 1, dd)
        term = F.round(
            S.dot_expr(s, s) + S.dot_expr(cw, cw) - F.lit(2.0) * S.dot_expr(s, cw), 9
        )
        err = term if err is None else err + term
    return t.select(F.col(id_col), F.round(err, 9).alias("err2"))


OLD = {
    "lsh_candidate_pairs": old_lsh_candidate_pairs,
    "semdedup": old_semdedup,
    "pq_reconstruction_error": old_pq_reconstruction_error,
}
NEW = {
    "lsh_candidate_pairs": D.lsh_candidate_pairs,
    "semdedup": S.semdedup,
    "pq_reconstruction_error": PQ.pq_reconstruction_error,
}


def _patch(which: dict) -> None:
    D.lsh_candidate_pairs = which["lsh_candidate_pairs"]
    S.semdedup = which["semdedup"]
    PQ.pq_reconstruction_error = which["pq_reconstruction_error"]
    # re-point the registry modules' captured references
    import github_etl_pipeline_spark.plans.extensions as ext

    if hasattr(ext, "S"):
        ext.S.semdedup = which["semdedup"]


def wait_idle(th: float = 2.0, limit: float = 420.0) -> None:
    t0 = time.monotonic()
    while time.monotonic() - t0 < limit and os.getloadavg()[0] > th:
        time.sleep(5)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_OPT_REPS", "2"))
    args = [a for a in sys.argv[1:]]
    compare_sf = "/root/testdata/sf0.1"
    if "--compare-sf" in args:
        i = args.index("--compare-sf")
        compare_sf = args[i + 1]
        del args[i : i + 2]
    do_compare = "--no-compare" not in args
    args = [a for a in args if not a.startswith("--")]
    names = args
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(
        app_name="r14_ab_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    with managed_caches(spark):
        # warmups (bench discipline)
        spark.range(1_000_000).selectExpr("sum(id)").collect()

        @F.pandas_udf("double")
        def _wu(s: pd.Series) -> pd.Series:
            return s

        spark.range(1000).select(_wu(F.col("id").cast("double"))).collect()

        def run(name, which, data_dir):
            _patch(which)
            try:
                spec = REGISTRY[name]
                t0 = time.perf_counter()
                spark.sparkContext.setJobDescription(f"ab:{name}")
                spec.builder(spark, data_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                return time.perf_counter() - t0
            finally:
                _patch(NEW)
                sweep_caches(spark)

        def collect_sorted(name, which, data_dir):
            _patch(which)
            try:
                df = REGISTRY[name].builder(spark, data_dir)
                pdf = df.toPandas()
                out = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
                return out
            finally:
                _patch(NEW)
                sweep_caches(spark)

        for name in names:
            if do_compare:
                o = collect_sorted(name, OLD, compare_sf)
                n = collect_sorted(name, NEW, compare_sf)
                same = o.shape == n.shape and o.equals(n)
                print(f"{name}: COMPARE {'EXACT-MATCH' if same else 'MISMATCH'} "
                      f"old{o.shape} new{n.shape}", flush=True)
                if not same:
                    continue
            # warm both forms once (JIT parity), then alternate timed reps
            run(name, OLD, sf_dir)
            run(name, NEW, sf_dir)
            olds, news = [], []
            for _ in range(reps):
                wait_idle()
                olds.append(run(name, OLD, sf_dir))
                news.append(run(name, NEW, sf_dir))
            print(
                f"{name}: old min {min(olds):.3f}s {[round(x,3) for x in olds]}  "
                f"new min {min(news):.3f}s {[round(x,3) for x in news]}  "
                f"speedup {min(olds)/min(news):.2f}x",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
