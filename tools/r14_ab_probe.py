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
from github_etl_pipeline_spark.operators import curation as CUR
from github_etl_pipeline_spark.operators import sketches as SK
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


def old_embedding_dup_pairs_lsh(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    n_planes: int = 64,
    bands: int = 8,
    dim: int = 64,
    target_bucket: int | None = None,
    recall_target: float | None = None,
    recall_cos: float | None = None,
) -> DataFrame:
    """LSH-banded embedding pair mining: band both sides on random-
    hyperplane sign buckets, self-join on (band, bucket), exact cosine
    verify on candidates only — the banded-scale sibling of
    ``embedding_dup_pairs`` (VERDICT r1 item 2).

    Candidate generation shuffles ONLY (band, bucket, id) tuples; the
    vectors are joined back for the exact verify on the deduped candidate
    pairs (broadcast when the corpus is small, co-partitioned otherwise).

    SCALE LAW (VERDICT r9 #4 / r10 probe): FIXED-depth sign buckets are
    quadratic with a small constant — random pairs collide with prob
    2^-rows per band, so candidates ~ bands * C(n,2) / 2^rows, which at
    the 100x tier (200k vectors, 8-bit buckets) is ~6e8 pairs each
    dragging two full vectors through the verify Exchange (measured:
    >78 GB spill, disk exhaustion). Pass ``target_bucket`` to make the
    depth ADAPTIVE: bucket on the first B = ceil(log2(n/target)) sign
    bits (clamped to rows), which pins expected bucket multiplicity —
    and therefore candidates per row — CONSTANT as the corpus scales.
    The tradeoff is recall at fixed cosine decaying with depth
    (per band p_match = (1 - theta/pi)^B); EXACT duplicates (cos ~ 1,
    the dedup target) are depth-invariant and always survive. For
    high-recall near-dup mining at fleet scale, pass ``recall_target``
    (VERDICT r11 #5): the miner then derives bands/planes/depth from
    ``bands_for_recall(n, recall_target, cos_threshold=recall_cos or
    threshold, ...)`` itself — band count grows with corpus size (the
    LSH n^rho law) while the depth stays adaptive, holding recall at
    the target cosine >= the target at every tier (measured 0.88-1.00
    vs the fixed config's 0.89 -> 0.33 decay; the registered
    ``embedding_lsh_recall_tuned`` query pins the driver-tier config).
    ``recall_cos`` defaults to ``threshold``; set it separately when
    the verify threshold sits below the similarity regime you need
    recalled (the tuned query targets cos=0.85 seeds while verifying
    at 0.45). Explicit n_planes/bands are ignored when recall_target
    is set; ``target_bucket`` keeps its meaning (defaults to 8 there,
    since adaptive depth is what makes growing bands affordable).
    When the solved band count hits ``bands_for_recall``'s max_bands
    cap the realized recall is LOWER than requested — the helper warns
    at solve time (ADVICE r12 #3), so a capped target is loud, not
    silent; pass a larger max ceiling through bands_for_recall directly
    if the priced signing cost is acceptable.

    MEASURED recall vs depth (r11; cos=0.85 seeded rotations, the
    registered ``embedding_lsh_recall_floor`` construction; prod =
    8 fixed bands, tuned = ``bands_for_recall(n, 0.95)``; candidates
    vs the linear bound L*n*target — SCALING.md regenerates this):

        tier    n        depth  prod    tuned(bands)  tuned cands/bound
        sf0.01  518      7      0.889   1.000 (11)    12.5k / 45.6k
        sf0.1   2,069    9      0.754   0.928 (16)    80.5k / 265k
        sf1     20,689   12     0.557   0.910 (30)    2.31M / 4.97M
        sf3     62,069   13     0.428   0.881 (36)    13.6M / 17.9M
        sf10    206,896  15     0.334   0.884 (54)    65.7M / 89.4M

    Recall/pruning at fixed depth (target_bucket=None) keep the
    original tuning: 8 rows x 8 bands -> per-pair candidate prob ~0.93
    at cos 0.9 — right for MODERATE corpora in the near-dup regime. At
    thresholds close to random (~0.45) sign-LSH cannot separate —
    recall is regime-limited regardless of depth; the registered
    queries seed exact dups so the checked signal is depth-invariant.
    Output (id_a, id_b).

    Cache contract (ADVICE r8): the band-key relation stays persisted
    in the returned plan (see ``jaccard_pairs``) — sweep with
    ``session.sweep_caches(spark)`` in long-lived sessions, always
    before re-running over a rewritten input table."""
    from github_etl_pipeline_spark.operators.similarity import (
        _hyperplanes,
        dot_expr,
        lsh_band_keys,
        norm_expr,
    )

    n_rows_hint: int | None = None
    if recall_target is not None:
        n_rows_hint = emb.count()
        kw = D.bands_for_recall(
            n_rows_hint,
            target_recall=recall_target,
            cos_threshold=recall_cos if recall_cos is not None else threshold,
            target_bucket=target_bucket if target_bucket is not None else 8,
        )
        bands, n_planes, target_bucket = kw["bands"], kw["n_planes"], kw["target_bucket"]
    rows = n_planes // bands
    planes = _hyperplanes(dim, n_planes)
    # persisted before the self-join: both sides re-project the band
    # keys under different aliases, so without the cache the 64-dot
    # hyperplane signing runs once PER SIDE. (band, bh, id) tuples only.
    from pyspark import StorageLevel

    keyed = lsh_band_keys(emb, vec_col, id_col, planes, bands, rows)
    if target_bucket is not None:
        # one bounded count job (column-pruned scan; reused from the
        # recall_target path when that already counted); the resulting
        # depth is a plan literal, identical to the oracle's scalar-
        # subquery B
        n_rows = n_rows_hint if n_rows_hint is not None else emb.count()
        depth = D.adaptive_lsh_depth(n_rows, target_bucket, rows)
        if depth < rows:
            keyed = keyed.select(
                F.col(id_col), "band", F.substring("bh", 1, depth).alias("bh")
            )
    keyed = keyed.persist(StorageLevel.MEMORY_AND_DISK)
    a = keyed.select("band", "bh", F.col(id_col).alias("id_a"))
    b = keyed.select("band", "bh", F.col(id_col).alias("id_b"))
    cand = (
        a.join(b, ["band", "bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # norms once per VECTOR (in the per-side projections), not per
    # candidate pair — bit-identical values, half the verify-stage work.
    # coalesce blocks the inferred isnotnull(norm) constraint from
    # pushing the whole norm aggregate into the scan stage (it folds to
    # TRUE instead): measured as the norm evaluating TWICE per row
    va = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        F.coalesce(norm_expr(F.col(vec_col)), F.lit(0.0)).alias("_na"),
    )
    vb = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        F.coalesce(norm_expr(F.col(vec_col)), F.lit(0.0)).alias("_nb"),
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .where(dot_expr(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb")) >= threshold)
        .select("id_a", "id_b")
    )

def old_write_centroids(path, centroids):
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(int(c), [float(x) for x in v]) for c, v in centroids], 1
        ),
        "centroid_id int, centroid array<double>",
    ).write.mode("overwrite").parquet(str(path))


def old_read_centroids(path):
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    return sorted(
        (int(r["centroid_id"]), [float(x) for x in r["centroid"]])
        for r in spark.read.parquet(str(path)).collect()
    )


def old_write_codebooks(path, books):
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    book_rows = [
        (ms, cid, [float(x) for x in cv])
        for ms, book in enumerate(books)
        for cid, cv in enumerate(book)
    ]
    spark.createDataFrame(
        spark.sparkContext.parallelize(book_rows, 1),
        "ms int, cid int, cv array<double>",
    ).write.mode("overwrite").parquet(str(path))


def old_read_codebooks(path):
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    brows = spark.read.parquet(str(path)).collect()
    mm = 1 + max(r["ms"] for r in brows)
    kk = 1 + max(r["cid"] for r in brows)
    books = [[None] * kk for _ in range(mm)]
    for r in brows:
        books[r["ms"]][r["cid"]] = [float(x) for x in r["cv"]]
    return books


def old_containment_gram_pairs(docs, text_col="text", id_col="doc_id", k=2,
                               threshold=0.8, max_doc_freq=32):
    from pyspark import StorageLevel
    from pyspark.sql import Window

    from github_etl_pipeline_spark.operators.dedup import hash_array_or_shingles

    gh = hash_array_or_shingles(docs, text_col, k)
    g = docs.select(F.col(id_col), F.explode(gh).alias("_gh"))
    wf = Window.partitionBy("_gh")
    rare = (
        g.withColumn("_df", F.count(F.lit(1)).over(wf))
        .where(F.col("_df") <= max_doc_freq)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = rare.groupBy(id_col).agg(F.count(F.lit(1)).alias("_nr"))
    m = rare.where(F.col("_df") >= 2)
    a = m.select("_gh", F.col(id_col).alias("id_a"))
    b = m.select("_gh", F.col(id_col).alias("id_b"))
    common = (
        a.join(b, "_gh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_nc"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("_nr").alias("_na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("_nr").alias("_nb"))
    cont = F.col("_nc").cast("double") / F.least("_na", "_nb")
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .where(cont >= threshold)
        .select("id_a", "id_b", F.round(cont, 6).alias("containment"))
    )


def old_cms_bucket(key, i, width, hash_fn):
    # pre-r14 form: md5-hex-conv for EVERY consumer (ignores hash_fn)
    return SK.portable_hash32(F.concat(F.lit(f"cms{i}:"), key)) % width


OLD = {
    "lsh_candidate_pairs": old_lsh_candidate_pairs,
    "semdedup": old_semdedup,
    "pq_reconstruction_error": old_pq_reconstruction_error,
    "embedding_dup_pairs_lsh": old_embedding_dup_pairs_lsh,
    "cms_bucket": old_cms_bucket,
    "containment_gram_pairs": old_containment_gram_pairs,
    "write_centroids": old_write_centroids,
    "read_centroids": old_read_centroids,
    "write_codebooks": old_write_codebooks,
    "read_codebooks": old_read_codebooks,
}
NEW = {
    "lsh_candidate_pairs": D.lsh_candidate_pairs,
    "semdedup": S.semdedup,
    "pq_reconstruction_error": PQ.pq_reconstruction_error,
    "embedding_dup_pairs_lsh": D.embedding_dup_pairs_lsh,
    "cms_bucket": SK._cms_bucket,
    "containment_gram_pairs": CUR.containment_gram_pairs,
    "write_centroids": S.write_centroids,
    "read_centroids": S.read_centroids,
    "write_codebooks": PQ.write_codebooks,
    "read_codebooks": PQ.read_codebooks,
}


def _patch(which: dict) -> None:
    D.lsh_candidate_pairs = which["lsh_candidate_pairs"]
    S.semdedup = which["semdedup"]
    D.embedding_dup_pairs_lsh = which["embedding_dup_pairs_lsh"]
    SK._cms_bucket = which["cms_bucket"]
    CUR.containment_gram_pairs = which["containment_gram_pairs"]
    PQ.pq_reconstruction_error = which["pq_reconstruction_error"]
    # tiny-IO seams: pq.py imported the similarity names into its own
    # namespace, so both modules' globals need re-pointing
    S.write_centroids = which["write_centroids"]
    S.read_centroids = which["read_centroids"]
    PQ.write_centroids = which["write_centroids"]
    PQ.read_centroids = which["read_centroids"]
    PQ.write_codebooks = which["write_codebooks"]
    PQ.read_codebooks = which["read_codebooks"]
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
