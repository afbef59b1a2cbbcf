"""Product quantization (Jégou/Douze/Schmid 2011, "Product Quantization
for Nearest Neighbor Search") — the compression half of IVF-PQ, the
standard web-scale ANN layout: split each vector into ``m`` subvectors,
learn a small L2 k-means codebook per subspace, store each vector as
``m`` one-byte codes. A 64-dim float32 corpus (256 B/row) becomes 8
code bytes/row — a 32x scan-volume cut — and queries scan CODES with an
asymmetric-distance (ADC) lookup table instead of touching raw vectors.

Beyond-reference extension surface (SURVEY §8); the reference has no
vector columns at all.

Determinism contract (the repo-wide cross-engine rules, mirrored by the
``_pq_ctes`` oracle in plans/extensions.py):
  * codebook seeds = the subvectors of the ``k`` corpus rows whose
    ``md5(id)`` digests sort lowest (the ``_sample_centroids`` device —
    distributed TakeOrderedAndProject, never a corpus collect);
  * L2 assignment distances ``|s|^2 + |c|^2 - 2<s,c>`` are rounded to
    9dp BEFORE the argmin (ties -> lower code), so BLAS-vs-sequential
    summation ulps (~1e-15 at unit norms) cannot flip a code;
  * Lloyd means are rounded to 6dp (engine difference is summation-order
    ulps, far inside the grid); empty cells keep their previous centroid.

Scale shape: the codebook build is ``lloyd_iterations`` fused
assignment+partial-mean ``mapInPandas`` passes (each partition emits at
most m x k rows — no shuffle, the tiny partials merge on the driver);
encoding is ONE Arrow-batched projection; the ADC scan is a pure JVM
projection over the codes relation (the per-subspace lookup tables are
m x k literals), so the hot path never reads a raw vector.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators.similarity import _sample_centroids

Codebooks = list[list[list[float]]]  # [m][k][dsub]


def build_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    lloyd_iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> Codebooks:
    """Learn ``m`` per-subspace L2 k-means codebooks of ``k`` centroids.

    The seed sample is ONE md5-ordered distributed top-k (the same rows
    seed every subspace — their subvector slices); each Lloyd iteration
    is ONE corpus scan that assigns and partial-aggregates ALL subspaces
    fused in a single ``mapInPandas`` pass."""
    import numpy as np

    dsub = dim // m
    if lloyd_iterations > 0:
        emb = emb.persist()
    sampled = _sample_centroids(emb, id_col, vec_col, k)
    books: Codebooks = [
        [[float(x) for x in vec[ms * dsub : (ms + 1) * dsub]] for _, vec in sampled]
        for ms in range(m)
    ]
    for _ in range(lloyd_iterations):
        bk = [[list(map(float, c)) for c in book] for book in books]
        mm, kk, dd = m, k, dsub

        def partials(batches):
            C = [np.asarray(bk[ms], dtype=np.float64) for ms in range(mm)]
            cn = [(c * c).sum(axis=1) for c in C]
            sums = [np.zeros((kk, dd)) for _ in range(mm)]
            counts = [np.zeros(kk, dtype=np.int64) for _ in range(mm)]
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                M = np.stack(pdf.iloc[:, 0].to_numpy()).astype(np.float64)
                for ms in range(mm):
                    S = M[:, ms * dd : (ms + 1) * dd]
                    # in-place rint rounding == np.round(d2, 9), ~20x
                    # faster (see similarity._nearest_cells_udf)
                    d2 = (S * S).sum(axis=1)[:, None] + cn[ms][None, :] - 2 * (S @ C[ms].T)
                    np.multiply(d2, 1e9, out=d2)
                    np.rint(d2, out=d2)
                    np.divide(d2, 1e9, out=d2)
                    a = np.argmin(d2, axis=1)  # first min -> lower code
                    np.add.at(sums[ms], a, S)
                    np.add.at(counts[ms], a, 1)
            rows = {"ms": [], "cell": [], "cnt": [], "s": []}
            for ms in range(mm):
                hit = np.nonzero(counts[ms])[0]
                for i in hit:
                    rows["ms"].append(ms)
                    rows["cell"].append(int(i))
                    rows["cnt"].append(int(counts[ms][i]))
                    rows["s"].append(sums[ms][i].tolist())
            # yield NOTHING for an all-empty partition (the empty-column
            # Arrow dtype trap — see similarity._lloyd_refine)
            if not rows["ms"]:
                return
            yield pd.DataFrame(rows)

        collected = emb.select(vec_col).mapInPandas(
            partials, "ms int, cell int, cnt long, s array<double>"
        ).collect()
        acc: dict[tuple[int, int], tuple[int, "np.ndarray"]] = {}
        for r in collected:
            key = (r["ms"], r["cell"])
            n0, s0 = acc.get(key, (0, np.zeros(dsub)))
            acc[key] = (n0 + r["cnt"], s0 + np.asarray(r["s"]))
        books = [
            [
                np.round(acc[(ms, c)][1] / acc[(ms, c)][0], 6).tolist()
                if (ms, c) in acc
                else old
                for c, old in enumerate(books[ms])
            ]
            for ms in range(m)
        ]
    if lloyd_iterations > 0:
        emb.unpersist()
    return books


def _encode_udf(books: Codebooks):
    """Arrow-batched m-code assignment: one numpy pass computes every
    subspace's rounded L2 distances and argmins — constant-size plan,
    O(batch) work, first-min tie-break matching the oracle's
    (distance, code) ordering."""
    import numpy as np
    from pyspark.sql.types import ArrayType, IntegerType

    bk = [[list(map(float, c)) for c in book] for book in books]
    mm = len(bk)
    dd = len(bk[0][0])

    @F.pandas_udf(ArrayType(IntegerType()))
    def _codes(v: pd.Series) -> pd.Series:
        C = [np.asarray(bk[ms], dtype=np.float64) for ms in range(mm)]
        cn = [(c * c).sum(axis=1) for c in C]
        M = np.stack(v.to_numpy()).astype(np.float64)
        out = np.empty((len(M), mm), dtype=np.int32)
        for ms in range(mm):
            S = M[:, ms * dd : (ms + 1) * dd]
            # in-place rint rounding == np.round(d2, 9), ~20x faster
            d2 = (S * S).sum(axis=1)[:, None] + cn[ms][None, :] - 2 * (S @ C[ms].T)
            np.multiply(d2, 1e9, out=d2)
            np.rint(d2, out=d2)
            np.divide(d2, 1e9, out=d2)
            out[:, ms] = np.argmin(d2, axis=1)
        return pd.Series([row.tolist() for row in out])

    return _codes


def pq_encode(
    emb: DataFrame,
    books: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — each vector compressed to its m codebook
    codes. One Arrow-batched projection; no shuffle."""
    codes = _encode_udf(books)
    return emb.select(F.col(id_col), codes(F.col(vec_col)).alias("codes"))


def adc_lookup_tables(
    books: Codebooks, query_vec: list[float]
) -> list[list[float]]:
    """Per-subspace ADC lookup tables: lut[ms][c] = 9dp-rounded L2
    distance between the query's ms-th subvector and codebook entry c —
    m x k doubles, computed driver-side, shipped as plan literals."""
    dd = len(books[0][0])
    luts = []
    for ms, book in enumerate(books):
        qs = [float(x) for x in query_vec[ms * dd : (ms + 1) * dd]]
        nq = sum(x * x for x in qs)
        row = []
        for cv in book:
            nc = sum(x * x for x in cv)
            dot = sum(a * b for a, b in zip(qs, cv))
            row.append(round(nq + nc - 2 * dot, 9))
        luts.append(row)
    return luts


def pq_reconstruction_error(
    emb: DataFrame,
    books: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, err2) — per-vector product-quantization distortion: the sum
    over subspaces of the 9dp-rounded L2 distance between the subvector
    and its assigned codeword, itself rounded 9dp (fixed subspace
    order). The PQ analogue of the int8 reconstruction-error gate: the
    measured-quality signal that decides whether m/k are adequate for a
    corpus before the codes replace raw vectors in a 100-TB scan path.

    Pure JVM: codes come from the one Arrow encode pass; the codeword
    lookup is ``element_at`` into an m x k x dsub literal, and each
    distance term re-derives ``|s|^2 + |c|^2 - 2<s,c>`` with the same
    left-to-right fold the oracle uses — no extra Python stage."""
    dd = len(books[0][0])
    codes = _encode_udf(books)
    t = emb.select(
        F.col(id_col), F.col(vec_col), codes(F.col(vec_col)).alias("codes")
    )
    from github_etl_pipeline_spark.operators.similarity import dot_expr

    err = None
    for ms, book in enumerate(books):
        cw = F.element_at(
            F.array(*[F.array(*[F.lit(float(x)) for x in cv]) for cv in book]),
            F.element_at(F.col("codes"), ms + 1) + F.lit(1),
        )
        s = F.slice(F.col(vec_col), ms * dd + 1, dd)
        term = F.round(
            dot_expr(s, s) + dot_expr(cw, cw) - F.lit(2.0) * dot_expr(s, cw), 9
        )
        err = term if err is None else err + term
    return t.select(F.col(id_col), F.round(err, 9).alias("err2"))


def _adc_dist_expr(luts_by_query: dict[int, list[list[float]]], qid_col: str):
    """Chained-when ADC distance over the ``codes`` column: for each
    query id, sum of ``element_at`` lookups into that query's m x k
    literal tables in FIXED subspace order (left-to-right adds — the
    cross-engine-exact summation), rounded 9dp. Plan size is
    |queries| x m x k literals — bounded by the small-query-set
    contract, zero per-row Python."""
    expr = None
    for qid, luts in luts_by_query.items():
        d = None
        for ms, row in enumerate(luts):
            lut_arr = F.array(*[F.lit(float(x)) for x in row])
            term = F.element_at(lut_arr, F.element_at(F.col("codes"), ms + 1) + F.lit(1))
            d = term if d is None else d + term
        cond = F.col(qid_col) == qid
        expr = F.when(cond, F.round(d, 9)) if expr is None else expr.when(cond, F.round(d, 9))
    return expr


def build_ivfpq_index(
    emb: DataFrame,
    index_path,
    n_centroids: int = 16,
    m: int = 8,
    k: int = 16,
    lloyd_iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist a served IVF-PQ index (the FAISS ``IndexIVFPQ`` layout,
    ``by_residual=False`` mode): coarse spherical-k-means centroids
    (tiny), per-subspace PQ codebooks (tiny), and the corpus as
    ``(vec_id, codes)`` rows partitioned by coarse cell — so a search
    that probes ``n_probe`` cells reads ONLY those partition directories
    AND reads codes (m bytes/row) instead of raw vectors (4*dim). The
    two levers compound: probe fraction x 32x compression ≈ 0.1% of the
    raw-corpus scan bytes at 16 cells / 4 probes.

    ``by_residual=False`` (codebooks trained on raw vectors, not
    per-cell residuals) keeps the codebook build one corpus-wide pass
    and the oracle a composition of the IVF and PQ chains. The residual
    mode was MEASURED before being skipped, not assumed away: on this
    near-isotropic corpus a numpy prototype read 11% lower distortion
    (mean sq reconstruction 0.49 vs 0.55) but NO recall gain (29 vs 34
    hits@10 over 10 queries — noise-level), because coarse cells barely
    concentrate isotropic vectors, so residual norms ~= raw norms.
    Revisit by_residual=True when the corpus is clustered enough that
    ``pq_reconstruction_error`` drops sharply under residualization —
    that is the regime where the FAISS default pays. Citing the
    reference is N/A — the reference engine (etl/*.py) has no vector
    surface at all."""
    from pathlib import Path

    from github_etl_pipeline_spark.operators.similarity import (
        _assign_cells,
        _lloyd_refine,
        _sample_centroids,
    )

    index_path = Path(str(index_path))
    emb = emb.persist()
    centroids = _sample_centroids(emb, id_col, vec_col, n_centroids)
    if lloyd_iterations > 0:
        centroids = _lloyd_refine(emb, vec_col, centroids, lloyd_iterations)
    books = build_pq_codebooks(
        emb, m=m, k=k, lloyd_iterations=lloyd_iterations,
        id_col=id_col, vec_col=vec_col,
    )
    spark = emb.sparkSession
    # one slice each: both relations are driver-bounded (see
    # build_ivf_index's parallelize(rows, 1) rationale)
    spark.createDataFrame(
        spark.sparkContext.parallelize(list(centroids), 1),
        "centroid_id int, centroid array<double>",
    ).write.mode("overwrite").parquet(str(index_path / "centroids"))
    book_rows = [
        (ms, cid, [float(x) for x in cv])
        for ms, book in enumerate(books)
        for cid, cv in enumerate(book)
    ]
    spark.createDataFrame(
        spark.sparkContext.parallelize(book_rows, 1),
        "ms int, cid int, cv array<double>",
    ).write.mode("overwrite").parquet(str(index_path / "codebooks"))
    codes = _encode_udf(books)
    (
        _assign_cells(emb, centroids, id_col, vec_col)
        .select(F.col(id_col), F.col("cell"), codes(F.col(vec_col)).alias("codes"))
        .repartition(n_centroids, F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(str(index_path / "codes"))
    )
    emb.unpersist()


def ann_ivfpq_append(
    spark,
    index_path,
    new_emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append delta vectors to a persisted IVF-PQ index WITHOUT a
    rebuild — the steady-state ingest half of the index lifecycle
    (mirrors ``ann_ivf_append``): assign each new vector to its coarse
    cell with the PERSISTED centroids and encode it with the PERSISTED
    codebooks, then append cell-partitioned code rows. The historical
    index is never read or rewritten; only the delta scans (one
    assignment + encode projection).

    Centroids AND codebooks are frozen by design: ADC distances for the
    appended rows come from the same tables a rebuild would use, so a
    served search over old+new is exactly the search over a frozen-
    codebook full build (pinned by tests/test_pq.py). Under heavy
    distribution drift the frozen codebooks' DISTORTION grows (recall
    per probe decays, correctness doesn't) — watch
    ``pq_reconstruction_error`` on the delta and rebuild on the corpus
    refresh cadence when it drifts above the build-time gate."""
    from pathlib import Path

    from github_etl_pipeline_spark.operators.similarity import _assign_cells

    index_path = Path(str(index_path))
    centroids = sorted(
        (int(r["centroid_id"]), [float(x) for x in r["centroid"]])
        for r in spark.read.parquet(str(index_path / "centroids")).collect()
    )
    brows = spark.read.parquet(str(index_path / "codebooks")).collect()
    mm = 1 + max(r["ms"] for r in brows)
    kk = 1 + max(r["cid"] for r in brows)
    books: Codebooks = [[None] * kk for _ in range(mm)]  # type: ignore[list-item]
    for r in brows:
        books[r["ms"]][r["cid"]] = [float(x) for x in r["cv"]]
    codes = _encode_udf(books)
    (
        _assign_cells(new_emb, centroids, id_col, vec_col)
        .select(F.col(id_col), F.col("cell"), codes(F.col(vec_col)).alias("codes"))
        .repartition(len(centroids), F.col("cell"))
        .write.mode("append")
        .partitionBy("cell")
        .parquet(str(index_path / "codes"))
    )


def ann_ivfpq_search(
    spark,
    index_path,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Serve approximate top-k from a persisted IVF-PQ index: probe-cell
    assignment runs driver-side over the collected (small) query set —
    the ``ann_ivf_search`` device — and the scan reads ONLY the probed
    cell directories of the CODES relation, scoring each row with the
    query's literal ADC tables in a pure JVM projection. No raw vector
    is read anywhere on the serve path."""
    from pathlib import Path

    import numpy as np

    index_path = Path(str(index_path))
    centroids = sorted(
        (int(r["centroid_id"]), [float(x) for x in r["centroid"]])
        for r in spark.read.parquet(str(index_path / "centroids")).collect()
    )
    brows = spark.read.parquet(str(index_path / "codebooks")).collect()
    mm = 1 + max(r["ms"] for r in brows)
    kk = 1 + max(r["cid"] for r in brows)
    books: Codebooks = [[None] * kk for _ in range(mm)]  # type: ignore[list-item]
    for r in brows:
        books[r["ms"]][r["cid"]] = [float(x) for x in r["cv"]]
    qrows = queries.select(query_id_col, query_vec_col).collect()
    if not qrows:
        return spark.createDataFrame([], f"{query_id_col} long, rank int, neighbor_id long")
    # coarse probe: 9dp-rounded cosine, stable ties -> lower centroid id
    # (identical to ann_ivf_search / _nearest_cells_udf)
    cids = np.asarray([c for c, _ in centroids])
    C = np.asarray([v for _, v in centroids], dtype=np.float64)
    cn = np.linalg.norm(C, axis=1)
    cn[cn == 0] = 1.0
    Q = np.asarray([[float(x) for x in r[1]] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0] = 1.0
    sim = np.round((Q @ C.T) / (qn[:, None] * cn[None, :]), 9)
    order = np.argsort(-sim, axis=1, kind="stable")[:, :n_probe]
    qcell_rows = [
        (r[0], int(cids[j])) for i, r in enumerate(qrows) for j in order[i]
    ]
    qcells = spark.createDataFrame(
        spark.sparkContext.parallelize(qcell_rows, 1),
        f"{query_id_col} long, cell int",
    )
    luts_by_query = {
        int(r[0]): adc_lookup_tables(books, [float(x) for x in r[1]]) for r in qrows
    }
    probe_cells = sorted({int(c) for row in order for c in cids[row]})
    codes = spark.read.parquet(str(index_path / "codes")).where(
        F.col("cell").isin(probe_cells)
    )
    cand = codes.join(F.broadcast(qcells), "cell").where(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        _adc_dist_expr(luts_by_query, query_id_col).alias("_ad"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("_ad").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id")
    )


def ann_topk_pq(
    codes_df: DataFrame,
    books: Codebooks,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    exclude_id: int | None = None,
) -> DataFrame:
    """ADC approximate top-k over the CODES relation: approx distance =
    sum over subspaces of lut[ms][code_ms], a pure JVM projection (the
    lookup is ``element_at`` into an m x k literal array stack — raw
    vectors are never read). Output (rank, neighbor_id), ranked by
    (9dp-rounded approx distance asc, id asc). At 100 TB this scan reads
    ~3% of the bytes of the raw-vector GEMM baseline; rerank the top
    candidates against raw vectors where exactness matters."""
    luts = adc_lookup_tables(books, query_vec)
    dist = None
    for ms, row in enumerate(luts):
        lut_arr = F.array(*[F.lit(float(x)) for x in row])
        term = F.element_at(lut_arr, F.element_at(F.col("codes"), ms + 1) + F.lit(1))
        dist = term if dist is None else dist + term
    scored = codes_df.select(
        F.col(id_col).alias("neighbor_id"), F.round(dist, 9).alias("_ad")
    )
    if exclude_id is not None:
        scored = scored.where(F.col("neighbor_id") != exclude_id)
    w = Window.orderBy(F.col("_ad").asc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("rank", "neighbor_id")
    )
