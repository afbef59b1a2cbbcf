"""Product quantization: deterministic codebook build, encode math
against an independent numpy derivation, ADC top-k optimality on a
seeded exact duplicate, and the pure-JVM ADC plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators.pq import (
    adc_lookup_tables,
    ann_topk_pq,
    build_pq_codebooks,
    pq_encode,
)
from github_etl_pipeline_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"
M, K, DSUB = 8, 16, 8


@pytest.fixture(scope="module")
def emb(spark):
    return read_table(spark, SF, "embeddings").select("vec_id", "embedding")


@pytest.fixture(scope="module")
def books(emb):
    return build_pq_codebooks(emb, m=M, k=K, lloyd_iterations=2)


def test_codebook_shape_and_determinism(emb, books):
    assert len(books) == M
    assert all(len(b) == K for b in books)
    assert all(len(c) == DSUB for b in books for c in b)
    again = build_pq_codebooks(emb, m=M, k=K, lloyd_iterations=2)
    assert again == books


def test_encode_matches_numpy_assignment(emb, books):
    """Independent math: every code must be the argmin of the 9dp-rounded
    L2 distance to its subspace codebook (ties -> lower code)."""
    got = {r["vec_id"]: r["codes"] for r in pq_encode(emb, books).collect()}
    vecs = {
        r["vec_id"]: np.asarray([float(x) for x in r["embedding"]])
        for r in emb.collect()
    }
    assert set(got) == set(vecs)
    C = [np.asarray(b) for b in books]
    for vid, v in vecs.items():
        for ms in range(M):
            s = v[ms * DSUB : (ms + 1) * DSUB]
            d2 = np.round(
                (s @ s) + (C[ms] * C[ms]).sum(axis=1) - 2 * (C[ms] @ s), 9
            )
            assert got[vid][ms] == int(np.argmin(d2))
            assert 0 <= got[vid][ms] < K


def test_adc_duplicate_achieves_minimum_distance(spark, emb, books):
    """A seeded exact duplicate of the query gets the query's own codes,
    and the query's code per subspace is the argmin of that subspace's
    lookup table — so the duplicate's ADC distance is the global minimum."""
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    dup = emb.where(F.col("vec_id") == 0).select(
        F.lit(888_888_888).cast("long").alias("vec_id"), "embedding"
    )
    codes = pq_encode(emb.unionAll(dup), books)
    top = ann_topk_pq(codes, books, q, k=5, exclude_id=0).collect()
    ids = [r["neighbor_id"] for r in sorted(top, key=lambda r: r["rank"])]
    assert 888_888_888 in ids
    luts = adc_lookup_tables(books, q)
    min_ad = round(sum(min(row) for row in luts), 9)
    # recompute the duplicate's ad from its codes
    dup_codes = {r["vec_id"]: r["codes"] for r in codes.collect()}[888_888_888]
    dup_ad = round(sum(luts[ms][c] for ms, c in enumerate(dup_codes)), 9)
    assert dup_ad == min_ad


def test_adc_scan_is_pure_jvm(spark, emb, books):
    """The ADC hot path must be a plain projection over the codes
    relation — no Python/Arrow eval node anywhere in its plan."""
    rows = [(r["vec_id"], r["codes"]) for r in pq_encode(emb, books).collect()]
    codes = spark.createDataFrame(rows, "vec_id long, codes array<int>")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    out = ann_topk_pq(codes, books, q, k=5, exclude_id=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # neither BatchEvalPython nor ArrowEvalPython
    assert out.count() == 5


@pytest.fixture(scope="module")
def ivfpq_index(spark, emb, tmp_path_factory):
    from github_etl_pipeline_spark.operators.pq import build_ivfpq_index

    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    build_ivfpq_index(emb, path, n_centroids=16, m=M, k=K, lloyd_iterations=2)
    return path


def _ivfpq_queries(spark, emb):
    return emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_ivfpq_serve_is_partition_pruned_and_jvm(spark, emb, ivfpq_index):
    from github_etl_pipeline_spark.operators.pq import ann_ivfpq_search

    out = ann_ivfpq_search(
        spark, ivfpq_index, _ivfpq_queries(spark, emb), k=5, n_probe=4
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:300]
    assert "EvalPython" not in plan  # serve path is pure JVM
    assert "embedding" not in plan  # raw vectors never read while serving
    assert out.count() == 25


def test_ivfpq_full_probe_equals_flat_adc(spark, emb, ivfpq_index):
    """With every cell probed, served IVF-PQ must return exactly the
    flat ADC ranking (same codebooks by deterministic construction) —
    pins that partitioning/pruning only SKIPS work, never changes it."""
    from github_etl_pipeline_spark.operators.pq import (
        ann_ivfpq_search,
        ann_topk_pq,
        build_pq_codebooks,
        pq_encode,
    )

    books = build_pq_codebooks(emb, m=M, k=K, lloyd_iterations=2)
    codes = pq_encode(emb, books)
    served = ann_ivfpq_search(
        spark, ivfpq_index, _ivfpq_queries(spark, emb), k=5, n_probe=16
    ).collect()
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in served}
    for qid in range(5):
        q = [
            float(x)
            for x in emb.where(F.col("vec_id") == qid).collect()[0]["embedding"]
        ]
        flat = ann_topk_pq(codes, books, q, k=5, exclude_id=qid).collect()
        for r in flat:
            assert got[(qid, r["rank"])] == r["neighbor_id"]


def test_reconstruction_error_properties(spark, emb, books):
    """err2 is a true squared distance: nonnegative everywhere, and an
    exact duplicate reproduces its source's error bit-for-bit (same
    codes, same subvectors)."""
    from github_etl_pipeline_spark.operators.pq import pq_reconstruction_error

    dup = emb.where(F.col("vec_id") == 0).select(
        F.lit(777_777_777).cast("long").alias("vec_id"), "embedding"
    )
    errs = {
        r["vec_id"]: r["err2"]
        for r in pq_reconstruction_error(emb.unionAll(dup), books).collect()
    }
    assert len(errs) == emb.count() + 1
    assert all(v >= 0 for v in errs.values())
    assert errs[777_777_777] == errs[0]


def test_adc_recall_floor_pinned_at_driver_scale(spark):
    """The registered PQ recall query is deterministic end-to-end (exact
    oracle), so its sf0.001 values are pinned: well above the ~0.2
    random-overlap baseline even on this near-orthogonal corpus."""
    from github_etl_pipeline_spark.plans import REGISTRY

    rows = {
        r["query_id"]: r["hits_at_10"]
        for r in REGISTRY["ann_pq_recall_floor"].builder(spark, SF).collect()
    }
    assert rows == {0: 1, 1: 1, 2: 2, 3: 3, 4: 4}


def test_ivfpq_append_equals_frozen_rebuild(spark, emb, tmp_path):
    """build(half) + append(rest) must equal assigning and encoding the
    FULL corpus with the same frozen centroids + codebooks — the
    steady-state ingest path changes nothing a rebuild-with-frozen-state
    wouldn't produce (codes compared row-by-row, not just counts)."""
    from github_etl_pipeline_spark.operators.pq import (
        ann_ivfpq_append,
        build_ivfpq_index,
        pq_encode,
    )
    from github_etl_pipeline_spark.operators.similarity import _assign_cells

    path = str(tmp_path / "idx")
    even = emb.where(F.col("vec_id") % 2 == 0)
    odd = emb.where(F.col("vec_id") % 2 == 1)
    build_ivfpq_index(even, path, n_centroids=16, m=M, k=K, lloyd_iterations=2)
    ann_ivfpq_append(spark, path, odd)
    got = {
        r["vec_id"]: (r["cell"], tuple(r["codes"]))
        for r in spark.read.parquet(f"{path}/codes").collect()
    }
    # frozen-state full encode: persisted centroids + codebooks
    centroids = sorted(
        (int(r["centroid_id"]), [float(x) for x in r["centroid"]])
        for r in spark.read.parquet(f"{path}/centroids").collect()
    )
    brows = spark.read.parquet(f"{path}/codebooks").collect()
    books2 = [[None] * K for _ in range(M)]
    for r in brows:
        books2[r["ms"]][r["cid"]] = [float(x) for x in r["cv"]]
    cells = {
        r["vec_id"]: r["cell"]
        for r in _assign_cells(emb, centroids, "vec_id", "embedding").collect()
    }
    codes = {
        r["vec_id"]: tuple(r["codes"]) for r in pq_encode(emb, books2).collect()
    }
    assert got == {vid: (cells[vid], codes[vid]) for vid in cells}


def test_lookup_tables_match_brute_force(books):
    q = [0.1] * 64
    luts = adc_lookup_tables(books, q)
    C0 = np.asarray(books[3])
    s = np.asarray(q[3 * DSUB : 4 * DSUB])
    for c in range(K):
        expect = round(float(s @ s + C0[c] @ C0[c] - 2 * (s @ C0[c])), 9)
        assert abs(luts[3][c] - expect) < 1e-9


def test_fused_build_matches_twopass(spark, emb, books):
    """The r14 fused build (one shared sample + one fused Lloyd scan per
    iteration + one fused cell/codes UDF) must reproduce the two-pass
    form bit-for-bit: coarse centroids == _lloyd_refine's, codebooks ==
    build_pq_codebooks', and the codes relation's (cell, codes) ==
    _assign_cells + _encode_udf composed."""
    from github_etl_pipeline_spark.operators.pq import (
        _cell_codes_udf,
        _encode_udf,
        _fused_coarse_pq_lloyd,
    )
    from github_etl_pipeline_spark.operators.similarity import (
        _assign_cells,
        _lloyd_refine,
        _sample_centroids,
    )

    n_centroids = 16
    e = emb.persist()
    sampled = _sample_centroids(e, "vec_id", "embedding", max(n_centroids, K))
    seed_centroids = sampled[:n_centroids]
    dim = len(sampled[0][1])
    seed_books = [
        [
            [float(x) for x in vec[ms * (dim // M) : (ms + 1) * (dim // M)]]
            for _, vec in sampled[:K]
        ]
        for ms in range(M)
    ]
    # two-pass reference
    ref_centroids = _lloyd_refine(e, "embedding", seed_centroids, 2)
    ref_books = build_pq_codebooks(e, m=M, k=K, lloyd_iterations=2)
    # fused
    got_centroids, got_books = _fused_coarse_pq_lloyd(
        e, "embedding", seed_centroids, seed_books, 2
    )
    assert got_centroids == ref_centroids
    assert got_books == ref_books
    # fused assignment+encode == the single-purpose UDFs composed
    cc = _cell_codes_udf(got_centroids, got_books)
    fused = {
        r["vec_id"]: (r["c"]["cell"], tuple(r["c"]["codes"]))
        for r in e.select("vec_id", cc(F.col("embedding")).alias("c")).collect()
    }
    codes = _encode_udf(ref_books)
    ref = {
        r["vec_id"]: (r["cell"], tuple(r["codes"]))
        for r in _assign_cells(e, ref_centroids, "vec_id", "embedding")
        .select("vec_id", "cell", codes(F.col("embedding")).alias("codes"))
        .collect()
    }
    e.unpersist()
    assert fused == ref
