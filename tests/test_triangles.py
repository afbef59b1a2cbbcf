"""Triangle counting / clustering coefficients (operators/graph.py):
known closed forms, directed-input symmetrization, and seeded random
brute-force parity."""

import itertools
import random

import pandas as pd
import pytest

from github_etl_pipeline_spark.operators.graph import (
    symmetrize_undirected,
    triangle_nodes,
    triangle_summary,
)


def _df(spark, pairs):
    return spark.createDataFrame(pd.DataFrame(pairs, columns=["src", "dst"]))


def test_k4_complete(spark):
    pairs = [(a, b) for a, b in itertools.permutations(range(4), 2)]
    r = triangle_summary(_df(spark, pairs)).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)
    assert r["n_wedges"] == 12  # 4 nodes x C(3,2)
    assert r["global_cc"] == 1.0 and r["avg_local_cc"] == 1.0
    nodes = {x["node"]: x for x in triangle_nodes(_df(spark, pairs)).collect()}
    assert all(v["d"] == 3 and v["triangles"] == 3 and v["local_cc"] == 1.0
               for v in nodes.values())


def test_path_no_triangles(spark):
    r = triangle_summary(_df(spark, [(1, 2), (2, 3)])).collect()[0]
    assert (r["n_triangles"], r["n_wedges"], r["global_cc"]) == (0, 1, 0.0)
    assert r["avg_local_cc"] == 0.0


def test_directed_dedup_and_self_loops(spark):
    # both directions + duplicate + self-loop collapse to ONE undirected
    # edge set; triangle still found once
    pairs = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    und = symmetrize_undirected(_df(spark, pairs)).collect()
    assert sorted((r["a"], r["b"]) for r in und) == [(1, 2), (1, 3), (2, 3)]
    r = triangle_summary(_df(spark, pairs)).collect()[0]
    assert (r["n_triangles"], r["global_cc"]) == (1, 1.0)


@pytest.mark.parametrize("seed,n,m", [(7, 12, 30), (11, 20, 60), (13, 9, 14)])
def test_random_bruteforce_parity(spark, seed, n, m):
    rng = random.Random(seed)
    pairs = set()
    while len(pairs) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            pairs.add((a, b))
    und = {(min(a, b), max(a, b)) for a, b in pairs}
    adj = {v: set() for e in und for v in e}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    tri_per = {v: 0 for v in adj}
    n_tri = 0
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            n_tri += 1
            for v in (a, b, c):
                tri_per[v] += 1
    got = {r["node"]: r for r in triangle_nodes(_df(spark, list(pairs))).collect()}
    assert set(got) == set(adj)
    for v in adj:
        assert got[v]["d"] == len(adj[v])
        assert got[v]["triangles"] == tri_per[v], f"node {v}"
        d = len(adj[v])
        exp = 0.0 if d < 2 else round(2.0 * tri_per[v] / (d * (d - 1)), 9)
        assert got[v]["local_cc"] == exp
    s = triangle_summary(_df(spark, list(pairs))).collect()[0]
    assert s["n_triangles"] == n_tri
    assert s["n_edges"] == len(und)
    assert s["n_wedges"] == sum(d * (d - 1) // 2 for d in map(len, adj.values()))


def test_regime_separation_exact_graph(spark):
    # the docstring's measured claim: on the EXACT k-NN graph, tight
    # Gaussian clusters show much higher local clustering than uniform
    # random vectors; the cell-local IVF build compresses the contrast
    import numpy as np

    from github_etl_pipeline_spark.operators.graph import exact_knn_edges

    rng = np.random.default_rng(42)
    n, dim, kc = 400, 32, 8
    centers = rng.normal(size=(kc, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = centers[rng.integers(0, kc, n)] + rng.normal(scale=0.05, size=(n, dim))
    rnd = rng.normal(size=(n, dim))

    def cc(arr):
        df = spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": range(n), "embedding": [r.tolist() for r in arr]}
            )
        )
        return triangle_summary(exact_knn_edges(df, df, k=3)).collect()[0][
            "avg_local_cc"
        ]

    clustered, random_ = cc(pts), cc(rnd)
    assert clustered > 2.5 * random_, (clustered, random_)
