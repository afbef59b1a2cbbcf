"""Graph centrality (operators/graph.py): PageRank math against an
independent numpy implementation, k-NN graph construction properties,
and mass-conservation invariants."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators.graph import (
    knn_graph_ivf,
    pagerank,
    pagerank_topk,
)
from github_etl_pipeline_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def test_pagerank_matches_numpy_on_hand_graph(spark):
    """Fixed-iteration PageRank on a small directed graph must equal an
    independent numpy power-iteration with identical rounding."""
    # 0 -> 1, 0 -> 2, 1 -> 2, 2 -> 0, 3 -> 2  (node 3 has no in-edges)
    edge_list = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
    n, iters, d = 4, 3, 0.85
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "vec_id long")
    got = {
        r["vec_id"]: r["pr"]
        for r in pagerank(edges, nodes, n, iterations=iters, damping=d).collect()
    }
    outdeg = {0: 2, 1: 1, 2: 1, 3: 1}
    pr = {i: 1.0 / n for i in range(n)}
    for _ in range(iters):
        mass = {i: 0.0 for i in range(n)}
        for s, t in edge_list:
            mass[t] += pr[s] / outdeg[s]
        pr = {i: round((1.0 - d) / n + d * mass[i], 9) for i in range(n)}
    assert got == pr
    assert got[3] == round((1.0 - d) / n, 9)  # no in-edges -> teleport mass


def test_pagerank_mass_bounds(spark):
    """Every node holds at least the teleport mass; total mass never
    exceeds 1 (out-edge-less nodes only LEAK, never mint, mass)."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (2, 0)], "src long, dst long"
    )  # node 3 dangling (no out-edges)
    nodes = spark.createDataFrame([(i,) for i in range(4)], "vec_id long")
    rows = pagerank(edges, nodes, 4, iterations=3).collect()
    base = round(0.15 / 4, 9)
    total = sum(r["pr"] for r in rows)
    assert all(r["pr"] >= base - 1e-12 for r in rows)
    assert total <= 1.0 + 1e-9


@pytest.fixture(scope="module")
def emb(spark):
    return read_table(spark, SF, "embeddings").select("vec_id", "embedding")


def test_knn_graph_shape(spark, emb):
    edges = knn_graph_ivf(emb, k=3).collect()
    by_src = {}
    for r in edges:
        assert r["src"] != r["dst"]
        by_src.setdefault(r["src"], set()).add(r["dst"])
    n = emb.count()
    assert len(by_src) == n  # every vector found candidates in its probes
    assert all(len(d) <= 3 for d in by_src.values())
    again = {(r["src"], r["dst"]) for r in knn_graph_ivf(emb, k=3).collect()}
    assert again == {(r["src"], r["dst"]) for r in edges}  # deterministic


def test_pagerank_topk_is_deterministic_and_ranked(spark, emb):
    top = pagerank_topk(emb, topk=10).collect()
    rows = sorted(top, key=lambda r: r["pos"])
    assert [r["pos"] for r in rows] == list(range(1, 11))
    prs = [r["pr"] for r in rows]
    assert prs == sorted(prs, reverse=True)
    again = pagerank_topk(emb, topk=10).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, top))
