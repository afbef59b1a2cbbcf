"""Graph centrality (operators/graph.py): PageRank math against an
independent numpy implementation, k-NN graph construction properties,
and mass-conservation invariants."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators.graph import (
    exact_knn_edges,
    knn_graph_ivf,
    knn_graph_recall_flags,
    knn_lpa_communities,
    lpa_communities,
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


def _lpa_reference(edge_list, n, iterations):
    """Independent synchronous LPA: mode over neighbors + self, tie -> min."""
    nbrs = {i: set() for i in range(n)}
    for a, b in edge_list:
        nbrs[a].add(b)
        nbrs[b].add(a)
    lab = {i: i for i in range(n)}
    for _ in range(iterations):
        nxt = {}
        for v in range(n):
            votes = {}
            for u in nbrs[v]:
                votes[lab[u]] = votes.get(lab[u], 0) + 1
            votes[lab[v]] = votes.get(lab[v], 0) + 1  # self-vote
            nxt[v] = min(l for l, c in votes.items() if c == max(votes.values()))
        lab = nxt
    return lab


def test_lpa_matches_reference_on_two_triangles(spark):
    """Two triangles joined by a single bridge edge must resolve to two
    communities labeled by each triangle's min id, matching an
    independent python implementation round-for-round."""
    edge_list = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    n, iters = 6, 3
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "vec_id long")
    got = {
        r["vec_id"]: r["community"]
        for r in lpa_communities(edges, nodes, iterations=iters).collect()
    }
    assert got == _lpa_reference(edge_list, n, iters)
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == got[4] == got[5] == 3


def test_lpa_isolated_node_keeps_own_label(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(3)], "vec_id long")
    got = {
        r["vec_id"]: r["community"]
        for r in lpa_communities(edges, nodes, iterations=3).collect()
    }
    assert got[2] == 2  # no edges -> self-vote keeps the label
    assert got[0] == got[1] == 0  # the pair collapses to the min id


def test_knn_lpa_total_and_deterministic(spark, emb):
    lab = knn_lpa_communities(emb, k=3, iterations=3).collect()
    n = emb.count()
    assert len(lab) == n  # exactly one label per vector
    by_id = {r["vec_id"]: r["community"] for r in lab}
    assert len(by_id) == n
    from github_etl_pipeline_spark.session import sweep_caches

    again = {
        r["vec_id"]: r["community"]
        for r in knn_lpa_communities(emb, k=3, iterations=3).collect()
    }
    sweep_caches(spark)  # release the graph build's persists
    assert again == by_id
    # communities are labeled by a member id
    ids = set(by_id)
    assert set(by_id.values()) <= ids


def test_pagerank_topk_is_deterministic_and_ranked(spark, emb):
    top = pagerank_topk(emb, topk=10).collect()
    rows = sorted(top, key=lambda r: r["pos"])
    assert [r["pos"] for r in rows] == list(range(1, 11))
    prs = [r["pr"] for r in rows]
    assert prs == sorted(prs, reverse=True)
    again = pagerank_topk(emb, topk=10).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, top))


def test_exact_knn_edges_agree_with_numpy(spark, emb):
    """Brute-force ground truth must match an independent numpy ranking
    under the same contract (9dp-rounded cosine, ties -> lower dst)."""
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    queries = emb.where(F.col("vec_id") % 100 == 0)
    got = {}
    for r in exact_knn_edges(emb, queries, k=3).collect():
        got.setdefault(r["src"], []).append(r["dst"])
    q_ids = sorted(ids[ids % 100 == 0])
    assert sorted(got) == q_ids
    for qid in q_ids:
        qi = int(np.where(ids == qid)[0][0])
        cos = np.round(mat @ mat[qi] / (norms * norms[qi]), 9)
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != qid),
            key=lambda i: (-cos[i], ids[i]),
        )
        assert sorted(got[qid]) == sorted(int(ids[i]) for i in order[:3])


def test_knn_graph_recall_floor_and_nprobe_monotonic(spark, emb):
    """The cell-local build must recover a nonzero fraction of the exact
    3-NN edges, and recall must not DECREASE with more probes. The
    corpus is random near-orthogonal vectors — the hardest regime for
    any locality structure (sf0.01 measured: 0.24 @ n_probe=1, 0.36 @ 2,
    0.58 @ 4) — so floors are intentionally loose; the registered query
    pins the exact per-edge flags cross-engine."""
    from github_etl_pipeline_spark.session import sweep_caches

    recalls = {}
    for n_probe in (1, 2, 4):
        df = knn_graph_recall_flags(emb, sample_mod=23, k=3, n_probe=n_probe)
        rows = df.collect()
        sweep_caches(spark)
        n_queries = emb.where(F.col("vec_id") % 23 == 0).count()
        assert len(rows) == 3 * n_queries  # one flag per exact edge
        recalls[n_probe] = sum(r["found"] for r in rows) / len(rows)
    assert recalls[1] > 0.0
    assert recalls[1] <= recalls[2] <= recalls[4]
    assert recalls[4] >= 0.3


def test_pagerank_checkpoint_parity(spark):
    """checkpoint_every must not change a single rank: each round is
    9dp-rounded before the checkpoint, so truncation is value-neutral."""
    edge_list = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 0), (2, 4)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(5)], "vec_id long")
    plain = {
        r["vec_id"]: r["pr"]
        for r in pagerank(edges, nodes, 5, iterations=6).collect()
    }
    ckpt = {
        r["vec_id"]: r["pr"]
        for r in pagerank(
            edges, nodes, 5, iterations=6, checkpoint_every=2
        ).collect()
    }
    assert plain == ckpt


def test_lpa_checkpoint_parity(spark):
    edge_list = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3), (5, 6)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(7)], "vec_id long")
    plain = {
        r["vec_id"]: r["community"]
        for r in lpa_communities(edges, nodes, iterations=5).collect()
    }
    ckpt = {
        r["vec_id"]: r["community"]
        for r in lpa_communities(
            edges, nodes, iterations=5, checkpoint_every=2
        ).collect()
    }
    assert plain == ckpt


# ---------------------------------------------------------------------------
# Measured probe tuner (VERDICT r12 #1): the graph family's recall lever
# ---------------------------------------------------------------------------
def test_probe_sweep_matches_recall_flags_per_rung(spark, emb):
    """Each sweep rung must equal the independently-measured recall of
    knn_graph_recall_flags at that n_probe — the sweep is the SAME
    measurement, refactored to share one candidate scan."""
    from github_etl_pipeline_spark.operators.graph import knn_probe_recall_sweep
    from github_etl_pipeline_spark.session import sweep_caches

    sw = {
        r["n_probe"]: r
        for r in knn_probe_recall_sweep(emb, probes=(1, 2, 4), sample_mod=23).collect()
    }
    sweep_caches(spark)
    for p in (1, 2, 4):
        rows = knn_graph_recall_flags(emb, sample_mod=23, k=3, n_probe=p).collect()
        sweep_caches(spark)
        assert sw[p]["n_exact"] == len(rows)
        assert sw[p]["n_found"] == sum(r["found"] for r in rows), f"n_probe={p}"


def test_probes_for_recall_always_reaches_any_target(spark, emb):
    """The default ladder tops out at the cell count — probing every
    cell IS exact k-NN — so even recall 1.0 is reachable (the lever
    that LSH banding gets from more bands, here from more probes)."""
    from github_etl_pipeline_spark.operators.graph import knn_probes_for_recall
    from github_etl_pipeline_spark.session import sweep_caches

    kw = knn_probes_for_recall(emb, target_recall=1.0)
    sweep_caches(spark)
    assert kw["recall"] == 1.0 and not kw["capped"]
    assert kw["sweep"][kw["n_probe"]] == 1.0


def test_probes_for_recall_truncated_ladder_caps_loud(spark, emb):
    from github_etl_pipeline_spark.operators.graph import knn_probes_for_recall
    from github_etl_pipeline_spark.session import sweep_caches

    kw = knn_probes_for_recall(emb, target_recall=1.0, probes=(1, 2))
    sweep_caches(spark)
    assert kw["capped"] and kw["n_probe"] == 2 and kw["recall"] < 1.0


def test_recall_target_kwarg_parity(spark, emb):
    """knn_graph_ivf(recall_target=T) must produce the EXACT edge set of
    knn_graph_ivf(n_probe=chosen) where chosen comes from the tuner —
    the routed build is the explicit build, not an approximation of it.
    Same parity through pagerank_topk (VERDICT r12 #1 kwarg test)."""
    from github_etl_pipeline_spark.operators.graph import (
        knn_graph_ivf,
        knn_probes_for_recall,
        pagerank_topk,
    )
    from github_etl_pipeline_spark.session import sweep_caches

    target = 0.5
    kw = knn_probes_for_recall(emb, target_recall=target)
    sweep_caches(spark)
    routed = set(map(tuple, knn_graph_ivf(emb, recall_target=target).collect()))
    sweep_caches(spark)
    explicit = set(
        map(tuple, knn_graph_ivf(emb, n_probe=kw["n_probe"]).collect())
    )
    sweep_caches(spark)
    assert routed == explicit and len(routed) > 0
    pr_routed = [tuple(r) for r in pagerank_topk(emb, topk=5, recall_target=target).collect()]
    sweep_caches(spark)
    pr_explicit = [
        tuple(r) for r in pagerank_topk(emb, topk=5, n_probe=kw["n_probe"]).collect()
    ]
    sweep_caches(spark)
    assert pr_routed == pr_explicit
