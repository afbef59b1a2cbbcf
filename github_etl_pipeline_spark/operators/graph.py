"""Graph / link-analysis operators over derived similarity graphs.

A 100-TB curation pipeline uses graph centrality as a SELECTION signal:
build a k-NN graph over the embedding corpus (each document points at
its k most similar neighbors), then rank documents by PageRank — high
centrality = representative/hub content, low = peripheral. The same
machinery covers citation-style graphs when an explicit edge table
exists.

Beyond-reference extension surface (SURVEY §8); the reference has no
graph or vector surface.

Scale shape:
  * the k-NN graph builds on the IVF cell machinery WITHOUT the
    broadcast the small-query-set search path uses — the corpus joins
    its own probed cells SHUFFLE-side (both relations keyed on cell),
    so candidate volume is n x n_probe x cell_size — linear at constant
    cell size — and no corpus-sized broadcast ever ships.
  * PageRank runs a FIXED number of iterations (a deterministic plan,
    unrollable in the DuckDB oracle), each ONE join + ONE aggregate
    shuffle at edge scale. Ranks are rounded to 9dp per iteration, so
    aggregation-order ulps (~1e-18 at these magnitudes) can never
    diverge engines.
  * out-degree is k for every non-isolated node by construction;
    a node whose probed cells contain no other vector contributes no
    out-edges and its mass leaks (the standard simplification — both
    engines mirror it exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators.similarity import (
    _FAN_OUT_ROWS,
    _assign_cells,
    _lloyd_refine,
    _nearest_cells_udf,
    _sample_centroids,
    cells_for_corpus,
    dot_expr,
    norm_expr,
)


def knn_graph_ivf(
    emb: DataFrame,
    k: int = 3,
    n_centroids: int | None = None,
    n_probe: int = 1,
    lloyd_iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(src, dst) — each vector's k most similar neighbors among its
    ``n_probe`` probed IVF cells (9dp-rounded cosine ranking, ties ->
    lower id; the repo's deterministic k-means build underneath). The
    graph-construction sibling of ``ann_ivf_topk``: the query set IS
    the corpus, so probed cells attach by a SHUFFLE join on cell — no
    broadcast — and the per-src top-k collapses to a WindowGroupLimit.

    ``n_probe`` defaults to 1 — CELL-LOCAL kNN, the semdedup join
    shape: the persisted cells relation self-joins on cell, so the
    query side needs no extra probe pass and candidate volume is
    n x cell_size. The measured reason: at 4 probes the candidate dot
    products quadruple (the 10x tier hit ~52M 64-dim JVM folds and the
    sf1 build alone read 40s); boundary vectors lose cross-cell edges
    — the same locality tradeoff semdedup documents.

    MEASURED edge recall vs exact 3-NN (r12, the registered
    ``knn_graph_recall_floor`` query + the SCALING.md sweep; ~64
    sampled query nodes; this corpus is random near-orthogonal vectors
    — the WORST case for any locality structure, the ann_pq_recall
    regime note):

        n        recall@1  recall@2  recall@4
        500      0.242     0.364     0.576
        20,000   0.133     0.200     0.251
        200,000  0.037     0.060     0.090

    On this regime the cell-local graph is a LOCALITY approximation of
    the exact k-NN graph, decaying as cells multiply (adaptive cell
    count holds cell SIZE, so the probed fraction of the space shrinks
    as n grows); raising n_probe buys ~1.5-2.4x recall at ~2-4x
    candidate cost but cannot beat the regime. Clustered real
    embeddings — where near neighbors co-locate — sit far above these
    floors; measure per-corpus with knn_graph_recall_flags before
    trusting boundary-sensitive downstream signals.

    ``n_centroids=None`` selects ``cells_for_corpus(n)`` (the semdedup
    device): with FIXED cells the candidate volume n x n_probe x
    cell_size is quadratic; at constant target cell size it is linear.
    Large corpora fan out to machine parallelism first (single-file
    scans otherwise run the n x K assignment on one or two cores)."""
    n = emb.count()
    if n_centroids is None:
        n_centroids = cells_for_corpus(n)
    parallelism = emb.sparkSession.sparkContext.defaultParallelism
    if n >= _FAN_OUT_ROWS and emb.rdd.getNumPartitions() < parallelism:
        emb = emb.repartition(parallelism)
    if lloyd_iterations > 0:
        emb = emb.persist()
    centroids = _sample_centroids(emb, id_col, vec_col, n_centroids)
    if lloyd_iterations > 0:
        centroids = _lloyd_refine(emb, vec_col, centroids, lloyd_iterations)
    cells = _assign_cells(emb, centroids, id_col, vec_col).persist()
    if n_probe == 1:
        # cell-local: the assignment IS the (single) probe
        qcells = cells.select(
            F.col("cell"),
            F.col(id_col).alias("src"),
            F.col(vec_col).alias("_qv"),
            F.col("_ne").alias("_nq"),
        )
    else:
        assign_probe = _nearest_cells_udf(centroids, n_probe)
        qcells = emb.select(
            F.col(id_col).alias("src"),
            F.col(vec_col).alias("_qv"),
            norm_expr(F.col(vec_col)).alias("_nq"),
            F.explode(assign_probe(F.col(vec_col))).alias("cell"),
        )
    cand = cells.join(qcells, "cell").where(F.col(id_col) != F.col("src"))
    scored = cand.select(
        "src",
        F.col(id_col).alias("dst"),
        F.round(
            dot_expr(F.col(vec_col), F.col("_qv")) / (F.col("_ne") * F.col("_nq")), 9
        ).alias("_cos"),
    )
    w = Window.partitionBy("src").orderBy(F.col("_cos").desc(), F.col("dst").asc())
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k)
        .select("src", "dst")
    )


def exact_knn_edges(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(src, dst) — each QUERY node's ``k`` exact nearest neighbors over
    the FULL corpus by brute force, under exactly the ranking contract
    ``knn_graph_ivf`` uses (9dp-rounded cosine, ties -> lower dst), so
    the two edge sets are directly comparable per (src, dst).

    The ground-truth side of ``knn_graph_recall_flags``, served by the
    repo's BLAS path (``cosine_topk_gemm``: one V @ Q.T matmul per
    Arrow batch over the scanned corpus, queries collected driver-side
    — small by contract; float64 promotion + 9dp rounding BEFORE
    ranking make it rank-identical to the expression form AND to the
    oracle's double pipeline). The r12 probe measured the expression-
    tree alternative at 216s / alpha(3->10)=1.33 at the 100x tier —
    13.2M interpreted 64-dim array folds; the fused BLAS kernel is the
    form that scales (same device as ``ann_topk_gemm``, 1.15s there)."""
    from github_etl_pipeline_spark.operators.similarity import cosine_topk_gemm

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    top = cosine_topk_gemm(emb, q, k=k, id_col=id_col, vec_col=vec_col)
    return top.select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )


def recall_sample_mod(n: int, floor: int = 23, target_queries: int = 64) -> int:
    """Adaptive sample stride for the k-NN recall gate:
    ``max(floor, ceil(n / target_queries))`` keeps the sampled query set
    at ~``target_queries`` nodes as the corpus grows, so the exact
    brute-force side (queries x corpus) stays LINEAR in rows — the
    measurement query itself survives scale-up instead of going
    quadratic/23. Mirrored by the oracle's scalar-subquery stride
    (``GREATEST(23, CEIL(COUNT(*)/64.0))``), same integer arithmetic."""
    return max(floor, -(-n // target_queries))


def knn_graph_recall_flags(
    emb: DataFrame,
    sample_mod: int | None = None,
    k: int = 3,
    n_probe: int = 1,
    n_centroids: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(src, dst, found) — per exact k-NN edge of the sampled query nodes
    (``id % sample_mod == 0``), whether the production cell-local IVF
    graph build recovered it. The graph family's measured quality gate,
    the IVF/LSH/PQ recall-floor pattern applied to ``knn_graph_ivf``:
    PageRank and LPA consume the approximate graph, and this is the
    number that says how approximate.

    Exact side = ``exact_knn_edges`` (corpus x broadcast sampled
    queries); ``sample_mod=None`` selects ``recall_sample_mod(n)`` so
    the sample stays ~64 queries at any tier and the exact side stays
    linear in corpus rows. Approx side = the very build the consumers
    run. Raise ``n_probe`` to price the recall/build-cost tradeoff —
    the SCALING probe sweeps {1, 2, 4}."""
    if sample_mod is None:
        sample_mod = recall_sample_mod(emb.count())
    exact = exact_knn_edges(
        emb,
        emb.where(F.col(id_col) % sample_mod == 0),
        k=k,
        id_col=id_col,
        vec_col=vec_col,
    )
    approx = knn_graph_ivf(
        emb, k=k, n_centroids=n_centroids, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col,
    )
    hits = approx.withColumn("_hit", F.lit(1))
    return exact.join(hits, ["src", "dst"], "left").select(
        "src",
        "dst",
        F.coalesce(F.col("_hit"), F.lit(0)).cast("long").alias("found"),
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    n_nodes: int,
    iterations: int = 3,
    damping: float = 0.85,
    id_col: str = "vec_id",
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank: (id, pr) after ``iterations`` rounds of
    ``pr <- round((1-damping)/n + damping * sum(pr(u)/outdeg(u)), 9)``
    over in-edges. Fixed iterations make the whole computation ONE
    deterministic plan (and SQL-unrollable for the oracle); per-round
    9dp rounding absorbs aggregation-order ulps. Nodes with no
    in-edges settle at the teleport mass; out-edge-less nodes leak
    their mass (documented simplification, mirrored by the oracle).

    ``checkpoint_every=j`` truncates lineage with an eager
    ``localCheckpoint`` after every ``j``-th round: the rounds otherwise
    unroll into ONE growing plan (fine at the registered 3 iterations,
    but 10+ rounds compound analysis/codegen cost and lineage depth).
    Values are bit-identical either way — each round's output is
    9dp-rounded BEFORE the checkpoint — pinned by
    tests/test_graph.py::test_pagerank_checkpoint_parity."""
    # Same one-time materialization as lpa_communities: `edges` feeds both
    # the out-degree aggregate and the join below — unpersisted, the first
    # action would run the (expensive) edge-build plan twice.
    edges = edges.persist()
    edges.count()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_odeg"))
    e = edges.join(deg, "src").persist()
    base = float(1.0 - damping) / float(n_nodes)
    r = nodes.select(F.col(id_col), F.lit(1.0 / float(n_nodes)).alias("pr"))
    for i in range(iterations):
        mass = (
            e.join(r, e["src"] == r[id_col])
            .select(F.col("dst"), (F.col("pr") / F.col("_odeg")).alias("_m"))
            .groupBy("dst")
            .agg(F.sum("_m").alias("_mass"))
        )
        r = nodes.join(mass, nodes[id_col] == mass["dst"], "left").select(
            nodes[id_col],
            F.round(
                F.lit(base) + F.lit(float(damping)) * F.coalesce(F.col("_mass"), F.lit(0.0)),
                9,
            ).alias("pr"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            r = r.localCheckpoint(eager=True)
    return r


def lpa_communities(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 3,
    id_col: str = "vec_id",
    checkpoint_every: int | None = None,
) -> DataFrame:
    """(id, community) — fixed-iteration synchronous label propagation
    (Raghavan et al. 2007) over the UNDIRECTED closure of ``edges``:
    every round each node adopts the most frequent label among its
    neighbors plus its own current label (the self-vote keeps isolated
    nodes labeled and damps oscillation), ties -> smallest label.
    Labels start as the node ids, so the fixpoint on a k-NN similarity
    graph is a community id = the minimum member id — the label a
    curation pipeline can group on directly.

    Determinism (the property that makes this oracle-able): votes are
    INTEGER counts and the argmax tie-breaks on the label value, so
    unlike asynchronous LPA there is no update-order dependence — the
    whole computation is one fixed plan, unrollable iteration-by-
    iteration in SQL. Scale shape per round: one edge-scale hash join
    (labels attach to edge endpoints), one edge-scale count aggregate,
    and a per-node argmax that collapses to a WindowGroupLimit partial
    top-1 BEFORE the exchange — nothing ever materializes wider than
    the (node, label, count) relation, and with k-NN edges that is
    <= (k+1) x n rows.

    ``checkpoint_every=j`` truncates lineage with an eager
    ``localCheckpoint`` after every ``j``-th round (see ``pagerank`` —
    labels are integer ids, so parity is exact by construction; pinned
    by tests/test_graph.py::test_lpa_checkpoint_parity)."""
    # Materialize the edge list ONCE before symmetrizing: the union reads
    # `edges` in two branches, and when edges is an unpersisted k-NN graph
    # plan both branches re-run the whole build (within one job the second
    # branch races the cache population, so persist alone is not enough).
    # Measured at the 100x tier: 57.0s -> 27.2s end-to-end.
    edges = edges.persist()
    edges.count()
    bi = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    lab = nodes.select(F.col(id_col), F.col(id_col).alias("community"))
    for i in range(iterations):
        neighbor_votes = bi.join(lab, bi["dst"] == lab[id_col]).select(
            bi["src"].alias("_node"), F.col("community")
        )
        self_votes = lab.select(F.col(id_col).alias("_node"), F.col("community"))
        counts = (
            neighbor_votes.union(self_votes)
            .groupBy("_node", "community")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        w = Window.partitionBy("_node").orderBy(
            F.col("_c").desc(), F.col("community").asc()
        )
        lab = (
            counts.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1)
            .select(F.col("_node").alias(id_col), "community")
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            lab = lab.localCheckpoint(eager=True)
    return lab


def knn_lpa_communities(
    emb: DataFrame,
    k: int = 3,
    iterations: int = 3,
    n_centroids: int | None = None,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_every: int | None = None,
) -> DataFrame:
    """(id, community) — per-vector community labels of the IVF-built
    k-NN similarity graph under fixed-iteration LPA. The composed
    clustering signal: where PageRank ranks individual documents by
    centrality, this partitions the corpus into similarity
    neighborhoods a mix policy can group on (cap giant communities,
    upweight rare ones).

    Graph quality: the default cell-local (n_probe=1) edge build's
    measured agreement with the exact 3-NN graph is the registered
    ``knn_graph_recall_floor`` query — on the random near-orthogonal
    test corpus (worst case) it reads 0.24 at n=500 decaying to 0.04
    at n=200k, with n_probe=4 roughly doubling it (SCALING.md tier
    table and the knn_graph_ivf docstring). Community boundaries near
    cell edges inherit that approximation; measure per-corpus and
    raise ``n_probe`` where it matters.

    No emb.persist() here: ``knn_graph_ivf`` persists the corpus
    internally when it runs Lloyd iterations, and the extra nodes-side
    scan below is a skinny column-pruned read (ADVICE r11)."""
    edges = knn_graph_ivf(
        emb, k=k, n_centroids=n_centroids, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col,
    )
    return lpa_communities(
        edges, emb.select(id_col), iterations=iterations, id_col=id_col,
        checkpoint_every=checkpoint_every,
    )


def pagerank_topk(
    emb: DataFrame,
    topk: int = 20,
    k: int = 3,
    iterations: int = 3,
    damping: float = 0.85,
    n_centroids: int | None = None,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_every: int | None = None,
) -> DataFrame:
    """(pos, id, pr) — the ``topk`` most central vectors of the k-NN
    similarity graph (ties -> lower id). The composed selection signal:
    IVF-built graph + fixed-iteration PageRank + TakeOrderedAndProject.

    Graph quality: the default cell-local (n_probe=1) build's edge
    recall vs the exact 3-NN graph is measured by the registered
    ``knn_graph_recall_floor`` query — 0.24 at n=500 decaying to 0.04
    at n=200k on the worst-case random corpus, ~2x that at n_probe=4
    (SCALING.md tier table and the knn_graph_ivf docstring);
    centrality ranks inherit that approximation — measure per-corpus
    and raise ``n_probe`` where boundary completeness matters more
    than build cost. No emb.persist() here — knn_graph_ivf persists
    internally (ADVICE r11)."""
    edges = knn_graph_ivf(
        emb, k=k, n_centroids=n_centroids, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col,
    )
    nodes = emb.select(id_col)
    n = nodes.count()
    r = pagerank(
        edges, nodes, n, iterations=iterations, damping=damping, id_col=id_col,
        checkpoint_every=checkpoint_every,
    )
    w = Window.orderBy(F.col("pr").desc(), F.col(id_col).asc())
    return (
        r.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= topk)
        .select("pos", id_col, "pr")
    )
