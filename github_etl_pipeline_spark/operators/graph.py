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


def _ivf_cells(
    emb: DataFrame,
    n: int,
    n_centroids: int,
    lloyd_iterations: int,
    id_col: str,
    vec_col: str,
) -> tuple[DataFrame, list[tuple[int, list[float]]], DataFrame]:
    """(emb, centroids, cells) — the shared deterministic IVF cell build
    every graph operator rides: fan-out repartition, md5-ordered
    centroid sample, Lloyd refinement, persisted full-corpus assignment.
    Factored out so the recall sweep and the edge build reuse ONE
    build (the tuned path would otherwise run k-means twice)."""
    parallelism = emb.sparkSession.sparkContext.defaultParallelism
    if n >= _FAN_OUT_ROWS and emb.rdd.getNumPartitions() < parallelism:
        emb = emb.repartition(parallelism)
    if lloyd_iterations > 0:
        emb = emb.persist()
    centroids = _sample_centroids(emb, id_col, vec_col, n_centroids)
    if lloyd_iterations > 0:
        centroids = _lloyd_refine(emb, vec_col, centroids, lloyd_iterations)
    cells = _assign_cells(emb, centroids, id_col, vec_col).persist()
    return emb, centroids, cells


def knn_graph_ivf(
    emb: DataFrame,
    k: int = 3,
    n_centroids: int | None = None,
    n_probe: int = 1,
    lloyd_iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    recall_target: float | None = None,
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
    scans otherwise run the n x K assignment on one or two cores).

    ``recall_target`` (VERDICT r12 #1 — the graph family's
    ``bands_for_recall`` analogue): measure-then-choose. The build
    first runs the sampled-query probe sweep (``knn_probe_recall_sweep``
    over the SAME centroids/cells, ~64 query nodes, one exact GEMM pass
    + one candidate scan — linear) over a doubling probe ladder capped
    at the cell count, then builds the graph at the SMALLEST n_probe
    whose measured edge recall meets the target. Because the ladder
    tops out at probing EVERY cell (= exact k-NN), the target is always
    reachable — the cost is the n x n_probe x cell_size candidate
    volume, priced per-corpus by the sweep itself instead of guessed
    (on random near-orthogonal corpora restoring 0.9 recall at 100x
    means probing most cells; on clustered corpora — the realistic
    regime, see SCALING.md's clustered tier — a handful of probes
    suffices). Explicit ``n_probe`` is ignored when set."""
    n = emb.count()
    if n_centroids is None:
        n_centroids = cells_for_corpus(n)
    emb, centroids, cells = _ivf_cells(
        emb, n, n_centroids, lloyd_iterations, id_col, vec_col
    )
    if recall_target is not None:
        kw = knn_probes_for_recall(
            emb,
            target_recall=recall_target,
            k=k,
            n_centroids=n_centroids,
            id_col=id_col,
            vec_col=vec_col,
            _prebuilt=(centroids, cells),
        )
        n_probe = kw["n_probe"]
    # Candidate scoring runs as a per-cell GEMM (r13 optimization): the
    # previous form joined cells to the probe side on cell and evaluated
    # one expression-tree dot per candidate pair, then window-sorted the
    # FULL candidate relation by src (n x n_probe x cell_size rows, two
    # exchanges + a sort at candidate scale) — the exact shape the r12
    # exact_knn_edges probe measured at 216s/alpha 1.33 at the 100x tier
    # before its GEMM rewrite. Here each cell's members arrive as ONE
    # Arrow group (a single exchange on cell, 3 narrow columns), the
    # within-cell cosine matrix is one BLAS matmul (row-chunked to bound
    # memory on a skewed cell), and per-row top-k comes out of the same
    # total order the expression form used: float64 promotion, 9dp
    # rounding BEFORE ranking, ties -> lower dst (the cosine_topk_gemm
    # determinism contract — the group is pre-sorted by id so a stable
    # argsort breaks rounded ties by ascending dst). Self-pairs are
    # dropped AFTER ranking k+1 (ids are unique per group, so removing
    # the self row from a sorted prefix of k+1 leaves exactly the
    # self-excluded top-k).
    # ADVICE r13: derive the edge schema from the id column's actual
    # type (the kcenter_coreset device) instead of hardcoding bigint —
    # a string/int32-id corpus must not fail with a schema mismatch
    id_t = emb.schema[id_col].dataType.simpleString()

    if n_probe == 1:
        # cell-local: the assignment IS the (single) probe; every src's
        # whole candidate set lives in its own group, so the per-cell
        # top-k is final — no global re-rank pass at all
        def cell_topk(pdf):
            import numpy as np
            import pandas as pd

            if len(pdf) < 2:
                return pd.DataFrame({"src": pd.Series([], dtype="object"),
                                     "dst": pd.Series([], dtype="object")})
            pdf = pdf.sort_values(id_col, kind="mergesort")
            ids = pdf[id_col].to_numpy()
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            nm = np.sqrt((M * M).sum(axis=1))
            # zero-norm guard (ADVICE r13): 0/0 cosines would rank as
            # NaN; force the degenerate norm to 1.0 so zero vectors
            # score 0.0 deterministically — the same rule
            # _nearest_cells_udf / _lloyd_refine apply
            nm[nm == 0] = 1.0
            kk = min(k + 1, len(ids))
            srcs, dsts = [], []
            for lo in range(0, len(M), 256):
                Mc, nc = M[lo : lo + 256], nm[lo : lo + 256]
                S = np.round((Mc @ M.T) / (nc[:, None] * nm[None, :]), 9)
                idx = np.argsort(-S, axis=1, kind="stable")[:, :kk]
                for i in range(len(Mc)):
                    sid = ids[lo + i]
                    nbrs = ids[idx[i]]
                    nbrs = nbrs[nbrs != sid][:k]
                    srcs.extend([sid] * len(nbrs))
                    dsts.extend(nbrs.tolist())
            return pd.DataFrame({"src": srcs, "dst": dsts})

        return (
            cells.select(F.col("cell"), F.col(id_col), F.col(vec_col))
            .groupBy("cell")
            .applyInPandas(cell_topk, f"src {id_t}, dst {id_t}")
        )

    # multi-probe: corpus members and probing queries cogroup per cell;
    # each (src, cell) emits a LOCAL top-k under the shared total order,
    # and the global per-src top-k re-ranks only n x n_probe x k rows
    assign_probe = _nearest_cells_udf(centroids, n_probe)
    qside = emb.select(
        F.col(id_col).alias("src"),
        F.col(vec_col).alias("_qv"),
        F.explode(assign_probe(F.col(vec_col))).alias("cell"),
    )
    corp = cells.select(F.col("cell"), F.col(id_col), F.col(vec_col))

    def cell_topk_q(left, right):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "src": pd.Series([], dtype="object"),
                "dst": pd.Series([], dtype="object"),
                "_cos": pd.Series([], dtype="float64"),
            }
        )
        if not len(left) or not len(right):
            return empty
        left = left.sort_values(id_col, kind="mergesort")
        ids = left[id_col].to_numpy()
        M = np.stack(left[vec_col].to_numpy()).astype(np.float64)
        nm = np.sqrt((M * M).sum(axis=1))
        # zero-norm guard (ADVICE r13) — see cell_topk
        nm[nm == 0] = 1.0
        qids = right["src"].to_numpy()
        kk = min(k + 1, len(ids))
        srcs, dsts, sims = [], [], []
        for lo in range(0, len(right), 256):
            Q = np.stack(right["_qv"].to_numpy()[lo : lo + 256]).astype(np.float64)
            qn = np.sqrt((Q * Q).sum(axis=1))
            qn[qn == 0] = 1.0
            S = np.round((Q @ M.T) / (qn[:, None] * nm[None, :]), 9)
            idx = np.argsort(-S, axis=1, kind="stable")[:, :kk]
            for i in range(len(Q)):
                sid = qids[lo + i]
                sel = idx[i][ids[idx[i]] != sid][:k]
                srcs.extend([sid] * len(sel))
                dsts.extend(ids[sel].tolist())
                sims.extend(S[i][sel].tolist())
        return pd.DataFrame({"src": srcs, "dst": dsts, "_cos": sims})

    local = (
        corp.groupBy("cell")
        .cogroup(qside.groupBy("cell"))
        .applyInPandas(cell_topk_q, f"src {id_t}, dst {id_t}, _cos double")
    )
    w = Window.partitionBy("src").orderBy(F.col("_cos").desc(), F.col("dst").asc())
    return (
        local.withColumn("_r", F.row_number().over(w))
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


_PROBE_LADDER = (1, 2, 4, 8)


def knn_probe_recall_sweep(
    emb: DataFrame,
    probes: tuple[int, ...] = _PROBE_LADDER,
    k: int = 3,
    target_recall: float = 0.5,
    sample_mod: int | None = None,
    n_centroids: int | None = None,
    lloyd_iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    _prebuilt: tuple | None = None,
) -> DataFrame:
    """(n_probe, n_exact, n_found, recall, chosen, capped) — the k-NN
    graph's recall/cost ladder, measured: for each probe count in
    ``probes``, how many of the sampled query nodes' exact ``k``-NN
    edges the IVF graph build at that n_probe recovers. ``chosen`` = 1
    on the SMALLEST rung meeting ``target_recall`` (the n_probe a
    recall-targeted build uses); when no rung meets it, chosen falls on
    the last rung and ``capped`` = 1 on every row — the cap is data,
    never silent (the ``minhash_bands_for_recall`` contract, applied to
    a quantity with no closed form: cell-local recall is a property of
    the CORPUS GEOMETRY, so the lever measures instead of solving).

    Cost shape: ONE shared deterministic k-means build + full-corpus
    cell assignment (the same plan the graph build itself runs), one
    exact GEMM pass (corpus x ~64 broadcast sampled queries — linear),
    and ONE candidate scan at max(probes) whose rows carry the rank of
    the probed cell they came from — each rung is then a WindowGroupLimit
    re-rank of the SAME persisted ~(64 x p_max x cell_size)-row
    candidate relation, so sweeping 4 rungs costs barely more than
    measuring one. All rungs share the ranking contract of
    ``knn_graph_ivf`` (9dp-rounded cosine, ties -> lower id), so rung p
    equals the full build at n_probe=p restricted to the sampled srcs.

    Ulp caveat (ADVICE r13): this sweep scores candidates with the JVM
    expression fold while the build scores with BLAS + scaled-rint; the
    rung-p == build-at-p identity relies on the shared 9dp rounding
    absorbing the fold-vs-BLAS summation ulps (~1e-15 at unit norms,
    ~1e7x inside the 1e-9 grid). Only a cosine landing EXACTLY on a
    rounding boundary could diverge — never observed on real-magnitude
    data, and tests/test_determinism_contract.py pins the shared
    contract — but a tuner calibrated at such a boundary would be
    calibrated against a ranking the build does not produce."""
    from pyspark import StorageLevel

    probes = tuple(sorted(set(int(p) for p in probes)))
    if not probes or probes[0] < 1:
        raise ValueError(f"knn_probe_recall_sweep: bad probe ladder {probes}")
    n = emb.count()
    if n_centroids is None:
        n_centroids = cells_for_corpus(n)
    probes = tuple(min(p, n_centroids) for p in probes)
    probes = tuple(sorted(set(probes)))
    if sample_mod is None:
        sample_mod = recall_sample_mod(n)
    if _prebuilt is not None:
        centroids, cells = _prebuilt
    else:
        emb, centroids, cells = _ivf_cells(
            emb, n, n_centroids, lloyd_iterations, id_col, vec_col
        )
    q = emb.where(F.col(id_col) % sample_mod == 0)
    exact = exact_knn_edges(emb, q, k=k, id_col=id_col, vec_col=vec_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    p_max = max(probes)
    assign_probe = _nearest_cells_udf(centroids, p_max)
    qp = q.select(
        F.col(id_col).alias("src"),
        F.col(vec_col).alias("_qv"),
        norm_expr(F.col(vec_col)).alias("_nq"),
        F.posexplode(assign_probe(F.col(vec_col))).alias("_pos", "cell"),
    ).select("src", "_qv", "_nq", "cell", (F.col("_pos") + 1).alias("cell_rank"))
    cand = (
        cells.join(qp, "cell")
        .where(F.col(id_col) != F.col("src"))
        .select(
            "src",
            F.col(id_col).alias("dst"),
            F.round(
                dot_expr(F.col(vec_col), F.col("_qv")) / (F.col("_ne") * F.col("_nq")),
                9,
            ).alias("_cos"),
            "cell_rank",
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    w = Window.partitionBy("src").orderBy(F.col("_cos").desc(), F.col("dst").asc())
    rungs = None
    for p in probes:
        edges_p = (
            cand.where(F.col("cell_rank") <= p)
            .withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= k)
            .select(F.lit(p).cast("long").alias("n_probe"), "src", "dst")
        )
        rungs = edges_p if rungs is None else rungs.unionAll(edges_p)
    found = rungs.join(exact, ["src", "dst"]).groupBy("n_probe").agg(
        F.count(F.lit(1)).alias("_nf")
    )
    spark = emb.sparkSession
    ladder = spark.createDataFrame([(int(p),) for p in probes], "n_probe long")
    n_exact_df = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    rows = (
        ladder.join(found, "n_probe", "left")
        .crossJoin(F.broadcast(n_exact_df))
        .select(
            "n_probe",
            F.col("n_exact").cast("long").alias("n_exact"),
            F.coalesce("_nf", F.lit(0)).cast("long").alias("n_found"),
            F.round(
                F.coalesce("_nf", F.lit(0)).cast("double") / F.col("n_exact"), 6
            ).alias("recall"),
        )
    )
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    best = F.min(
        F.when(F.col("recall") >= target_recall, F.col("n_probe"))
    ).over(w_all)
    maxp = F.max("n_probe").over(w_all)
    return rows.select(
        "n_probe",
        "n_exact",
        "n_found",
        "recall",
        F.when(
            best.isNotNull(), (F.col("n_probe") == best).cast("long")
        )
        .otherwise((F.col("n_probe") == maxp).cast("long"))
        .alias("chosen"),
        best.isNull().cast("long").alias("capped"),
    )


def knn_probes_for_recall(
    emb: DataFrame,
    target_recall: float = 0.7,
    k: int = 3,
    probes: tuple[int, ...] | None = None,
    sample_mod: int | None = None,
    n_centroids: int | None = None,
    lloyd_iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    _prebuilt: tuple | None = None,
) -> dict:
    """Measured probe count for a target k-NN edge recall — the graph
    family's ``bands_for_recall`` analogue (VERDICT r12 #1). Runs
    ``knn_probe_recall_sweep`` over a doubling ladder 1,2,4,... capped
    at the cell count (probing EVERY cell = exact k-NN, so recall 1.0
    is always on the ladder and the target is always reachable) and
    returns the smallest rung whose SAMPLE-MEASURED edge recall meets
    the target: ``{'n_probe', 'recall', 'capped', 'sweep'}`` — kwargs-
    compatible with ``knn_graph_ivf(n_probe=...)``; ``capped`` is
    always False with the default full ladder (kept for contract parity
    with the banding helpers; a truncated explicit ``probes`` ladder
    can cap). ``sweep`` maps every measured rung to its recall so the
    caller sees the whole cost/recall curve, not one point.

    The measurement is ~64 sampled query nodes (``recall_sample_mod``),
    so the returned recall is a sample estimate of the full build's
    edge recall (binomial s.e. ~ sqrt(r(1-r)/(64*k)) ~ 0.035 at r=0.5);
    the measured number generalizes because every node's probed-cell
    neighborhood is drawn from the same corpus geometry."""
    n = emb.count()
    if n_centroids is None:
        n_centroids = cells_for_corpus(n)
    if probes is None:
        ladder = []
        p = 1
        while p < n_centroids:
            ladder.append(p)
            p *= 2
        ladder.append(n_centroids)
        probes = tuple(ladder)
    sweep = knn_probe_recall_sweep(
        emb,
        probes=probes,
        k=k,
        target_recall=target_recall,
        sample_mod=sample_mod,
        n_centroids=n_centroids,
        lloyd_iterations=lloyd_iterations,
        id_col=id_col,
        vec_col=vec_col,
        _prebuilt=_prebuilt,
    ).collect()
    chosen = next(r for r in sweep if r["chosen"] == 1)
    return {
        "n_probe": int(chosen["n_probe"]),
        "recall": float(chosen["recall"]),
        "capped": bool(chosen["capped"]),
        "sweep": {int(r["n_probe"]): float(r["recall"]) for r in sweep},
    }


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
    recall_target: float | None = None,
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

    ``recall_target`` forwards to ``knn_graph_ivf``'s measured probe
    tuner (VERDICT r12 #1): the edge build first sweeps the probe
    ladder on ~64 sampled nodes and builds at the smallest n_probe
    whose measured edge recall meets the target — community boundaries
    then inherit a KNOWN floor instead of the unpriced cell-local one.

    No emb.persist() here: ``knn_graph_ivf`` persists the corpus
    internally when it runs Lloyd iterations, and the extra nodes-side
    scan below is a skinny column-pruned read (ADVICE r11)."""
    edges = knn_graph_ivf(
        emb, k=k, n_centroids=n_centroids, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col, recall_target=recall_target,
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
    recall_target: float | None = None,
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
    than build cost, or pass ``recall_target`` (VERDICT r12 #1) to
    have the edge build MEASURE the probe ladder on sampled nodes and
    choose the smallest n_probe meeting the target itself. No
    emb.persist() here — knn_graph_ivf persists internally (ADVICE
    r11)."""
    edges = knn_graph_ivf(
        emb, k=k, n_centroids=n_centroids, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col, recall_target=recall_target,
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


# ---------------------------------------------------------------------------
# Triangle counting / clustering coefficients — the graph-structure
# quality signal for the k-NN similarity graph. MEASURED regime
# separation (r13, n=1000 d=64, k=3): over the EXACT k-NN graph
# (exact_knn_edges), avg local cc reads 0.144 on 10 tight Gaussian
# clusters vs 0.025 on uniform-random vectors — a 5.7x contrast, the
# regime detector for whether cell-local recall can hold. Over the
# IVF cell-local build the same corpora read 0.17 vs 0.11: intra-cell
# edges close wedges by construction, INFLATING random-regime
# transitivity and compressing the contrast. So: detect the regime on
# the exact graph of a sample (cheap via the GEMM path), and profile
# the consumed approximate graph with the same summary to see what
# PageRank/LPA actually operate on.
# ---------------------------------------------------------------------------
def symmetrize_undirected(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Directed (src, dst) -> distinct undirected (a, b) with a < b.
    One shuffle (the distinct); self-loops dropped."""
    s, d = F.col(src_col), F.col(dst_col)
    return (
        edges.filter(s != d)
        .select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .distinct()
    )


def _degrees(und: DataFrame) -> DataFrame:
    return (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )


def triangle_nodes(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Exact per-node triangle participation over the undirected graph:
    (node, d, triangles, local_cc) for every node with >= 1 edge;
    local_cc = 2*t / (d*(d-1)) rounded 9dp (0.0 where d < 2).

    DEGREE-ORDERED orientation (not id-ordered): every undirected edge
    points from its (degree, id)-smaller endpoint, so each node's
    out-degree is bounded by O(sqrt(m)) (the arboricity argument behind
    the classic MR triangle algorithm) and the wedge self-join emits
    sum C(outdeg, 2) <= O(m^1.5) rows TOTAL — independent of hub
    in-degree. This matters precisely for k-NN graphs: out-degree is k
    by construction but a hub vector appears in MANY nodes' top-k, so
    undirected degree is unbounded and id-ordering would hand the
    whole C(hub_deg, 2) wedge blowup to whichever hub has a low id.

    Plan: symmetrize (1 shuffle) -> two degree-attach joins -> oriented
    wedge self-join on the shared LOW endpoint (1 shuffle on u) ->
    closing-edge semi-join against the undirected relation (1 shuffle)
    -> explode each triangle to its 3 members -> count per node. Every
    relation after the wedge join is bounded by the m^1.5 envelope.
    """
    und = symmetrize_undirected(edges, src_col, dst_col).persist()
    # deg is referenced three times (two orientation joins + the final
    # rollup) and oe twice (both wedge sides): persist both, or every
    # reference re-derives its whole lineage at runtime — the exchange
    # audit read 54 for the registered query before these persists,
    # 15 after (PLANS.md)
    deg = _degrees(und).persist()
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("_da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("_db"))
    e = und.join(da, "a").join(db, "b")
    a_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    oe = e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("_db")).otherwise(F.col("_da")).alias("dv"),
    ).persist()
    e1 = oe.select("u", F.col("v").alias("v1"), F.col("dv").alias("d1"))
    e2 = oe.select("u", F.col("v").alias("v2"), F.col("dv").alias("d2"))
    wedge = e1.join(e2, "u").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    closing = und.select(F.col("a").alias("_ca"), F.col("b").alias("_cb"))
    tri = wedge.join(
        closing,
        (F.least("v1", "v2") == F.col("_ca"))
        & (F.greatest("v1", "v2") == F.col("_cb")),
        "leftsemi",
    )
    tn = (
        tri.select(F.explode(F.array("u", "v1", "v2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    out = deg.join(tn, "node", "left").select(
        "node",
        "d",
        F.coalesce("triangles", F.lit(0)).alias("triangles"),
        F.when(F.col("d") < 2, F.lit(0.0))
        .otherwise(
            F.round(
                F.lit(2.0)
                * F.coalesce("triangles", F.lit(0)).cast("double")
                / (F.col("d") * (F.col("d") - F.lit(1))).cast("double"),
                9,
            )
        )
        .alias("local_cc"),
    )
    return out


def triangle_summary(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """ONE-row graph-structure report over the undirected graph:
    (n_nodes, n_edges, n_wedges, n_triangles, global_cc, avg_local_cc).

    global_cc = 3*triangles / wedges (wedges = sum C(d,2), the closed-
    wedge fraction); avg_local_cc = mean of the 9dp per-node local
    coefficients, summed through DECIMAL(18,9) so the mean is order-
    independent and engine-identical (each term <= 1, so the decimal
    holds 1e9 nodes with headroom). n_nodes counts nodes with >= 1
    edge. Built on :func:`triangle_nodes` (same bounded-wedge plan) +
    one extra global aggregate."""
    nodes = triangle_nodes(edges, src_col, dst_col)
    # stage 1: exact BIGINT / DECIMAL aggregates only (no double sums)
    agg = nodes.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("d").alias("_sum_d"),
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges"),
        F.sum("triangles").alias("_tri3"),  # 3x (each triangle at 3 members)
        F.sum(F.col("local_cc").cast("decimal(18,9)")).alias("_sum_cc"),
    )
    # stage 2: derived doubles from the single exact row
    n_tri = F.expr("_tri3 div 3")
    return agg.select(
        "n_nodes",
        F.expr("_sum_d div 2").alias("n_edges"),
        "n_wedges",
        n_tri.alias("n_triangles"),
        F.round(
            F.when(F.col("n_wedges") == 0, F.lit(0.0)).otherwise(
                F.lit(3.0)
                * n_tri.cast("double")
                / F.col("n_wedges").cast("double")
            ),
            6,
        ).alias("global_cc"),
        F.round(
            F.col("_sum_cc").cast("double") / F.col("n_nodes").cast("double"), 6
        ).alias("avg_local_cc"),
    )
