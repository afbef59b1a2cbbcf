#!/usr/bin/env python
"""k-NN graph edge recall on a CLUSTERED corpus — the realistic regime.

The committed knn-graph recall tiers (SCALING.md) measure the cell-local
IVF build on the driver's RANDOM near-orthogonal embeddings — the worst
case for any locality structure: nearest neighbors are barely nearer
than everything else, so probing a shrinking fraction of cells loses
them (measured 0.24 -> 0.04 recall@1 from 500 to 200k rows). Real
embedding corpora are CLUSTERED — near neighbors co-locate — and the
operator docstrings claim recall sits far above the random floor there.
This probe makes that claim a measurement (VERDICT r12 #1, second half):

  * corpus: n/200-cluster Gaussian mixture in 64-dim, unit-norm centers,
    per-dim sigma 0.05 (members at cos ~0.93 to their center, ~2x the
    cross-cluster cosine spread), float32, vec_id round-robin over
    clusters so the adaptive query sample covers every cluster. Seeded,
    regenerated deterministically into the gitignored .regime/ dir.
  * measurement: the registered knn_probe_recall_sweep (ladder 1,2,4,8,
    same ~64-node adaptive sample, same 9dp ranking contract) at the
    same three corpus sizes as the committed random tiers, plus
    knn_probes_for_recall(target=0.9) to report the chosen probe count.

Usage: python tools/knn_regime_probe.py [n ...]   (default 2000 20000 200000)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".regime")
DIM = 64
MEMBERS_PER_CLUSTER = 200
SIGMA = 0.05
SEED = 20260816


def make_clustered(n: int) -> str:
    path = os.path.join(OUT_DIR, f"clustered_{n}")
    fp = os.path.join(path, "embeddings.parquet")
    if os.path.exists(fp):
        return path
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(SEED)
    n_clusters = max(2, n // MEMBERS_PER_CLUSTER)
    centers = rng.standard_normal((n_clusters, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    cluster = np.arange(n) % n_clusters  # round-robin: sample covers all
    vecs = centers[cluster] + SIGMA * rng.standard_normal((n, DIM))
    arr = pa.array(list(vecs.astype(np.float32)), type=pa.list_(pa.float32()))
    pq.write_table(
        pa.table({"vec_id": pa.array(np.arange(n), type=pa.int64()), "embedding": arr}),
        fp,
    )
    return path


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [2000, 20000, 200000]
    la = os.getloadavg()[0]
    print(f"# loadavg {la:.2f}")
    from github_etl_pipeline_spark.operators.graph import (
        knn_probe_recall_sweep,
        knn_probes_for_recall,
    )
    from github_etl_pipeline_spark.session import get_spark, sweep_caches
    from github_etl_pipeline_spark.sources.tables import read_table

    spark = get_spark(app_name="knn-regime-probe")
    print("| n | clusters | recall @1 | @2 | @4 | @8 | sweep s | chosen p@0.9 | its recall |")
    print("|---|---|---|---|---|---|---|---|---|")
    for n in sizes:
        sf_dir = make_clustered(n)
        emb = read_table(spark, sf_dir, "embeddings")
        t0 = time.monotonic()
        rows = {
            r["n_probe"]: r["recall"]
            for r in knn_probe_recall_sweep(emb, probes=(1, 2, 4, 8)).collect()
        }
        dt = time.monotonic() - t0
        sweep_caches(spark)
        kw = knn_probes_for_recall(read_table(spark, sf_dir, "embeddings"), target_recall=0.9)
        sweep_caches(spark)
        print(
            f"| {n:,} | {max(2, n // MEMBERS_PER_CLUSTER)} "
            f"| {rows[1]:.3f} | {rows[2]:.3f} | {rows[4]:.3f} | {rows[8]:.3f} "
            f"| {dt:.1f} | {kw['n_probe']} | {kw['recall']:.3f} |",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
