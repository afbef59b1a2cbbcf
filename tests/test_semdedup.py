"""SemDeDup (cluster-then-cosine semantic dedup): within-cell-only
compares, keep-min-id semantics on exact-duplicate groups, and the
persisted-cells plan shape. The cell assignment itself is pinned by
tests/test_ivf_index.py (the one shared ``_assign_cells`` path)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators.similarity import semdedup
from github_etl_pipeline_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"
THRESHOLD = 0.45


@pytest.fixture(scope="module")
def corpus(spark):
    """sf0.001 embeddings + one exact duplicate of vec_id 0 under a high
    id — a guaranteed same-cell cosine-1.0 positive."""
    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    dup = emb.where(F.col("vec_id") == 0).select(
        F.lit(999_999_999).cast("long").alias("vec_id"), "embedding"
    )
    return emb.unionAll(dup)


@pytest.fixture(scope="module")
def flags(spark, corpus):
    out = semdedup(corpus, threshold=THRESHOLD, n_centroids=8)
    rows = {r["vec_id"]: (r["cell"], r["is_dup"]) for r in out.collect()}
    return out, rows


def test_one_row_per_vector(corpus, flags):
    _, rows = flags
    assert len(rows) == corpus.count()


def test_exact_duplicate_flagged_min_id_kept(flags):
    _, rows = flags
    # identical vectors assign to the identical cell (same rounded
    # cosines, same stable argmax), so the seeded copy must be caught
    assert rows[999_999_999][0] == rows[0][0]
    assert rows[999_999_999][1] == 1  # higher id of the exact group -> removed
    assert rows[0][1] == 0  # minimum id of the exact group -> kept


def test_flags_match_brute_force_within_cells(corpus, flags):
    """Independent math: given the operator's own cell assignment,
    re-derive the flag set with numpy pairwise cosines (9dp-rounded,
    within-cell only) and require an exact match — pins both the
    threshold rule and that NO cross-cell pair ever contributes."""
    _, rows = flags
    vecs = {
        r["vec_id"]: np.asarray([float(x) for x in r["embedding"]])
        for r in corpus.collect()
    }
    by_cell: dict[int, list[int]] = {}
    for vid, (cell, _) in rows.items():
        by_cell.setdefault(cell, []).append(vid)
    expected_dups = set()
    for members in by_cell.values():
        members.sort()
        for j, b in enumerate(members):
            vb = vecs[b]
            nb = np.linalg.norm(vb)
            for a in members[:j]:
                va = vecs[a]
                cos = round(float(va @ vb) / (np.linalg.norm(va) * nb), 9)
                if cos >= THRESHOLD:
                    expected_dups.add(b)
                    break
    actual_dups = {vid for vid, (_, d) in rows.items() if d == 1}
    assert actual_dups == expected_dups
    assert expected_dups  # non-vacuous: the seeded exact dup at minimum


def test_plan_persists_cells_and_avoids_cartesian(flags):
    out, _ = flags
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the assigned-cells relation is persisted and feeds both join sides
    # + the final flag projection — the within-cell self-join must read
    # the cache, not recompute the assignment UDF three times
    assert "InMemoryTableScan" in plan


def test_cells_for_corpus_parity_with_oracle_formula():
    """The adaptive cell count must be bit-identical between
    similarity.cells_for_corpus and the oracle's
    GREATEST(16, CEIL(n / 64.0)) — swept over sizes spanning the driver
    tier through the 100x probe tier and beyond."""
    import duckdb

    from github_etl_pipeline_spark.operators.similarity import cells_for_corpus

    con = duckdb.connect()
    for n in [1, 15, 16, 63, 64, 65, 506, 1024, 1025, 5050, 20_200,
              202_000, 2_020_000, 123_456_789]:
        sql = con.execute(
            f"SELECT GREATEST(16, CAST(CEIL({n} / 64.0) AS BIGINT))"
        ).fetchone()[0]
        assert cells_for_corpus(n) == sql, n


def test_auto_cell_count_used_when_unset(spark, corpus):
    """Default n_centroids=None derives the cell count from the corpus:
    at this size the floor (16) applies, so cells stay within 0..15."""
    out = semdedup(corpus, threshold=THRESHOLD)
    cells = {r["cell"] for r in out.select("cell").distinct().collect()}
    assert cells <= set(range(16))


def test_threshold_one_keeps_only_exact_groups(spark, corpus):
    """At threshold 1.0 only the seeded exact duplicate is removable."""
    out = semdedup(corpus, threshold=1.0, n_centroids=8)
    dups = {r["vec_id"] for r in out.where(F.col("is_dup") == 1).collect()}
    assert dups == {999_999_999}
