"""Incremental dedup against a persisted MinHash index
(operators/dedup.py::build_minhash_index / dedup_against_index): the
daily-delta ingest loop must catch duplicates of ALREADY-INDEXED docs
without rereading the historical corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators.dedup import (
    build_minhash_index,
    dedup_against_index,
)
from github_etl_pipeline_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def test_delta_dedup_catches_indexed_duplicates(spark, tmp_path):
    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    historical = docs.where(F.col("doc_id") % 2 == 0)
    idx = tmp_path / "minhash_index"
    build_minhash_index(historical, idx)

    # delta: the odd docs (mostly novel) + exact copies of two indexed
    # docs under new ids
    copies = (
        historical.limit(2)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    delta = docs.where(F.col("doc_id") % 2 == 1).unionByName(copies)

    matches = dedup_against_index(spark, delta, idx).collect()
    matched_new = {r.new_id for r in matches}
    copy_ids = {r.doc_id for r in copies.collect()}
    # every exact copy matches its indexed original at est_jaccard 1.0
    # (the corpus contains exact-dup texts, so a copy may ALSO match other
    # originals — its own source must be among the 1.0 matches)
    assert copy_ids <= matched_new
    by_new: dict[int, dict[int, float]] = {}
    for r in matches:
        by_new.setdefault(r.new_id, {})[r.index_id] = r.est_jaccard
    for cid in copy_ids:
        assert by_new[cid].get(cid - 1_000_000) == 1.0, by_new[cid]

    # ingest loop step 2: append the deduped survivors and re-check —
    # a re-sent survivor must now be caught by the grown index
    survivors = delta.join(
        spark.createDataFrame([(i,) for i in matched_new], "doc_id long"),
        "doc_id",
        "left_anti",
    )
    build_minhash_index(survivors, idx, mode="append")
    # a re-sent survivor arrives under a NEW id (the real-world re-crawl
    # case: same content, different key) — the grown index must catch it
    resent_shifted = survivors.limit(3).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    )
    again = dedup_against_index(spark, resent_shifted, idx).collect()
    got_new = {r.new_id for r in again}
    assert {r.doc_id for r in resent_shifted.collect()} <= got_new
