"""Continuous dedup ingest loop (streaming/dedup_ingest.py): delta
span-marking against the historical gram index, text cleaning, per-batch
shards, and the crash-safe index advance — across restarts."""

from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators.curation import _pos_gram_hashes
from github_etl_pipeline_spark.streaming.dedup_ingest import (
    read_clean_shards,
    run_dedup_ingest,
)

K = 3


def _feed(spark, srcdir, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(str(srcdir))


def _run(spark, srcdir, out, idx, ckpt):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("recursiveFileLookup", "true")
        .parquet(str(srcdir))
    )
    q = run_dedup_ingest(spark, stream, out, idx, ckpt, k=K, min_count=2)
    q.awaitTermination()


def _index_counts(spark, idx):
    return {
        r.gh: r.cnt
        for r in spark.read.parquet(str(idx)).groupBy("gh").agg(
            F.sum("cnt").alias("cnt")
        ).collect()
    }


def _expected_gram_counts(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = (
        _pos_gram_hashes(docs, "text", "doc_id", K)
        .groupBy("_gh")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    return {r._gh: r.cnt for r in rows}


def test_ingest_loop_end_to_end(spark, tmp_path):
    src, out, idx, ckpt = (
        tmp_path / "src",
        tmp_path / "clean",
        tmp_path / "gram_idx",
        tmp_path / "ckpt",
    )

    # ---- batch 1: a within-delta duplicated phrase + a unique doc ----
    _feed(spark, src, [
        (1, "q w e r one two three"),
        (2, "q w e r four five six"),
        (3, "hello world peace now forever"),
    ])
    _run(spark, src, out, idx, ckpt)

    shards = {r.doc_id: r for r in read_clean_shards(spark, out).collect()}
    # 'q w e r' (4 tokens, every 3-gram count 2) is removed from BOTH
    assert shards[1].clean_text == "one two three"
    assert shards[2].clean_text == "four five six"
    assert shards[1].n_removed == 4 and shards[2].n_removed == 4
    assert shards[3].clean_text == "hello world peace now forever"
    # index holds exactly the CLEANED texts' gram counts
    assert _index_counts(spark, idx) == _expected_gram_counts(
        spark,
        ["one two three", "four five six", "hello world peace now forever"],
    )

    # ---- batch 2: cross-BATCH duplication against history ----
    _feed(spark, src, [
        (10, "hello world peace again today"),
        (11, "totally fresh sentence here"),
    ])
    _run(spark, src, out, idx, ckpt)

    shards = {r.doc_id: r for r in read_clean_shards(spark, out).collect()}
    assert set(shards) == {1, 2, 3, 10, 11}
    # 'hello world peace' exists once in history -> delta occurrence is
    # the 2nd -> marked and removed from the DELTA (history untouched)
    assert shards[10].clean_text == "again today"
    assert shards[10].n_removed == 3
    assert shards[11].clean_text == "totally fresh sentence here"
    assert shards[3].clean_text == "hello world peace now forever"
    # index advanced by the cleaned delta
    assert _index_counts(spark, idx) == _expected_gram_counts(
        spark,
        [
            "one two three",
            "four five six",
            "hello world peace now forever",
            "again today",
            "totally fresh sentence here",
        ],
    )

    # ---- restart with no new data: nothing changes ----
    before = _index_counts(spark, idx)
    n_before = read_clean_shards(spark, out).count()
    _run(spark, src, out, idx, ckpt)
    assert _index_counts(spark, idx) == before
    assert read_clean_shards(spark, out).count() == n_before


def test_ingest_recovers_crashed_promote(spark, tmp_path):
    """Crash between the two index renames (._old holds the only copy)
    self-heals on the next batch."""
    import shutil

    src, out, idx, ckpt = (
        tmp_path / "src",
        tmp_path / "clean",
        tmp_path / "gram_idx",
        tmp_path / "ckpt",
    )
    _feed(spark, src, [(1, "alpha beta gamma delta")])
    _run(spark, src, out, idx, ckpt)
    healthy = _index_counts(spark, idx)

    # simulate the crash state
    idx.rename(idx.with_name(idx.name + "._old"))
    shutil.copytree(
        idx.with_name(idx.name + "._old"), idx.with_name(idx.name + "._staging")
    )

    _feed(spark, src, [(2, "epsilon zeta eta theta")])
    _run(spark, src, out, idx, ckpt)
    got = _index_counts(spark, idx)
    exp = _expected_gram_counts(
        spark, ["alpha beta gamma delta", "epsilon zeta eta theta"]
    )
    assert got == exp and set(healthy) <= set(got)
    assert not idx.with_name(idx.name + "._old").exists()
    assert not idx.with_name(idx.name + "._staging").exists()


def test_ingest_batch_releases_only_its_own_caches(spark, tmp_path):
    """ADVICE r10 (low): the batch body must release exactly the two
    relations it persists — a CALLER-owned cached relation in the same
    session (e.g. a persisted static dim) must still be cached after
    the ingest runs, and the batch's own relations must not leak."""
    caller_dim = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    ).persist()
    caller_dim.count()  # materialize
    assert caller_dim.storageLevel.useMemory

    srcdir = tmp_path / "src"
    _feed(spark, srcdir, [(1, "w1 w2 w3 w4"), (2, "w1 w2 w3 w4")])
    _run(spark, srcdir, tmp_path / "out", tmp_path / "idx", tmp_path / "ckpt")

    # caller-owned cache survived the batch (the r9 session-wide sweep
    # would have cleared it, forcing a recompute every micro-batch)
    assert caller_dim.storageLevel.useMemory
    # and the batch-owned persists were released (no leaked RDD storage
    # beyond the caller's one cached relation)
    jsc = spark.sparkContext._jsc
    assert len(jsc.getPersistentRDDs()) == 1
    caller_dim.unpersist()
