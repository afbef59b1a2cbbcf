"""Incremental materialized rollup (streaming/rollup.py): the stream-
maintained hourly aggregate must equal the batch aggregate over the same
data, across multiple micro-batches and a query restart."""

from __future__ import annotations

import shutil

import pandas as pd
from pyspark.sql import functions as F

from github_etl_pipeline_spark.streaming.rollup import (
    hourly_partial,
    maintain_hourly_rollup,
    read_rollup,
)
from github_etl_pipeline_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def test_incremental_rollup_matches_batch(spark, tmp_path):
    """Drain the events parquet as a stream (two runs — the second sees a
    newly arrived file) and compare the maintained store against the
    one-shot batch rollup of everything."""
    src = tmp_path / "stream_src"
    src.mkdir()
    store = tmp_path / "rollup_store"
    ck = tmp_path / "ck"

    batch_events = read_table(spark, SF, "events")
    half = batch_events.limit(500).toPandas()  # deterministic file split
    rest = batch_events.toPandas().iloc[500:]
    # pandas defaults to ns-precision -> parquet TIMESTAMP(NANOS), which
    # the session's nanosAsLong conf surfaces as INT64; keep the driver
    # testdata's micros physical type
    for pdf in (half, rest):
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")

    half.to_parquet(src / "a.parquet")
    stream = spark.readStream.schema(batch_events.schema).parquet(str(src))
    q = maintain_hourly_rollup(spark, stream, store, ck)
    q.awaitTermination()

    # second arrival -> restart drains ONLY the new file (checkpoint)
    rest.to_parquet(src / "b.parquet")
    stream2 = spark.readStream.schema(batch_events.schema).parquet(str(src))
    q2 = maintain_hourly_rollup(spark, stream2, store, ck)
    q2.awaitTermination()

    got = {
        r.hour_bucket: (r.n, round(r.total_value, 2))
        for r in read_rollup(spark, store).collect()
    }
    full = spark.createDataFrame(pd.concat([half, rest]), batch_events.schema)
    want = {
        r.hour_bucket: (r.n, round(float(r.v), 2))
        for r in hourly_partial(full).collect()
    }
    assert got == want
    # derived average agrees with total/n
    for r in read_rollup(spark, store).collect():
        assert abs(r.avg_value - r.total_value / r.n) < 1e-9


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: simulate a replay by wiping the
    checkpoint (the same file re-arrives as epoch 0 again) — the store's
    _last_batch high-water must skip it, keeping totals un-doubled."""
    src = tmp_path / "replay_src"
    src.mkdir()
    store = tmp_path / "replay_store"
    ck = tmp_path / "replay_ck"

    batch_events = read_table(spark, SF, "events")
    pdf = batch_events.limit(300).toPandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(src / "a.parquet")

    def drain():
        stream = spark.readStream.schema(batch_events.schema).parquet(str(src))
        q = maintain_hourly_rollup(spark, stream, store, ck)
        q.awaitTermination()

    drain()
    first = {r.hour_bucket: r.n for r in read_rollup(spark, store).collect()}
    assert (store / "_last_batch").read_text() == "0"

    shutil.rmtree(ck)  # lost checkpoint -> the batch replays as epoch 0
    drain()
    again = {r.hour_bucket: r.n for r in read_rollup(spark, store).collect()}
    assert again == first, "replayed epoch must not double-count"


def test_crash_between_rename_aside_and_promote_recovers(spark, tmp_path):
    """Simulate the worst crash window of the three-rename swap: the live
    store was renamed aside to ._old but the staging dir was never
    promoted. The next sink invocation must restore the history from
    ._old before applying its batch — nothing is lost."""
    src = tmp_path / "crash_src"
    src.mkdir()
    store = tmp_path / "crash_store"
    ck = tmp_path / "crash_ck"

    batch_events = read_table(spark, SF, "events")
    half = batch_events.limit(500).toPandas()
    rest = batch_events.toPandas().iloc[500:]
    for pdf in (half, rest):
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")

    def drain():
        stream = spark.readStream.schema(batch_events.schema).parquet(str(src))
        q = maintain_hourly_rollup(spark, stream, store, ck)
        q.awaitTermination()

    half.to_parquet(src / "a.parquet")
    drain()

    # crash simulation: rename-aside happened, promote did not, and a
    # half-written staging dir is lying around
    old = store.with_name(store.name + "._old")
    staging = store.with_name(store.name + "._staging")
    store.rename(old)
    staging.mkdir()
    (staging / "junk.parquet").write_text("not a real file")
    assert not store.exists()

    rest.to_parquet(src / "b.parquet")
    drain()

    assert store.exists() and not old.exists() and not staging.exists()
    got = {
        r.hour_bucket: (r.n, round(r.total_value, 2))
        for r in read_rollup(spark, store).collect()
    }
    full = spark.createDataFrame(pd.concat([half, rest]), batch_events.schema)
    want = {
        r.hour_bucket: (r.n, round(float(r.v), 2))
        for r in hourly_partial(full).collect()
    }
    assert got == want, "recovered store must equal the full batch rollup"


def test_crash_after_promote_cleans_leftover_old(spark, tmp_path):
    """Crash window after promote but before ._old cleanup: the new store
    is live, ._old is stale. Next invocation deletes ._old and proceeds
    from the live store."""
    src = tmp_path / "crash2_src"
    src.mkdir()
    store = tmp_path / "crash2_store"
    ck = tmp_path / "crash2_ck"

    batch_events = read_table(spark, SF, "events")
    half = batch_events.limit(400).toPandas()
    rest = batch_events.toPandas().iloc[400:800]
    for pdf in (half, rest):
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")

    def drain():
        stream = spark.readStream.schema(batch_events.schema).parquet(str(src))
        q = maintain_hourly_rollup(spark, stream, store, ck)
        q.awaitTermination()

    half.to_parquet(src / "a.parquet")
    drain()

    old = store.with_name(store.name + "._old")
    shutil.copytree(store, old)  # stale pre-promote copy left behind

    rest.to_parquet(src / "b.parquet")
    drain()

    assert store.exists() and not old.exists()
    got = {
        r.hour_bucket: (r.n, round(r.total_value, 2))
        for r in read_rollup(spark, store).collect()
    }
    full = spark.createDataFrame(pd.concat([half, rest]), batch_events.schema)
    want = {
        r.hour_bucket: (r.n, round(float(r.v), 2))
        for r in hourly_partial(full).collect()
    }
    assert got == want


def test_rollup_store_sum_is_decimal_38_2(spark, tmp_path):
    """The stored sum must be decimal(38,2): a downcast back to (18,2)
    would turn overflow on a long-running rollup into silent NULLs."""
    batch_events = read_table(spark, SF, "events")
    p = hourly_partial(batch_events)
    assert dict(p.dtypes)["v"] == "decimal(38,2)"
    from github_etl_pipeline_spark.streaming.rollup import combine_partials

    c = combine_partials(p, p)
    assert dict(c.dtypes)["v"] == "decimal(38,2)"
