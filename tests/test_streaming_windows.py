"""Streaming windowed aggregation + custom stateful sessionization:
the same operator code run as a REAL stream (availableNow over the
parquet) must agree with its batch execution."""

import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.sources.tables import read_table
from github_etl_pipeline_spark.streaming.windows import (
    sessionize_native,
    sessionize_stateful,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def _stream_events(spark, tmp_path):
    """Streaming file source needs a DIRECTORY; stage the events parquet
    into one."""
    import shutil

    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "events.parquet")
    batch = read_table(spark, SF, "events")
    return spark.readStream.schema(batch.schema).parquet(str(d))


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    batch_events = read_table(spark, SF, "events")
    expect = {
        (r.window_start_us, r.event_type): (r.cnt, r.sum_value)
        for r in windowed_event_counts(batch_events).collect()
    }

    # stream the same parquet file through the identical operator
    stream = _stream_events(spark, tmp_path)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start_us, r.event_type): (r.cnt, r.sum_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == expect


def test_sessionize_stateful_stream(spark, tmp_path):
    batch_events = read_table(spark, SF, "events")
    # batch expectation from the window-based sessionizer
    from github_etl_pipeline_spark.plans.registry import REGISTRY

    batch_sessions = REGISTRY["sessionize_events"].builder(spark, SF)
    per_user_total = {
        r.user_id: r.n
        for r in batch_sessions.groupBy("user_id").agg(F.sum("n_events").alias("n")).collect()
    }

    stream = _stream_events(spark, tmp_path)
    q = (
        sessionize_stateful(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql("SELECT * FROM sessions").collect()
    # availableNow ends before processing-time timeouts fire, so each
    # user's final (still-open) session is unreported: emitted counts per
    # user must be <= batch totals, and closed sessions must match the
    # batch sessionizer's per-session event counts exactly.
    got_by_user = {}
    for r in emitted:
        got_by_user.setdefault(r.user_id, 0)
        got_by_user[r.user_id] += r.n_events
    assert got_by_user, "no sessions emitted"
    for uid, n in got_by_user.items():
        assert n <= per_user_total[uid]
    # closed sessions are a prefix of the batch sessions per user
    batch_rows = {
        (r.user_id, r.session_idx): r.n_events for r in batch_sessions.collect()
    }
    emitted_sorted = {}
    for r in sorted(emitted, key=lambda r: (r.user_id, r.session_start_us)):
        emitted_sorted.setdefault(r.user_id, []).append(r.n_events)
    for uid, counts in emitted_sorted.items():
        batch_counts = [
            batch_rows[(uid, i)] for i in sorted(
                idx for (u, idx) in batch_rows if u == uid
            )
        ]
        assert counts == batch_counts[: len(counts)], uid


def test_sessionize_native_equals_stateful_on_stream(spark, tmp_path):
    """The promoted default (F.session_window, JVM-side) and the
    custom-state escape hatch (applyInPandasWithState) must emit the
    SAME closed sessions on the same real stream — same users, same
    starts, same counts, same durations."""
    gap_ms = 30 * 60 * 1000
    batch_events = read_table(spark, SF, "events")

    # boundary precondition: the two sessionizers differ only for an
    # event landing EXACTLY at last+gap (native >=, stateful >) — assert
    # the data has no such pair so equality is exact
    from pyspark.sql import Window as W
    from github_etl_pipeline_spark.functions.epoch import event_micros

    e = batch_events.select("user_id", event_micros(batch_events, "ts").alias("us"))
    d = e.withColumn("prev", F.lag("us").over(W.partitionBy("user_id").orderBy("us")))
    n_boundary = d.where(F.col("us") - F.col("prev") == gap_ms * 1000).count()
    assert n_boundary == 0, "fixture hits the gap boundary exactly; pick another gap"

    def run(op, name, ck):
        stream = _stream_events(spark, tmp_path / name)
        q = (
            op(stream, gap_ms=gap_ms)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            (r.user_id, r.session_start_us, r.n_events, r.duration_ms)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        )

    (tmp_path / "nat_sessions").mkdir()
    (tmp_path / "st_sessions").mkdir()
    native = run(sessionize_native, "nat_sessions", "ck_nat")
    stateful = run(sessionize_stateful, "st_sessions", "ck_st")
    assert native, "native sessionizer emitted nothing"
    assert native == stateful


def test_watermark_drops_late_data(spark, tmp_path):
    """Two micro-batches; the second contains an event older than
    (max event time - watermark delay) -> dropped from the final windows,
    while a within-watermark late event is still counted."""
    import pandas as pd

    d = tmp_path / "late_stream"
    d.mkdir()
    schema = "event_id long, ts long, user_id long, event_type string, value double, props string"
    HOUR = 3_600_000_000_000  # ns
    base = 1_700_000_000_000_000_000

    def write(name, rows):
        pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        ).to_parquet(d / name)

    from github_etl_pipeline_spark.streaming.windows import windowed_event_counts

    emitted: list = []

    def run_once(qname):
        # memory sink cannot recover from a checkpoint; foreachBatch can
        stream = spark.readStream.schema(schema).parquet(str(d))

        def sink(batch_df, _bid):
            emitted.extend(batch_df.collect())

        q = (
            windowed_event_counts(stream, window_duration="1 hour", watermark="2 hours")
            .writeStream.foreachBatch(sink)
            .outputMode("append")  # append emits only FINALIZED windows
            .option("checkpointLocation", str(tmp_path / "ck3"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r.window_start_us: r.cnt for r in emitted}

    # run 1: events at hours 0 and 10 -> checkpointed watermark = h10 - 2h
    write("b1.parquet", [(1, base, 1, "click", 1.0, ""), (2, base + 10 * HOUR, 1, "click", 1.0, "")])
    run_once("late_run1")
    # run 2: an hour-0 event (older than the persisted watermark -> DROPPED)
    # and an hour-9 event (late but within the watermark -> kept)
    write("b2.parquet", [(3, base + 1, 1, "click", 1.0, ""), (4, base + 9 * HOUR, 1, "click", 1.0, "")])
    got = run_once("late_run2")

    h0 = (base // 1000) // 3_600_000_000 * 3_600_000_000  # epoch-aligned window
    # hour-0 window finalized in run 1 with ONLY event 1; run 2's event 3
    # arrived after the watermark passed the window -> dropped, never re-emitted
    assert got.get(h0, 1) == 1, got
    # the late-but-in-watermark hour-9 event went INTO state (finalized once
    # the watermark passes h10; not observable under availableNow) — the
    # assertion that matters is that the too-late event did not resurrect
    # its window with a second count
    all_counts = list(got.values())
    assert all(c == 1 for c in all_counts), got


def test_interval_join_stream_equals_batch(spark, tmp_path):
    """Stream-stream inner interval join under availableNow must emit
    exactly the batch join's rows (inner joins emit eagerly; no
    watermark-held output)."""
    from github_etl_pipeline_spark.streaming.windows import interval_join_streams

    batch_events = read_table(spark, SF, "events")
    expect = {
        (r.user_id, r.left_id, r.right_id, r.delay_ms)
        for r in interval_join_streams(
            batch_events.where(F.col("event_type") == "click"),
            batch_events.where(F.col("event_type") == "purchase"),
        ).collect()
    }
    assert expect, "batch join produced no rows — fixture too sparse"

    # two independent streaming readers over the same staged directory
    left = _stream_events(spark, tmp_path).where(F.col("event_type") == "click")
    right = (
        spark.readStream.schema(batch_events.schema)
        .parquet(str(tmp_path / "events_stream"))
        .where(F.col("event_type") == "purchase")
    )
    q = (
        interval_join_streams(left, right)
        .writeStream.format("memory")
        .queryName("sjoin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_sj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.left_id, r.right_id, r.delay_ms)
        for r in spark.sql("SELECT * FROM sjoin").collect()
    }
    assert got == expect


def test_dedup_stream_bounded_state(spark, tmp_path):
    from github_etl_pipeline_spark.streaming.windows import dedup_stream

    batch_events = read_table(spark, SF, "events")
    expect = batch_events.select("user_id", "event_type").distinct().count()

    stream = _stream_events(spark, tmp_path)
    q = (
        dedup_stream(stream)
        .select("user_id", "event_type")
        .writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM deduped").collect()
    # one survivor per key, and no key emitted twice
    assert len(got) == expect
    assert len({(r.user_id, r.event_type) for r in got}) == expect


def test_sliding_windows_stream_equals_batch(spark, tmp_path):
    """Sliding (1h/30min) windowed counts on a REAL stream must equal the
    batch execution — each event fans out to two overlapping windows in
    both modes."""
    batch_events = read_table(spark, SF, "events")
    expect = {
        (r.window_start_us, r.event_type): (r.cnt, r.sum_value)
        for r in windowed_event_counts(batch_events, slide="30 minutes").collect()
    }
    stream = _stream_events(spark, tmp_path)
    q = (
        windowed_event_counts(stream, slide="30 minutes")
        .writeStream.format("memory")
        .queryName("slide_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_slide"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start_us, r.event_type): (r.cnt, r.sum_value)
        for r in spark.sql("SELECT * FROM slide_counts").collect()
    }
    assert got == expect
    # sanity: sliding windows double-assign -> total window-event count
    # is exactly 2x the tumbling assignment
    assert sum(c for c, _ in got.values()) == 2 * batch_events.count()
