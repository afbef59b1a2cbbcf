"""Incremental materialized-aggregate maintenance: a continuously
maintained hourly rollup of the event stream (the streaming complement
of the batch ``hypertable_rollup_events`` plan, plans/relational.py).

Pattern: ``foreachBatch`` computes each micro-batch's PARTIAL aggregate
(count + decimal-exact sum per hour bucket) and MERGE-combines it into
the parquet rollup store — the classic incremental-materialized-view
loop on a plain data lake (with Delta available, sinks/upsert.merge_into
makes the combine transactional without code changes).

Correctness hinges on combining MERGEABLE partials, never finalized
values: counts and decimal sums add; averages are derived at read time.
The rollup table stays at (hours) cardinality regardless of stream
volume, each micro-batch shuffles only its own partial (one hash
aggregate per batch), and restarts are safe because the streaming
checkpoint replays unprocessed files only.

Exactly-once: Structured Streaming may re-run a micro-batch after a
sink failure (foreachBatch is at-least-once), and ADDING the same
partial twice double-counts. The sink therefore records the epoch id it
last applied in a ``_last_batch`` sidecar INSIDE the store directory
(swapped atomically with the data): a replayed batch_id <= high-water is
skipped. Sidecar-and-data move together in the same staging rename, so
the marker can never disagree with the data it describes.

Crash windows during the swap itself are handled by a three-step
rename protocol (never a delete-then-rename): the current store is
renamed aside to ``<store>._old``, the fully-written staging dir is
renamed into place, and only then is ``._old`` deleted. Every sink
invocation first RECOVERS from a leftover ``._old`` (crash between
rename-aside and promote: the old store is renamed back) and clears any
stale staging dir before writing its own, so a retried batch always
re-reads a complete previous store — the history is never exposed to a
window where no copy exists on disk.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from github_etl_pipeline_spark.functions.epoch import event_micros, bucket_div_sql

HOUR_US = 3_600_000_000


def hourly_partial(events: DataFrame, time_col: str = "ts") -> DataFrame:
    """Mergeable hourly partial: (hour_bucket, n, v) with decimal-exact
    value sums — the same partial shape the batch hypertable rollup
    composes, so stream-maintained and batch-computed rollups agree
    bit-for-bit."""
    return (
        events.select(
            event_micros(events, time_col).alias("tsu"),
            F.col("value").cast("decimal(18,2)").alias("_v"),
        )
        .select(F.expr(bucket_div_sql("tsu", HOUR_US)).alias("hour_bucket"), "_v")
        .groupBy("hour_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # stored at decimal(38,2): a long-running rollup keeps adding
            # partials, and a downcast back to (18,2) would turn overflow
            # into a silent NULL with ANSI off
            F.sum("_v").cast("decimal(38,2)").alias("v"),
        )
    )


def combine_partials(existing: DataFrame, batch: DataFrame) -> DataFrame:
    """MERGE two partial rollups: counts and decimal sums ADD per key."""
    return (
        existing.unionByName(batch)
        .groupBy("hour_bucket")
        .agg(F.sum("n").alias("n"), F.sum(F.col("v").cast("decimal(38,2)")).alias("v"))
        # keep the store schema pinned at decimal(38,2) — wide enough that
        # overflow is practically unreachable, and never downcast a sum
        .select("hour_bucket", "n", F.col("v").cast("decimal(38,2)").alias("v"))
    )


def maintain_hourly_rollup(
    spark: SparkSession,
    events_stream: DataFrame,
    store_path: str | Path,
    checkpoint_dir: str | Path,
    time_col: str = "ts",
):
    """Start (availableNow) a stream that keeps the hourly rollup store
    current. Returns the StreamingQuery; callers awaitTermination().

    The store and ``checkpoint_dir`` are a PAIR: epoch ids in the
    store's ``_last_batch`` high-water marker are only meaningful against
    the checkpoint that produced them. Re-pointing an existing store at a
    fresh checkpoint restarts epoch numbering at 0 and the marker would
    silently skip the first batches — start a fresh store with a fresh
    checkpoint."""
    store_path = Path(store_path)

    staging = store_path.with_name(store_path.name + "._staging")
    old = store_path.with_name(store_path.name + "._old")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        # -- crash recovery (see module docstring: three-rename protocol) --
        if old.exists():
            if store_path.exists():
                # crashed after promote, before cleanup: new store is live
                shutil.rmtree(old)
            else:
                # crashed between rename-aside and promote: restore history
                old.rename(store_path)
        if staging.exists():
            shutil.rmtree(staging)  # incomplete write from a dead attempt

        marker = store_path / "_last_batch"
        if marker.exists() and batch_id <= int(marker.read_text()):
            return  # replayed epoch — already applied, skip (idempotent)
        partial = hourly_partial(batch_df, time_col)
        if store_path.exists():
            existing = spark.read.parquet(str(store_path))
            merged = combine_partials(existing, partial)
        else:
            merged = partial
        merged.write.mode("overwrite").parquet(str(staging))
        # high-water travels WITH the data in one atomic rename
        (staging / "_last_batch").write_text(str(batch_id))
        # promote via renames only — at every instant a complete copy of
        # the store exists on disk (as <store>, ._old, or fully-written
        # ._staging), so no crash point can lose the accumulated history
        if store_path.exists():
            store_path.rename(old)
        staging.rename(store_path)
        if old.exists():
            shutil.rmtree(old)

    return (
        events_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(checkpoint_dir))
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(spark: SparkSession, store_path: str | Path) -> DataFrame:
    """Finalized view of the maintained rollup (averages derived HERE,
    never stored — partials must stay mergeable)."""
    r = spark.read.parquet(str(store_path))
    return r.select(
        "hour_bucket",
        "n",
        F.col("v").cast("double").alias("total_value"),
        (F.col("v").cast("double") / F.col("n")).alias("avg_value"),
    )
