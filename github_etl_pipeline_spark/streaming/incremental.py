"""Incremental processing (reference S2/S3/EP2) as Structured Streaming.

The reference's change detection is ``git diff --name-only HEAD~1 HEAD``
driven by a GitHub-Actions push loop (etl/extract.py:55-80,
.github/workflows/etl_pipeline.yml:3-10): each run processes only files
changed since the last run, falling back to a full scan when none.

Spark-first: a streaming FILE SOURCE with a checkpoint is exactly that
ledger — ``readStream.text`` discovers files, the checkpoint records
which were already processed, ``Trigger.AvailableNow`` drains everything
new and stops (micro-batch semantics matching the push-triggered CI
loop). The first run IS the full scan (S3 fallback); subsequent runs see
only new/changed paths. Each micro-batch runs the same KPI transform and
MERGE-upserts into the parquet store, so reruns are idempotent.

Note: the file source tracks file PATHS — an in-place edit of an already
seen file is not re-processed (git-diff would catch it). Matching the
reference's loop exactly would key the ledger on (path, mtime); Spark's
``maxFileAge``/``cleanSource`` options approximate this. At fleet scale
pool files are immutable drops, so path-keying is the right trade.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from github_etl_pipeline_spark.operators.kpis import pool_kpis
from github_etl_pipeline_spark.sinks.upsert import upsert_parquet
from github_etl_pipeline_spark.sources.pol import parse_pol_lines, EXCLUDED_DIRS

from pyspark.sql import functions as F


def _stream_pol_lines(spark: SparkSession, scan_dir: str) -> DataFrame:
    df = (
        spark.readStream.format("text")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.pol")
        .option("maxFilesPerTrigger", "64")
        .load(scan_dir)
    )
    path = F.col("_metadata.file_path")
    for d in EXCLUDED_DIRS:
        df = df.filter(~path.contains(f"/{d}/"))
    scan_posix = scan_dir.rstrip("/").replace("\\", "/")
    import re

    rel = F.regexp_replace(path, r"^.*?" + re.escape(scan_posix) + "/", "")
    folder = F.when(rel.contains("/"), F.regexp_replace(rel, r"/[^/]+$", "")).otherwise(
        F.lit("root")
    )
    return df.select(
        F.col("value"),
        rel.alias("source_file"),
        F.col("_metadata.file_name").alias("file_name"),
        folder.alias("folder_path"),
        F.element_at(F.split(folder, "/"), -1).alias("parent_folder"),
        F.col("_metadata.file_size").alias("file_size"),
        F.col("_metadata.file_modification_time").alias("file_mtime"),
    )


def run_incremental(
    spark: SparkSession,
    scan_dir: str | Path,
    checkpoint_dir: str | Path,
    store_path: str | Path,
    dim_agg: DataFrame | None = None,
    rounding: str = "bankers",
) -> int:
    """Drain all unseen .pol files into the parquet KPI store; returns the
    number of micro-batches processed. Repeated calls process only files
    the checkpoint has not seen (S2); the first call processes all (S3)."""
    lines = _stream_pol_lines(spark, str(scan_dir))
    n_batches = 0

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        if batch_df.isEmpty():
            return
        n_batches += 1
        parsed = parse_pol_lines(batch_df, keep_invalid=True)
        pools = pool_kpis(parsed, dim_agg=dim_agg, rounding=rounding)
        upsert_parquet(batch_df.sparkSession, pools, store_path)

    query = (
        lines.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", str(checkpoint_dir))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return n_batches
