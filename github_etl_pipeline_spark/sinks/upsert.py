"""Upsert sinks (reference S8, etl/load.py:16-82).

The reference's consolidated store is a JSON object map
{source_path -> pool record} maintained read-modify-write. Two Spark-first
equivalents:

  * ``upsert_parquet`` — the scale path: a parquet table keyed by
    ``source_file``; MERGE emulated as union + keep-newest-per-key +
    atomic snapshot swap. (With Delta available this would be a literal
    ``MERGE INTO``; plain parquet keeps the repo dependency-free. The
    swap is last-writer-wins, not ACID — documented.)
  * ``write_consolidated_json`` — format-parity path producing the
    reference's exact nested JSON document (only sensible at
    fleet-rollup cardinality, i.e. hundreds-thousands of pools; the
    100-TB input reduces to one record per pool file, so the driver-side
    materialization is of the tiny AGGREGATE, never the raw data).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def merge_into(
    spark: SparkSession,
    target: str | Path,
    updates: DataFrame,
    on: str = "source_file",
    backend: str = "auto",
) -> None:
    """MERGE-shaped upsert boundary (reference S8, etl/load.py:16-82):

        MERGE INTO target USING updates ON target.<on> = updates.<on>
        WHEN MATCHED THEN UPDATE SET *    WHEN NOT MATCHED THEN INSERT *

    Backends:
      * ``delta`` — Delta Lake's literal transactional ``MERGE INTO``.
        A missing target is CREATED as a Delta table (so a pipeline
        started on Delta is ACID from its first write, not its second).
      * ``parquet`` — the dependency-free emulation (``upsert_parquet``:
        union + keep-newest-per-key + atomic snapshot swap). LAST-WRITER-
        WINS, not ACID under concurrent writers — the reference's
        read-modify-write JSON has exactly the same property.
      * ``auto`` (default) — Delta when delta-spark is importable AND the
        target is absent-or-Delta; an existing plain-parquet table keeps
        the parquet path (never silently rewrites a parquet table's
        format under the caller).

    ``backend="delta"`` raises ImportError when delta-spark is missing,
    so a deployment that REQUIRES transactional semantics fails loudly
    instead of degrading to last-writer-wins."""
    if backend not in ("auto", "delta", "parquet"):
        raise ValueError(f"merge_into: unknown backend {backend!r}")
    if backend != "parquet":
        try:
            from delta.tables import DeltaTable  # optional backend
        except ImportError:
            if backend == "delta":
                raise
        else:
            t = str(target)
            if DeltaTable.isDeltaTable(spark, t):
                (
                    DeltaTable.forPath(spark, t)
                    .alias("t")
                    .merge(updates.alias("u"), f"t.{on} = u.{on}")
                    .whenMatchedUpdateAll()
                    .whenNotMatchedInsertAll()
                    .execute()
                )
                return
            if Path(target).exists():
                if backend == "delta":
                    raise ValueError(
                        f"merge_into(backend='delta'): {t} exists but is not a "
                        "Delta table — refusing to overwrite a parquet table's "
                        "format; migrate it explicitly (CONVERT TO DELTA) first"
                    )
                # auto + existing plain-parquet table -> emulation below
            else:
                updates.write.format("delta").mode("error").save(t)
                return
    upsert_parquet(spark, updates, target, key=on)


def upsert_parquet(
    spark: SparkSession,
    updates: DataFrame,
    table_path: str | Path,
    key: str = "source_file",
) -> None:
    """Upsert ``updates`` into the parquet table at ``table_path`` keyed by
    ``key``: new rows win over existing rows with the same key; unmatched
    existing rows are preserved (reference etl/load.py:45-61 semantics).
    Prefer the ``merge_into`` entry point, which upgrades to a real Delta
    MERGE when available."""
    table_path = Path(table_path)
    if table_path.exists():
        existing = spark.read.parquet(str(table_path))
        merged = (
            updates.withColumn("_pri", F.lit(0))
            .unionByName(existing.withColumn("_pri", F.lit(1)), allowMissingColumns=True)
            .withColumn(
                "_rn", F.row_number().over(Window.partitionBy(key).orderBy(F.col("_pri")))
            )
            .where(F.col("_rn") == 1)
            .drop("_pri", "_rn")
        )
    else:
        merged = updates

    staging = table_path.with_name(table_path.name + "._staging")
    merged.write.mode("overwrite").parquet(str(staging))
    if table_path.exists():
        shutil.rmtree(table_path)
    staging.rename(table_path)


def _record_dict(row: dict) -> dict:
    """Shape one pools row as the reference's nested output record
    (etl/transform.py:237-256 + output-only max_win_factor)."""
    from datetime import timezone

    processed_at = row.get("processed_at")
    if hasattr(processed_at, "isoformat") and processed_at.tzinfo is None:
        # Spark collect() yields naive datetimes in session-tz wall time;
        # the session factory pins UTC, and the reference stamps
        # ISO-8601 with the +00:00 offset (etl/transform.py:253)
        processed_at = processed_at.replace(tzinfo=timezone.utc)
    return {
        "pool_name": row.get("pool_name"),
        "pool_id": row.get("pool_id"),
        "pool_type": row.get("pool_type"),
        "game_ids": list(row.get("game_ids") or []),
        "min_bet": row.get("min_bet"),
        "max_win_factor": row.get("max_win_factor"),
        "rtp": row.get("rtp"),
        "volatility": row.get("volatility"),
        "is_flat": row.get("is_flat"),
        "tag": list(row.get("tag") or []),
        "size": row.get("size"),
        "max_multiplier": row.get("max_multiplier"),
        "metadata": {
            "source_file": row.get("source_file"),
            "file_name": row.get("file_name"),
            "folder_path": row.get("folder_path"),
            "processed_at": (
                processed_at.isoformat(timespec="seconds")
                if hasattr(processed_at, "isoformat")
                else processed_at
            ),
            "hit_frequency": row.get("hit_frequency"),
        },
    }


def write_consolidated_json(pools: DataFrame, output_file: str | Path) -> Path:
    """Upsert pool records into the consolidated JSON document keyed by
    posix-normalized source_file (reference etl/load.py:16-82)."""
    output_file = Path(output_file)
    all_data: dict = {}
    if output_file.exists():
        try:
            all_data = json.loads(output_file.read_text(encoding="utf-8"))
        except (json.JSONDecodeError, OSError):
            all_data = {}

    # deterministic output: the reference processes files in sorted order
    # (etl/extract.py:52), so fresh-run insertion order is sorted paths;
    # sorting the collected aggregate reproduces that regardless of Spark
    # task completion order (existing keys keep their position — dict
    # update semantics — exactly like the reference's upsert)
    records = []
    for row in pools.collect():
        rec = _record_dict(row.asDict())
        key = rec["metadata"]["source_file"]
        if not key:
            continue
        records.append((str(Path(key).as_posix()), rec))
    for key, rec in sorted(records, key=lambda kv: kv[0]):
        all_data[key] = rec

    output_file.parent.mkdir(parents=True, exist_ok=True)
    output_file.write_text(
        json.dumps(all_data, indent=2, ensure_ascii=False, default=str), encoding="utf-8"
    )
    return output_file
