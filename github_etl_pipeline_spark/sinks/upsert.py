"""Upsert sinks (reference S8, etl/load.py:16-82).

The reference's consolidated store is a JSON object map
{source_path -> pool record} maintained read-modify-write. Two Spark-first
equivalents:

  * ``upsert_parquet`` — the scale path: a parquet table hash-bucketed
    by key (``_bucket=pmod(xxhash64(key), N)`` directory partitions).
    MERGE reads ONLY the buckets containing updated keys (partition
    pruning) and rewrites ONLY those buckets (dynamic partition
    overwrite) — an incremental micro-batch costs O(touched buckets),
    not O(entire history), so the maintained-store loop
    (streaming/incremental.py) stays flat over time instead of
    degrading quadratically. (With Delta available, ``merge_into``
    upgrades to a literal transactional ``MERGE INTO``; plain parquet
    keeps the repo dependency-free. Per-bucket overwrite is
    last-writer-wins, not ACID — the reference's read-modify-write
    JSON has exactly the same property.)
  * ``write_consolidated_json`` — format-parity path producing the
    reference's exact nested JSON document (only sensible at
    fleet-rollup cardinality, i.e. hundreds-thousands of pools; the
    100-TB input reduces to one record per pool file, so the driver-side
    materialization is of the tiny AGGREGATE, never the raw data).
    Guarded: above ``max_driver_rows`` it refuses the driver collect
    and writes sharded JSONL through Spark instead.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Bucket count for the hash-partitioned store layout. 64 keeps sf-scale
# test stores small; at fleet scale pick ~(store size / target file size)
# — the layout is self-describing (directory partitions), so readers
# never need to know N.
DEFAULT_STORE_BUCKETS = 64
_BUCKET_COL = "_bucket"


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
      * ``auto`` (default) — Delta only when delta-spark is importable
        AND the target already IS a Delta table; everything else
        (absent target included) takes the parquet path. Auto never
        CREATES a Delta table: callers in auto mode read their store
        back with ``read_store``/``spark.read.parquet``, and a
        Delta-created store would show tombstoned superseded files to a
        plain parquet reader after the next merge. Creating Delta is an
        explicit ``backend="delta"`` decision.

    ``backend="delta"`` raises ImportError when delta-spark is missing,
    so a deployment that REQUIRES transactional semantics fails loudly
    instead of degrading to last-writer-wins.

    Test coverage: every branch of THIS function (including the exact
    MERGE call chain) is asserted in every environment via a recording
    stand-in for ``delta.tables`` (tests/test_sinks.py); the end-to-end
    transactional behavior additionally runs wherever delta-spark is
    importable. The parquet emulation is the golden-tested store."""
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
            elif backend == "delta":
                updates.write.format("delta").mode("error").save(t)
                return
            # auto + absent target -> plain parquet below (Delta
            # creation is reserved for an explicit backend='delta')
    upsert_parquet(spark, updates, target, key=on)


def _is_bucketed_store(table_path: Path) -> bool:
    """A store written by this module has ``_bucket=K`` partition dirs."""
    return any(
        p.name.startswith(f"{_BUCKET_COL}=") for p in table_path.iterdir() if p.is_dir()
    )


def _with_bucket(df: DataFrame, key: str, n_buckets: int) -> DataFrame:
    return df.withColumn(_BUCKET_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)))


def upsert_parquet(
    spark: SparkSession,
    updates: DataFrame,
    table_path: str | Path,
    key: str = "source_file",
    n_buckets: int = DEFAULT_STORE_BUCKETS,
) -> None:
    """Upsert ``updates`` into the parquet table at ``table_path`` keyed by
    ``key``: new rows win over existing rows with the same key; unmatched
    existing rows are preserved (reference etl/load.py:45-61 semantics).
    Prefer the ``merge_into`` entry point, which upgrades to a real Delta
    MERGE when available.

    Scale path: the store is laid out as ``_bucket=pmod(xxhash64(key), N)``
    directory partitions. A merge reads only the buckets whose keys appear
    in ``updates`` (partition-pruned scan) and rewrites only those buckets
    (``partitionOverwriteMode=dynamic``) — untouched bucket files are not
    rewritten, so incremental maintenance cost is bounded by the delta, not
    the accumulated history. Read the store back via :func:`read_store`
    (drops the internal bucket column).

    A pre-existing UNBUCKETED store (written by an older version of this
    sink) is migrated in one full rewrite on first merge; thereafter all
    merges are bucket-pruned.
    """
    table_path = Path(table_path)
    updates = _with_bucket(updates, key, n_buckets)

    if table_path.exists() and _is_bucketed_store(table_path):
        touched = [r[0] for r in updates.select(_BUCKET_COL).distinct().collect()]
        # mergeSchema: after a schema-evolving merge, touched buckets carry
        # the new schema while untouched ones keep the old — the union view
        # needs the merged schema (missing columns read as NULL)
        existing = (
            spark.read.option("mergeSchema", "true")
            .parquet(str(table_path))
            .where(F.col(_BUCKET_COL).isin(touched))
        )
        merged = (
            updates.withColumn("_pri", F.lit(0))
            .unionByName(existing.withColumn("_pri", F.lit(1)), allowMissingColumns=True)
            .withColumn(
                "_rn", F.row_number().over(Window.partitionBy(key).orderBy(F.col("_pri")))
            )
            .where(F.col("_rn") == 1)
            .drop("_pri", "_rn")
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            # dynamic mode replaces ONLY the partitions present in `merged`
            # (== touched buckets); all other bucket dirs are untouched
            merged.write.mode("overwrite").partitionBy(_BUCKET_COL).parquet(
                str(table_path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        return

    if table_path.exists():
        # legacy unbucketed store: one-time migration to the bucketed layout
        existing = spark.read.parquet(str(table_path))
        if _BUCKET_COL not in existing.columns:
            existing = _with_bucket(existing, key, n_buckets)
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
    merged.write.mode("overwrite").partitionBy(_BUCKET_COL).parquet(str(staging))
    if table_path.exists():
        shutil.rmtree(table_path)
    staging.rename(table_path)


def read_store(spark: SparkSession, table_path: str | Path) -> DataFrame:
    """Read an ``upsert_parquet`` store back without its internal layout
    column. Works on both bucketed and legacy flat stores."""
    df = spark.read.option("mergeSchema", "true").parquet(str(table_path))
    return df.drop(_BUCKET_COL) if _BUCKET_COL in df.columns else df


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


# Above this many pool records the single-document JSON format itself is
# the problem (a multi-GB JSON object nobody can load); refuse the driver
# collect and write sharded JSONL through Spark instead.
CONSOLIDATED_DRIVER_MAX_ROWS = 100_000


def _sharded_record_col() -> F.Column:
    """The consolidated record shape (_record_dict) as a Spark struct, for
    the sharded JSONL spill path — built JVM-side, never collected."""
    return F.struct(
        F.col("pool_name"),
        F.col("pool_id"),
        F.col("pool_type"),
        F.coalesce(F.col("game_ids"), F.array()).alias("game_ids"),
        F.col("min_bet"),
        F.col("max_win_factor"),
        F.col("rtp"),
        F.col("volatility"),
        F.col("is_flat"),
        F.coalesce(F.col("tag"), F.array()).alias("tag"),
        F.col("size"),
        F.col("max_multiplier"),
        F.struct(
            F.col("source_file"),
            F.col("file_name"),
            F.col("folder_path"),
            F.concat(
                F.date_format("processed_at", "yyyy-MM-dd'T'HH:mm:ss"), F.lit("+00:00")
            ).alias("processed_at"),
            F.col("hit_frequency"),
        ).alias("metadata"),
    )


def _write_sharded_json(pools: DataFrame, shard_dir: Path) -> Path:
    """Scale spill for :func:`write_consolidated_json`: one JSON record per
    line, written by executors (no driver materialization), sorted shards
    keyed by posix source_file. Not the single-document format — at this
    cardinality that format is the thing being refused."""
    key = F.regexp_replace(F.col("source_file"), r"\\", "/")
    (
        pools.select(key.alias("key"), _sharded_record_col().alias("record"))
        .where(F.col("key").isNotNull() & (F.col("key") != ""))
        .repartitionByRange(F.col("key"))
        .sortWithinPartitions("key")
        # ignoreNullFields=false: a null field must serialize as an
        # explicit null exactly like the consolidated json.dumps path —
        # a reader switching between store formats sees one record shape
        # (golden-parity-tested in test_sinks.py)
        .select(
            F.to_json(
                F.struct("key", "record"), {"ignoreNullFields": "false"}
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(str(shard_dir))
    )
    return shard_dir


def write_consolidated_json(
    pools: DataFrame,
    output_file: str | Path,
    max_driver_rows: int = CONSOLIDATED_DRIVER_MAX_ROWS,
) -> Path:
    """Upsert pool records into the consolidated JSON document keyed by
    posix-normalized source_file (reference etl/load.py:16-82).

    The single-document format is inherently driver-side; the collect is
    of the per-pool AGGREGATE (one row per pool file), bounded by
    ``max_driver_rows``. Above the bound this refuses the collect and
    writes sharded JSONL to ``<output_file>.shards/`` instead (returned
    path points at the shard directory)."""
    output_file = Path(output_file)
    if pools.limit(max_driver_rows + 1).count() > max_driver_rows:
        return _write_sharded_json(
            pools, output_file.with_name(output_file.name + ".shards")
        )
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
