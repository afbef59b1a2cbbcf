"""`.pol` pool-file source: distributed scan, metadata, lenient line parse.

Reference behavior re-expressed Spark-first:
  * S1 recursive glob scan (etl/extract.py:27-52) -> ``spark.read.text`` with
    ``recursiveFileLookup`` + ``pathGlobFilter``; exclusion dirs become a
    filter on the hidden ``_metadata.file_path`` column.
  * S4 multi-encoding read (etl/extract.py:83-105) -> the primary path
    (``read_pol_lines``) is the streaming UTF-8 text source (correct for
    this ASCII corpus); ``read_pol_lines_any_encoding`` is the faithful
    fallback chain. The reference tries utf-8, utf-8-sig, latin-1,
    cp1252, then binary-with-replacement — but plain utf-8 succeeds
    whenever utf-8-sig would (the BOM decodes to U+FEFF), and latin-1
    maps every byte, so cp1252 and the binary fallback are unreachable;
    the chain reduces EXACTLY to "valid UTF-8 ? utf-8 : latin-1", which
    ``is_valid_utf8`` + ``decode`` express as codegen'd JVM expressions
    over a ``binaryFile`` scan. The per-file ``encoding`` column is the
    non-UTF8 detection counter.
  * S5 file metadata (etl/extract.py:108-131) -> ``_metadata`` struct
    (file_path, file_name, file_size, file_modification_time) plus string
    surgery for relative/parent paths.
  * P1 lenient tokenizer (etl/transform.py:61-95): split on whitespace,
    ``int(tok0)`` else drop the line, add tok2 when it is an int. Spark:
    ``split`` + ``try_cast`` + ``coalesce`` — stays entirely inside
    whole-stage codegen, no Python in the per-line path.
  * P2 filename -> (pool_id, pool_type) (etl/transform.py:181-186):
    ``split(strip '.pol', '_')`` and positional extraction; missing parts
    become NULL exactly like the reference's ``splits[1] if len>1``.

Scale notes: the text source streams each file in splits (no whole-file
string materialization — contrast etl/extract.py:152); a 100 TB fleet of
pool files scans partition-parallel with ``maxPartitionBytes`` chunking,
and every derived column below is a codegen'd expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Reference etl/extract.py:14-23
EXCLUDED_DIRS = (
    ".git",
    ".github",
    "Meta_data",
    "__pycache__",
    ".venv",
    "venv",
    "node_modules",
    "etl",
)


def read_pol_lines(
    spark: SparkSession,
    scan_dir: str,
    glob: str = "*.pol",
    excluded_dirs: tuple[str, ...] = EXCLUDED_DIRS,
) -> DataFrame:
    """Scan ``scan_dir`` recursively for pool files; one row per text line.

    Columns: value (raw line), source_file (path relative to scan_dir,
    posix), file_name, folder_path, parent_folder, file_size, file_mtime.
    """
    df = (
        spark.read.format("text")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .load(scan_dir)
    )
    path = F.col("_metadata.file_path")
    for d in excluded_dirs:
        df = df.filter(~path.contains(f"/{d}/"))

    # file_path is a file: URI; strip everything up to and including the
    # scan dir to get a posix-relative source_file (reference F6,
    # etl/load.py:58 keys the consolidated store on posix relative paths).
    # r13: plain leftmost substring search instead of a non-greedy regex —
    # this column is evaluated PER LINE (it is the ETL's aggregation key),
    # and the regex form alone cost ~2.6s of the 27M-row reference-corpus
    # aggregate (4.7s -> 2.0s); instr finds the same leftmost match, with
    # the regex's no-match identity preserved by the when-guard.
    scan_posix = scan_dir.rstrip("/").replace("\\", "/")
    rel = _strip_through_marker(path, scan_posix + "/")
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


def _strip_through_marker(col: F.Column, marker: str) -> F.Column:
    """Everything after the FIRST occurrence of ``marker`` in ``col`` —
    the substring twin of ``regexp_replace(col, '^.*?' + marker, '')``
    (non-greedy from the start = leftmost match), including the regex's
    identity behavior when the marker is absent."""
    pos = F.instr(col, F.lit(marker))
    return F.when(pos > 0, F.substring(col, pos + len(marker), 2_147_483_647)).otherwise(
        col
    )


def read_pol_lines_any_encoding(
    spark: SparkSession,
    scan_dir: str,
    glob: str = "*.pol",
    excluded_dirs: tuple[str, ...] = EXCLUDED_DIRS,
) -> DataFrame:
    """S4-faithful scan: like ``read_pol_lines`` but tolerating non-UTF8
    files via the reference's effective decode chain (valid UTF-8 ->
    utf-8, else latin-1 — see module docstring for why the 5-step chain
    reduces to this). Adds an ``encoding`` column ('utf-8' | 'latin-1')
    so pipelines can count salvaged files.

    Scale note: ``binaryFile`` materializes one file per row (bounded by
    a pool file's ~10 MB size, exactly like the reference's whole-file
    read at etl/extract.py:152) and does not split large files across
    tasks. Parallelism comes from file count — the right trade for a
    fleet of millions of small pool files; keep the streaming text source
    for known-UTF8 corpora."""
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .load(scan_dir)
    )
    path = F.col("path")
    for d in excluded_dirs:
        df = df.filter(~path.contains(f"/{d}/"))

    valid = F.is_valid_utf8("content")
    text = F.when(valid, F.decode("content", "UTF-8")).otherwise(
        F.decode("content", "ISO-8859-1")
    )
    encoding = F.when(valid, F.lit("utf-8")).otherwise(F.lit("latin-1"))

    scan_posix = scan_dir.rstrip("/").replace("\\", "/")
    rel = _strip_through_marker(path, scan_posix + "/")
    folder = F.when(rel.contains("/"), F.regexp_replace(rel, r"/[^/]+$", "")).otherwise(
        F.lit("root")
    )
    # one trailing newline is a line TERMINATOR, not an empty final line
    # (matches both the text source and the reference's splitlines())
    lines = F.split(F.regexp_replace(text, r"(\r\n|\r|\n)$", ""), r"\r\n|\r|\n")
    return df.select(
        F.explode(lines).alias("value"),
        rel.alias("source_file"),
        F.element_at(F.split(rel, "/"), -1).alias("file_name"),
        folder.alias("folder_path"),
        F.element_at(F.split(folder, "/"), -1).alias("parent_folder"),
        F.col("length").alias("file_size"),
        F.col("modificationTime").alias("file_mtime"),
        encoding.alias("encoding"),
    )


#: columns that identify one pool file in every downstream operator
POOL_KEY_COLS = ["source_file", "file_name", "folder_path", "parent_folder", "pool_id", "pool_type"]


def parse_pol_lines(
    lines: DataFrame, keep_invalid: bool = False, with_order: bool = False
) -> DataFrame:
    """Lenient-parse raw lines into (pool key cols, game_win, type_code).

    Mirrors reference P1/P2 semantics:
      * non-integer first token  -> line dropped (try_cast NULL filter);
        with ``keep_invalid=True`` the line is kept with game_win NULL so
        downstream can count raw lines AND valid rows in ONE scan (the
        pipeline's single-pass mode — invalid lines are rare, so the
        extra NULL group per pool in the distribution agg costs nothing)
      * third token, when integer, is ADDED to the value
      * type code (second token) is carried along (the reference's current
        code discards it, but the README-era per-type statistics R12-R14
        consume it)
      * filename ``Pool_<pool_id>_<pool_type>.pol`` -> id/type as STRINGS
        (leading zeros are semantic; never integer-cast)
    """
    toks = F.split(F.trim(F.col("value")), r"\s+")
    base = F.get(toks, 0).try_cast("long")
    extra = F.coalesce(F.get(toks, 2).try_cast("long"), F.lit(0))
    stem = F.regexp_replace(F.col("file_name"), r"\.pol$", "")
    parts = F.split(stem, "_")

    out = lines.withColumn("game_win", base + extra)
    if not keep_invalid:
        out = out.where(F.col("game_win").isNotNull())
    out = (
        out.withColumn("type_code", F.nullif(F.get(toks, 1), F.lit("")))
        .withColumn("pool_id", F.get(parts, 1))
        .withColumn("pool_type", F.get(parts, 2))
    )
    cols = [*POOL_KEY_COLS, "game_win", "type_code"]
    if with_order:
        # file-order sequence for first/last-k sampling (R15): assigned at
        # scan time, before any shuffle. Within a split this follows file
        # order; files larger than maxPartitionBytes span splits whose
        # partition indices follow offset order for a single file listing.
        out = out.withColumn("_order", F.monotonically_increasing_id())
        cols.append("_order")
    return out.select(*cols)


def pol_file_inventory(lines: DataFrame) -> DataFrame:
    """One row per discovered file with raw line_count (S6) — kept separate
    from the parsed stream so files whose every line fails the lenient parse
    still produce a (size=0, null-metric) output record like the reference's
    per-file loop does."""
    stem = F.regexp_replace(F.col("file_name"), r"\.pol$", "")
    parts = F.split(stem, "_")
    return (
        lines.groupBy("source_file", "file_name", "folder_path", "parent_folder")
        .agg(F.count(F.lit(1)).alias("line_count"), F.first("file_size").alias("file_size"))
        .withColumn("pool_id", F.get(parts, 1))
        .withColumn("pool_type", F.get(parts, 2))
    )
