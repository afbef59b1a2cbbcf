"""Snapshot diff — change-data-capture between two versions of a keyed
table (the maintenance op behind incremental syncs, audit reports, and
reconciliation: "what changed between yesterday's lake snapshot and
today's?").

Spark-first shape: ONE full-outer hash join on the key plus a row-hash
comparison — no per-column join conditions, no driver materialization.
The row hash is md5 over a canonical string encoding of the compared
columns (portable: DuckDB reproduces it bit-for-bit), so 'changed'
detection costs one 16-byte comparison per matched key regardless of
column count. At 100 TB both snapshots shuffle once on the key; with
pre-bucketed snapshots the join is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"  # unit separator — cannot appear in the testdata columns


def row_fingerprint(cols: list[str]) -> Column:
    """md5 over the SEP-joined canonical string encoding of ``cols``.
    NULL encodes as the literal ``\\x00`` (distinct from the empty
    string and from any real value). Floats must be pre-rounded by the
    caller if engine-portable hashing is required."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols
    ]
    return F.md5(F.concat_ws(SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(key, change_type) for every key present in either snapshot:
    ``added`` (new only), ``removed`` (old only), ``changed`` (both, any
    compared column differs), ``unchanged`` (both, fingerprints equal).

    ``compare_cols`` defaults to all shared non-key columns (sorted for
    a deterministic fingerprint layout).
    """
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns) - {key}
        compare_cols = sorted(shared)
    o = old.select(F.col(key).alias("_k"), row_fingerprint(compare_cols).alias("_ofp"))
    n = new.select(F.col(key).alias("_k"), row_fingerprint(compare_cols).alias("_nfp"))
    j = o.join(n, "_k", "full_outer")
    change = (
        F.when(F.col("_ofp").isNull(), "added")
        .when(F.col("_nfp").isNull(), "removed")
        .when(F.col("_ofp") != F.col("_nfp"), "changed")
        .otherwise("unchanged")
    )
    return j.select(F.col("_k").alias(key), change.alias("change_type"))


def scd2_intervals(
    changes: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Type-2 slowly-changing dimension from a change-event stream.

    Input: one row per observed (key, attrs) state at ``ts_col`` (a
    BIGINT effective time — epoch micros via functions/epoch.py; the
    registry's no-timestamp-output rule applies to the CALLER's choice
    of units). Output: one row per VERSION — key + attrs +
    ``valid_from`` / ``valid_to`` (NULL = current) + ``is_current`` —
    with consecutive observations of an UNCHANGED attribute tuple
    collapsed into one interval (re-stating the same state opens no new
    version, the standard SCD2 ingestion dedup). NULL attribute values
    compare null-safely: NULL -> NULL is "no change", NULL -> value is
    a change.

    Spark-first shape, and why it beats the textbook: warehouse SCD2 is
    usually a per-batch MERGE (join current dimension x batch, close +
    insert) — at 100 TB of history that's a join per batch. A full
    REBUILD from the change log is instead ONE shuffle on the key:
    lag() detects attribute changes and lead() closes the intervals,
    and because both windows share the same (key, order) partitioning
    Catalyst plans a single exchange + sort. Incremental maintenance
    composes from existing pieces: snapshot_diff yields today's change
    rows, which append to the log; re-deriving ONLY the affected keys'
    intervals is this same operator over a key-pruned scan.

    Ordering within a key is (ts, *tiebreak_cols) — pass a tiebreak
    (e.g. an event id) to make simultaneous observations deterministic;
    ``valid_to`` closes at the NEXT version's valid_from (half-open
    [from, to) intervals, the join-friendly convention for as-of
    lookups: ts >= valid_from AND (valid_to IS NULL OR ts < valid_to)).
    """
    tiebreak_cols = tiebreak_cols or []
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(*order)
    state = F.struct(*[F.col(c) for c in attr_cols])
    marked = changes.select(
        *key_cols, *attr_cols, ts_col, *tiebreak_cols
    ).withColumn("_chg", ~state.eqNullSafe(F.lag(state).over(w)))
    # first row per key: lag is NULL -> eqNullSafe False -> _chg True
    versions = marked.filter(F.col("_chg"))
    wv = Window.partitionBy(*key_cols).orderBy(*order)
    out = versions.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(wv).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
    return out
