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
