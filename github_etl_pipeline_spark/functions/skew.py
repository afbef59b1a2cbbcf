"""Skew-handling join utility (SURVEY §4 / 100-TB design note).

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled`` is on in the session factory);
``salted_join`` is the explicit lever for the pathological case AQE
can't fix — a broadcast-ineligible dimension joined on a key where a few
values dominate the fact side. The fact side gets a random-ish salt
(deterministic: hash of a row id), the dimension is replicated
``salt_factor`` times, and the join key becomes (key, salt) — spreading
each hot key over ``salt_factor`` reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_factor: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on ``key`` with the fact side
    salted over ``salt_factor`` buckets.

    ``salt_source`` — a fact column whose hash picks the salt (defaults
    to a per-partition-deterministic spread via ``spark_partition_id`` +
    monotonic id). The result equals a plain join (verified by test);
    only the shuffle distribution changes.

    All four join types are supported. Inner/left run directly on the
    salted keys. Right/full need care: the dimension is replicated
    ``salt_factor`` times, so a naive right/full outer would emit every
    unmatched dim row once per replica. Instead they are composed from
    salted building blocks with exact outer semantics:

      * right  = salted INNER join  ∪  dim rows with no matching fact key
      * full   = salted LEFT join   ∪  dim rows with no matching fact key

    The "no matching fact key" set comes from an anti join of ``dim``
    against ``fact``'s DISTINCT keys — the distinct is a hash aggregate
    with map-side partial combine, so a hot fact key collapses to one
    row per task before any shuffle and the anti probe sees no skew.
    Unmatched dim rows get NULL for every fact column (unionByName with
    allowMissingColumns), exactly like a plain outer join.

    NULL-key semantics match a plain join on every path: null fact keys
    never match (and are preserved by left/full with NULL dim columns);
    null-key dim rows are unmatched (and are emitted by right/full).
    """
    aliases = {
        "inner": "inner",
        "left": "left", "left_outer": "left", "leftouter": "left",
        "right": "right", "right_outer": "right", "rightouter": "right",
        "full": "full", "full_outer": "full", "fullouter": "full", "outer": "full",
    }
    if how not in aliases:
        raise ValueError(
            f"salted_join: unsupported join type {how!r} "
            f"(supported: {sorted(set(aliases))})"
        )
    how = aliases[how]

    if salt_source is not None:
        salt = F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt_factor))
    else:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_factor))
    salted_fact = fact.withColumn("_salt", salt.cast("int"))
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )

    if how in ("inner", "left"):
        return salted_fact.join(replicated_dim, [key, "_salt"], how).drop("_salt")

    base = "inner" if how == "right" else "left"
    matched = salted_fact.join(replicated_dim, [key, "_salt"], base).drop("_salt")
    # dim rows whose key never occurs in fact — distinct() first so the
    # anti probe joins against at most one row per key (skew-immune)
    unmatched_dim = dim.join(fact.select(key).distinct(), key, "left_anti")
    return matched.unionByName(unmatched_dim, allowMissingColumns=True)
