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

    ``how`` is restricted to inner/left joins: the dimension is
    replicated ``salt_factor`` times, so a right/full outer join would
    emit every unmatched dim row once per replica.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only (got {how!r}): "
            "outer join types would duplicate unmatched dim rows "
            "salt_factor times"
        )
    if salt_source is not None:
        salt = F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt_factor))
    else:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_factor))
    salted_fact = fact.withColumn("_salt", salt.cast("int"))
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    return salted_fact.join(replicated_dim, [key, "_salt"], how).drop("_salt")
