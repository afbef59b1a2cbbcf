"""Custom join operators Spark lacks natively.

``range_join``: interval containment (fact.time BETWEEN interval.start
AND interval.end). Naively expressed, Catalyst plans a non-equi
condition join as BroadcastNestedLoopJoin — quadratic work and the exact
node the plan-hygiene suite bans. The bucketized form restores an
equi-join: bucket both sides on floor(time / W); each interval EXPLODES
into the buckets it spans (bounded by interval_length/W + 1 rows), each
fact lands in exactly ONE bucket, so the hash join on (keys..., bucket)
followed by the exact BETWEEN verify emits every true match exactly once
— no dedup shuffle. Cost: shuffle of facts + intervals x spanned-bucket
fan-out; pick ``bucket_width`` near the typical interval length so the
fan-out stays ~2. Skewed hot buckets respond to the usual levers (AQE
skew join, functions/skew.salted_join on the bucket key).

(The as-of join — the other classic time join — is the union + carry-
forward window merge in plans/relational.py::asof_click_before_error.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    fact_time_col: str,
    start_col: str,
    end_col: str,
    keys: Sequence[str] = (),
    bucket_width: int = 86_400_000_000,
) -> DataFrame:
    """Join each fact row to every interval row containing its timestamp
    (inclusive bounds), optionally also matching on equi-``keys``.
    Times are integers (e.g. epoch micros) so the containment predicate
    is exact on both engines. Output: fact columns + interval columns
    (minus the helper bucket)."""
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive (got {bucket_width})")
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width),
                F.floor(F.col(end_col) / bucket_width),
            )
        ),
    )
    f = facts.withColumn("_b", F.floor(F.col(fact_time_col) / bucket_width))
    return (
        f.join(i, ["_b", *keys])
        .where(
            (F.col(fact_time_col) >= F.col(start_col))
            & (F.col(fact_time_col) <= F.col(end_col))
        )
        .drop("_b")
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    keys: Sequence[str] = (),
    bucket_width: int = 86_400_000_000,
) -> DataFrame:
    """Interval x interval overlap join: every (a, b) pair whose closed
    intervals intersect (``a_start <= b_end AND b_start <= a_end``),
    optionally also matching on equi-``keys``.

    Same bucketization as ``range_join``, but BOTH sides explode into the
    buckets they span, so overlapping pairs meet in every shared bucket.
    Rather than a dedup shuffle, each true pair is kept only in its
    CANONICAL bucket — the one containing the overlap's start,
    ``floor(greatest(a_start, b_start) / W)``, which both intervals
    provably span — so every match is emitted exactly once. Cost is the
    same equi-join shape: shuffle of (bucket, keys) with per-interval
    fan-out ~ length/W + 1; pick ``bucket_width`` near the typical
    interval length. Column names across ``a`` and ``b`` must not
    collide (rename before calling, as with any self-join)."""
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive (got {bucket_width})")
    ea = a.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(a_start) / bucket_width),
                F.floor(F.col(a_end) / bucket_width),
            )
        ),
    )
    eb = b.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(b_start) / bucket_width),
                F.floor(F.col(b_end) / bucket_width),
            )
        ),
    )
    return (
        ea.join(eb, ["_b", *keys])
        .where(
            (F.col(a_start) <= F.col(b_end))
            & (F.col(b_start) <= F.col(a_end))
            & (F.col("_b") == F.floor(F.greatest(F.col(a_start), F.col(b_start)) / bucket_width))
        )
        .drop("_b")
    )
