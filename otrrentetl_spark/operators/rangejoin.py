"""Range join (point-in-interval) without a nested-loop plan.

A theta predicate `p.ts BETWEEN i.start AND i.end` gives Catalyst no
equi-key, so the naive plan is BroadcastNestedLoopJoin — O(|points| ×
|intervals|), a wall at scale. The standard rewrite: quantize time
into fixed-width buckets, explode each interval into the buckets it
overlaps, key each point by its single bucket, equi-join on bucket,
then re-verify the exact predicate. Join cost collapses to
O(points + interval-days) through a hash join, shuffles are
AQE-sized, and bucket width tunes the explode factor vs selectivity
(width ≈ median interval length is a good default).

A point's bucket overlaps an interval's bucket list exactly once per
interval, so the rewrite produces no duplicate candidates and needs
no dedup — only the exact-predicate filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Inner join of points to every interval containing them
    (inclusive bounds), as bucket-equi-join + exact verify.

    Buckets are epoch-quantized indexes (`unix_ts div width`) — plain
    long arithmetic, codegen-friendly, and free of the one-window-per-
    plan restriction `F.window` would hit. Returns all columns of both
    inputs; callers project/aggregate on top. Column names must not
    collide across the two inputs.
    """

    def bucket_of(c: Column) -> Column:
        return (F.unix_timestamp(c) / bucket_seconds).cast("long")

    exploded = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(bucket_of(F.col(start)), bucket_of(F.col(end)))
        ),
    )
    keyed = points.withColumn("__bucket", bucket_of(F.col(point_ts)))
    return (
        keyed.join(exploded, "__bucket", "inner")
        .filter(F.col(point_ts).between(F.col(start), F.col(end)))
        .drop("__bucket")
    )
