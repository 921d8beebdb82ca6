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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int = 86_400 * 7,
) -> DataFrame:
    """Interval × interval overlap join as bucket-equi-join + exact
    verify. Two intervals that overlap share at least one time bucket
    (any overlap instant lands in the same bucket on both sides), so
    exploding BOTH sides into covered buckets and equi-joining finds
    every overlapping pair; unlike the point case a pair can share
    several buckets, so candidates are de-duplicated before the exact
    `l.start <= r.end AND r.start <= l.end` filter. Bucket width
    trades explode factor (≈ interval_len/width + 1 rows per
    interval) against candidate selectivity — width ≈ max interval
    length keeps both O(1).

    Column names must not collide across the two inputs; returns all
    columns of both."""

    def buckets(s: str, e: str) -> Column:
        b = lambda c: (F.unix_timestamp(F.col(c)) / bucket_seconds).cast("long")
        return F.explode(F.sequence(b(s), b(e)))

    l = left.withColumn("__bucket", buckets(l_start, l_end))
    r = right.withColumn("__bucket", buckets(r_start, r_end))
    return (
        l.join(r, "__bucket", "inner")
        .drop("__bucket")
        .dropDuplicates()
        .filter(
            (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
        )
    )
