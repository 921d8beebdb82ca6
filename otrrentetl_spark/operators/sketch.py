"""Count-min sketch: fixed-size mergeable frequency estimation.

The missing piece between exact groupBy counts (unbounded state) and
approx_count_distinct (cardinality only): CMS answers "how often does
key x occur" with bounded memory — depth x width counters — and a
one-sided error guarantee (estimate >= true count, overshoot bounded
by N·e/width per row of the sketch).

Scale shape (why this matters at 100 TB): the sketch is a GROUPED
COUNT over (depth, bucket) — partial aggregation collapses each map
task's contribution to at most depth*width rows before the exchange,
so the shuffle volume is O(depth*width*partitions) regardless of the
corpus' key cardinality. Sketches built on different days/partitions
MERGE by adding counters (a union + re-aggregate here), which is what
makes CMS the streaming/incremental answer — state never grows.

Hashing is the engine's md5-derived hash_long family (seeded per
depth row), so an external engine can replay the sketch bit-for-bit —
the DuckDB oracle does exactly that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from otrrentetl_spark.operators.text import hash_long


def _buckets(col: Column | str, depth: int, width: int) -> Column:
    """Array of ``depth`` bucket indexes for a key, one per hash row."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array(
        *[
            F.pmod(hash_long(c, seed=f"cms{j}:"), F.lit(width))
            for j in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch: (d, bucket, cnt) rows — at most depth*width of
    them. One narrow projection + one grouped count (single shuffle of
    pre-aggregated map output)."""
    return (
        df.select(F.posexplode(_buckets(col, depth, width)).alias("d", "bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): counters add."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate each key in ``keys``: min over the depth rows of
    the key's counter. The keys frame is the small side (candidate set)
    — exploded to depth rows and hash-joined against the sketch."""
    keyed = keys.select(
        F.col(col), F.posexplode(_buckets(col, depth, width)).alias("d", "bucket")
    )
    return (
        keyed.join(sketch, ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
