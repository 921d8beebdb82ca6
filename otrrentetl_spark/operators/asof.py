"""As-of join — the temporal operator Spark lacks natively, built as a
composition of existing DataFrame ops (the preferred custom-operator
tier: no UDF, no mapPartitions).

For each left row, attach the value of the LATEST right row with
``right.ts <= left.ts`` within the same key. The distributed
formulation is union + running ``last(..., ignorenulls)`` window:

    union(left tagged 1, right tagged 0)
      → window PARTITION BY key ORDER BY (ts, tag)
      → last(right_value) ignoreNulls over rows UNBOUNDED PRECEDING
      → keep left rows

One shuffle on the key, state bounded by the window frame, no
range-condition join (which Catalyst would execute as a broadcast
nested loop — quadratic per key). Right rows sort before left rows at
equal ts, making the match inclusive, and the right side is first
deduplicated to one row per (key, ts) so the result is deterministic.

At 100 TB: partition count follows the key-hash shuffle; per-key state
in the running window is O(1) (a single carried value), so skewed keys
cost sort time but not memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: ``left`` rows keep all their columns and gain
    ``<value_col><suffix>`` columns from the latest ``right`` row at or
    before their ``ts`` (NULL when no prior right row exists)."""
    # Deterministic right side: one row per (key, ts) — latest write
    # wins by max(); ties otherwise make the match order-dependent.
    right_d = right.groupBy(on, ts).agg(
        *[F.max(c).alias(c) for c in value_cols]
    )
    l_tag = left.withColumn("__tag", F.lit(1))
    r_tag = right_d.withColumn("__tag", F.lit(0))
    left_cols = [c for c in left.columns]
    unioned = l_tag.select(
        on,
        ts,
        "__tag",
        *[F.lit(None).cast(right_d.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.struct(*left_cols).alias("__l"),
    ).unionByName(
        r_tag.select(
            on,
            ts,
            "__tag",
            *[F.col(c).alias(f"__r_{c}") for c in value_cols],
            F.lit(None)
            .cast(l_tag.select(F.struct(*left_cols)).schema[0].dataType)
            .alias("__l"),
        )
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__tag",
        "__l",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__v_{c}")
            for c in value_cols
        ],
    ).filter(F.col("__tag") == 1)
    return carried.select(
        *[F.col(f"__l.{c}").alias(c) for c in left_cols],
        *[F.col(f"__v_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )


def asof_timestamp(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    suffix: str = "_asof",
) -> DataFrame:
    """Convenience: attach only the matched right timestamp (the
    'when was the key last seen' question)."""
    r = right.select(on, ts).withColumn("__seen", F.col(ts))
    return asof_join(left, r, on, ts, ["__seen"], suffix="").withColumnRenamed(
        "__seen", f"{ts}{suffix}"
    )
