"""As-of join — the temporal operator Spark lacks natively, built as a
composition of existing DataFrame ops (the preferred custom-operator
tier: no UDF, no mapPartitions).

For each left row, attach the value of the LATEST right row with
``right.ts <= left.ts`` within the same key. The distributed
formulation is union + running ``last(..., ignorenulls)`` window:

    union(left tagged 1, right tagged 0)
      → window PARTITION BY key ORDER BY (ts, tag[, value])
      → last(right_value) ignoreNulls over rows UNBOUNDED PRECEDING
      → keep left rows

One shuffle on the key, state bounded by the window frame, no
range-condition join (which Catalyst would execute as a broadcast
nested loop — quadratic per key). Right rows sort before left rows at
equal ts, making the match inclusive. Determinism against duplicate
right rows at one (key, ts): for a single value column the value
itself is the final window-order key, so the running ``last`` picks
exactly the max-value row — same result as pre-aggregating
``max(value)`` per (key, ts) without that aggregation's extra
exchange (optimization guide §2.4); with several value columns the
per-column max is a genuine aggregate and the pre-dedup pass stays.

At 100 TB: partition count follows the key-hash shuffle; per-key state
in the running window is O(1) (a single carried value), so skewed keys
cost sort time but not memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_carry(
    unioned: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
    left_cols: list[str],
    suffix: str = "_asof",
    order_tiebreak: list[Column] | None = None,
) -> DataFrame:
    """The window half of the as-of join, usable directly on a
    pre-built tagged union frame.

    ``unioned`` must carry: the key ``on``, the timestamp ``ts``,
    ``__tag`` (0 = right rows, 1 = left rows), ``__r_<c>`` for each
    value column (NULL on left rows), and ``__l`` (a struct of the
    left columns, NULL on right rows). Building that frame from ONE
    scan — e.g. when left and right are disjoint filters of the same
    table — halves the input I/O versus two scans + Union."""
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col(ts).asc(), F.col("__tag").asc(), *(order_tiebreak or [])
        )
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
    if len(value_cols) == 1:
        # Deterministic without the pre-dedup exchange: the value
        # column joins the window order, so among duplicate right rows
        # at one (key, ts) the running last() lands on the max value —
        # exactly what the groupBy/max produced. NULL values sort
        # first and are skipped by ignorenulls either way.
        right_d = right
        tiebreak = [F.col(f"__r_{value_cols[0]}").asc()]
    else:
        # Per-column max across same-(key, ts) rows is a genuine
        # aggregate; keep the dedup pass.
        right_d = right.groupBy(on, ts).agg(
            *[F.max(c).alias(c) for c in value_cols]
        )
        tiebreak = []
    l_tag = left.withColumn("__tag", F.lit(1))
    r_tag = right_d.withColumn("__tag", F.lit(0))
    left_cols = [c for c in left.columns]
    unioned = l_tag.select(
        on,
        ts,
        "__tag",
        *[
            F.lit(None)
            .cast(right_d.schema[c].dataType)
            .alias(f"__r_{c}")
            for c in value_cols
        ],
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
    return asof_carry(
        unioned, on, ts, value_cols, left_cols, suffix, tiebreak
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
