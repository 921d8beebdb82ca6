"""Temporal operators over the events table: as-of join (checked
against DuckDB's native ASOF JOIN) — the union+window formulation that
scales where a range-predicate join would go quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otrrentetl_spark.catalog import load_table
from otrrentetl_spark.operators.asof import asof_carry
from otrrentetl_spark.registry import register


def asof_click_to_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click event annotated with the value of the same user's
    most recent prior (or simultaneous) view event.

    Left (clicks) and right (views) are disjoint filters of the SAME
    table, so the as-of union frame is built from ONE events scan
    (row-wise conditional projection) instead of two scans + Union —
    at scale that halves the input I/O of this query (guide §6). The
    window half is the shared ``asof_carry``."""
    ev = load_table(spark, sf_dir, "events")
    is_click = F.col("event_type") == "click"
    tagged = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        "ts",
        F.when(is_click, F.lit(1)).otherwise(F.lit(0)).alias("__tag"),
        F.when(~is_click, F.col("value")).alias("__r_value"),
        F.when(
            is_click, F.struct("event_id", "user_id", "ts")
        ).alias("__l"),
    )
    return asof_carry(
        tagged,
        on="user_id",
        ts="ts",
        value_cols=["value"],
        left_cols=["event_id", "user_id", "ts"],
        order_tiebreak=[F.col("__r_value").asc()],
    ).withColumnRenamed("value_asof", "view_value_asof")


register(
    "asof_click_to_view",
    asof_click_to_view,
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), views AS (
      SELECT user_id, ts, MAX(value) AS value
      FROM events WHERE event_type = 'view' GROUP BY 1, 2
    )
    SELECT c.event_id, c.user_id, c.ts, v.value AS view_value_asof
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    ORDER BY c.event_id
    """,
)


# ------------------------------------------------ batch gap-sessionization
_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def sessionize_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in batch: a new session starts when a
    user's inter-event gap exceeds 30 minutes. Two stacked windows
    (lag → boundary flag → running sum = session id), both partitioned
    by user_id, so state is bounded per user and the sort runs inside
    each hash partition — no global ordering anywhere.

    This is the batch face of `stream_session_window`
    (session_window in Structured Streaming computes the same
    grouping incrementally)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts"), 1).over(w)
    is_new = (gap.isNull() | (gap > _SESSION_GAP_US)).cast("long")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ev.select("user_id", "event_id", "ts", is_new.alias("brk"))
        .withColumn("session_id", F.sum("brk").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("t0"),
            F.max("ts").alias("t1"),
            (
                (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts")))
                .cast("double")
                / F.lit(1_000_000.0)
            ).alias("duration_s"),
        )
        
    )


register(
    "sessionize_event_gaps",
    sessionize_event_gaps,
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w
                       IS NOT DISTINCT FROM NULL
                  OR epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT)
               AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS t0, max(ts) AS t1,
           CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS DOUBLE) / 1000000.0
             AS duration_s
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)


# --------------------------------------------------- SCD2 history build
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from an event log: per
    user, collapse consecutive events with the same event_type into
    one versioned state row with [valid_from, valid_to) and an
    is_current flag. Two windows, both partitioned by user_id — the
    sort is per-user inside one hash partition, never global.

    The change-detection (lag) and interval-closing (lead over the
    *filtered* change rows) are the standard warehouse idiom for
    deriving dimension history from an append-only log."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


register(
    "scd2_user_state_history",
    scd2_user_state_history,
    """
    WITH changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      )
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
           LEAD(ts) OVER w IS NULL AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
