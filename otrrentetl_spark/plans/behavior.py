"""Event-behavior analytics: ordered funnel conversion and weekly
retention cohorts — the two canonical product-analytics shapes over an
append-only event log.

Scale shapes: every stage keys by user_id, so the three funnel joins
and the cohort join reuse one hash partitioning (co-partitioned
shuffles; AQE coalesces); outputs are aggregate-tiny.

Reference parity: the reference's analytics stop at COUNT over filters
(SURVEY.md §2.6); these are §7.5 capability completion over the events
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otrrentetl_spark.catalog import load_table
from otrrentetl_spark.registry import register


def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel: first view → first click after it →
    first purchase after that. One row out: stage counts + conversion
    rates."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase")))
    )
    return counts.select(
        "n_view",
        "n_click",
        "n_purchase",
        (F.col("n_click").cast("double") / F.col("n_view")).alias("rate_view_click"),
        (F.col("n_purchase").cast("double") / F.col("n_click")).alias(
            "rate_click_purchase"
        ),
    )


register(
    "funnel_view_click_purchase",
    funnel_view_click_purchase,
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY 1
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY 1
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_click,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchase,
           (SELECT CAST(COUNT(*) AS DOUBLE) FROM c)
             / (SELECT COUNT(*) FROM v) AS rate_view_click,
           (SELECT CAST(COUNT(*) AS DOUBLE) FROM p)
             / (SELECT COUNT(*) FROM c) AS rate_click_purchase
    """,
)


def retention_weekly_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: cohort = Monday-truncated week of a
    user's first event; one row per (cohort_week, week_offset) with
    the count of distinct users active that week."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("w")
    )
    firsts = ev.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    acts = ev.distinct()
    return (
        acts.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.expr(
                "(unix_seconds(w) - unix_seconds(cohort_week)) div 604800"
            ).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


register(
    "retention_weekly_cohorts",
    retention_weekly_cohorts,
    """
    WITH ew AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    ), firsts AS (
      SELECT user_id, MIN(w) AS cohort_week FROM ew GROUP BY 1
    )
    SELECT f.cohort_week,
           (CAST(epoch(ew.w) AS BIGINT) - CAST(epoch(f.cohort_week) AS BIGINT))
             // 604800 AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM ew JOIN firsts f ON ew.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
