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


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transitions: per-user lag gives (prev →
    curr) event-type pairs; output counts and the row-normalized
    transition probability (exact integer counts → deterministic
    double division)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("curr_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_total = F.sum("n").over(Window.partitionBy("prev_type"))
    return pairs.select(
        "prev_type",
        "curr_type",
        "n",
        (F.col("n").cast("double") / row_total).alias("p_transition"),
    )


register(
    "event_transition_matrix",
    event_transition_matrix,
    """
    WITH pairs AS (
      SELECT prev_type, event_type AS curr_type, COUNT(*) AS n
      FROM (
        SELECT user_id, event_type, 
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
      )
      WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT prev_type, curr_type, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type)
             AS p_transition
    FROM pairs
    """,
)


def user_spend_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration metrics over per-user total spend (integer
    cents): Gini coefficient via the sorted-rank formula
    Σ((2i−n−1)·xᵢ)/(n·Σx) — all integer sums in DECIMAL, one double
    division at the end. One row out. The global rank window is the
    only total sort; it runs over |users| rows (aggregate-sized), not
    the event log."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100.0, 0).cast("long")
    spend = ev.groupBy("user_id").agg(F.sum(cents).alias("x"))
    w = Window.orderBy("x", "user_id")
    ranked = spend.select(
        "x", F.row_number().over(w).alias("i"), "user_id"
    )
    stats = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(
            ((F.lit(2) * F.col("i") - F.lit(1)) * F.col("x")).cast("decimal(38,0)")
        ).alias("swx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    swx = F.col("swx").cast("double")
    gini = (swx - (n + F.lit(1.0)) * sx) / (n * sx)
    return stats.select(
        F.col("n").alias("n_users"),
        F.round(gini, 9).alias("gini"),
    )


register(
    "user_spend_inequality",
    user_spend_inequality,
    """
    WITH spend AS (
      SELECT user_id, SUM(CAST(ROUND(value * 100.0, 0) AS BIGINT)) AS x
      FROM events GROUP BY 1
    ), ranked AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY x, user_id) AS i FROM spend
    ), s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST((2 * i - 1) * x AS DECIMAL(38,0))) AS DOUBLE) AS swx
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           ROUND((swx - (n + 1.0) * sx) / (n * sx), 9) AS gini
    FROM s
    """,
)


def user_type_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini–Simpson diversity (1 − Σpᵢ²) of each user's event-type
    mix — the log-free diversity index (entropy needs ln, which is
    not bit-portable across libm implementations). Exact integer
    counts; the Σpᵢ² rational is evaluated with one shared IEEE
    expression."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        counts.groupBy("user_id")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.col("c")).alias("ss"),
            F.count(F.lit(1)).alias("n_types"),
        )
        .select(
            "user_id",
            "n_types",
            (
                F.lit(1.0)
                - F.col("ss").cast("double")
                / (F.col("n").cast("double") * F.col("n").cast("double"))
            ).alias("gini_simpson"),
        )
    )


register(
    "user_type_diversity",
    user_type_diversity,
    """
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           1.0 - CAST(SUM(c * c) AS DOUBLE)
                 / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE))
             AS gini_simpson
    FROM counts GROUP BY user_id
    """,
)
