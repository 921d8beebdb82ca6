"""Time-series aggregation shapes: OHLC bars and time-weighted
averages over the event stream — the ops a metrics/trading-style
consumer of the engine would run.

Determinism: open/close use arg_min/arg_max on a composite integer
key (epoch-µs·4096 + event_id mod 4096 — fits int64, total order
shared by both engines); TWAP weights are exact integer µs durations
and integer cents, summed in DECIMAL(38,0), so the final double
division is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from otrrentetl_spark.catalog import load_table
from otrrentetl_spark.registry import register


def ohlc_hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close in integer cents) per
    event_type: open/close via arg-min/arg-max over the composite
    time key — one partial-aggregated shuffle, no window sort."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100.0, 0).cast("long")
    ordk = F.unix_micros("ts") * F.lit(4096) + F.col("event_id") % 4096
    return (
        ev.select(
            F.date_trunc("hour", "ts").alias("bar_hour"),
            "event_type",
            cents.alias("cents"),
            ordk.alias("ordk"),
        )
        .groupBy("bar_hour", "event_type")
        .agg(
            F.min_by("cents", "ordk").alias("open_cents"),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.max_by("cents", "ordk").alias("close_cents"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


register(
    "ohlc_hourly_bars",
    ohlc_hourly_bars,
    """
    WITH t AS (
      SELECT date_trunc('hour', ts) AS bar_hour, event_type,
             CAST(ROUND(value * 100.0, 0) AS BIGINT) AS cents,
             epoch_us(ts) * 4096 + event_id % 4096 AS ordk
      FROM events
    )
    SELECT bar_hour, event_type,
           arg_min(cents, ordk) AS open_cents,
           MAX(cents) AS high_cents,
           MIN(cents) AS low_cents,
           arg_max(cents, ordk) AS close_cents,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM t GROUP BY 1, 2
    """,
)


def twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user: each event's cents hold
    until the user's next event (lead), weighted by the exact µs
    duration; one per-user window + one aggregate. Users with a
    single event (no closed interval) drop out — both engines agree
    on that rule."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.round(F.col("value") * 100.0, 0).cast("long")
    timed = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            cents.alias("cents"),
        )
        .withColumn(
            "dur_us", F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
        )
        .filter(F.col("dur_us").isNotNull())
    )
    return timed.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        (
            F.sum((F.col("cents") * F.col("dur_us")).cast("decimal(38,0)"))
            .cast("double")
            / F.sum(F.col("dur_us").cast("decimal(38,0)")).cast("double")
            / F.lit(100.0)
        ).alias("twap_value"),
    )


register(
    "twap_user_value",
    twap_user_value,
    """
    WITH timed AS (
      SELECT user_id,
             CAST(ROUND(value * 100.0, 0) AS BIGINT) AS cents,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
               - epoch_us(ts) AS dur_us
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(CAST(cents * dur_us AS DECIMAL(38,0))) AS DOUBLE)
             / CAST(SUM(CAST(dur_us AS DECIMAL(38,0))) AS DOUBLE)
             / 100.0 AS twap_value
    FROM timed WHERE dur_us IS NOT NULL
    GROUP BY user_id
    """,
)
