"""Event-time window aggregations — Spark's unified batch/stream model.

Every builder here takes a DataFrame that may be either a batch read
or a ``readStream`` of the same schema and returns the aggregated
DataFrame; the SAME code path serves interactive queries, the DuckDB
correctness oracles (batch), and the Structured Streaming jobs in
``streaming.jobs``. That unification — not a separate streaming
operator set — is the idiomatic Spark answer to the reference's
timer-driven micro-batch loop (SURVEY.md §2.10, runetl.py:39-66).

Scale posture: windowed aggregation shuffles on (window, key); the
watermark bounds state so a 100 TB / unbounded stream keeps constant
memory per key. The 10-day default watermark mirrors the reference's
10-day backfill tolerance (runetl.py:49-59).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "10 days"


def with_watermark(events: DataFrame, delay: str = DEFAULT_WATERMARK) -> DataFrame:
    """Accept late events up to ``delay`` behind the max observed ts —
    the streaming analog of the reference's sliding backfill window
    (I3). No-op on batch DataFrames (Spark ignores it there)."""
    return events.withWatermark("ts", delay)


def tumbling_counts(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Non-overlapping fixed windows per event_type: count + value sum.

    Column layout is flattened (window_start/window_end) so batch
    oracles and sinks see plain columns, not a struct.
    """
    w = F.window("ts", duration)
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_stats(
    events: DataFrame, duration: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Overlapping windows (each event lands in duration/slide of
    them): count + mean value per window."""
    w = F.window("ts", duration, slide)
    return (
        events.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.col("value").cast("decimal(30,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "avg_value",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user sessions: a session extends while consecutive events
    arrive within ``gap``; ``session_window`` end = last event + gap.
    The classic gaps-and-islands computation, expressed natively."""
    w = F.session_window("ts", gap)
    return (
        events.groupBy(w.alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
