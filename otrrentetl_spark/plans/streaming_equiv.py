"""Batch-equivalence oracles for the streaming slice (SURVEY.md §7.6).

DuckDB cannot run a stream, but Spark's unified model means the SAME
window builders (streaming.windows) run on a batch read of `events` —
so the windowed-aggregation semantics (tumbling / sliding / session,
the engine's I1–I3 analogs) are oracle-checked here, and the
*streaming execution* of the identical builders is exercised by
tests/test_streaming.py (readStream → availableNow → memory/merge
sink).

Alignment notes (load-bearing for hash equality):
- Spark `window(ts, d)` buckets are epoch-aligned; DuckDB
  `time_bucket(INTERVAL d, ts)` aligns to 2000-01-01, which coincides
  with epoch alignment for divisors of a day (1 h, 15 min).
- Spark `session_window` ends at last_event + gap, and an event at
  exactly `prev_ts + gap` starts a NEW session (end-exclusive) — the
  DuckDB gaps-and-islands replay uses `>=` on the gap accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from otrrentetl_spark.catalog import load_table
from otrrentetl_spark.registry import register
from otrrentetl_spark.streaming import windows


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1/tumbling: hourly event_type counts + value sums — the exact
    builder the streaming job runs (streaming.jobs.run_tumbling_merge_job)."""
    return windows.tumbling_counts(_events(spark, sf_dir), "1 hour").orderBy(
        "window_start", "event_type"
    )


register(
    "stream_tumbling_window",
    stream_tumbling_window,
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
)


def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h / 15 min): each event contributes to 4
    overlapping windows."""
    return windows.sliding_stats(
        _events(spark, sf_dir), "1 hour", "15 minutes"
    ).orderBy("window_start")


register(
    "stream_sliding_window",
    stream_sliding_window,
    """
    WITH expanded AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts)
               - k.k * INTERVAL '15 minutes' AS window_start,
             value
      FROM events
      CROSS JOIN (SELECT unnest(range(4)) AS k) k
    )
    SELECT window_start,
           window_start + INTERVAL '1 hour' AS window_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
             AS avg_value
    FROM expanded
    GROUP BY 1, 2
    ORDER BY window_start
    """,
)


def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-minute-gap sessions (session_window): count + value
    sum, session_end = last event + gap."""
    return windows.session_windows(_events(spark, sf_dir), "30 minutes").orderBy(
        "user_id", "session_start"
    )


register(
    "stream_session_window",
    stream_session_window,
    """
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
