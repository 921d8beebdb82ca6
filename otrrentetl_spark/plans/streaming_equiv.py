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

from pyspark.sql import functions as F

from otrrentetl_spark.catalog import load_table
from otrrentetl_spark.registry import register
from otrrentetl_spark.streaming import dedup as sdedup
from otrrentetl_spark.streaming import joins as sjoins
from otrrentetl_spark.streaming import windows


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1/tumbling: hourly event_type counts + value sums — the exact
    builder the streaming job runs (streaming.jobs.run_tumbling_merge_job)."""
    return windows.tumbling_counts(_events(spark, sf_dir), "1 hour")


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
    )


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
    return windows.session_windows(_events(spark, sf_dir), "30 minutes")


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


def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed exactly-once dedup of an at-least-once feed: the corpus is
    unioned with a re-delivered copy of every 10th event (jittered ts —
    real replays aren't byte-identical), then deduped on event_id
    keeping one row per key. Batch face of streaming.dedup.dedup_stream
    (dropDuplicatesWithinWatermark); the oracle replays it as a
    min-per-key aggregate, so survivor choice is made deterministic by
    re-sorting on the key columns only."""
    ev = _events(spark, sf_dir).select("event_id", "ts", "user_id", "event_type")
    redelivered = ev.filter(F.col("event_id") % 10 == 0).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 3 seconds")
    )
    deduped = sdedup.dedup_batch(ev.unionByName(redelivered), ["event_id"])
    return (
        deduped.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique"))
        
    )


register(
    "stream_dedup_events",
    stream_dedup_events,
    """
    WITH feed AS (
      SELECT event_id, event_type FROM events
      UNION ALL
      SELECT event_id, event_type FROM events WHERE event_id % 10 = 0
    )
    SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
    FROM feed GROUP BY event_type ORDER BY event_type
    """,
)


def stream_view_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (batch face): views joined to same-
    user clicks within 10 minutes. The streaming execution of the SAME
    builder — watermarked both sides, state bounded by watermark +
    horizon — runs in tests/test_streaming_dedup.py."""
    return sjoins.view_click_join(
        _events(spark, sf_dir), horizon="10 minutes", watermark=None
    )


register(
    "stream_view_click_join",
    stream_view_click_join,
    """
    SELECT v.user_id, v.event_id AS view_id, v.ts AS view_ts,
           c.event_id AS click_id, c.ts AS click_ts
    FROM events v
    JOIN events c
      ON c.user_id = v.user_id
     AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL '10 minutes'
    WHERE v.event_type = 'view' AND c.event_type = 'click'
    ORDER BY view_id, click_id
    """,
)


def stream_running_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator through REAL streaming execution:
    applyInPandasWithState (streaming.stateful.running_user_stats) over
    a file stream of `events`, availableNow trigger, memory sink. The
    returned frame is the final per-user (count, sum, last_seen) state.

    Oracle-checked against the batch face (plain GROUP BY in DuckDB):
    the kernel accumulates the sum in integer cents, so the streaming
    fixpoint is bit-identical to the batch aggregate no matter how the
    stream was micro-batched. Cross-micro-batch state carry is
    additionally asserted in tests/test_stateful_streaming.py."""
    import hashlib
    import os
    import shutil
    import tempfile

    from otrrentetl_spark.catalog import read_events_stream
    from otrrentetl_spark.streaming.stateful import running_user_stats

    # file streaming sources read directories; stage the single-file
    # table into one (at scale the source IS a directory of files).
    # Stable per-corpus scratch CLEARED on entry (the same no-mkdtemp
    # rule as llm_ops._ann_scratch — repeated cert/bench cycles were
    # accumulating a corpus copy + checkpoint per invocation); the
    # clear also guarantees a FRESH checkpoint, which availableNow
    # replay correctness requires (a reused one would resume past the
    # staged data and return an empty state table).
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    root = f"{tempfile.gettempdir()}/otrrentetl_evstream_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    src_dir = f"{root}/src"
    os.makedirs(src_dir)
    shutil.copy(f"{sf_dir.rstrip('/')}/events.parquet", f"{src_dir}/part-0.parquet")
    raw = read_events_stream(spark, src_dir)
    qname = "running_user_stats_out"
    q = (
        running_user_stats(raw)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    from pyspark.sql import Window

    # keep the final state row per user (max n_events — monotone)
    return (
        spark.table(qname)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "sum_value", "last_seen")
        .orderBy("user_id")
    )


register(
    "stream_running_user_stats",
    stream_running_user_stats,
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_value,
           MAX(ts) AS last_seen
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)


def stream_running_user_cents_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark-4 StatefulProcessor operator (streaming/stateful_v2.py
    RunningUserCents — transformWithStateInPandas), oracle-checked via
    its batch face: the SAME processor class is driven through its
    init/handleInputRows/close lifecycle under applyInPandas, with each
    user's rows split across two simulated micro-batches to exercise
    state carry-over. Because the state is integer cents, the result is
    bit-identical to a plain GROUP BY no matter how the input was
    micro-batched — which is what makes the DuckDB oracle exact.

    (The protobuf transport that transformWithStateInPandas itself
    needs is environment-gated; this registry entry keeps the v2
    processor semantics under the driver's value-oracle either way.
    Live-transport equivalence: tests/test_stateful_v2.py.)"""
    from otrrentetl_spark.streaming.stateful_v2 import running_user_cents_batch

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.round(F.col("value") * 100.0, 0).cast("long").alias("cents"),
    )
    return running_user_cents_batch(ev)


register(
    "stream_running_user_cents_v2",
    stream_running_user_cents_v2,
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment (batch face of the same
    builder the streaming test runs): events joined to the customer
    dim (AQE-decided strategy; nation broadcast), aggregated per
    (segment, nation)."""
    enriched = sjoins.enrich_with_customer_dim(
        _events(spark, sf_dir),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
    )
    return (
        enriched.filter(F.col("segment").isNotNull())
        .groupBy("segment", "nation_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


register(
    "stream_static_enrich",
    stream_static_enrich,
    """
    SELECT c.c_mktsegment AS segment, n.n_name AS nation_name,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
)
