"""Stream-stream interval join: correlate two event substreams of the
same source (views → subsequent clicks by the same user within a
horizon) — the streaming generalization of the reference's J2
"match two feeds on a derived key" join (/root/reference/otrrentetl/
server/etl.py:249-256), with event time replacing the derived string
stamp.

Spark executes this as a watermarked stream-stream inner join: each
side buffers only rows younger than (watermark + horizon), so join
state is bounded — the property that makes the operator viable on an
unbounded feed. The SAME builder runs on batch DataFrames (where the
range condition is an ordinary interval join), which is what the
DuckDB oracle replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_click_join(
    events: DataFrame,
    horizon: str = "10 minutes",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """views ⋈ clicks per user with click.ts in (view.ts, view.ts + horizon].

    `watermark=None` → batch mode (oracle-replayable); a string →
    streaming mode with both sides watermarked, the state-retention
    requirement for stream-stream joins.
    """
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    if watermark is not None:
        views = views.withWatermark("view_ts", watermark)
        clicks = clicks.withWatermark("click_ts", watermark)
    cond = (
        (views.user_id == clicks.c_user_id)
        & (clicks.click_ts > views.view_ts)
        & (clicks.click_ts <= views.view_ts + F.expr(f"INTERVAL {horizon}"))
    )
    return views.join(clicks, cond, "inner").select(
        "user_id", "view_id", "view_ts", "click_id", "click_ts"
    )


def enrich_with_customer_dim(events, customer, nation):
    """Stream-static enrichment: attach market segment and nation name
    to each event by customer key. `nation` is a bona-fide bounded
    dimension → explicit broadcast. `customer` is NOT: a customer
    table grows with the business (hundreds of millions of rows at
    the 100 TB design point), so the events⋈dim join carries no
    broadcast hint — AQE broadcasts while the dimension is actually
    small and falls back to a shuffled join when it is not. In
    streaming mode Spark re-plans the static side per micro-batch
    either way.

    Works identically on a batch DataFrame (the oracle face) and a
    readStream source (tests/test_streaming_static.py)."""
    from pyspark.sql import functions as F

    dim = customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
        "c_nationkey",
    ).join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation_name"))),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("user_id", "segment", "nation_name")
    return events.join(dim, "user_id", "left").select(
        "event_id", "user_id", "event_type", "ts", "value", "segment", "nation_name"
    )
