"""Temporal operators over the events table: as-of join (checked
against DuckDB's native ASOF JOIN) — the union+window formulation that
scales where a range-predicate join would go quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otrrentetl_spark.catalog import load_table
from otrrentetl_spark.operators.asof import asof_join
from otrrentetl_spark.registry import register


def asof_click_to_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click event annotated with the value of the same user's
    most recent prior (or simultaneous) view event."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    return (
        asof_join(clicks, views, on="user_id", ts="ts", value_cols=["value"])
        .withColumnRenamed("value_asof", "view_value_asof")
        .orderBy("event_id")
    )


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
