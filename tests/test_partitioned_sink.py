"""Partitioned sink: the read-back scan must prune partitions at
file-listing time (PartitionFilters carries the predicate, and the
non-matching partition directories are never read)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_partition_filters_in_scan(spark):
    from otrrentetl_spark.catalog import load_table
    from otrrentetl_spark.operators.bucketing import write_partitioned

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "value", "event_type"
    )
    write_partitioned(ev, "t_part_events", "event_type")
    back = spark.table("t_part_events").filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_type" in m.group(1), plan
    # and the data survives the round-trip
    orig = ev.filter(F.col("event_type") == "click").count()
    assert back.count() == orig
