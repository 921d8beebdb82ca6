"""Bucketed co-located join: correctness vs the plain join AND the
plan property that justifies bucketing — ZERO shuffle exchanges in the
physical plan (broadcast disabled so the test sees the real
SortMergeJoin, not a trivially-exchange-free broadcast)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_bucketed_join_no_exchange(spark, tmp_path):
    from otrrentetl_spark.catalog import load_table
    from otrrentetl_spark.operators.bucketing import colocated_join, write_bucketed

    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")

    write_bucketed(orders, "t_bkt_orders", "o_orderkey", buckets=4)
    write_bucketed(lineitem, "t_bkt_lineitem", "l_orderkey", buckets=4)
    try:
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = colocated_join(
                spark, "t_bkt_orders", "t_bkt_lineitem", "o_orderkey", "l_orderkey"
            )
            agg = joined.groupBy("o_orderpriority").agg(
                F.count(F.lit(1)).alias("n")
            )

            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan

            # the groupBy above the join: bucketing only pre-distributes
            # the JOIN key, so the agg still exchanges — but exactly once
            agg_plan = agg._jdf.queryExecution().executedPlan().toString()
            assert agg_plan.count("Exchange") <= 2  # partial agg + final

            # correctness: identical multiset vs the unbucketed join
            want = (
                orders.join(
                    lineitem, orders.o_orderkey == lineitem.l_orderkey, "inner"
                )
                .groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            got = {(r["o_orderpriority"], r["n"]) for r in agg.collect()}
            exp = {(r["o_orderpriority"], r["n"]) for r in want.collect()}
            assert got == exp
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_orders")
        spark.sql("DROP TABLE IF EXISTS t_bkt_lineitem")
