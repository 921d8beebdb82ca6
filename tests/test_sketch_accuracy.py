"""Sketch-accuracy contract: the ok-flags must hold, and the HLL
sketch must be mergeable — union of per-split sketches gives the
identical estimate to one global sketch (register-wise max is
associative), which is what lets distinct-counting run as a partial
aggregate at any scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from otrrentetl_spark.plans.scale_ops import sketch_accuracy_contract

SF_DIR = "/root/testdata/sf0.001"


def test_contract_flags_hold(spark):
    rows = sketch_accuracy_contract(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["p50_ok"] and r["p90_ok"] and r["hll_ok"], r.asDict()


def test_hll_merge_equals_global(spark):
    from otrrentetl_spark.catalog import load_table

    ev = load_table(spark, SF_DIR, "events")
    whole = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14))).alias("e")
    ).collect()[0]["e"]
    partial = (
        ev.withColumn("half", F.col("event_id") % 2)
        .groupBy("half")
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    assert whole == partial
