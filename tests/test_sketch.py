"""Count-min sketch properties: one-sided error, merge = rebuild,
bounded state."""

from __future__ import annotations

from pyspark.sql import functions as F

from otrrentetl_spark.operators import sketch

DEPTH, WIDTH = 4, 64


def _keys(spark, rows):
    return spark.createDataFrame([(k,) for k in rows], "k string")


def test_estimate_never_undercounts(spark):
    # skewed stream: 'hot' x 50, others x <=3 over a tiny width so
    # collisions are guaranteed — estimates must still be >= truth
    rows = ["hot"] * 50 + [f"k{i}" for i in range(200) for _ in (0,) * (i % 4)]
    df = _keys(spark, rows)
    cms = sketch.cms_build(df, "k", DEPTH, WIDTH)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    est = sketch.cms_estimate(cms, exact.select("k"), "k", DEPTH, WIDTH)
    bad = (
        est.join(exact, "k")
        .filter(F.col("est") < F.col("c"))
        .count()
    )
    assert bad == 0
    hot = est.filter(F.col("k") == "hot").first()["est"]
    assert hot >= 50


def test_sketch_state_is_bounded(spark):
    df = _keys(spark, [f"u{i}" for i in range(5000)])
    cms = sketch.cms_build(df, "k", DEPTH, WIDTH)
    assert cms.count() <= DEPTH * WIDTH


def test_merge_equals_rebuild(spark):
    a = _keys(spark, ["x", "y", "x"])
    b = _keys(spark, ["y", "z"])
    merged = sketch.cms_merge(
        sketch.cms_build(a, "k", DEPTH, WIDTH),
        sketch.cms_build(b, "k", DEPTH, WIDTH),
    )
    whole = sketch.cms_build(a.unionByName(b), "k", DEPTH, WIDTH)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
