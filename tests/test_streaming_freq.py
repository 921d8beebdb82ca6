"""Incrementally-maintained CMS over real micro-batches equals the
batch-built sketch — the merge-associativity contract, executed."""

from __future__ import annotations

from pyspark.sql import functions as F

from otrrentetl_spark.operators import sketch
from otrrentetl_spark.streaming import freq, jobs
from tests.conftest import SF_SMOKE

DEPTH, WIDTH = 4, 256


def test_stream_cms_equals_batch_cms(spark, tmp_path):
    state = str(tmp_path / "cms_state")
    ckpt = str(tmp_path / "ckpt")
    # small file-source batches force multiple micro-batches
    spark.conf.set("spark.sql.streaming.fileSource.log.compactInterval", "2")
    q = freq.run_cms_update_job(
        spark, SF_SMOKE, state, ckpt, key_col="event_type",
        depth=DEPTH, width=WIDTH,
    )
    jobs.stop_query(q)

    streamed = spark.read.parquet(state)
    from otrrentetl_spark.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events").select(
        F.col("event_type").cast("string").alias("k")
    )
    rebuilt = sketch.cms_build(ev, "k", DEPTH, WIDTH)
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )

    # and the estimates bound the exact counts from above
    exact = ev.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    est = sketch.cms_estimate(streamed, exact.select("k"), "k", DEPTH, WIDTH)
    assert (
        est.join(exact, "k").filter(F.col("est") < F.col("c")).count() == 0
    )
