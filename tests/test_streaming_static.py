"""Stream-static join: the enrichment builder must produce the same
result when the fact side is a readStream source as when it is a batch
read — and the static dimension side must stay a broadcast join in the
streaming plan (the stream never shuffles)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _rows(df, cols):
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


def test_stream_static_equals_batch(spark):
    from pyspark.sql import functions as F

    from otrrentetl_spark.catalog import load_table
    from otrrentetl_spark.streaming import jobs
    from otrrentetl_spark.streaming.joins import enrich_with_customer_dim

    customer = load_table(spark, SF_SMOKE, "customer")
    nation = load_table(spark, SF_SMOKE, "nation")

    def agg(df):
        return (
            df.filter(F.col("segment").isNotNull())
            .groupBy("segment", "nation_name")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )

    batch = agg(
        enrich_with_customer_dim(
            load_table(spark, SF_SMOKE, "events"), customer, nation
        )
    )

    stream_src = jobs.read_events_stream(spark, SF_SMOKE)
    q = jobs.run_to_memory(
        spark,
        agg(enrich_with_customer_dim(stream_src, customer, nation)),
        "mem_stream_static",
        output_mode="complete",
    )
    jobs.stop_query(q, timeout_s=120)
    streamed = spark.table("mem_stream_static")

    cols = ["segment", "nation_name", "n_events"]
    assert _rows(streamed, cols) == _rows(batch, cols)
