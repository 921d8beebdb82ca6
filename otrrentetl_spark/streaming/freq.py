"""Incremental frequency sketching over a stream.

The streaming face of operators.sketch: per micro-batch, build the
batch's partial count-min sketch (at most depth*width rows regardless
of batch size) and merge it into the persistent sketch — CMS counters
are associative and commutative, so the maintained state is exactly
the sketch a batch rebuild over all data seen would produce (asserted
stream-vs-batch in tests/test_streaming_freq.py).

This is the bounded-state streaming answer to "track token/key
frequencies over an unbounded feed": the state never exceeds
depth*width counters, while exact per-key streaming counts would grow
with the key cardinality forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from otrrentetl_spark.operators import sketch
from otrrentetl_spark.streaming import jobs


def _load_state(spark: SparkSession, state_path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(state_path)
    except Exception:  # noqa: BLE001 — first batch: no state yet
        return None


def run_cms_update_job(
    spark: SparkSession,
    sf_dir: str,
    state_path: str,
    checkpoint_path: str,
    key_col: str = "event_type",
    depth: int = 4,
    width: int = 256,
) -> StreamingQuery:
    """availableNow run: events stream → per-batch partial sketch →
    merge into the sketch state at ``state_path``.

    The state is bounded (depth*width counter rows), so the merge
    materializes it driver-side before overwriting — a deliberate
    bounded-state exception to the no-collect rule; the DATA never
    passes through the driver, only the fixed-size counter table."""
    stream = jobs.read_events_stream(spark, sf_dir).select(
        F.col(key_col).cast("string").alias("k")
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        part = sketch.cms_build(batch_df, "k", depth, width)
        cur = _load_state(sess, state_path)
        merged = sketch.cms_merge(cur, part) if cur is not None else part
        # materialize the (bounded) new state before overwriting the
        # path it was read from
        pdf = merged.toPandas()
        sess.createDataFrame(pdf).write.mode("overwrite").parquet(state_path)

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
