"""Streaming execution of the dedup and stream-stream-join builders
across REAL micro-batch boundaries (maxFilesPerTrigger=1), asserting:

- dropDuplicatesWithinWatermark emits each event_id exactly once even
  when the re-delivered copy lands in a LATER micro-batch (the case
  plain per-batch dedup gets wrong);
- the watermarked stream-stream interval join produces exactly the
  batch join's result set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _chunked_stream(spark, events, tmp_path, n_chunks=3):
    """Write events into n time-ordered chunks, one micro-batch each."""
    from pyspark.sql import Window

    src = tmp_path / "chunks"
    events.withColumn(
        "chunk", F.ntile(n_chunks).over(Window.orderBy("ts"))
    ).write.partitionBy("chunk").parquet(str(src))
    return (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )


def test_stream_dedup_exactly_once_across_batches(spark, tmp_path):
    from otrrentetl_spark.catalog import load_table
    from otrrentetl_spark.streaming.dedup import dedup_stream

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    # re-deliver every 5th event 2 seconds later: with time-ordered
    # chunking the replica usually lands in the same or next batch —
    # both must dedup (same-batch locally, cross-batch via state)
    redelivered = ev.filter(F.col("event_id") % 5 == 0).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 2 seconds")
    )
    feed = ev.unionByName(redelivered)

    stream = _chunked_stream(spark, feed, tmp_path)
    q = (
        dedup_stream(stream, ["event_id"], watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.table("dedup_out")
    n_ids = ev.select("event_id").distinct().count()
    assert got.count() == n_ids  # exactly once, no replica survived
    assert got.select("event_id").distinct().count() == n_ids


def test_stream_stream_join_matches_batch(spark, tmp_path):
    from otrrentetl_spark.catalog import load_table
    from otrrentetl_spark.streaming.joins import view_click_join

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    stream = _chunked_stream(spark, ev, tmp_path)
    q = (
        view_click_join(stream, horizon="10 minutes", watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("vc_join")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["view_id"], r["click_id"]) for r in spark.table("vc_join").collect()
    }
    want = {
        (r["view_id"], r["click_id"])
        for r in view_click_join(ev, horizon="10 minutes", watermark=None).collect()
    }
    assert got == want
    assert len(want) > 0


def test_corpus_dedup_against_unbounded_history(spark, tmp_path):
    """Two crawls arrive as separate streaming runs: a doc already
    ingested in run 1 must NOT survive run 2 (history is unbounded —
    no watermark horizon), intra-batch duplicates keep the min id,
    and the history table ends with exactly one row per content."""
    import os

    from otrrentetl_spark.operators.merge import KeyedParquetTable
    from otrrentetl_spark.streaming.dedup import corpus_dedup_against_history

    src = tmp_path / "incoming"
    src.mkdir()
    hist = KeyedParquetTable(spark, str(tmp_path / "history"))

    schema = "doc_id long, text string"

    def run_crawl(rows, run):
        d = src / f"run{run}"
        d.mkdir()
        spark.createDataFrame(rows, schema).write.parquet(str(d / "batch"))
        stream = spark.readStream.schema(schema).parquet(str(d / "batch"))
        q = corpus_dedup_against_history(
            stream, hist, checkpoint_dir=str(tmp_path / f"ckpt{run}")
        )
        q.awaitTermination(120)

    # run 1: two distinct docs + an intra-batch duplicate of doc 1
    run_crawl([(1, "alpha beta"), (2, "gamma delta"), (9, "alpha beta")], 1)
    got = {(r["doc_id"], r["RowKey"][:6]) for r in hist.read().collect()}
    assert len(got) == 2
    assert {i for i, _ in got} == {1, 2}  # min-id survivors, 9 deduped

    # run 2: one replayed content (different id), one genuinely new
    run_crawl([(50, "alpha beta"), (51, "epsilon zeta")], 2)
    ids = sorted(r["doc_id"] for r in hist.read().collect())
    assert ids == [1, 2, 51], ids  # 50 rejected by unbounded history

    # state layout: hash-prefix partitioned parquet, not memory
    parts = [p for p in os.listdir(str(tmp_path / "history")) if p.startswith("PartitionKey=")]
    assert len(parts) >= 2
