"""Custom Python DataSource: the distributed paginated connector must
land the same rows the driver-side paginate loop produces, and the
downstream field extraction (scrape.toplist_rows) must parse them."""

from __future__ import annotations


def test_toplist_pages_datasource(spark):
    from otrrentetl_spark.sources.datasource import (
        ToplistPagesDataSource,
        _build_page,
    )
    from otrrentetl_spark.sources.scrape import toplist_rows

    spark.dataSource.register(ToplistPagesDataSource)
    pages = (
        spark.read.format("toplist_pages")
        .option("total_rows", 55)
        .option("page_size", 20)
        .load()
    )
    got = {r["start_offset"]: r["html"] for r in pages.collect()}
    # 55 rows / 20 per page -> offsets 0,20,40
    assert set(got) == {0, 20, 40}
    for off in got:
        assert got[off] == _build_page(off, 20, 55)

    parsed = toplist_rows(pages)
    rows = parsed.collect()
    assert len(rows) == 55
    by_epg = {r["epg_id"]: r for r in rows}
    assert "7000" in by_epg and by_epg["7000"]["rating"] == "95"


def test_batched_rest_sink(spark, tmp_path):
    import json
    import os

    from otrrentetl_spark.sources.datasource import BatchedRestSink

    spark.dataSource.register(BatchedRestSink)
    from otrrentetl_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type"
    ).limit(100)
    out = str(tmp_path / "sink")
    ev.write.format("batched_rest").option("path", out).mode("append").save()

    assert os.path.exists(os.path.join(out, "_MANIFEST"))
    recs = []
    for fn in os.listdir(out):
        if fn.endswith(".ndjson"):
            with open(os.path.join(out, fn)) as f:
                recs += [json.loads(line) for line in f]
    assert len(recs) == 100
    assert {r["event_id"] for r in recs} == {
        r["event_id"] for r in ev.collect()
    }
    # batching actually happened: far fewer "requests" than rows
    n_batches = sum(1 for fn in os.listdir(out) if fn.endswith(".ndjson"))
    assert n_batches < 100


def test_toplist_stream_datasource(spark, tmp_path):
    """Streaming face: the offset-tracked source must deliver every
    page exactly once across micro-batches, and the parsed rows must
    equal the batch connector's output."""
    from otrrentetl_spark.sources.datasource import ToplistStreamDataSource
    from otrrentetl_spark.sources.scrape import toplist_rows

    spark.dataSource.register(ToplistStreamDataSource)
    pages = (
        spark.readStream.format("toplist_stream")
        .option("total_rows", 55)
        .option("page_size", 20)
        .load()
    )
    q = (
        toplist_rows(pages)
        .writeStream.format("memory")
        .queryName("toplist_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("toplist_stream_out").collect()
    assert len(rows) == 55
    epgs = {r["epg_id"] for r in rows}
    assert epgs == {str(7000 + i) for i in range(55)}


def test_toplist_stream_replay_determinism():
    """Recovery contract: readBetweenOffsets must reproduce exactly
    the rows read() produced for the same offset range."""
    from otrrentetl_spark.sources.datasource import ToplistStreamReader

    r = ToplistStreamReader(total_rows=55, page_size=20, pages_per_poll=2)
    batches, start = [], r.initialOffset()
    while True:
        rows, end = r.read(start)
        rows = list(rows)
        if not rows:
            break
        replay = list(r.readBetweenOffsets(start, end))
        assert replay == rows
        batches.append((start, end, rows))
        start = end
    assert sum(len(b[2]) for b in batches) == 3  # 3 pages of 20 for 55 rows
    assert [b[0]["start"] for b in batches] == [0, 40]


def test_toplist_stream_checkpoint_restart(spark, tmp_path):
    """Exactly-once across restarts: a second availableNow run over the
    SAME checkpoint must resume from the committed page offset — no
    duplicate pages, no gaps. (pages_per_poll=1 makes each run ingest
    exactly one poll's backlog, so restart coverage is real.)"""
    from otrrentetl_spark.sources.datasource import ToplistStreamDataSource

    spark.dataSource.register(ToplistStreamDataSource)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        pages = (
            spark.readStream.format("toplist_stream")
            .option("total_rows", 60)
            .option("page_size", 20)
            .option("pages_per_poll", 1)
            .load()
        )
        q = (
            pages.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            r["start_offset"] for r in spark.read.parquet(out).collect()
        )

    first = run_once()
    second = run_once()
    assert first, "first run ingested nothing"
    assert len(second) > len(first), "restart did not resume"
    assert len(set(second)) == len(second), "restart re-delivered a page"
    # the union so far is a gap-free prefix of the page sequence
    assert second == [20 * i for i in range(len(second))]


def test_batched_rest_sink_retry_excludes_aborted_attempt(tmp_path):
    """Two attempts of the same partition (task retry after a flush):
    only the attempt whose commit message reached the driver may be
    published. The stale staged file must be gone, the manifest must
    list exactly the committed batch, and no duplicate rows land."""
    import json
    import os

    from otrrentetl_spark.sources.datasource import BatchedRestWriter

    out = str(tmp_path / "sink")
    w = BatchedRestWriter(out, ["k", "v"])
    rows = [(1, "a"), (2, "b"), (3, "c")]
    w.write(iter(rows))          # attempt 0: flushed, then "failed"
    msg1 = w.write(iter(rows))   # attempt 1: retry succeeds
    w.commit([msg1])

    files = sorted(os.listdir(out))
    finals = [f for f in files if f.endswith(".ndjson")]
    assert len(finals) == 1
    assert not [f for f in files if f.endswith(".staged")]
    recs = [json.loads(l) for l in open(os.path.join(out, finals[0]))]
    assert [r["k"] for r in recs] == [1, 2, 3]  # once, not twice
    manifest = open(os.path.join(out, "_MANIFEST")).read().splitlines()
    assert manifest[0] == "batches=1"
    assert manifest[1] == f"{finals[0]}\t3"


def test_batched_rest_sink_abort_path(spark, tmp_path):
    """End-to-end job failure: a mid-write task error must abort the
    whole write — no manifest, no published batches, no staged
    leftovers — even though other partitions already flushed."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from otrrentetl_spark.sources.datasource import BatchedRestSink

    spark.dataSource.register(BatchedRestSink)
    df = (
        spark.range(0, 200, 1, 8)
        .withColumn(
            "v",
            F.expr("CASE WHEN id = 150 THEN raise_error('boom')"
                   " ELSE CAST(id AS STRING) END"),
        )
    )
    out = str(tmp_path / "sink")
    with _pytest.raises(Exception, match="boom"):
        df.write.format("batched_rest").option("path", out).mode(
            "append"
        ).save()
    leftovers = os.listdir(out) if os.path.isdir(out) else []
    # The protocol's guarantee: nothing is PUBLISHED — no final batch
    # file, no manifest. (A .staged file can survive if a still-running
    # task flushed after the driver's abort swept the dir; staged files
    # are unpublishable garbage by construction — cleanup only ever
    # touches the owning job's files, so another job's sweep won't
    # remove them, but nothing ever promotes them either.)
    assert not [f for f in leftovers if f.endswith(".ndjson")]
    assert "_MANIFEST" not in leftovers


def test_batched_rest_sink_concurrent_jobs_isolated(tmp_path):
    """Two write jobs sharing one sink dir: job A's commit (and abort)
    must only sweep job A's staged attempts. Sweeping all *.staged
    would delete job B's flushed-but-uncommitted batch and make B's
    commit os.replace fail."""
    import os

    from otrrentetl_spark.sources.datasource import BatchedRestWriter

    out = str(tmp_path / "sink")
    a = BatchedRestWriter(out, ["k"])
    b = BatchedRestWriter(out, ["k"])
    msg_a = a.write(iter([(1,)]))
    msg_b = b.write(iter([(2,)]))     # flushed, not yet committed
    a.commit([msg_a])                 # sweeps ONLY a's staged files
    assert os.path.exists(os.path.join(out, msg_b.staged))
    b.commit([msg_b])                 # must still succeed
    finals = [f for f in os.listdir(out) if f.endswith(".ndjson")]
    assert len(finals) == 2
