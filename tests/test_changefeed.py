"""Change-feed consumer semantics: initial modes, incremental diffs,
at-least-once replay after a crashed batch, caught-up no-ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otrrentetl_spark.operators.merge import KeyedParquetTable
from otrrentetl_spark.streaming.changefeed import ChangeFeed

KEYS = ("PartitionKey", "RowKey")
SCHEMA = "PartitionKey string, RowKey string, v long"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _mk(spark, tmp_path):
    t = KeyedParquetTable(spark, str(tmp_path / "tbl"), KEYS)
    t.retain_stale_s = 3600.0
    return t


def _collect(batches):
    def process(df, a, b):
        batches.append(
            (
                a,
                b,
                sorted(
                    (r["PartitionKey"], r["RowKey"], r["v"], r["change_type"])
                    for r in df.collect()
                ),
            )
        )

    return process


def test_latest_initial_emits_only_future_changes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(_df(spark, [("p", "1", 1), ("p", "2", 2)]))
    feed = ChangeFeed(t, str(tmp_path / "ckpt.json"), initial="latest")
    batches = []
    assert feed.poll(_collect(batches)) is None  # pin, emit nothing
    assert batches == []
    assert feed.poll(_collect(batches)) is None  # caught up
    t.upsert_replace_partitions(_df(spark, [("p", "2", 20), ("p", "3", 3)]))
    got = feed.poll(_collect(batches))
    assert got == (1, 2)
    assert batches == [
        (1, 2, [("p", "2", 20, "update"), ("p", "3", 3, "insert")])
    ]
    assert feed.poll(_collect(batches)) is None


def test_snapshot_initial_emits_current_state_as_inserts(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(_df(spark, [("p", "1", 1), ("q", "1", 9)]))
    feed = ChangeFeed(t, str(tmp_path / "ckpt.json"), initial="snapshot")
    batches = []
    assert feed.poll(_collect(batches)) == (0, 1)
    assert batches == [
        (0, 1, [("p", "1", 1, "insert"), ("q", "1", 9, "insert")])
    ]


def test_crash_before_checkpoint_replays_batch(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(_df(spark, [("p", "1", 1)]))
    feed = ChangeFeed(t, str(tmp_path / "ckpt.json"))
    feed.poll(lambda df, a, b: None)  # pin v1
    t.delete_by_keys(_df(spark, [("p", "1", 0)]))

    class Boom(RuntimeError):
        pass

    def crashing(df, a, b):
        raise Boom()

    with pytest.raises(Boom):
        feed.poll(crashing)
    # checkpoint did NOT advance — the batch replays identically
    batches = []
    assert feed.poll(_collect(batches)) == (1, 2)
    assert batches == [(1, 2, [("p", "1", 1, "delete")])]


def test_multi_version_gap_coalesces_into_one_batch(spark, tmp_path):
    """A consumer that slept through several commits gets ONE composed
    diff (net changes), not one batch per version — rows inserted then
    deleted inside the gap never appear."""
    t = _mk(spark, tmp_path)
    t.overwrite(_df(spark, [("p", "1", 1)]))
    feed = ChangeFeed(t, str(tmp_path / "ckpt.json"))
    feed.poll(lambda df, a, b: None)  # pin v1
    t.upsert_replace_partitions(_df(spark, [("p", "2", 2)]))  # v2 insert
    t.delete_by_keys(_df(spark, [("p", "2", 0)]))  # v3 delete same key
    t.upsert_replace_partitions(_df(spark, [("p", "1", 100)]))  # v4 update
    batches = []
    assert feed.poll(_collect(batches)) == (1, 4)
    assert batches == [(1, 4, [("p", "1", 100, "update")])]


def test_run_loop_processes_and_stops_when_caught_up(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(_df(spark, [("p", "1", 1)]))
    feed = ChangeFeed(t, str(tmp_path / "ckpt.json"), initial="snapshot")
    t.upsert_replace_partitions(_df(spark, [("p", "2", 2)]))
    seen = []
    n = feed.run(
        lambda df, a, b: seen.append((a, b, df.count())),
        poll_interval_s=0.01,
        max_polls=10,
        stop_when_caught_up=True,
    )
    # snapshot batch (2 rows at v2) then caught up; the snapshot poll
    # already pinned the post-upsert version
    assert n == 1
    assert seen == [(0, 2, 2)]


def test_distributed_batch_is_lazy_dataframe(spark, tmp_path):
    """The batch handed to process() is a real distributed plan (not
    driver-materialized rows): it supports further transformations and
    only reads the differing files."""
    t = _mk(spark, tmp_path)
    t.overwrite(_df(spark, [("p", "1", 1), ("q", "1", 9)]))
    feed = ChangeFeed(t, str(tmp_path / "ckpt.json"))
    feed.poll(lambda df, a, b: None)
    t.upsert_replace_partitions(_df(spark, [("p", "1", 10)]))
    captured = {}

    def process(df, a, b):
        captured["agg"] = (
            df.groupBy("change_type").agg(F.count(F.lit(1)).alias("n")).collect()
        )
        captured["files"] = df.inputFiles()

    feed.poll(process)
    assert [(r["change_type"], r["n"]) for r in captured["agg"]] == [
        ("update", 1)
    ]
    assert not any("PartitionKey=q" in f for f in captured["files"])


def test_changefeed_requires_retention(spark, tmp_path):
    """ADVICE r7: a feed over a default-configured table (retention 0)
    would fail on its first real batch because changes(last, cur)
    needs version last's superseded files — enforce at construction."""
    import pytest

    t = KeyedParquetTable(spark, str(tmp_path / "tbl0"), KEYS)
    with pytest.raises(ValueError, match="retain_stale_s"):
        ChangeFeed(t, str(tmp_path / "ckpt.json"))


def test_interleaved_writer_feed_sees_only_committed_versions(spark, tmp_path):
    """r7 verdict item 3: a concurrent writer commits upserts/deletes
    while this thread polls a ChangeFeed into a second keyed table.
    Every batch must span contiguous COMMITTED versions (the manifest
    flip is atomic — a poll can never observe a half-written version),
    and replaying all batches verb-by-verb must reconstruct the
    writer's final table exactly: a torn read, misclassified change,
    or lost batch breaks the final equality."""
    import threading

    t = _mk(spark, tmp_path)
    t.overwrite(
        _df(
            spark,
            [(str(p), f"{r:02d}", p * 100 + r) for p in range(4) for r in range(20)],
        )
    )
    feed = ChangeFeed(t, str(tmp_path / "ck.json"), initial="snapshot")
    sink = KeyedParquetTable(spark, str(tmp_path / "sink"), KEYS)
    errors = []

    def writer():
        try:
            for i in range(6):
                if i % 3 == 2:  # delete two keys of one partition
                    t.delete_by_keys(
                        _df(
                            spark,
                            [(str(i % 4), f"{2 * i:02d}", 0),
                             (str(i % 4), f"{2 * i + 1:02d}", 0)],
                        )
                    )
                else:  # update one partition + insert a fresh key
                    t.upsert_replace_partitions(
                        _df(
                            spark,
                            [(str(i % 4), f"{j:02d}", 1000 * i + j) for j in range(5)]
                            + [(str(i % 4), f"n{i}", 7000 + i)],
                        )
                    )
        except Exception as e:  # surfaced in the main thread
            errors.append(e)

    spans = []

    def apply(df, a, b):
        rows = df.select("PartitionKey", "RowKey", "v", "change_type").collect()
        keys = [(r["PartitionKey"], r["RowKey"]) for r in rows]
        assert len(keys) == len(set(keys)), "duplicate key inside one batch"
        ups = [(r["PartitionKey"], r["RowKey"], r["v"]) for r in rows
               if r["change_type"] in ("insert", "update")]
        dels = [(r["PartitionKey"], r["RowKey"], 0) for r in rows
                if r["change_type"] == "delete"]
        if ups:
            sink.upsert_replace_partitions(_df(spark, ups))
        if dels:
            sink.delete_by_keys(_df(spark, dels))
        spans.append((a, b))

    th = threading.Thread(target=writer)
    th.start()
    try:
        while th.is_alive():
            feed.poll(apply)
    finally:
        th.join()
    while feed.poll(apply) is not None:
        pass  # drain whatever committed after the writer exited
    assert not errors, errors
    # batches cover contiguous committed versions with no gaps/overlap
    assert spans[0][0] == 0
    for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
        assert a2 == b1, spans
    assert spans[-1][1] == 7  # overwrite + 6 writer commits
    # CDC replay reconstructed the source exactly
    src_rows = sorted(
        (r["PartitionKey"], r["RowKey"], r["v"]) for r in t.read().collect()
    )
    sink_rows = sorted(
        (r["PartitionKey"], r["RowKey"], r["v"]) for r in sink.read().collect()
    )
    assert src_rows == sink_rows
