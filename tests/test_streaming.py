"""Streaming-execution tests: the window builders must produce the
SAME result via Structured Streaming (readStream → availableNow) as
via a batch read — Spark's unified model, verified end-to-end — and
the foreachBatch keyed-merge sink must be idempotent across re-runs.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("builder_name", ["tumbling", "session"])
def test_stream_equals_batch(spark, tmp_path, builder_name):
    from otrrentetl_spark.catalog import load_table
    from otrrentetl_spark.streaming import jobs, windows

    if builder_name == "tumbling":
        build = lambda df: windows.tumbling_counts(df, "1 hour")  # noqa: E731
        cols = ["window_start", "event_type", "n_events", "sum_value"]
    else:
        build = lambda df: windows.session_windows(df, "30 minutes")  # noqa: E731
        cols = ["session_start", "session_end", "user_id", "n_events"]

    batch = build(load_table(spark, SF_SMOKE, "events"))

    stream_src = jobs.read_events_stream(spark, SF_SMOKE)
    q = jobs.run_to_memory(
        spark, build(stream_src), f"mem_{builder_name}", output_mode="complete"
    )
    jobs.stop_query(q, timeout_s=120)
    streamed = spark.table(f"mem_{builder_name}")

    assert _rows(streamed, cols) == _rows(batch, cols)


def test_tumbling_merge_job_idempotent(spark, tmp_path):
    """availableNow merge job lands the batch truth in the keyed sink;
    a second run (fresh checkpoint — a forced replay) changes nothing:
    the keyed MERGE makes the sink idempotent at the row level."""
    from otrrentetl_spark.catalog import load_table
    from otrrentetl_spark.streaming import jobs, windows

    sink = str(tmp_path / "sink")

    for i, ckpt in enumerate(["ck1", "ck2"]):
        q = jobs.run_tumbling_merge_job(
            spark, SF_SMOKE, sink, str(tmp_path / ckpt), duration="1 hour"
        )
        jobs.stop_query(q, timeout_s=120)

    got = spark.read.parquet(sink)
    expected = windows.tumbling_counts(
        load_table(spark, SF_SMOKE, "events"), "1 hour"
    )
    cols = ["event_type", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(expected, cols)
    # key uniqueness: one row per (window_key, event_type)
    assert got.count() == got.select("window_key", "event_type").distinct().count()
