"""Streaming deduplication — the streaming face of the X1 exact-dedup
operator (a training-data feed is the canonical at-least-once source:
replays and retries re-deliver events, and the pipeline must emit each
`event_id` exactly once).

Two builders, one semantics:

- `dedup_stream` (streaming input): ``dropDuplicatesWithinWatermark``
  on the key — Spark keeps per-key state only until the watermark
  passes, so state is bounded by (event rate × watermark), not by the
  stream's lifetime. That bound is the 100 TB design point: unbounded
  `dropDuplicates` state on an infinite stream OOMs; within-watermark
  state does not.
- `dedup_batch` (batch input): plain ``dropDuplicates`` — the exact
  batch equivalent the DuckDB oracle can replay (DISTINCT ON key).

The streaming execution (duplicates split across real micro-batches,
exactly-once output) is asserted in tests/test_streaming_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_KEYS = ["event_id"]


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once keyed dedup over an at-least-once stream, with
    state bounded by the watermark horizon."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys or DEFAULT_KEYS
    )


def dedup_batch(events: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Batch-equivalent of dedup_stream for oracle replay."""
    return events.dropDuplicates(keys or DEFAULT_KEYS)
