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


def corpus_dedup_against_history(
    docs_stream: DataFrame,
    history_table,
    content_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
):
    """Incremental corpus dedup against UNBOUNDED history — the 'new
    crawl vs everything ever ingested' shape of a training-data feed,
    where the watermark-bounded state of `dedup_stream` is the wrong
    tool (a document seen last year is still a duplicate today).

    Per micro-batch (`foreachBatch`):
      1. hash each incoming doc's normalized content (md5 → the
         16-byte key the history table is partitioned by);
      2. dedup within the batch (min id per hash — deterministic);
      3. anti-join against the history table on the hash (a
         partition-pruned keyed read, NOT a full-history scan per
         batch: the join is on the table's PartitionKey prefix);
      4. append the survivors' (hash, id) to the history table with
         the keyed upsert, which is idempotent under micro-batch
         REPLAY — a retried batch re-upserts the same keys.

    The history table is the engine's own `KeyedParquetTable`
    (PartitionKey = first 2 hex chars of the hash → 256 partitions,
    RowKey = full hash), so state lives in partitioned parquet with
    the same merge/compact/delete lifecycle as every keyed table —
    no executor-memory state grows with corpus lifetime.

    Returns the started StreamingQuery.
    """
    from pyspark.sql import functions as F

    from otrrentetl_spark.operators.text import normalize_text

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        hashed = batch_df.select(
            F.col(id_col),
            F.md5(normalize_text(content_col)).alias("__h"),
        ).select(
            F.substring("__h", 1, 2).alias("PartitionKey"),
            F.col("__h").alias("RowKey"),
            F.col(id_col),
        )
        in_batch = hashed.groupBy("PartitionKey", "RowKey").agg(
            F.min(id_col).alias(id_col)
        )
        if history_table.exists():
            # bounded driver-side state: the batch's distinct hash
            # prefixes (≤256) — prunes the history scan to touched
            # partitions; a small batch reads a few directories, not
            # the whole corpus history
            prefixes = [
                r[0]
                for r in in_batch.select("PartitionKey").distinct().collect()
            ]
            fresh = in_batch.join(
                history_table.read()
                .filter(F.col("PartitionKey").isin(prefixes))
                .select("PartitionKey", "RowKey"),
                ["PartitionKey", "RowKey"],
                "left_anti",
            )
        else:
            fresh = in_batch
        history_table.upsert_replace_partitions(
            fresh.withColumn(id_col, F.col(id_col).cast("long"))
        )

    writer = docs_stream.writeStream.foreachBatch(process_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
