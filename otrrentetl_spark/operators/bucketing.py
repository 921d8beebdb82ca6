"""Bucketed (co-located) joins: pre-shuffle a fact table ONCE at write
time so every subsequent join on the bucket key runs with zero
exchange.

At 100 TB the repeated cost center is the shuffle of the big fact on
its join key — every orders ⋈ lineitem pays it again. Bucketing both
tables by the key into the same bucket count moves that shuffle to
write time: scans come back already hash-distributed, Catalyst plans a
SortMergeJoin with NO Exchange on either side (asserted in
tests/test_bucketed_join.py), and the join cost collapses to a
per-bucket merge. This is the Spark-native analog of the reference's
PartitionKey-affinity storage (its store shards by PartitionKey so
key-scoped queries never cross shards — /root/reference/otrrentetl/
storage/azurestoragewrapper.py:54-75); bucketing applies the same
idea to join keys instead of scan keys.

Bucket-count choice at scale: aim for ~128 MB-1 GB of fact data per
bucket (e.g. ~100k buckets for 100 TB), and keep it a power of two so
a later 2× rescale can coalesce pairs of buckets instead of rewriting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    buckets: int = 8,
) -> None:
    """Persist df bucketed+sorted by `key` — the one-time shuffle that
    all future joins on `key` amortize away."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # A fresh in-memory catalog doesn't know about a location a prior
    # session left in the warehouse dir; saveAsTable refuses to reuse
    # it (LOCATION_ALREADY_EXISTS). Clear the stale directory.
    import shutil
    from pathlib import Path

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(Path(warehouse) / table_name.lower(), ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key_left: str,
    key_right: str,
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys —
    exchange-free by construction."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[key_left] == rt[key_right], "inner")


def write_partitioned(df: DataFrame, table_name: str, part_col: str) -> None:
    """Persist df hive-partitioned by `part_col` (one directory per
    value). Reads that filter on the partition column prune at the
    FILE LISTING level — scans never open non-matching partitions,
    the parquet-level analog of the reference's PartitionKey routing
    (otrrentetl/storage/tablestoragewrapper.py query-by-PartitionKey)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    import shutil
    from pathlib import Path

    loc = Path(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
               .removeprefix("file:")) / table_name.lower()
    shutil.rmtree(loc, ignore_errors=True)
    (
        df.write.mode("overwrite")
        .partitionBy(part_col)
        .format("parquet")
        .saveAsTable(table_name)
    )
