"""Scale-pin the keyed-table snapshot lifecycle (r7 verdict item 3).

Builds a KeyedParquetTable from the 100x documents fixture (~1.67M
rows, 64 hash partitions), drives the full lifecycle — overwrite,
partition-scoped upsert, keyed delete, range-clustered compaction —
and times the read-side faces on the result: time travel, manifest-
diff change feed, footer-stats point lookup. Prints one line per
step for the BASELINE.md table.

    python tools/scale_fixture.py 100 /tmp/sfx100
    python tools/snapshot_scale.py /tmp/sfx100 /tmp/snap_scale
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx100"
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/tmp/snap_scale"
    shutil.rmtree(scratch, ignore_errors=True)

    from pyspark.sql import functions as F

    from otrrentetl_spark.operators.merge import KeyedParquetTable
    from otrrentetl_spark.session import get_spark

    spark = get_spark("snapshot_scale")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.pmod(F.hash("doc_id"), F.lit(64)).cast("string").alias("PartitionKey"),
        F.col("doc_id").cast("string").alias("RowKey"),
        "text",
        "n_chars",
    )
    n_docs = docs.count()
    print(f"fixture: {sf_dir} rows={n_docs}")

    t = KeyedParquetTable(spark, f"{scratch}/tbl", ("PartitionKey", "RowKey"))
    t.retain_stale_s = 3600.0

    def step(name, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"{name:32s} {dt:7.2f}s{'' if out is None else f'  {out}'}")
        return dt

    step(f"overwrite (v1, {n_docs} rows)", lambda: t.overwrite(docs))
    # partition-scoped upsert: update every row of ONE partition +
    # insert a fresh key — the touched-partition write the reference's
    # incremental sync does each tick
    upd = (
        t.read()
        .filter(F.col("PartitionKey") == "7")
        .withColumn("n_chars", F.col("n_chars") + 1)
    )
    step(
        "upsert partition 7 (v2)",
        lambda: t.upsert_replace_partitions(upd),
    )
    dels = (
        t.read()
        .filter(
            (F.col("PartitionKey") == "9")
            & (F.expr("try_cast(RowKey AS BIGINT) % 5 = 0"))
        )
        .select("PartitionKey", "RowKey")
    )
    step("keyed delete in partition 9 (v3)", lambda: t.delete_by_keys(dels))
    step(
        "clustered compact (v4)",
        lambda: t.compact(cluster=True),
    )
    # read-side faces, each a fresh plan
    step(
        "read() current",
        lambda: t.read().count(),
    )
    step(
        "time travel read(version=1)",
        lambda: t.read(version=1).count(),
    )
    step(
        "changes(1, 2) [one partition]",
        lambda: t.changes(1, 2).count(),
    )
    step(
        "changes(2, 3) [one partition]",
        lambda: t.changes(2, 3).count(),
    )
    step("history()", lambda: t.history().count())
    # point lookups: a hot partition and a compacted one — manifest +
    # footer stats must prune to a handful of files
    some = t.read().filter(F.col("PartitionKey") == "3").limit(1).collect()
    rk = some[0]["RowKey"]
    step(
        f"lookup('3', {rk!r})",
        lambda: t.lookup("3", rk).count(),
    )
    step(
        "lookup miss",
        lambda: t.lookup("3", "no-such-key").count(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
