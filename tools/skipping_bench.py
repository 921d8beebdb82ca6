"""Measure the manifest footer-stats file-skipping win: build a
KeyedParquetTable from a documents fixture (PartitionKey = source,
RowKey = zero-padded doc_id), range-cluster it, then time a point
lookup() (index-pruned read) against the same filter over the plain
manifest read. Prints one JSON line.

Run: python tools/skipping_bench.py [sf_dir] [files_per_partition]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
FILES_PER_PART = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def main() -> None:
    from pyspark.sql import functions as F

    from otrrentetl_spark.operators.merge import KeyedParquetTable
    from otrrentetl_spark.session import get_spark

    spark = get_spark("skipping_bench")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("source").alias("PartitionKey"),
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("RowKey"),
        F.length("text").alias("n_chars"),
    )
    scratch = tempfile.mkdtemp(prefix="skipbench_")
    try:
        t = KeyedParquetTable(
            spark, f"{scratch}/tbl", ("PartitionKey", "RowKey")
        )
        t0 = time.perf_counter()
        t.overwrite(docs)
        t_write = time.perf_counter() - t0
        t0 = time.perf_counter()
        t.compact(cluster=True, files_per_partition=FILES_PER_PART)
        t_cluster = time.perf_counter() - t0

        snap = t._read_snapshot()
        parts = sorted({f.split("/", 1)[0] for f in snap["files"]})
        probes = [pdir.split("=", 1)[1] for pdir in parts[:4]]

        def timed(fn, runs=5):
            best = float("inf")
            for _ in range(runs):
                s = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - s)
            return best

        results = {}
        for pv in probes:
            # a real key: the partition's max RowKey (forces the last
            # range file, a fair single-file probe)
            rk = (
                t.read()
                .filter(F.col("PartitionKey") == pv)
                .agg(F.max("RowKey"))
                .first()[0]
            )
            n_files_part = sum(
                1
                for f in snap["files"]
                if f.split("/", 1)[0] == f"PartitionKey={pv}"
            )
            n_files_hit = len(t._lookup_files(pv, rk))
            t_skip = timed(lambda: t.lookup(pv, rk).collect())
            t_full = timed(
                lambda: t.read()
                .filter(
                    (F.col("PartitionKey") == pv) & (F.col("RowKey") == rk)
                )
                .collect()
            )
            results[pv] = {
                "files_in_partition": n_files_part,
                "files_after_skip": n_files_hit,
                "lookup_s": round(t_skip, 4),
                "full_filter_s": round(t_full, 4),
                "speedup": round(t_full / t_skip, 2) if t_skip else None,
            }
        print(
            json.dumps(
                {
                    "sf_dir": SF_DIR,
                    "files_per_partition": FILES_PER_PART,
                    "write_s": round(t_write, 2),
                    "cluster_compact_s": round(t_cluster, 2),
                    "probes": results,
                }
            )
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
