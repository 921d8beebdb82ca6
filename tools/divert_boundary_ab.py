"""A/B for the compact-divert CHUNKING strategies (r13 verdict item 9 /
ADVICE open finding): the shipped path pins the oversized partition's
range chunking with a localCheckpoint (block storage ∝ diverted rows,
read back twice), the proposed alternative computes chunk boundaries
DRIVER-side from a sample and re-evaluates the scan per pass (no
block-storage pinning, but 2 extra evaluations and a per-row boundary
lookup).

Both legs produce identical layout decisions over the same hot
partition and run the identical downstream (per-chunk counts + rank
window + noop sink), so the wall difference isolates the chunking
mechanism itself:

  A (shipped): repartitionByRange → lazy localCheckpoint →
     groupBy(pid).count() → rank window over the pinned blocks → noop
  B (proposed): sample boundaries (approx quantiles of the order key)
     → pandas-UDF np.searchsorted chunk id (vectorized, guide §4.2)
     → groupBy(chunk).count() over a RE-EVALUATED scan → rank window
     over a THIRD evaluation → noop

    python tools/divert_boundary_ab.py [hot_rows] [chunks] [out_json]

Prints per-leg walls (min of 2 after a warm-up) and the row-count
parity check.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    hot_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    out_json = sys.argv[3] if len(sys.argv) > 3 else None

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from otrrentetl_spark.session import get_spark

    spark = get_spark(
        "divert-boundary-ab",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    base = Path("/tmp/divert_ab")
    shutil.rmtree(base, ignore_errors=True)
    src = str(base / "hot.parquet")
    # one hot partition's worth of keyed rows with a payload column —
    # the shape the divert sees (only the hot slice is diverted)
    spark.range(hot_rows).select(
        F.lit("hot").alias("PartitionKey"),
        F.format_string("%09d", F.col("id")).alias("RowKey"),
        F.sha1(F.col("id").cast("string")).alias("val"),
    ).write.mode("overwrite").parquet(src)

    def scan():
        return spark.read.parquet(src)

    def leg_a() -> int:
        rows = (
            scan()
            .repartitionByRange(chunks, "PartitionKey", "RowKey")
            .withColumn("__pid", F.spark_partition_id())
            .localCheckpoint(eager=False)
        )
        counts = {
            r["__pid"]: r["count"]
            for r in rows.groupBy("__pid").count().collect()
        }
        off, roff = 0, {}
        for pid in sorted(counts):
            roff[pid] = off
            off += counts[pid]
        rmap = spark.createDataFrame(
            [(p, o) for p, o in roff.items()], "__pid2 int, __roff long"
        )
        w = Window.partitionBy("__pid").orderBy("RowKey")
        laid = (
            rows.join(
                F.broadcast(rmap), F.col("__pid") == F.col("__pid2")
            )
            .withColumn(
                "__g",
                F.row_number().over(w).cast("long") + F.col("__roff") - 1,
            )
            .select("PartitionKey", "RowKey", "val", "__g")
        )
        laid.write.format("noop").mode("overwrite").save()
        return off

    def leg_b() -> int:
        # 1) driver-side sampled boundaries over the NARROW order key
        # (approxQuantile is numeric-only; row keys are strings, so
        # sample + sort + evenly-spaced ranks, like RangePartitioner)
        bounds = [
            r["RowKey"]
            for r in scan()
            .select("RowKey")
            .sample(False, min(1.0, 200_000 / hot_rows), seed=42)
            .sort("RowKey")
            .collect()
        ]
        step = max(1, len(bounds) // chunks)
        cuts = [
            bounds[i * step]
            for i in range(1, chunks)
            if i * step < len(bounds)
        ]

        @F.pandas_udf("int")
        def chunk_of(rk: pd.Series) -> pd.Series:
            import numpy as np

            return pd.Series(
                np.searchsorted(np.array(cuts, dtype=object), rk.values)
            ).astype("int32")

        # 2) per-chunk counts over a SECOND evaluation of the scan
        with_chunk = scan().withColumn("__pid", chunk_of("RowKey"))
        counts = {
            r["__pid"]: r["count"]
            for r in with_chunk.groupBy("__pid").count().collect()
        }
        off, roff = 0, {}
        for pid in sorted(counts):
            roff[pid] = off
            off += counts[pid]
        rmap = spark.createDataFrame(
            [(p, o) for p, o in roff.items()], "__pid2 int, __roff long"
        )
        # 3) layout over a THIRD evaluation
        w = Window.partitionBy("__pid").orderBy("RowKey")
        laid = (
            scan()
            .withColumn("__pid", chunk_of("RowKey"))
            .join(F.broadcast(rmap), F.col("__pid") == F.col("__pid2"))
            .withColumn(
                "__g",
                F.row_number().over(w).cast("long") + F.col("__roff") - 1,
            )
            .select("PartitionKey", "RowKey", "val", "__g")
        )
        laid.write.format("noop").mode("overwrite").save()
        return off

    # warm-up both shapes small, then min-of-2 each, interleaved
    for fn in (leg_a, leg_b):
        fn()
    walls = {"a_checkpoint": [], "b_boundaries": []}
    totals = set()
    for _ in range(2):
        t0 = time.perf_counter()
        totals.add(leg_a())
        walls["a_checkpoint"].append(round(time.perf_counter() - t0, 2))
        t0 = time.perf_counter()
        totals.add(leg_b())
        walls["b_boundaries"].append(round(time.perf_counter() - t0, 2))
    out = {
        "hot_rows": hot_rows,
        "chunks": chunks,
        "a_checkpoint_s": min(walls["a_checkpoint"]),
        "b_boundaries_s": min(walls["b_boundaries"]),
        "rows_agree": totals == {hot_rows},
        "runs": walls,
    }
    print(json.dumps(out))
    if out_json:
        Path(out_json).write_text(json.dumps(out, indent=1) + "\n")
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
