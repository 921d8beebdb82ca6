"""Wall pin for the oversized-partition compact auto-divert
(r12 verdict item 3).

Builds a keyed table with one deliberately HOT partition (>=10x its
siblings), then runs the exact-count compact twice on byte-identical
copies: once with the divert disabled (every partition funnels through
one window task — the pre-r13 behavior) and once with the divert
engaged (the hot partition's sort spreads over K range chunks). Both
legs produce the same exact per-partition file counts and one commit;
the pin is the wall: the diverted pass must not be dominated by the
hot partition's single-task sort.

    python tools/compact_divert_pin.py [hot_rows] [out_json]

Prints one JSON line {"funnel_s": ..., "divert_s": ..., "chunks": K}.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    hot_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else None

    from pyspark.sql import functions as F

    from otrrentetl_spark.operators import merge
    from otrrentetl_spark.session import get_spark

    spark = get_spark(
        "compact-divert-pin",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    base = Path("/tmp/divert_pin")
    shutil.rmtree(base, ignore_errors=True)
    base.mkdir(parents=True)

    # hot partition = hot_rows; 8 cold siblings at hot_rows/20 each
    cold_rows = hot_rows // 20
    hot = spark.range(hot_rows).select(
        F.lit("hot").alias("PartitionKey"),
        F.format_string("%09d", F.col("id")).alias("RowKey"),
        F.sha1(F.col("id").cast("string")).alias("val"),
        F.col("id").alias("n"),
    )
    cold = spark.range(8 * cold_rows).select(
        F.concat(F.lit("c"), (F.col("id") % 8).cast("string")).alias(
            "PartitionKey"
        ),
        F.format_string("%09d", F.col("id")).alias("RowKey"),
        F.sha1(F.col("id").cast("string")).alias("val"),
        F.col("id").alias("n"),
    )
    src = str(base / "src")
    t = merge.KeyedParquetTable(spark, src, ("PartitionKey", "RowKey"))
    t.overwrite(hot.unionByName(cold))
    parts = ["hot"] + [f"c{i}" for i in range(8)]

    sizes = t._data_file_sizes()
    hot_bytes = sum(
        sz for f, sz in sizes.items() if f.startswith("PartitionKey=hot/")
    )
    cold_bytes = max(
        sum(
            sz
            for f, sz in sizes.items()
            if f.startswith(f"PartitionKey=c{i}/")
        )
        for i in range(8)
    )
    print(
        f"fixture: hot={hot_rows} rows/{hot_bytes >> 20} MiB,"
        f" cold(max)={cold_rows} rows/{cold_bytes >> 20} MiB",
        flush=True,
    )

    def leg(name: str, funnel_bytes: int) -> tuple[float, dict]:
        path = str(base / name)
        shutil.copytree(src, path)
        tt = merge.KeyedParquetTable(
            spark, path, ("PartitionKey", "RowKey")
        )
        tt.compact_funnel_max_bytes = funnel_bytes
        t0 = time.perf_counter()
        tt.compact(partitions=parts, files_per_partition=8, cluster=True)
        w = time.perf_counter() - t0
        snap = tt._read_snapshot()
        counts: dict[str, int] = {}
        for f in snap["files"]:
            d = f.split("/", 1)[0]
            counts[d] = counts.get(d, 0) + 1
        assert all(c == 8 for c in counts.values()), counts
        total = tt.read().count()
        assert total == hot_rows + 8 * cold_rows, total
        print(
            f"{name}: {w:.2f}s — stats {tt.last_compact_stats}",
            flush=True,
        )
        return w, dict(tt.last_compact_stats)

    # funnel leg first, divert second (any cache warmth favors the
    # leg measured FIRST, biasing against the claim)
    w_funnel, st_f = leg("funnel", 1 << 60)
    assert st_f["diverted_dirs"] == []
    w_divert, st_d = leg("divert", max(cold_bytes + 1, hot_bytes // 8))
    assert st_d["diverted_dirs"] == ["PartitionKey=hot"]
    assert st_d["range_chunks"] >= 2

    result = {
        "hot_rows": hot_rows,
        "hot_mib": hot_bytes >> 20,
        "funnel_s": round(w_funnel, 2),
        "divert_s": round(w_divert, 2),
        "chunks": st_d["range_chunks"],
        "speedup": round(w_funnel / w_divert, 2),
    }
    print(json.dumps(result), flush=True)
    if out_json:
        Path(out_json).write_text(json.dumps(result, indent=1))
    if w_divert >= w_funnel:
        print("PIN VIOLATION: divert did not beat the funnel")
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
