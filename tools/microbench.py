"""Micro-bench: time named registry queries at a given sf dir, warm
(min of N runs after one untimed warm-up), plus the DuckDB oracle on
the same parquet. Usage:

    python tools/microbench.py [sf_dir] name [name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    args = sys.argv[1:]
    # --duck-runs=N (default 3; 0 skips the DuckDB side entirely —
    # useful at very large fixtures where the single-node oracle
    # takes minutes per run and only the engine wall is of interest)
    duck_runs = 3
    args = [a for a in args if not (
        a.startswith("--duck-runs=")
        and (duck_runs := int(a.split("=")[1])) is not None
    )]
    sf_dir = "/root/testdata/sf0.1"
    if args and "/" in args[0]:
        sf_dir, args = args[0], args[1:]
    from otrrentetl_spark.registry import ORACLES, QUERIES
    from otrrentetl_spark.session import get_spark

    spark = get_spark("microbench")
    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )
    for name in args:
        fn = QUERIES[name]
        fn(spark, sf_dir).collect()  # warm-up / codegen
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            n = len(fn(spark, sf_dir).collect())
            best = min(best, time.perf_counter() - t0)
        dbest = float("inf")
        sql = ORACLES.get(name) if duck_runs > 0 else None
        if sql:
            for _ in range(duck_runs):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                dbest = min(dbest, time.perf_counter() - t0)
        print(
            f"{name:35s} spark={best:7.3f}s duck={dbest:7.3f}s "
            f"ratio={best / dbest if sql else float('nan'):5.2f} rows={n}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
