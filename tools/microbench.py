"""Micro-bench: time named registry queries at a given sf dir, warm
(min of N runs after one untimed warm-up), plus the DuckDB oracle on
the same parquet. Usage:

    python tools/microbench.py [sf_dir] name [name ...]

Wall-budget regression gate (r7 verdict item 4): queries whose DuckDB
oracle DNFs at corpus-scale fixtures (leakage_safe_split,
bpe_encode_corpus, dedup_clusters at 1000×) have no oracle-side
ratio to catch a perf regression — their committed pins could rot
silently. `tools/budgets.json` records the pinned wall per (query,
fixture label); running with `--budget=<label>` checks every timed
query that has a budget row for that label and EXITS 1 if its best
wall exceeds `budget_s` (1.5× the pin — wide enough to absorb the
measured cross-round host drift, tight enough to catch a real
algorithmic regression, which historically shows as 2×+).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def check_budgets(
    results: dict[str, float], budgets: dict, fixture: str
) -> list[str]:
    """Return one violation line per timed query whose wall exceeds
    its budget for this fixture label; empty list = within budget.
    Pure function so the harness itself is unit-testable (including
    the intentional-regression case) without a Spark session."""
    out = []
    for name, wall in results.items():
        row = budgets.get(name)
        if not row or row.get("fixture") != fixture:
            continue
        if wall > row["budget_s"]:
            out.append(
                f"BUDGET EXCEEDED: {name} at {fixture}: {wall:.1f}s > "
                f"{row['budget_s']:.1f}s (pin {row['pinned_s']:.1f}s, "
                f"r{row['pinned_round']})"
            )
    return out


def main() -> None:
    args = sys.argv[1:]
    # --duck-runs=N (default 3; 0 skips the DuckDB side entirely —
    # useful at very large fixtures where the single-node oracle
    # takes minutes per run and only the engine wall is of interest)
    # --sink=parquet times each engine WRITING its result to parquet
    # instead of materializing Python row objects on the driver. For
    # corpus-sized outputs (millions of rows) driver collect is pure
    # harness overhead no production job would pay — the 100 TB path
    # lands results in columnar storage — so collect-mode ratios stop
    # measuring the engines and start measuring row pickling.
    duck_runs = 3
    sink = "collect"
    budget_fixture = None
    runs = 3
    args = [a for a in args if not (
        (a.startswith("--duck-runs=")
         and (duck_runs := int(a.split("=")[1])) is not None)
        or (a.startswith("--sink=")
            and (sink := a.split("=")[1]) is not None)
        or (a.startswith("--budget=")
            and (budget_fixture := a.split("=")[1]) is not None)
        or (a.startswith("--runs=")
            and (runs := int(a.split("=")[1])) is not None)
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
    import shutil
    import tempfile

    sink_root = tempfile.mkdtemp(prefix="microbench_sink_") \
        if sink == "parquet" else None

    def run_spark(name):
        # The fn() call itself must sit INSIDE the timed section: for
        # driver-loop queries (BPE induction) the plan build IS the
        # computation, and for everything else it costs only ms.
        # FRESH plan per timed run (see module doc).
        if sink == "parquet":
            out = f"{sink_root}/{name}_spark"
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.parquet(out)
            dt = time.perf_counter() - t0
            n = con.execute(
                f"SELECT COUNT(*) FROM read_parquet('{out}/*.parquet')"
            ).fetchone()[0]
            return dt, n
        t0 = time.perf_counter()
        n = len(fn(spark, sf_dir).collect())
        return time.perf_counter() - t0, n

    def run_duck(sql, name):
        if sink == "parquet":
            import os

            out = f"{sink_root}/{name}_duck.parquet"
            if os.path.exists(out):
                os.remove(out)
            t0 = time.perf_counter()
            con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
            return time.perf_counter() - t0
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        return time.perf_counter() - t0

    def reclaim_shuffles():
        # each timed run builds a FRESH plan, so the previous run's
        # shuffle files are only reclaimed when the JVM GCs the
        # dereferenced RDDs (ContextCleaner). At corpus-scale fixtures
        # a shuffle-heavy query leaves ~10+ GB per run — force the GC
        # between runs or 4 runs exhaust /tmp (observed r7).
        spark._jvm.System.gc()
        time.sleep(1)

    results: dict[str, float] = {}
    for name in args:
        fn = QUERIES[name]
        run_spark(name)  # warm-up / codegen (same path as the timed runs)
        reclaim_shuffles()
        best, n = float("inf"), 0
        for _ in range(runs):
            dt, n = run_spark(name)
            best = min(best, dt)
            reclaim_shuffles()
        if runs > 0:  # --runs=0 warms caches only: never feed inf
            results[name] = best  # into the budget gate
        dbest = float("inf")
        sql = ORACLES.get(name) if duck_runs > 0 else None
        if sql:
            for _ in range(duck_runs):
                dbest = min(dbest, run_duck(sql, name))
        print(
            f"{name:35s} spark={best:7.3f}s duck={dbest:7.3f}s "
            f"ratio={best / dbest if sql else float('nan'):5.2f} rows={n}"
        )
    spark.stop()
    if budget_fixture:
        budgets = json.loads((REPO / "tools" / "budgets.json").read_text())
        violations = check_budgets(results, budgets, budget_fixture)
        for v in violations:
            print(v)
        if violations:
            sys.exit(1)
        print(f"budgets OK for fixture {budget_fixture}")


if __name__ == "__main__":
    main()
