"""Optimization-round measurement harness (guide §1).

For every bench headline query at $SPARK_GRAFT_SF_DIR:
  - times three plan-to-collect executions (bench methodology) and one
    noop-sink execution (guide §1.4: computes every column, no result
    fetch) so compute and result-fetch are separable;
  - counts Spark jobs / stages / tasks the query submits (warm run),
    via the REST-free StatusTracker delta — the fixed-overhead signal
    that dominates sub-second queries at bench SF;
  - snapshots ``explain("formatted")`` to plans/r13/<name>_<tag>.txt.

Run: python tools/opt_measure.py <tag> [query ...]
Writes JSON to /tmp/opt_measure_<tag>.json and the plan files.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = REPO / "plans" / "r13"


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    import bench as bench_mod
    from otrrentetl_spark.registry import QUERIES
    from otrrentetl_spark.session import get_spark

    spark = get_spark(
        "opt-measure",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    names = [n for n in bench_mod.HEADLINE if n in QUERIES]
    if only:
        names = [n for n in names if n in only]

    # Warm-up (same as bench): JVM/codegen + Python worker pool.
    QUERIES[names[0]](spark, SF_DIR).collect()
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _ident(s):  # type: ignore[no-untyped-def]
        return s

    spark.range(1000).select(_ident("id")).collect()

    PLANS_DIR.mkdir(parents=True, exist_ok=True)
    out: dict[str, dict] = {}
    for name in names:
        sc.setJobDescription(f"opt_measure:{name}")
        # Plan-side fixed cost: Python plan construction + Catalyst
        # analysis/optimization/physical planning (pre-AQE). Paid on
        # EVERY run under the bench's fresh-plan methodology; pure
        # per-plan-shape cost, independent of data size.
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        build_wall = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()  # noqa: SLF001
        optimize_wall = round(time.perf_counter() - t0, 3)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        (PLANS_DIR / f"{name}_{tag}.txt").write_text(plan)

        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).collect()
            runs.append(round(time.perf_counter() - t0, 3))

        # Job/stage/task census on one more (warm) run.
        before_jobs = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).collect()
        census_wall = round(time.perf_counter() - t0, 3)
        after_jobs = set(tracker.getJobIdsForGroup(None) or [])
        new_jobs = sorted(after_jobs - before_jobs)
        n_stages = 0
        n_tasks = 0
        for jid in new_jobs:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks

        # Noop-sink run: computation only, no result fetch.
        t0 = time.perf_counter()
        (
            QUERIES[name](spark, SF_DIR)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        noop_wall = round(time.perf_counter() - t0, 3)

        out[name] = {
            "runs": runs,
            "warm": min(runs),
            "build": build_wall,
            "optimize": optimize_wall,
            "noop": noop_wall,
            "census_wall": census_wall,
            "jobs": len(new_jobs),
            "stages": n_stages,
            "tasks": n_tasks,
            "exchanges": plan.count("Exchange"),
            "bcast": plan.count("BroadcastExchange"),
            "pyeval": plan.count("EvalPython")
            + plan.count("MapInArrow")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas"),
        }
        sc.setJobDescription(None)
        print(
            f"{name:32s} warm={min(runs):6.3f} noop={noop_wall:6.3f} "
            f"build={build_wall:5.3f} opt={optimize_wall:5.3f} "
            f"jobs={len(new_jobs):2d} stages={n_stages:3d} tasks={n_tasks:4d} "
            f"exch={out[name]['exchanges'] - out[name]['bcast']:2d} "
            f"bcast={out[name]['bcast']:2d} py={out[name]['pyeval']}",
            flush=True,
        )

    total = round(sum(v["warm"] for v in out.values()), 3)
    print(f"TOTAL warm={total}")
    Path(f"/tmp/opt_measure_{tag}.json").write_text(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
