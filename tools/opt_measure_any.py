"""Like tools/opt_measure.py but for ARBITRARY registry queries (the
bench-headline filter dropped) — used in the r13 round to profile
non-headline sweep outliers with the same methodology: 3x warm
plan-to-collect, noop sink, plan/job census, plan snapshot.

Run: python tools/opt_measure_any.py <tag> <query> [query ...]
Writes JSON to /tmp/opt_measure_<tag>.json and plans/r13/<q>_<tag>.txt.
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
PLANS_DIR = REPO / "plans" / os.environ.get("OPT_PLANS_ROUND", "r14")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]

    from otrrentetl_spark.registry import QUERIES
    from otrrentetl_spark.session import get_spark

    spark = get_spark(
        "opt-measure-any",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # Warm-up: JVM/codegen + Python worker pool (same as opt_measure).
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
