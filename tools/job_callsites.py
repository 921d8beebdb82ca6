"""Per-JOB callsite census for a registry query: runs the query once
(after a warm-up) and prints, for every Spark job it submitted, the
job's first stage name (which carries the driver callsite, e.g.
``collect at merge.py:2253``) plus its stage/task counts.

Complements tools/lifecycle_census.py (which attributes job COUNTS to
wrapped verbs): this shows WHICH action inside the verb each job is.

Run: python tools/job_callsites.py <query> [query ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]

    from otrrentetl_spark.registry import QUERIES
    from otrrentetl_spark.session import get_spark

    spark = get_spark(
        "job-callsites",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm-up (codegen + python workers) on the first query
    QUERIES[names[0]](spark, SF_DIR).collect()

    for name in names:
        before = set(tracker.getJobIdsForGroup(None) or [])
        import time

        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).collect()
        wall = round(time.perf_counter() - t0, 3)
        new = sorted(set(tracker.getJobIdsForGroup(None) or []) - before)
        print(f"\n=== {name}: wall={wall}s jobs={len(new)} ===")
        jsc = sc._jsc.sc().statusTracker()
        for jid in new:
            ji = jsc.getJobInfo(jid)
            if ji.isEmpty():
                print(f"  job {jid}: <gone>")
                continue
            stage_ids = list(ji.get().stageIds())
            names_tasks = []
            total_tasks = 0
            for sid in stage_ids:
                si = jsc.getStageInfo(int(str(sid)))
                if si.isEmpty():
                    continue
                s = si.get()
                total_tasks += s.numTasks()
                names_tasks.append(s.name())
            first = names_tasks[0] if names_tasks else "?"
            print(
                f"  job {jid}: stages={len(stage_ids)}"
                f" tasks={total_tasks}  {first}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
