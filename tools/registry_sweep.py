"""Time every registry query once (plan-to-collect) at
$SPARK_GRAFT_SF_DIR in one session — the coarse outlier finder for the
optimization rounds. One run per query (bench methodology, fresh plan)
keeps the sweep ~10 min; treat individual numbers as ±host noise and
re-measure anything interesting with tools/opt_measure.py.

Run: python tools/registry_sweep.py [tag]   → /tmp/registry_sweep_<tag>.json
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    from otrrentetl_spark.registry import QUERIES
    from otrrentetl_spark.session import get_spark

    spark = get_spark(
        "registry-sweep",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext

    # Warm-up: JVM codegen + Python worker pool.
    next(iter(QUERIES.values()))(spark, SF_DIR).collect()

    out: dict[str, float] = {}
    for name, fn in QUERIES.items():
        sc.setJobDescription(f"sweep:{name}")
        t0 = time.perf_counter()
        try:
            fn(spark, SF_DIR).collect()
            wall = round(time.perf_counter() - t0, 3)
        except Exception:
            wall = -1.0
            traceback.print_exc()
        out[name] = wall
        print(f"{name:40s} {wall:7.3f}", flush=True)
        sc.setJobDescription(None)
    total = round(sum(v for v in out.values() if v > 0), 3)
    print(f"TOTAL {total}  over {len(out)} queries")
    Path(f"/tmp/registry_sweep_{tag}.json").write_text(
        json.dumps(out, indent=1) + "\n"  # ADVICE r13: trailing newline
    )
    spark.stop()


if __name__ == "__main__":
    main()
