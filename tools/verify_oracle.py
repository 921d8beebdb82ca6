"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet, then compares row count, column
names, and an order-insensitive multiset of normalized row values.

Fidelity notes (learned from round-1 driver mismatches the old float
normalization hid):
- Both sides go through pandas (``toPandas`` / ``.df()``) exactly like
  the driver, so dtype coercions happen here too — e.g. DuckDB
  SUM(INTEGER) yields HUGEINT which pandas converts to float64, while
  Spark stays int64. Values are tagged with their numeric class so an
  int-vs-float divergence FAILS instead of normalizing away.
- List/ndarray values in any output column are an immediate failure:
  the driver's hash comparison crashes on unhashable types, so array
  columns must be stringified (array_join / array_to_string) upstream.

Usage:
    python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

DEFAULT_SF_DIR = "/root/testdata/sf0.01"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


class Unhashable(Exception):
    """An output column holds list/array values — the driver would crash."""


def _norm(v):
    """Normalize a scalar, preserving the numeric CLASS (int vs float vs
    decimal) so cross-engine dtype drift is caught, not hidden."""
    if v is None:
        return "∅"
    if isinstance(v, (list, tuple, np.ndarray)):
        raise Unhashable(type(v).__name__)
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "f:NaN"
        return f"f:{f!r}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, pd.Timestamp):
        return f"t:{v.isoformat()}"
    if hasattr(v, "isoformat"):
        return f"t:{v.isoformat()}"
    if isinstance(v, bytes):
        return f"x:{v.hex()}"
    return f"s:{v}"


def _canon(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    rows = []
    for r in pdf[cols].itertuples(index=False, name=None):
        rows.append(tuple(_norm(x) for x in r))
    return sorted(rows)


def compare_one(spark, con, name, fn, sql, sf_dir, log=None):
    t0 = time.time()
    sdf = fn(spark, sf_dir)
    spdf = sdf.toPandas()
    t_spark = time.time() - t0

    t0 = time.time()
    dpdf = con.execute(sql).df()
    t_duck = time.time() - t0

    problems = []
    sig = None
    if len(spdf) != len(dpdf):
        problems.append(f"rowcount spark={len(spdf)} duck={len(dpdf)}")
    if sorted(spdf.columns) != sorted(dpdf.columns):
        problems.append(
            f"columns spark={sorted(spdf.columns)} duck={sorted(dpdf.columns)}"
        )
    if not problems:
        try:
            sm, dm = _canon(spdf), _canon(dpdf)
        except Unhashable as ex:
            problems.append(f"unhashable array column in output ({ex})")
        else:
            import hashlib

            sig = hashlib.md5(repr(sm).encode()).hexdigest()[:16]
            if sm != dm:
                diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
                problems.append(f"values differ; first diffs: {diff}")
    status = "OK" if not problems else "FAIL"
    print(
        f"[{status}] {name:36s} rows={len(spdf):>7} "
        f"spark={t_spark:6.2f}s duck={t_duck:6.2f}s"
        + ("" if not problems else f"\n       {'; '.join(problems)}")
    )
    if log is not None:
        log[name] = {
            "status": status,
            "rows": len(spdf),
            "value_hash": sig,
            "spark_s": round(t_spark, 2),
            "duck_s": round(t_duck, 2),
        }
    return not problems


def rows_only_check(spark, name, fn, sf_dir):
    """No oracle: still run it, and still reject array-typed outputs so
    the driver's weaker rows-only path can't crash either."""
    df = fn(spark, sf_dir)
    pdf = df.limit(50).toPandas()
    try:
        _canon(pdf)
    except Unhashable as ex:
        print(f"[FAIL] {name:36s} unhashable array column in output ({ex})")
        return False
    n = df.count()
    print(f"[ROWS] {name:36s} rows={n:>7} (no oracle — rows-only)")
    return True


def _driver_sampled_names() -> set[str]:
    """Every query name any round's driver sample has already gated
    (the CORRECTNESS_r*.json files committed at the repo root)."""
    import json

    names: set[str] = set()
    for p in REPO.glob("CORRECTNESS_r*.json"):
        try:
            names.update(json.loads(p.read_text()).keys())
        except Exception:  # noqa: BLE001 — a malformed log just doesn't count
            pass
    return names


def main():
    # --log=PATH: write a JSON certification log {name: {status, rows,
    #   value_hash, spark_s, duck_s}} for every query this run gated.
    # --rotate: order the sweep so names NEVER sampled by any round
    #   driver run first — blind-spot insurance (r5 verdict item 8):
    #   the per-round driver gates 50 of the registry; this records a
    #   full-registry pass with per-query value hashes.
    log_path = None
    rotate = False
    argv = []
    for a in sys.argv[1:]:
        if a.startswith("--log="):
            log_path = a.split("=", 1)[1]
        elif a == "--rotate":
            rotate = True
        else:
            argv.append(a)
    sf_dir = argv[0] if argv else DEFAULT_SF_DIR
    only = set(argv[1:])

    import __spark_entry__ as e
    from otrrentetl_spark.session import get_spark

    # SPARK_GRAFT_HOSTILE=1: adversarial runtime config — prime
    # shuffle-partition count, every broadcast demoted to a shuffle
    # join. A query that passes the oracle gate under BOTH the default
    # and the hostile layout is partition- and join-strategy-
    # independent, which is the property that scales.
    import os

    hostile = os.environ.get("SPARK_GRAFT_HOSTILE") == "1"
    extra = (
        {
            "spark.sql.shuffle.partitions": "7",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        }
        if hostile
        else None
    )
    spark = get_spark("verify_oracle", cpus=8, extra_conf=extra)
    if hostile:
        print("[HOSTILE] broadcasts disabled, shuffle.partitions=7")
    con = duck_connect(sf_dir)
    qs, oracles = e.queries(), e.oracle_sql()

    names = [n for n in qs if not only or n in only]
    if rotate:
        sampled = _driver_sampled_names()
        never = [n for n in names if n not in sampled]
        print(
            f"[ROTATE] {len(never)} never-driver-sampled names run first"
            f" (of {len(names)})"
        )
        names = never + [n for n in names if n in sampled]

    log: dict = {}
    ok = fail = no_oracle = 0
    for name in names:
        fn = qs[name]
        if name not in oracles:
            try:
                if rows_only_check(spark, name, fn, sf_dir):
                    no_oracle += 1
                    log[name] = {"status": "ROWS", "value_hash": None}
                else:
                    fail += 1
                    log[name] = {"status": "FAIL", "value_hash": None}
            except Exception as ex:  # noqa: BLE001
                print(f"[ERR ] {name:36s} {ex}")
                fail += 1
                log[name] = {"status": "ERR", "value_hash": None}
            finally:
                spark.catalog.clearCache()  # see loop-tail comment
            continue
        try:
            if compare_one(spark, con, name, fn, oracles[name], sf_dir, log):
                ok += 1
            else:
                fail += 1
        except Exception as ex:  # noqa: BLE001
            print(f"[ERR ] {name:36s} {type(ex).__name__}: {str(ex)[:300]}")
            fail += 1
            log[name] = {"status": "ERR", "value_hash": None}
        finally:
            # ADVICE r7: dedup/similarity builders persist small
            # intermediate frames whose lifetime is the returned
            # DataFrame's — a 178-query sweep in one session would
            # otherwise accumulate MEMORY_AND_DISK blocks unboundedly.
            spark.catalog.clearCache()
    print(f"\n{ok} ok, {fail} fail, {no_oracle} rows-only")
    if log_path:
        import datetime
        import json

        sampled = _driver_sampled_names()
        payload = {
            "generated_utc": datetime.datetime.now(
                datetime.timezone.utc
            ).isoformat(timespec="seconds"),
            "sf_dir": sf_dir,
            "n_queries": len(log),
            "n_never_driver_sampled": sum(
                1 for n in log if n not in sampled
            ),
            "queries": log,
        }
        Path(log_path).write_text(json.dumps(payload, indent=1))
        print(f"log written: {log_path}")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
