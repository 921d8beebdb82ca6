"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet, then compares row count, column
names, and an order-insensitive multiset of normalized row values.

Usage:
    python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

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


def _norm(v):
    """Normalize a scalar for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round to 9 significant-ish decimals to absorb representation noise
        return f"{v:.9g}"
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.9g}"
    except ImportError:
        pass
    return v


def rows_multiset(colnames, rows):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def compare_one(spark, con, name, fn, sql, sf_dir):
    t0 = time.time()
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    t_spark = time.time() - t0

    t0 = time.time()
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    t_duck = time.time() - t0

    problems = []
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
    if not problems:
        sm, dm = rows_multiset(s_cols, s_rows), rows_multiset(d_cols, d_rows)
        if sm != dm:
            diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
            problems.append(f"values differ; first diffs: {diff}")
    status = "OK" if not problems else "FAIL"
    print(
        f"[{status}] {name:36s} rows={len(s_rows):>7} "
        f"spark={t_spark:6.2f}s duck={t_duck:6.2f}s"
        + ("" if not problems else f"\n       {'; '.join(problems)}")
    )
    return not problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF_DIR
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from otrrentetl_spark.session import get_spark

    spark = get_spark("verify_oracle", cpus=8)
    con = duck_connect(sf_dir)
    qs, oracles = e.queries(), e.oracle_sql()

    ok = fail = no_oracle = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            try:
                n = fn(spark, sf_dir).count()
                print(f"[ROWS] {name:36s} rows={n:>7} (no oracle — rows-only)")
                no_oracle += 1
            except Exception as ex:  # noqa: BLE001
                print(f"[ERR ] {name:36s} {ex}")
                fail += 1
            continue
        try:
            if compare_one(spark, con, name, fn, oracles[name], sf_dir):
                ok += 1
            else:
                fail += 1
        except Exception as ex:  # noqa: BLE001
            print(f"[ERR ] {name:36s} {type(ex).__name__}: {str(ex)[:300]}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail, {no_oracle} rows-only")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
