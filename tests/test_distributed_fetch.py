"""Distributed fetch (S1 scale path): executor-side fan-out with an
injectable opener, failure-as-data semantics, and the fully-
distributed from_csv parse."""

from __future__ import annotations

from pyspark.sql import functions as F


def _fake_opener():
    # returned as a nested closure so cloudpickle ships it BY VALUE —
    # a module-level function would pickle by reference to this test
    # module, which executor workers cannot import
    def fake(url: str) -> bytes:
        k = int(url.rsplit("/", 1)[1])
        if k % 4 == 3:
            raise TimeoutError(f"timeout on {url}")
        return f"a;b\n{k};x{k}\n{k + 100};y{k}\n".encode()

    return fake


def test_fetch_failures_are_rows(spark):
    from otrrentetl_spark.sources.csv_ingest import fetch_distributed

    urls = [f"fake://u/{k}" for k in range(8)]
    out = fetch_distributed(spark, urls, opener=_fake_opener()).collect()
    by_url = {r["url"]: r for r in out}
    assert len(by_url) == 8
    assert by_url["fake://u/3"]["status"] == "error"
    assert "timeout" in by_url["fake://u/3"]["error"]
    assert by_url["fake://u/3"]["payload"] is None
    assert by_url["fake://u/0"]["status"] == "ok"
    assert bytes(by_url["fake://u/0"]["payload"]).startswith(b"a;b\n")


def test_parse_fetched_csv_distributed(spark):
    from otrrentetl_spark.sources.csv_ingest import (
        fetch_distributed,
        parse_fetched_csv,
    )

    urls = [f"fake://u/{k}" for k in range(6)]
    fetched = fetch_distributed(spark, urls, opener=_fake_opener(), partitions=3)
    parsed = parse_fetched_csv(fetched, "a int, b string", sep=";")
    rows = {(r["a"], r["b"]) for r in parsed.collect()}
    ok_ks = [k for k in range(6) if k % 4 != 3]
    want = set()
    for k in ok_ks:
        want.add((k, f"x{k}"))
        want.add((k + 100, f"y{k}"))
    assert rows == want
    # header rows were dropped, not parsed as data
    assert parsed.filter(F.col("b") == "b").count() == 0
