"""S1/S2 sources: HTTP fetch + `;`-delimited CSV scan (SURVEY.md §2.1).

The reference fetches a remote CSV to a local file and parses it with
``csv.DictReader`` (otrrentetl/server/etl.py:32-40, 75-92). Here the
fetch stays a thin driver-side connector (network I/O is not a Spark
concern; at scale a fetch fan-out would be
``sc.parallelize(urls).mapPartitions(fetch)``), while parsing is
Spark's distributed CSV reader.
"""

from __future__ import annotations

import urllib.request
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def fetch_to_file(
    url: str,
    dest: str | Path,
    opener: Callable[[str], bytes] | None = None,
) -> Path:
    """S1: GET ``url`` into ``dest``. ``opener`` is injectable so
    pipelines run offline in tests (the reference's scrape targets are
    long gone); default is a plain urllib GET."""

    def _default(u: str) -> bytes:
        with urllib.request.urlopen(u) as resp:  # noqa: S310
            return resp.read()

    data = (opener or _default)(url)
    dest = Path(dest)
    dest.parent.mkdir(parents=True, exist_ok=True)
    dest.write_bytes(data)
    return dest


def read_semicolon_csv(spark: SparkSession, path: str | Path) -> DataFrame:
    """S2: `;`-delimited, header row, permissive parse, everything as
    string — typing happens downstream through the safe-cast layer
    (C1), reproducing the reference's coerce-with-default-on-read
    (otrrentetl/server/etl.py:89-92 with ``errors='ignore'``).
    """
    return (
        spark.read.option("sep", ";")
        .option("header", True)
        .option("encoding", "UTF-8")
        .option("mode", "PERMISSIVE")
        .csv(str(path))
    )


def fetch_distributed(
    spark: SparkSession,
    urls: list[str],
    opener: Callable[[str], bytes] | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """S1 at scale: fan the URL list across executors and fetch in
    parallel — the 100 TB shape of the reference's one-at-a-time
    driver GET (otrrentetl/server/etl.py:32-35, 75-79).

    Returns (url, status, payload binary, error). mapPartitions, not
    per-row UDF: one Python invocation per partition amortizes
    connection setup, and a partition is the natural retry/rate-limit
    unit. The `opener` closure is cloudpickled to executors — tests
    inject a deterministic fake; production uses the urllib default.
    Failures are rows, not exceptions (status='error'), so one dead
    URL can't kill a 10M-URL crawl.
    """

    def _default(u: str) -> bytes:
        with urllib.request.urlopen(u) as resp:  # noqa: S310
            return resp.read()

    fetch = opener or _default

    def fetch_partition(rows):
        for r in rows:
            u = r[0]
            try:
                yield (u, "ok", fetch(u), None)
            except Exception as ex:  # noqa: BLE001 — failure is data
                yield (u, "error", None, str(ex)[:500])

    n = partitions or min(len(urls), spark.sparkContext.defaultParallelism)
    rdd = spark.sparkContext.parallelize([(u,) for u in urls], max(n, 1))
    return spark.createDataFrame(
        rdd.mapPartitions(fetch_partition),
        "url string, status string, payload binary, error string",
    )


def parse_fetched_csv(
    fetched: DataFrame,
    schema_ddl: str,
    sep: str = ";",
) -> DataFrame:
    """S2 over fetch_distributed output, fully distributed: decode the
    payload, split into lines, drop the header, and parse each line
    with ``from_csv`` — column expressions end to end, so a million
    fetched files parse without ever touching the driver."""
    from pyspark.sql import functions as F

    lines = (
        fetched.filter(F.col("status") == "ok")
        .withColumn("__text", F.decode("payload", "UTF-8"))
        .withColumn("__line", F.explode(F.split("__text", "\r?\n")))
        .filter(F.length(F.trim("__line")) > 0)
    )
    header = F.split(F.lit(schema_ddl), ",").getItem(0)  # "col type" of first field
    first_col = F.trim(F.split(header, " ").getItem(0))
    body = lines.filter(
        F.trim(F.split("__line", sep).getItem(0)) != first_col
    )
    parsed = body.select(
        "url",
        F.from_csv(
            "__line", schema_ddl, {"sep": sep, "mode": "PERMISSIVE"}
        ).alias("__row"),
    )
    return parsed.select("url", "__row.*")
