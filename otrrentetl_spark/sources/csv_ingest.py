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
