"""Query registry — the single source of truth for the driver contract.

``QUERIES`` maps a query name to a callable ``(spark, sf_dir) ->
DataFrame``; ``ORACLES`` maps the same name to an equivalent ANSI-SQL
string DuckDB can run over the identical parquet tables. Queries
without an oracle entry get a weaker rows-only check from the driver
(reserved for genuinely non-SQL-expressible operators).

Conventions (they are load-bearing for the hash comparison):
- every computed column is aliased identically in both dialects;
- floating aggregates go through DECIMAL(30,6) so the result is
  order-of-accumulation independent, then cast back to DOUBLE;
- every query that returns a LIMIT/top-k has a total ordering with a
  unique tiebreaker;
- arrays are sorted + stringified before comparison.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from otrrentetl_spark.plans import flagship as _flagship

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(
    name: str,
    fn: Callable[[SparkSession, str], DataFrame],
    oracle: str | None = None,
) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


register("flagship", _flagship.flagship, _flagship.FLAGSHIP_ORACLE_SQL)


def _register_all() -> None:
    """Import every plan module for its registration side effects."""
    from otrrentetl_spark.plans import (  # noqa: F401
        analytics,
        arrow_ops,
        behavior,
        curation_ops,
        graph_ops,
        llm_ops,
        profiling,
        reference_parity,
        scale_ops,
        scrape_parity,
        sql_breadth,
        stats_suite,
        streaming_equiv,
        temporal,
        timeseries,
        tpch_style,
        web_curation,
    )


_register_all()
