"""Data-profiling operators: per-column statistics and value
histograms — the QA pass any large-scale ingest runs before training
data is trusted.

Scale shapes: the column profile is ONE pass over the table (a single
wide aggregate; the multi-column exact distincts expand rows k-fold
map-side, still one shuffle); the histogram is a plain two-level
aggregate. Outputs are metadata-sized.

Determinism: doubles never reach string form (engines format them
differently) — o_totalprice is profiled in integer cents; dates via
the CAST(CAST(x AS DATE) AS STRING) idiom both engines parse
identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from otrrentetl_spark.catalog import load_table
from otrrentetl_spark.registry import register


def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of `orders`: null count, exact distinct count,
    min/max (stringified type-safely), one output row per column."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100.0, 0).cast("long")
    date_s = F.col("o_orderdate").cast("date").cast("string")
    cols = {
        "o_orderkey": F.col("o_orderkey").cast("string"),
        "o_custkey": F.col("o_custkey").cast("string"),
        "o_orderstatus": F.col("o_orderstatus"),
        "o_orderpriority": F.col("o_orderpriority"),
        "o_orderdate": date_s,
        "o_totalprice_cents": cents.cast("string"),
    }
    # min/max on the ORIGINAL ordering domain, stringified after:
    # string min/max of numbers would compare lexicographically.
    order_domain = {
        "o_orderkey": F.col("o_orderkey"),
        "o_custkey": F.col("o_custkey"),
        "o_orderstatus": F.col("o_orderstatus"),
        "o_orderpriority": F.col("o_orderpriority"),
        "o_orderdate": F.col("o_orderdate").cast("date"),
        "o_totalprice_cents": cents,
    }
    # One independent two-level aggregate per column, union'd: the
    # six-way count_distinct in a single agg() planned as a 7x Expand
    # into a 7-key SortAggregate over every expanded row (~1M wide rows
    # sorted at sf0.1). Per-column groupBy(value) reduces map-side to
    # the distinct values, shuffles only those, and needs no Expand and
    # no sort; the six branches run as parallel stage chains of one
    # job. n_nulls folds out of the same value histogram (sum of null-
    # value counts), n_distinct = count of non-null groups.
    branches = []
    for name, dom in order_domain.items():
        g = o.groupBy(dom.alias("v")).agg(F.count(F.lit(1)).alias("cnt"))
        branches.append(
            g.agg(
                F.coalesce(
                    F.sum(F.when(F.col("v").isNull(), F.col("cnt"))),
                    F.lit(0),
                )
                .cast("long")
                .alias("n_nulls"),
                F.count("v").alias("n_distinct"),
                F.min("v").cast("string").alias("min_s"),
                F.max("v").cast("string").alias("max_s"),
            ).select(
                F.lit(name).alias("col_name"),
                "n_nulls",
                "n_distinct",
                "min_s",
                "max_s",
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def _profile_sql() -> str:
    specs = {
        "o_orderkey": "o_orderkey",
        "o_custkey": "o_custkey",
        "o_orderstatus": "o_orderstatus",
        "o_orderpriority": "o_orderpriority",
        "o_orderdate": "CAST(o_orderdate AS DATE)",
        "o_totalprice_cents": "CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)",
    }
    rows = "\nUNION ALL\n".join(
        f"""SELECT '{name}' AS col_name,
           CAST(SUM(CASE WHEN {e} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {e}) AS BIGINT) AS n_distinct,
           CAST(MIN({e}) AS VARCHAR) AS min_s,
           CAST(MAX({e}) AS VARCHAR) AS max_s
    FROM orders"""
        for name, e in specs.items()
    )
    return rows


register("profile_orders_columns", profile_orders_columns, _profile_sql())


def value_histogram_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram (25-unit buckets, clamped at 24) of
    event value per event_type, with within-type fractions."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / F.lit(25.0)), F.lit(23)).cast("int")
    counts = (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = W.partitionBy("event_type")
    return counts.select(
        "event_type",
        "bucket",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(total)).alias("frac"),
    )


register(
    "value_histogram_by_type",
    value_histogram_by_type,
    """
    WITH counts AS (
      SELECT event_type,
             CAST(LEAST(FLOOR(value / 25.0), 23) AS INTEGER) AS bucket,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, bucket, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY event_type) AS frac
    FROM counts
    """,
)
