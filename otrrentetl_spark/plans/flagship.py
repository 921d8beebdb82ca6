"""Flagship query — the reference's core business question recast.

Reference semantics being exercised (SURVEY.md §7.1): "top recordings
with their torrent availability" — filter a fact table
(reference: otrrentetl/server/etl.py:141 rating IN-list), broadcast-
join a small dimension with a default on miss (etl.py:98 +
tablemodels.py:98-104, miss ⇒ 'Sonstiges'), join a second fact on a
key (etl.py:249-256), count matches per group with HAVING >= 1
(etl.py:252-254), keep the top of the list (etl.py:123-159 toplist).

Recast over the TPC-H-ish test tables:
  orders ≈ recordings, nation ≈ genres (via customer), lineitem ≈
  torrents.

Scale notes: nation is a bona-fide dimension → explicit
``F.broadcast``. The child fact is AGGREGATED BEFORE THE JOIN
(groupBy l_orderkey with map-side partial aggregation), so the
orders↔lineitem shuffle carries three aggregated columns per order
instead of every line item — on the 100 TB design point lineitem is
the dominant table and this is the difference between shuffling the
corpus and shuffling a rollup. Because orders are unique by key, the
join result needs no further grouping: the plan ends in a TakeOrdered
top-k, one exchange fewer than the join-then-group shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otrrentetl_spark.catalog import load_table

TOP_K = 25


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    lineitem = load_table(spark, sf_dir, "lineitem")

    # F3-style IN-list filter on the fact (rating ∈ {'sehr hoch','hoch'}).
    top_orders = orders.filter(F.col("o_orderstatus").isin("F", "P"))

    # J1: broadcast lookup join with default-on-miss ('Sonstiges').
    enriched = (
        top_orders.join(customer, F.col("o_custkey") == F.col("c_custkey"), "inner")
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left",
        )
        .withColumn("genre", F.coalesce(F.col("n_name"), F.lit("Sonstiges")))
    )

    # J2/A2: aggregate the child fact FIRST (per order), then join —
    # the inner join IS the HAVING n >= 1 gate (orders with no line
    # items simply don't appear in the aggregate).
    li_agg = lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        # exact integer-cents aggregation → deterministic across
        # engines (long sums are associative) AND codegen-fast —
        # decimal(30,6) sums fall off the compact-long decimal path
        # and measured ~2× the agg cost. Prices are exact 2-decimal,
        # so round(x*100) is collision-free; a global cents sum stays
        # under 2^63 beyond the 100 TB design point (~2e18 cents).
        # One double division at the end, same operation order as the
        # oracle, so the emitted double is bit-identical.
        (
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("double")
            / F.lit(100.0)
        ).alias("revenue"),
    )
    counted = enriched.join(
        li_agg, F.col("l_orderkey") == F.col("o_orderkey"), "inner"
    ).select("o_orderkey", "genre", "n_items", "revenue")

    # I4/top-k: TakeOrderedAndProject, unique tiebreaker for determinism.
    return counted.orderBy(
        F.col("n_items").desc(), F.col("revenue").desc(), F.col("o_orderkey")
    ).limit(TOP_K)


FLAGSHIP_ORACLE_SQL = f"""
SELECT o_orderkey,
       COALESCE(n_name, 'Sonstiges') AS genre,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
LEFT JOIN nation ON c_nationkey = n_nationkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderstatus IN ('F', 'P')
GROUP BY o_orderkey, COALESCE(n_name, 'Sonstiges')
HAVING COUNT(*) >= 1
ORDER BY n_items DESC, revenue DESC, o_orderkey
LIMIT {TOP_K}
"""
