"""TPC-H-shaped multi-join analytics through the SQL layer — the
engine's "a user could run their reporting queries here" proof.
Expressed via spark.sql over registered temp views so the SQL front
door (parser → Catalyst → AQE) is exercised, not just the DataFrame
API; the oracles are the same ANSI text run by DuckDB.

Plan expectations (checked informally via bench + plan-shape tests):
region/nation broadcast; customer/orders/lineitem shuffle on their
join keys; partial aggregation before the final group-by exchange;
CostBasedJoinReorder free to reorder the star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from otrrentetl_spark.catalog import load_table
from otrrentetl_spark.registry import register


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def q3_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem,
    revenue per order, top-10 by revenue."""
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_Q3)


_Q3 = """
SELECT o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS order_date,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))
                * (1 - CAST(l.l_discount AS DECIMAL(30,6)))) AS DOUBLE)
         AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1995-03-15'
  AND l.l_shipdate > DATE '1995-03-15'
GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
"""

register("q3_order_revenue", q3_order_revenue, _Q3)


def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the six-table star — region → nation →
    customer/supplier co-location constraint → orders → lineitem,
    revenue per nation."""
    _views(
        spark, sf_dir, "region", "nation", "customer", "supplier", "orders", "lineitem"
    )
    return spark.sql(_Q5)


_Q5 = """
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))
                * (1 - CAST(l.l_discount AS DECIMAL(30,6)))) AS DOUBLE)
         AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name
"""

register("q5_nation_revenue", q5_nation_revenue, _Q5)


def q4_exists_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS — orders having at least one
    late-shipped lineitem, counted per priority. Catalyst decorrelates
    the subquery into a left-semi join."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q4)


_Q4 = """
SELECT o.o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate
)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""

register("q4_exists_priority", q4_exists_priority, _Q4)


def percentile_price_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p25/p50/p75) of extended price
    per return flag — Spark percentile() ≡ DuckDB quantile_cont."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               ROUND(percentile(l_extendedprice, 0.25), 4) AS p25,
               ROUND(percentile(l_extendedprice, 0.50), 4) AS p50,
               ROUND(percentile(l_extendedprice, 0.75), 4) AS p75
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


register(
    "percentile_price_summary",
    percentile_price_summary,
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
