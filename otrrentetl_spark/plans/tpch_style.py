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
       CAST(CAST(o.o_orderdate AS DATE) AS STRING) AS order_date,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))
                * (1 - CAST(l.l_discount AS DECIMAL(30,6)))) AS DECIMAL(38,6)) AS DOUBLE)
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
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))
                * (1 - CAST(l.l_discount AS DECIMAL(30,6)))) AS DECIMAL(38,6)) AS DOUBLE)
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
    per return flag — Spark percentile() ≡ DuckDB quantile_cont.

    One array-argument percentile() call: three scalar calls would run
    three independent aggregate buffers, each holding (and merging) the
    full per-group value map — 3x the aggregation state and merge work
    for identical results."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               ROUND(ps[0], 4) AS p25,
               ROUND(ps[1], 4) AS p50,
               ROUND(ps[2], 4) AS p75
        FROM (
          SELECT l_returnflag,
                 percentile(l_extendedprice, array(0.25, 0.50, 0.75)) AS ps
          FROM lineitem GROUP BY l_returnflag
        ) ORDER BY l_returnflag
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


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER JOIN preserving zero-order customers,
    then a histogram of per-customer order counts (agg of an agg — two
    shuffle stages, the second tiny after the first's reduction)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q13)


_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

register("q13_customer_distribution", q13_customer_distribution, _Q13)


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery whose body is a GROUP BY + HAVING
    over the big fact — Catalyst rewrites the IN to a left-semi join on
    the aggregated subquery (aggregate BELOW the join, the cheap order)."""
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_Q18)


_Q18 = """
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(CAST(o.o_orderdate AS DATE) AS STRING) AS order_date,
       CAST(o.o_totalprice AS DOUBLE) AS total_price,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey,
         CAST(o.o_orderdate AS DATE), CAST(o.o_totalprice AS DOUBLE)
ORDER BY total_price DESC, o.o_orderkey
LIMIT 100
"""

register("q18_large_orders", q18_large_orders, _Q18)


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar subquery — cheapest offered
    price per part (lineitem stands in for partsupp), keep only the
    supplier rows achieving that minimum. Catalyst decorrelates into an
    aggregate + equi-join on (partkey, min_price)."""
    _views(spark, sf_dir, "part", "supplier", "nation", "lineitem")
    return spark.sql(_Q2)


_Q2 = """
SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
       CAST(l.l_extendedprice AS DOUBLE) AS offer_price
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_size < 10
  AND l.l_extendedprice = (
    SELECT MIN(l2.l_extendedprice) FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey
  )
ORDER BY offer_price, p.p_partkey, s.s_name
LIMIT 100
"""

register("q2_min_cost_supplier", q2_min_cost_supplier, _Q2)


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: CTE of per-supplier revenue, then keep the
    supplier(s) whose revenue equals the global MAX — an uncorrelated
    scalar subquery over the same CTE (computed once, broadcast)."""
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(_Q15)


_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))
                  * (1 - CAST(l_discount AS DECIMAL(30,6)))) AS DECIMAL(38,6)) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""

register("q15_top_supplier", q15_top_supplier, _Q15)


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: NOT EXISTS anti-join + uncorrelated AVG scalar
    subquery as the filter threshold — customers with above-average
    balance and no urgent orders, counted per market segment (the
    plain no-orders variant is empty at this SF — every customer
    orders — so the priority filter keeps the check non-vacuous)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q22)


_Q22 = """
SELECT c.c_mktsegment,
       COUNT(*) AS n_custs,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS total_bal
FROM customer c
WHERE c.c_acctbal > (
    SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""

register("q22_idle_customers", q22_idle_customers, _Q22)


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by ship
    year — two broadcast dims consumed twice (aliased n1/n2), the
    disjunctive pair filter applied after the star join, partial aggs
    before the final (supp_nation, cust_nation, year) exchange."""
    _views(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    return spark.sql(_Q7)


_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       CAST(CAST(SUM(volume) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
         CAST(l.l_extendedprice AS DECIMAL(30,6))
           * (1 - CAST(l.l_discount AS DECIMAL(30,6))) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

register("q7_volume_shipping", q7_volume_shipping, _Q7)


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit per nation per year. The
    supply-cost term is adapted to this schema (p_retailprice x qty x
    0.1 stands in for ps_supplycost x qty); the cost product stays in
    double (identical IEEE order both engines) and only enters DECIMAL
    for the sum, keeping decimal widths within both engines' 38-digit
    cap."""
    _views(spark, sf_dir, "part", "supplier", "lineitem", "orders", "nation")
    return spark.sql(_Q9)


_Q9 = """
SELECT nation, o_year, CAST(CAST(SUM(amount) AS DECIMAL(38,6)) AS DOUBLE) AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,6))
           * (1 - CAST(l.l_discount AS DECIMAL(18,6)))
           - CAST(p.p_retailprice * l.l_quantity * 0.1 AS DECIMAL(18,6))
           AS amount
  FROM part p
  JOIN lineitem l ON l.l_partkey = p.p_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""

register("q9_product_profit", q9_product_profit, _Q9)


def q11_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part revenue kept only above a fraction of
    the GLOBAL revenue — the same CTE aggregated twice (per-key and
    grand total), the scalar comparison broadcast to every group."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_Q11)


_Q11 = """
WITH partrev AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(30,6))
             * (1 - CAST(l_discount AS DECIMAL(30,6)))) AS val
  FROM lineitem
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(CAST(val AS DECIMAL(38,6)) AS DOUBLE) AS part_value
FROM partrev
WHERE CAST(CAST(val AS DECIMAL(38,6)) AS DOUBLE) >
      (SELECT CAST(CAST(SUM(val) AS DECIMAL(38,6)) AS DOUBLE) * 0.0006 FROM partrev)
ORDER BY part_value DESC, l_partkey
"""

register("q11_value_concentration", q11_value_concentration, _Q11)


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT) per attribute triple with a
    NOT IN blacklist subquery — Catalyst turns the NOT IN into a
    null-aware anti join; the distinct-agg adds a second shuffle keyed
    by (group, suppkey) before the final count."""
    _views(spark, sf_dir, "part", "lineitem", "supplier")
    return spark.sql(_Q16)


_Q16 = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
LIMIT 50
"""

register("q16_supplier_cnt", q16_supplier_cnt, _Q16)


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar AVG subquery per part —
    revenue from orders of less than half the part's average quantity.
    Catalyst decorrelates into an aggregate joined back on partkey."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q17)


_Q17 = """
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
            / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND p.p_size < 15
  AND l.l_quantity < (
    SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey
  )
"""

register("q17_small_qty_revenue", q17_small_qty_revenue, _Q17)


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three OR'd conjunct groups over the join of
    lineitem and part — the classic disjunctive-predicate case where
    the shared conjuncts (join key) still drive an equi-join and the
    residual OR evaluates post-join."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q19)


_Q19 = """
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))
               * (1 - CAST(l.l_discount AS DECIMAL(30,6)))) AS DECIMAL(38,6)) AS DOUBLE)
         AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""

register("q19_disjunctive_revenue", q19_disjunctive_revenue, _Q19)


def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN over a grouped-HAVING subquery that itself
    joins a LIKE-filtered dimension — two nested rewrites (semi join on
    an aggregate on a join)."""
    _views(spark, sf_dir, "supplier", "lineitem", "part")
    return spark.sql(_Q20)


_Q20 = """
SELECT s.s_name, CAST(s.s_acctbal AS DOUBLE) AS acctbal
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'red%'
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING SUM(l.l_quantity) > 100
)
ORDER BY s.s_name
"""

register("q20_promo_suppliers", q20_promo_suppliers, _Q20)


def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the lone-late-supplier query — one correlated
    EXISTS and one correlated NOT EXISTS against the same fact, both
    referencing an outer column from a *different* outer table
    (o_orderdate), the hardest decorrelation in the suite. Late =
    shipped more than 60 days after the order date (this schema has no
    receipt/commit dates)."""
    _views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(_Q21)


_Q21 = """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""

register("q21_waiting_orders", q21_waiting_orders, _Q21)


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-side aggregate — every predicate
    pushes to parquet, no join, no post-shuffle work beyond the final
    one-row reduce."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_Q6)


_Q6 = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))
                    * CAST(l_discount AS DECIMAL(30,6))) AS DECIMAL(38,6))
            AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

register("q6_forecast_revenue", q6_forecast_revenue, _Q6)


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of total trade volume per
    year — conditional aggregation (SUM of a CASE) over the full star,
    the shape that at scale decides between two scans or one scan with
    a flag column (one scan wins; this is it)."""
    _views(
        spark, sf_dir, "part", "supplier", "lineitem", "orders", "nation"
    )
    return spark.sql(_Q8)


_Q8 = """
SELECT o_year,
       CAST(CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                               ELSE CAST(0 AS DECIMAL(30,6)) END)
                      AS DECIMAL(38,6)) AS DOUBLE)
            / CAST(CAST(SUM(volume) AS DECIMAL(38,6)) AS DOUBLE)
            AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(30,6))
           * (1 - CAST(l.l_discount AS DECIMAL(30,6))) AS volume,
         n.n_name AS nation
  FROM part p
  JOIN lineitem l ON l.l_partkey = p.p_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""

register("q8_market_share", q8_market_share, _Q8)


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer — star
    join filtered on the return flag, top-20 customers by lost
    revenue (TakeOrderedAndProject over the aggregate)."""
    _views(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql(_Q10)


_Q10 = """
SELECT c.c_custkey, c.c_name,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))
                     * (1 - CAST(l.l_discount AS DECIMAL(30,6))))
                 AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
       n.n_name,
       CAST(c.c_acctbal AS DOUBLE) AS acctbal
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate < DATE '1997-01-01'
GROUP BY c.c_custkey, c.c_name, n.n_name, CAST(c.c_acctbal AS DOUBLE)
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""

register("q10_returned_items", q10_returned_items, _Q10)


def q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → returnflag: this schema carries no
    shipmode): order-priority mix per lineitem class — conditional
    counts after a fact-to-fact join, late-shipped lines only."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q12)


_Q12 = """
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""

register("q12_priority_by_flag", q12_priority_by_flag, _Q12)


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo share of revenue in a month — a ratio of
    two conditional aggregates computed in ONE pass over the join."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q14)


_Q14 = """
SELECT CAST(100.00
            * CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                            THEN CAST(l.l_extendedprice AS DECIMAL(30,6))
                                 * (1 - CAST(l.l_discount AS DECIMAL(30,6)))
                            ELSE CAST(0 AS DECIMAL(30,6)) END) AS DECIMAL(38,6)) AS DOUBLE)
            / CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))
                       * (1 - CAST(l.l_discount AS DECIMAL(30,6)))) AS DECIMAL(38,6)) AS DOUBLE)
            AS DOUBLE) AS promo_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= DATE '1997-09-01' AND l.l_shipdate < DATE '1997-10-01'
"""

register("q14_promo_revenue", q14_promo_revenue, _Q14)
