"""Capability-completion queries (SURVEY.md §7.5) — the Spark-native
analytics categories the reference implies but never spells:
aggregation breadth, multi-dimensional grouping, window functions,
set operations, pivot, JSON and array functions.

Float policy: every SUM/AVG over doubles accumulates in an exact,
order-independent representation (Spark shuffles; DuckDB doesn't),
then casts back to DOUBLE for a stable schema. Exact whole-number
and 2-decimal columns use LONG sums (_lsum/_csum — codegen-fast);
decimal products and unbounded-scale doubles use DECIMAL(30,6)
(_dsum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from otrrentetl_spark.catalog import load_table
from otrrentetl_spark.registry import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _dsum(col, alias):
    return F.sum(F.col(col).cast("decimal(30,6)")).cast("double").alias(alias)


# Exact integer sums for columns with bounded decimal structure —
# associative (order-independent, so cross-engine hash-stable like the
# decimal path) but codegen-fast where decimal(30,6) falls off the
# compact-long representation (~2x agg cost, measured r5). Use _lsum
# for whole-number doubles (quantities), _csum for exact 2-decimal
# money; a global cents sum stays under 2^63 well past the 100 TB
# design point. Products of decimals (e.g. price*(1-disc), 4+ decimal
# places) stay on the decimal path — their scaled-integer sums can
# overflow long at extreme scale.
def _lsum(col, alias):
    return F.sum(F.col(col).cast("long")).cast("double").alias(alias)


def _csum(col, alias):
    return (
        F.sum(F.round(F.col(col) * 100).cast("long")).cast("double")
        / F.lit(100.0)
    ).alias(alias)


# ----------------------------------------------------------- TPC-H Q1 analog
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the canonical wide aggregate — sum/avg/min/max/count
    over grouped lineitem. Partial (map-side) aggregation makes this a
    single shuffle of |groups| rows regardless of input size."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    disc_price = (
        F.col("l_extendedprice").cast("decimal(30,6)")
        * (F.lit(1).cast("decimal(30,6)") - F.col("l_discount").cast("decimal(30,6)"))
    )
    qty_long = F.sum(F.col("l_quantity").cast("long"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            qty_long.cast("double").alias("sum_qty"),
            _csum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            (qty_long.cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        
    )


register(
    "agg_pricing_summary",
    agg_pricing_summary,
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))
                    * (CAST(1 AS DECIMAL(30,6)) - CAST(l_discount AS DECIMAL(30,6)))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)


def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — exact distinct aggregation (Spark expands to a
    two-phase plan; stays shuffle-bounded)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        
    )


register(
    "agg_distinct_counts",
    agg_distinct_counts,
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) with grouping() flags so
    subtotal rows are distinguishable."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _lsum("l_quantity", "sum_qty"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
        
    )


register(
    "agg_rollup",
    agg_rollup,
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, l_returnflag, l_linestatus
    """,
)


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority)."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _csum("o_totalprice", "sum_price"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        )
        
    )


register(
    "agg_cube",
    agg_cube,
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_price,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
    """,
)


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form rollup/cube special-
    case: per-status, per-priority, and grand-total aggregates in one
    pass (one shuffle; Spark expands the sets map-side)."""
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0 AS sum_price,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
        FROM {orders}
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
        """,
        orders=_t(spark, sf_dir, "orders"),
    )


register(
    "agg_grouping_sets",
    agg_grouping_sets,
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_price,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
    """,
)


# ------------------------------------------------------------------- windows
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/row_number/ntile per partition. Ordering key is
    made unique (acctbal, suppkey) so every rank is deterministic."""
    w = W.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return (
        _t(spark, sf_dir, "supplier")
        .select(
            "s_suppkey",
            "s_nationkey",
            "s_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        
    )


register(
    "window_rank_suite",
    window_rank_suite,
    """
    SELECT s_suppkey, s_nationkey, s_acctbal,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    ORDER BY s_nationkey, rn
    """,
)


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over an event-time ordering per user (events table)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 50)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.lag("event_type", 1).over(w).alias("prev_type"),
            F.lead("event_type", 1).over(w).alias("next_type"),
            (
                F.unix_micros("ts") - F.lag(F.unix_micros("ts"), 1).over(w)
            ).alias("gap_us"),
        )
        
    )


register(
    "window_lag_lead",
    window_lag_lead,
    """
    SELECT user_id, event_id, event_type,
           LAG(event_type, 1) OVER w AS prev_type,
           LEAD(event_type, 1) OVER w AS next_type,
           epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w AS gap_us
    FROM events WHERE user_id <= 50
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
)


def window_running_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame specs: running sum (unbounded preceding → current) and a
    centered moving average (rowsBetween -2, 0) per customer's orders."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    mov = w.rowsBetween(-2, W.currentRow)
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
            .over(run)
            .cast("double")
            .alias("running_total"),
            F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
            .over(mov)
            .cast("double")
            .alias("mov3_sum"),
            F.count(F.lit(1)).over(run).alias("n_so_far"),
        )
        
    )


register(
    "window_running_frames",
    window_running_frames,
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS mov3_sum,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS n_so_far
    FROM orders WHERE o_custkey <= 100
    ORDER BY o_custkey, o_orderkey
    """,
)


def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group — the engine-native form of the reference's
    toplist scan (SURVEY.md §7.4 / I4): 3 highest-revenue lineitems per
    returnflag.

    Skew/parallelism note: the partition key has 3 values, so the
    naive plan is 3 giant window tasks. Spark's WindowGroupLimit
    already bounds it — a PARTIAL top-K (sort + limit per map
    partition) runs before the exchange, so the shuffle carries ≤ K
    rows per key per partition, never the fact table. What it needs
    is map-side parallelism: the narrow projection is fanned out
    first (few-row-group local parquet scans as 1 task; pass-through
    at cluster scale), making the partial sort 32-way. Same two-level
    top-N as domain_topk_caps' salted window, here provided by the
    engine."""
    from otrrentetl_spark.catalog import fan_out

    w = W.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    narrow = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return (
        fan_out(narrow, memo_key=f"lineitem_topk:{sf_dir}")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_returnflag", "rn", "l_orderkey", "l_linenumber", "l_extendedprice")
    )


register(
    "window_topk_per_group",
    window_topk_per_group,
    """
    SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice
    FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
               AS rn
      FROM lineitem
    ) WHERE rn <= 3
    ORDER BY l_returnflag, rn
    """,
)


# -------------------------------------------------------------------- set ops
def setop_union_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over key domains, tagged and stacked
    into one result for a single deterministic comparison."""
    orders = _t(spark, sf_dir, "orders")
    hi = orders.filter(F.col("o_totalprice") >= 300000).select("o_custkey").distinct()
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    u = hi.union(urgent).distinct().withColumn("op", F.lit("union"))
    i = hi.intersect(urgent).withColumn("op", F.lit("intersect"))
    e = hi.exceptAll(urgent).withColumn("op", F.lit("except"))
    return u.unionByName(i).unionByName(e)


register(
    "setop_union_intersect_except",
    setop_union_intersect_except,
    """
    WITH hi AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice >= 300000),
         urgent AS (SELECT DISTINCT o_custkey FROM orders
                    WHERE o_orderpriority = '1-URGENT')
    SELECT o_custkey, 'union' AS op FROM (SELECT * FROM hi UNION SELECT * FROM urgent)
    UNION ALL
    SELECT o_custkey, 'intersect' AS op FROM (SELECT * FROM hi INTERSECT SELECT * FROM urgent)
    UNION ALL
    SELECT o_custkey, 'except' AS op FROM (SELECT * FROM hi EXCEPT ALL SELECT * FROM urgent)
    ORDER BY op, o_custkey
    """,
)


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts, priorities × statuses."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        
    )


register(
    "pivot_status_by_priority",
    pivot_status_by_priority,
    """
    SELECT o_orderpriority,
           COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'F'), 0) AS "F",
           COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'O'), 0) AS "O",
           COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'P'), 0) AS "P"
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)


# ----------------------------------------------------------------- JSON (X5)
def json_props_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: JSON column ops over events.props — typed extraction via
    from_json + aggregation on the extracted value."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k INT").getField("k").alias("k"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        
    )


register(
    "json_props_extraction",
    json_props_extraction,
    """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)


# ------------------------------------------------------------- arrays (X-ops)
def array_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over embeddings: element_at, size,
    L2 norm via aggregate(zip-free), all built-in (no UDF). Values are
    rounded to 4 decimals — float32→double noise is below that."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") <= 200)
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq_sum = F.aggregate(
        vec_d, F.lit(0.0), lambda acc, x: acc + x * x
    )
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(vec_d, 1), 4).alias("first_val"),
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
        F.round(
            F.aggregate(vec_d, F.lit(0.0), lambda acc, x: acc + x)
            / F.size("embedding"),
            4,
        ).alias("mean_val"),
    )


register(
    "array_vector_stats",
    array_vector_stats,
    """
    SELECT vec_id, label,
           len(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
           ROUND(sqrt(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4) AS l2_norm,
           ROUND(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE)), 'sum') / len(embedding), 4) AS mean_val
    FROM embeddings WHERE vec_id <= 200 ORDER BY vec_id
    """,
)


def null_semantics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI null semantics in one plan: a NULL-producing derivation
    (nullif), grouping with a NULL key, COUNT(*) vs COUNT(col),
    null-only aggregate buckets, coalesce defaulting, and NULLS FIRST
    ordering — the corners where engines classically diverge."""
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("rf"),
        F.col("l_quantity"),
    )
    return (
        t.groupBy("rf")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("rf").alias("n_nonnull"),
            F.sum(
                F.when(F.col("rf").isNull(), F.col("l_quantity")).cast(
                    "decimal(30,6)"
                )
            )
            .cast("double")
            .alias("sum_null_bucket"),
            F.coalesce(F.max("rf"), F.lit("-")).alias("rf_or_default"),
        )
        
    )


register(
    "null_semantics_suite",
    null_semantics_suite,
    """
    WITH t AS (
      SELECT NULLIF(l_returnflag, 'N') AS rf, l_quantity FROM lineitem
    )
    SELECT rf,
           COUNT(*) AS n_rows,
           COUNT(rf) AS n_nonnull,
           CAST(SUM(CASE WHEN rf IS NULL
                         THEN CAST(l_quantity AS DECIMAL(30,6)) END) AS DOUBLE)
             AS sum_null_bucket,
           COALESCE(MAX(rf), '-') AS rf_or_default
    FROM t GROUP BY rf ORDER BY rf ASC NULLS FIRST
    """,
)


def unpivot_price_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping (unpivot/melt): the four lineitem money/qty
    measures stacked into (measure, value) rows — the inverse of pivot,
    and the shape feature stores and metric sinks ingest. Zero-shuffle:
    unpivot is a per-row flatMap, aggregated after."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    long = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return (
        long.groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(30,6)")).cast("double"), 4).alias(
                "total"
            ),
        )
        
    )


register(
    "unpivot_price_measures",
    unpivot_price_measures,
    """
    WITH long AS (
      UNPIVOT (
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax
        FROM lineitem WHERE l_orderkey <= 1000
      )
      ON l_quantity, l_extendedprice, l_discount, l_tax
      INTO NAME measure VALUE value
    )
    SELECT measure, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE), 4) AS total
    FROM long GROUP BY measure ORDER BY measure
    """,
)


def variant_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path via Spark 4's VariantType: parse_json on
    the raw props string, typed variant_get extraction, then a plain
    relational aggregate on the extracted value. Variant's binary
    encoding is the scale answer to repeated JSON string parsing —
    parse once, extract many times, columnar-shred under AQE.
    Complements `json_props_extraction` (get_json_object string
    path)."""
    ev = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"), "value")
        .withColumn("k_bucket", F.col("k") % 10)
        .groupBy("event_type", "k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            _dsum("value", "sum_value"),
        )
    )


register(
    "variant_json_extraction",
    variant_json_extraction,
    """
    SELECT event_type,
           CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           COUNT(*) AS n,
           MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS min_k,
           MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)


def setop_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set operations (UNION ALL / INTERSECT ALL / EXCEPT
    ALL) over order-priority keys — the bag semantics the plain
    set-op suite doesn't cover (duplicate multiplicities must be
    preserved/subtracted, not collapsed)."""
    o = _t(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 150000).select("o_orderpriority")
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("1997-01-01")
    ).select("o_orderpriority")
    inter = hi.intersectAll(recent).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_intersect_all")
    )
    exc = hi.exceptAll(recent).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_except_all")
    )
    return (
        inter.join(exc, "o_orderpriority", "full")
        .select(
            "o_orderpriority",
            F.coalesce("n_intersect_all", F.lit(0)).alias("n_intersect_all"),
            F.coalesce("n_except_all", F.lit(0)).alias("n_except_all"),
        )
    )


register(
    "setop_all_variants",
    setop_all_variants,
    """
    WITH hi AS (
      SELECT o_orderpriority FROM orders WHERE o_totalprice > 150000
    ), recent AS (
      SELECT o_orderpriority FROM orders WHERE o_orderdate >= '1997-01-01'
    ), inter AS (
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_intersect_all
      FROM (SELECT * FROM hi INTERSECT ALL SELECT * FROM recent)
      GROUP BY 1
    ), exc AS (
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_except_all
      FROM (SELECT * FROM hi EXCEPT ALL SELECT * FROM recent)
      GROUP BY 1
    )
    SELECT COALESCE(i.o_orderpriority, e.o_orderpriority) AS o_orderpriority,
           COALESCE(i.n_intersect_all, 0) AS n_intersect_all,
           COALESCE(e.n_except_all, 0) AS n_except_all
    FROM inter i FULL JOIN exc e ON i.o_orderpriority = e.o_orderpriority
    """,
)


def argmax_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation-path top-1 (max_by/min_by): per event_type, the
    user and event id at the extreme value — no window, ONE partial
    aggregate (the grouped-top-1 idiom that beats row_number when
    k=1). Ties broken deterministically by ordering on a
    (value, event_id) struct."""
    ev = _t(spark, sf_dir, "events")
    # composite integer order key (cents · 10^7 + event_id): a total
    # order replayable by DuckDB's scalar-only arg_max/arg_min
    ordk = (
        F.round(F.col("value") * 100.0, 0).cast("long") * F.lit(10_000_000)
        + F.col("event_id")
    )
    return ev.groupBy("event_type").agg(
        F.max_by("user_id", ordk).alias("top_user"),
        F.max_by("event_id", ordk).alias("top_event"),
        F.max("value").alias("max_value"),
        F.min_by("user_id", ordk).alias("bottom_user"),
        F.min_by("event_id", ordk).alias("bottom_event"),
        F.min("value").alias("min_value"),
    )


register(
    "argmax_suite",
    argmax_suite,
    """
    WITH k AS (
      SELECT event_type, user_id, event_id, value,
             CAST(ROUND(value * 100.0, 0) AS BIGINT) * 10000000 + event_id
               AS ordk
      FROM events
    )
    SELECT event_type,
           arg_max(user_id, ordk) AS top_user,
           arg_max(event_id, ordk) AS top_event,
           MAX(value) AS max_value,
           arg_min(user_id, ordk) AS bottom_user,
           arg_min(event_id, ordk) AS bottom_event,
           MIN(value) AS min_value
    FROM k GROUP BY event_type
    """,
)


def pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with MULTIPLE aggregates per cell (count + decimal sum
    per pivoted order status) — the wide-report shape; each output
    cell column is aliased so both engines emit identical names."""
    o = _t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
            .cast("double")
            .alias("sum_price"),
        )
    )
    # Spark names multi-agg pivot columns "<val>_<alias>"
    return piv.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(f"{v}_n"), F.lit(0)).alias(f"{v.lower()}_n")
            for v in ["F", "O", "P"]
        ],
        *[
            F.coalesce(F.col(f"{v}_sum_price"), F.lit(0.0)).alias(
                f"{v.lower()}_sum_price"
            )
            for v in ["F", "O", "P"]
        ],
    )


register(
    "pivot_multi_agg",
    pivot_multi_agg,
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f_n,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o_n,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p_n,
           COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE), 0.0) AS f_sum_price,
           COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                    FILTER (WHERE o_orderstatus = 'O') AS DOUBLE), 0.0) AS o_sum_price,
           COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                    FILTER (WHERE o_orderstatus = 'P') AS DOUBLE), 0.0) AS p_sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)


def rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over a derived time hierarchy (year → quarter → month):
    subtotals at every level plus the grand total, with GROUPING()
    flags disambiguating NULL-as-subtotal from NULL data."""
    o = _t(spark, sf_dir, "orders")
    d = o.select(
        F.year("o_orderdate").alias("y"),
        F.quarter("o_orderdate").alias("q"),
        F.month("o_orderdate").alias("m"),
        F.col("o_totalprice"),
    )
    return (
        d.rollup("y", "q", "m")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _csum("o_totalprice", "sum_price"),
            F.grouping("y").cast("int").alias("g_y"),
            F.grouping("q").cast("int").alias("g_q"),
            F.grouping("m").cast("int").alias("g_m"),
        )
    )


register(
    "rollup_time_hierarchy",
    rollup_time_hierarchy,
    """
    SELECT EXTRACT(year FROM o_orderdate) AS y,
           EXTRACT(quarter FROM o_orderdate) AS q,
           EXTRACT(month FROM o_orderdate) AS m,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_price,
           CAST(GROUPING(EXTRACT(year FROM o_orderdate)) AS INTEGER) AS g_y,
           CAST(GROUPING(EXTRACT(quarter FROM o_orderdate)) AS INTEGER) AS g_q,
           CAST(GROUPING(EXTRACT(month FROM o_orderdate)) AS INTEGER) AS g_m
    FROM orders
    GROUP BY ROLLUP (EXTRACT(year FROM o_orderdate),
                     EXTRACT(quarter FROM o_orderdate),
                     EXTRACT(month FROM o_orderdate))
    """,
)


def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-occurrence with lift: part pairs appearing in the
    same order, scored by lift = P(a,b)/(P(a)·P(b)) over the order
    universe — the market-basket/recommendation staple. The pair
    space is generated by the order-key self-join (quadratic only
    within an order's ~7 lines, never globally); counts are exact
    integers so lift is a deterministic rational. Top-40 pairs by
    (co_count desc, lift desc, keys)."""
    # One shuffle of (orderkey, partkey) into per-order part SETS
    # (collect_set dedups in-group, subsuming the former distinct), then
    # the a<b pair space is generated INSIDE each order's array — the
    # old formulation self-joined the distinct projection, paying two
    # repartition exchanges plus a ~basket-size row blowup through the
    # join. Both consumers (pair explosion, part frequency) read the
    # same grouped exchange, so it is reused, not recomputed.
    sets = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    )
    n_orders = _t(spark, sf_dir, "orders").agg(
        F.count_distinct("o_orderkey").alias("n_ord")
    )
    part_freq = (
        sets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + 2, F.size(F.col("ps"))),
                lambda y: F.struct(x.alias("pk_a"), y.alias("pk_b")),
            ),
        )
    )
    pairs = (
        sets.select(F.explode(pair_arr).alias("p"))
        .select("p.pk_a", "p.pk_b")
        .groupBy("pk_a", "pk_b")
        .agg(F.count(F.lit(1)).alias("co_count"))
        .filter(F.col("co_count") >= 3)
    )
    fa = part_freq.select(
        F.col("l_partkey").alias("pk_a"), F.col("f").alias("f_a")
    )
    fb = part_freq.select(
        F.col("l_partkey").alias("pk_b"), F.col("f").alias("f_b")
    )
    lift = (
        F.col("co_count").cast("double")
        * F.col("n_ord").cast("double")
        / (F.col("f_a").cast("double") * F.col("f_b").cast("double"))
    )
    # fa/fb are catalog-sized (item-frequency dimension) — no forced
    # broadcast: AQE broadcasts small catalogs, shuffle-joins huge
    # ones; only the 1-row order count is unconditionally broadcast.
    return (
        pairs.join(fa, "pk_a")
        .join(fb, "pk_b")
        .crossJoin(F.broadcast(n_orders))
        .select("pk_a", "pk_b", "co_count", F.round(lift, 9).alias("lift"))
        .orderBy(
            F.col("co_count").desc(), F.col("lift").desc(), "pk_a", "pk_b"
        )
        .limit(40)
    )


register(
    "market_basket_lift",
    market_basket_lift,
    """
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (
      SELECT COUNT(DISTINCT o_orderkey) AS n_ord FROM orders
    ), freq AS (
      SELECT l_partkey, COUNT(*) AS f FROM li GROUP BY 1
    ), pairs AS (
      SELECT a.l_partkey AS pk_a, b.l_partkey AS pk_b, COUNT(*) AS co_count
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 3
    )
    SELECT pk_a, pk_b, CAST(co_count AS BIGINT) AS co_count,
           ROUND(CAST(co_count AS DOUBLE) * CAST(n.n_ord AS DOUBLE)
                 / (CAST(fa.f AS DOUBLE) * CAST(fb.f AS DOUBLE)), 9) AS lift
    FROM pairs
    JOIN freq fa ON fa.l_partkey = pk_a
    JOIN freq fb ON fb.l_partkey = pk_b
    CROSS JOIN n
    ORDER BY co_count DESC, lift DESC, pk_a, pk_b
    LIMIT 40
    """,
)
