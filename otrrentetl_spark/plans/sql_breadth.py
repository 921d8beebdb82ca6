"""SQL-surface breadth beyond the core operator families: map-typed
columns, window value functions, null-safe equality joins, and fuzzy
string matching. Each query exercises the Spark built-ins; the DuckDB
oracle recomputes the expected values from first principles (scalar
arithmetic), so the check is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from otrrentetl_spark.catalog import load_table
from otrrentetl_spark.registry import register


def _ev(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


# ------------------------------------------------------------- map functions
def map_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType end-to-end: build a map from scalars + parsed JSON,
    then map_keys / element_at / map_concat / map_filter /
    transform_values / aggregate-over-values — all per-row built-ins
    (narrow projection, scan-speed at any scale)."""
    ev = _ev(spark, sf_dir).filter(F.col("event_id") <= 500)
    k = F.from_json("props", "k INT").getField("k")
    m = F.create_map(
        F.lit("k"), k,
        F.lit("uid"), (F.col("user_id") % 100).cast("int"),
        F.lit("tl"), F.length("event_type"),
    )
    m2 = F.map_concat(m, F.create_map(F.lit("extra"), F.lit(1)))
    return ev.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m2)), ",").alias("keys_str"),
        F.element_at(m, F.lit("uid")).alias("uid_val"),
        F.aggregate(
            F.map_values(m2), F.lit(0), lambda acc, x: acc + x
        ).alias("vals_sum"),
        F.size(F.map_filter(m, lambda _, v: v > 10)).alias("n_big"),
        F.aggregate(
            F.map_values(F.transform_values(m, lambda _, v: v * 2)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("doubled_sum"),
    )


register(
    "map_functions_suite",
    map_functions_suite,
    """
    WITH base AS (
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
             CAST(user_id % 100 AS INTEGER) AS uid,
             length(event_type) AS tl
      FROM events WHERE event_id <= 500
    )
    SELECT event_id,
           'extra,k,tl,uid' AS keys_str,
           uid AS uid_val,
           CAST(k + uid + tl + 1 AS INTEGER) AS vals_sum,
           CAST((CASE WHEN k > 10 THEN 1 ELSE 0 END)
                + (CASE WHEN uid > 10 THEN 1 ELSE 0 END)
                + (CASE WHEN tl > 10 THEN 1 ELSE 0 END) AS INTEGER) AS n_big,
           CAST(2 * (k + uid + tl) AS INTEGER) AS doubled_sum
    FROM base
    """,
)


# ------------------------------------------------ window value functions
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value with explicit frames per
    user — the frame-sensitive value functions the rank suite doesn't
    cover."""
    ev = _ev(spark, sf_dir).filter(F.col("user_id") <= 30)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    whole = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val = F.round(F.col("value").cast("double"), 6)
    return ev.select(
        "user_id",
        "event_id",
        F.first_value(val).over(run).alias("first_v"),
        F.last_value(val).over(run).alias("running_last_v"),
        F.last_value(val).over(whole).alias("final_v"),
        F.nth_value(val, 2).over(whole).alias("second_v"),
    )


register(
    "window_value_functions",
    window_value_functions,
    """
    SELECT user_id, event_id,
           first_value(ROUND(value, 6)) OVER run AS first_v,
           last_value(ROUND(value, 6)) OVER run AS running_last_v,
           last_value(ROUND(value, 6)) OVER whole AS final_v,
           nth_value(ROUND(value, 6), 2) OVER whole AS second_v
    FROM events
    WHERE user_id <= 30
    WINDOW run AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           whole AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
    """,
)


# -------------------------------------------------------- null-safe equality
def nullsafe_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=>): NULL keys MATCH each other —
    the semantics ANSI '=' silently drops. Status 'P' is nulled out on
    both sides; the null bucket must survive the join."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "status_key",
        F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(
            F.col("o_orderstatus")
        ),
    )
    dim = (
        o.select("status_key")
        .distinct()
        .withColumn("status_label", F.coalesce("status_key", F.lit("UNKNOWN")))
    )
    joined = o.join(dim, o["status_key"].eqNullSafe(dim["status_key"]), "inner")
    return (
        joined.groupBy("status_label")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


register(
    "nullsafe_join_counts",
    nullsafe_join_counts,
    """
    WITH o AS (
      SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                  ELSE o_orderstatus END AS status_key
      FROM orders
    ), dim AS (
      SELECT DISTINCT status_key,
             COALESCE(status_key, 'UNKNOWN') AS status_label
      FROM o
    )
    SELECT d.status_label, COUNT(*) AS n_orders
    FROM o JOIN dim d ON o.status_key IS NOT DISTINCT FROM d.status_key
    GROUP BY d.status_label
    """,
)


# ------------------------------------------------------------- fuzzy strings
def fuzzy_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance and string-shape functions: levenshtein (fuzzy
    key matching — the robust form of the reference's normalized-key
    join), reverse, repeat, ascii, left/right slices."""
    ev = _ev(spark, sf_dir).filter(F.col("event_id") <= 300)
    return ev.select(
        "event_id",
        F.levenshtein("event_type", F.lit("click")).alias("lev_click"),
        F.reverse("event_type").alias("rev_type"),
        F.repeat(F.substring("event_type", 1, 2), 2).alias("rep2"),
        F.ascii("event_type").alias("first_code"),
        F.substring("event_type", 1, 3).alias("left3"),
    )


register(
    "fuzzy_string_suite",
    fuzzy_string_suite,
    """
    SELECT event_id,
           levenshtein(event_type, 'click') AS lev_click,
           reverse(event_type) AS rev_type,
           repeat(substr(event_type, 1, 2), 2) AS rep2,
           ascii(event_type) AS first_code,
           substr(event_type, 1, 3) AS left3
    FROM events WHERE event_id <= 300
    """,
)


def fuzzy_blocked_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join with blocking, DISTINCT-FIRST (r13 scale fix):
    find part-name pairs within levenshtein distance 2, comparing only
    within a block (word 2 of the name) instead of all O(N²) pairs,
    and running the edit distance over DISTINCT names only.

    Why distinct-first: the r13 sf1 sweep exposed that the expanded
    per-part pair set is inherently quadratic under name duplication —
    this corpus has 64 distinct names over 200k parts at sf1, so
    in-block part pairs hit 2.5B and the identical-name OUTPUT alone
    is ~312M rows; both engines DNF'd. Deduplicating to (name, count)
    first makes the fuzzy work O(distinct²_within_block) and the
    output one row per NAME pair carrying its part-pair multiplicity
    (``pair_count`` = n_l·n_r for lname<rname, C(n,2) for the
    same-name diagonal) — the same information, scale-honest cost.
    The |len(l)−len(r)| ≤ 2 band (implied by levenshtein ≤ 2) runs
    before the DP, and the Spark side passes the threshold to
    ``levenshtein`` so the DP early-exits per pair. Recall trade
    (inherent to blocking, unchanged): an edit inside the blocking
    word loses that pair."""
    part = load_table(spark, sf_dir, "part")
    d = (
        part.groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "blk", F.split_part("p_name", F.lit(" "), F.lit(2))
        )
    )
    l = d.alias("l")
    r = d.alias("r")
    cross = (
        l.join(r, on="blk")
        .filter(F.col("l.p_name") < F.col("r.p_name"))
        # cheap necessary band before the O(len²) DP
        .filter(
            F.abs(
                F.length(F.col("l.p_name")) - F.length(F.col("r.p_name"))
            )
            <= 2
        )
        .withColumn(
            "dist",
            F.levenshtein(F.col("l.p_name"), F.col("r.p_name"), 2),
        )
        # thresholded levenshtein returns -1 when distance > threshold
        .filter(F.col("dist") >= 0)
        .select(
            F.col("l.p_name").alias("lname"),
            F.col("r.p_name").alias("rname"),
            "dist",
            (F.col("l.n") * F.col("r.n")).cast("long").alias("pair_count"),
        )
    )
    diagonal = d.filter(F.col("n") > 1).select(
        F.col("p_name").alias("lname"),
        F.col("p_name").alias("rname"),
        F.lit(0).alias("dist"),
        (F.col("n") * (F.col("n") - 1) / F.lit(2))
        .cast("long")
        .alias("pair_count"),
    )
    return cross.unionByName(diagonal)


register(
    "fuzzy_blocked_join",
    fuzzy_blocked_join,
    """
    WITH d AS (
      SELECT p_name, split_part(p_name, ' ', 2) AS blk,
             COUNT(*) AS n
      FROM part GROUP BY 1, 2
    )
    SELECT l.p_name AS lname, r.p_name AS rname,
           CAST(levenshtein(l.p_name, r.p_name) AS INTEGER) AS dist,
           CAST(l.n * r.n AS BIGINT) AS pair_count
    FROM d l JOIN d r ON l.blk = r.blk AND l.p_name < r.p_name
    WHERE abs(length(l.p_name) - length(r.p_name)) <= 2
      AND levenshtein(l.p_name, r.p_name) <= 2
    UNION ALL
    SELECT p_name AS lname, p_name AS rname, 0 AS dist,
           CAST(n * (n - 1) / 2 AS BIGINT) AS pair_count
    FROM d WHERE n > 1
    """,
)


_LATERAL_SQL = """
SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
FROM orders o,
     LATERAL (
       SELECT l.l_linenumber, l.l_extendedprice
       FROM lineitem l
       WHERE l.l_orderkey = o.o_orderkey
       ORDER BY l.l_extendedprice DESC, l.l_linenumber
       LIMIT 2
     ) t
WHERE o.o_orderkey % 101 = 0
"""


def lateral_topn_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT: top-2
    lineitems per sampled order. Exercises Catalyst's lateral-join
    decorrelation (rewritten to a ranked window under the hood rather
    than a per-row re-scan); the identical SQL text runs on DuckDB."""
    for t in ("orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)


register("lateral_topn_per_order", lateral_topn_per_order, _LATERAL_SQL)


def serde_collections_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested serde + array set algebra: build a struct, round-trip it
    through to_json/from_json (the schema-full serde path), and prove
    the round-trip is the identity by re-extracting fields; alongside,
    array_union/intersect/except on token sets (sorted before output —
    Spark and DuckDB agree on membership, not on element order)."""
    ev = _ev(spark, sf_dir).filter(F.col("event_id") % 37 == 0)
    packed = F.to_json(
        F.struct(
            F.col("event_type").alias("t"),
            F.col("user_id").alias("u"),
            F.round(F.col("value") * 100.0, 0).cast("long").alias("cents"),
        )
    )
    back = F.from_json(
        packed, "t string, u bigint, cents bigint"
    )
    a = F.sequence(F.col("user_id") % 5, F.col("user_id") % 5 + 4)
    b = F.sequence(F.lit(3), F.lit(7))
    return ev.select(
        "event_id",
        back["t"].alias("rt_type"),
        back["u"].alias("rt_user"),
        back["cents"].alias("rt_cents"),
        F.array_join(F.array_sort(F.array_union(a, b)), ",").alias("u_ab"),
        F.array_join(F.array_sort(F.array_intersect(a, b)), ",").alias("i_ab"),
        F.array_join(F.array_sort(F.array_except(a, b)), ",").alias("e_ab"),
    )


register(
    "serde_collections_suite",
    serde_collections_suite,
    """
    WITH base AS (
      SELECT event_id, event_type, user_id,
             CAST(ROUND(value * 100.0, 0) AS BIGINT) AS cents,
             [x for x in range(user_id % 5, user_id % 5 + 5)] AS a,
             [3, 4, 5, 6, 7] AS b
      FROM events WHERE event_id % 37 = 0
    )
    SELECT event_id,
           event_type AS rt_type,
           user_id AS rt_user,
           cents AS rt_cents,
           COALESCE(array_to_string(list_sort(list_distinct(list_cat(a, b))),
                    ','), '') AS u_ab,
           COALESCE(array_to_string(list_sort(list_distinct(
             list_filter(a, x -> list_contains(b, x)))), ','), '') AS i_ab,
           COALESCE(array_to_string(list_sort(list_distinct(
             list_filter(a, x -> NOT list_contains(b, x)))), ','), '') AS e_ab
    FROM base
    """,
)


def try_arithmetic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error handling: Spark 4 runs with ANSI on, where
    bare division/casts on bad input THROW — the try_* family returns
    NULL instead (the semantics the reference's default-on-failure
    casts imply, functions/casts.py). try_divide(x, 0) → NULL,
    try_to_number on junk → NULL, nullif/coalesce interplay."""
    ev = _ev(spark, sf_dir).filter(F.col("event_id") % 41 == 0)
    denom = F.col("user_id") % 3  # hits 0 regularly
    return ev.select(
        "event_id",
        F.try_divide(F.col("value"), denom.cast("double")).alias("safe_div"),
        F.coalesce(
            F.try_divide(F.col("value"), denom.cast("double")), F.lit(-1.0)
        ).alias("div_or_default"),
        F.try_to_number(
            F.when(F.col("user_id") % 2 == 0, F.lit("123.45")).otherwise(
                F.lit("not-a-number")
            ),
            F.lit("999.99"),
        ).cast("double").alias("parsed_or_null"),
        F.nullif(denom, F.lit(0)).alias("nullified_zero"),
    )


register(
    "try_arithmetic_suite",
    try_arithmetic_suite,
    """
    SELECT event_id,
           value / nullif(CAST(user_id % 3 AS DOUBLE), 0.0) AS safe_div,
           COALESCE(value / nullif(CAST(user_id % 3 AS DOUBLE), 0.0), -1.0)
             AS div_or_default,
           CAST(try_cast(CASE WHEN user_id % 2 = 0 THEN '123.45'
                              ELSE 'not-a-number' END AS DECIMAL(5,2))
                AS DOUBLE) AS parsed_or_null,
           nullif(user_id % 3, 0) AS nullified_zero
    FROM events WHERE event_id % 41 = 0
    """,
)


def chi_square_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson χ² independence statistic for event_type × 6-hour
    bucket — Σ(o−e)²/e from exact integer contingency counts;
    expected counts and the statistic are one shared IEEE expression
    (no p-value: that needs the incomplete gamma, not bit-portable).
    One partial-agg shuffle for the contingency table; the marginals
    ride as windows over the aggregate-sized table."""
    ev = _ev(spark, sf_dir)
    obs = ev.groupBy(
        "event_type", (F.hour("ts") / 6).cast("int").alias("hb")
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = F.sum("o").over(W.partitionBy("event_type"))
    ct = F.sum("o").over(W.partitionBy("hb"))
    tot = F.sum("o").over(W.partitionBy())
    cell = obs.select(
        "event_type",
        "hb",
        "o",
        (rt.cast("double") * ct.cast("double") / tot.cast("double")).alias("e"),
    )
    diff = F.col("o").cast("double") - F.col("e")
    return cell.agg(
        F.round(F.sum(F.lit(1.0) * diff * diff / F.col("e")), 9).alias("chi2"),
        ((F.count_distinct("event_type") - 1)
         * (F.count_distinct("hb") - 1)).alias("dof"),
    )


register(
    "chi_square_type_hour",
    chi_square_type_hour,
    """
    WITH obs AS (
      SELECT event_type, CAST(FLOOR(EXTRACT(hour FROM ts) / 6) AS INTEGER) AS hb,
             COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ), cell AS (
      SELECT event_type, hb, o,
             CAST(SUM(o) OVER (PARTITION BY event_type) AS DOUBLE)
             * CAST(SUM(o) OVER (PARTITION BY hb) AS DOUBLE)
             / CAST(SUM(o) OVER () AS DOUBLE) AS e
      FROM obs
    )
    SELECT ROUND(SUM(1.0 * (CAST(o AS DOUBLE) - e)
                     * (CAST(o AS DOUBLE) - e) / e), 9) AS chi2,
           CAST((COUNT(DISTINCT event_type) - 1)
                * (COUNT(DISTINCT hb) - 1) AS BIGINT) AS dof
    FROM cell
    """,
)


_PAGE_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15 OFFSET 30
"""


def pagination_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-free pagination (ORDER BY unique total order + LIMIT/
    OFFSET): page 3 of the price leaderboard. OFFSET forces the sort
    to retain offset+limit rows — fine for shallow pages; deep
    pagination should switch to keyset predicates (s6's filter
    shape). Identical SQL text both engines."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_PAGE_SQL)


register("pagination_offset_page", pagination_offset_page, _PAGE_SQL)


_TUPLE_IN_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE (l_orderkey, l_linenumber) IN (
  SELECT o_orderkey, 1 FROM orders WHERE o_totalprice > 400000
)
"""


def tuple_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column (tuple) IN subquery — decorrelates to a semi join
    on the composite key; identical SQL text both engines."""
    for t in ("orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_TUPLE_IN_SQL)


# DuckDB rejects the row-value IN syntax; the oracle states the same
# semi-join semantics via EXISTS.
register(
    "tuple_in_subquery",
    tuple_in_subquery,
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem l
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_orderkey = l.l_orderkey AND l.l_linenumber = 1
        AND o.o_totalprice > 400000
    )
    """,
)
