"""Statistical-moments / regression suite over the events table.

The 100 TB story: every statistic here is derived from *single-pass,
mergeable power sums* (n, Σq, Σq², Σq³, Σq⁴, Σxq …) — the partial
aggregates combine associatively across any number of executors, so
one map-side-combined shuffle of |groups| rows computes the whole
suite regardless of input size. No second pass, no window, no
centering pass.

Determinism policy (fixed-point moments): `value` is quantized to
integer cents (ROUND(value*100) — identical half-away-from-zero
rounding in Spark and DuckDB for positives); powers ≤ q³ stay exact
integer-valued doubles (< 2^53) summed in DECIMAL(38,0); q⁴ (19
significant digits) is powered *inside* the decimal domain, because
a double→decimal cast is not portable at that width (Spark keeps 18
significant digits of the double; DuckDB converts the exact binary
value). Derived moments then use the same IEEE expression tree on
both engines, making everything bit-identical except skewness/
kurtosis: their power sums exceed 2^53, where DuckDB's int128→double
cast truncates while Spark's rounds (≤1 ulp), so those two columns
are rounded to 9 decimals on both sides — ~1e6× above the ulp noise,
~1e6× below data significance.

Built-in equivalents (`F.stddev`, `F.skewness`, `F.corr`, …) are
checked against these formulas in tests/test_stats_suite.py; they are
not used in the oracle-checked query because Spark and DuckDB disagree
on the *definition* of skewness/kurtosis (population vs bias-corrected
sample) and on accumulation order.

Reference parity: the reference has only COUNT-style aggregation
(SURVEY.md §2.6, storagetablecollection count/filter); this suite is
§7.5 capability completion beyond it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from otrrentetl_spark.catalog import load_table
from otrrentetl_spark.registry import register


def _isum(expr: Column, alias: str) -> Column:
    """Exact order-independent sum of an integer-valued double."""
    return F.sum(expr.cast("decimal(38,0)")).cast("double").alias(alias)


def stats_moments_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: sample variance/stddev, population skewness and
    excess kurtosis, Pearson correlation + OLS regression of value on
    hour-of-day — all from one pass of mergeable power sums."""
    ev = load_table(spark, sf_dir, "events")
    q = F.round(F.col("value") * F.lit(100.0), 0)  # integer cents
    x = F.hour("ts").cast("double")  # regressor: hour of day (exact 0..23)
    # q⁴ needs 19 significant digits — beyond what a double→decimal
    # cast preserves portably (Spark keeps 18 significant digits, DuckDB
    # converts the exact binary value). Convert to decimal FIRST, then
    # power in exact decimal arithmetic.
    qd = q.cast("decimal(6,0)")

    sums = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        _isum(q, "s1"),
        _isum(q * q, "s2"),
        _isum((q * q) * q, "s3"),
        F.sum(
            (qd * qd).cast("decimal(19,0)") * (qd * qd).cast("decimal(19,0)")
        )
        .cast("double")
        .alias("s4"),
        _isum(x, "sx"),
        _isum(x * x, "sxx"),
        _isum(x * q, "sxq"),
    )

    n = F.col("n")
    s1, s2, s3, s4 = F.col("s1"), F.col("s2"), F.col("s3"), F.col("s4")
    sx, sxx, sxq = F.col("sx"), F.col("sxx"), F.col("sxq")

    mean_c = s1 / n  # cents
    # population central moments (cents scale) from raw power sums
    m2 = s2 / n - mean_c * mean_c
    m3 = s3 / n - F.lit(3.0) * mean_c * (s2 / n) + F.lit(2.0) * mean_c * mean_c * mean_c
    m4 = (
        s4 / n
        - F.lit(4.0) * mean_c * (s3 / n)
        + F.lit(6.0) * mean_c * mean_c * (s2 / n)
        - F.lit(3.0) * mean_c * mean_c * mean_c * mean_c
    )
    var_samp_c = (s2 - s1 * s1 / n) / (n - F.lit(1.0))
    var_samp = var_samp_c / F.lit(10000.0)
    # regression of cents on hour
    cov_n = n * sxq - sx * s1  # n² · cov
    varx_n = n * sxx - sx * sx  # n² · var(x)
    varq_n = n * s2 - s1 * s1
    corr = cov_n / (F.sqrt(varx_n) * F.sqrt(varq_n))
    slope_c = cov_n / varx_n
    intercept_c = (s1 - slope_c * sx) / n

    return sums.select(
        "event_type",
        n.cast("long").alias("n_events"),
        (mean_c / F.lit(100.0)).alias("mean_value"),
        var_samp.alias("var_samp"),
        F.sqrt(var_samp).alias("stddev_samp"),
        # s3/s4 sums exceed 2^53, where DuckDB's int128→double cast
        # truncates while Spark's rounds — a ≤1-ulp seed that the
        # central-moment cancellation amplifies to ~1e-15 relative.
        # Round to 9 decimals on both sides to absorb it.
        F.round(m3 / (F.sqrt(m2) * m2), 9).alias("skewness_pop"),
        F.round(m4 / (m2 * m2) - F.lit(3.0), 9).alias("kurtosis_excess"),
        corr.alias("corr_hour_value"),
        (slope_c / F.lit(100.0)).alias("regr_slope"),
        (intercept_c / F.lit(100.0)).alias("regr_intercept"),
        (corr * corr).alias("regr_r2"),
    )


register(
    "stats_moments_suite",
    stats_moments_suite,
    """
    WITH q AS (
      SELECT event_type,
             ROUND(value * 100.0, 0) AS q,
             CAST(ROUND(value * 100.0, 0) AS DECIMAL(6,0)) AS qd,
             CAST(EXTRACT(hour FROM ts) AS DOUBLE) AS x
      FROM events
    ), sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(q AS DECIMAL(38,0))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(q*q AS DECIMAL(38,0))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(q*q*q AS DECIMAL(38,0))) AS DOUBLE) AS s3,
             CAST(SUM(CAST(qd*qd AS DECIMAL(19,0))
                      * CAST(qd*qd AS DECIMAL(19,0))) AS DOUBLE) AS s4,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(x*x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(x*q AS DECIMAL(38,0))) AS DOUBLE) AS sxq
      FROM q GROUP BY event_type
    ), derived AS (
      SELECT event_type, n, s1, s2, sx, sxx, sxq,
             s1 / n AS mean_c,
             s2 / n - (s1/n) * (s1/n) AS m2,
             s3 / n - 3.0 * (s1/n) * (s2/n)
                    + 2.0 * (s1/n) * (s1/n) * (s1/n) AS m3,
             s4 / n - 4.0 * (s1/n) * (s3/n)
                    + 6.0 * (s1/n) * (s1/n) * (s2/n)
                    - 3.0 * (s1/n) * (s1/n) * (s1/n) * (s1/n) AS m4,
             ((s2 - s1 * s1 / n) / (n - 1.0)) / 10000.0 AS var_samp,
             n * sxq - sx * s1 AS cov_n,
             n * sxx - sx * sx AS varx_n,
             n * s2 - s1 * s1 AS varq_n
      FROM sums
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_events,
           mean_c / 100.0 AS mean_value,
           var_samp,
           SQRT(var_samp) AS stddev_samp,
           ROUND(m3 / (SQRT(m2) * m2), 9) AS skewness_pop,
           ROUND(m4 / (m2 * m2) - 3.0, 9) AS kurtosis_excess,
           cov_n / (SQRT(varx_n) * SQRT(varq_n)) AS corr_hour_value,
           (cov_n / varx_n) / 100.0 AS regr_slope,
           ((s1 - (cov_n / varx_n) * sx) / n) / 100.0 AS regr_intercept,
           (cov_n / (SQRT(varx_n) * SQRT(varq_n)))
             * (cov_n / (SQRT(varx_n) * SQRT(varq_n))) AS regr_r2
    FROM derived
    """,
)
