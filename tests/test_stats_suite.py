"""stats_moments_suite: the fixed-point formula path must agree with
Spark's built-in estimators (same definitions where Spark has them,
algebraic corrections where definitions differ), and the power sums
must be mergeable (partial aggregates over disjoint splits combine to
the global answer) — the property that makes the suite one-shuffle at
any scale."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from otrrentetl_spark.plans.stats_suite import stats_moments_suite

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def suite(spark):
    rows = stats_moments_suite(spark, SF_DIR).collect()
    assert rows, "suite returned no groups"
    return {r["event_type"]: r.asDict() for r in rows}


def _builtin(spark):
    from otrrentetl_spark.catalog import load_table

    ev = load_table(spark, SF_DIR, "events").withColumn(
        "q", F.round(F.col("value") * 100.0, 0) / 100.0
    )
    x = F.hour("ts").cast("double")
    rows = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("q").alias("mean"),
        F.var_samp("q").alias("var_samp"),
        F.stddev_samp("q").alias("stddev"),
        F.skewness("q").alias("skew"),
        F.kurtosis("q").alias("kurt"),
        F.corr(x, F.col("q")).alias("corr"),
        F.regr_slope(F.col("q"), x).alias("slope"),
        F.regr_intercept(F.col("q"), x).alias("icept"),
        F.regr_r2(F.col("q"), x).alias("r2"),
    ).collect()
    return {r["event_type"]: r.asDict() for r in rows}


def test_matches_builtin_estimators(spark, suite):
    ref = _builtin(spark)
    assert set(ref) == set(suite)
    for et, b in ref.items():
        s = suite[et]
        assert s["n_events"] == b["n"]
        for ours, theirs in [
            ("mean_value", "mean"),
            ("var_samp", "var_samp"),
            ("stddev_samp", "stddev"),
            ("skewness_pop", "skew"),
            ("kurtosis_excess", "kurt"),
            ("corr_hour_value", "corr"),
            ("regr_slope", "slope"),
            ("regr_intercept", "icept"),
            ("regr_r2", "r2"),
        ]:
            assert math.isclose(s[ours], b[theirs], rel_tol=1e-6, abs_tol=1e-9), (
                et,
                ours,
                s[ours],
                b[theirs],
            )


def test_power_sums_merge(spark):
    """Partial power sums over a disjoint split combine to the global
    sums — the associativity Spark's partial aggregation relies on."""
    from otrrentetl_spark.catalog import load_table

    ev = load_table(spark, SF_DIR, "events")
    q = F.round(F.col("value") * 100.0, 0)

    def sums(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(q.cast("decimal(38,0)")).alias("s1"),
            F.sum((q * q).cast("decimal(38,0)")).alias("s2"),
        ).collect()[0]
        return r["n"], r["s1"], r["s2"]

    full = sums(ev)
    lo = sums(ev.filter(F.col("event_id") % 2 == 0))
    hi = sums(ev.filter(F.col("event_id") % 2 == 1))
    assert tuple(a + b for a, b in zip(lo, hi)) == full


def test_single_shuffle_plan(spark):
    """The whole suite is one partial-agg shuffle: exactly one
    Exchange, with a partial HashAggregate below it."""
    df = stats_moments_suite(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "partial_" in plan.lower() or "HashAggregate" in plan, plan
