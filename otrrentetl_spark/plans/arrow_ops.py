"""Batch Arrow path: groupBy().applyInPandas with an EXACT oracle.

The engine's Pandas-UDF surface elsewhere covers mapInPandas
(multimodal), a banding kernel (dedup), and applyInPandasWithState
(streaming). This adds the fourth shape — batch grouped
applyInPandas — and keeps it under the hash gate by computing only
order statistics on integer cents: median/MAD with the explicit
lower-middle rule, bit-free of float accumulation, so DuckDB's
quantile_disc replays them exactly.

Scale shape: one shuffle on the group key; each group is a bounded
pandas frame (per-user event history). This is the escape hatch for
group-local logic Spark expressions can't state — the point of
demonstrating it with an oracle is that even the escape hatch stays
verifiable.

Worker-import note: the pandas function is a nested closure (pickled
by value), so it resolves on executors regardless of driver cwd
(round-1 lesson; __spark_entry__._ship_package also ships the
package).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otrrentetl_spark.catalog import load_table
from otrrentetl_spark.registry import register


def robust_user_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user robust statistics via grouped applyInPandas: event
    count, median of value-in-cents, and median absolute deviation —
    both medians by the lower-middle (quantile_disc) rule on exact
    integers."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.round(F.col("value") * 100.0, 0).cast("long").alias("cents")
    )

    def stats(pdf):
        import pandas as pd  # noqa: PLC0415 — executor-side

        def med_lower(s):
            v = sorted(s)
            return int(v[(len(v) - 1) // 2])

        c = pdf["cents"]
        m = med_lower(c)
        mad = med_lower((c - m).abs())
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(c)],
                "median_cents": [m],
                "mad_cents": [mad],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        stats,
        schema="user_id long, n_events long, median_cents long, mad_cents long",
    )


register(
    "robust_user_value_stats",
    robust_user_value_stats,
    """
    WITH c AS (
      SELECT user_id, CAST(ROUND(value * 100.0, 0) AS BIGINT) AS cents
      FROM events
    ), med AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(quantile_disc(cents, 0.5) AS BIGINT) AS median_cents
      FROM c GROUP BY 1
    )
    SELECT m.user_id, m.n_events, m.median_cents,
           CAST(quantile_disc(abs(c.cents - m.median_cents), 0.5) AS BIGINT)
             AS mad_cents
    FROM c JOIN med m ON c.user_id = m.user_id
    GROUP BY m.user_id, m.n_events, m.median_cents
    """,
)
