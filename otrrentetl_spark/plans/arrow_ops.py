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


def udtf_lateral_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF + LATERAL join: a table function that explodes each
    document into fixed 8-token training chunks (the packing step of
    an LLM data pipeline), invoked per input row via LATERAL — the
    remaining UDF surface (scalar/grouped/mapInPandas/stateful are
    covered elsewhere). Deterministic chunking, so the oracle replays
    it with list slicing; the UDTF class is defined inside the query
    function (pickled by value → no executor import path issues)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string, n_tok int")
    class ChunkDoc:
        def eval(self, text: str, size: int):
            toks = text.split() if text and text.strip() else []
            for i in range(0, len(toks), size):
                piece = toks[i : i + size]
                yield i // size, " ".join(piece), len(piece)

    spark.udtf.register("chunk_doc", ChunkDoc)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") <= 100
    ).createOrReplaceTempView("docs_to_chunk")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk, c.n_tok
        FROM docs_to_chunk d,
             LATERAL chunk_doc(d.text, 8) c
        """
    )


register(
    "udtf_lateral_chunks",
    udtf_lateral_chunks,
    r"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS t
      FROM documents WHERE doc_id <= 100
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS chunk_idx,
           array_to_string(t[i*8+1 : i*8+8], ' ') AS chunk,
           CAST(len(t[i*8+1 : i*8+8]) AS INTEGER) AS n_tok
    FROM toks CROSS JOIN range(0, 64) r(i)
    WHERE i * 8 < len(t)
    """,
)


def pandas_udf_sql_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF registered into the SQL
    front door (spark.udf.register → usable from spark.sql): banding
    on integer cents, computed per Arrow batch (one Python call per
    ~10k rows, not per row). Deterministic integer/string ops only,
    so the oracle replays it in plain SQL — the point is the UDF
    *plumbing* (Arrow batching, SQL registration), not the math."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # NB: no type annotations — `from __future__ import annotations`
    # stringifies them and pandas_udf can't resolve 'pd.Series' against
    # a function-local import; the returnType argument carries the type.
    @pandas_udf("string")
    def cents_band(value):
        cents = (value * 100.0).round(0).astype("int64")
        return "B" + (cents % 7).astype(str)

    spark.udf.register("cents_band", cents_band)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_udf")
    return spark.sql(
        """
        SELECT event_type, cents_band(value) AS band,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
        FROM events_udf
        GROUP BY 1, 2
        """
    )


register(
    "pandas_udf_sql_scalar",
    pandas_udf_sql_scalar,
    """
    SELECT event_type,
           'B' || CAST(CAST(ROUND(value * 100.0, 0) AS BIGINT) % 7 AS VARCHAR)
             AS band,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
