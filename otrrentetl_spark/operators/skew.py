"""Skew-mitigation operators.

AQE's skew-join splitting handles most hot keys at runtime
(spark.sql.adaptive.skewJoin.enabled, on in session.py); explicit
salting remains the tool when one side must be pre-partitioned or AQE
can't see the skew (e.g. aggregation state, streaming joins). Salting
trades a ``salt``-times replication of the small side for an even
key distribution of the big side — result-identical to the plain join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salt``
    shuffle partitions. The big side gets a deterministic per-row salt
    (hash of all its columns); the small side is exploded once per salt
    value so every (key, salt) bucket finds its match. Row-identical to
    ``big.join(small, on, how)`` for inner/left joins."""
    keys = list(on)
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return big_s.join(small_s, [*keys, "__salt"], how).drop("__salt")
