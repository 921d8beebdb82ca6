"""df.observe: inline data-quality metrics collected during a real
query execution — QA without a second pass over the data (the
scale-relevant property: the metrics ride the existing scan)."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_observe_inline_metrics(spark):
    from otrrentetl_spark.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    expected = ev.count()

    obs = Observation("qa")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_null_value"),
        F.min("ts").alias("min_ts"),
    )
    # run a real downstream aggregate; the metrics ride along
    downstream = observed.groupBy("event_type").count().collect()
    assert len(downstream) > 0

    got = obs.get
    assert got["n_rows"] == expected
    assert got["n_null_value"] == 0
    assert got["min_ts"] is not None
