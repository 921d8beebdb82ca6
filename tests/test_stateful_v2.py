"""transformWithStateInPandas (Spark 4 StatefulProcessor API): the
final per-user state after draining the stream must equal the batch
aggregate — and match the legacy applyInPandasWithState operator's
semantics (integer cents make the comparison exact).

Environment gate: the v2 state protocol speaks protobuf between the
JVM and the Python state server; without `google.protobuf` installed
the driver worker cannot start, so this test skips (the legacy-API
operator in streaming/stateful.py remains the covered stateful path).
"""

from __future__ import annotations

import pytest

pytest.importorskip(
    "google.protobuf",
    reason="transformWithStateInPandas requires protobuf for its state protocol",
)

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_transform_with_state_equals_batch(spark, tmp_path):
    from otrrentetl_spark.catalog import load_table
    from otrrentetl_spark.streaming import jobs
    from otrrentetl_spark.streaming.stateful_v2 import running_user_cents

    cents = F.round(F.col("value") * 100.0, 0).cast("long").alias("cents")

    batch = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", cents)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        )
    )
    expected = {
        r["user_id"]: (r["n_events"], r["sum_cents"]) for r in batch.collect()
    }

    stream = jobs.read_events_stream(spark, SF_SMOKE).select("user_id", cents)
    q = (
        running_user_cents(stream)
        .writeStream.format("memory")
        .queryName("mem_tws")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    jobs.stop_query(q, timeout_s=120)

    # last emitted row per user = final running state
    final = {}
    for r in spark.table("mem_tws").collect():
        final[r["user_id"]] = (r["n_events"], r["sum_cents"])
    # keep the max-n emission per user (update mode may emit per batch)
    got = {}
    for r in spark.table("mem_tws").collect():
        cur = got.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            got[r["user_id"]] = (r["n_events"], r["sum_cents"])

    assert got == expected
