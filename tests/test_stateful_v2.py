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

import pandas as pd
import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    """Duck-typed StatefulProcessorHandle: just enough surface for
    RunningUserCents.init (getValueState)."""

    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema):
        return self.states.setdefault(name, _FakeValueState())


def test_processor_semantics_without_protobuf_transport(spark):
    """The v2 processor's LOGIC, covered in every environment: drive
    RunningUserCents through its StatefulProcessor lifecycle with a
    duck-typed handle (init → handleInputRows per micro-batch → close)
    and check the running state against the batch aggregate over the
    same events. Only the JVM↔Python protobuf TRANSPORT is
    environment-gated; the semantics are not."""
    from otrrentetl_spark.catalog import load_table
    from otrrentetl_spark.streaming.stateful_v2 import RunningUserCents

    cents = F.round(F.col("value") * 100.0, 0).cast("long").alias("cents")
    events = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", cents)
        .collect()
    )
    expected = {}
    for r in events:
        n, c = expected.get(r["user_id"], (0, 0))
        expected[r["user_id"]] = (n + 1, c + r["cents"])

    proc = RunningUserCents()
    proc.init(_FakeHandle())
    by_user: dict[int, list] = {}
    for r in events:
        by_user.setdefault(r["user_id"], []).append(r["cents"])
    got = {}
    for uid, vals in by_user.items():
        # two micro-batches per key: exercises state carry-over
        mid = len(vals) // 2
        proc2 = RunningUserCents()
        proc2.init(_FakeHandle())
        for chunk in (vals[:mid], vals[mid:]):
            out = list(
                proc2.handleInputRows(
                    (uid,), iter([pd.DataFrame({"cents": chunk})]), None
                )
            )
        proc2.close()
        last = out[-1]
        got[uid] = (int(last["n_events"][0]), int(last["sum_cents"][0]))
    assert got == expected


def test_transform_with_state_equals_batch(spark, tmp_path):
    # Environment-blocked, re-verified 2026-08: the sandbox has no
    # google.protobuf runtime anywhere on disk (only type stubs) and
    # no network (pip download fails), and the runtime cannot be
    # hand-shimmed — the generated StateMessage_pb2 needs the full
    # descriptor-pool/wire-format machinery. On any host with
    # protobuf installed this test runs the real JVM<->Python v2
    # state-server transport end-to-end.
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas requires protobuf for its state protocol",
    )
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
