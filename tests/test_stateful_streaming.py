"""applyInPandasWithState across REAL micro-batch boundaries: the
events file is split into time-ordered chunks, maxFilesPerTrigger=1
forces one micro-batch per chunk, and the final per-user state must
equal the batch ground truth — proving state carries across batches
rather than being recomputed per batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_running_stats_across_microbatches(spark, tmp_path):
    from otrrentetl_spark.catalog import load_table
    from otrrentetl_spark.streaming.stateful import running_user_stats

    events = load_table(spark, SF_SMOKE, "events")

    # three time-ordered chunks → three micro-batches
    src = tmp_path / "chunks"
    events.withColumn(
        "chunk", F.ntile(3).over(__import__("pyspark").sql.Window.orderBy("ts"))
    ).write.partitionBy("chunk").parquet(str(src))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        running_user_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("user_stats")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.table("user_stats")
    # multiple update rows per user (one per participating batch); the
    # final state is the row with the max n_events (monotone counter)
    final = (
        got.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark")
                .sql.Window.partitionBy("user_id")
                .orderBy(F.col("n_events").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "sum_value", "last_seen")
    )
    expected = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.max("ts").alias("last_seen"),
    )
    f = {r["user_id"]: r for r in final.collect()}
    e = {r["user_id"]: r for r in expected.collect()}
    assert set(f) == set(e)
    for uid in e:
        assert f[uid]["n_events"] == e[uid]["n_events"], uid
        assert abs(f[uid]["sum_value"] - e[uid]["sum_value"]) < 1e-4, uid
        assert f[uid]["last_seen"] == e[uid]["last_seen"], uid
    # state really did span batches: more update rows than users
    assert got.count() > len(e)


def test_cents_rounding_half_away_from_zero():
    """ADVICE r4: the cents fixed-point must round half AWAY from zero
    like the oracle's SQL ROUND(value*100), not banker's half-to-even
    (pandas .round default) — 0.005 → 1 cent, 0.015 → 2, -0.005 → -1."""
    import pandas as pd

    from otrrentetl_spark.streaming import stateful

    class FakeState:
        exists = False

        def update(self, v):
            self.value = v

    st = FakeState()
    pdf = pd.DataFrame(
        {
            "value": [0.005, 0.015, -0.005, 1.125],
            "ts": pd.to_datetime(["2017-01-01"] * 4),
        }
    )
    out = list(stateful._update_user((7,), iter([pdf]), st))
    n, s_cents, _ = st.value
    # half-away: 1 + 2 + (-1) + 113 = 115 (banker's would give 0+2+0+112=114)
    assert s_cents == 115, s_cents
    assert out[0]["sum_value"][0] == 1.15


def test_state_store_provider_swap_invariance(spark, tmp_path):
    """r12 verdict item 5 — the Production profile pins the RocksDB
    state store (on-heap HDFS-backed state is the one executor memory
    footprint that grows with key cardinality at 100 TB). The stateful
    operator must produce IDENTICAL results under both providers; the
    cents fixed-point state makes that bit-exact, so this compares
    full row sets, not approximations."""
    import pytest

    from otrrentetl_spark.catalog import load_table
    from otrrentetl_spark.streaming.stateful import running_user_stats

    rocks = (
        "org.apache.spark.sql.execution.streaming.state"
        ".RocksDBStateStoreProvider"
    )
    try:
        spark._jvm.java.lang.Class.forName(
            "org.rocksdb.RocksDB"
        )
    except Exception:
        pytest.skip("rocksdbjni not on the classpath in this env")

    events = load_table(spark, SF_SMOKE, "events")
    src = tmp_path / "chunks"
    events.withColumn(
        "chunk",
        F.ntile(3).over(__import__("pyspark").sql.Window.orderBy("ts")),
    ).write.partitionBy("chunk").parquet(str(src))

    conf_key = "spark.sql.streaming.stateStore.providerClass"
    default_provider = spark.conf.get(conf_key)

    def run(provider: str, tag: str):
        spark.conf.set(conf_key, provider)
        try:
            stream = (
                spark.readStream.schema(events.schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(f"{src}/chunk=*")
            )
            q = (
                running_user_stats(stream)
                .writeStream.outputMode("update")
                .format("memory")
                .queryName(f"swap_{tag}")
                .option("checkpointLocation", str(tmp_path / f"ck_{tag}"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
        finally:
            spark.conf.set(conf_key, default_provider)
        got = spark.table(f"swap_{tag}")
        w = (
            __import__("pyspark")
            .sql.Window.partitionBy("user_id")
            .orderBy(F.col("n_events").desc())
        )
        return sorted(
            (r["user_id"], r["n_events"], r["sum_value"], r["last_seen"])
            for r in got.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
            .collect()
        )

    hdfs_rows = run(
        "org.apache.spark.sql.execution.streaming.state"
        ".HDFSBackedStateStoreProvider",
        "hdfs",
    )
    rocks_rows = run(rocks, "rocks")
    assert hdfs_rows == rocks_rows
    assert len(rocks_rows) > 0


def test_production_profile_pins_rocksdb_state_store():
    """The cluster profile must carry the RocksDB provider + changelog
    checkpointing confs (r12 verdict item 5)."""
    from otrrentetl_spark import profiles

    conf = profiles.spark_conf(profiles.PROFILES["Production"])
    assert conf["spark.sql.streaming.stateStore.providerClass"].endswith(
        "RocksDBStateStoreProvider"
    )
    assert (
        conf[
            "spark.sql.streaming.stateStore.rocksdb"
            ".changelogCheckpointing.enabled"
        ]
        == "true"
    )
