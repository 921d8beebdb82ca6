"""Guard against events.ts unit regressions (round-2 VERDICT item 1).

Round 2 shipped a silent systemic bug: load_table divided events.ts by
1000 assuming TIMESTAMP(NANOS) parquet while the testdata had been
regenerated as TIMESTAMP_MICROS — every absolute-time computation
landed in January 1970. These tests pin the contract: whatever unit
the parquet stores, load_table must produce TimestampType values in
the data's real era.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from otrrentetl_spark.catalog import _parquet_ts_unit, load_table, read_events_stream

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_events_ts_is_timestamp_type(spark):
    df = load_table(spark, SF_DIR, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)


def test_events_ts_in_real_era(spark):
    """A unit mix-up lands timestamps in 1970 (µs read as ns) or in the
    year 56k+ (ns read as µs). Either way year(min(ts)) leaves the
    plausible data era — pin it."""
    df = load_table(spark, SF_DIR, "events")
    row = df.agg(
        F.year(F.min("ts")).alias("ymin"), F.year(F.max("ts")).alias("ymax")
    ).collect()[0]
    assert row.ymin > 2000, f"events.ts decoded into the past: year {row.ymin}"
    assert row.ymax < 2100, f"events.ts decoded into the future: year {row.ymax}"


def test_events_ts_matches_pyarrow_read(spark):
    """Value-level cross-check against an independent reader: min/max
    of ts via pyarrow must equal Spark's (UTC, µs truncation)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_DIR}/events.parquet", columns=["ts"])
    col = tbl.column("ts").to_pandas()
    smin, smax = (
        load_table(spark, SF_DIR, "events")
        .agg(F.min("ts"), F.max("ts"))
        .collect()[0]
    )
    assert smin == col.min().to_pydatetime()
    assert smax == col.max().to_pydatetime()


def test_other_timestamp_columns_in_real_era(spark):
    """orders.o_orderdate and lineitem.l_shipdate are declared
    TimestampType — a testdata regeneration that changes their unit
    must never silently time-travel them either."""
    for tbl, col in [("orders", "o_orderdate"), ("lineitem", "l_shipdate")]:
        df = load_table(spark, SF_DIR, tbl)
        row = df.agg(
            F.year(F.min(col)).alias("ymin"), F.year(F.max(col)).alias("ymax")
        ).collect()[0]
        # TPC-H-style order dates live in the 1990s; the guard only
        # needs to exclude unit mix-ups (1970 or year-56k territory)
        assert 1990 < row.ymin <= row.ymax < 2100, (tbl, col, row)


def test_parquet_ts_unit_probe():
    assert _parquet_ts_unit(f"{SF_DIR}/events.parquet") in ("us", "ms", "ns", "s")
    # current testdata is known-micros; if this fails the data was
    # regenerated — the loader must keep working either way
    assert _parquet_ts_unit(f"{SF_DIR}/events.parquet") == "us"


def test_stream_reader_era_matches_batch(spark, tmp_path):
    """The streaming reader must decode ts identically to the batch
    path (same footer probe), asserted through a real availableNow
    drain to memory."""
    import shutil

    src = tmp_path / "ev"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "part-0.parquet")
    stream = read_events_stream(spark, str(src))
    agg = stream.groupBy().agg(F.min("ts").alias("tmin"), F.max("ts").alias("tmax"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ts_era_check")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("ts_era_check").collect()[0]
    want = (
        load_table(spark, SF_DIR, "events").agg(F.min("ts"), F.max("ts")).collect()[0]
    )
    assert got.tmin == want[0] and got.tmax == want[1]


def test_nanos_file_roundtrip(spark, tmp_path):
    """Write a genuine TIMESTAMP(NANOS) file and check load_table's
    nanos path still decodes into the same era (ns → µs truncation)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ns = pa.array([1704067200_000_000_000, 1704070800_123_456_789], pa.timestamp("ns"))
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ns,
            "user_id": pa.array([10, 11], pa.int64()),
            "event_type": pa.array(["view", "click"]),
            "value": pa.array([1.0, 2.0]),
            "props": pa.array(["{}", "{}"]),
        }
    )
    d = tmp_path / "sfnano"
    d.mkdir()
    pq.write_table(tbl, d / "events.parquet", use_deprecated_int96_timestamps=False)
    assert _parquet_ts_unit(str(d / "events.parquet")) == "ns"
    df = load_table(spark, str(d), "events")
    rows = df.orderBy("event_id").select("ts").collect()
    assert rows[0][0].year == 2024
    # µs truncation of ...123_456_789 ns → ...123456 µs
    assert rows[1][0].microsecond == 123456


def test_stream_int64_micros_matches_batch(spark, tmp_path):
    """ADVICE r4: a raw-int64 ts column of MICROSECOND magnitude must
    decode identically through the batch loader and the streaming
    reader (the stream previously assumed int64 ⇒ nanoseconds and came
    out 1000× wrong). Write int64 µs and int64 ns fixtures and check
    the stream face against the known instants."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from otrrentetl_spark.catalog import SCHEMAS

    expect = dt.datetime(2017, 3, 1, 12, 0, 0)
    epoch_us = int(dt.datetime(2017, 3, 1, 12, 0, 0, tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    names = [f.name for f in SCHEMAS["events"].fields]

    for unit, factor in [("us", 1), ("ns", 1000)]:
        d = tmp_path / f"int64_{unit}"
        d.mkdir()
        cols = {}
        for f in SCHEMAS["events"].fields:
            if f.name == "ts":
                cols["ts"] = pa.array([epoch_us * factor], type=pa.int64())
            elif f.dataType.simpleString() == "bigint":
                cols[f.name] = pa.array([1], type=pa.int64())
            elif f.dataType.simpleString().startswith("timestamp"):
                cols[f.name] = pa.array([epoch_us], type=pa.timestamp("us"))
            elif f.dataType.simpleString() == "double":
                cols[f.name] = pa.array([1.0], type=pa.float64())
            else:
                cols[f.name] = pa.array(["x"], type=pa.string())
        pq.write_table(pa.table([cols[n] for n in names], names=names), str(d / "part.parquet"))

        stream = read_events_stream(spark, str(d))
        out_dir = tmp_path / f"sink_{unit}"
        q = (
            stream.writeStream.format("memory")
            .queryName(f"int64_{unit}_probe")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(out_dir))
            .start()
        )
        q.awaitTermination(60)
        got = spark.sql(f"SELECT ts FROM int64_{unit}_probe").collect()
        assert len(got) == 1
        assert got[0]["ts"] == expect, (unit, got[0]["ts"])
