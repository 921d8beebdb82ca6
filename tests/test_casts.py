"""Table-driven coverage of the safe_cast family (SURVEY.md §5.3).

Mirrors the reference's coercion matrix: bool-string table, the three
German date formats, unparseable → default (reference:
otrrentetl/server/helper.py:4-27).
"""

from __future__ import annotations

import datetime as dt


from otrrentetl_spark.functions import casts


def _one(spark, col_expr, value):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(col_expr.alias("r")).collect()[0]["r"]


def test_safe_long(spark):
    assert _one(spark, casts.safe_long("v"), "42") == 42
    assert _one(spark, casts.safe_long("v"), "nope") == 0
    assert _one(spark, casts.safe_long("v", default=-1), None) == -1
    assert _one(spark, casts.safe_long("v"), " 7 ") == 7  # spark trims


def test_safe_bool_table(spark):
    for s in ("yes", "true", "t", "1", "YES", "True", " T "):
        assert _one(spark, casts.safe_bool("v"), s) is True, s
    for s in ("no", "false", "0", "junk", ""):
        assert _one(spark, casts.safe_bool("v"), s) is False, s
    assert _one(spark, casts.safe_bool("v", default=True), None) is True


def test_safe_timestamp_epg_format(spark):
    got = _one(spark, casts.safe_timestamp("v"), "24.12.2017 20:15:00")
    assert got == dt.datetime(2017, 12, 24, 20, 15, 0)
    # failure → 1900-01-01 default, not NULL (the fidelity linchpin)
    assert _one(spark, casts.safe_timestamp("v"), "not a date") == casts.DEFAULT_TS
    assert _one(spark, casts.safe_timestamp("v"), None) == casts.DEFAULT_TS


def test_safe_timestamp_torrent_format(spark):
    got = _one(
        spark, casts.safe_timestamp("v", casts.FMT_TS_TORRENT), "17.12.24 20-15-00"
    )
    assert got == dt.datetime(2017, 12, 24, 20, 15, 0)


def test_safe_date_short_format(spark):
    assert _one(spark, casts.safe_date("v"), "24.12.17") == dt.date(2017, 12, 24)
    assert _one(spark, casts.safe_date("v"), "32.13.17") == casts.DEFAULT_DATE


def test_safe_double(spark):
    assert _one(spark, casts.safe_double("v"), "3.25") == 3.25
    assert _one(spark, casts.safe_double("v"), "x") == 0.0
