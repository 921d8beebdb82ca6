from __future__ import annotations

from pyspark.sql import functions as F

from otrrentetl_spark.functions import dates, strings


def _one(spark, col_expr, value):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(col_expr.alias("r")).collect()[0]["r"]


def test_normalize_key(spark):
    assert _one(spark, strings.normalize_key("v"), "Pro Sieben") == "prosieben"
    assert _one(spark, strings.normalize_key("v"), "RTL 2") == "rtl2"
    # idempotence (SURVEY.md §5.4)
    assert _one(spark, strings.normalize_key(strings.normalize_key("v")), "A B c") == "abc"


def test_substring_between(spark):
    v = "<td>Beliebtheit: 9876'</td>"
    assert _one(spark, strings.substring_between("v", "Beliebtheit: ", "'"), v) == "9876"
    assert _one(spark, strings.substring_between("v", "missing: ", "'"), v) == ""


def test_token_at_negative(spark):
    v = "Show_Name 17.12.24 20-15 prosieben some tail"
    # reference parses parts[len-4]... pattern (etl.py:192-194)
    assert _one(spark, strings.token_at("v", " ", -4), v) == "20-15"
    assert _one(spark, strings.token_at("v", " ", 0), v) == "Show_Name"


def test_classify_resolution_all_branches(spark):
    cases = {
        "file.mpg.HD.avi.otrkey.torrent": "HD",
        "file.HD.ac3.otrkey.torrent": "HD.AC3",
        "file.mpg.HQ.avi.otrkey.torrent": "HQ",
        "file.mpg.avi.otrkey.torrent": "DIVX",
        "file.mp4.otrkey.torrent": "MP4",
        "file.unknown.torrent": "AVI",
    }
    for link, want in cases.items():
        assert _one(spark, strings.classify_resolution("v"), link) == want, link


def test_join_stamp_minute_truncation(spark):
    df = spark.createDataFrame(
        [("2017-12-24 20:15:37",)], "v string"
    ).select(F.col("v").cast("timestamp").alias("ts"))
    got = df.select(dates.join_stamp("ts").alias("r")).collect()[0]["r"]
    assert got == "17.12.24 20-15-00"


def test_partition_key_format(spark):
    df = spark.createDataFrame([("2017-01-05 08:00:00",)], "v string").select(
        F.col("v").cast("timestamp").alias("ts")
    )
    got = df.select(dates.partition_key("ts").alias("r")).collect()[0]["r"]
    assert got == "2017_01_05"
