"""JSONL source: malformed-record policies and round-trip fidelity."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from otrrentetl_spark.sources.jsonl import CORRUPT_COL, read_jsonl, write_jsonl

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _write_mixed(tmp_path):
    p = tmp_path / "mixed"
    p.mkdir()
    (p / "part-0.jsonl").write_text(
        '{"doc_id": 1, "text": "good one"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "also fine"}\n'
        '{"doc_id": "not-a-number", "text": "bad type"}\n'
    )
    return str(p)


def test_permissive_quarantines_corrupt_lines(spark, tmp_path):
    df = read_jsonl(spark, _write_mixed(tmp_path), SCHEMA)
    rows = df.collect()
    assert len(rows) == 4
    good = [r for r in rows if r[CORRUPT_COL] is None]
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert {r["doc_id"] for r in good} == {1, 2}
    assert len(bad) == 2  # the non-JSON line and the bad-typed line
    assert any("not json" in r[CORRUPT_COL] for r in bad)


def test_dropmalformed_keeps_only_clean(spark, tmp_path):
    df = read_jsonl(spark, _write_mixed(tmp_path), SCHEMA, mode="DROPMALFORMED")
    assert {r["doc_id"] for r in df.collect()} == {1, 2}


def test_failfast_raises(spark, tmp_path):
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        read_jsonl(
            spark, _write_mixed(tmp_path), SCHEMA, mode="FAILFAST"
        ).collect()


def test_roundtrip_preserves_tricky_text(spark, tmp_path):
    rows = [
        (1, 'quotes " and \\ backslashes'),
        (2, "newline\ninside and tab\tinside"),
        (3, "unicode: café straße 中文"),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path / "rt")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, SCHEMA)
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == dict(rows)


def test_gzip_roundtrip(spark, tmp_path):
    """Corpora ship gzipped; the sink's compression option must
    round-trip losslessly (Spark decompresses by extension)."""
    rows = [(i, f"doc number {i} body text") for i in range(50)]
    df = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path / "gz")
    write_jsonl(df, path, compression="gzip")
    import glob

    assert glob.glob(f"{path}/*.json.gz"), "expected gzip part files"
    back = read_jsonl(spark, path, SCHEMA)
    assert {(r["doc_id"], r["text"]) for r in back.collect()} == set(rows)
