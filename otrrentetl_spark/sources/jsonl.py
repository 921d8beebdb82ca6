"""JSON-Lines source/sink — the de-facto interchange format of LLM
training corpora (one JSON document per line).

Extends the reference's ingest family (S1/S2 CSV, SURVEY.md §2.1) with
the format a training-data pipeline actually receives upstream. All
parsing is Spark's distributed JSON reader against an EXPLICIT schema
(never inference — a 100 TB corpus cannot afford a schema-merge pass),
with the reader's three malformed-record policies surfaced:

- PERMISSIVE (default): broken lines land in ``_corrupt_record`` and
  every typed column is null — the pipeline can quarantine them.
- DROPMALFORMED: broken lines silently dropped (counted by the caller
  via input minus output when auditing).
- FAILFAST: abort on first broken line (strict contracts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write one JSON object per line (overwrite). ``compression`` may
    be 'gzip'/'zstd'/... — at scale, splittable formats or many files
    per partition keep the read side parallel."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read JSONL with an explicit schema and the chosen malformed-
    record policy. In PERMISSIVE mode the returned frame carries a
    ``_corrupt_record`` string column holding the raw broken line."""
    full = schema
    if mode == "PERMISSIVE" and CORRUPT_COL not in schema.fieldNames():
        full = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    return (
        spark.read.schema(full)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
