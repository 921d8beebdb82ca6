"""Table catalog: explicit schemas + loaders for the test datasets.

The reference declares fixed per-table schemas with typed defaults
(reference: otrrentetl/storage/tablemodels.py:14-75, read via
type-dispatch in otrrentetl/storage/azurestoragewrapper.py:118-138).
We mirror that discipline: every table has an explicit StructType; we
never rely on schema inference in the engine paths.

At 100 TB, an explicit schema also means the parquet reader can prune
columns without a footer-merge pass over every file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # events.ts is TIMESTAMP(NANOS) in parquet, which Spark cannot map
    # to TimestampType (micros). We read it as raw int64 nanoseconds
    # (spark.sql.legacy.parquet.nanosAsLong) and convert in load_table,
    # so downstream code always sees a plain TimestampType 'ts'.
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# Reference-model schemas (SURVEY.md §1.2; reference:
# otrrentetl/storage/tablemodels.py:14-75). Used by the pipeline
# programs and the keyed-merge writer tests.
GENRES_SCHEMA = T.StructType(
    [
        T.StructField("PartitionKey", T.StringType()),
        T.StructField("RowKey", T.StringType()),
        T.StructField("Genre_Id", T.LongType()),
        T.StructField("Genre", T.StringType()),
    ]
)

RECORDINGS_SCHEMA = T.StructType(
    [
        T.StructField("PartitionKey", T.StringType()),
        T.StructField("RowKey", T.StringType()),
        T.StructField("Id", T.LongType()),
        T.StructField("beginn", T.TimestampType()),
        T.StructField("ende", T.TimestampType()),
        T.StructField("dauer", T.LongType()),
        T.StructField("sender", T.StringType()),
        T.StructField("titel", T.StringType()),
        T.StructField("typ", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("genre_id", T.LongType()),
        T.StructField("genre", T.StringType()),
        T.StructField("fsk", T.StringType()),
        T.StructField("language", T.StringType()),
        T.StructField("weekday", T.StringType()),
        T.StructField("zusatz", T.StringType()),
        T.StructField("wdh", T.StringType()),
        T.StructField("downloadlink", T.StringType()),
        T.StructField("infolink", T.StringType()),
        T.StructField("programlink", T.StringType()),
        T.StructField("rating", T.StringType()),
        T.StructField("previewimagelink", T.StringType()),
    ]
)

TORRENTS_SCHEMA = T.StructType(
    [
        T.StructField("PartitionKey", T.StringType()),
        T.StructField("RowKey", T.StringType()),
        T.StructField("Id", T.LongType()),
        T.StructField("Resolution", T.StringType()),
        T.StructField("TorrentFile", T.StringType()),
        T.StructField("TorrentLink", T.StringType()),
        T.StructField("finished", T.LongType()),
        T.StructField("loading", T.LongType()),
        T.StructField("loaded", T.LongType()),
    ]
)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table with its declared schema.

    Passing the schema explicitly (rather than inferring) keeps the
    scan plan stable and lets Catalyst prune/push down against a
    known StructType.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.schema(SCHEMAS[name]).parquet(table_path(sf_dir, name))
        from pyspark.sql import functions as F

        # ns → µs truncation matches DuckDB's read of the same column.
        # Integer DIV — float division loses precision above 2^53 ns.
        return raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return spark.read.schema(SCHEMAS[name]).parquet(table_path(sf_dir, name))


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure a minimum partition count before an expression- or
    Python-kernel-heavy stage.

    A small input (one parquet row-group) scans as a single partition,
    which serializes all per-row compute — HOF chains, Arrow kernels —
    onto one core. At cluster scale a 100 TB scan already has thousands
    of partitions and this is a pass-through; locally, a round-robin
    repartition of a few thousand rows costs one tiny shuffle and buys
    every core for the stage above it.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
