"""Genre-dimension ingest as a DataFrame program (SURVEY.md §3.1
step 2; reference: otrrentetl/server/etl.py:25-55).

Reference dataflow: F6 emptiness gate → S1 fetch → S2 `;`-CSV parse
(`Nummer;Kategorie`) → per-row typed Genre entity → K2 upsert →
materialize the dimension for lookups. Here the whole load is one
set-oriented write, and "materialize for lookup" becomes a broadcast
join (J1) performed by the consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otrrentetl_spark.catalog import GENRES_SCHEMA
from otrrentetl_spark.functions import casts
from otrrentetl_spark.operators.merge import KeyedParquetTable

DEFAULT_GENRE = "Sonstiges"  # miss default, tablemodels.py:104


def genres_from_csv(raw: DataFrame) -> DataFrame:
    """`Nummer;Kategorie` rows → typed genres dimension with the
    reference's key convention (PartitionKey='all', RowKey=Nummer)."""
    return raw.select(
        F.lit("all").alias("PartitionKey"),
        casts.safe_string(F.col("Nummer")).alias("RowKey"),
        casts.safe_long(F.col("Nummer")).alias("Genre_Id"),
        casts.safe_string(F.col("Kategorie")).alias("Genre"),
    )


def ingest_genres(
    spark: SparkSession, raw: DataFrame, store: KeyedParquetTable
) -> DataFrame:
    """Idempotent dimension load: the F6 emptiness gate skips the write
    when the dimension is already present (etl.py:29); either way the
    caller gets the loaded dimension back."""
    if store.partition_is_empty("all"):
        store.upsert_replace_partitions(genres_from_csv(raw))
    return store.read().select(*GENRES_SCHEMA.fieldNames())


def enrich_with_genre(facts: DataFrame, genres: DataFrame) -> DataFrame:
    """J1: broadcast lookup join with default — every fact row gets
    `genre` = dimension name or 'Sonstiges' (etl.py:98,
    tablemodels.py:98-104). The dimension is explicitly broadcast: it
    is a bona-fide small dimension at any corpus scale."""
    # Collision-free dim aliases: Spark resolves names case-
    # insensitively, so dropping "Genre"/"Genre_Id" would also take
    # the fact's genre/genre_id with it.
    dim = F.broadcast(
        genres.select(
            F.col("Genre_Id").alias("__dim_gid"),
            F.col("Genre").alias("__dim_genre"),
        )
    )
    return (
        facts.join(dim, facts.genre_id == dim.__dim_gid, "left")
        .withColumn("genre", F.coalesce(F.col("__dim_genre"), F.lit(DEFAULT_GENRE)))
        .drop("__dim_gid", "__dim_genre")
    )
