"""ETL driver — the reference's scheduled loop as an idempotent batch
program (SURVEY.md §3.1; reference: otrrentetl/runetl.py:27-66).

Topological order preserved: genre dimension → 10-day EPG backfill →
toplist promotion → torrent assignment. Every step is idempotent (I2
partition gates, keyed merges), so the timer loop of the reference
degenerates to "run this whenever" — cron, Airflow, or Structured
Streaming's availableNow cadence (streaming.jobs) all work unchanged.

All network input arrives through injectable providers, keeping the
relational program testable offline and the I/O at the edge.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from otrrentetl_spark.operators.merge import KeyedParquetTable
from otrrentetl_spark.pipelines import epg, genres, toprecordings, torrents

# Default backfill depth follows the active environment profile
# (profiles.py — reference keys this off APPLICATION_ENVIRONMENT);
# the reference's hardcoded production value is 10 (runetl.py:49-51).
BACKFILL_DAYS = 10  # runetl.py:49-51
TORRENT_WINDOW_DAYS = 8  # runetl.py:65, etl.py startdate


@dataclass
class EtlStores:
    genres: KeyedParquetTable
    recordings: KeyedParquetTable
    torrents: KeyedParquetTable

    @classmethod
    def at(cls, spark: SparkSession, root: str | Path) -> EtlStores:
        root = str(root)
        return cls(
            genres=KeyedParquetTable(spark, f"{root}/genres"),
            recordings=KeyedParquetTable(spark, f"{root}/recordings"),
            torrents=KeyedParquetTable(spark, f"{root}/torrents"),
        )


@dataclass
class EtlSources:
    """Injectable inputs: each provider returns a DataFrame (or None
    when the upstream has nothing for that key)."""

    genres_csv: Callable[[], DataFrame]
    epg_csv_for_day: Callable[[dt.date], DataFrame | None]
    toplist: Callable[[], DataFrame]
    tracker: Callable[[], DataFrame]


def backfill_window(
    today: dt.date, days: int | None = None
) -> list[dt.date]:
    """D4: the trailing ``days``-day window ending yesterday. With no
    explicit depth, the active environment profile decides (dev keeps
    the reference's 10, test shrinks to 2 for fast suites)."""
    if days is None:
        from otrrentetl_spark.profiles import active_profile

        days = active_profile().backfill_days
    return [today - dt.timedelta(days=d) for d in range(days, 0, -1)]


def run_once(
    spark: SparkSession,
    sources: EtlSources,
    stores: EtlStores,
    today: dt.date | None = None,
) -> dict[str, object]:
    """One full ETL pass; returns a small run report."""
    today = today or dt.date.today()
    dim = genres.ingest_genres(spark, sources.genres_csv(), stores.genres)
    days_written = epg.backfill(
        spark,
        backfill_window(today),
        sources.epg_csv_for_day,
        dim,
        stores.recordings,
    )
    n_promoted = toprecordings.promote_top(
        spark, sources.toplist(), stores.recordings
    )
    n_saved, n_deleted = torrents.update_torrents(
        spark,
        sources.tracker(),
        stores.recordings,
        stores.torrents,
        startdate=today - dt.timedelta(days=TORRENT_WINDOW_DAYS),
    )
    return {
        "epg_days_written": [d.isoformat() for d in days_written],
        "promoted": n_promoted,
        "torrents_saved": n_saved,
        "top_deleted": n_deleted,
    }
