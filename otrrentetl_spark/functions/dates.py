"""Date/time operator library (SURVEY.md §2.8).

The reference works in three German datetime formats and derives both
partition keys and join keys from formatted timestamps; those format
strings are centralized in ``functions.casts``. Here live the derived-
column helpers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def partition_key(col: Column | str) -> Column:
    """P2: broadcast-date partition key ``strftime('%Y_%m_%d')``
    (otrrentetl/server/etl.py:67,96)."""
    return F.date_format(_c(col), "yyyy_MM_dd")


def join_stamp(col: Column | str) -> Column:
    """J2's datetime join key ``strftime('%y.%m.%d %H-%M-%S')`` with
    seconds truncated to 00 on the torrent side
    (otrrentetl/server/etl.py:193,251): the reference formats the
    parsed filename stamp (which has no seconds) so both sides agree
    at minute granularity. We truncate to the minute explicitly.
    """
    return F.date_format(F.date_trunc("minute", _c(col)), "yy.MM.dd HH-mm-ss")


def backfill_dates(days: int = 10) -> Column:
    """D4: the reference's 10-day backfill window
    (otrrentetl/runetl.py:49-59) as a date sequence column; explode it
    to drive per-date idempotent ingest.
    """
    return F.sequence(
        F.date_sub(F.current_date(), days),
        F.date_sub(F.current_date(), 1),
        F.expr("interval 1 day"),
    )
