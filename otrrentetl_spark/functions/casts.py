"""Fault-tolerant casting — the reference's `safe_cast` as column exprs.

Reference semantics (otrrentetl/server/helper.py:4-27, dispatch at
otrrentetl/storage/azurestoragewrapper.py:118-138): every inbound
value is coerced to the declared column type; on ANY parse failure the
column's *default* is substituted — never NULL, never an error.
Booleans parse from the string table {yes, true, t, 1} (helper.py:13-15).
Datetimes parse with per-table format strings (tablemodels.py:16-17,37-38).

Spark mapping: ``coalesce(try_cast(...), lit(default))``. The
``coalesce`` is load-bearing: a plain cast under ANSI throws, and
``try_cast`` alone yields NULL where the reference yields the default.

All of these are built-in column expressions — JVM-side, codegen'd,
no Python in the hot path.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference's boolean-string table (helper.py:13-15).
_TRUE_STRINGS = ("yes", "true", "t", "1")

# The three German formats the reference parses (SURVEY.md §2.8 D1),
# as Java datetime patterns.
FMT_DATE_SHORT = "dd.MM.yy"  # helper.py:7 via tablemodels._dateformat
FMT_TS_TORRENT = "yy.MM.dd HH-mm-ss"  # etl.py:193 torrent filename stamp
FMT_TS_EPG = "dd.MM.yyyy HH:mm:ss"  # tablemodels.py:38 EPG datetimes

# Reference column defaults (tablemodels.py:41-42): 1900-01-01.
DEFAULT_TS = _dt.datetime(1900, 1, 1)
DEFAULT_DATE = _dt.date(1900, 1, 1)


def safe_long(col: Column | str, default: int = 0) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast("long"), F.lit(default))


def safe_double(col: Column | str, default: float = 0.0) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast("double"), F.lit(default))


def safe_bool(col: Column | str, default: bool = False) -> Column:
    """Reference bool parse: lowercase value ∈ {yes,true,t,1} (helper.py:13-15)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), F.lit(default)).otherwise(
        F.lower(F.trim(c)).isin(*_TRUE_STRINGS)
    )


def safe_timestamp(col: Column | str, fmt: str = FMT_TS_EPG, default: _dt.datetime = DEFAULT_TS) -> Column:
    """Formatted timestamp parse with default-on-failure (helper.py:7-11)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.try_to_timestamp(c, F.lit(fmt)), F.lit(default))


def safe_date(col: Column | str, fmt: str = FMT_DATE_SHORT, default: _dt.date = DEFAULT_DATE) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.try_to_timestamp(c, F.lit(fmt)).cast("date"), F.lit(default)
    )


def safe_string(col: Column | str, default: str = "") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("string"), F.lit(default))
