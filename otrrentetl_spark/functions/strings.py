"""String operator library — the reference's extraction/normalization
helpers as built-in column expressions (SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_key(col: Column | str) -> Column:
    """Str3: join-key normalization — lowercase + strip all spaces.

    Reference: ``sender.replace(' ', '').lower()`` applied on BOTH join
    sides (otrrentetl/server/etl.py:206 torrent side at parse,
    etl.py:251 recording side per probe). Encoded once here so the two
    sides can never drift.
    """
    return F.lower(F.regexp_replace(_c(col), " ", ""))


def substring_between(col: Column | str, left: str, right: str) -> Column:
    """Str2: the reference's ``split(left)[1].split(right)[0]`` idiom
    (otrrentetl/server/etl.py:136-137,186-187) as one regexp_extract.
    Returns '' when the markers are absent (same as Python split chain
    yielding the original string would NOT — the reference would throw
    IndexError and skip the row; callers filter on non-empty).
    """
    import re

    pat = re.escape(left) + "(.*?)" + re.escape(right)
    return F.regexp_extract(_c(col), pat, 1)


def token_at(col: Column | str, sep: str, idx: int) -> Column:
    """Str1/Str4: positional token, supporting negative (from-tail)
    indexes like the reference's ``parts[len(parts)-4]``
    (otrrentetl/server/etl.py:192-194). element_at is 1-based and
    accepts negatives natively.
    """
    pos = idx + 1 if idx >= 0 else idx
    return F.element_at(F.split(_c(col), sep), pos)


# Str5: the resolution classifier (otrrentetl/server/etl.py:208-234):
# suffix of the torrent link → {HD, HQ, DIVX, MP4, HD.AC3, AVI},
# default AVI. Order matters: more specific suffixes first.
_RESOLUTION_RULES = [
    (".HD.ac3.", "HD.AC3"),
    (".mpg.HD.avi.", "HD"),
    (".mpg.HQ.avi.", "HQ"),
    (".mpg.avi.", "DIVX"),
    (".mp4.", "MP4"),
]


def classify_resolution(link: Column | str) -> Column:
    c = _c(link)
    expr = F.lit("AVI")
    for suffix, label in reversed(_RESOLUTION_RULES):
        expr = F.when(c.contains(suffix), F.lit(label)).otherwise(expr)
    return expr
