"""Scalar function library (SURVEY §2.8) — the reference's shared string/
date helpers re-expressed as native Column functions, ONE definition each
(the reference kept two divergent `normalize_version`s, pitfall_utils.py:
64-72 vs p012.py:33-49 — here there is exactly one).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# the reference's 5 accepted datetime formats + date-prefix fallback
# (w002.py:58-92), as a try_to_timestamp coalesce chain
_TS_FORMATS = (
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy/MM/dd HH:mm:ss",
    "yyyy-MM-dd",
)


def normalize_version(v: Column) -> Column:
    """Strip a leading v/V and surrounding whitespace (pitfall_utils.py:64-72)."""
    return F.regexp_replace(F.trim(v), "^[vV]", "")


def parse_datetime_multi(s: Column) -> Column:
    """First format that parses wins; falls back to a date prefix (W002)."""
    attempts = [F.try_to_timestamp(s, F.lit(fmt)) for fmt in _TS_FORMATS]
    prefix = F.try_to_timestamp(
        F.regexp_extract(s, r"^(\d{4}-\d{2}-\d{2})", 1), F.lit("yyyy-MM-dd")
    )
    return F.coalesce(*attempts, prefix)


def days_between(a: Column, b: Column) -> Column:
    """abs((d1-d2).days) (w002.py:95-101)."""
    return F.abs(F.datediff(a, b))


def url_is_valid(u: Column) -> Column:
    """scheme+netloc check (p008.py:8-22)."""
    return u.rlike(r"^https?://[^/\s]+")


def extract_urls(text: Column) -> Column:
    """URL extraction from free text with trailing-punct strip (p008.py:58-81)."""
    return F.transform(
        F.regexp_extract_all(text, F.lit(r"(https?://[^\s<>\"]+|www\.[^\s<>\"]+)"), 1),
        lambda u: F.regexp_replace(u, r"[.,;:!?)\]]+$", ""),
    )


def repo_url_normalize(u: Column) -> Column:
    """lowercase, strip git+ prefix / trailing slash / .git, rewrite
    git@host:path -> https://host/path (p016.py:4-21)."""
    x = F.lower(F.trim(u))
    x = F.regexp_replace(x, r"^git\+", "")
    x = F.regexp_replace(x, r"^git@([^:]+):", r"https://$1/")
    x = F.regexp_replace(x, r"\.git$", "")
    x = F.regexp_replace(x, r"/+$", "")
    return x


def basename(path: Column) -> Column:
    """Filename from a path/url (pitfall_utils.py:74-95 fallback branch)."""
    return F.element_at(F.split(path, "/"), -1)
