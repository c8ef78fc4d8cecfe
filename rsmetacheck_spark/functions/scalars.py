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
    """urlparse-style scheme+netloc format check (p008.py:8-22,
    p015.py:7-14): ANY scheme is accepted (ftp:// is format-valid in the
    reference), the netloc must be non-empty."""
    return u.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/\s]+")


def extract_urls(text: Column) -> Column:
    """URL extraction from free text (p008.py:58-81), reference-exact:
    TWO separate findall passes (https?:// then www.) whose matches may
    OVERLAP — 'https://www.X' yields BOTH 'https://www.X' and 'www.X',
    the latter always format-invalid, so P008 always fires on such text.
    A single alternation would miss the bare-www duplicate. Then strip
    exactly ONE trailing [,;.!?)] character (re.sub with an anchored
    single-char class replaces one match)."""
    return F.transform(
        F.concat(
            F.regexp_extract_all(text, F.lit(r"(?i)(https?://[^\s<>\"']+)"), 1),
            F.regexp_extract_all(text, F.lit(r"(?i)(www\.[^\s<>\"']+)"), 1),
        ),
        lambda u: F.regexp_replace(u, r"[,;.!?)]$", ""),
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

def version_from_url(u: Column) -> Column:
    """Version extraction from a download/archive URL (p012.py:5-30):
    try /archive/vX.Y, /releases/tag/vX.Y, /vX.Y, then a bare X.Y(.Z)
    anywhere — first match wins; archive extensions are stripped first."""
    stripped = F.regexp_replace(u, r"\.(tar\.gz|tgz|zip|tar\.bz2|tar)$", "")
    pats = (
        r"/archive/v?(\d+(?:\.\d+)+)",
        r"/releases/tag/v?(\d+(?:\.\d+)+)",
        r"/v(\d+(?:\.\d+)+)(?:/|$)",
        r"(\d+\.\d+(?:\.\d+)*)",
    )
    attempts = [
        F.nullif(F.regexp_extract(stripped, p, 1), F.lit("")) for p in pats
    ]
    return F.coalesce(*attempts)


def doi_promote(identifier: Column) -> Column:
    """Software-info DOI-URL promotion (json_ld_utils.py:6-50): a bare
    '10.x/..' or 'doi:10.x/..' identifier becomes its https://doi.org/
    URL; anything else passes through."""
    bare = identifier.rlike(r"^10\.\d+/")
    prefixed = identifier.rlike(r"^doi:10\.\d+/")
    return (
        F.when(bare, F.concat(F.lit("https://doi.org/"), identifier))
        .when(prefixed, F.concat(F.lit("https://doi.org/"), F.substring(identifier, 5, 10000)))
        .otherwise(identifier)
    )


# language alias normalization (pitfall_utils.py:42-61): the reference
# keeps {Python, Java, C++, C, R, Rust} and folds aliases
_LANG_ALIASES = {
    "python": "Python", "python3": "Python", "python2": "Python",
    "java": "Java",
    "cpp": "C++", "c++": "C++", "cplusplus": "C++",
    "c": "C",
    "r": "R",
    "rust": "Rust",
}


def normalize_language_name(lang: Column) -> Column:
    """Fold language aliases to canonical names; unknown -> NULL (the
    reference's keep-list semantics, pitfall_utils.py:6-39)."""
    m = F.create_map(
        *[F.lit(x) for kv in _LANG_ALIASES.items() for x in kv]
    )
    return m[F.lower(F.trim(lang))]


# the reference's 8 known metadata filenames (p001.py:18-24 et al.)
METADATA_FILENAMES = (
    "codemeta.json", "DESCRIPTION", "composer.json", "package.json",
    "pom.xml", "pyproject.toml", "requirements.txt", "setup.py",
)


def extract_metadata_source_filename(source: Column) -> Column:
    """Known metadata filename contained in the source path/url, else the
    basename (pitfall_utils.py:74-95: known-name match first, basename
    fallback)."""
    out = basename(source)
    for name in reversed(METADATA_FILENAMES):
        out = F.when(F.contains(source, F.lit(name)), F.lit(name)).otherwise(out)
    return out
