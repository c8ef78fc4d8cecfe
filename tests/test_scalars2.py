"""Unit tests for the round-2 scalar additions (SURVEY §2.8 gaps):
version-from-URL extraction, DOI-URL promotion, language alias
normalization, known-metadata-filename extraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rsmetacheck_spark.functions import scalars as S


def _one(spark, col):
    return spark.range(1).select(col.alias("x")).collect()[0].x


@pytest.mark.parametrize("url,want", [
    ("https://github.com/o/r/archive/v1.2.tar.gz", "1.2"),
    ("https://github.com/o/r/archive/2.10.3.zip", "2.10.3"),
    ("https://github.com/o/r/releases/tag/v0.9", "0.9"),
    ("https://example.org/dl/v3.1/pkg", "3.1"),
    ("https://example.org/pkg-1.4.7.tgz", "1.4.7"),
    ("https://example.org/no/version/here", None),
])
def test_version_from_url(spark, url, want):
    assert _one(spark, S.version_from_url(F.lit(url))) == want


@pytest.mark.parametrize("ident,want", [
    ("10.5281/zenodo.123", "https://doi.org/10.5281/zenodo.123"),
    ("doi:10.5281/zenodo.123", "https://doi.org/10.5281/zenodo.123"),
    ("https://doi.org/10.5281/zenodo.123", "https://doi.org/10.5281/zenodo.123"),
    ("my tool", "my tool"),
])
def test_doi_promote(spark, ident, want):
    assert _one(spark, S.doi_promote(F.lit(ident))) == want


@pytest.mark.parametrize("lang,want", [
    ("Python3", "Python"), ("python", "Python"), ("CPP", "C++"),
    ("c++", "C++"), ("Rust", "Rust"), ("R", "R"), ("c", "C"),
    ("haskell", None),
])
def test_normalize_language_name(spark, lang, want):
    assert _one(spark, S.normalize_language_name(F.lit(lang))) == want


@pytest.mark.parametrize("src,want", [
    ("https://raw.github.com/o/r/main/codemeta.json", "codemeta.json"),
    ("/repo/sub/pyproject.toml", "pyproject.toml"),
    ("https://x/y/requirements.txt?raw=1", "requirements.txt"),
    ("/repo/some/other_file.cfg", "other_file.cfg"),
])
def test_extract_metadata_source_filename(spark, src, want):
    assert _one(spark, S.extract_metadata_source_filename(F.lit(src))) == want
