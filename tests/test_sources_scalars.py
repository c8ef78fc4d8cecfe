"""S3/S8 sources + §2.8 scalar functions."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from rsmetacheck_spark.functions import scalars as S
from rsmetacheck_spark.sources.jsonio import (
    parse_json_column,
    read_json_docs,
    read_manifest_csv,
)

DOC_SCHEMA = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("version", T.StringType()),
    T.StructField("stars", T.LongType()),
])


def test_json_permissive_corrupt_isolation(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    lines = [
        json.dumps({"name": "a", "version": "v1.2", "stars": 5}),
        "{ this is not json",
        json.dumps({"name": "b", "version": "2.0", "stars": None}),
        '["wrong", "shape"]',
    ]
    p.write_text("\n".join(lines))
    good, bad = read_json_docs(spark, str(p), DOC_SCHEMA)
    assert {r.name for r in good.collect()} == {"a", "b"}
    assert bad.count() == 2  # malformed rows counted, run survives


def test_parse_json_column(spark):
    df = spark.createDataFrame([("x", '{"k": 3}'), ("y", "oops")], "id string, props string")
    out = parse_json_column(df, "props", T.StructType([T.StructField("k", T.LongType())]))
    rows = {r.id: r.props_parsed for r in out.collect()}
    assert rows["x"].k == 3
    assert rows["y"].k is None  # PERMISSIVE from_json: null-filled struct


def test_manifest_csv(spark, tmp_path):
    p = tmp_path / "repos.csv"
    p.write_text("base_project_url\nhttps://a.example/r1\nhttps://b.example/r2\n")
    df = read_manifest_csv(spark, str(p))
    assert df.columns == ["base_project_url"] and df.count() == 2


def test_scalars(spark):
    df = spark.createDataFrame(
        [(
            " V1.2.3 ",
            "2024-03-05T10:00:00+00:00",
            "2024-03-05 extra garbage",
            "see https://a.example/x, and www.b.example/y.",
            "git+git@github.com:Org/Repo.git",
            "https://h.example/a/b/file.json",
        )],
        "v string, d1 string, d2 string, txt string, repo string, path string",
    )
    r = df.select(
        S.normalize_version(F.col("v")).alias("nv"),
        F.date_format(S.parse_datetime_multi(F.col("d1")), "yyyy-MM-dd HH:mm").alias("p1"),
        F.date_format(S.parse_datetime_multi(F.col("d2")), "yyyy-MM-dd").alias("p2"),
        S.extract_urls(F.col("txt")).alias("urls"),
        S.repo_url_normalize(F.col("repo")).alias("nrepo"),
        S.basename(F.col("path")).alias("base"),
        S.url_is_valid(F.col("path")).alias("ok"),
        S.days_between(F.lit("2024-03-10").cast("date"), F.lit("2024-03-05").cast("date")).alias("dd"),
    ).collect()[0]
    assert r.nv == "1.2.3"
    assert r.p1 == "2024-03-05 10:00"
    assert r.p2 == "2024-03-05"  # date-prefix fallback (W002 shape)
    assert r.urls == ["https://a.example/x", "www.b.example/y"]
    assert r.nrepo == "https://github.com/org/repo"
    assert r.base == "file.json" and r.ok and r.dd == 5


def test_parse_datetime_unparseable_is_null(spark):
    df = spark.createDataFrame([("garbage",), (None,)], "d string")
    out = df.select(S.parse_datetime_multi(F.col("d")).alias("t")).collect()
    assert all(r.t is None for r in out)
