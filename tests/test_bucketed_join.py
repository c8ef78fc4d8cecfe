"""Bucketed-table contract: two tables bucketed the same way on the
same key must join and aggregate with ZERO Exchange — the write-once
shuffle that amortizes over every recurring fact-fact join at 100 TB
(signature-table probes, band-index lookups, incremental dedup)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from rsmetacheck_spark.sources.tables import write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = tempfile.mkdtemp(prefix="bucketed_")
    feats = docs.selectExpr("doc_id", "n_chars", "lang")
    scores = docs.selectExpr("doc_id", "length(text) AS n_text", "source")
    write_bucketed(feats, "t_feats", os.path.join(base, "feats"), "doc_id")
    write_bucketed(scores, "t_scores", os.path.join(base, "scores"), "doc_id")
    yield docs
    spark.sql("DROP TABLE IF EXISTS t_feats")
    spark.sql("DROP TABLE IF EXISTS t_scores")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_same_bucket_join_has_zero_exchange(spark, bucketed):
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_feats").join(spark.table("t_scores"), "doc_id")
        plan = _plan(j)
        assert "Exchange" not in plan, plan[:3000]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:2000]
        # bucket-sorted inputs: the SMJ needs no per-task sort of the scan
        assert j.count() == bucketed.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_bucket_key_aggregation_has_zero_exchange(spark, bucketed):
    agg = spark.table("t_feats").groupBy("doc_id").agg(
        F.sum("n_chars").alias("s")
    )
    plan = _plan(agg)
    assert "Exchange" not in plan, plan[:3000]
    assert agg.count() == bucketed.count()


def test_unbucketed_join_does_exchange(spark, bucketed):
    """Control: the same join through plain parquet reads DOES shuffle —
    proving the zero-Exchange plans above come from the bucketing
    metadata, not from data size or AQE."""
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = bucketed
        a = docs.selectExpr("doc_id", "n_chars")
        b = docs.selectExpr("doc_id", "length(text) AS n_text")
        plan = _plan(a.join(b, "doc_id"))
        assert "Exchange" in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
