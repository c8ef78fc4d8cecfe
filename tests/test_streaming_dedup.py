"""Streaming exact dedup == batch dedup when all duplicates arrive within
the watermark horizon (the dd01 equivalence for the streaming path)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rsmetacheck_spark import synth
from rsmetacheck_spark.streaming.dedup import content_key, dedup_stream


def test_streaming_dedup_matches_batch(spark, tmp_path):
    pages = spark.createDataFrame(synth.gen_pages(300, seed=21)).select(
        "url", "warc_ts", "text"
    )
    # compress event time so every duplicate falls inside the horizon
    pages = pages.withColumn(
        "warc_ts",
        F.timestamp_seconds(F.lit(1735689600) + F.pmod(F.xxhash64("url"), 600)),
    )
    src = str(tmp_path / "src")
    # several files so the stream sees multiple micro-batches
    pages.repartition(5).write.parquet(src)

    batch_groups = pages.select(content_key("text").alias("k")).distinct().count()

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    assert got.count() == batch_groups
    # one row per content hash, and each is a genuine input row
    assert got.select("text_md5").distinct().count() == batch_groups
    urls = {r.url for r in got.select("url").collect()}
    all_urls = {r.url for r in pages.select("url").collect()}
    assert urls <= all_urls
