"""Streaming smoke: drive the windowed aggregation over the sf0.001 events
parquet as a bounded stream and check it agrees with the batch groupBy."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rsmetacheck_spark.streaming.windows import hourly_event_counts_stream

SF_DIR = "/root/testdata/sf0.001"


def test_stream_matches_batch(spark, tmp_path):
    import shutil

    # the file-stream source requires a directory, the fixture is one file
    src_dir = str(tmp_path / "events_src")
    os.makedirs(src_dir)
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), src_dir)
    src = src_dir
    # parquet TIMESTAMP loads as TIMESTAMP_NTZ; watermarks need TimestampType
    # (session TZ is UTC, so the cast keeps wall-clock semantics)
    batch = spark.read.parquet(src).withColumn("ts", F.col("ts").cast("timestamp"))
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        hourly_event_counts_stream(stream)
        .writeStream.outputMode("complete")
        .format("memory").queryName("hourly_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.hour_s, r.event_type): (r.n, round(r.sum_value, 6))
        for r in spark.sql("SELECT * FROM hourly_out").collect()
    }
    want = {
        (r.hour_s, r.event_type): (r.n, round(r.sum_value, 6))
        for r in (
            batch.groupBy(
                F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_s"),
                "event_type",
            )
            .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
            .collect()
        )
    }
    assert got == want and len(got) > 10
