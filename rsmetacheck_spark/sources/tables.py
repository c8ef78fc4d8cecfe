"""Table layer: Iceberg when a catalog is configured, parquet-with-manifest
otherwise (SURVEY §7 risk list: "if the runtime lacks an Iceberg catalog
jar, the table layer must degrade to parquet ... without changing the
pipeline API").

The sandbox image has no Iceberg jars, so `iceberg_available()` is False
here and all writes go through the parquet shim; the API (read_table /
write_table / snapshot id) is what the pipeline codes against.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark.conf.get("spark.sql.catalog.spark_catalog")
        jvm_ok = "Iceberg" in str(
            spark.conf.get("spark.sql.extensions", "")
        )
        return jvm_ok
    except Exception:
        return False


def write_table(
    df: DataFrame, path: str, mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> str:
    """Write + stamp a manifest (snapshot id = wall-clock ns); returns it."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    snapshot = f"snap-{time.time_ns()}"
    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump({"snapshot": snapshot, "partition_by": list(partition_by)}, fh)
    return snapshot


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_table_pruned(spark: SparkSession, path: str, **eq_filters) -> DataFrame:
    """Read a table with equality filters that PRUNE at the source.

    For hive-style partition columns (the write_table partition_by
    layout) the predicate lands in the scan's `PartitionFilters`, so
    non-matching directories are never listed or opened — at 100 TB a
    `lang=en` read of a lang-partitioned corpus touches only that
    partition's files. For data columns the same predicate reaches
    `PushedFilters` (parquet row-group stats). Callers don't need to
    know which kind a column is; Catalyst routes each predicate to the
    right side. tests/test_partition_pruning.py asserts both routes on
    the physical plan AND on the actual file list."""
    df = spark.read.parquet(path)
    for col, val in eq_filters.items():
        df = df.filter(df[col] == val)
    return df


def write_bucketed(
    df: DataFrame, table: str, path: str, key: str,
    buckets: int = 8, sort: bool = True,
) -> None:
    """Bucketed write: rows co-locate by hash(key) into a fixed bucket
    count, so a join or aggregation keyed on `key` between tables with
    the SAME bucketing needs NO Exchange — the shuffle was paid once at
    write time and amortizes over every subsequent query. This is the
    100 TB pattern for fact-fact joins that recur (near-dup pair
    verification against a signature table, incremental-dedup probes
    against a band index): bucket both sides at ingest, join shuffle-
    free forever after. sortBy(key) additionally pre-sorts within each
    bucket so sort-merge joins skip their sort. Requires saveAsTable
    (bucketing metadata lives in the catalog, not the parquet files);
    the explicit path keeps data placement under caller control.
    tests/test_bucketed_join.py asserts the zero-Exchange plan."""
    w = (
        df.write.format("parquet").mode("overwrite")
        .option("path", path).bucketBy(buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, "_manifest.json")) as fh:
        return json.load(fh)


def testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
