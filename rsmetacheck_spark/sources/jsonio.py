"""Semi-structured JSON ingestion (S3 scan shape, SURVEY §2.1):
schema-enforced JSON reads where a malformed document never kills the run —
it lands in `_corrupt_record` and is skipped+counted, mirroring the
reference's per-file try/except-continue (detect_pitfalls_main.py:316-318,
378-383). Also the S8 CSV-manifest reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT = "_corrupt_record"


def read_json_docs(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """(good_rows, corrupt_rows). PERMISSIVE mode: bad lines -> CORRUPT."""
    full = T.StructType(list(schema.fields) + [T.StructField(CORRUPT, T.StringType())])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT)
        .json(path)
    )
    # Spark requires caching a PERMISSIVE read before filtering on the
    # corrupt-record column (referencing only CORRUPT is disallowed raw)
    df = df.cache()
    good = df.filter(F.col(CORRUPT).isNull()).drop(CORRUPT)
    bad = df.filter(F.col(CORRUPT).isNotNull()).select(CORRUPT)
    return good, bad


def parse_json_column(df: DataFrame, col: str, schema: T.StructType) -> DataFrame:
    """from_json over an embedded JSON string column (events.props shape);
    unparseable values yield null structs, never task failures."""
    return df.withColumn(f"{col}_parsed", F.from_json(F.col(col), schema))


def read_manifest_csv(spark: SparkSession, path: str) -> DataFrame:
    """S8: header CSV manifest (data/repositories.csv shape)."""
    return spark.read.option("header", True).csv(path)
