"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship quality-filter verdict query at sf0.001.
queries()      -> every implemented operator (SURVEY.md §2 + the
                  training-data-pipeline operators), (spark, sf_dir) -> DF.
oracle_sql()   -> matching ANSI SQL for the driver's DuckDB cross-check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rsmetacheck_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-rule quality verdict counts over sf0.001 documents."""
    fn, _ = REGISTRY["q07_doc_rule_hits"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
