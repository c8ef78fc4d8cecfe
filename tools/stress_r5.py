"""200x stress run for the round-5 operators (dd09/q35/q36/km01).

Rebuilds the round-3/4 stress corpus (sf0.1 documents replicated 200x
with per-copy text prefixes -> 1M docs) plus a 200x embeddings table
(100k vectors, per-copy deterministic perturbation), then times each
round-5 operator at that scale and prints row counts + wall times.

dd09 is run twice: at the test-scale m=8192 (saturated by 500k keys —
the demonstration that m must scale with n) and at m=2^24, where the
measured FP rate should approach the analytic (1 - e^(-kn/m))^k.

Usage:
    python tools/stress_r5.py [--copies 200]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rsmetacheck_spark.session import get_spark  # noqa: E402
from rsmetacheck_spark import queries as Q  # noqa: E402


def build_corpus(spark, copies: int) -> str:
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n = docs.count()
    out = tempfile.mkdtemp(prefix="stress_r5_")
    (
        docs.crossJoin(spark.range(copies).withColumnRenamed("id", "copy"))
        .selectExpr(
            f"copy * {n} + doc_id AS doc_id",
            "concat('copy', copy, ' ', text) AS text",
            "lang", "source",
            # prefix is 'copy' + digits + ' ' = 5 + len(str(copy)) chars,
            # keeping n_chars == length(text) like the real synth corpus
            "n_chars + 5 + length(CAST(copy AS STRING)) AS n_chars",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    m = emb.count()
    (
        emb.crossJoin(spark.range(copies).withColumnRenamed("id", "copy"))
        .selectExpr(
            f"copy * {m} + vec_id AS vec_id",
            # deterministic per-copy perturbation keeps vectors distinct
            "transform(embedding, x -> CAST(x + copy * 0.001 AS float))"
            " AS embedding",
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "embeddings.parquet"))
    )
    return out


def timed(label: str, fn):
    t0 = time.time()
    result = fn()
    print(f"{label}: {result} rows in {time.time() - t0:.1f}s", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=200)
    args = ap.parse_args()

    spark = get_spark("stress_r5", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    sf = build_corpus(spark, args.copies)
    print(f"corpus built in {time.time() - t0:.1f}s at {sf}", flush=True)

    timed("q35_salted_source_stats",
          lambda: Q.q35_salted_source_stats(spark, sf).count())
    timed("q36_binned_quantiles",
          lambda: Q.q36_binned_quantiles(spark, sf).count())
    timed("km01_kmeans_iteration",
          lambda: Q.km01_kmeans_iteration(spark, sf).count())
    timed("dc01_distinct_sketch",
          lambda: Q.dc01_distinct_sketch(spark, sf).count())
    timed("q37_bigram_coverage",
          lambda: Q.q37_bigram_coverage(spark, sf).count())
    timed("sim07_pq_adc_topk",
          lambda: Q.sim07_pq_adc_topk(spark, sf).count())

    # dd09 at test-scale m: saturated filter (every probe bit set)
    t0 = time.time()
    df = Q.dd09_bloom_prefilter(spark, sf)
    agg = df.agg(
        F.count("*").alias("n"),
        F.sum(F.col("bloom_hit").cast("long")).alias("hits"),
        F.sum(F.col("is_fp").cast("long")).alias("fps"),
        F.sum(F.col("actual").cast("long")).alias("members"),
    ).collect()[0]
    print(
        f"dd09 m={Q._BLOOM_M}: n={agg['n']} hits={agg['hits']} "
        f"fp={agg['fps']} members={agg['members']} "
        f"({time.time() - t0:.1f}s) — expected saturated", flush=True,
    )

    # dd09 at production-sized m: FP rate should approach analytic
    m_big, orig = 1 << 24, Q._BLOOM_M
    Q._BLOOM_M = m_big
    try:
        t0 = time.time()
        agg = Q.dd09_bloom_prefilter(spark, sf).agg(
            F.count("*").alias("n"),
            F.sum(F.col("is_fp").cast("long")).alias("fps"),
            F.sum(F.col("actual").cast("long")).alias("members"),
        ).collect()[0]
        # n for the analytic rate = DISTINCT keys actually inserted (the
        # existing side has exact-duplicate groups, so its distinct md5
        # count is below its row count)
        n_keys = (
            spark.read.parquet(os.path.join(sf, "documents.parquet"))
            .filter("doc_id % 2 = 0")
            .selectExpr("md5(lower(trim(text))) AS h")
            .distinct().count()
        )
        analytic = (1 - math.exp(-Q._BLOOM_K * n_keys / m_big)) ** Q._BLOOM_K
        denom = max(agg["n"] - agg["members"], 1)
        print(
            f"dd09 m=2^24: n={agg['n']} fp={agg['fps']} "
            f"rate={agg['fps'] / denom:.2e} analytic~{analytic:.2e} "
            f"({time.time() - t0:.1f}s)", flush=True,
        )
    finally:
        Q._BLOOM_M = orig


if __name__ == "__main__":
    main()
