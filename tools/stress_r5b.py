"""200x stress run for the round-5b documents-table operators
(q39/q40/q41/q43/q44/q45): times each at ~1M docs and, for the
two-formulation operators, re-proves the scale-shaped plan against the
naive formulation AT SCALE (the sf0.01 oracle proves semantics; this
proves the salted/binned decompositions stay exact when the hot groups
are 200x bigger).

Usage:
    python tools/stress_r5b.py [--copies 200]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from rsmetacheck_spark.session import get_spark  # noqa: E402
from rsmetacheck_spark import queries as Q  # noqa: E402
from stress_r5 import build_corpus, timed  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=200)
    args = ap.parse_args()

    spark = get_spark("stress_r5b", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    sf = build_corpus(spark, args.copies)
    n_docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).count()
    print(f"corpus built in {time.time() - t0:.1f}s at {sf} ({n_docs} docs)",
          flush=True)

    timed("q40_sentence_stats", lambda: Q.q40_sentence_stats(spark, sf).count())
    timed("q41_bpe_merge_pairs", lambda: Q.q41_bpe_merge_pairs(spark, sf).count())
    timed("q44_stopword_df", lambda: Q.q44_stopword_df(spark, sf).count())

    # q39: salted two-phase bottom-k == naive single-window bottom-k at 1M
    t0 = time.time()
    salted = Q.q39_bottomk_sample(spark, sf)
    d = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    naive = (
        d.selectExpr("source", "doc_id", "md5(CAST(doc_id AS STRING)) AS h")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= Q._BK_K)
        .selectExpr("source", "CAST(rk AS INT) AS rk", "doc_id", "h")
    )
    diff = salted.exceptAll(naive).count() + naive.exceptAll(salted).count()
    print(f"q39 salted-vs-naive at {n_docs}: rows={salted.count()} "
          f"diff={diff} ({time.time() - t0:.1f}s)", flush=True)
    assert diff == 0

    # q43: binned two-phase global rank == naive global ROW_NUMBER at 1M
    t0 = time.time()
    binned = Q.q43_global_rank(spark, sf)
    wn = Window.orderBy("n_chars", "doc_id")
    naive43 = (
        d.select("doc_id", "n_chars")
        .withColumn("rnk", F.row_number().over(wn).cast("long"))
    )
    diff = binned.exceptAll(naive43).count() + naive43.exceptAll(binned).count()
    print(f"q43 binned-vs-naive at {n_docs}: diff={diff} "
          f"({time.time() - t0:.1f}s)", flush=True)
    assert diff == 0

    # q45: salted sort-merge join == naive join at 1M (hot key = every
    # source is 200x bigger; the salt spreads each over 8 reducers)
    t0 = time.time()
    salted45 = Q.q45_salted_join(spark, sf)
    dim = (
        d.groupBy("source").agg(F.sum("n_chars").alias("tot"))
        .withColumn(
            "src_rank",
            F.row_number().over(
                Window.orderBy(F.desc("tot"), F.asc("source"))
            ).cast("long"),
        )
        .select("source", "src_rank")
    )
    naive45 = (
        d.join(dim, "source")
        .filter(F.col("doc_id") % Q._SJ_SAMPLE == 0)
        .select("doc_id", "source", "src_rank")
    )
    diff = (salted45.exceptAll(naive45).count()
            + naive45.exceptAll(salted45).count())
    print(f"q45 salted-vs-naive at {n_docs}: rows={salted45.count()} "
          f"diff={diff} ({time.time() - t0:.1f}s)", flush=True)
    assert diff == 0


if __name__ == "__main__":
    main()
