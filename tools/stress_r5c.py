"""200x stress run for the round-5c operators.

Documents-table ops (q51 BPE apply-merge, q54 host cap, q55/q56
surprisal, mm04 patchify) run at ~1M docs; q54's salted two-phase is
re-proved against the naive single-window formulation AT SCALE. The
TPC-H analogs (q52/q53) run against a 20x-replicated lineitem (~12M
rows) with the original dims — replication multiplies offer rows per
(part, supplier), which is exactly the stress a bigger cluster sees.

Usage:
    python tools/stress_r5c.py [--copies 200] [--li-copies 20]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from rsmetacheck_spark.session import get_spark  # noqa: E402
from rsmetacheck_spark import queries as Q  # noqa: E402
from rsmetacheck_spark import thresholds as TH  # noqa: E402
from stress_r5 import build_corpus, timed  # noqa: E402

SRC = "/root/testdata/sf0.1"


def build_tpch(spark, copies: int) -> str:
    """lineitem x copies (shifted orderkeys, same part/supp keys);
    dims copied verbatim."""
    out = tempfile.mkdtemp(prefix="stress_r5c_tpch_")
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    n = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    (
        li.crossJoin(spark.range(copies).withColumnRenamed("id", "copy"))
        .selectExpr(
            f"copy * {n} + l_orderkey AS l_orderkey",
            "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "lineitem.parquet"))
    )
    for t in ("part", "supplier", "nation", "region", "orders", "customer"):
        shutil.copy(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=200)
    ap.add_argument("--li-copies", type=int, default=20)
    args = ap.parse_args()

    spark = get_spark("stress_r5c", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    sf = build_corpus(spark, args.copies)
    n_docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).count()
    print(f"corpus built in {time.time() - t0:.1f}s at {sf} ({n_docs} docs)",
          flush=True)

    timed("q51_bpe_apply_merge", lambda: Q.q51_bpe_apply_merge(spark, sf).count())
    timed("q55_unigram_surprisal",
          lambda: Q.q55_unigram_surprisal(spark, sf).count())
    timed("q56_bigram_surprisal",
          lambda: Q.q56_bigram_surprisal(spark, sf).count())
    timed("mm04_patch_grid", lambda: Q.mm04_patch_grid(spark, sf).count())

    # q54: salted two-phase host cap == naive single-window cap at 1M
    t0 = time.time()
    salted = Q.q54_host_quality_cap(spark, sf)
    f = Q._doc_feats(spark, sf)
    s = f.selectExpr(
        "source", "doc_id",
        f"CAST((CASE WHEN n_tokens BETWEEN {Q.DOC_MIN_TOKENS} AND {Q.DOC_MAX_TOKENS} THEN 400 ELSE 0 END)"
        f" + (CASE WHEN stop_frac >= {Q.DOC_MIN_STOP_FRAC} THEN 300 ELSE 0 END)"
        f" + (CASE WHEN mean_word_len BETWEEN {TH.MIN_MEAN_WORD_LEN} AND {TH.MAX_MEAN_WORD_LEN} THEN 200 ELSE 0 END)"
        f" + (CASE WHEN lang IN {Q.DOC_KEEP_LANGS!r} THEN 100 ELSE 0 END) AS INT) AS score_milli",
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("score_milli"), F.asc("doc_id")
    )
    naive = (
        s.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= Q._HC_K)
        .selectExpr("source", "CAST(rk AS INT) AS rk", "doc_id", "score_milli")
    )
    diff = salted.exceptAll(naive).count() + naive.exceptAll(salted).count()
    print(f"q54 salted-vs-naive at {n_docs}: rows={salted.count()} "
          f"diff={diff} ({time.time() - t0:.1f}s)", flush=True)
    assert diff == 0

    t0 = time.time()
    tp = build_tpch(spark, args.li_copies)
    n_li = spark.read.parquet(os.path.join(tp, "lineitem.parquet")).count()
    print(f"tpch built in {time.time() - t0:.1f}s at {tp} ({n_li} lineitems)",
          flush=True)
    timed("q52_mincost_supplier",
          lambda: Q.q52_mincost_supplier(spark, tp).count())
    timed("q53_excess_shippers", lambda: Q.q53_excess_shippers(spark, tp).count())


if __name__ == "__main__":
    main()
