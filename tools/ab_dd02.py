"""A/B the dd02 MinHash formulations in ONE session (VERDICT r2 item 6).

BENCH_r01's dd02=10.58s ran the OLD formulation at 16 hashes / 4 bands;
BENCH_r02's 16.08s ran the NEW formulation at 128 hashes / 16 bands — the
cross-round comparison conflated a formulation change with an 8x parameter
upgrade. This tool measures, same JVM, reps>=3 best-of:

  A. new formulation (exploded one-md5 + affine-perm MIN aggregates),
     production params 128/16       <- what BENCH_r02 measured
  B. old formulation (nested array lambdas, NUM_HASHES md5 per shingle),
     same 128/16                    <- formulation change, params held
  C. new formulation, round-1 params 16/4
                                    <- param change, formulation held

Usage: python tools/ab_dd02.py [--sf /root/testdata/sf0.1] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def old_formulation(spark: SparkSession, sf: str, num_hashes: int,
                    num_bands: int) -> DataFrame:
    """Round-1 dd02 (git 6dd4099): per-shingle md5 for EVERY permutation
    inside nested array lambdas, .cache() instead of scratch parquet."""
    from rsmetacheck_spark.queries import (
        _SHINGLES_SPARK, _TOKS_SPARK, JACCARD_T, _t,
    )

    rows = num_hashes // num_bands
    d = _t(spark, sf, "documents")
    toks = _TOKS_SPARK.format(c="text")
    sh = (
        d.selectExpr("doc_id", f"{toks} AS t")
        .selectExpr("doc_id", f"{_SHINGLES_SPARK.format(t='t')} AS sh")
        .filter(F.expr("size(sh) > 0"))
        .cache()
    )
    sig = sh.selectExpr(
        "doc_id", "sh",
        f"transform(sequence(0, {num_hashes - 1}),"
        f" i -> array_min(transform(sh, s -> md5(concat(cast(i AS string), '|', s))))) AS sig",
    )
    bands = sig.selectExpr(
        "doc_id",
        f"explode(transform(sequence(0, {num_bands - 1}),"
        f" b -> concat(cast(b AS string), ':',"
        f" md5(concat_ws('|', slice(sig, b * {rows} + 1, {rows}))))))"
        " AS band_key",
    ).cache()
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    sa = sh.selectExpr("doc_id AS id_a", "sh AS sh_a")
    sb = sh.selectExpr("doc_id AS id_b", "sh AS sh_b")
    return (
        cand.join(sa, "id_a").join(sb, "id_b")
        .selectExpr(
            "id_a", "id_b",
            "round(size(array_intersect(sh_a, sh_b)) * CAST(1.0 AS DOUBLE)"
            " / size(array_distinct(concat(sh_a, sh_b))), 6) AS jaccard",
        )
        .filter(F.col("jaccard") >= JACCARD_T)
    )


def run(fn, reps: int) -> tuple[float, int]:
    best = float("inf")
    n = -1
    for _ in range(reps):
        t0 = time.time()
        n = fn().count()
        best = min(best, time.time() - t0)
    return best, n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from rsmetacheck_spark.session import get_spark

    spark = get_spark("ab_dd02", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    import rsmetacheck_spark.functions.hashing as H
    import rsmetacheck_spark.queries as Q

    def new_at(nh: int, nb: int):
        H.NUM_HASHES, H.NUM_BANDS = nh, nb
        H.ROWS_PER_BAND = nh // nb
        Q._CKPT_CACHE.clear()  # fresh scratch per variant
        return Q.dd02_minhash_lsh_pairs(spark, args.sf)

    results = {}
    t, n = run(lambda: new_at(128, 16), args.reps)
    results["A_new_128x16"] = (t, n)
    t, n = run(lambda: new_at(16, 4), args.reps)
    results["C_new_16x4"] = (t, n)

    def old_at(nh, nb):
        spark.catalog.clearCache()  # drop prior variant's .cache()
        return old_formulation(spark, args.sf, nh, nb)

    # one rep only at 128x16: the nested-lambda variant is interpreted
    # per element and expected to be very slow there
    t, n = run(lambda: old_at(128, 16), 1)
    results["B_old_128x16_1rep"] = (t, n)
    t, n = run(lambda: old_at(16, 4), args.reps)
    results["D_old_16x4"] = (t, n)

    for k, (t, n) in results.items():
        print(f"{k:22s} {t:8.2f} s   {n} pairs")


if __name__ == "__main__":
    main()
