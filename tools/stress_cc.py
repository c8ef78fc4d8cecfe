"""200x duplicate-cluster stress A/B: large-star/small-star vs min-label.

Rebuilds the round-3 stress corpus (sf0.1 documents replicated 200x with
per-copy text prefixes -> 1M docs in 200-member near-dup clusters), runs
dd02's MinHash+LSH pair generation ONCE, then labels the SAME pair graph
with both CC formulations:

  star      operators/cc.py largestar_components (round 4)
  minlabel  the round-3 min-label propagation loop (reproduced here for
            the controlled comparison; rounds = component diameter)

and verifies the two label sets are identical. Results go to
BENCH/BASELINE.md's stress section.

    python tools/stress_cc.py [--copies 200]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from rsmetacheck_spark.operators.cc import largestar_components  # noqa: E402
from rsmetacheck_spark.session import get_spark  # noqa: E402


def build_corpus(spark, copies: int) -> str:
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n = base.count()
    out = tempfile.mkdtemp(prefix="stress_docs_")
    (
        base.crossJoin(spark.range(copies).withColumnRenamed("id", "copy"))
        .selectExpr(
            f"copy * {n} + doc_id AS doc_id",
            "concat('copy', copy, ' ', text) AS text",
            "lang", "source",
            # prefix = 'copy' + digits + ' ' = 5 + len(str(copy)) chars
            "n_chars + 5 + length(CAST(copy AS STRING)) AS n_chars",
        )
        .repartition(32)
        .write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    )
    return out


def scratch_ckpt(df: DataFrame, tag: str) -> DataFrame:
    path = tempfile.mkdtemp(prefix=f"stress_ckpt_{tag}_")
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def minlabel(pairs: DataFrame, max_rounds: int = 60) -> tuple[DataFrame, int]:
    """Round-3 formulation: min-label propagation, rounds = diameter."""
    edges = scratch_ckpt(
        pairs.selectExpr("id_a AS src", "id_b AS dst")
        .unionByName(pairs.selectExpr("id_b AS src", "id_a AS dst")),
        "ml_edges",
    )
    labels = edges.selectExpr("src AS doc_id").distinct().selectExpr(
        "doc_id", "doc_id AS rep"
    )
    for rnd in range(max_rounds):
        prop = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("rep").alias("nbr_rep"))
        )
        new_labels = scratch_ckpt(
            labels.join(prop, "doc_id", "left").selectExpr(
                "doc_id", "least(rep, coalesce(nbr_rep, rep)) AS rep"
            ),
            f"ml_{rnd}",
        )
        changed = (
            new_labels.alias("n").join(labels.alias("o"), "doc_id")
            .filter(F.col("n.rep") != F.col("o.rep")).count()
        )
        labels = new_labels
        if changed == 0:
            return labels.selectExpr("doc_id", "rep AS group_rep"), rnd + 1
    raise RuntimeError("minlabel did not converge")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=200)
    args = ap.parse_args()

    spark = get_spark("stress_cc", cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    sf_dir = build_corpus(spark, args.copies)
    t_build = time.time() - t0

    from rsmetacheck_spark.queries import dd02_minhash_lsh_pairs

    t0 = time.time()
    pairs = scratch_ckpt(
        dd02_minhash_lsh_pairs(spark, sf_dir).select("id_a", "id_b"), "pairs"
    )
    n_pairs = pairs.count()
    t_dd02 = time.time() - t0

    stats: dict = {}
    t0 = time.time()
    star = scratch_ckpt(
        largestar_components(pairs, scratch_ckpt, stats_out=stats), "star"
    )
    n_star = star.count()
    t_star = time.time() - t0

    t0 = time.time()
    ml, ml_rounds = minlabel(pairs)
    ml = scratch_ckpt(ml, "ml")
    n_ml = ml.count()
    t_ml = time.time() - t0

    diff = star.exceptAll(ml).count() + ml.exceptAll(star).count()
    print(json.dumps({
        "copies": args.copies,
        "build_sec": round(t_build, 1),
        "dd02_pairs": n_pairs,
        "dd02_sec": round(t_dd02, 1),
        "star": {"labels": n_star, "sec": round(t_star, 1),
                 "rounds": stats.get("rounds")},
        "minlabel": {"labels": n_ml, "sec": round(t_ml, 1),
                     "rounds": ml_rounds},
        "label_diff_rows": diff,
    }))


if __name__ == "__main__":
    main()
