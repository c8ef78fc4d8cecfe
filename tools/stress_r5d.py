"""200x stress run for the round-5d/5e operators.

Documents-table ops (q61 Gopher repetition, q63 BPE trainer, dd16
source overlap) run at ~1M docs; q62 runs over a user-shifted
replicated events table (~9M events, per-user streams intact); the
TPC-H analogs (q58/q59/q64/q65/q66) run against lineitem AND orders
replicated with a CONSISTENT orderkey shift (~12M lineitems, ~3M
orders) so the fact-fact joins stay referentially intact while every
customer/supplier key gets copies x hotter — exactly the skew a bigger
cluster sees.

Usage:
    python tools/stress_r5d.py [--copies 200] [--ev-copies 30] [--li-copies 20]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rsmetacheck_spark.session import get_spark  # noqa: E402
from rsmetacheck_spark import queries as Q  # noqa: E402
from stress_r5 import build_corpus, timed  # noqa: E402

SRC = "/root/testdata/sf0.1"


def build_events(spark, copies: int) -> str:
    """events x copies with SHIFTED user ids — each copy is a new cohort
    of users with the original per-user event streams, so LAG windows
    and transition structure are preserved while the shuffle grows."""
    out = tempfile.mkdtemp(prefix="stress_r5d_ev_")
    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    n_user = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
    cols = [c for c in ev.columns if c not in ("event_id", "user_id")]
    (
        ev.crossJoin(spark.range(copies).withColumnRenamed("id", "copy"))
        .selectExpr(
            f"copy * {n_ev} + event_id AS event_id",
            f"copy * {n_user} + user_id AS user_id",
            *cols,
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "events.parquet"))
    )
    return out


def build_tpch(spark, copies: int) -> str:
    """lineitem AND orders x copies under the SAME orderkey shift (the
    fact-fact join key stays referentially intact); cust/supp/part keys
    unchanged, so every dim key becomes copies x hotter."""
    out = tempfile.mkdtemp(prefix="stress_r5d_tpch_")
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    n = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
    li_cols = [c for c in li.columns if c != "l_orderkey"]
    (
        li.crossJoin(spark.range(copies).withColumnRenamed("id", "copy"))
        .selectExpr(f"copy * {n} + l_orderkey AS l_orderkey", *li_cols)
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "lineitem.parquet"))
    )
    o_cols = [c for c in o.columns if c != "o_orderkey"]
    (
        o.crossJoin(spark.range(copies).withColumnRenamed("id", "copy"))
        .selectExpr(f"copy * {n} + o_orderkey AS o_orderkey", *o_cols)
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "orders.parquet"))
    )
    for t in ("part", "supplier", "nation", "region", "customer"):
        shutil.copy(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=200)
    ap.add_argument("--ev-copies", type=int, default=30)
    ap.add_argument("--li-copies", type=int, default=20)
    args = ap.parse_args()

    spark = get_spark("stress_r5d", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    sf = build_corpus(spark, args.copies)
    n_docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).count()
    print(f"corpus built in {time.time() - t0:.1f}s at {sf} ({n_docs} docs)",
          flush=True)

    timed("q61_gopher_repetition",
          lambda: Q.q61_gopher_repetition(spark, sf).count())
    timed("q63_bpe_train3", lambda: Q.q63_bpe_train3(spark, sf).count())
    timed("dd16_source_overlap",
          lambda: Q.dd16_source_overlap(spark, sf).count())
    timed("dd17_source_containment",
          lambda: Q.dd17_source_containment(spark, sf).count())
    timed("q67_packing_efficiency",
          lambda: Q.q67_packing_efficiency(spark, sf).count())
    timed("q69_epoch_plan", lambda: Q.q69_epoch_plan(spark, sf).count())
    timed("q72_rule_ablation", lambda: Q.q72_rule_ablation(spark, sf).count())
    timed("dd18_canonical_dedup",
          lambda: Q.dd18_canonical_dedup(spark, sf).count())

    t0 = time.time()
    ev = build_events(spark, args.ev_copies)
    n_ev = spark.read.parquet(os.path.join(ev, "events.parquet")).count()
    print(f"events built in {time.time() - t0:.1f}s at {ev} ({n_ev} events)",
          flush=True)
    timed("q62_event_transitions",
          lambda: Q.q62_event_transitions(spark, ev).count())

    t0 = time.time()
    tp = build_tpch(spark, args.li_copies)
    n_li = spark.read.parquet(os.path.join(tp, "lineitem.parquet")).count()
    print(f"tpch built in {time.time() - t0:.1f}s at {tp} ({n_li} lineitems)",
          flush=True)
    timed("q58_order_count_distribution",
          lambda: Q.q58_order_count_distribution(spark, tp).count())
    timed("q59_waiting_suppliers",
          lambda: Q.q59_waiting_suppliers(spark, tp).count())
    timed("q64_top_suppliers", lambda: Q.q64_top_suppliers(spark, tp).count())
    timed("q65_nation_volume", lambda: Q.q65_nation_volume(spark, tp).count())
    timed("q66_part_supplier_counts",
          lambda: Q.q66_part_supplier_counts(spark, tp).count())
    timed("q68_disjunctive_revenue",
          lambda: Q.q68_disjunctive_revenue(spark, tp).count())
    timed("q70_priority_semi", lambda: Q.q70_priority_semi(spark, tp).count())
    timed("q71_local_supplier_volume",
          lambda: Q.q71_local_supplier_volume(spark, tp).count())


if __name__ == "__main__":
    main()
