"""200x stress for q38 BFD bin packing (round-5 late addition).

Reuses stress_r5's corpus builder (sf0.1 documents replicated 200x ->
1M docs) and times the grouped-map packing at that scale. The group
count grows ~4000x vs sf0.1 while every group stays <= ~256 docs — the
claim under test is that the Arrow grouped-map stage scales with group
COUNT, not group size.

Usage:
    python tools/stress_q38.py [--copies 200]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsmetacheck_spark.session import get_spark  # noqa: E402
from rsmetacheck_spark import queries as Q  # noqa: E402
from tools.stress_r5 import build_corpus  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=200)
    args = ap.parse_args()

    spark = get_spark("stress_q38", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    sf = build_corpus(spark, args.copies)
    print(f"corpus built in {time.time() - t0:.1f}s at {sf}", flush=True)

    t0 = time.time()
    df = Q.q38_binpack_bfd(spark, sf)
    n = df.count()
    wall = time.time() - t0
    t0 = time.time()
    n_bins = df.filter("bin_id >= 0").selectExpr(
        "source", "shard", "bin_id"
    ).distinct().count()
    print(
        f"q38_binpack_bfd: {n} rows, {n_bins} bins in {wall:.1f}s "
        f"(+{time.time() - t0:.1f}s bin count)", flush=True,
    )


if __name__ == "__main__":
    main()
