"""Round-6 optimization measurement harness (bench.py is FROZEN for
driver measurement; all r6 working numbers come from here).

Times individual registry queries with the same methodology as bench.py
(`fn(spark, sf_dir).count()`, alphabetical order so shared scratch
checkpoints are attributed identically) plus optional:
  - noop-sink isolation (guide §1.4): df.write.format("noop") computes
    every column, separating compute cost from the count() shortcut
  - .explain("formatted") capture into plans/r06/<q>_<tag>.txt

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf1.0 \
      --queries dd03_jaccard_pairs sim08_mutual_knn --reps 2 \
      --explain-tag before --noop
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", nargs="*", default=None,
                    help="subset (default: every registry entry)")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--noop", action="store_true",
                    help="also time a noop-sink write (full column compute)")
    ap.add_argument("--explain-tag", default=None,
                    help="write plans/r06/<q>_<tag>.txt explain('formatted')")
    args = ap.parse_args()

    from rsmetacheck_spark.queries import REGISTRY
    from rsmetacheck_spark.session import get_spark

    names = args.queries or sorted(REGISTRY)
    names = sorted(names)
    spark = get_spark(f"bx{args.cpus}", cores=args.cpus,
                      shuffle_partitions=max(args.cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for name in names:
        fn, _sql = REGISTRY[name]
        if args.explain_tag:
            os.makedirs("plans/r06", exist_ok=True)
        rec: dict[str, object] = {}
        times = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            n = fn(spark, args.sf_dir).count()
            times.append(round(time.time() - t0, 2))
            rec["rows"] = n
        rec["count_sec"] = times
        if args.noop:
            spark.sparkContext.setJobDescription(f"{name} noop")
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            rec["noop_sec"] = round(time.time() - t0, 2)
        if args.explain_tag:
            path = os.path.join("plans", "r06", f"{name}_{args.explain_tag}.txt")
            with open(path, "w") as fh:
                fh.write(fn(spark, args.sf_dir)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        spark.sparkContext.setJobDescription(None)
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print("TOTALJSON " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
