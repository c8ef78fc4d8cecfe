"""Production entry point (north_rule launch shape):

    spark-submit --py-files rsmetacheck_spark.zip main.py \
        --input  <pages parquet/Iceberg path> \
        --output <output dir/table prefix>    \
        [--resume] [--snapshot <id>]

Reads the pages table, runs the quality-filter pipeline, writes
pages_out / metrics / lineage / host_metrics (+ per-doc JSON reports),
prints the summary JSON. With --resume, processes only buckets missing
from the output checkpoint (streaming/incremental.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--snapshot", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from rsmetacheck_spark.operators.metrics import host_metrics_table
    from rsmetacheck_spark.operators.report import per_doc_reports, summary_report
    from rsmetacheck_spark.plans.pipeline import materialize, read_pages
    from rsmetacheck_spark.session import get_spark
    from rsmetacheck_spark.sources.tables import write_table
    from rsmetacheck_spark.streaming.incremental import read_resumed, resume_materialize

    spark = get_spark("rsmetacheck_main", cores=args.cpus)
    pages = read_pages(spark, args.input)
    snapshot = args.snapshot or f"input:{args.input}"

    if args.resume:
        resume_materialize(spark, pages, args.output)
        pages_out = read_resumed(spark, args.output)
        from rsmetacheck_spark.operators.metrics import (
            lineage_table,
            rule_metrics_table,
        )
        metrics = rule_metrics_table(pages_out)
        write_table(metrics, os.path.join(args.output, "metrics"))
        write_table(lineage_table(pages_out, snapshot), os.path.join(args.output, "lineage"))
    else:
        res = materialize(spark, pages, args.output, input_snapshot=snapshot)
        pages_out, metrics = res.pages_out, res.metrics

    write_table(host_metrics_table(pages_out), os.path.join(args.output, "host_metrics"))
    write_table(
        per_doc_reports(pages_out),
        os.path.join(args.output, "reports"),
        partition_by=("bucket",),
    )
    total = pages_out.count()
    kept = pages_out.filter("keep").count()
    print(summary_report(metrics, total, kept))


if __name__ == "__main__":
    main()
