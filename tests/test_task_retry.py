"""Task-retry determinism: a task that FAILS ONCE and is retried must
not change the pipeline's output — at 100 TB stragglers and retries are
constant background noise, so every stage has to be retry-invariant
(idempotent Arrow stage, deterministic rules, no state leaking across
attempts).

Local mode fails fast by default (maxFailures=1), so the retry session
runs in a SUBPROCESS with master local[4,2]; the injected fault raises
in the model stage's input partition exactly once (first attempt of
partition 0, tracked via a marker file), then the retried run completes
and its verdict table must equal a clean run's byte-for-byte."""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

SCRIPT = r"""
import os, sys, tempfile
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from rsmetacheck_spark import synth
from rsmetacheck_spark.plans.pipeline import verdict_plan

marker = sys.argv[1]
inject = sys.argv[2] == "1"

spark = (
    SparkSession.builder.master("local[4, 2]")
    .appName("retry_probe")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

pages = spark.createDataFrame(synth.gen_pages(120, seed=13)).select(
    "url", "warc_ts", "html"
).repartition(4)

if inject:
    # fail partition 0's first attempt INSIDE the distributed stage:
    # the marker file (shared fs, local mode) makes the fault one-shot
    def fail_once(it):
        from pyspark import TaskContext

        tc = TaskContext.get()
        if tc.partitionId() == 0 and not os.path.exists(marker):
            open(marker, "w").write("failed-once")
            raise RuntimeError("injected one-time task failure")
        yield from it

    pages = pages.rdd.mapPartitions(fail_once).toDF(pages.schema)

out = verdict_plan(pages).selectExpr(
    "url", "keep", "lang_pred", "md5(coalesce(scrubbed_text, '')) AS text_md5"
).orderBy("url")
for row in out.collect():
    print("ROW", row.url, row.keep, row.lang_pred, row.text_md5)
assert (not inject) or os.path.exists(marker), "fault was never injected"
spark.stop()
"""


def _run(inject: bool) -> list[str]:
    marker = os.path.join(tempfile.mkdtemp(prefix="retry_"), "failed")
    script = SCRIPT.format(repo=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    p = subprocess.run(
        [sys.executable, "-c", script, marker, "1" if inject else "0"],
        capture_output=True, text=True, timeout=420,
    )
    assert p.returncode == 0, p.stderr[-3000:]
    rows = [l for l in p.stdout.splitlines() if l.startswith("ROW ")]
    assert len(rows) == 120, (len(rows), p.stderr[-1000:])
    if inject:
        assert os.path.exists(marker), "injected fault never fired"
    return rows


def test_retried_run_is_byte_identical():
    clean = _run(inject=False)
    retried = _run(inject=True)
    assert clean == retried
