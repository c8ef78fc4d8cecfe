"""Parity must hold for any seed, not just the tuned fixture (seed-42
overfitting guard)."""

from __future__ import annotations

from rsmetacheck_spark import synth
from rsmetacheck_spark import thresholds as TH
from rsmetacheck_spark.oracle import oracle_labels
from rsmetacheck_spark.plans.pipeline import run_pipeline


def test_parity_alt_seed(spark):
    pages_pdf = synth.gen_pages(250, seed=777)
    res = run_pipeline(spark.createDataFrame(pages_pdf).select("url", "warc_ts", "html"))
    got = res.pages_out.toPandas().set_index("url").sort_index()
    want = oracle_labels(pages_pdf).set_index("url").sort_index()
    assert (got["keep"] == want["keep"]).all()
    assert (got["scrubbed_text"] == want["scrubbed_text"]).all()
    hits = {
        rule: [f["hit"] for row in got["findings"] for f in row if f["rule"] == rule]
        for rule, _ in TH.RULES
    }
    for rule, _sev in TH.RULES:
        assert hits[rule] == list(want[f"hit_{rule}"]), rule
