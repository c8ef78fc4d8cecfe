"""End-to-end CLI surface (reference cli.py:8-38 parity analog):
multi-valued --input, --threshold overrides, --rules subset,
--pitfalls-output, --analysis-output. Drives main.main() in-process
against synthetic pages parquet."""

import json
import os
import tempfile

import pytest

import main as cli_main
from rsmetacheck_spark import synth
from rsmetacheck_spark import thresholds as TH


@pytest.fixture()
def th_restore():
    saved = {
        n: getattr(TH, n)
        for n in dir(TH)
        if n.isupper() and not n.startswith("_")
    }
    yield
    for n, v in saved.items():
        setattr(TH, n, v)
    # _apply_threshold_overrides exports into os.environ for executor
    # imports; leaving it set leaks the override into every later
    # get_spark / subprocess in this pytest process (an
    # EXECUTOR_CONSUMED name would trip session.py's fresh-session
    # RuntimeError in an unrelated test)
    os.environ.pop("RSMC_THRESHOLD_OVERRIDES", None)


@pytest.fixture(scope="module")
def pages_parquet(spark):
    return synth.spark_pages_parquet(spark, 300, seed=11)


def _run(pages_parquet, *extra):
    out = tempfile.mkdtemp(prefix="cli_out_")
    cli_main.main([
        "--input", pages_parquet, "--output", out, "--cpus", "8", *extra,
    ])
    return out


def test_cli_default_run(spark, pages_parquet, th_restore):
    out = _run(pages_parquet)
    summary = json.load(open(os.path.join(out, "analysis_results.json")))
    assert summary["total_docs"] == 300
    assert 0 < summary["kept"] < 300
    assert len(summary["rules"]) == 15
    assert os.path.isdir(os.path.join(out, "reports"))
    assert os.path.isdir(os.path.join(out, "metrics"))


def test_cli_multi_input_union(spark, pages_parquet, th_restore):
    # nargs='+' AND a repeated flag must both accumulate (action='extend');
    # the default argparse store action silently discards earlier --input
    out = _run(pages_parquet, "--input", pages_parquet, pages_parquet)
    summary = json.load(open(os.path.join(out, "analysis_results.json")))
    assert summary["total_docs"] == 900  # three inputs unioned


def test_cli_rules_subset(spark, pages_parquet, th_restore):
    out = _run(pages_parquet, "--rules", "R001_doc_length,R014_host_blocklist")
    summary = json.load(open(os.path.join(out, "analysis_results.json")))
    assert sorted(r["rule"] for r in summary["rules"]) == [
        "R001_doc_length", "R014_host_blocklist",
    ]
    # fewer drop rules => keep rate can only rise vs the full registry
    assert summary["kept"] >= 0


def test_cli_threshold_override_changes_keeps(spark, pages_parquet, th_restore):
    base = json.load(open(os.path.join(
        _run(pages_parquet), "analysis_results.json")))
    # drastically relax R001's lower bound -> strictly more docs survive it
    loose = json.load(open(os.path.join(
        _run(pages_parquet, "--threshold", "MIN_WORDS=1"),
        "analysis_results.json")))
    r001 = {r["rule"]: r["hits"] for r in base["rules"]}["R001_doc_length"]
    r001_loose = {r["rule"]: r["hits"] for r in loose["rules"]}["R001_doc_length"]
    assert r001_loose < r001
    assert loose["kept"] > base["kept"]


def test_cli_threshold_unknown_name_fails_fast(spark, pages_parquet, th_restore):
    with pytest.raises(SystemExit):
        _run(pages_parquet, "--threshold", "NOT_A_THRESHOLD=1")


def test_cli_rules_unknown_rule_fails_fast(spark, pages_parquet, th_restore):
    with pytest.raises(SystemExit):
        _run(pages_parquet, "--rules", "R999_nope")


def test_cli_output_path_flags(spark, pages_parquet, th_restore):
    pit = tempfile.mkdtemp(prefix="cli_pit_")
    ana = os.path.join(tempfile.mkdtemp(prefix="cli_ana_"), "s.json")
    out = _run(
        pages_parquet, "--pitfalls-output", pit, "--analysis-output", ana,
    )
    assert json.load(open(ana))["total_docs"] == 300
    # reports went to the override dir, not <output>/reports
    assert any(os.scandir(pit))
    assert not os.path.exists(os.path.join(out, "reports"))


def test_skip_extract_equivalence(spark, th_restore):
    """The --skip-extract path must produce EXACTLY the verdicts of the
    html path when fed that path's own extracted text (the reference's
    --skip-somef contract: analysis of pre-extracted outputs == analysis
    after extraction)."""
    from rsmetacheck_spark.plans.pipeline import materialize

    spark_pages = spark.createDataFrame(
        synth.gen_pages(200, seed=13)
    ).select("url", "warc_ts", "html")
    out1 = materialize(spark, spark_pages, tempfile.mkdtemp(prefix="ske1_"))
    pre = out1.pages_out.selectExpr("url", "warc_ts", "extracted_text AS text")
    out2 = materialize(
        spark, pre, tempfile.mkdtemp(prefix="ske2_"), text_input=True
    )
    cols = (
        "url", "lang_pred", "log_ppl", "keep", "scrubbed_text",
        "to_json(findings) AS fj", "bucket",
    )
    a = out1.pages_out.selectExpr(*cols).orderBy("url").collect()
    b = out2.pages_out.selectExpr(*cols).orderBy("url").collect()
    assert a == b


def test_cli_skip_extract_flag(spark, pages_parquet, th_restore):
    # build a pre-extracted text table from the html corpus via the
    # library path, then drive the CLI over it with --skip-extract
    from rsmetacheck_spark.plans.pipeline import materialize, read_pages

    res = materialize(
        spark, read_pages(spark, pages_parquet), tempfile.mkdtemp(prefix="skc_")
    )
    text_dir = tempfile.mkdtemp(prefix="sk_text_") + "/pages"
    res.pages_out.selectExpr(
        "url", "warc_ts", "extracted_text AS text"
    ).write.parquet(text_dir)
    out = _run(text_dir, "--skip-extract")
    summary = json.load(open(os.path.join(out, "analysis_results.json")))
    from rsmetacheck_spark.operators.report import summary_report

    base = json.loads(summary_report(
        res.metrics, res.pages_out.count(),
        res.pages_out.filter("keep").count(),
    ))
    assert summary == base


def test_cli_threshold_reaches_executors(pages_parquet, th_restore):
    """PII_PATTERNS is compiled at scrub-module import INSIDE worker
    processes — a driver-only setattr can't reach it (the round-4 review
    finding). The env-var propagation must: overriding the email pattern
    to match any vowel has to make R011 fire on ~every doc (default ~8/300).
    Runs main.py as a real subprocess so module import order matches the
    spark-submit launch shape."""
    import subprocess
    import sys

    out = tempfile.mkdtemp(prefix="cli_exec_")
    ana = os.path.join(out, "s.json")
    cmd = [
        sys.executable, "main.py", "--input", pages_parquet,
        "--output", out, "--cpus", "8", "--analysis-output", ana,
        "--threshold", "PII_PATTERNS=(('pii_email','[aeiou]','*'),)",
    ]
    p = subprocess.run(
        cmd, capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert p.returncode == 0, p.stderr[-2000:]
    summary = json.load(open(ana))
    hits = {r["rule"]: r["hits"] for r in summary["rules"]}
    assert hits["R011_pii_email"] > 250, hits


def test_resume_with_skip_extract(spark, pages_parquet, th_restore):
    """A resumed --skip-extract run must process the text payload, not
    crash selecting the absent html column (round-4 review finding)."""
    from rsmetacheck_spark.plans.pipeline import materialize, read_pages
    from rsmetacheck_spark.streaming.incremental import (
        read_resumed, resume_materialize,
    )

    res = materialize(
        spark, read_pages(spark, pages_parquet), tempfile.mkdtemp(prefix="rse_")
    )
    pre = res.pages_out.selectExpr("url", "warc_ts", "extracted_text AS text")
    out = tempfile.mkdtemp(prefix="rse_out_")
    resume_materialize(spark, pre, out, text_input=True)
    resumed = read_resumed(spark, out)
    assert resumed.count() == res.pages_out.count()
    assert (resumed.filter("keep").count()
            == res.pages_out.filter("keep").count())
