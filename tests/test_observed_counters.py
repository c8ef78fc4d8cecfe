"""Observed-during-write counters must equal sink-derived counts."""
import tempfile

from rsmetacheck_spark import synth
from rsmetacheck_spark.plans.pipeline import materialize


def test_observed_counters_match_sink(spark):
    pages = spark.createDataFrame(synth.gen_pages(200, seed=5)).select(
        "url", "warc_ts", "html"
    )
    res = materialize(spark, pages, tempfile.mkdtemp(prefix="obs_"))
    assert res.observed is not None
    assert res.observed["n_docs"] == res.pages_out.count()
    assert res.observed["n_keep"] == res.pages_out.filter("keep").count()
    assert res.observed["n_model_errors"] == res.pages_out.filter(
        "model_error IS NOT NULL"
    ).count()


def test_observed_counters_empty_input(spark):
    pages = spark.createDataFrame(
        [], "url string, warc_ts string, html binary"
    )
    res = materialize(spark, pages, tempfile.mkdtemp(prefix="obs_"))
    assert res.observed == {"n_docs": 0, "n_keep": 0, "n_model_errors": 0}
