"""Reference-style table-driven micro-fixtures per rule (the model of
/root/reference tests, e.g. test_p001.py:13-77: missing/empty/boundary
cases + result-structure invariants). Pure Python — no Spark session."""

from __future__ import annotations

import pandas as pd
import pytest

from rsmetacheck_spark import thresholds as TH
from rsmetacheck_spark.functions.pytext import text_stats
from rsmetacheck_spark.operators.extract import extract_text, html_unescape
from rsmetacheck_spark.operators.scrub import scrub_text
from rsmetacheck_spark.oracle import doc_rule_hits
from rsmetacheck_spark.synth import html_escape, render_html

CLEAN = ("the house and the river are near the old bridge and the water "
         "is clear in the morning when the light is soft ") * 5


def hits(text=CLEAN, url="https://ok.example/x", ts="2025-01-01",
         lang="en", ppl=5.0, pii=None):
    return doc_rule_hits(text, url, pd.Timestamp(ts), lang, ppl, pii or {})


@pytest.mark.parametrize("text,expected", [
    ("", True),                          # empty -> too short
    ("word " * (TH.MIN_WORDS - 1), True),
    ("word " * TH.MIN_WORDS, False),     # boundary: exactly MIN is ok
    ("word " * TH.MAX_WORDS, False),     # boundary: exactly MAX is ok
    ("word " * (TH.MAX_WORDS + 1), True),
])
def test_doc_length_boundaries(text, expected):
    assert hits(text=text)["R001_doc_length"] is expected


@pytest.mark.parametrize("n_sym,expected", [(0, False), (11, False), (12, True)])
def test_symbol_ratio_boundary(n_sym, expected):
    # n_sym '#' tokens among 100+n_sym words: ratio = n/(100+n); >0.1 at n=12
    text = "word " * 100 + "# " * n_sym
    s = text_stats(text)
    assert (s["sym_ratio"] > TH.MAX_SYMBOL_RATIO) is expected


def test_stopword_fraction():
    assert hits(text="table chair stone metal glass " * 30)["R003_stopword_fraction"]
    assert not hits()["R003_stopword_fraction"]


@pytest.mark.parametrize("text,expected", [
    ("a a a a a " * 20, True),              # mean len 1 < 2
    ("extraordinarily " * 60, True),        # mean len 16 > 12
    (CLEAN, False),
])
def test_mean_word_length(text, expected):
    assert hits(text=text)["R004_mean_word_length"] is expected


def test_dup_ngram_fraction():
    assert hits(text="the cat sat on the mat " * 40)["R005_dup_ngram_fraction"]
    varied = " ".join(f"w{i} x{i*7%13} y{i*31%97}" for i in range(60))
    assert not hits(text=varied)["R005_dup_ngram_fraction"]
    assert text_stats("one two")["dup_ngram_frac"] == 0.0  # < n tokens


@pytest.mark.parametrize("phrase", TH.BOILERPLATE_PHRASES)
def test_boilerplate_each_phrase(phrase):
    assert hits(text=CLEAN + " " + phrase.upper())["R006_boilerplate_phrase"]


def test_bullet_and_ellipsis():
    bullets = "\n".join("- item" for _ in range(10))
    assert text_stats(bullets)["bullet_frac"] == 1.0
    dots = "\n".join("loading..." for _ in range(10))
    assert text_stats(dots)["ellipsis_frac"] == 1.0
    assert text_stats("a… line…")["ellipsis_frac"] == 1.0  # unicode …


@pytest.mark.parametrize("lang,expected", [
    ("en", False), ("de", False), ("fr", False), ("es", False),
    ("zz", True), ("xx", True), ("", True),
])
def test_langid_keepset(lang, expected):
    assert hits(lang=lang)["R009_langid"] is expected


@pytest.mark.parametrize("ppl,expected", [
    (TH.MAX_LOG_PPL, False), (TH.MAX_LOG_PPL + 0.001, True), (0.0, False),
])
def test_perplexity_boundary(ppl, expected):
    assert hits(ppl=ppl)["R010_perplexity"] is expected


@pytest.mark.parametrize("url,expected", [
    ("https://ads.example/page", True),
    ("https://spam.example/", True),
    ("https://ok.example/ads.example", False),  # host, not substring
    ("not-a-url", False),
])
def test_host_blocklist(url, expected):
    assert hits(url=url)["R014_host_blocklist"] is expected


def test_freshness_boundary():
    assert hits(ts="2024-02-29 23:59:59")["R015_freshness"]
    assert not hits(ts="2024-03-01 00:00:00")["R015_freshness"]


# --- scrub -----------------------------------------------------------------

@pytest.mark.parametrize("text,token,n", [
    ("mail me at a.b+c@ex-ample.org now", "[EMAIL]", 1),
    ("ssn 123-45-6789 ok", "[ID]", 1),
    ("call 555-123-4567 or (555) 321-7654", "[PHONE]", 2),
    ("id 123-45-6789 and 987-65-4321", "[ID]", 2),
    ("no pii here", "", 0),
])
def test_scrub_patterns(text, token, n):
    scrubbed, counts = scrub_text(text)
    assert sum(counts.values()) == n
    if n:
        assert scrubbed.count(token) == n


def test_scrub_order_email_before_phone():
    # digits inside an email must be consumed by the EMAIL pattern
    scrubbed, counts = scrub_text("x 555-123-4567@mail.example.com y")
    assert counts["pii_email"] == 1 and counts["pii_phone"] == 0


def test_scrub_idempotent():
    once, _ = scrub_text("a@b.co and 123-45-6789")
    twice, counts = scrub_text(once)
    assert once == twice and sum(counts.values()) == 0


# --- extraction ------------------------------------------------------------

@pytest.mark.parametrize("text", [
    "plain text",
    "amp & lt < gt > mixed",
    "already &amp; escaped &lt;entities&gt;",
    "multi\n\npara &\n\nthird <p> fake tag",
    "",
])
def test_escape_roundtrip(text):
    assert html_unescape(html_escape(text)) == text
    assert extract_text(render_html(text)) == text


def test_stats_structure_invariant():
    # verdict-structure invariant (test_p001.py:230-240 pattern)
    for text in ("", "x", CLEAN):
        s = text_stats(text)
        assert set(s) == {
            "n_words", "n_tokens", "sym_ratio", "stop_frac", "mean_word_len",
            "dup_ngram_frac", "bullet_frac", "ellipsis_frac",
        }
        h = hits(text=text)
        assert set(h) == {r for r, _ in TH.RULES}
        assert all(isinstance(v, bool) for v in h.values())
