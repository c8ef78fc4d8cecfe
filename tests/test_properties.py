"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5 notes it has none): the invariants that must hold for
ARBITRARY input, not just the table-driven fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from rsmetacheck_spark.functions.pytext import text_stats, tokenize
from rsmetacheck_spark.operators.extract import extract_text, html_unescape
from rsmetacheck_spark.operators.scrub import scrub_text
from rsmetacheck_spark.synth import html_escape, render_html

TEXT = st.text(max_size=400)


@given(TEXT)
@settings(max_examples=300, deadline=None)
def test_escape_unescape_inverse(s):
    assert html_unescape(html_escape(s)) == s


@given(TEXT)
@settings(max_examples=300, deadline=None)
def test_render_extract_byte_identical(s):
    assert extract_text(render_html(s)) == s
    assert extract_text(render_html(s)).encode() == s.encode()


@given(TEXT)
@settings(max_examples=300, deadline=None)
def test_scrub_idempotent_and_shrinking_pii(s):
    once, counts = scrub_text(s)
    twice, counts2 = scrub_text(once)
    assert twice == once
    assert sum(counts2.values()) == 0


@given(TEXT)
@settings(max_examples=300, deadline=None)
def test_stats_total_and_bounds(s):
    st_ = text_stats(s)
    toks = tokenize(s)
    assert st_["n_tokens"] == len(toks)
    assert 0.0 <= st_["stop_frac"] <= 1.0
    assert 0.0 <= st_["dup_ngram_frac"] <= 1.0
    assert 0.0 <= st_["bullet_frac"] <= 1.0
    assert st_["mean_word_len"] >= 0.0
    assert st_["n_words"] >= 0
    # token chars never exceed total chars
    assert sum(map(len, toks)) <= max(len(s), 1)
