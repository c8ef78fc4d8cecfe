"""Independent Python-reference checks for the round-5b operators
(q39 bottom-k sample, q40 sentence stats, dd13 containment, st06
streaming quantiles).

The DuckDB oracle proves Spark and DuckDB AGREE; these recompute the
semantics a THIRD way (plain Python over the raw parquet) so a
misunderstanding shared by both SQL formulations can't hide."""

import hashlib
import re
from collections import defaultdict

import duckdb
import pytest

from rsmetacheck_spark.queries import (
    _BK_K, _CONT_T, _QBIN_W,
    dd13_containment, q39_bottomk_sample, q40_sentence_stats,
    q36_binned_quantiles,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return duckdb.sql(
        "SELECT doc_id, source, text, lang, n_chars"
        f" FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
    ).fetchall()


def _toks(text: str) -> list[str]:
    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


def test_q39_matches_python_reference(spark, docs):
    by_source = defaultdict(list)
    for doc_id, source, _t, _l, _n in docs:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        by_source[source].append((h, doc_id))
    expect = set()
    for source, hs in by_source.items():
        for rk, (h, doc_id) in enumerate(sorted(hs)[:_BK_K], start=1):
            expect.add((source, rk, doc_id, h))
    rows = q39_bottomk_sample(spark, SF).collect()
    assert {(r.source, r.rk, r.doc_id, r.h) for r in rows} == expect


def test_q39_reproducible_across_runs(spark):
    # bottom-k sampling's selling point: identical selection on rerun
    a = {tuple(r) for r in q39_bottomk_sample(spark, SF).collect()}
    b = {tuple(r) for r in q39_bottomk_sample(spark, SF).collect()}
    assert a == b and len(a) > 0


def _sentences(text: str) -> list[str]:
    # Spark trim()/DuckDB trim() strip SPACES only — mimic exactly
    return [s for s in (p.strip(" ") for p in re.split(r"[.!?]+", text)) if s]


def test_q40_matches_python_reference(spark, docs):
    agg = defaultdict(lambda: [0, 0, 0, 0])  # n_docs, n_sents, max_sents, sum_chars
    for _id, source, text, _l, _n in docs:
        sents = _sentences(text)
        a = agg[source]
        a[0] += 1
        a[1] += len(sents)
        a[2] = max(a[2], len(sents))
        a[3] += sum(len(s) for s in sents)
    rows = q40_sentence_stats(spark, SF).collect()
    assert len(rows) == len(agg)
    for r in rows:
        n_docs, n_sents, max_sents, sum_chars = agg[r.source]
        assert (r.n_docs, r.n_sents, r.max_sents) == (n_docs, n_sents, max_sents)
        expect_milli = sum_chars * 1000 // n_sents if n_sents else 0
        assert r.mean_sent_chars_milli == expect_milli


def test_dd13_containment_math(spark, docs):
    # recompute containment from raw DISTINCT token sets for every
    # returned pair (the candidate stage is covered by dd02's oracle row)
    txt = {doc_id: text for doc_id, _s, text, _l, _n in docs}
    rows = dd13_containment(spark, SF).collect()
    assert rows, "candidate set should produce at least one pair"
    for r in rows:
        sa, sb = set(_toks(txt[r.id_a])), set(_toks(txt[r.id_b]))
        inter = len(sa & sb)
        assert (r.inter, r.n_a, r.n_b) == (inter, len(sa), len(sb))
        assert r.cont_a_micro == inter * 1000000 // len(sa)
        assert r.cont_b_micro == inter * 1000000 // len(sb)
        assert max(r.cont_a_micro, r.cont_b_micro) >= _CONT_T


def test_st06_constants_sync_with_q36():
    from rsmetacheck_spark.streaming.oracle_rows import _ST_QBIN_W

    assert _ST_QBIN_W == _QBIN_W


def test_st06_stream_equals_q36_batch(spark):
    from rsmetacheck_spark.streaming.oracle_rows import st06_stream_quantiles

    got = {tuple(r) for r in st06_stream_quantiles(spark, SF).collect()}
    want = {tuple(r) for r in q36_binned_quantiles(spark, SF).collect()}
    assert got == want and len(got) > 0
