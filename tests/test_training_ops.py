"""Independent Python-reference checks for the training-pipeline ops.

The DuckDB oracle proves Spark and DuckDB AGREE; these tests recompute
q32/q33 semantics a THIRD way (plain Python over the raw parquet) so a
misunderstanding shared by both SQL formulations can't hide."""

import hashlib
import re

import duckdb
import pytest

from rsmetacheck_spark.queries import (
    _PACK_CAP, _SPLIT_TRAIN, _SPLIT_VAL,
    q32_pack_assignments, q33_split_assign,
)

SF = "/root/testdata/sf0.001"


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


@pytest.fixture(scope="module")
def docs():
    return duckdb.sql(
        f"SELECT doc_id, source, text FROM read_parquet('{SF}/documents.parquet')"
        " ORDER BY doc_id"
    ).fetchall()


def test_q32_matches_sequential_reference(spark, docs):
    # sequential single-stream packing per source, straight from the spec
    expect = {}
    offset: dict = {}
    for doc_id, source, text in docs:  # already doc_id-ordered
        n = len(_tokens(text))
        start = offset.get(source, 0)
        offset[source] = start + n
        if n > 0:
            expect[doc_id] = (
                n, start // _PACK_CAP, (start + n - 1) // _PACK_CAP,
            )
    got = {
        r.doc_id: (r.n_tokens, r.first_seq, r.last_seq)
        for r in q32_pack_assignments(spark, SF).collect()
    }
    assert got == expect


def test_q32_stream_is_gapless(spark):
    # within a source, doc i+1 starts exactly where doc i ended: the
    # implied start offsets reconstruct one contiguous token stream
    rows = sorted(
        q32_pack_assignments(spark, SF).collect(),
        key=lambda r: (r.source, r.doc_id),
    )
    # n_seqs consistency on every row
    assert all(r.n_seqs == r.last_seq - r.first_seq + 1 for r in rows)


def test_q33_matches_hash_reference(spark, docs):
    expect: dict = {}
    for doc_id, source, text in docs:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 1000
        split = ("train" if h < _SPLIT_TRAIN
                 else "val" if h < _SPLIT_VAL else "test")
        n_docs, n_toks = expect.get((source, split), (0, 0))
        expect[(source, split)] = (n_docs + 1, n_toks + len(_tokens(text)))
    got = {
        (r.source, r.split): (r.n_docs, r.n_tokens)
        for r in q33_split_assign(spark, SF).collect()
    }
    assert got == expect


def test_q33_split_fractions(spark):
    rows = q33_split_assign(spark, SF).collect()
    total = sum(r.n_docs for r in rows)
    train = sum(r.n_docs for r in rows if r.split == "train")
    assert total == 500
    # md5 is uniform: 90% +- a generous small-sample band
    assert 0.84 <= train / total <= 0.96


def test_sim06_quantization_quality(spark):
    """int8 max-abs quantization must preserve the neighborhood: the
    quantized top-10 overlaps the exact float top-10 heavily, and the
    approximate cosines sit within the per-axis quantization error."""
    from rsmetacheck_spark.queries import sim01_ann_topk, sim06_quantized_topk

    exact = {r.vec_id: r.cos_sim for r in sim01_ann_topk(spark, SF).collect()}
    quant = {r.vec_id: r.approx_cos
             for r in sim06_quantized_topk(spark, SF).collect()}
    overlap = len(set(exact) & set(quant))
    assert overlap >= 8, (sorted(exact), sorted(quant))
    for vid in set(exact) & set(quant):
        assert abs(exact[vid] - quant[vid]) < 0.02, (vid, exact[vid], quant[vid])


def test_q34_matches_python_re(spark, docs):
    """BPE-ish pretokenizer counts recomputed with Python re (third
    implementation, catches a shared Spark/DuckDB regex misreading)."""
    from rsmetacheck_spark.queries import _BPE_RX, q34_bpe_token_stats

    rx = re.compile(_BPE_RX)
    expect: dict = {}
    for _doc_id, source, text in docs:
        n_docs, bpe, ws = expect.get(source, (0, 0, 0))
        expect[source] = (
            n_docs + 1, bpe + len(rx.findall(text)), ws + len(_tokens(text)),
        )
    got = {
        r.source: (r.n_docs, r.bpe_tokens, r.ws_tokens)
        for r in q34_bpe_token_stats(spark, SF).collect()
    }
    assert got == {k: v for k, v in expect.items() if v[2] > 0}


def test_sim06_rescore_flips_int8_order(spark):
    """Planted adversarial vector: 63 tiny components (0.003) that int8
    max-abs quantization rounds to ZERO but that carry real cosine mass
    against a query weighted 0.3 on those axes. The int8 screen therefore
    ranks the adversarial vector BELOW a plain unit vector (identical
    quantized codes; the adversary's slightly larger float norm lowers
    its rescaled approx_cos); the exact rescore restores the true order.
    Asserts the rescore stage actually re-decides the ordering rather
    than echoing the screen."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rsmetacheck_spark.queries import ANN_K, _sim06_screen, sim06_quantized_topk

    dim = 64
    query = np.full(dim, 0.3)
    query[0] = 1.0
    plain = np.zeros(dim)          # vec 1: quantizes losslessly
    plain[0] = 1.0
    adv = np.full(dim, 0.003)      # vec 2: eps mass -> quantized to 0
    adv[0] = 1.0
    fillers = []                   # clearly-worse tail so top-k is full
    for i in range(12):
        f = np.zeros(dim)
        f[2 + i] = -1.0            # cos < 0 against the query
        fillers.append(f)
    vecs = [query, plain, adv] + fillers
    d = tempfile.mkdtemp(prefix="sim06_adv_sf_")
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32).tolist() for v in vecs],
                pa.list_(pa.float32()),
            ),
        }),
        os.path.join(d, "embeddings.parquet"),
    )
    screen = _sim06_screen(spark, d, ANN_K).collect()
    rescored = sim06_quantized_topk(spark, d).collect()
    # int8-only order: plain (1) first; exact rescore: adversary (2) first
    assert screen[0].vec_id == 1, [(r.vec_id, r.approx_cos) for r in screen]
    assert rescored[0].vec_id == 2, [(r.vec_id, r.exact_cos) for r in rescored]
    assert rescored[1].vec_id == 1
    ec = [r.exact_cos for r in rescored]
    assert ec == sorted(ec, reverse=True)


def test_q38_matches_bfd_reference(spark, docs):
    """BFD recomputed a third way (plain Python over the raw parquet)."""
    from rsmetacheck_spark.queries import _PACK_CAP, _PACK_SHARD, q38_binpack_bfd

    groups: dict = {}
    for doc_id, source, text in docs:
        n = len(_tokens(text))
        if n > 0:
            groups.setdefault((source, doc_id // _PACK_SHARD), []).append(
                (n, doc_id)
            )
    expect = {}
    for _key, its in groups.items():
        rem: list = []
        for n, doc_id in sorted(its, key=lambda t: (-t[0], t[1])):
            if n > _PACK_CAP:
                expect[doc_id] = (n, -1, -1)
                continue
            fits = [(r, j) for j, r in enumerate(rem) if r >= n]
            if not fits:
                expect[doc_id] = (n, len(rem), 0)
                rem.append(_PACK_CAP - n)
            else:
                _, j = min(fits)
                expect[doc_id] = (n, j, _PACK_CAP - rem[j])
                rem[j] -= n
    got = {
        r.doc_id: (r.n_tokens, r.bin_id, r.bin_off)
        for r in q38_binpack_bfd(spark, SF).collect()
    }
    assert got == expect


def test_q38_bins_are_valid_and_tight(spark):
    """Structural packing invariants: bins never exceed the cap, doc
    intervals within a bin are disjoint and contiguous-from-zero, and
    BFD stays within the ceil(total/cap) lower bound x2 (BFD's
    asymptotic guarantee is 11/9 OPT + 4)."""
    import math

    from rsmetacheck_spark.queries import _PACK_CAP, q38_binpack_bfd

    rows = [r for r in q38_binpack_bfd(spark, SF).collect() if r.bin_id >= 0]
    bins: dict = {}
    for r in rows:
        bins.setdefault((r.source, r.shard, r.bin_id), []).append(
            (r.bin_off, r.n_tokens)
        )
    group_tokens: dict = {}
    group_bins: dict = {}
    for (source, shard, bin_id), items in bins.items():
        items.sort()
        used = 0
        for off, nt in items:
            assert off == used, (source, shard, bin_id, items)
            used += nt
        assert used <= _PACK_CAP
        group_tokens[(source, shard)] = group_tokens.get((source, shard), 0) + used
        group_bins[(source, shard)] = group_bins.get((source, shard), 0) + 1
    for key, total in group_tokens.items():
        lower = math.ceil(total / _PACK_CAP)
        assert lower <= group_bins[key] <= 2 * lower, (key, total, group_bins[key])


def test_dd10_matches_span_reference(spark, docs):
    """Duplicate-span coverage recomputed a third way: plain-Python gram
    df + interval union over the raw parquet."""
    from rsmetacheck_spark.queries import _SPAN_W, dd10_span_coverage

    grams: dict = {}
    doc_starts: dict = {}
    for doc_id, _source, text in docs:
        t = _tokens(text)
        if len(t) < _SPAN_W:
            continue
        starts = {}
        for s in range(len(t) - _SPAN_W + 1):
            g = " ".join(t[s:s + _SPAN_W])
            starts[s] = g
            grams.setdefault(g, set()).add(doc_id)
        doc_starts[doc_id] = (len(t), starts)
    expect = {}
    for doc_id, (n, starts) in doc_starts.items():
        hit = sorted(s for s, g in starts.items() if len(grams[g]) >= 2)
        if not hit:
            continue
        covered, n_sh = 0, len(hit)
        cur_start, cur_end = hit[0], hit[0] + _SPAN_W - 1
        for s in hit[1:]:
            if s > cur_end:
                covered += cur_end - cur_start + 1
                cur_start, cur_end = s, s + _SPAN_W - 1
            else:
                cur_end = max(cur_end, s + _SPAN_W - 1)
        covered += cur_end - cur_start + 1
        expect[doc_id] = (n, covered, n_sh, covered * 1000000 // n)
    top = sorted(expect.items(), key=lambda kv: (-kv[1][3], kv[0]))[:50]
    got = [
        (r.doc_id, (r.n_tokens, r.covered_tokens, r.n_shared_grams,
                    r.dup_cov_micro))
        for r in dd10_span_coverage(spark, SF).collect()
    ]
    assert got == top
