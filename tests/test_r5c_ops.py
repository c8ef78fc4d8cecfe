"""Independent Python-reference checks for the round-5c operators
(q51 BPE apply-merge, q52 min-cost supplier, q53 excess shippers).

The DuckDB oracle proves Spark and DuckDB AGREE; these recompute the
semantics a THIRD way (plain Python over the raw parquet) so a
misunderstanding shared by both SQL formulations can't hide."""

import re
from collections import Counter, defaultdict

import duckdb
import pytest

from rsmetacheck_spark.queries import (
    _BPE_TOP, _Q53_MIN_PARTS,
    mm04_patch_grid, q51_bpe_apply_merge, q52_mincost_supplier,
    q53_excess_shippers,
)

SF = "/root/testdata/sf0.001"


def _rows(table: str, cols: str):
    return duckdb.sql(
        f"SELECT {cols} FROM read_parquet('{SF}/{table}.parquet')"
    ).fetchall()


def _toks(text: str) -> list[str]:
    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


# ---------------------------------------------------------------------------
# q51: BPE iteration two
# ---------------------------------------------------------------------------


def _bpe_reference():
    wf = Counter()
    for (text,) in _rows("documents", "text"):
        for w in _toks(text):
            if len(w) >= 2:
                wf[w] += 1
    p1 = Counter()
    for w, f in wf.items():
        for i in range(len(w) - 1):
            p1[w[i : i + 2]] += f
    merge = min(p1.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    a, b = merge[0], merge[1]
    p2 = Counter()
    for w, f in wf.items():
        out, i = [], 0
        while i < len(w):
            if i + 1 < len(w) and w[i] == a and w[i + 1] == b:
                out.append(merge)
                i += 2
            else:
                out.append(w[i])
                i += 1
        for j in range(len(out) - 1):
            p2[out[j] + " " + out[j + 1]] += f
    top = sorted(p2.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_TOP]
    return merge, top


def test_q51_matches_python_bpe(spark):
    merge, top = _bpe_reference()
    rows = q51_bpe_apply_merge(spark, SF).collect()
    assert all(r.merge == merge for r in rows)
    got = [(r.pair, r.n) for r in sorted(rows, key=lambda r: (-r.n, r.pair))]
    assert got == top


def test_q51_merge_is_greedy_single_pass(spark):
    # The merged pair itself must no longer exist as an adjacent
    # SINGLE-CHAR pair anywhere: its two chars only survive adjacent when
    # one of them is part of a DIFFERENT two-char symbol, which the
    # space-joined pair encoding distinguishes.
    merge, top = _bpe_reference()
    single_pair = f"{merge[0]} {merge[1]}"
    assert all(pair != single_pair for pair, _n in top)


# ---------------------------------------------------------------------------
# q52: min-cost supplier (TPC-H Q2 analog)
# ---------------------------------------------------------------------------


def test_q52_matches_python_argmin(spark):
    nat = {
        nk: (nn, rk)
        for nk, nn, rk in _rows("nation", "n_nationkey, n_name, n_regionkey")
    }
    europe = {
        rk for rk, rn in _rows("region", "r_regionkey, r_name") if rn == "EUROPE"
    }
    supp = {
        sk: (sn, bal, nat[nk][0])
        for sk, sn, nk, bal in _rows(
            "supplier", "s_suppkey, s_name, s_nationkey, s_acctbal"
        )
        if nat[nk][1] in europe
    }
    std_parts = {
        pk for pk, pt in _rows("part", "p_partkey, p_type") if pt == "STANDARD"
    }
    offers = {}
    for pk, sk, price in _rows(
        "lineitem", "l_partkey, l_suppkey, l_extendedprice"
    ):
        if sk not in supp:
            continue
        cents = round(price * 100)
        key = (pk, sk)
        if key not in offers or cents < offers[key]:
            offers[key] = cents
    best = {}
    for (pk, sk), cents in offers.items():
        sn, bal, nn = supp[sk]
        cand = (cents, -bal, sk, sn, nn)
        if pk not in best or cand < best[pk]:
            best[pk] = cand
    expect = sorted(
        (
            (pk, "STANDARD", c[0], c[2], c[3], c[4])
            for pk, c in best.items()
            if pk in std_parts
        ),
        key=lambda r: (r[2], r[0]),
    )[:100]
    rows = q52_mincost_supplier(spark, SF).collect()
    got = [
        (r.p_partkey, r.p_type, r.cost_cents, r.s_suppkey, r.s_name, r.n_name)
        for r in rows
    ]
    assert got == expect


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q52_plan_broadcasts_dims_no_window(spark):
    plan = _plan(q52_mincost_supplier(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "CartesianProduct" not in plan
    # the argmin is a struct MIN aggregate, not a rank window
    assert "Window" not in plan, plan[:3000]


# ---------------------------------------------------------------------------
# q53: excess shippers (TPC-H Q20 analog)
# ---------------------------------------------------------------------------


def test_q53_matches_python_reference(spark):
    promo = {
        pk for pk, pt in _rows("part", "p_partkey, p_type") if pt == "PROMO"
    }
    per = Counter()
    for pk, sk, qty, sd in _rows(
        "lineitem", "l_partkey, l_suppkey, l_quantity, l_shipdate"
    ):
        if pk in promo and sd.year == 1996:
            per[(pk, sk)] += int(qty)
    totals = defaultdict(lambda: [0, 0])
    for (pk, _sk), q in per.items():
        totals[pk][0] += q
        totals[pk][1] += 1
    n_excess = Counter()
    for (pk, sk), q in per.items():
        sum_q, n_supp = totals[pk]
        if q * n_supp > sum_q:
            n_excess[sk] += 1
    nat = {
        nk: nn for nk, nn, _rk in _rows("nation", "n_nationkey, n_name, n_regionkey")
    }
    supp = {
        sk: (sn, nat[nk])
        for sk, sn, nk in _rows("supplier", "s_suppkey, s_name, s_nationkey")
    }
    expect = {
        (sk, supp[sk][0], supp[sk][1], c)
        for sk, c in n_excess.items()
        if c >= _Q53_MIN_PARTS
    }
    rows = q53_excess_shippers(spark, SF).collect()
    got = {(r.s_suppkey, r.s_name, r.n_name, r.n_excess_parts) for r in rows}
    assert got == expect
    assert len(got) > 0, "threshold too tight: zero-row check is vacuous"


def test_q53_plan_shape(spark):
    plan = _plan(q53_excess_shippers(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# mm04: patch grid
# ---------------------------------------------------------------------------


def test_mm04_matches_python_patchify(spark):
    import hashlib

    from rsmetacheck_spark.operators.multimodal import (
        PATCH, PATCH_ROW_W, payload_hex_chain,
    )

    expect = set()
    for (doc_id,) in _rows("documents", "doc_id"):
        if doc_id % 3 != 0:
            continue
        phex, _size = payload_hex_chain(doc_id)
        b = bytes.fromhex(phex)
        ny = (len(b) // PATCH_ROW_W) // PATCH
        nx = PATCH_ROW_W // PATCH
        for gy in range(ny):
            for gx in range(nx):
                t = b"".join(
                    b[(gy * PATCH + ry) * PATCH_ROW_W + gx * PATCH:
                      (gy * PATCH + ry) * PATCH_ROW_W + gx * PATCH + PATCH]
                    for ry in range(PATCH)
                )
                expect.add((
                    doc_id, gx, gy, len(t), sum(t),
                    hashlib.md5(t.hex().encode()).hexdigest(),
                ))
    rows = mm04_patch_grid(spark, SF).collect()
    got = {
        (r.media_id, r.gx, r.gy, r.n, r.sum_bytes, r.patch_md5) for r in rows
    }
    assert got == expect
    assert len(got) > 0


def test_mm04_is_map_only(spark):
    plan = _plan(mm04_patch_grid(spark, SF))
    assert "Exchange" not in plan, f"patchify shuffles:\n{plan[:2000]}"


# ---------------------------------------------------------------------------
# q54: per-host quality cap
# ---------------------------------------------------------------------------


def test_q54_matches_python_reference(spark):
    from rsmetacheck_spark import thresholds as TH
    from rsmetacheck_spark.queries import (
        _HC_K, DOC_KEEP_LANGS, DOC_MAX_TOKENS, DOC_MIN_STOP_FRAC,
        DOC_MIN_TOKENS, q54_host_quality_cap,
    )

    stopwords = set(TH.STOPWORD_UNION)

    by_source = defaultdict(list)
    for doc_id, source, text, lang in _rows(
        "documents", "doc_id, source, text, lang"
    ):
        t = _toks(text)
        n = len(t)
        stop = round(sum(1 for x in t if x in stopwords) / max(n, 1), 6)
        alnum = len(re.sub(r"[^a-z0-9]", "", text.lower()))
        mwl = round(alnum / max(n, 1), 6)
        score = (
            (400 if DOC_MIN_TOKENS <= n <= DOC_MAX_TOKENS else 0)
            + (300 if stop >= DOC_MIN_STOP_FRAC else 0)
            + (200 if TH.MIN_MEAN_WORD_LEN <= mwl <= TH.MAX_MEAN_WORD_LEN else 0)
            + (100 if lang in DOC_KEEP_LANGS else 0)
        )
        by_source[source].append((-score, doc_id))
    expect = set()
    for source, cands in by_source.items():
        for rk, (neg, doc_id) in enumerate(sorted(cands)[:_HC_K], start=1):
            expect.add((source, rk, doc_id, -neg))
    rows = q54_host_quality_cap(spark, SF).collect()
    got = {(r.source, r.rk, r.doc_id, r.score_milli) for r in rows}
    assert got == expect


# ---------------------------------------------------------------------------
# q55: unigram surprisal
# ---------------------------------------------------------------------------


def test_q55_matches_python_reference(spark):
    from rsmetacheck_spark.queries import q55_unigram_surprisal

    freq = Counter()
    doc_toks = {}
    for doc_id, text in _rows("documents", "doc_id, text"):
        t = _toks(text)
        if t:
            doc_toks[doc_id] = t
            freq.update(t)
    n_total = sum(freq.values())
    bits = {tok: (n_total // c).bit_length() - 1 for tok, c in freq.items()}
    rows = q55_unigram_surprisal(spark, SF).collect()
    assert len(rows) == len(doc_toks)
    for r in rows:
        t = doc_toks[r.doc_id]
        sb = sum(bits[x] for x in t)
        assert (r.n_toks, r.surprisal_bits) == (len(t), sb)
        assert r.mean_bits_milli == sb * 1000 // len(t)


def test_q55_plan_broadcasts_vocab(spark):
    from rsmetacheck_spark.queries import q55_unigram_surprisal

    plan = _plan(q55_unigram_surprisal(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    # the token stream must not shuffle before the scoring join
    assert "CartesianProduct" not in plan


def test_q56_matches_python_reference(spark):
    from rsmetacheck_spark.queries import q56_bigram_surprisal

    c1 = Counter()
    c2 = Counter()
    doc_bgs = {}
    for doc_id, text in _rows("documents", "doc_id, text"):
        t = _toks(text)
        c1.update(t)
        if len(t) >= 2:
            bgs = list(zip(t, t[1:]))
            doc_bgs[doc_id] = bgs
            c2.update(bgs)
    bits = {bg: (c1[bg[0]] // c) .bit_length() - 1 for bg, c in c2.items()}
    rows = q56_bigram_surprisal(spark, SF).collect()
    assert len(rows) == len(doc_bgs)
    for r in rows:
        bgs = doc_bgs[r.doc_id]
        sb = sum(bits[b] for b in bgs)
        assert (r.n_bigrams, r.surprisal_bits) == (len(bgs), sb)
        assert r.mean_bits_milli == sb * 1000 // len(bgs)


def test_q56_bigram_bits_bounded_by_unigram(spark):
    # conditioning can only sharpen the model: for every doc the bigram
    # mean must not be wildly above the unigram mean (sanity of the
    # c2 <= c1 ratio direction; exact inequality doesn't hold per-doc,
    # but the ratio >= 1 guarantees nonnegative bits)
    from rsmetacheck_spark.queries import q56_bigram_surprisal

    rows = q56_bigram_surprisal(spark, SF).collect()
    assert all(r.surprisal_bits >= 0 for r in rows)
    assert any(r.surprisal_bits > 0 for r in rows)


def test_q57_matches_python_reference(spark):
    from rsmetacheck_spark.queries import q57_source_drift

    cs = Counter()
    c = Counter()
    for source, text in _rows("documents", "source, text"):
        for tok in _toks(text):
            cs[(source, tok)] += 1
            c[tok] += 1
    ns = Counter()
    for (source, _tok), k in cs.items():
        ns[source] += k
    n = sum(c.values())
    l1 = Counter()
    for (source, tok), k in cs.items():
        l1[source] += abs(k - (c[tok] * ns[source]) // n)
    rows = q57_source_drift(spark, SF).collect()
    assert len(rows) == len(ns)
    for r in rows:
        assert (r.n_toks, r.l1_abs) == (ns[r.source], l1[r.source])
        assert r.drift_micro == l1[r.source] * 1000000 // ns[r.source]


# ---------------------------------------------------------------------------
# g03: label propagation
# ---------------------------------------------------------------------------


def test_g03_matches_python_lpa_over_edges(spark):
    # The edge stage is sim08's (separately oracle-checked); this
    # recomputes the LP round itself in Python from those edges.
    from rsmetacheck_spark.queries import (
        _LP_SEEDS, _sim08_edges, g03_label_propagation,
    )

    edges = [(r.id_a, r.id_b) for r in _sim08_edges(spark, SF).collect()]
    nbrs = defaultdict(list)
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    node_ids = [v for (v,) in _rows("embeddings", "vec_id")]
    expect = {}
    for v in node_ids:
        seed = v % _LP_SEEDS
        if not nbrs[v]:
            expect[v] = (seed, seed, 0)
        else:
            votes = Counter(u % _LP_SEEDS for u in nbrs[v])
            lbl, nv = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
            expect[v] = (seed, lbl, nv)
    rows = g03_label_propagation(spark, SF).collect()
    got = {r.vec_id: (r.seed_lbl, r.new_lbl, r.n_votes) for r in rows}
    assert got == expect
    assert any(v[2] > 0 for v in got.values())


# ---------------------------------------------------------------------------
# st09: streaming top-k
# ---------------------------------------------------------------------------


def test_st09_matches_python_reference(spark):
    from rsmetacheck_spark.streaming.oracle_rows import (
        _ST09_K, st09_stream_topk,
    )

    counts = Counter()
    for ts, user_id in _rows("events", "ts, user_id"):
        counts[(ts.strftime("%Y-%m-%d %H:00:00"), user_id)] += 1
    per_hour = defaultdict(list)
    for (hour_s, user_id), n in counts.items():
        per_hour[hour_s].append((-n, user_id))
    expect = set()
    for hour_s, cands in per_hour.items():
        for rk, (neg, user_id) in enumerate(sorted(cands)[:_ST09_K], start=1):
            expect.add((hour_s, rk, user_id, -neg))
    rows = st09_stream_topk(spark, SF).collect()
    got = {(r.hour_s, r.rk, r.user_id, r.n) for r in rows}
    assert got == expect
