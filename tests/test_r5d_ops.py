"""Independent Python-reference checks for the round-5d operators
(q58 order-count distribution, q59 waiting suppliers, q60 idle rich
customers, q61 Gopher repetition, q62 event transitions, q63 three-step
BPE trainer).

The DuckDB oracle proves Spark and DuckDB AGREE; these recompute the
semantics a THIRD way (plain Python over the raw parquet) so a
misunderstanding shared by both SQL formulations can't hide."""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from datetime import timedelta

import duckdb

from rsmetacheck_spark.queries import (
    _BPE_TRAIN_STEPS, _Q59_LATE_DAYS, _Q60_CUTOFF,
    q58_order_count_distribution, q59_waiting_suppliers,
    q60_idle_rich_customers, q61_gopher_repetition, q62_event_transitions,
    q63_bpe_train3,
)

SF = "/root/testdata/sf0.001"


def _rows(table: str, cols: str):
    return duckdb.sql(
        f"SELECT {cols} FROM read_parquet('{SF}/{table}.parquet')"
    ).fetchall()


def _toks(text: str) -> list[str]:
    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


# ---------------------------------------------------------------------------
# q58: order-count distribution (TPC-H Q13 analog)
# ---------------------------------------------------------------------------


def test_q58_matches_python_reference(spark):
    per_cust = Counter()
    for ck, prio in _rows("orders", "o_custkey, o_orderpriority"):
        if prio != "5-LOW":
            per_cust[ck] += 1
    hist = Counter()
    for (ck,) in _rows("customer", "c_custkey"):
        hist[per_cust.get(ck, 0)] += 1
    want = sorted(hist.items(), key=lambda kv: (-kv[1], -kv[0]))
    got = [
        (r.c_count, r.custdist)
        for r in q58_order_count_distribution(spark, SF).collect()
    ]
    assert got == want
    # zero-order customers must be present: the synthetic data always has
    # some customer with no non-5-LOW order at sf0.001
    assert any(c == 0 for c, _ in got) == (hist.get(0, 0) > 0)


# ---------------------------------------------------------------------------
# q59: waiting suppliers (TPC-H Q21 analog)
# ---------------------------------------------------------------------------


def _q59_reference():
    odate = {
        ok: od
        for ok, od, st in _rows("orders", "o_orderkey, o_orderdate, o_orderstatus")
        if st == "F"
    }
    sname = {sk: sn for sk, sn in _rows("supplier", "s_suppkey, s_name")}
    supp_by_order: dict[int, set] = defaultdict(set)
    late_by_order: dict[int, set] = defaultdict(set)
    late_lines: list[tuple[int, int]] = []
    for ok, sk, sd in _rows("lineitem", "l_orderkey, l_suppkey, l_shipdate"):
        if ok not in odate:
            continue
        supp_by_order[ok].add(sk)
        if sd > odate[ok] + timedelta(days=_Q59_LATE_DAYS):
            late_by_order[ok].add(sk)
            late_lines.append((ok, sk))
    numwait = Counter()
    for ok, sk in late_lines:
        if len(supp_by_order[ok]) > 1 and late_by_order[ok] == {sk}:
            numwait[sname[sk]] += 1
    return sorted(numwait.items(), key=lambda kv: (-kv[1], kv[0]))[:100]


def test_q59_matches_python_reference(spark):
    want = _q59_reference()
    got = [(r.s_name, r.numwait) for r in q59_waiting_suppliers(spark, SF).collect()]
    assert got == want
    assert len(got) > 0  # the predicate must not be degenerate


def test_q59_plan_has_no_unblocked_join(spark):
    plan = q59_waiting_suppliers(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


# ---------------------------------------------------------------------------
# q60: idle rich customers (TPC-H Q22 analog)
# ---------------------------------------------------------------------------


def test_q60_matches_python_reference(spark):
    cutoff = _Q60_CUTOFF
    recent = {
        ck
        for ck, od in _rows("orders", "o_custkey, o_orderdate")
        if od.strftime("%Y-%m-%d %H:%M:%S") >= cutoff
    }
    cust = [
        (ck, nk, int(round(bal * 100)))
        for ck, nk, bal in _rows("customer", "c_custkey, c_nationkey, c_acctbal")
    ]
    pos = [cents for _, _, cents in cust if cents > 0]
    s, n = sum(pos), len(pos)
    agg: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for ck, nk, cents in cust:
        if cents * n > s and ck not in recent:
            agg[nk][0] += 1
            agg[nk][1] += cents
    want = sorted((nk, v[0], v[1]) for nk, v in agg.items())
    got = [
        (r.c_nationkey, r.numcust, r.tot_cents)
        for r in q60_idle_rich_customers(spark, SF).collect()
    ]
    assert got == want
    assert len(got) > 0


# ---------------------------------------------------------------------------
# q61: Gopher repetition signals
# ---------------------------------------------------------------------------


def test_q61_matches_python_reference(spark):
    want = {}
    for doc_id, text in _rows("documents", "doc_id, text"):
        t = _toks(text)
        if len(t) < 5:
            continue
        nc = len(" ".join(t))
        c2 = Counter(" ".join(t[i : i + 2]) for i in range(len(t) - 1))
        top_g, top_c = min(c2.items(), key=lambda kv: (-kv[1], kv[0]))
        c5 = Counter(" ".join(t[i : i + 5]) for i in range(len(t) - 4))
        mass = sum(c * len(g) for g, c in c5.items() if c >= 2)
        want[doc_id] = (
            len(t),
            top_c * len(top_g) * 1000 // nc,
            mass * 1000 // nc,
        )
    got = {
        r.doc_id: (r.n_toks, r.top2_milli, r.dup5_milli)
        for r in q61_gopher_repetition(spark, SF).collect()
    }
    assert got == want
    # a "mass not coverage" statistic: overlap counting means some doc in
    # a repetitive corpus may exceed 1000; the statistic stays >= 0 always
    assert all(v[1] >= 0 and v[2] >= 0 for v in got.values())


# ---------------------------------------------------------------------------
# q62: event-type transition matrix
# ---------------------------------------------------------------------------


def test_q62_matches_python_reference(spark):
    by_user: dict[int, list] = defaultdict(list)
    for eid, ts, uid, et in _rows("events", "event_id, ts, user_id, event_type"):
        by_user[uid].append((ts, eid, et))
    tr = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            tr[(a, b)] += 1
    tot = sum(tr.values())
    want = sorted(
        (a, b, n, n * 1000 // tot) for (a, b), n in tr.items()
    )
    got = [
        (r.prev_type, r.event_type, r.n, r.share_milli)
        for r in q62_event_transitions(spark, SF).collect()
    ]
    assert got == want


def test_q62_single_exchange_for_lag(spark):
    # one shuffle keys the lag window on user_id; the matrix + total are
    # tiny aggregates after it. No join of events against itself.
    plan = q62_event_transitions(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


# ---------------------------------------------------------------------------
# q63: three-iteration BPE trainer
# ---------------------------------------------------------------------------


def _bpe_train_reference(steps: int):
    wf = Counter()
    for (text,) in _rows("documents", "text"):
        for w in _toks(text):
            if len(w) >= 2:
                wf[w] += 1
    vocab = {w: list(w) for w in wf}
    out = []
    for step in range(1, steps + 1):
        pc = Counter()
        for w, syms in vocab.items():
            f = wf[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        merged = a + b
        out.append((step, f"{a} {b}", merged, n))
        for w, syms in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            vocab[w] = res
    return out


def test_q63_matches_python_bpe_trainer(spark):
    want = _bpe_train_reference(_BPE_TRAIN_STEPS)
    got = [
        (r.step, r.pair, r.merged, r.n) for r in q63_bpe_train3(spark, SF).collect()
    ]
    assert got == want


def test_q63_double_space_replace_is_greedy_merge():
    """The padded double-space `replace` must equal greedy leftmost
    non-overlapping pair merging on adversarial symbol streams —
    back-to-back pairs, shared-symbol chains, and merges whose result
    collides with a neighboring symbol."""

    def via_replace(syms: list[str], a: str, b: str) -> list[str]:
        s = " ".join(syms)
        padded = "  " + s.replace(" ", "  ") + "  "
        out = padded.replace(f" {a}  {b} ", f" {a}{b} ")
        return [x for x in out.split(" ") if x]

    def greedy(syms: list[str], a: str, b: str) -> list[str]:
        res, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                res.append(a + b)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        return res

    cases = [
        (["a", "b", "a", "b"], "a", "b"),          # back-to-back pairs
        (["a", "a", "a"], "a", "a"),               # shared-symbol chain
        (["b", "a", "a", "a", "b"], "a", "a"),
        (["ab", "a", "b", "ab"], "a", "b"),        # collision with merged
        (["a", "b"], "a", "b"),
        (["x"], "a", "b"),
        (["th", "e", "th", "e"], "th", "e"),       # multi-char symbols
        (["t", "h", "e", "h", "e"], "h", "e"),
    ]
    for syms, a, b in cases:
        assert via_replace(syms, a, b) == greedy(syms, a, b), (syms, a, b)


def test_q63_replace_is_greedy_merge_property():
    """Hypothesis: on RANDOM symbol streams and merge pairs, the padded
    double-space replace equals greedy leftmost non-overlapping merging
    — the identity q63's trainer and q51's applier both stand on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    sym = st.sampled_from(["a", "b", "ab", "ba", "x", "aa"])

    def via_replace(syms, a, b):
        s = " ".join(syms)
        padded = "  " + s.replace(" ", "  ") + "  "
        out = padded.replace(f" {a}  {b} ", f" {a}{b} ")
        return [x for x in out.split(" ") if x]

    def greedy(syms, a, b):
        res, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                res.append(a + b)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        return res

    @settings(max_examples=500, deadline=None)
    @given(st.lists(sym, max_size=12), sym, sym)
    def check(syms, a, b):
        assert via_replace(syms, a, b) == greedy(syms, a, b), (syms, a, b)

    check()
