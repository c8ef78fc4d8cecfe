"""Independent Python-reference checks for the round-5e operators
(q64 top suppliers, q65 nation-pair volume, q66 part-supplier counts,
dd16 source overlap matrix).

The DuckDB oracle proves Spark and DuckDB AGREE; these recompute the
semantics a THIRD way (plain Python over the raw parquet) so a
misunderstanding shared by both SQL formulations can't hide."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict
from datetime import datetime
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from rsmetacheck_spark.functions.hashing import NUM_HASHES
from rsmetacheck_spark.queries import (
    _Q66_SIZES, dd16_source_overlap, q64_top_suppliers, q65_nation_volume,
    q66_part_supplier_counts,
)

SF = "/root/testdata/sf0.001"


def _rows(table: str, cols: str):
    return duckdb.sql(
        f"SELECT {cols} FROM read_parquet('{SF}/{table}.parquet')"
    ).fetchall()


def _rev_dmil(price: float, disc: float) -> int:
    """discounted revenue in 1e-4 units: double product, then the
    HALF_UP round both engines apply casting double -> DECIMAL(18,4)."""
    d = Decimal(price * (1 - disc)).quantize(
        Decimal("0.0001"), rounding=ROUND_HALF_UP
    )
    return int(d * 10000)


# ---------------------------------------------------------------------------
# q64: top supplier(s) by Q1-1996 revenue (TPC-H Q15 analog)
# ---------------------------------------------------------------------------


def test_q64_matches_python_reference(spark):
    lo, hi = datetime(1996, 1, 1), datetime(1996, 4, 1)
    rev = Counter()
    for sk, sd, pr, dc in _rows(
        "lineitem", "l_suppkey, l_shipdate, l_extendedprice, l_discount"
    ):
        if lo <= sd < hi:
            rev[sk] += _rev_dmil(pr, dc)
    mx = max(rev.values())
    names = {sk: nm for sk, nm in _rows("supplier", "s_suppkey, s_name")}
    want = sorted((sk, names[sk], r) for sk, r in rev.items() if r == mx)
    got = [
        (r.s_suppkey, r.s_name, r.rev_dmil)
        for r in q64_top_suppliers(spark, SF).collect()
    ]
    assert got == want
    assert len(got) >= 1


def test_q64_keeps_ties(spark):
    """Global argmax must keep EVERY supplier at the max, not pick one
    (the q52 struct-MIN idiom would drop ties). Planted frame: two
    suppliers tie at the max revenue."""
    df = spark.createDataFrame(
        [(1, 50), (2, 30), (3, 50), (2, 20)], "l_suppkey int, rev_dmil int"
    )
    from pyspark.sql import functions as F

    rev = df.groupBy("l_suppkey").agg(F.sum("rev_dmil").alias("rev_dmil"))
    mx = rev.agg(F.max("rev_dmil").alias("mx"))
    out = sorted(
        r.l_suppkey
        for r in rev.crossJoin(F.broadcast(mx)).filter("rev_dmil = mx").collect()
    )
    assert out == [1, 2, 3]  # 50, 50, 50 — all three tie


# ---------------------------------------------------------------------------
# q65: cross-border volume by nation pair and year (TPC-H Q7 analog)
# ---------------------------------------------------------------------------


def test_q65_matches_python_reference(spark):
    nation = {nk: nm for nk, nm in _rows("nation", "n_nationkey, n_name")}
    supp_nation = {
        sk: nation[nk] for sk, nk in _rows("supplier", "s_suppkey, s_nationkey")
    }
    cust_nation = {
        ck: nation[nk] for ck, nk in _rows("customer", "c_custkey, c_nationkey")
    }
    order_cust = {ok: ck for ok, ck in _rows("orders", "o_orderkey, o_custkey")}
    vol = Counter()
    for ok, sk, sd, pr, dc in _rows(
        "lineitem",
        "l_orderkey, l_suppkey, l_shipdate, l_extendedprice, l_discount",
    ):
        if sd.year not in (1996, 1997):
            continue
        sn, cn = supp_nation[sk], cust_nation[order_cust[ok]]
        if sn != cn:
            vol[(sn, cn, sd.year)] += _rev_dmil(pr, dc)
    want = sorted((sn, cn, y, v) for (sn, cn, y), v in vol.items())
    got = [
        (r.supp_nation, r.cust_nation, r.l_year, r.volume_dmil)
        for r in q65_nation_volume(spark, SF).collect()
    ]
    assert got == want
    # the dim plays two roles: some pair must appear in both directions
    pairs = {(a, b) for a, b, _, _ in got}
    assert any((b, a) in pairs for a, b in pairs)


# ---------------------------------------------------------------------------
# q66: distinct supplier count per (brand, type, size) (TPC-H Q16 analog)
# ---------------------------------------------------------------------------


def test_q66_matches_python_reference(spark):
    bad = {
        sk for sk, nm in _rows("supplier", "s_suppkey, s_name") if "7" in nm
    }
    part = {
        pk: (b, t, z)
        for pk, b, t, z in _rows("part", "p_partkey, p_brand, p_type, p_size")
        if b != "Brand#13" and t != "STANDARD" and z in _Q66_SIZES
    }
    per_key: dict[tuple, set] = defaultdict(set)
    for pk, sk in set(_rows("lineitem", "l_partkey, l_suppkey")):
        if pk in part and sk not in bad:
            per_key[part[pk]].add(sk)
    want = sorted(
        ((b, t, z, len(s)) for (b, t, z), s in per_key.items()),
        key=lambda r: (-r[3], r[0], r[1], r[2]),
    )
    got = [
        (r.p_brand, r.p_type, r.p_size, r.supplier_cnt)
        for r in q66_part_supplier_counts(spark, SF).collect()
    ]
    assert got == want
    assert len(got) > 0


def test_q66_plan_broadcasts_dims(spark):
    plan = (
        q66_part_supplier_counts(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


# ---------------------------------------------------------------------------
# dd16: source-pair overlap matrix (exact + MinHash estimate)
# ---------------------------------------------------------------------------


def _toks(text: str) -> list[str]:
    import re

    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


def _shingles(t: list[str]) -> set[str]:
    return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 2147483647


def test_dd16_matches_python_reference(spark):
    per_src: dict[str, set] = defaultdict(set)
    for src, text in _rows("documents", "source, text"):
        per_src[src] |= _shingles(_toks(text))
    sigs = {}
    for src, sh in per_src.items():
        hs = [_h32(s) for s in sh]
        sigs[src] = [
            min(((2 * i + 1) * h + (1000003 * i + 12345)) % 2147483647 for h in hs)
            for i in range(NUM_HASHES)
        ]
    want = []
    srcs = sorted(per_src)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(per_src[a] & per_src[b])
            if inter == 0:
                continue
            union = len(per_src[a] | per_src[b])
            match = sum(x == y for x, y in zip(sigs[a], sigs[b]))
            want.append(
                (a, b, inter, union, inter * 1000 // union,
                 match * 1000 // NUM_HASHES)
            )
    got = [
        (r.src_a, r.src_b, r.n_inter, r.n_union, r.jacc_milli, r.est_milli)
        for r in dd16_source_overlap(spark, SF).collect()
    ]
    assert got == sorted(want)
    # the estimate must track the exact value: mean absolute error of a
    # 128-perm MinHash on per-mille Jaccard stays well under 100
    errs = [abs(j - e) for _, _, _, _, j, e in got]
    assert sum(errs) / len(errs) < 100, sum(errs) / len(errs)


def test_dd16_plan_has_no_unblocked_join(spark):
    plan = (
        dd16_source_overlap(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


# ---------------------------------------------------------------------------
# q67: packing-cap efficiency sweep
# ---------------------------------------------------------------------------


def test_q67_matches_python_reference(spark):
    from rsmetacheck_spark.queries import _Q67_CAPS, q67_packing_efficiency

    per_src: dict[tuple, list[int]] = defaultdict(lambda: [0, 0])
    for src, text in _rows("documents", "source, text"):
        n = len(_toks(text))
        for cap in _Q67_CAPS:
            e = per_src[(cap, src)]
            e[0] += n
            e[1] += -(-n // cap) * cap
    want = []
    for cap in sorted(_Q67_CAPS):
        tokens = sum(v[0] for (c, _), v in per_src.items() if c == cap)
        padded = sum(v[1] for (c, _), v in per_src.items() if c == cap)
        packed = sum(
            -(-v[0] // cap) * cap for (c, _), v in per_src.items() if c == cap
        )
        want.append(
            (cap, tokens, padded, packed,
             tokens * 1000 // padded, tokens * 1000 // packed)
        )
    got = [
        (r.cap, r.tokens, r.padded_total, r.packed_total,
         r.padded_eff_milli, r.packed_eff_milli)
        for r in q67_packing_efficiency(spark, SF).collect()
    ]
    assert got == want
    # packing can never be less efficient than per-doc padding, and
    # padding efficiency must fall as the cap outgrows the median doc
    for _, _, padded, packed, pad_eff, pack_eff in got:
        assert pack_eff >= pad_eff
    pad_effs = [r[4] for r in got]
    assert pad_effs == sorted(pad_effs, reverse=True)


# ---------------------------------------------------------------------------
# st10: streaming decontamination gate
# ---------------------------------------------------------------------------


def test_st10_matches_python_reference(spark):
    from rsmetacheck_spark.streaming.oracle_rows import st10_stream_decontaminate

    fp_eval = {
        hashlib.md5(t.lower().strip().encode()).hexdigest()
        for did, t in _rows("documents", "doc_id, text")
        if did % 97 == 0
    }
    clean = Counter()
    for src, t in _rows("documents", "source, text"):
        if hashlib.md5(t.lower().strip().encode()).hexdigest() not in fp_eval:
            clean[src] += 1
    want = sorted(clean.items())
    got = sorted(
        (r.source, r.n_clean)
        for r in st10_stream_decontaminate(spark, SF).collect()
    )
    assert got == want
    # the gate must actually drop something: every eval doc fingerprints
    # itself, so totals shrink
    total = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert sum(clean.values()) < total


# ---------------------------------------------------------------------------
# dd17: directional source containment
# ---------------------------------------------------------------------------


def test_dd17_matches_python_reference(spark):
    from rsmetacheck_spark.queries import dd17_source_containment

    per_src: dict[str, set] = defaultdict(set)
    for src, text in _rows("documents", "source, text"):
        per_src[src] |= _shingles(_toks(text))
    want = []
    for a in per_src:
        for b in per_src:
            if a == b:
                continue
            inter = len(per_src[a] & per_src[b])
            if inter == 0:
                continue
            want.append((a, b, inter, len(per_src[a]),
                         inter * 1000 // len(per_src[a])))
    got = [
        (r.src_a, r.src_b, r.n_inter, r.n_a, r.containment_milli)
        for r in dd17_source_containment(spark, SF).collect()
    ]
    assert got == sorted(want)
    # directionality: containment is asymmetric whenever set sizes differ
    by_pair = {(a, b): c for a, b, _, _, c in got}
    assert any(
        by_pair.get((b, a)) is not None and c != by_pair[(b, a)]
        for (a, b), c in by_pair.items()
    )


# ---------------------------------------------------------------------------
# q68: disjunctive-predicate revenue (TPC-H Q19 analog)
# ---------------------------------------------------------------------------


def test_q68_matches_python_reference(spark):
    from rsmetacheck_spark.queries import _Q68_BRANCHES, q68_disjunctive_revenue

    part = {
        pk: (b, z)
        for pk, b, z in _rows("part", "p_partkey, p_brand, p_size")
    }
    rev = n = 0
    for pk, q, pr, dc in _rows(
        "lineitem", "l_partkey, l_quantity, l_extendedprice, l_discount"
    ):
        b, z = part[pk]
        if any(
            b == br and zl <= z <= zh and ql <= q <= qh
            for br, zl, zh, ql, qh in _Q68_BRANCHES
        ):
            rev += _rev_dmil(pr, dc)
            n += 1
    row = q68_disjunctive_revenue(spark, SF).collect()[0]
    assert (row.revenue_dmil, row.n_lines) == (rev, n)
    assert n > 0


def test_q68_residual_predicates_are_pushed(spark):
    """The DNF references both join sides so it stays at the join, but
    its single-side residual (p_brand IN the three brands) must reach
    the part scan's PushedFilters — the decomposition that keeps a
    100 TB fact join from reading non-matching dimension row groups."""
    from rsmetacheck_spark.queries import q68_disjunctive_revenue

    plan = (
        q68_disjunctive_revenue(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    pushed = [
        seg.split(", ReadSchema")[0]
        for seg in plan.split("PushedFilters: [")[1:]
    ]
    # Catalyst derives the full per-side residual DNF, not just an IN:
    # the part scan gets the Or-of-brand-equalities, the lineitem scan
    # the Or-of-quantity-ranges
    assert any("EqualTo(p_brand" in p and "Or(" in p for p in pushed), pushed
    assert any("l_quantity" in p and "Or(" in p for p in pushed), pushed


# ---------------------------------------------------------------------------
# q69: token-budget epoch plan
# ---------------------------------------------------------------------------


def test_q69_matches_python_reference(spark):
    from rsmetacheck_spark.queries import _Q69_BUDGET, q69_epoch_plan

    tokens = Counter()
    for src, text in _rows("documents", "source, text"):
        tokens[src] += len(_toks(text))
    target = _Q69_BUDGET // len(tokens)
    want = sorted(
        (s, t, target, target * 1000 // t) for s, t in tokens.items()
    )
    got = [
        (r.source, r.src_tokens, r.target_tokens, r.epochs_milli)
        for r in q69_epoch_plan(spark, SF).collect()
    ]
    assert got == want
    # the plan must actually re-weight: not all sources repeat equally
    assert len({e for _, _, _, e in got}) > 1


# ---------------------------------------------------------------------------
# q70: order-priority semi-join (TPC-H Q4 analog)
# ---------------------------------------------------------------------------


def test_q70_matches_python_reference(spark):
    from rsmetacheck_spark.queries import _Q59_LATE_DAYS, q70_priority_semi
    from datetime import timedelta

    lo, hi = datetime(1997, 7, 1), datetime(1998, 1, 1)
    orders = {
        ok: (od, pr)
        for ok, od, pr in _rows(
            "orders", "o_orderkey, o_orderdate, o_orderpriority"
        )
        if lo <= od < hi
    }
    late_orders = set()
    for ok, sd in _rows("lineitem", "l_orderkey, l_shipdate"):
        if ok in orders and sd > orders[ok][0] + timedelta(days=_Q59_LATE_DAYS):
            late_orders.add(ok)
    cnt = Counter(orders[ok][1] for ok in late_orders)
    want = sorted(cnt.items())
    got = [
        (r.o_orderpriority, r.order_count)
        for r in q70_priority_semi(spark, SF).collect()
    ]
    assert got == want
    assert len(got) > 0


def test_q70_plan_uses_left_semi(spark):
    """The EXISTS must compile to a semi join (no row multiplication
    from duplicate build rows), not an inner join + distinct."""
    from rsmetacheck_spark.queries import q70_priority_semi

    plan = (
        q70_priority_semi(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan, plan[:2000]


# ---------------------------------------------------------------------------
# q71: local supplier volume (TPC-H Q5 analog — the nation loop)
# ---------------------------------------------------------------------------


def test_q71_matches_python_reference(spark):
    from rsmetacheck_spark.queries import q71_local_supplier_volume

    lo, hi = datetime(1996, 1, 1), datetime(1997, 1, 1)
    nation = {nk: nm for nk, nm in _rows("nation", "n_nationkey, n_name")}
    cust_nk = {ck: nk for ck, nk in _rows("customer", "c_custkey, c_nationkey")}
    supp_nk = {sk: nk for sk, nk in _rows("supplier", "s_suppkey, s_nationkey")}
    order_nk = {
        ok: cust_nk[ck]
        for ok, ck, od in _rows("orders", "o_orderkey, o_custkey, o_orderdate")
        if lo <= od < hi
    }
    rev = Counter()
    for ok, sk, pr, dc in _rows(
        "lineitem", "l_orderkey, l_suppkey, l_extendedprice, l_discount"
    ):
        nk = order_nk.get(ok)
        if nk is not None and supp_nk[sk] == nk:
            rev[nation[nk]] += _rev_dmil(pr, dc)
    want = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    got = [
        (r.n_name, r.revenue_dmil)
        for r in q71_local_supplier_volume(spark, SF).collect()
    ]
    assert got == want
    assert len(got) > 0


# ---------------------------------------------------------------------------
# q72: quality-rule ablation table
# ---------------------------------------------------------------------------


def test_q72_matches_python_reference(spark):
    from rsmetacheck_spark import thresholds as TH
    from rsmetacheck_spark.queries import (
        DOC_KEEP_LANGS, DOC_MAX_TOKENS, DOC_MIN_STOP_FRAC, DOC_MIN_TOKENS,
        q72_rule_ablation,
    )
    _STOPWORDS = set(TH.STOPWORD_UNION)

    flags = []
    for lang, text in _rows("documents", "lang, text"):
        t = _toks(text)
        n = len(t)
        stop_frac = round(
            sum(1 for x in t if x in _STOPWORDS) / max(n, 1), 6
        )
        import re as _re

        mwl = round(
            len(_re.sub(r"[^a-z0-9]", "", text.lower())) / max(n, 1), 6
        )
        flags.append({
            "lang": lang in DOC_KEEP_LANGS,
            "mean_word_len": TH.MIN_MEAN_WORD_LEN <= mwl <= TH.MAX_MEAN_WORD_LEN,
            "stop_frac": stop_frac >= DOC_MIN_STOP_FRAC,
            "tokens": DOC_MIN_TOKENS <= n <= DOC_MAX_TOKENS,
        })
    keep_base = sum(1 for f in flags if all(f.values()))
    want = []
    for rule in sorted(flags[0]):
        n_fail = sum(1 for f in flags if not f[rule])
        n_uniq = sum(
            1 for f in flags
            if not f[rule] and all(v for k, v in f.items() if k != rule)
        )
        want.append((rule, n_fail, n_uniq, keep_base, keep_base + n_uniq))
    got = [
        (r.rule, r.n_fail, r.n_unique_fail, r.keep_base, r.keep_if_dropped)
        for r in q72_rule_ablation(spark, SF).collect()
    ]
    assert got == want
    # invariants: unique failures never exceed total failures, and
    # dropping a rule can only grow the keep set
    for _, n_fail, n_uniq, kb, kd in got:
        assert 0 <= n_uniq <= n_fail
        assert kd >= kb


# ---------------------------------------------------------------------------
# g04: one k-core peeling round over the mutual-kNN graph
# ---------------------------------------------------------------------------


def test_g04_matches_python_reference(spark):
    from rsmetacheck_spark.queries import _G04_K, _sim08_edges, g04_kcore_round

    edges = [(r.id_a, r.id_b) for r in _sim08_edges(spark, SF).collect()]
    deg0 = Counter()
    for a, b in edges:
        deg0[a] += 1
        deg0[b] += 1
    keep = {v for v, d in deg0.items() if d >= _G04_K}
    deg1 = Counter()
    for a, b in edges:
        if a in keep and b in keep:
            deg1[a] += 1
            deg1[b] += 1
    want = sorted((v, deg0[v], deg1.get(v, 0)) for v in keep)
    got = [
        (r.vec_id, r.deg0, r.deg1)
        for r in g04_kcore_round(spark, SF).collect()
    ]
    assert got == want
    # peeling contracts: induced degree never exceeds the original, and
    # at least one survivor must have lost a neighbor for the round to
    # be non-trivial on this graph
    assert all(d1 <= d0 for _, d0, d1 in got)
    assert any(d1 < d0 for _, d0, d1 in got)


# ---------------------------------------------------------------------------
# dd18: prefix-canonical dedup (leading-boilerplate detector)
# ---------------------------------------------------------------------------


def test_dd18_matches_python_reference(spark):
    import re as _re

    from rsmetacheck_spark.queries import dd18_canonical_dedup

    groups: dict[str, list] = defaultdict(list)
    for did, text in _rows("documents", "doc_id, text"):
        prefix = _re.sub(r"[0-9]+", "0", " ".join(_toks(text)[:8]))
        canon = hashlib.md5(prefix.encode()).hexdigest()
        raw = hashlib.md5(text.lower().strip().encode()).hexdigest()
        groups[canon].append((did, raw))
    want = sorted(
        (c, min(d for d, _ in m), len(m), len({r for _, r in m}))
        for c, m in groups.items()
        if len(m) > 1
    )
    got = [
        (r.canon_md5, r.rep_doc_id, r.n_docs, r.n_raw_groups)
        for r in dd18_canonical_dedup(spark, SF).collect()
    ]
    assert got == want
    assert len(got) > 0
    # template groups, not exact dupes: this corpus has no exact-dup
    # texts, so every group must span distinct full documents
    assert all(nrg == nd for _, _, nd, nrg in got)
