"""Independent verification of the evidence-model detector family.

The cross-engine oracle (tools/check_oracle.py / the driver) proves Spark
and DuckDB agree; these tests prove the detectors compute the INTENDED
semantics, by checking each rule's hit set against the residue class the
synthesis designed it to be (evidence.py ev_expr) — a third, hand-derived
opinion. Plus black-box semantic probes on hand-built evidence rows.
"""

from __future__ import annotations

import pytest

from rsmetacheck_spark import evidence as EV

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ev_flags(spark):
    """doc_id -> {rule: 0/1} for every family, one pass."""
    exprs = EV._all_rule_exprs(EV.SPARK)
    df = EV._spark_ev_df(spark, SF).selectExpr(
        "doc_id", *[f"{e} AS {r}" for r, e in exprs.items()]
    )
    return {r.doc_id: r.asDict() for r in df.collect()}


# rule -> predicate over doc_id giving the DESIGNED hit set
EXPECTED = {
    "p001": lambda d: d % 7 == 0,
    "p017": lambda d: d % 11 == 0,
    "p012": lambda d: d % 13 == 0,
    "p016": lambda d: d % 17 == 0,
    "w010": lambda d: d % 3 == 1,
    "w002": lambda d: d % 9 == 0,
    "p014": lambda d: d % 6 in (0, 5),
    "p018": lambda d: d % 6 == 1,
    "w007": lambda d: d % 6 == 2,
    "w006": lambda d: d % 6 in (2, 4) and d % 4 == 0,
    "p007": lambda d: d % 2 == 0 and d % 3 > 0 and d % 5 != 0,
    "p005": lambda d: d % 2 == 0 and d % 8 != 7,
    "p009": lambda d: d % 4 in (0, 3),
    "w009": lambda d: d % 5 in (1, 2, 4),
    "p006": lambda d: d % 5 != 2,
    # P013 six-family + skips: GPL / CC-BY / LGPL / BSD unversioned fire;
    # versioned forms, the dead mixed-case Apache family, 0BSD and
    # LicenseRef- skips don't (see lic_name synthesis classes)
    "p013": lambda d: d % 12 in (0, 5, 6, 11),
    "w003": lambda d: d % 10 == 0 and d % 14 != 0,
    # P002 full placeholder set: <owner>, <year>/<copyright holders>,
    # [fullname]/[year]
    "p002": lambda d: d % 10 in (2, 3, 5),
    # P010: YEAR:/HOLDER: branch, (c)-year short doc, comment+copyright;
    # the 11-line copyright doc (class 6) must NOT fire (line bound)
    "p010": lambda d: d % 10 in (1, 4, 8),
    # P004 classifier: github wiki, readthedocs, bare generic-TLD fire;
    # raw.githubusercontent, blob/README, readme.html don't
    "p004": lambda d: d % 6 in (1, 3, 4),
    "w004": lambda d: d % 2 == 1,
    # W005: double-space split + capitalized-word fallback; the
    # trailing-space single-part and lowercase cases must NOT fire
    "w005": lambda d: d % 10 in (0, 5),
    "w001": lambda d: not ((d + 1) % 2 == 0 and d % 4 < 2 and d % 5 > 0),
    "w008": lambda d: d % 8 == 0,
}


@pytest.mark.parametrize("rule", sorted(EXPECTED))
def test_rule_hit_set_matches_design(ev_flags, rule):
    for d, row in ev_flags.items():
        want = int(EXPECTED[rule](d))
        assert row[rule] == want, f"{rule} doc {d}: got {row[rule]} want {want}"


def test_p019_author_counts(ev_flags):
    # p019 fires iff the github and codemeta author counts differ; the
    # %21 docs use ' and ' as separator, so the comma-split count is 1
    # there (the reference's own separator-blindness, p019.py:29-47)
    for d, row in ev_flags.items():
        n_gh = 1 + d % 3
        n_cm = (1 + (d + 1) % 3) if d % 19 == 0 else (1 + d % 3)
        if d % 21 == 0:
            n_cm = 1
        want = int(n_gh != n_cm)
        assert row["p019"] == want, f"p019 doc {d}"


def test_p003_separator_hits(ev_flags):
    # authors evidence matches a separator pattern iff either side has >1
    # author (comma join) or uses the ' and ' separator with >1 author
    for d, row in ev_flags.items():
        n_gh = 1 + d % 3
        n_cm = (1 + (d + 1) % 3) if d % 19 == 0 else (1 + d % 3)
        want = int(n_gh > 1 or n_cm > 1)
        assert row["p003"] == want, f"p003 doc {d}"


def test_rule_rates_nondegenerate(ev_flags):
    """Every rule fires on some docs and not on all docs."""
    n = len(ev_flags)
    for rule in EXPECTED:
        hits = sum(r[rule] for r in ev_flags.values())
        assert 0 < hits < n, f"{rule} degenerate: {hits}/{n}"


# ---------------------------------------------------------------------------
# Black-box semantic probes on hand-built evidence (not via ev_expr)
# ---------------------------------------------------------------------------


def _run_flags(spark, family, rows):
    """Evaluate a detector family over literal evidence rows."""
    df = spark.createDataFrame(
        rows,
        "doc_id long, ev array<struct<src:string,tech:string,k:string,v:string,ver:string>>",
    )
    flags = family(EV.SPARK)
    out = df.selectExpr(
        "doc_id", *[f"{e} AS {a}" for a, e in flags.items()]
    ).collect()
    return {r.doc_id: r.asDict() for r in out}


def _e(src, tech, k, v, ver=None):
    return (src, tech, k, v, ver)


def test_version_mismatch_semantics(spark):
    rows = [
        # v-prefix stripped on both sides -> equal -> no hit
        (1, [_e("codemeta.json", "code_parser", "version", "v1.2"),
             _e("github_releases", "GitHub_API", "release", "1.2"),
             _e("github_api", "GitHub_API", "download_url",
                "https://x/archive/v1.2.tar.gz")]),
        # true mismatch
        (2, [_e("codemeta.json", "code_parser", "version", "v1.2"),
             _e("github_releases", "GitHub_API", "release", "1.3"),
             _e("github_api", "GitHub_API", "download_url",
                "https://x/archive/v1.3.tar.gz")]),
    ]
    got = _run_flags(spark, EV.flags_versions, rows)
    assert got[1]["p001"] == 0 and got[2]["p001"] == 1
    assert got[1]["p012"] == 0 and got[2]["p012"] == 0  # url matches release


def test_repo_url_normalization_semantics(spark):
    api = _e("github_api", "GitHub_API", "code_repository",
             "https://github.com/org/repo")
    cases = {
        1: "https://GitHub.com/ORG/REPO.git",   # case + .git -> equal
        2: "git@github.com:org/repo",            # shorthand -> equal
        3: "https://github.com/org/repo/",       # trailing / -> equal
        4: "https://github.com/other/repo",      # true mismatch
    }
    rows = [(d, [api, _e("codemeta.json", "code_parser", "code_repository", u)])
            for d, u in cases.items()]
    got = _run_flags(spark, EV.flags_repo_urls, rows)
    assert [got[d]["p016"] for d in (1, 2, 3, 4)] == [0, 0, 0, 1]
    assert got[2]["w010"] == 1 and got[1]["w010"] == 0


def test_date_parse_semantics(spark):
    def row(d, gh, cm):
        return (d, [_e("github_api", "GitHub_API", "date_updated", gh),
                    _e("codemeta.json", "code_parser", "date_modified", cm)])

    rows = [
        row(1, "2024-03-10 10:00:00", "2024-03-10T08:00:00"),  # same day
        row(2, "2024-03-10 10:00:00", "2024-03-07 08:00:00"),  # 3 days
        row(3, "2024-03-10 10:00:00", "2024-03-12T08:00:00"),  # cm newer
        row(4, "2024-03-10 10:00:00", "2024-03-07 morning"),   # prefix fallback
    ]
    got = _run_flags(spark, EV.flags_dates, rows)
    assert [got[d]["w002"] for d in (1, 2, 3, 4)] == [0, 1, 0, 1]
    assert got[2]["delta_days"] == 3 and got[4]["delta_days"] == 3


def test_identifier_semantics(spark):
    def row(d, cm_id, zen=None):
        ev = [_e("codemeta.json", "code_parser", "identifier", cm_id)]
        if zen:
            ev.append(_e("zenodo.json", "code_parser", "identifier", zen))
        return (d, ev)

    rows = [
        row(1, "doi:10.5281/zenodo.123"),                  # bare DOI
        row(2, "https://doi.org/10.5281/zenodo.123"),      # proper DOI URL
        row(3, "swh:1:rev:" + "a" * 40),                   # raw SWHID
        row(4, "  "),                                      # empty
        row(5, "My Tool", "https://doi.org/10.1/x"),       # name + valid other
        row(6, "My Tool"),                                 # name, no other
    ]
    got = _run_flags(spark, EV.flags_identifiers, rows)
    assert [got[d]["p014"] for d in (1, 2)] == [1, 0]
    assert got[3]["p018"] == 1 and got[1]["p018"] == 0
    assert got[4]["w007"] == 1
    assert got[5]["w006"] == 1 and got[6]["w006"] == 0


def test_ev09_covers_all_29_rules(spark):
    """The one-scan summary must keep covering every detector the
    reference's main loop runs: 19 P-rules + 10 W-rules = 29 (evidence
    families + the three network rules)."""
    from rsmetacheck_spark.queries import REGISTRY

    fn, _ = REGISTRY["ev09_rule_summary"]
    rules = {r.rule for r in fn(spark, SF).collect()}
    assert len(rules) == 29
    assert {"p001", "p008", "p011", "p015", "w001", "w010"} <= rules
