"""Differential fuzz: the Spark parity detectors vs the reference source
on GENERATED adversarial inputs (the 1,114-file corpus in
test_reference_parity.py proves exactness on real data; this proves the
branch logic holds on inputs the corpus never exercises — weird
whitespace, mixed-case names, embedded brackets/urls, boundary shapes).

A deterministic grammar (seeded PRNG) builds ~500 synthetic somef files,
each wiring one generated value into the category/source/technique slots a
detector reads. Expected labels come from IMPORTING the reference
detectors and running them on the same dicts; the Spark side goes through
the real somef_parity path (normalize -> evidence array -> Catalyst
rules). Any disagreement is a branch-fidelity bug."""

from __future__ import annotations

import random
import sys

import pytest

from rsmetacheck_spark.somef_parity import (
    _ENTRY_SCHEMA,
    _normalize_one,
    detect_flags,
    evidence_df,
)

sys.path.insert(0, "/root/reference/src")

import os  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/src"),
    reason="reference source not present",
)

LIC_NAMES = [
    "MIT", "GPL", "GPL-3", "GPL-3.0", "GPLv3", "GPL (>= 2)", "LGPL",
    "LGPL-2.1", "AGPL", "AGPL-3.0-or-later", "Apache", "Apache-2.0",
    "Apache License", "BSD", "BSD-3-Clause", "BSD 3-clause", "0BSD",
    "LicenseRef-MIT-style", "CC-BY", "CC0", "CC-BY-NC-SA-4.0",
    "https://spdx.org/licenses/GPL-3.0", "License file: LICENSE",
    "./LICENSE.md", "../COPYING", "docs/license.txt", "licence",
    "readme.md", "{{ License }}",
    # COMPOUND license strings: a versioned family next to a DIFFERENT
    # unversioned one — these caught the round-4 P013 \b-anchor fix
    # ('LGPL-2.1 GPL': the version pattern must not match inside LGPL-2.1)
    "LGPL-2.1 GPL", "GPL or LGPL-3.0", "Apache-2.0 AND GPL",
    "BSD-3-Clause OR AGPL", "CC-BY-4.0, CC",
]
PLACEHOLDERS = [
    "<program>", "<year>", "<name of author>", "<name>",
    "<copyright holders>", "<copyright holder>", "<owner>", "<author>",
    "[year]", "[fullname]", "[name]", "[copyright holder]", "<yyyy>",
    "<name of copyright owner>", "(c) 2019", "Copyright 2021",
    "YEAR: 2017", "COPYRIGHT HOLDER: Someone",
]
WORDS = [
    "permission", "granted", "liability", "warranty", "copyright",
    "redistribution", "the", "software", "licensed under", "#", "//",
    "-", "=", "*", "terms and conditions", "dual licensed",
    "choose between", "either", "or", "and", "license options",
]
URLS = [
    "https://github.com/org/repo", "https://github.com/org/repo/wiki",
    "https://raw.githubusercontent.com/o/r/main/README.md",
    "https://github.com/o/r/blob/main/README.md",
    "https://proj.readthedocs.io/en/latest", "https://x.github.io/docs",
    "https://example.com/about", "https://docs.example.org/page",
    "www.example.net/x", "git@github.com:o/r.git", "github.com:user/repo",
    "https://doi.org/10.5281/zenodo.123", "doi:10.1234/abc", "10.1234/abc",
    "swh:1:rev:" + "a" * 40, "not a url", "", " ", "ftp://files.example.com",
    "https://zenodo.org/record/7", "https://github.com/o/r/releases",
    "https://example.org/readme.html", "https://sourceforge.net/projects/p",
]
REQS = [
    "numpy", "numpy>=1.0", "reqa  reqb", "alpha Beta", "single  ",
    "one two Three", "A  B  C", "x, y; z", "See https://pypi.org/p/x",
    "tool (>= 2.0)", "  spaced  ", "Numpy Pandas Scipy", "a\tB",
]
SEPS = [" ", "  ", ", ", " and ", " & ", "; ", "\n", " , Jr.", ", Jr."]
VERSIONS = [
    "1.2.3", "v1.2.3", "V2.0", " 1.0 ", "2.0.0.1", "1.2.3-rc1", "", "abc",
    "v1.2.3\n", "0.1", "10.20.30",
]
DATES = [
    "2024-03-05T10:00:00Z", "2024-03-05", "2024-03-05T10:00:00.720Z",
    "2024-03-05T10:00:00", "garbage", "2024/01/01", " 2025-01-02 ",
    "2023-11-17T00:00:00Z", "", "2024-13-45",
]
DL_URLS = [
    "https://github.com/o/r/archive/v1.2.3.tar.gz",
    "https://github.com/o/r/archive/refs/tags/v1.2.3.tar.gz",
    "https://github.com/o/r/archive/main.zip",
    "https://github.com/o/r/releases/tag/v1.2.3",
    "https://files.example.org/pkg-1.2.3.zip",
    "https://example.org/download/1.2.3/pkg.tar.gz",
    "https://github.com/o/r/releases", "", "not a url",
]


def _rand_text(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(1, 12)):
        pool = rng.choice((LIC_NAMES, PLACEHOLDERS, WORDS, URLS, REQS))
        parts.append(rng.choice(pool))
        parts.append(rng.choice(SEPS))
    return "".join(parts)


def _gen_files(n: int = 500) -> dict[str, dict]:
    rng = random.Random(7)
    files: dict[str, dict] = {}
    for i in range(n):
        v1, v2 = _rand_text(rng), _rand_text(rng)
        name = rng.choice(LIC_NAMES)
        url = rng.choice(URLS)
        req = rng.choice(REQS) + rng.choice(["", "  ", " More"])
        files[f"fuzz_{i}"] = {
            "license": [
                {"source": "https://x/main/LICENSE.md", "technique":
                 "file_exploration", "confidence": 1,
                 "result": {"value": v1, "type": "File_dump"}},
                {"source": "https://x/main/DESCRIPTION", "technique":
                 "code_parser", "confidence": 1,
                 "result": {"value": name, "type": "String"}},
                {"source": "https://x/main/codemeta.json", "technique":
                 "code_parser", "confidence": 1,
                 "result": {"value": rng.choice(LIC_NAMES), "type": "String"}},
            ],
            "requirements": [
                {"source": "https://x/main/setup.py", "technique":
                 "code_parser", "confidence": 1,
                 "result": {"value": req, "type": "String"}},
                # non-str values exercise p008's requirement_text joining
                # (list -> ' '.join(str); dict -> name/value/description/
                # text concat) — absent from the real corpus
                {"source": "https://x/main/pyproject.toml", "technique":
                 "code_parser", "confidence": 1,
                 "result": {"value": rng.choice([
                     [rng.choice(REQS), rng.choice(URLS)],
                     [rng.choice(REQS)],
                     {"name": rng.choice(REQS), "description": rng.choice(URLS)},
                     {"text": rng.choice(URLS)},
                     {"other": "ignored"},
                     None,
                 ]), "type": "String"}},
            ],
            "readme_url": [
                {"source": "https://x/main/codemeta.json", "technique":
                 "code_parser", "confidence": 1,
                 "result": {"value": url, "type": "Url"}},
            ],
            "identifier": [
                {"source": "https://x/main/codemeta.json", "technique":
                 "code_parser", "confidence": 1,
                 "result": {"value": rng.choice(URLS), "type": "String"}},
                {"source": "https://x/main/zenodo.json", "technique":
                 "code_parser", "confidence": 1,
                 "result": {"value": rng.choice(URLS), "type": "String"}},
            ],
            "development_status": [
                {"source": "https://x/main/codemeta.json", "technique":
                 "code_parser", "confidence": 1,
                 "result": {"value": rng.choice(URLS + WORDS), "type": "String"}},
            ],
            "code_repository": [
                {"technique": "GitHub_API", "confidence": 1,
                 "result": {"value": rng.choice(URLS), "type": "Url"}},
                {"source": "https://x/main/codemeta.json", "technique":
                 "code_parser", "confidence": 1,
                 "result": {"value": rng.choice(URLS), "type": "Url"}},
            ],
            "authors": [
                {"source": "https://x/main/codemeta.json", "technique":
                 "code_parser", "confidence": 1,
                 "result": {"value": v2[:80], "type": "String"}},
            ],
            "version": [
                {"source": "https://x/main/codemeta.json", "technique":
                 "code_parser", "confidence": 1,
                 "result": {"value": rng.choice(VERSIONS), "type": "String"}},
                # p001's elif branch: no top-level source, the metadata
                # filename lives in result.source instead
                {"source": "https://x/main/setup.py", "technique":
                 "code_parser", "confidence": 1,
                 "result": {"value": rng.choice(VERSIONS), "type": "String"}}
                if rng.random() < 0.5 else
                {"technique": "code_parser", "confidence": 1,
                 "result": {"value": rng.choice(VERSIONS), "type": "String",
                            "source": "https://x/main/setup.py"}},
            ],
            "releases": [
                {"technique": "GitHub_API", "confidence": 1,
                 "result": {"tag": rng.choice(VERSIONS),
                            "name": rng.choice(VERSIONS + ["rel " + v for v in VERSIONS[:3]]),
                            "value": "x", "type": "Release"}},
            ],
            "download_url": [
                {"source": "https://x/main/codemeta.json", "technique":
                 "code_parser", "confidence": 1,
                 "result": {"value": rng.choice(DL_URLS), "type": "Url"}},
            ],
            "date_updated": [
                {"technique": "GitHub_API", "confidence": 1,
                 "result": {"value": rng.choice(DATES), "type": "Date"}},
                # alternate between the source-bearing branch and w002's
                # elif branch (no source key, technique == code_parser)
                {"source": "https://x/main/codemeta.json", "technique":
                 "code_parser", "confidence": 1,
                 "result": {"value": rng.choice(DATES), "type": "Date"}}
                if rng.random() < 0.5 else
                {"technique": "code_parser", "confidence": 1,
                 "result": {"value": rng.choice(DATES), "type": "Date"}},
            ],
            "reference_publication": (
                [{"source": "https://x/main/codemeta.json", "technique":
                  "code_parser", "confidence": 1,
                  "result": {"value": rng.choice(URLS), "type": "Url"}}]
                if rng.random() < 0.7 else []
            ) + (
                [{"source": "https://x/main/CITATION.cff", "technique":
                  "file_exploration", "confidence": 1,
                  "result": {"value": rng.choice(URLS), "type": "Url"}}]
                if rng.random() < 0.4 else []
            ),
            "citation": (
                [{"source": "https://x/main/CITATION.cff", "technique":
                  "file_exploration", "confidence": 1,
                  "result": {"value": v1[:120], "type": "Text_excerpt"}}]
                if rng.random() < 0.6 else []
            ),
            "programming_languages": [
                {"source": "https://x/main/codemeta.json", "technique":
                 "code_parser", "confidence": 1,
                 "result": rng.choice([
                     {"name": "Python", "value": "Python"},
                     {"name": "Python", "value": "Python", "version": None},
                     {"name": "Python", "value": "Python", "version": "3.11"},
                     {"name": "R", "value": "R", "version": ""},
                 ])},
            ],
        }
        # W001/W004 version-state coverage on the requirements entry
        files[f"fuzz_{i}"]["requirements"][0]["result"].update(
            rng.choice([
                {}, {"version": None}, {"version": ""}, {"version": "1.0"},
                {"version": "  "}, {"name": "pkg"},
            ])
        )
    return files


# the rules these synthetic files exercise (those reading the categories
# populated above)
FUZZ_RULES = (
    "P001", "P002", "P003", "P004", "P005", "P006", "P007", "P009", "P010",
    "P012", "P013", "P014", "P016", "P017", "P018",
    "W001", "W002", "W003", "W004", "W005", "W006", "W007", "W008", "W009",
    "W010",
)

_REF = {
    "P001": ("pitfalls.p001", "detect_version_mismatch"),
    "P005": ("pitfalls.p005", "detect_reference_publication_archive_pitfall"),
    "P007": ("pitfalls.p007",
             "detect_citation_missing_reference_publication_pitfall"),
    "P012": ("pitfalls.p012", "detect_outdated_download_url_pitfall"),
    "P017": ("pitfalls.p017", "detect_codemeta_version_mismatch_pitfall"),
    "W001": ("warnings.w001", "detect_unversioned_requirements"),
    "W002": ("warnings.w002", "detect_outdated_datemodified"),
    "W004": ("warnings.w004",
             "detect_programming_language_no_version_pitfall"),
    "P002": ("pitfalls.p002", "detect_license_template_placeholders"),
    "P003": ("pitfalls.p003", "detect_multiple_authors_single_field_pitfall"),
    "P004": ("pitfalls.p004", "detect_readme_homepage_pitfall"),
    "P006": ("pitfalls.p006", "detect_local_file_license_pitfall"),
    "P009": ("pitfalls.p009", "detect_coderepository_homepage_pitfall"),
    "P010": ("pitfalls.p010", "detect_copyright_only_license"),
    "P013": ("pitfalls.p013", "detect_license_no_version_pitfall"),
    "P014": ("pitfalls.p014", "detect_bare_doi_pitfall"),
    "P016": ("pitfalls.p016", "detect_different_repository_pitfall"),
    "P018": ("pitfalls.p018", "detect_raw_swhid_pitfall"),
    "W003": ("warnings.w003", "detect_dual_license_missing_codemeta_pitfall"),
    "W005": ("warnings.w005", "detect_multiple_requirements_string_warning"),
    "W006": ("warnings.w006", "detect_identifier_name_warning"),
    "W007": ("warnings.w007", "detect_empty_identifier_warning"),
    "W008": ("warnings.w008", "detect_author_name_list_warning"),
    "W009": ("warnings.w009", "detect_development_status_url_pitfall"),
    "W010": ("warnings.w010", "detect_git_remote_shorthand_pitfall"),
}


@pytest.fixture(scope="module")
def fuzz_corpus():
    return _gen_files()


def test_fuzz_matches_reference_source(spark, fuzz_corpus):
    import importlib

    ref_fns = {
        code: getattr(importlib.import_module(f"metacheck.scripts.{mod}"), fn)
        for code, (mod, fn) in _REF.items()
    }
    expected: dict[str, dict[str, bool]] = {}
    for fname, data in fuzz_corpus.items():
        row = {}
        for code, fn in ref_fns.items():
            try:
                r = fn(data, fname + ".json")
                row[code] = bool(
                    r.get("has_pitfall", False) or r.get("has_warning", False)
                )
            except Exception:
                row[code] = False  # main loop swallows detector errors
        expected[fname] = row

    rows = [
        r for fname, data in fuzz_corpus.items()
        for r in _normalize_one(fname + ".json", data)
    ]
    entries = spark.createDataFrame(rows, schema=_ENTRY_SCHEMA)
    flags = detect_flags(evidence_df(entries))
    mine = {
        r["file"].replace(".json", ""): r.asDict() for r in flags.collect()
    }
    diffs = []
    for fname, row in expected.items():
        for code in FUZZ_RULES:
            if bool(mine[fname][code.lower()]) != row[code]:
                diffs.append((fname, code))
    assert not diffs, f"{len(diffs)} disagreements, first: {diffs[:6]}"


def test_fuzz_offline_network_rules(spark, fuzz_corpus):
    """P008/P011/P015 under no-network semantics on the fuzz corpus —
    incl. the list/dict requirement_text path (vjoin) that the real
    corpus never exercises (its requirement values are all strings).
    Also fuzzes issue_tracker / continuous_integration entries."""
    import importlib

    rng = random.Random(21)
    corpus = {}
    for fname, data in fuzz_corpus.items():
        d = dict(data)
        d["issue_tracker"] = (
            [{"source": "https://x/main/codemeta.json", "technique":
              "code_parser", "confidence": 1,
              "result": {"value": rng.choice(URLS + [None]), "type": "Url"}}]
            if rng.random() < 0.6 else []
        )
        d["continuous_integration"] = (
            [{"source": "https://x/main/codemeta.json", "technique":
              "code_parser", "confidence": 1,
              "result": {"value": rng.choice(URLS), "type": "Url"}}]
            if rng.random() < 0.6 else []
        )
        corpus[fname] = d

    class _Fail:
        class exceptions:
            class RequestException(Exception):
                pass

        @staticmethod
        def get(*a, **k):
            raise _Fail.exceptions.RequestException("no network")

        head = get

    mods = {
        "P008": importlib.import_module("metacheck.scripts.pitfalls.p008"),
        "P011": importlib.import_module("metacheck.scripts.pitfalls.p011"),
        "P015": importlib.import_module("metacheck.scripts.pitfalls.p015"),
    }
    fns = {
        "P008": mods["P008"].detect_invalid_software_requirement_pitfall,
        "P011": mods["P011"].detect_issue_tracker_format_pitfall,
        "P015": mods["P015"].detect_ci_404_pitfall,
    }
    saved = {k: m.requests for k, m in mods.items()}
    try:
        for m in mods.values():
            m.requests = _Fail
        expected = {}
        for fname, data in corpus.items():
            row = {}
            for code, fn in fns.items():
                try:
                    row[code] = bool(
                        fn(data, fname + ".json").get("has_pitfall", False)
                    )
                except Exception:
                    row[code] = False
            expected[fname] = row
    finally:
        for k, m in mods.items():
            m.requests = saved[k]

    rows = [
        r for fname, data in corpus.items()
        for r in _normalize_one(fname + ".json", data)
    ]
    entries = spark.createDataFrame(rows, schema=_ENTRY_SCHEMA)
    flags = detect_flags(evidence_df(entries), offline_net=True)
    mine = {
        r["file"].replace(".json", ""): r.asDict() for r in flags.collect()
    }
    diffs = [
        (f, c) for f, row in expected.items()
        for c in ("P008", "P011", "P015")
        if bool(mine[f][c.lower()]) != row[c]
    ]
    assert not diffs, f"{len(diffs)} disagreements, first: {diffs[:6]}"


def test_expand_pstrip_nested():
    from rsmetacheck_spark.somef_parity import _expand_pstrip

    out = _expand_pstrip("pstrip(lower(pstrip(e.v)))")
    assert out == (
        "regexp_replace(lower(regexp_replace(e.v, '^\\\\s+|\\\\s+$', '')),"
        " '^\\\\s+|\\\\s+$', '')"
    )
    assert _expand_pstrip("no macro here") == "no macro here"
