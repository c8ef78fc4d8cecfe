"""Reference-corpus parity: run detector analogs over the reference's own
1,114 real somef outputs and compare per-rule flags against its 1,057
golden JSON-LD files (data/somef_outputs/ -> data/pitfalls_outputs/).
This is what BASELINE's "F1>=0.99 vs reference labels" literally asks for.

Architecture (Spark-first, same shape as the synthetic evidence model):

1. `load_somef_entries` — wholetext scan of the JSON files + ONE
   Arrow-batched mapInPandas normalization pass that flattens the
   heterogeneous somef JSON (result.value may be str | list | dict | null;
   source may live on the entry or inside result) into a typed long table.
   Python is used ONLY to normalize shapes, never to decide rules.
2. `evidence_df` — one groupBy(file) building a sorted array<struct> of
   entries per file (the same per-row evidence-array layout ev01-ev09 use).
3. `detect_flags` — EVERY detector as a whole-stage-codegen Catalyst array
   expression over that array: zero shuffle, zero Python, one scan for all
   26 rules.
4. `golden_labels` — parse the golden JSON-LDs into (file, rule) labels.

Detector semantics mirror the reference branch-for-branch (file:line cites
inline), including its quirks, which are load-bearing for label parity:
  - p013.py:61: re.search(rf"\\b{name}\\b", license_UPPER) is
    case-sensitive, so the mixed-case family name "Apache" can never match
    the uppercased text — the Apache family is dead code in the reference.
  - p017.py:47 / p009.py:99 / w010.py:60: `any(src in source.lower())`
    with "DESCRIPTION" uppercase in the list — that element never matches
    a lowercased string.
  - p016.py:55: the GitHub_API url is overwritten per entry, so the LAST
    GitHub_API entry wins.
  - p019.py:11 reads key "author" (singular) which never occurs in somef
    output — P019 cannot fire on this corpus.
  - w001.py:25/29: only the FIRST metadata-source requirements entry is
    analyzed, and each entry contributes its result dict as ONE
    requirement.

The three network rules (P008/P011/P015) need live HTTP at golden-creation
time, so they are excluded from the GOLDEN F1 gate; they ARE source-exact
under no-network semantics (OFFLINE_NETWORK_EXPRS vs the reference run
with `requests` patched to raise), and their status thresholds are
oracle-checked separately in evidence_net.py / ev10. The summary aggregate
(real_summary) reproduces the reference main loop's per-rule count /
percentage / language breakdown exactly.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SOMEF_DIR = "/root/reference/data/somef_outputs"
GOLDEN_DIR = "/root/reference/data/pitfalls_outputs"

# the 26 offline-reproducible rules (network rules excluded, see module doc)
PARITY_RULES = (
    "P001", "P002", "P003", "P004", "P005", "P006", "P007", "P009", "P010",
    "P012", "P013", "P014", "P016", "P017", "P018", "P019",
    "W001", "W002", "W003", "W004", "W005", "W006", "W007", "W008", "W009",
    "W010",
)
NETWORK_RULES = ("P008", "P011", "P015")

_ENTRY_SCHEMA = T.StructType([
    T.StructField("file", T.StringType()),
    T.StructField("cat", T.StringType()),
    T.StructField("idx", T.IntegerType()),
    T.StructField("src", T.StringType()),        # null = key absent
    T.StructField("rsrc", T.StringType()),       # result.source
    T.StructField("tech", T.StringType()),       # null = key absent
    T.StructField("has_result", T.BooleanType()),
    T.StructField("rkind", T.StringType()),      # kind of entry.result
    T.StructField("rllen", T.IntegerType()),     # len(result) if list
    T.StructField("vkind", T.StringType()),      # kind of result.value
    T.StructField("v", T.StringType()),          # value as string
    T.StructField("vname", T.StringType()),      # value["name"] if dict
    T.StructField("vnamek", T.StringType()),
    T.StructField("vllen", T.IntegerType()),     # len(value) if list
    T.StructField("vfirst", T.StringType()),     # value[0] if 1-elem list
    T.StructField("vjoin", T.StringType()),      # p008's requirement_text
                                                 # for list/dict values
    T.StructField("rrtag", T.StringType()),      # result.tag
    T.StructField("rrname", T.StringType()),     # result.name
    T.StructField("rvstate", T.StringType()),    # result.version state
    T.StructField("rver", T.StringType()),
])


def _kind(x) -> str:
    if x is None:
        return "null"
    if isinstance(x, bool):
        return "bool"
    if isinstance(x, str):
        return "str"
    if isinstance(x, (int, float)):
        return "num"
    if isinstance(x, list):
        return "list"
    if isinstance(x, dict):
        return "dict"
    return "other"


def _as_str(x) -> str | None:
    if isinstance(x, str):
        return x
    if isinstance(x, bool):
        return str(x)
    if isinstance(x, (int, float)):
        return str(x)
    return None


def _normalize_one(fname: str, data: dict) -> Iterator[dict]:
    yielded = False
    for row in _normalize_entries(fname, data):
        yielded = True
        yield row
    if not yielded:
        # a file with no list-typed categories still needs a row so it
        # appears downstream with all-false flags (e.g. a somef output
        # holding only somef_provenance)
        yield {
            "file": fname, "cat": "__none__", "idx": 0, "src": None,
            "rsrc": None, "tech": None, "has_result": False,
            "rkind": "absent", "rllen": -1, "vkind": "absent", "v": None,
            "vname": None, "vnamek": None, "vllen": -1, "vfirst": None,
            "vjoin": None,
            "rrtag": None, "rrname": None, "rvstate": "absent", "rver": None,
        }


def _normalize_entries(fname: str, data: dict) -> Iterator[dict]:
    for cat, entries in data.items():
        if not isinstance(entries, list):
            continue
        for idx, e in enumerate(entries):
            if not isinstance(e, dict):
                continue
            r = e.get("result") if "result" in e else None
            has_result = "result" in e
            rkind = _kind(r) if has_result else "absent"
            v = r.get("value") if isinstance(r, dict) and "value" in r else None
            vkind = (
                _kind(v) if isinstance(r, dict) and "value" in r else "absent"
            )
            vname = v.get("name") if isinstance(v, dict) and "name" in v else None
            rvstate = "absent"
            rver = None
            if isinstance(r, dict) and "version" in r:
                ver = r["version"]
                if ver is None:
                    rvstate = "null"
                elif isinstance(ver, str):
                    rvstate, rver = "str", ver
                else:
                    rvstate, rver = "other", _as_str(ver)
            yield {
                "file": fname,
                "cat": cat,
                "idx": idx,
                "src": e.get("source") if "source" in e else None,
                "rsrc": r.get("source") if isinstance(r, dict) else None,
                "tech": e.get("technique") if "technique" in e else None,
                "has_result": has_result,
                "rkind": rkind,
                "rllen": len(r) if isinstance(r, list) else -1,
                "vkind": vkind,
                "v": _as_str(v),
                "vname": _as_str(vname),
                "vnamek": _kind(vname) if vname is not None else None,
                "vllen": len(v) if isinstance(v, list) else -1,
                "vfirst": (
                    v[0] if isinstance(v, list) and len(v) == 1
                    and isinstance(v[0], str) else None
                ),
                # p008.py:137-146's requirement_text for non-str values:
                # lists join str(item) with ' '; dicts concatenate the
                # name/value/description/text keys each + ' '
                "vjoin": (
                    " ".join(str(item) for item in v)
                    if isinstance(v, list) else (
                        "".join(
                            str(v[k]) + " "
                            for k in ("name", "value", "description", "text")
                            if k in v
                        ) if isinstance(v, dict) else None
                    )
                ),
                "rrtag": r.get("tag") if isinstance(r, dict)
                and isinstance(r.get("tag"), str) else None,
                "rrname": r.get("name") if isinstance(r, dict)
                and isinstance(r.get("name"), str) else None,
                "rvstate": rvstate,
                "rver": rver,
            }


def entries_from_content(raw: DataFrame) -> DataFrame:
    """(file, value) content table -> normalized typed entry table, one
    Arrow-batched mapInPandas pass. This is the scale path: at 10^7 repos
    the inputs live in a columnar manifest table, not a directory of tiny
    JSON files (file-per-row listing and open() costs dominate long before
    parse does)."""

    names = [f.name for f in _ENTRY_SCHEMA.fields]

    def norm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar accumulation: one list per field, one DataFrame per
            # batch — building per-entry dicts + a from-records DataFrame
            # was the measured bottleneck at 10^5 repos (≈8M entry rows)
            cols: dict[str, list] = {n: [] for n in names}
            for fname, content in zip(pdf["file"], pdf["value"]):
                try:
                    data = json.loads(content)
                except Exception:
                    continue  # main loop: JSONDecodeError -> file skipped
                if isinstance(data, dict):
                    for row in _normalize_one(fname, data):
                        for n in names:
                            cols[n].append(row[n])
            yield pd.DataFrame(cols, columns=names)

    return raw.mapInPandas(norm, schema=_ENTRY_SCHEMA)


def load_somef_entries(spark: SparkSession, somef_dir: str = SOMEF_DIR) -> DataFrame:
    """Wholetext directory scan -> entries_from_content (the small-scale
    convenience entry; the manifest-table path is entries_from_content)."""
    raw = (
        spark.read.option("wholetext", "true")
        .text(os.path.join(somef_dir, "*.json"))
        .select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file"),
            F.col("value"),
        )
    )
    return entries_from_content(raw)


def evidence_df(entries: DataFrame) -> DataFrame:
    """One shuffle: per-file sorted evidence array (cat, idx order)."""
    cols = [f.name for f in _ENTRY_SCHEMA.fields if f.name != "file"]
    return entries.groupBy("file").agg(
        F.sort_array(F.collect_list(F.struct(*cols))).alias("ev")
    )


# ---------------------------------------------------------------------------
# Detector expressions (Spark SQL over the `ev` array column)
# ---------------------------------------------------------------------------

# metadata-source lists: case-sensitive raw-substring variant and the
# lowercase-matched variants (with and without the dead "DESCRIPTION")
M_CS = ("codemeta.json", "DESCRIPTION", "composer.json", "package.json",
        "pom.xml", "pyproject.toml", "requirements.txt", "setup.py")
M_LOWER = ("codemeta.json", "description", "composer.json", "package.json",
           "pom.xml", "pyproject.toml", "requirements.txt", "setup.py")
M_LOWER_NODESC = tuple(m for m in M_LOWER if m != "description")

ES = "coalesce(e.src, '')"       # entry.get("source", "")
TE = "coalesce(e.tech, '')"      # entry.get("technique", "")


def _any_contains(col: str, items: tuple[str, ...]) -> str:
    return "(" + " OR ".join(f"contains({col}, '{i}')" for i in items) + ")"


def _flt(cond: str) -> str:
    return f"filter(ev, e -> {cond})"


def _fst(cond: str) -> str:
    return f"try_element_at({_flt(cond)}, 1)"


def _ex(cond: str) -> str:
    return f"exists(ev, e -> {cond})"


def _hasv(extra: str = "") -> str:
    # `"result" in entry and "value" in entry["result"]`
    return "e.vkind <> 'absent'" + (f" AND {extra}" if extra else "")


_CODEMETA = (
    f"(contains({ES}, 'codemeta.json')"
    f" OR ({TE} = 'code_parser' AND contains(lower({ES}), 'codemeta')))"
)


def _norm_v(x: str) -> str:
    """pitfall_utils.normalize_version: strip ^v (any case) then strip."""
    return f"pstrip(regexp_replace({x}, '^[vV]', ''))"


def _p001() -> str:
    """p001.py:5-94: first metadata-source version vs releases[0] tag."""
    meta_match = (
        f"(e.src IS NOT NULL AND {_any_contains('e.src', M_CS)})"
        f" OR (e.src IS NULL AND e.rsrc IS NOT NULL"
        f" AND {_any_contains('e.rsrc', M_CS)})"
    )
    mv = _fst(f"e.cat = 'version' AND ({meta_match}) AND {_hasv()}") + ".v"
    rel = _fst("e.cat = 'releases'") + ".rrtag"
    return (
        f"{mv} IS NOT NULL AND {rel} IS NOT NULL AND {rel} <> ''"
        f" AND {_norm_v(mv)} <> {_norm_v(rel)}"
    )


def _p017() -> str:
    """p017.py: codemeta version vs every other metadata version (raw
    .strip() compare, no v-normalization)."""
    cm = _fst(f"e.cat = 'version' AND {_CODEMETA} AND {_hasv()}") + ".v"
    others = _flt(
        f"e.cat = 'version' AND NOT contains({ES}, 'codemeta.json')"
        f" AND ({TE} = 'code_parser'"
        f" OR {_any_contains(f'lower({ES})', M_LOWER_NODESC)})"
        f" AND {_hasv()}"
    )
    return (
        f"{cm} IS NOT NULL AND {cm} <> ''"
        f" AND exists({others}, o -> pstrip(o.v) <> pstrip({cm}))"
    )


def _p012() -> str:
    """p012.py: version parsed out of the codemeta downloadURL vs the
    latest release tag/name, both through p012's own lowercasing norm."""
    url = _fst(
        f"e.cat = 'download_url' AND (contains(lower({ES}), 'codemeta.json')"
        f" OR ({TE} = 'code_parser' AND contains(lower({ES}), 'codemeta')))"
        f" AND {_hasv()}"
    ) + ".v"
    vnum = r"(\\d+\\.\\d+(?:\\.\\d+)?(?:[a-zA-Z0-9\\-\\.]*)?)"
    pats = [
        rf"/archive/(?:v)?{vnum}\\.",
        rf"/archive/(?:v)?{vnum}$",
        rf"[-_](?:v)?{vnum}\\.",
        rf"/(?:v)?{vnum}/[^/]*$",
    ]
    ex = "(CASE " + " ".join(
        f"WHEN regexp_extract({url}, '{p}', 1) <> ''"
        f" THEN regexp_extract({url}, '{p}', 1)"
        for p in pats
    ) + " ELSE '' END)"
    dlv = rf"regexp_replace({ex}, '\\.(tar|gz|zip|bz2|xz|tgz).*$', '')"
    rel0 = _fst("e.cat = 'releases'")
    tag = f"{rel0}.rrtag"
    name_ver = rf"regexp_extract({rel0}.rrname, '(?:v)?{vnum}', 1)"
    rel = (
        f"(CASE WHEN {tag} IS NOT NULL AND pstrip({tag}) <> '' THEN pstrip({tag})"
        f" WHEN {rel0}.rrname IS NOT NULL AND {rel0}.rrname <> ''"
        f" AND {name_ver} <> '' THEN {name_ver} ELSE NULL END)"
    )

    def p012norm(x: str) -> str:  # strip, lower, drop ONE leading v
        return f"regexp_replace(lower(pstrip({x})), '^v', '')"

    return (
        f"{url} IS NOT NULL AND {url} <> '' AND {dlv} <> ''"
        f" AND {rel} IS NOT NULL AND {p012norm(rel)} <> ''"
        f" AND {p012norm(dlv)} <> '' AND {p012norm(dlv)} <> {p012norm(rel)}"
    )


_P002_RX = (
    "(<program>|<year>|<name of author>|<name>|<copyright holders?>|<owner>"
    r"|<author>|\\[year\\]|\\[fullname\\]|\\[name\\]|\\[copyright holder\\]"
    "|<yyyy>|<name of copyright owner>)"
)


def _p002() -> str:
    """p002.py: LICENSE.md content contains template placeholders."""
    c = _fst(
        "e.cat = 'license' AND e.src IS NOT NULL"
        f" AND contains(e.src, 'LICENSE.md') AND {_hasv()}"
    ) + ".v"
    return f"{c} IS NOT NULL AND {c} <> '' AND lower({c}) rlike '{_P002_RX}'"


_P010_CR = (
    r"(year\\s*:\\s*\\d{4}|copyright\\s+holder\\s*:\\s*[a-zA-Z]"
    r"|author\\s*:\\s*[a-zA-Z]|copyright\\s*©?\\s*\\d{4}|\\(c\\)\\s*\\d{4})"
)
_P010_LT = (
    r"(permission\\s+is\\s+hereby\\s+granted"
    r"|subject\\s+to\\s+the\\s+following\\s+conditions"
    r"|redistribution\\s+and\\s+use|without\\s+restriction"
    r"|without\\s+warranty|liability|terms\\s+and\\s+conditions"
    r"|licensed\\s+under|mit\\s+license|apache\\s+license"
    r"|gnu\\s+general\\s+public\\s+license|bsd\\s+license|creative\\s+commons)"
)


def _p010() -> str:
    """p010.py:29-102 — copyright-only LICENSE: three fire branches over
    line counts and pattern presence."""
    c = _fst(
        "e.cat = 'license' AND e.src IS NOT NULL"
        f" AND contains(upper(e.src), 'LICENSE') AND {_hasv()}"
    ) + ".v"
    cl = f"lower(pstrip({c}))"
    lines = rf"filter(transform(split(pstrip({c}), '\\n'), x -> pstrip(x)), x -> x <> '')"
    nl = f"size({lines})"
    has_cr = f"{cl} rlike '{_P010_CR}'"
    has_lt = f"{cl} rlike '{_P010_LT}'"
    year = rf"{cl} rlike 'year\\s*:\\s*\\d{{4}}'"
    holder = rf"{cl} rlike 'copyright\\s+holder\\s*:'"
    meaningful = (
        f"size(filter({lines}, x -> NOT (lower(x) rlike '{_P010_CR}')"
        " AND NOT startswith(x, '#') AND NOT startswith(x, '//')"
        " AND NOT x IN ('-', '=', '*')))"
    )
    return (
        f"{c} IS NOT NULL AND {c} <> '' AND NOT ({has_lt}) AND ("
        f"({has_cr} AND {nl} <= 10)"
        f" OR ({year} AND {holder})"
        f" OR ({nl} <= 5 AND {meaningful} <= 1 AND {has_cr}))"
    )


def _p013() -> str:
    """p013.py: versionless license family in a code_parser metadata
    entry; 0BSD / LICENSEREF- skips; family \\b-search against the
    UPPERCASED value (which makes 'Apache' unmatchable — kept as-is)."""
    fam = []
    for name, ver_pat in (
        # leading \b kept from p013.py:29-34 — without it GPL-2.1 matches
        # INSIDE 'LGPL-2.1' and suppresses a standalone unversioned GPL
        ("GPL", r"\\bGPL[-\\s]?\\d+(\\.\\d+)?"),
        ("LGPL", r"\\bLGPL[-\\s]?\\d+(\\.\\d+)?"),
        ("AGPL", r"\\bAGPL[-\\s]?\\d+(\\.\\d+)?"),
        ("Apache", r"\\bApache[-\\s]?\\d+(\\.\\d+)?"),
        ("CC", r"\\bCC[- ]BY[-\\s]?\\d+(\\.\\d+)?"),
        ("BSD", r"\\bBSD[-\\s]\\d+[-\\s]Clause"),
    ):
        fam.append(
            rf"(upper(e.v) rlike '\\b{name}\\b'"
            rf" AND NOT upper(e.v) rlike '(?i){ver_pat}')"
        )
    return _ex(
        f"e.cat = 'license' AND {TE} = 'code_parser'"
        f" AND {_any_contains(ES, M_CS)} AND {_hasv()} AND e.vkind = 'str'"
        " AND NOT contains(e.v, '0BSD')"
        " AND NOT contains(upper(e.v), 'LICENSEREF-')"
        " AND (" + " OR ".join(fam) + ")"
    )


_P003_RX = r"(?i)( and | & |,(?!\\s+Jr\\.?)|;|\\n)"


def _p003() -> str:
    """p003.py: multiple authors in one string field (str or dict.name)."""
    multi = lambda x: rf"pstrip({x}) rlike '{_P003_RX}'"  # noqa: E731
    return _ex(
        f"e.cat = 'authors' AND {TE} = 'code_parser'"
        f" AND {_any_contains(f'lower({ES})', M_LOWER)} AND {_hasv()}"
        f" AND ((e.vkind = 'str' AND {multi('e.v')})"
        f" OR (e.vkind = 'dict' AND e.vnamek = 'str' AND {multi('e.vname')}))"
    )


def _w008() -> str:
    """w008.py: bracketed list embedded in an author string."""
    return _ex(
        f"e.cat = 'authors' AND {TE} = 'code_parser'"
        f" AND {_any_contains(ES, M_CS)} AND {_hasv()} AND e.vkind = 'str'"
        r" AND exists(regexp_extract_all(e.v, '\\[(.*?)\\]', 1),"
        " c -> contains(c, ','))"
    )


def _p004() -> str:
    """p004.py: codemeta readme URL classified as homepage/wiki."""
    ul = "lower(e.v)"
    indicators = _any_contains(
        ul, (".readthedocs.io", ".github.io", "wiki", "docs.", "documentation")
    )
    generic = _any_contains(ul, (".org", ".com", ".net"))
    exts = _any_contains(ul, (".md", ".txt", ".rst", ".html", "readme"))
    is_home = (
        f"(NOT contains({ul}, 'raw.githubusercontent.com') AND"
        f" (CASE WHEN contains({ul}, 'github.com') OR contains({ul}, 'gitlab.com')"
        f" THEN NOT (contains({ul}, 'readme') OR contains({ul}, 'blob/'))"
        f" ELSE {indicators} OR ({generic} AND NOT {exts}) END))"
    )
    return _ex(
        "e.cat = 'readme_url' AND e.tech = 'code_parser'"
        " AND e.src IS NOT NULL AND contains(e.src, 'codemeta.json')"
        f" AND {_hasv()} AND e.vkind = 'str' AND e.v <> '' AND {is_home}"
    )


_P005_RX = (
    r"(zenodo\\.org|figshare\\.com|github\\.com/.*/releases|sourceforge\\.net"
    r"|archive\\.org|codeocean\\.com|osf\\.io|doi\\.org/10\\.5281)"
)


def _p005() -> str:
    """p005.py: referencePublication points at a software archive."""
    return _ex(
        f"e.cat = 'reference_publication' AND {_CODEMETA} AND {_hasv()}"
        f" AND e.vkind = 'str' AND lower(pstrip(e.v)) rlike '{_P005_RX}'"
    )


_P006_NAMES = (
    "license", "license.md", "license.txt", "license.rst",
    "copying", "copying.md", "copying.txt",
    "copyright", "copyright.md", "copyright.txt",
    "licence", "licence.md", "licence.txt", "readme.md", "doc.txt", "file.rst",
)


def _p006() -> str:
    """p006.py: license value is a local path, not a license name."""
    ll = "lower(pstrip(e.v))"
    names = ", ".join(f"'{n}'" for n in _P006_NAMES)
    local = (
        f"(NOT (startswith({ll}, 'http://') OR startswith({ll}, 'https://'))"
        f" AND (startswith(e.v, './') OR startswith(e.v, '../')"
        f" OR contains(e.v, '/') OR contains(e.v, '\\\\')"
        f" OR {ll} IN ({names})"
        f" OR endswith({ll}, '.md') OR endswith({ll}, '.txt')"
        f" OR endswith({ll}, '.rst')))"
    )
    return _ex(
        f"e.cat = 'license' AND ({TE} = 'code_parser'"
        f" OR {_any_contains(f'lower({ES})', M_LOWER)})"
        f" AND {_hasv()} AND e.vkind = 'str' AND e.v <> '' AND {local}"
    )


def _p007() -> str:
    """p007.py: codemeta has referencePublication, CITATION.cff exists but
    lacks one."""
    cm_ref = _ex(
        f"e.cat = 'reference_publication' AND {TE} = 'code_parser'"
        f" AND contains({ES}, 'codemeta.json') AND {_hasv()}"
    )
    cff_ref = _ex(
        "e.cat = 'reference_publication'"
        f" AND NOT ({TE} = 'code_parser' AND contains({ES}, 'codemeta.json'))"
        f" AND contains({ES}, 'CITATION.cff') AND {_hasv()}"
    )
    cff_exists = _ex(
        "e.cat IN ('authors', 'title', 'description', 'version', 'license')"
        f" AND contains({ES}, 'CITATION.cff')"
    )
    return f"{cm_ref} AND {cff_exists} AND NOT {cff_ref}"


def _p009() -> str:
    """p009.py: codeRepository value classified as homepage."""
    ul = "lower(e.v)"
    repo_ind = _any_contains(ul, (
        "github.com/", "github.org/", "gitlab.com/", "gitlab.org/",
        "bitbucket.org/", "bitbucket.net/", "sourceforge.net/projects/",
        "git.", ".git",
    ))
    is_repo = f"(NOT contains({ul}, 'github.io') AND {repo_ind})"
    home_ind = _any_contains(ul, (
        ".org/", ".com/", ".net/", ".io/", "www.", "docs.", "documentation",
        "readthedocs", "github.io",
    ))
    techs = ", ".join(f"'{m}'" for m in M_CS)
    return _ex(
        f"e.cat = 'code_repository' AND ({TE} = 'code_parser'"
        f" OR {TE} IN ({techs})"
        f" OR {_any_contains(f'lower({ES})', M_LOWER_NODESC)})"
        f" AND {_hasv()} AND e.vkind = 'str' AND e.v <> ''"
        f" AND NOT {is_repo} AND {home_ind}"
    )


def _p014() -> str:
    """p014.py: bare DOI in codemeta identifier."""
    t = "pstrip(e.v)"
    return _ex(
        f"e.cat = 'identifier' AND {_CODEMETA} AND {_hasv()}"
        f" AND e.vkind = 'str' AND NOT startswith({t}, 'https://doi.org/')"
        rf" AND ({t} rlike '^doi:10\\.\\d+/' OR {t} rlike '^10\\.\\d+/')"
    )


def _p018() -> str:
    """p018.py: raw SWHID in codemeta identifier."""
    t = "pstrip(e.v)"
    return _ex(
        f"e.cat = 'identifier' AND {_CODEMETA} AND {_hasv()}"
        f" AND e.vkind = 'str'"
        f" AND NOT (startswith({t}, 'http://') OR startswith({t}, 'https://'))"
        rf" AND {t} rlike '^swh:1:[a-z]+:[a-f0-9]{{40}}$'"
    )


def _w007() -> str:
    """w007.py: empty codemeta identifier (falsy value or blank string)."""
    return _ex(
        f"e.cat = 'identifier' AND {_CODEMETA} AND {_hasv()}"
        " AND (e.vkind = 'null'"
        " OR (e.vkind = 'str' AND pstrip(e.v) = '')"
        " OR (e.vkind = 'list' AND e.vllen = 0)"
        " OR (e.vkind = 'num' AND e.v IN ('0', '0.0')))"
    )


def _w006_valid(x: str) -> str:
    """w006.py:5-43 is_valid_identifier as one CASE chain (str input)."""
    t = f"pstrip({x})"
    stripped = rf"regexp_replace({t}, '[ \\-_]', '')"
    return (
        f"(CASE WHEN {t} = '' THEN false"
        rf" WHEN {t} rlike '(?i)^doi:10\\.\\d+/.+' THEN true"
        rf" WHEN {t} rlike '(?i)^10\\.\\d+/.+' THEN true"
        f" WHEN lower({t}) IN ('doi:', '10.') THEN false"
        rf" WHEN {t} rlike '(?i)^https?://.+' THEN true"
        f" WHEN startswith(lower({t}), 'ftp://') THEN false"
        f" WHEN contains({t}, ' ') AND NOT (contains({t}, '/')"
        f" OR contains({t}, ':') OR contains({t}, '.')) THEN false"
        rf" WHEN {stripped} rlike '^\\p{{L}}+$' THEN false"
        " ELSE true END)"
    )


def _w006() -> str:
    """w006.py: codemeta identifier is a name while a valid identifier
    exists in another source."""
    cm = _fst(f"e.cat = 'identifier' AND {_CODEMETA} AND {_hasv()}")
    cm_truthy = (
        f"((({cm}).vkind = 'str' AND ({cm}).v <> '')"
        f" OR (({cm}).vkind = 'list' AND ({cm}).vllen > 0)"
        f" OR ({cm}).vkind = 'dict'"
        f" OR (({cm}).vkind = 'num' AND NOT ({cm}).v IN ('0', '0.0')))"
    )
    cm_valid = f"(({cm}).vkind = 'str' AND {_w006_valid(f'({cm}).v')})"
    other_valid = _ex(
        f"e.cat = 'identifier' AND NOT {_CODEMETA} AND {_hasv()}"
        f" AND e.vkind = 'str' AND {_w006_valid('e.v')}"
    )
    return (
        f"{cm} IS NOT NULL AND {cm_truthy} AND NOT {cm_valid}"
        f" AND {other_valid}"
    )


_W002_FORMATS = (
    "yyyy-MM-dd'T'HH:mm:ss'Z'",
    "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'",
    "yyyy-MM-dd",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
)


def _w002_parse(x: str) -> str:
    tries = ", ".join(
        f'try_to_timestamp(pstrip({x}), "{f}")' for f in _W002_FORMATS
    )
    prefix = (
        rf"try_to_timestamp(regexp_extract(pstrip({x}),"
        rf" '^(\\d{{4}}-\\d{{2}}-\\d{{2}})', 1), 'yyyy-MM-dd')"
    )
    return f"coalesce({tries}, {prefix})"


def _w002() -> str:
    """w002.py: codemeta dateModified older than the GitHub API update by
    more than one full day."""
    gh = _fst(
        "e.cat = 'date_updated' AND e.tech = 'GitHub_API'"
        f" AND {_hasv()}"
    ) + ".v"
    cm = _fst(
        "e.cat = 'date_updated' AND"
        " ((e.src IS NOT NULL AND contains(e.src, 'codemeta.json'))"
        " OR (e.src IS NULL AND e.tech = 'code_parser'))"
        f" AND {_hasv()}"
    ) + ".v"
    gts, cts = _w002_parse(gh), _w002_parse(cm)
    return (
        f"{gh} IS NOT NULL AND {cm} IS NOT NULL"
        f" AND {gts} IS NOT NULL AND {cts} IS NOT NULL AND {gts} > {cts}"
        f" AND (unix_timestamp({gts}) - unix_timestamp({cts})) DIV 86400 > 1"
    )


_W003_RX = (
    r"(dual[\\s-]?licen[cs]ed?|dually[\\s-]?licen[cs]ed?"
    r"|multiple[\\s-]?licen[cs]es?"
    r"|(?:is|are)\\s+licen[cs]ed?\\s+under.*(?:and|or).*licen[cs]e"
    r"|choose.*(?:between|from).*licen[cs]e|either.*or.*licen[cs]e"
    r"|\\d+\\..*licen[cs]e.*\\n.*\\d+\\..*licen[cs]e"
    r"|licen[cs]e.*options?"
    r"|available\\s+under.*(?:two|multiple|either).*licen[cs]es?)"
)


def _w003() -> str:
    """w003.py: dual-license wording anywhere while codemeta lists <= 1."""
    cm_licenses = _flt(
        f"e.cat = 'license' AND {TE} = 'code_parser'"
        f" AND contains({ES}, 'codemeta.json')"
    )
    cm_count = f"size({cm_licenses})"
    indicator = _ex(
        "e.cat = 'license'"
        f" AND NOT ({TE} = 'code_parser' AND contains({ES}, 'codemeta.json'))"
        f" AND {_hasv()} AND e.vkind = 'str'"
        f" AND lower(e.v) rlike '{_W003_RX}'"
    )
    return f"{indicator} AND {cm_count} <= 1"


def _w004() -> str:
    """w004.py: codemeta programming_languages / requirements entry whose
    result lacks a version (absent key or null)."""
    base = (
        f"{TE} = 'code_parser' AND contains({ES}, 'codemeta.json')"
        " AND e.has_result AND e.rvstate IN ('absent', 'null')"
    )
    return _ex(
        f"(e.cat = 'programming_languages' OR e.cat = 'requirements')"
        f" AND {base}"
    )


def _w001() -> str:
    """w001.py: the FIRST metadata-source requirements entry, one
    requirement = its result dict; unversioned iff neither a non-empty
    result.version nor a version operator inside result.value."""
    first = _fst(
        "e.cat = 'requirements' AND e.src IS NOT NULL"
        f" AND {_any_contains('e.src', M_CS)} AND e.has_result"
    )
    ops = _any_contains(
        f"({first}).v", ("==", ">=", "<=", ">", "<", "~=", "!=", "^", "~")
    )
    has_version = (
        f"((({first}).rvstate = 'str' AND pstrip(({first}).rver) <> '')"
        f" OR (({first}).vkind = 'str' AND {ops}))"
    )
    return (
        f"{first} IS NOT NULL AND ({first}).rkind = 'dict'"
        f" AND NOT {has_version}"
    )


def _w005() -> str:
    """w005.py: several requirements jammed into one string (or a
    single-element list), split on runs of spaces, else on capitalized
    word boundaries."""
    def multi(x: str) -> str:
        t = f"pstrip({x})"
        cnt1 = (
            rf"size(filter(transform(split({t}, '\\s{{2,}}'),"
            " p -> pstrip(p)), p -> p <> ''))"
        )
        cnt2 = (
            rf"size(filter(transform(split({t}, '\\s+(?=[A-Z])'),"
            " p -> pstrip(p)), p -> p <> ''))"
        )
        return (
            rf"(CASE WHEN {t} rlike '\\s{{2,}}' AND {cnt1} > 0"
            rf" THEN {cnt1} > 1"
            rf" ELSE {t} rlike '\\s+[A-Z][A-Za-z]' AND {cnt2} > 1 END)"
        )

    techs = ", ".join(f"'{m}'" for m in M_CS)
    return _ex(
        f"e.cat = 'requirements' AND ({TE} IN ({techs})"
        f" OR {_any_contains(f'lower({ES})', ('codemeta.json', 'setup.py', 'pom.xml'))})"
        f" AND {_hasv()}"
        f" AND ((e.vkind = 'str' AND {multi('e.v')})"
        f" OR (e.vkind = 'list' AND e.vllen = 1 AND e.vfirst IS NOT NULL"
        f" AND {multi('e.vfirst')}))"
    )


_W009_RX = r"(^https?://|^www\\.|\\.org|\\.com|\\.net)"


def _w009() -> str:
    """w009.py: developmentStatus value looks like a URL."""
    return _ex(
        f"e.cat = 'development_status' AND {_CODEMETA} AND {_hasv()}"
        f" AND e.vkind = 'str' AND lower(pstrip(e.v)) rlike '{_W009_RX}'"
    )


def _w010() -> str:
    """w010.py: git remote shorthand (host:path) as codeRepository."""
    t = "pstrip(e.v)"
    return _ex(
        f"e.cat = 'code_repository' AND ({TE} = 'code_parser'"
        f" OR {_any_contains(f'lower({ES})', M_LOWER_NODESC)})"
        f" AND {_hasv()} AND e.vkind = 'str'"
        f" AND NOT (startswith({t}, 'http://') OR startswith({t}, 'https://'))"
        rf" AND ({t} rlike '^[a-zA-Z0-9.-]+:[a-zA-Z0-9._/-]+\\.git$'"
        rf" OR {t} rlike '^[a-zA-Z0-9.-]+:[a-zA-Z0-9._/-]+$')"
    )


def _p016_norm(x: str) -> str:
    """p016.py:4-21 normalize chain, in its exact order."""
    y = f"lower(pstrip({x}))"
    y = rf"regexp_replace({y}, '^git\\+', '')"
    y = f"regexp_replace({y}, '/$', '')"
    y = rf"regexp_replace({y}, '\\.git$', '')"
    return rf"regexp_replace({y}, '^git@([^:]+):', 'https://$1/')"


def _p016() -> str:
    """p016.py: LAST GitHub_API repo URL vs every codemeta repo URL.
    Crash semantics replicated: the reference normalizes the (possibly
    non-string) LAST GitHub_API value and every collected codemeta value;
    any non-string raises inside the detector, which the main loop turns
    into not-fired — so the flag requires the last API entry and ALL
    codemeta entries to be strings."""
    api_entries = _flt(
        f"e.cat = 'code_repository' AND {_hasv()}"
        f" AND {TE} = 'GitHub_API'"
    )
    api = f"try_element_at({api_entries}, -1)"
    metas_any = _flt(
        "e.cat = 'code_repository'"
        f" AND {_hasv()} AND NOT {TE} = 'GitHub_API'"
        f" AND contains(lower({ES}), 'codemeta.json')"
    )
    metas = _flt(
        "e.cat = 'code_repository'"
        f" AND {_hasv()} AND NOT {TE} = 'GitHub_API'"
        f" AND contains(lower({ES}), 'codemeta.json') AND e.vkind = 'str'"
    )
    return (
        f"size({api_entries}) > 0"
        f" AND ({api}).vkind = 'str' AND ({api}).v <> ''"
        f" AND NOT exists({metas_any}, m -> m.vkind <> 'str')"
        f" AND exists({metas},"
        f" m -> {_p016_norm('m.v')} <> {_p016_norm(f'({api}).v')})"
    )


def _p019() -> str:
    """p019.py: author-count inconsistency over key 'author' (singular —
    absent from somef output, so this cannot fire on the corpus; the
    shape is still implemented faithfully)."""
    srcs = _flt(
        "e.cat = 'author' AND e.src IS NOT NULL AND e.has_result"
        " AND ((e.rkind = 'list' AND e.rllen > 0)"
        " OR e.rkind IN ('dict', 'str'))"
    )
    counts = (
        f"transform({srcs},"
        " e -> CASE WHEN e.rkind = 'list' THEN e.rllen ELSE 1 END)"
    )
    return f"size(array_distinct({counts})) > 1"


# ---------------------------------------------------------------------------
# Golden-era reconstructions. The golden JSON-LD corpus was generated by an
# OLDER version of the reference than the shipped source: running the
# CURRENT reference detectors in-process over the corpus reproduces the
# same disagreement with the goldens that the expressions above do (e.g.
# golden P007 fires on files that lack the `reference_publication` key the
# current p007.py requires). For P007 and P013 the golden-era semantics
# were reconstructed from the corpus and verified EXACT (29/0/0 and
# 233/0/0 confusion vs the goldens); P009/P012/W003 golden drift is
# reported but not reconstructed.
# ---------------------------------------------------------------------------


def _p007_golden() -> str:
    """Golden-era P007: a codemeta `citation` value containing 'http' that
    does not appear verbatim in the CITATION.cff text (cff present in the
    citation category)."""
    cms = _flt(
        f"e.cat = 'citation' AND contains({ES}, 'codemeta.json')"
        f" AND {TE} = 'code_parser' AND {_hasv()} AND e.vkind = 'str'"
    )
    cffs = _flt(
        f"e.cat = 'citation' AND contains({ES}, 'CITATION.cff') AND {_hasv()}"
    )
    cff_text = f"array_join(transform({cffs}, x -> x.v), '\\n')"
    return (
        f"size({cffs}) > 0 AND exists({cms},"
        f" c -> contains(lower(c.v), 'http')"
        f" AND NOT contains({cff_text}, pstrip(c.v)))"
    )


def _p013_golden() -> str:
    """Golden-era P013: SUBSTRING family match (not \\b) and CASE-SENSITIVE
    version patterns against the uppercased value — so 'CC0' hits the CC
    family, mixed-case 'Apache' never matches, and BSD's 'Clause' version
    pattern never matches an uppercased string (BSD family always fires)."""
    u = "upper(e.v)"
    fams = []
    for name, vp in (
        ("GPL", r"GPL[-\\s]?\\d+(\\.\\d+)?"),
        ("LGPL", r"LGPL[-\\s]?\\d+(\\.\\d+)?"),
        ("AGPL", r"AGPL[-\\s]?\\d+(\\.\\d+)?"),
        ("Apache", r"Apache[-\\s]?\\d+(\\.\\d+)?"),
        ("CC", r"CC[- ]BY[-\\s]?\\d+(\\.\\d+)?"),
        ("BSD", r"BSD[-\\s]\\d+[-\\s]Clause"),
    ):
        fams.append(
            f"(contains({u}, '{name}') AND NOT {u} rlike '{vp}')"
        )
    return _ex(
        f"e.cat = 'license' AND {TE} = 'code_parser'"
        f" AND {_any_contains(ES, M_CS)} AND {_hasv()} AND e.vkind = 'str'"
        " AND NOT contains(e.v, '0BSD')"
        " AND NOT contains(upper(e.v), 'LICENSEREF-')"
        " AND (" + " OR ".join(fams) + ")"
    )


def _p009_golden() -> str:
    """Golden-era P009: the current classifier minus the github.io
    special-casing — no github.io guard in is_repository_url and no
    '.io/' / 'github.io' homepage indicators (all 17 current-vs-golden
    disagreements are github.io URLs; removing those branches scores
    12/0/0 against the goldens)."""
    ul = "lower(e.v)"
    repo_ind = _any_contains(ul, (
        "github.com/", "github.org/", "gitlab.com/", "gitlab.org/",
        "bitbucket.org/", "bitbucket.net/", "sourceforge.net/projects/",
        "git.", ".git",
    ))
    home_ind = _any_contains(ul, (
        ".org/", ".com/", ".net/", "www.", "docs.", "documentation",
        "readthedocs",
    ))
    techs = ", ".join(f"'{m}'" for m in M_CS)
    return _ex(
        f"e.cat = 'code_repository' AND ({TE} = 'code_parser'"
        f" OR {TE} IN ({techs})"
        f" OR {_any_contains(f'lower({ES})', M_LOWER_NODESC)})"
        f" AND {_hasv()} AND e.vkind = 'str' AND e.v <> ''"
        f" AND NOT {repo_ind} AND {home_ind}"
    )


def _p012_golden() -> str:
    """Golden-era P012: different URL-version patterns (an unterminated
    /archive/ pattern plus end-anchored slash/dash variants) and NO
    archive-extension strip, so 'v1.2.1.tar.gz' extracts as '1.2.1.tar.gz'
    and mismatches the release tag. Reconstructed from the corpus
    (41/0/0 vs the goldens)."""
    url = _fst(
        f"e.cat = 'download_url' AND (contains(lower({ES}), 'codemeta.json')"
        f" OR ({TE} = 'code_parser' AND contains(lower({ES}), 'codemeta')))"
        f" AND {_hasv()}"
    ) + ".v"
    vnum = r"(\\d+\\.\\d+(?:\\.\\d+)?(?:[a-zA-Z0-9\\-\\.]*)?)"
    pats = [
        rf"/archive/(?:v)?{vnum}",
        rf"[-_](?:v)?{vnum}\\.",
        rf"/(?:v)?{vnum}$",
        rf"[-_](?:v)?{vnum}$",
    ]
    ex = "(CASE " + " ".join(
        f"WHEN regexp_extract({url}, '{p}', 1) <> ''"
        f" THEN regexp_extract({url}, '{p}', 1)"
        for p in pats
    ) + " ELSE '' END)"
    rel0 = _fst("e.cat = 'releases'")
    tag = f"{rel0}.rrtag"
    name_ver = rf"regexp_extract({rel0}.rrname, '(?:v)?{vnum}', 1)"
    rel = (
        f"(CASE WHEN {tag} IS NOT NULL AND pstrip({tag}) <> '' THEN pstrip({tag})"
        f" WHEN {rel0}.rrname IS NOT NULL AND {rel0}.rrname <> ''"
        f" AND {name_ver} <> '' THEN {name_ver} ELSE NULL END)"
    )

    def norm(x: str) -> str:
        return f"regexp_replace(lower(pstrip({x})), '^v', '')"

    return (
        f"{url} IS NOT NULL AND {url} <> '' AND {ex} <> ''"
        f" AND {rel} IS NOT NULL AND {norm(rel)} <> ''"
        f" AND {norm(ex)} <> '' AND {norm(ex)} <> {norm(rel)}"
    )


GOLDEN_ERA_EXPRS = {
    "P007": _p007_golden, "P009": _p009_golden,
    "P012": _p012_golden, "P013": _p013_golden,
}


# ---------------------------------------------------------------------------
# Network rules under NO-NETWORK semantics: when every HTTP fetch fails
# (the sandbox reality, and exactly what the reference's own tests mock),
# the three detectors reduce to pure predicates over the entries. These
# expressions mirror the reference run with `requests` patched to raise —
# verified exactly in tests/test_reference_parity.py. The mocked-status
# THRESHOLD logic is oracle-checked separately (evidence_net.py / ev10).
# ---------------------------------------------------------------------------

_URL_FORMAT = r"'^[A-Za-z][A-Za-z0-9+.\\-]*://[^/]+'"
_URL_IN_TEXT = (
    "'(?i)(https?://[^\\\\s<>\"\\']+|www\\\\.[^\\\\s<>\"\\']+)'"
)


def _p008_offline() -> str:
    """p008.py with all fetches failing: fires iff a code_parser
    metadata-source requirements entry has a URL-format string value, or
    its requirement text (str, joined list, or dict fields) contains an
    extractable URL."""
    text = "(CASE WHEN e.vkind = 'str' THEN e.v ELSE coalesce(e.vjoin, '') END)"
    return _ex(
        f"e.cat = 'requirements' AND {TE} = 'code_parser'"
        f" AND {_any_contains(f'lower({ES})', M_LOWER)} AND {_hasv()}"
        f" AND ((e.vkind = 'str' AND e.v rlike {_URL_FORMAT})"
        f" OR (NOT (e.vkind = 'str' AND e.v rlike {_URL_FORMAT})"
        f" AND {text} <> '' AND {text} rlike {_URL_IN_TEXT}))"
    )


def _p011_offline() -> str:
    """p011.py with fetches failing: any codemeta issue_tracker entry with
    a value fires (is_url_accessible returns False on ANY exception,
    including non-string values)."""
    return _ex(f"e.cat = 'issue_tracker' AND {_CODEMETA} AND {_hasv()}")


def _p015_offline() -> str:
    """p015.py with fetches failing: any codemeta continuous_integration
    entry with a value fires (invalid format and failed fetch both land in
    not-accessible)."""
    return _ex(
        f"e.cat = 'continuous_integration' AND {_CODEMETA} AND {_hasv()}"
    )


OFFLINE_NETWORK_EXPRS = {
    "P008": _p008_offline, "P011": _p011_offline, "P015": _p015_offline,
}

# rules whose golden labels still match the current source (>= 0.99 after
# excluding the reference's own jsonld-crash files)
GOLDEN_STABLE_RULES = tuple(
    r for r in PARITY_RULES
    if r not in ("P007", "P009", "P012", "P013", "W003")
)


def jsonld_crash_files(entries_or_dir=SOMEF_DIR) -> set[str]:
    """Files for which the reference could not WRITE a golden jsonld:
    json_ld_utils.py:44 calls identifier_value.startswith(...) on every
    identifier value, so any non-string value raised and the golden file
    was never saved (verified: exactly these files have detector hits but
    no golden)."""
    out = set()
    for name in os.listdir(entries_or_dir):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(entries_or_dir, name), encoding="utf-8") as f:
            try:
                d = json.load(f)
            except Exception:
                continue
        for e in d.get("identifier", []) if isinstance(d, dict) else []:
            if isinstance(e, dict):
                r = e.get("result")
                if isinstance(r, dict) and "value" in r \
                        and not isinstance(r["value"], str):
                    out.add(name.replace(".json", ""))
                    break
    return out


RULE_EXPRS: dict[str, str] = {}


def _build_exprs() -> dict[str, str]:
    if RULE_EXPRS:
        return RULE_EXPRS
    RULE_EXPRS.update({
        "P001": _p001(), "P002": _p002(), "P003": _p003(), "P004": _p004(),
        "P005": _p005(), "P006": _p006(), "P007": _p007(), "P009": _p009(),
        "P010": _p010(), "P012": _p012(), "P013": _p013(), "P014": _p014(),
        "P016": _p016(), "P017": _p017(), "P018": _p018(), "P019": _p019(),
        "W001": _w001(), "W002": _w002(), "W003": _w003(), "W004": _w004(),
        "W005": _w005(), "W006": _w006(), "W007": _w007(), "W008": _w008(),
        "W009": _w009(), "W010": _w010(),
    })
    return RULE_EXPRS


def _expand_pstrip(sql: str) -> str:
    """Python's str.strip() removes \\n/\\t/\\r, Spark's trim() removes
    ONLY spaces — a divergence the detector fuzz harness caught (a
    trailing newline author value fired the \\n separator pattern that the
    reference strips away first). Every .strip() mirror in the detector
    expressions is written as pstrip(...) and macro-expanded here (a SQL
    UDF cannot reference higher-order-function lambda variables, so this
    must be textual)."""
    out = []
    i = 0
    marker = "pstrip("
    while True:
        j = sql.find(marker, i)
        if j < 0:
            out.append(sql[i:])
            return "".join(out)
        out.append(sql[i:j])
        depth = 1
        k = j + len(marker)
        while depth:
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
            k += 1
        arg = sql[j + len(marker):k - 1]
        out.append(
            rf"regexp_replace({_expand_pstrip(arg)}, '^\\s+|\\s+$', '')"
        )
        i = k


def detect_flags(ev: DataFrame, golden_era: bool = False,
                 offline_net: bool = False) -> DataFrame:
    """All 26 rules in ONE pass over the per-file evidence array. With
    golden_era=True, adds the reconstructed golden-era variants as
    p007_golden / p013_golden columns; with offline_net=True, adds the
    no-network p008/p011/p015 columns."""
    exprs = dict(_build_exprs())
    if golden_era:
        exprs.update({
            f"{r}_golden": fn() for r, fn in GOLDEN_ERA_EXPRS.items()
        })
    if offline_net:
        exprs.update({
            r: fn() for r, fn in OFFLINE_NETWORK_EXPRS.items()
        })
    return ev.selectExpr(
        "file",
        *[
            f"CASE WHEN {_expand_pstrip(e)} THEN 1 ELSE 0 END AS {r.lower()}"
            for r, e in exprs.items()
        ],
    )


_LANG_NORM = (
    "CASE WHEN lower({n}) LIKE 'python%' THEN 'Python'"
    " WHEN lower({n}) IN ('c++', 'cpp', 'cplusplus') THEN 'C++'"
    " WHEN lower({n}) = 'java' THEN 'Java'"
    " WHEN lower({n}) = 'c' THEN 'C'"
    " WHEN lower({n}) = 'r' THEN 'R'"
    " WHEN lower({n}) = 'rust' THEN 'Rust'"
    " ELSE {n} END"
)


def _langs_expr() -> str:
    """extract_programming_languages (pitfall_utils.py:7-39): per entry,
    result['value'] if the key exists else result['name']; normalized
    (pitfall_utils.py:42-61); filtered to the 6 target languages; deduped
    preserving first-seen order."""
    cand = (
        "transform("
        "filter(ev, e -> e.cat = 'programming_languages' AND e.has_result"
        " AND e.rkind = 'dict'),"
        " e -> CASE WHEN e.vkind <> 'absent' THEN e.v ELSE e.rrname END)"
    )
    n = "pstrip(x)"
    norm = _LANG_NORM.format(n=n)
    return (
        f"array_distinct(filter(transform(filter({cand}, x -> x IS NOT NULL"
        f" AND x <> ''), x -> {norm}),"
        " x -> x IN ('Python', 'Java', 'C++', 'C', 'R', 'Rust')))"
    )


def real_summary(spark: SparkSession,
                 somef_dir: str = SOMEF_DIR) -> "DataFrame":
    """The reference's summary aggregate (detect_pitfalls_main.py:313-398)
    over the real corpus: per rule, fired-file count, percentage of all
    repos, and the per-language fired counts (languages counted once per
    fired file). Offline-network semantics for P008/P011/P015. One job:
    flags + language arrays computed in the same projection, exploded to
    (rule, lang) partials, map-side combined."""
    ev = evidence_df(load_somef_entries(spark, somef_dir))
    exprs = dict(_build_exprs())
    exprs.update({r: fn() for r, fn in OFFLINE_NETWORK_EXPRS.items()})
    flagged = ev.selectExpr(
        "file",
        _expand_pstrip(_langs_expr()) + " AS langs",
        *[
            f"CASE WHEN {_expand_pstrip(e)} THEN 1 ELSE 0 END AS {r.lower()}"
            for r, e in exprs.items()
        ],
    )
    total = flagged.count()
    rules = list(exprs)
    pairs = ", ".join(
        f"named_struct('rule', '{r}', 'fired', {r.lower()})" for r in rules
    )
    long = flagged.selectExpr(
        "file", "langs", f"explode(array({pairs})) AS p"
    ).selectExpr("file", "langs", "p.rule AS rule", "p.fired AS fired")
    lang_counts = (
        long.filter("fired = 1")
        .selectExpr("rule", "explode(langs) AS lang")
        .groupBy("rule", "lang").count()
        .groupBy("rule")
        .agg(F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("lang", "count")))
        ).alias("languages"))
    )
    return (
        long.groupBy("rule").agg(F.sum("fired").alias("count"))
        .join(lang_counts, "rule", "left")
        .selectExpr(
            "rule", "count",
            f"round(100.0 * count / {total}, 2) AS percentage",
            "coalesce(languages, map()) AS languages",
        )
    )


def golden_labels(golden_dir: str = GOLDEN_DIR) -> dict[str, set[str]]:
    """file stem -> set of fired checkIds from the golden JSON-LDs."""
    out: dict[str, set[str]] = {}
    for name in os.listdir(golden_dir):
        if not name.endswith("_pitfalls.jsonld"):
            continue
        stem = name[: -len("_pitfalls.jsonld")]
        with open(os.path.join(golden_dir, name), encoding="utf-8") as f:
            d = json.load(f)
        out[stem] = {
            c.get("checkId") for c in d.get("checks", []) if c.get("checkId")
        }
    return out


def parity_report(spark: SparkSession,
                  somef_dir: str = SOMEF_DIR,
                  golden_dir: str = GOLDEN_DIR) -> dict[str, dict]:
    """Per-rule confusion + F1 of the Spark detectors vs golden labels.
    Rules with a golden-era reconstruction are ALSO scored under it
    (keyed '<RULE>:golden-era'). Files on which the reference's own
    jsonld writer crashed (see jsonld_crash_files) are excluded — the
    reference produced no label for them."""
    flags = detect_flags(
        evidence_df(load_somef_entries(spark, somef_dir)), golden_era=True
    )
    mine = {
        r["file"].replace(".json", ""): r.asDict() for r in flags.collect()
    }
    golden = golden_labels(golden_dir)
    crash = jsonld_crash_files(somef_dir)
    all_files = sorted(f for f in mine if f not in crash)

    def score(rule: str, col: str) -> dict:
        tp = fp = fn = tn = 0
        examples: list[str] = []
        for f in all_files:
            g = rule in golden.get(f, set())
            m = bool(mine[f].get(col, 0))
            if m and g:
                tp += 1
            elif m and not g:
                fp += 1
                if len(examples) < 5:
                    examples.append(f"FP:{f}")
            elif g and not m:
                fn += 1
                if len(examples) < 5:
                    examples.append(f"FN:{f}")
            else:
                tn += 1
        f1 = (2 * tp / (2 * tp + fp + fn)) if (2 * tp + fp + fn) else 1.0
        return {"tp": tp, "fp": fp, "fn": fn, "tn": tn,
                "f1": round(f1, 4), "examples": examples}

    report = {rule: score(rule, rule.lower()) for rule in PARITY_RULES}
    for rule in GOLDEN_ERA_EXPRS:
        report[f"{rule}:golden-era"] = score(rule, f"{rule.lower()}_golden")
    return report
