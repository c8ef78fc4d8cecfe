"""Single shared constants/threshold module.

Imported by BOTH the Spark pipeline and the pure-pandas oracle so the two
can never drift — the reference's divergent-duplicate lesson (two
`normalize_version`s at pitfall_utils.py:64-72 vs p012.py:33-49, three URL
"accessible" definitions at p008.py:47 / p011.py:22 / p015.py:40) is why
this file exists.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Languages
# ---------------------------------------------------------------------------

KEEP_LANGS = ("en", "de", "fr", "es")
ALL_LANGS = ("en", "de", "fr", "es", "zz")  # zz = synthetic gibberish

# Small per-language stop-word lists (used by the synth generator, the
# langid model, the stop-word-fraction rule, and the DuckDB oracles).
STOPWORDS = {
    "en": (
        "the of and a to in is was he for it with as his on be at by i this had "
        "not are but from or have an they which one you were her all she there "
        "would their we him been has when who will more no if out so said what"
    ).split(),
    "de": (
        "der die und in den von zu das mit sich des auf für ist im dem nicht ein "
        "eine als auch es an werden aus er hat dass sie nach wird bei einer um am "
        "sind noch wie einem über einen so zum war haben nur oder aber vor zur"
    ).split(),
    "fr": (
        "de la le et les des en un du une que est pour qui dans a par plus pas au "
        "sur ne se ce il sont la aux avec son ils comme ou si leur y dont elle "
        "tout mais nous sa cette ses"
    ).split(),
    "es": (
        "de la que el en y a los del se las por un para con no una su al lo como "
        "mas pero sus le ya o este si porque esta entre cuando muy sin sobre "
        "tambien me hasta hay donde quien desde todo nos"
    ).split(),
}

# English stop-word set used by the stop-word-fraction rule (rule checks the
# *predicted-keep* languages union so non-en keep docs are not penalized).
STOPWORD_UNION = tuple(sorted({w for ws in STOPWORDS.values() for w in ws}))

# ---------------------------------------------------------------------------
# Heuristic rule thresholds (Gopher/C4-style)
# ---------------------------------------------------------------------------

MIN_WORDS = 50            # R001 doc length lower bound (words, whitespace)
MAX_WORDS = 5000          # R001 doc length upper bound
MAX_SYMBOL_RATIO = 0.10   # R002 symbol chars (#…{}[]<>|\\^~) / words
MIN_STOPWORD_FRAC = 0.06  # R003 stop-word tokens / tokens
MIN_MEAN_WORD_LEN = 2.0   # R004
MAX_MEAN_WORD_LEN = 12.0  # R004
DUP_NGRAM_N = 3           # R005 word n-gram size for repetition
MAX_DUP_NGRAM_FRAC = 0.30  # R005 duplicate n-gram fraction
MAX_BULLET_LINE_FRAC = 0.90   # R007 fraction of lines starting with a bullet
MAX_ELLIPSIS_LINE_FRAC = 0.30  # R008 fraction of lines ending with ...
MAX_LOG_PPL = 7.0         # R010 token-bigram LM log-perplexity cutoff
#   calibrated on synth: clean-class max ≈ 5.9, gibberish ≈ 8.9

SYMBOL_CHARS = "#…{}[]<>|\\^~"

BOILERPLATE_PHRASES = (
    "lorem ipsum",
    "enable javascript",
    "terms of service apply",
    "all rights reserved worldwide",
    "click here to continue",
)

# R014 host blocklist (P004 URL-classifier analog, p004.py:7-45)
HOST_BLOCKLIST = ("ads.example", "spam.example", "tracker.example")

# R015 freshness: warn when warc_ts predates this (W002 analog, w002.py:143)
FRESHNESS_CUTOFF = "2024-03-01 00:00:00"

# ---------------------------------------------------------------------------
# PII scrub patterns (P014/P018 shape: pattern match -> structured evidence).
# Compiled once per worker (fixing the reference's per-call re-compiles,
# p002.py:55-57). Order matters: EMAIL before PHONE (phone regex could eat
# digit runs inside emails otherwise is not an issue, but fixed order keeps
# the scrub byte-deterministic).
# ---------------------------------------------------------------------------

PII_PATTERNS = (
    ("pii_email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("pii_id", r"\b\d{3}-\d{2}-\d{4}\b", "[ID]"),
    ("pii_phone", r"\b(?:\+?1[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
)

# ---------------------------------------------------------------------------
# Rule registry: (rule_code, severity). Order is part of output parity, like
# the reference's fixed detector order (detect_pitfalls_main.py:281-311).
# ---------------------------------------------------------------------------

DROP = "drop"
WARN = "warn"

RULES = (
    ("R001_doc_length", DROP),
    ("R002_symbol_ratio", DROP),
    ("R003_stopword_fraction", DROP),
    ("R004_mean_word_length", DROP),
    ("R005_dup_ngram_fraction", DROP),
    ("R006_boilerplate_phrase", DROP),
    ("R007_bullet_ratio", DROP),
    ("R008_ellipsis_ratio", DROP),
    ("R009_langid", DROP),
    ("R010_perplexity", DROP),
    ("R011_pii_email", WARN),
    ("R012_pii_phone", WARN),
    ("R013_pii_id", WARN),
    ("R014_host_blocklist", DROP),
    ("R015_freshness", WARN),
)

RULE_SEVERITY = dict(RULES)

# Static per-rule lookup tables — the reference ships description /
# indicator-category / suggestion maps rendered into every JSON-LD report
# (json_ld_utils.py:53-91 descriptions, 336-376 categories, 379-418
# suggestions). Category here = which pipeline stage owns the rule.
RULE_INFO: dict[str, tuple[str, str, str]] = {
    # rule: (category, description, suggestion)
    "R001_doc_length": (
        "heuristic", "document length outside the accepted token range",
        "drop or truncate documents outside the configured word-count band"),
    "R002_symbol_ratio": (
        "heuristic", "symbol-to-word ratio above threshold",
        "strip markup/code blocks before extraction or drop the page"),
    "R003_stopword_fraction": (
        "heuristic", "stop-word fraction below the natural-language floor",
        "verify extraction kept body text, not navigation chrome"),
    "R004_mean_word_length": (
        "heuristic", "mean word length outside the natural-language band",
        "check for concatenated tokens or character-level corruption"),
    "R005_dup_ngram_fraction": (
        "heuristic", "duplicated n-gram fraction above threshold",
        "deduplicate boilerplate/repeated blocks before ingestion"),
    "R006_boilerplate_phrase": (
        "heuristic", "known boilerplate phrase present",
        "extend the extractor to strip template/boilerplate sections"),
    "R007_bullet_ratio": (
        "heuristic", "bullet-line ratio above threshold",
        "treat list-dominated pages as navigation, not prose"),
    "R008_ellipsis_ratio": (
        "heuristic", "ellipsis-line ratio above threshold",
        "page is likely truncated previews; fetch full articles"),
    "R009_langid": (
        "model", "predicted language outside the keep list",
        "route to the matching language pipeline or drop"),
    "R010_perplexity": (
        "model", "LM perplexity above threshold",
        "likely gibberish/spam; drop or send to human review"),
    "R011_pii_email": (
        "scrub", "email address detected and scrubbed",
        "verify scrubbed text before release; audit the source"),
    "R012_pii_phone": (
        "scrub", "phone number detected and scrubbed",
        "verify scrubbed text before release; audit the source"),
    "R013_pii_id": (
        "scrub", "government-id-shaped string detected and scrubbed",
        "verify scrubbed text before release; audit the source"),
    "R014_host_blocklist": (
        "policy", "host on the configured blocklist",
        "remove the host from crawl seeds"),
    "R015_freshness": (
        "policy", "capture timestamp older than the freshness window",
        "recrawl the url or exclude from fresh-data training mixes"),
}

# Salting fan-out for hot-host aggregations (north_rule: salt hot hosts).
N_SALT = 16

# Output bucketing: deterministic url-hash buckets; the unit of partitioned
# writes, per-partition lineage, and checkpoint/resume (overwrite-by-bucket).
N_BUCKETS = 32


# ---------------------------------------------------------------------------
# Runtime overrides (main.py --threshold): applied from an env var AT MODULE
# IMPORT so PySpark WORKER processes — which re-import this module fresh and
# would otherwise silently run the defaults (scrub compiles PII_PATTERNS and
# the langid/perplexity singletons read STOPWORDS/KEEP_LANGS executor-side)
# — see exactly what the driver sees. The driver sets the env var before the
# session starts (local-mode workers inherit it) and mirrors it into
# spark.executorEnv for cluster executors (session.get_spark).
# ---------------------------------------------------------------------------

# names overridden at runtime (env or main.py --threshold) — consumers
# with default-shape fast paths (scrub's prescreen) must check this
OVERRIDDEN: frozenset = frozenset()

# thresholds consumed INSIDE executor worker processes (module import /
# model-singleton build), as opposed to scalars baked into the Catalyst
# plan on the driver. Overriding one of these requires the env var to be
# in place BEFORE the SparkSession launches (session.get_spark enforces).
EXECUTOR_CONSUMED = frozenset({
    "PII_PATTERNS",        # scrub.py compiles at import
    "STOPWORDS",           # langid/perplexity singletons; pytext union
    "STOPWORD_UNION",      # pytext._STOPSET at import
    "KEEP_LANGS",          # langid/perplexity model vocab
    "ALL_LANGS",
    "SYMBOL_CHARS",        # pytext._SYM_RE at import
    "DUP_NGRAM_N",         # pytext at call time (worker module instance)
})


def apply_overrides(data: dict) -> None:
    """Apply threshold overrides AND recompute every derived registry —
    the single override entry point shared by the driver (main.py
    --threshold) and worker imports (_apply_env_overrides), so the two
    can never diverge on derived values."""
    g = globals()
    for _k, _v in data.items():
        g[_k] = _v
    g["OVERRIDDEN"] = frozenset(set(g["OVERRIDDEN"]) | set(data))
    # derived registries: recompute unless the override set them directly
    if "RULE_SEVERITY" not in data:
        g["RULE_SEVERITY"] = dict(g["RULES"])
    if "STOPWORD_UNION" not in data:
        g["STOPWORD_UNION"] = tuple(
            sorted({w for ws in g["STOPWORDS"].values() for w in ws})
        )


def _apply_env_overrides() -> None:
    import json as _json
    import os as _os

    raw = _os.environ.get("RSMC_THRESHOLD_OVERRIDES")
    if raw:
        apply_overrides(_json.loads(raw))


_apply_env_overrides()
