"""Native Column-expression text statistics for the oracle-checked query
library (documents-table queries, cross-checked against DuckDB by the
driver).

These are the same formulas as functions/pytext.py, expressed as Catalyst
expressions. They are used on the short-document relational tables where
interpreted higher-order functions are cheap; the big-pages pipeline uses
the fused Arrow stage instead (see pytext.py for the why).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import thresholds as TH


def n_words(text: Column) -> Column:
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda x: x != F.lit(""))


def n_tokens(text: Column) -> Column:
    return F.size(tokens(text))


def stop_count(toks: Column, words: tuple[str, ...] = TH.STOPWORD_UNION) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def stop_frac(text: Column) -> Column:
    toks = tokens(text)
    return F.round(
        stop_count(toks).cast("double")
        / F.greatest(F.size(toks).cast("double"), F.lit(1.0)),
        6,
    )


def mean_word_len(text: Column) -> Column:
    alnum = F.length(F.regexp_replace(F.lower(text), "[^a-z0-9]", ""))
    return F.round(
        alnum.cast("double")
        / F.greatest(n_tokens(text).cast("double"), F.lit(1.0)),
        6,
    )


def sym_ratio(text: Column) -> Column:
    sym = F.length(text) - F.length(F.regexp_replace(text, r"[#…{}\[\]<>|\\^~]", ""))
    return F.round(
        sym.cast("double") / F.greatest(n_words(text).cast("double"), F.lit(1.0)), 6
    )


