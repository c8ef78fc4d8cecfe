"""fastText-style character-trigram language identifier.

A linear char-n-gram scorer with per-language trigram log-probabilities,
trained deterministically at first use from the synth vocabulary (no
external data). Runs as a lazily-initialized per-executor singleton inside
the fused mapInPandas stage — the architectural slot of the reference's
effectful per-row detectors (p008.py:84-168: per-row scoring with per-rule
thresholds), minus the network.
"""

from __future__ import annotations

import math
import re

import pandas as pd

from .. import thresholds as TH

_NORM_RE = re.compile(r"[^a-z ]+")
_PREFIX_CHARS = 300  # score only the head — plenty for page-level langid
_ALPHA = 0.1


def _normalize(text: str) -> str:
    return " " + _NORM_RE.sub(" ", text.lower()) + " "


class LangIdModel:
    def __init__(self) -> None:
        from ..synth import CONTENT_WORDS, zz_corpus

        corpora = {
            lang: " ".join((TH.STOPWORDS[lang] + CONTENT_WORDS[lang]) * 3)
            for lang in TH.KEEP_LANGS
        }
        corpora["zz"] = " ".join(zz_corpus())
        self.langs = list(corpora)
        tables: list[dict[str, float]] = []
        fallback: list[float] = []
        for lang in self.langs:
            s = _normalize(corpora[lang])
            counts: dict[str, int] = {}
            for i in range(len(s) - 2):
                g = s[i : i + 3]
                counts[g] = counts.get(g, 0) + 1
            total = sum(counts.values())
            vocab = len(counts) + 1
            denom = total + _ALPHA * vocab
            tables.append(
                {g: math.log((c + _ALPHA) / denom) for g, c in counts.items()}
            )
            fallback.append(math.log(_ALPHA / denom))
        # fuse per-language tables into one trigram -> score-vector dict:
        # ONE lookup per trigram at predict time instead of |langs|
        self.fallback = tuple(fallback)
        all_grams = set().union(*tables)
        self.fused: dict[str, tuple[float, ...]] = {
            g: tuple(
                tables[j].get(g, fallback[j]) for j in range(len(self.langs))
            )
            for g in all_grams
        }

    def scores(self, text: str) -> list[float]:
        s = _normalize(text[:_PREFIX_CHARS])
        fused, fb = self.fused, self.fallback
        # gather the per-position score vectors, then fold each language
        # column with C-level sum over the zip transpose: the same
        # left-to-right addition order (0.0 + v0 + v1 + ...) as the old
        # interpreted scores[j] += vec[j] loop, so results are
        # bit-identical — measured ~1.8x faster, and this runs per doc
        # in the fused model stage.
        vecs = [fused.get(s[i : i + 3], fb) for i in range(len(s) - 2)]
        if not vecs:
            return [0.0] * len(self.langs)
        return [sum(col) for col in zip(*vecs)]

    def predict(self, text: str) -> str:
        scores = self.scores(text)
        best = max(range(len(scores)), key=lambda j: (scores[j], -j))
        return self.langs[best]

    def predict_top2(self, text: str) -> list[str]:
        """Best and runner-up languages, ordered — the multi-valued
        per-document language list (the reference's repos carry several
        target languages, detect_pitfalls_main.py:320-323; per-language
        metrics count a hit once per listed language, 346-351)."""
        scores = self.scores(text)
        order = sorted(range(len(scores)), key=lambda j: (-scores[j], j))
        return [self.langs[j] for j in order[:2]]

    def predict_series(self, texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: self.predict(t if isinstance(t, str) else ""))


_MODEL: LangIdModel | None = None


def get_model() -> LangIdModel:
    global _MODEL
    if _MODEL is None:
        _MODEL = LangIdModel()
    return _MODEL
