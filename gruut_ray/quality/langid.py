"""Character-n-gram language identification (north-rule stage; the reference
has no langid — this is the "fastText-style" model built from scratch).

Multinomial Naive Bayes over hashed char 1-3-grams, trained deterministically
from the in-repo seed corpus at construction time (no downloads).  The model
is a dense ``(num_langs, BUCKETS)`` float32 log-probability matrix, so batch
scoring is one scipy-free sparse-dot implemented with numpy fancy indexing —
vectorized, no per-document Python in the scoring inner loop beyond n-gram
hashing.

Intended use: construct once per Ray actor (``__init__``), call per batch.
"""

from __future__ import annotations

import typing

import numpy as np

from gruut_ray.quality.vocab import seed_text

BUCKETS = 1 << 15
_MASK = np.uint64(BUCKETS - 1)
_PRIME1 = np.uint64(11400714819323198485)
_PRIME2 = np.uint64(14029467366897019727)

DEFAULT_LANGS = ("en-us", "de-de", "fr-fr", "es-es", "ru-ru", "zh-cn")


def _ngram_buckets(text: str, max_chars: int = 2000) -> np.ndarray:
    """Hash char 1/2/3-grams of ``text`` into bucket ids (uint64 array)."""
    if len(text) > max_chars:
        text = text[:max_chars]
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    if codes.size == 0:
        return np.empty(0, dtype=np.uint64)
    h1 = (codes * _PRIME1) & _MASK
    parts = [h1]
    if codes.size >= 2:
        h2 = ((codes[:-1] * _PRIME1) ^ (codes[1:] * _PRIME2)) & _MASK
        parts.append(h2)
    if codes.size >= 3:
        h3 = (
            (codes[:-2] * _PRIME1)
            ^ (codes[1:-1] * _PRIME2)
            ^ (codes[2:] * np.uint64(2654435761))
        ) & _MASK
        parts.append(h3)
    return np.concatenate(parts)


class LangIdModel:
    """NB classifier; deterministic build from seed corpora."""

    def __init__(self, langs: typing.Sequence[str] = DEFAULT_LANGS,
                 alpha: float = 0.5):
        self.langs = list(langs)
        counts = np.full((len(self.langs), BUCKETS), alpha, dtype=np.float64)
        for li, lang in enumerate(self.langs):
            buckets = _ngram_buckets(seed_text(lang), max_chars=200_000)
            np.add.at(counts[li], buckets.astype(np.int64), 1.0)
        self.log_probs = np.log(counts / counts.sum(axis=1, keepdims=True)).astype(
            np.float32
        )

    def predict(self, texts: typing.Sequence[str]) -> typing.Tuple[np.ndarray, np.ndarray]:
        """Returns (lang_codes, scores).  score = mean per-ngram log-prob
        margin of the winner (rough confidence)."""
        n = len(texts)
        langs_out = np.empty(n, dtype=object)
        scores = np.zeros(n, dtype=np.float32)
        lp = self.log_probs
        for i, text in enumerate(texts):
            buckets = _ngram_buckets(text or "")
            if buckets.size == 0:
                langs_out[i] = ""
                scores[i] = 0.0
                continue
            totals = lp[:, buckets.astype(np.int64)].sum(axis=1)
            order = np.argsort(totals)
            best = order[-1]
            margin = (totals[best] - totals[order[-2]]) / buckets.size if len(
                self.langs) > 1 else 1.0
            langs_out[i] = self.langs[best]
            scores[i] = margin
        return langs_out, scores
