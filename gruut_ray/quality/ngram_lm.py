"""Per-language character n-gram LM for perplexity scoring (north-rule
"KenLM-style" stage, built from scratch from the in-repo seed corpus).

Trigram model with stupid backoff to bigram/unigram, hashed into dense
numpy tables — mergeable, deterministic, loads in milliseconds inside an
actor ``__init__``.  Perplexity here is a *relative* fluency score (same
model on both the oracle and Ray paths), not an absolute LM quality claim.
"""

from __future__ import annotations

import math
import typing

import numpy as np

from gruut_ray.quality.langid import BUCKETS, _MASK, _PRIME1, _PRIME2
from gruut_ray.quality.vocab import seed_text

_BACKOFF = 0.4


def _codes(text: str, max_chars: int = 2000) -> np.ndarray:
    if len(text) > max_chars:
        text = text[:max_chars]
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)


def _h2(codes: np.ndarray) -> np.ndarray:
    return ((codes[:-1] * _PRIME1) ^ (codes[1:] * _PRIME2)) & _MASK


def _h3(codes: np.ndarray) -> np.ndarray:
    return (
        (codes[:-2] * _PRIME1)
        ^ (codes[1:-1] * _PRIME2)
        ^ (codes[2:] * np.uint64(2654435761))
    ) & _MASK


class CharNgramLM:
    def __init__(self, lang: str):
        self.lang = lang
        text = seed_text(lang, repeats=10)
        codes = _codes(text, max_chars=500_000)
        self.uni = np.ones(BUCKETS, dtype=np.float32)
        self.bi = np.zeros(BUCKETS, dtype=np.float32)
        self.tri = np.zeros(BUCKETS, dtype=np.float32)
        if codes.size:
            np.add.at(self.uni, ((codes * _PRIME1) & _MASK).astype(np.int64), 1.0)
        if codes.size >= 2:
            np.add.at(self.bi, _h2(codes).astype(np.int64), 1.0)
        if codes.size >= 3:
            np.add.at(self.tri, _h3(codes).astype(np.int64), 1.0)
        self.total_uni = float(self.uni.sum())

    def perplexity(self, text: str) -> float:
        """Stupid-backoff char trigram perplexity (lower = more fluent)."""
        codes = _codes(text)
        n = codes.size
        if n < 3:
            return 1e4
        i1 = ((codes * _PRIME1) & _MASK).astype(np.int64)
        i2 = _h2(codes).astype(np.int64)
        i3 = _h3(codes).astype(np.int64)
        tri_c = self.tri[i3]
        bi_ctx = self.bi[i2[:-1]]
        bi_c = self.bi[i2[1:]]
        uni_ctx = self.uni[i1[1:-1]]
        uni_c = self.uni[i1[2:]]
        # P(c3 | c1c2) = tri/bi_ctx, backoff 0.4 * bi/uni_ctx, then 0.16 * uni
        p = np.where(
            (tri_c > 0) & (bi_ctx > 0),
            tri_c / np.maximum(bi_ctx, 1e-9),
            np.where(
                (bi_c > 0) & (uni_ctx > 0),
                _BACKOFF * bi_c / np.maximum(uni_ctx, 1e-9),
                _BACKOFF * _BACKOFF * uni_c / self.total_uni,
            ),
        )
        logp = float(np.log(np.maximum(p, 1e-12)).mean())
        return float(math.exp(-logp))


class PerplexityScorer:
    """Holds one LM per language; lazily built (languages are skewed — an
    actor only pays for the languages it actually sees)."""

    def __init__(self, langs: typing.Optional[typing.Sequence[str]] = None):
        self._models: typing.Dict[str, CharNgramLM] = {}
        for lang in langs or ():
            self._models[lang] = CharNgramLM(lang)

    def model(self, lang: str) -> CharNgramLM:
        m = self._models.get(lang)
        if m is None:
            m = CharNgramLM(lang)
            self._models[lang] = m
        return m

    def perplexity(self, text: str, lang: str) -> float:
        return self.model(lang).perplexity(text)
