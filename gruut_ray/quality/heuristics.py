"""Quality heuristics + the FROZEN keep/drop rule spec (north rule).

``doc_stats`` runs the gruut-style normalizer (tokenize → abbreviation/
initialism splits → break detection → sentence assembly) and derives
per-document counters; ``apply_rules`` maps the counters to a keep/drop
decision with a first-failing-rule reason.  Both are pure functions shared
by the Ray pipeline stages AND the single-threaded oracle
(``gruut_ray.oracle``), so the F1-vs-reference-labels check verifies the
distributed plumbing (batching, actor routing, shuffles), not two
divergent rule implementations.

Rule spec v3 — changing ANY constant here is a breaking change to the
reference labels; bump ``RULES_VERSION``.  v3 adds the ``max_chars``
too-long cut (checked before the tokenizing stats pass — multi-MB
pathological pages drop in O(scrub) instead of ~10 s/MB of normalizer
time; no doc in the test corpora is affected).  v2: the stats normalizer runs
with number/date/currency/time verbalization DISABLED — the filter counts
the tokens a document actually contains, not their spoken expansion
("1999" is one token, not three), and skips the transform passes that
dominate normalizer cost (~20% headline throughput).
"""

from __future__ import annotations

import typing
from dataclasses import dataclass

from gruut_ray.nlp.normalize import NormalizeOptions, process_document
from gruut_ray.profiles import get_compiled, get_profile
from gruut_ray.quality.pii import scrub_text, toxicity_count

RULES_VERSION = "v3"

# tokenize/split/break passes only — no verbalization (see v2 note above)
STATS_NORMALIZE_OPTS = NormalizeOptions(
    detect_numbers=False, verbalize_numbers=False,
    detect_currency=False, verbalize_currency=False,
    detect_dates=False, verbalize_dates=False,
    detect_times=False, verbalize_times=False,
)


@dataclass(frozen=True)
class QualityThresholds:
    min_chars: int = 50
    min_tokens: int = 10
    max_tokens: int = 50_000
    # hard length cut, checked BEFORE the tokenizing stats pass: a
    # multi-MB doc would spend ~10 s/MB in the normalizer only to be
    # dropped by max_tokens anyway (CCNet-style pathological-page cut;
    # 1M chars is ~5× the max_tokens bound at normal word lengths, so
    # nothing this rule drops could ever be kept)
    max_chars: int = 1_000_000
    min_mean_word_len: float = 2.0
    max_mean_word_len: float = 14.0
    max_symbol_ratio: float = 0.30
    max_digit_ratio: float = 0.30
    min_unique_token_ratio: float = 0.20
    min_stopword_density: float = 0.015
    min_stopword_tokens: int = 20
    max_perplexity: float = 4000.0
    min_lang_score: float = 0.0


DEFAULT_THRESHOLDS = QualityThresholds()


@dataclass
class DocStats:
    n_chars: int
    n_tokens: int
    n_sents: int
    mean_word_len: float
    symbol_ratio: float
    digit_ratio: float
    unique_token_ratio: float
    stopword_density: float
    n_pii_hits: int = 0
    n_toxic: int = 0
    ppl: float = 0.0


def doc_stats(text: str, lang: str) -> DocStats:
    """Counters from the normalized token stream (gruut tokenization feeding
    heuristic rules, per the north star)."""
    n_chars = len(text)
    if n_chars == 0:
        return DocStats(0, 0, 0, 0.0, 0.0, 0.0, 0.0, 0.0)
    sents = process_document(text, lang=lang, opts=STATS_NORMALIZE_OPTS)
    spoken: typing.List[str] = []
    for s in sents:
        for w in s.words:
            if w.is_spoken:
                spoken.append(w.text)
    n_tokens = len(spoken)
    n_sents = len(sents)
    total_len = sum(len(t) for t in spoken)
    mean_word_len = (total_len / n_tokens) if n_tokens else 0.0
    n_alpha = sum(1 for c in text if c.isalpha())
    n_digit = sum(1 for c in text if c.isdigit())
    n_space = sum(1 for c in text if c.isspace())
    n_symbol = n_chars - n_alpha - n_digit - n_space
    symbol_ratio = n_symbol / n_chars
    digit_ratio = n_digit / n_chars
    unique_token_ratio = (len(set(spoken)) / n_tokens) if n_tokens else 0.0
    cp = get_compiled(lang)
    if cp.stopwords and n_tokens:
        n_stop = sum(1 for t in spoken if t.lower() in cp.stopwords
                     or t in cp.stopwords)
        stopword_density = n_stop / n_tokens
    else:
        stopword_density = -1.0  # sentinel: no stopword table for this lang
    return DocStats(
        n_chars=n_chars,
        n_tokens=n_tokens,
        n_sents=n_sents,
        mean_word_len=mean_word_len,
        symbol_ratio=symbol_ratio,
        digit_ratio=digit_ratio,
        unique_token_ratio=unique_token_ratio,
        stopword_density=stopword_density,
    )


def apply_rules(stats: DocStats, lang: str, lang_score: float = 1.0,
                th: QualityThresholds = DEFAULT_THRESHOLDS,
                ) -> typing.Tuple[bool, str]:
    """First failing rule wins; returns (keep, drop_reason)."""
    if stats.n_chars > th.max_chars:
        return False, "too_long"
    if stats.n_chars < th.min_chars:
        return False, "too_short"
    if stats.n_tokens < th.min_tokens:
        return False, "too_few_tokens"
    if stats.n_tokens > th.max_tokens:
        return False, "too_many_tokens"
    char_mode = get_profile(lang).split_mode == "chars"
    if not char_mode:
        if stats.mean_word_len < th.min_mean_word_len or \
                stats.mean_word_len > th.max_mean_word_len:
            return False, "word_length"
    if stats.symbol_ratio > th.max_symbol_ratio:
        return False, "symbol_ratio"
    if stats.digit_ratio > th.max_digit_ratio:
        return False, "digit_ratio"
    if stats.unique_token_ratio < th.min_unique_token_ratio:
        return False, "repetition"
    if (
        stats.stopword_density >= 0.0
        and stats.n_tokens >= th.min_stopword_tokens
        and stats.stopword_density < th.min_stopword_density
    ):
        return False, "stopword_density"
    if stats.ppl > th.max_perplexity:
        return False, "perplexity"
    if lang_score < th.min_lang_score:
        return False, "lang_confidence"
    return True, ""


def score_document(
    text: str,
    lang: str,
    ppl_fn: typing.Optional[typing.Callable[[str, str], float]] = None,
    lang_score: float = 1.0,
    th: QualityThresholds = DEFAULT_THRESHOLDS,
) -> typing.Dict[str, typing.Any]:
    """Full per-document quality record: stats + PII scrub + verdict.
    The single source of truth for both the oracle and the Ray stages."""
    scrubbed, n_pii = scrub_text(text)
    if len(scrubbed) > th.max_chars:
        # too_long short-circuit: skip the tokenizing stats pass (the
        # expensive part) for pathological pages; scrub/toxicity above
        # are linear and already done, cheap whitespace counts fill the
        # stat columns.  Any normal-content doc this long fails
        # max_tokens / word_length anyway; the cut itself is the rule
        # (CCNet-style), applied identically by the oracle since
        # score_document is the single scoring entry point.
        stats = DocStats(
            n_chars=len(scrubbed), n_tokens=len(scrubbed.split()),
            n_sents=0, mean_word_len=0.0, symbol_ratio=0.0,
            digit_ratio=0.0, unique_token_ratio=0.0,
            stopword_density=-1.0, n_pii_hits=n_pii,
            n_toxic=toxicity_count(scrubbed))
        return {
            "keep": False,
            "drop_reason": "too_long",
            "scrubbed_text": scrubbed,
            "n_chars": stats.n_chars,
            "n_tokens": stats.n_tokens,
            "n_sents": stats.n_sents,
            "mean_word_len": stats.mean_word_len,
            "symbol_ratio": stats.symbol_ratio,
            "digit_ratio": stats.digit_ratio,
            "unique_token_ratio": stats.unique_token_ratio,
            "stopword_density": stats.stopword_density,
            "ppl": 0.0,
            "n_pii_hits": stats.n_pii_hits,
            "n_toxic": stats.n_toxic,
        }
    stats = doc_stats(scrubbed, lang)
    stats.n_pii_hits = n_pii
    stats.n_toxic = toxicity_count(scrubbed)
    if ppl_fn is not None and stats.n_chars:
        stats.ppl = ppl_fn(scrubbed, lang)
    keep, drop_reason = apply_rules(stats, lang, lang_score, th)
    return {
        "keep": keep,
        "drop_reason": drop_reason,
        "scrubbed_text": scrubbed,
        "n_chars": stats.n_chars,
        "n_tokens": stats.n_tokens,
        "n_sents": stats.n_sents,
        "mean_word_len": stats.mean_word_len,
        "symbol_ratio": stats.symbol_ratio,
        "digit_ratio": stats.digit_ratio,
        "unique_token_ratio": stats.unique_token_ratio,
        "stopword_density": stats.stopword_density,
        "ppl": stats.ppl,
        "n_pii_hits": stats.n_pii_hits,
        "n_toxic": stats.n_toxic,
    }
