"""Regex PII/toxicity scrub stage (north-rule addition; stateless).

Deterministic, ordered regex bank.  Replacement tokens are stable so the
scrubbed text is reproducible byte-for-byte between the oracle and Ray paths.
"""

from __future__ import annotations

import re
import typing

# Order matters: more specific first (credit card before generic phone).
PII_PATTERNS: typing.Tuple[typing.Tuple[str, typing.Pattern, str], ...] = (
    ("email", re.compile(
        r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"), "[EMAIL]"),
    ("credit_card", re.compile(
        r"\b(?:\d[ -]?){13,16}\b(?<![ -])"), "[CREDIT_CARD]"),
    ("ssn", re.compile(r"\b\d{3}-\d{2}-\d{4}\b"), "[SSN]"),
    ("phone", re.compile(
        r"(?:(?<=\s)|^)\+?\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3}[ .-]?\d{2,4}\b"),
     "[PHONE]"),
    ("ipv4", re.compile(
        r"\b(?:(?:25[0-5]|2[0-4]\d|1?\d?\d)\.){3}(?:25[0-5]|2[0-4]\d|1?\d?\d)\b"),
     "[IP]"),
)

# Tiny toxicity lexicon — a stand-in signal with the same plumbing a real
# blocklist would use (flag + count; documents are not dropped for it alone).
TOXIC_WORDS = frozenset({
    "idiot", "stupid", "hate", "moron", "dumb", "trash", "scum",
})

_TOKEN_RE = re.compile(r"[\w']+", re.UNICODE)


def scrub_text(text: str) -> typing.Tuple[str, int]:
    """Replace PII spans; returns (scrubbed_text, n_hits)."""
    hits = 0
    for _name, pattern, repl in PII_PATTERNS:
        text, n = pattern.subn(repl, text)
        hits += n
    return text, hits


def toxicity_count(text: str) -> int:
    lowered = text.lower()
    return sum(1 for tok in _TOKEN_RE.findall(lowered) if tok in TOXIC_WORDS)
