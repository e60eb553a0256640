"""Pronunciation lexicon with the reference's lookup semantics.

Reference behavior re-expressed (gruut/phonemize.py:22-115 ``SqlitePhonemizer``):

* storage: sqlite table ``word_phonemes(id, word TEXT, pron_order INTEGER,
  phonemes TEXT, role TEXT)`` (schema: gruut/lexicon2db.py:53-60); query
  ``SELECT role, phonemes FROM word_phonemes WHERE word = ? ORDER BY
  pron_order`` (gruut/phonemize.py:91-94) — phonemes are space-separated;
* lookup order: exact word → word transforms (casefold, strip non-word
  chars; gruut/lang.py:93-99 configures ``lower`` + ``casing_func``) →
  give up (G2P guess happens outside the lexicon);
* role resolution: requested role → default (empty) role → first
  available role (gruut/phonemize.py:60-88).

Unlike the reference, an actor preloads the whole table into a dict once
(``__init__``) instead of per-word sqlite queries with an unbounded grow-only
cache — the lexicons are tens of MB at most, and a dict probe is the hot
path of a per-token stage.
"""

from __future__ import annotations

import re
import sqlite3
import typing

DEFAULT_ROLE = ""

_NON_WORD_RE = re.compile(r"[^\w']", re.UNICODE)

# role → pronunciations, each a tuple of phonemes, ordered by pron_order
RoleProns = typing.Dict[str, typing.List[typing.Tuple[str, ...]]]


class Lexicon:
    """In-memory word → role → pronunciations map with gruut lookup rules."""

    def __init__(self, entries: typing.Optional[
            typing.Iterable[typing.Tuple[str, str, typing.Sequence[str]]]] = None):
        # entries: (word, role, phonemes) in pron_order
        self._words: typing.Dict[str, RoleProns] = {}
        if entries:
            for word, role, phonemes in entries:
                self.add(word, phonemes, role=role)

    def add(self, word: str, phonemes: typing.Sequence[str],
            role: str = DEFAULT_ROLE) -> None:
        roles = self._words.setdefault(word, {})
        roles.setdefault(role or DEFAULT_ROLE, []).append(tuple(phonemes))

    def __len__(self) -> int:
        return len(self._words)

    def __contains__(self, word: str) -> bool:
        return self._find(word) is not None

    def _find(self, word: str) -> typing.Optional[RoleProns]:
        """Exact word, then the reference's word transforms
        (gruut/phonemize.py:96-109: configured lower/casefold, strip
        non-word characters)."""
        roles = self._words.get(word)
        if roles is not None:
            return roles
        lowered = word.casefold()
        if lowered != word:
            roles = self._words.get(lowered)
            if roles is not None:
                return roles
        stripped = _NON_WORD_RE.sub("", lowered)
        if stripped and stripped != lowered:
            roles = self._words.get(stripped)
            if roles is not None:
                return roles
        return None

    def lookup(self, word: str, role: typing.Optional[str] = None,
               ) -> typing.Optional[typing.Tuple[str, ...]]:
        """First pronunciation under the role-fallback chain
        (gruut/phonemize.py:60-88): requested role → default role → any."""
        roles = self._find(word)
        if roles is None:
            return None
        if role:
            prons = roles.get(role)
            if prons:
                return prons[0]
        prons = roles.get(DEFAULT_ROLE)
        if prons:
            return prons[0]
        for prons in roles.values():
            if prons:
                return prons[0]
        return None

    def lookup_all(self, word: str) -> typing.Optional[RoleProns]:
        return self._find(word)

    def word_set(self) -> typing.FrozenSet[str]:
        """Membership set for the tokenizer's ``in_lexicon`` probes
        (gruut/text_processor.py:2095-2102)."""
        return frozenset(self._words)

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_sqlite(cls, path: str) -> "Lexicon":
        """Load a gruut-format ``lexicon.db`` (schema
        gruut/lexicon2db.py:53-60) in one scan."""
        lex = cls()
        conn = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        try:
            rows = conn.execute(
                "SELECT word, COALESCE(role, ''), phonemes FROM word_phonemes "
                "ORDER BY word, pron_order")
            for word, role, phonemes in rows:
                lex.add(word, phonemes.split(), role=role)
        finally:
            conn.close()
        return lex

    @classmethod
    def from_text(cls, lines: typing.Iterable[str],
                  has_roles: bool = False) -> "Lexicon":
        """Parse the reference's lexicon text format
        (gruut/lexicon2db.py:66-96): ``word [role] phoneme phoneme ...``.

        Role parsing is gated on ``has_roles`` (mirroring the reference
        builder's explicit ``--role`` flag) rather than auto-detected:
        phoneme notations that legitimately contain ASCII colons (X-SAMPA
        length marks like ``a:``) must not have their first phoneme consumed
        as a bogus role (ADVICE r01).  With ``has_roles=True`` only tokens
        namespaced ``gruut:...`` are treated as roles."""
        lex = cls()
        for line in lines:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) < 2:
                continue
            word, rest = parts[0], parts[1:]
            role = DEFAULT_ROLE
            if has_roles and rest and rest[0].startswith("gruut:"):
                role, rest = rest[0], rest[1:]
            if rest:
                lex.add(word, rest, role=role)
        return lex

    def to_sqlite(self, path: str) -> None:
        """Write gruut-schema sqlite (offline prep parity,
        gruut/lexicon2db.py:53-105)."""
        conn = sqlite3.connect(path)
        try:
            conn.execute("DROP TABLE IF EXISTS word_phonemes")
            conn.execute(
                "CREATE TABLE word_phonemes "
                "(id INTEGER PRIMARY KEY AUTOINCREMENT, word TEXT, "
                "pron_order INTEGER, phonemes TEXT, role TEXT)")
            conn.execute(
                "CREATE INDEX word_phonemes_word ON word_phonemes(word)")
            for word, roles in self._words.items():
                for role, prons in roles.items():
                    for order, pron in enumerate(prons):
                        conn.execute(
                            "INSERT INTO word_phonemes "
                            "(word, pron_order, phonemes, role) "
                            "VALUES (?, ?, ?, ?)",
                            (word, order, " ".join(pron), role))
            conn.commit()
        finally:
            conn.close()
