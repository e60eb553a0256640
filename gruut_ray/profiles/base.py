"""Language profile: plain-data settings per language + worker-local compilation.

The reference models this as ``TextProcessorSettings`` (a dataclass holding
callables and compiled regexes, reference gruut/const.py:596-857).  For Ray we
keep two layers:

* :class:`LanguageProfile` — pure data (strings/sets/tuples), safe to pickle
  into tasks, tiny.  One instance per language, defined in
  ``gruut_ray/profiles/data.py``.
* :class:`CompiledProfile` — regexes compiled + hook functions resolved.
  Built lazily **once per worker process** via :func:`get_compiled`
  (module-level cache), never shipped between processes.

Behavior hooks that cannot be expressed as data (English initialisms,
ordinals, clock times — reference gruut/lang.py:269-353) live in a registry
keyed by ``LanguageProfile.hooks``.
"""

from __future__ import annotations

import re
import typing
from dataclasses import dataclass, field


class Time(typing.NamedTuple):
    """Parsed clock time (reference gruut/const.py:130-137)."""

    hours: int
    minutes: int = 0
    period: typing.Optional[str] = None  # "A.M." / "P.M."


@dataclass(frozen=True)
class LanguageProfile:
    """Per-language settings as plain data (reference gruut/lang.py per-lang
    ``get_<lang>_settings`` tables)."""

    lang: str
    major_breaks: typing.Tuple[str, ...] = (".", "?", "!")
    minor_breaks: typing.Tuple[str, ...] = (",", ";", ":")
    word_breaks: typing.Tuple[str, ...] = ("-", "_")
    begin_punctuations: typing.Tuple[str, ...] = ()
    end_punctuations: typing.Tuple[str, ...] = ()
    replacements: typing.Tuple[typing.Tuple[str, str], ...] = (("’", "'"),)
    abbreviations: typing.Tuple[typing.Tuple[str, str], ...] = ()
    spell_out_words: typing.Tuple[typing.Tuple[str, str], ...] = ()
    default_currency: str = "USD"
    currencies: typing.Tuple[typing.Tuple[str, str], ...] = ()
    default_date_format: str = "moy"  # reference const.py DATE_MDY_ORDINAL default
    join_str: str = " "
    keep_whitespace: bool = True
    split_mode: str = "whitespace"  # "whitespace" | "chars" (zh)
    group_separators: typing.Tuple[str, ...] = (",",)
    decimal_separator: str = "."
    date_order: str = "mdy"  # "mdy" | "dmy" | "ymd"
    month_names: typing.Tuple[str, ...] = ()
    hooks: str = ""  # key into HOOK_REGISTRY ("en" for English behaviors)
    # Words treated as lexicon members during tokenization (they are never
    # split/interpreted).  Mirrors the reference's in_lexicon guard which is
    # driven by its 100k-word sqlite lexicons (gruut/text_processor.py:2095).
    protected_words: typing.Tuple[str, ...] = ()
    # Top-frequency function words; used by the quality filter's stopword
    # density heuristic (north-rule addition, no gruut equivalent).
    stopwords: typing.Tuple[str, ...] = ()


@dataclass
class Hooks:
    """Code-level behavior hooks for a language (reference
    TextProcessorSettings callables, gruut/const.py:603-740)."""

    is_initialism: typing.Optional[typing.Callable[[str], bool]] = None
    split_initialism: typing.Optional[typing.Callable[[str], typing.List[str]]] = None
    is_non_word: typing.Optional[typing.Callable[[str], bool]] = None
    get_ordinal: typing.Optional[typing.Callable[[str], typing.Optional[int]]] = None
    parse_time: typing.Optional[typing.Callable[[str], typing.Optional[Time]]] = None
    verbalize_time: typing.Optional[
        typing.Callable[[Time], typing.Iterable[str]]
    ] = None
    is_maybe_date: typing.Optional[typing.Callable[[str], bool]] = None
    is_maybe_time: typing.Optional[typing.Callable[[str], bool]] = None
    # whole-text rewrite before tokenization (reference pre_process_text,
    # text_processor.py:1591-1593 — e.g. the Arabic diacritizer slot)
    pre_process_text: typing.Optional[typing.Callable[[str], str]] = None
    # per-sentence rewrite after assembly (reference post_process_sentence,
    # text_processor.py:1186-1199 — e.g. French liaison); receives the
    # SentenceOut and mutates it in place
    post_process_sentence: typing.Optional[
        typing.Callable[[typing.Any], None]] = None


HOOK_REGISTRY: typing.Dict[str, Hooks] = {}


def register_hooks(key: str, hooks: Hooks) -> None:
    HOOK_REGISTRY[key] = hooks


HAS_DIGIT = re.compile(r"[0-9]")
_SURROUNDING_WS = re.compile(r"^(\s*)(?:.*?)(\s*)$", re.DOTALL)
_NORM_WS = re.compile(r"\s+")
_DEFAULT_WORD = re.compile(r"(\s*\S+(?:\s+|$))")


def has_digit(s: str) -> bool:
    return HAS_DIGIT.search(s) is not None


def get_whitespace(s: str) -> typing.Tuple[str, str]:
    """Leading and trailing whitespace (reference gruut/const.py:565-572)."""
    m = _SURROUNDING_WS.match(s)
    if m is None:
        return "", ""
    return m.group(1), m.group(2)


def normalize_whitespace(s: str) -> str:
    return _NORM_WS.sub(" ", s.strip())


class CompiledProfile:
    """Compiled per-language machinery; build once per worker via
    :func:`get_compiled`."""

    def __init__(self, profile: LanguageProfile):
        self.profile = profile
        self.lang = profile.lang
        self.join_str = profile.join_str
        self.keep_whitespace = profile.keep_whitespace
        p = profile

        def alt(strings: typing.Iterable[str]) -> str:
            return "|".join(re.escape(s) for s in strings)

        self.begin_punct_re = (
            re.compile(f"^({alt(p.begin_punctuations)})") if p.begin_punctuations else None
        )
        self.end_punct_re = (
            re.compile(f"({alt(p.end_punctuations)})$") if p.end_punctuations else None
        )
        # Major break: one-or-more break chars followed by whitespace or EOS
        # (reference const.py:810-818); minor break: single occurrence
        # (const.py:821-828).
        self.major_breaks_re = (
            re.compile(f"((?:{alt(p.major_breaks)})+(?:\\s+|$))") if p.major_breaks else None
        )
        self.minor_breaks_re = (
            re.compile(f"((?:{alt(p.minor_breaks)})(?:\\s+|$))") if p.minor_breaks else None
        )
        self.word_breaks_re = (
            re.compile(f"(?:{alt(p.word_breaks)})") if p.word_breaks else None
        )
        self.replacements = [(re.compile(pat), tmpl) for pat, tmpl in p.replacements]
        # Abbreviation patterns get an optional trailing major break appended
        # automatically (reference const.py:767-784).
        self.abbreviations: typing.List[typing.Tuple[typing.Pattern, str]] = []
        for pat, tmpl in p.abbreviations:
            if not pat.endswith("$") and p.major_breaks:
                pat = f"{pat}(?P<brk>{alt(p.major_breaks)})?(?P<ws>\\s*)$"
                tmpl += r"\g<brk>\g<ws>"
            self.abbreviations.append((re.compile(pat), tmpl))
        # Cheap precheck sets for the per-token hot path: regex splits only
        # run when a character-set test says the token could match (90%+ of
        # web-text tokens carry no attached punctuation).
        self.begin_punct_first = frozenset(s[0] for s in p.begin_punctuations)
        self.end_punct_last = frozenset(s[-1] for s in p.end_punctuations)
        self.major_break_chars = frozenset("".join(p.major_breaks))
        self.minor_break_chars = frozenset("".join(p.minor_breaks))
        # single alternation to screen tokens before the per-pattern
        # abbreviation loop (a miss here implies every pattern misses)
        self.abbrev_trigger = (
            re.compile("|".join(f"(?:{pat})" for pat, _ in p.abbreviations))
            if p.abbreviations else None
        )
        self.spell_out_words = dict(p.spell_out_words)
        self.currencies = dict(p.currencies)
        self.currency_symbols = sorted(self.currencies, key=len, reverse=True)
        self.hooks = HOOK_REGISTRY.get(p.hooks, Hooks())
        self.protected_words = frozenset(p.protected_words)
        self.stopwords = frozenset(p.stopwords)
        self.month_names = p.month_names

    # -- tokenization ------------------------------------------------------

    def split_words(self, text: str) -> typing.List[str]:
        """Whitespace-preserving word split (reference const.py:557-562);
        char split for zh (reference lang.py:843)."""
        if self.profile.split_mode == "chars":
            return list(text)
        return [w for w in _DEFAULT_WORD.findall(text) if w]

    # -- numbers -----------------------------------------------------------

    def parse_decimal(self, text: str):
        """Locale decimal parse mimicking babel.numbers.parse_decimal
        (non-strict): strip group separators, swap the decimal separator,
        then parse (reference gruut/text_processor.py:1867-1872)."""
        from decimal import Decimal, InvalidOperation

        s = text
        for g in self.profile.group_separators:
            s = s.replace(g, "")
        if self.profile.decimal_separator != ".":
            s = s.replace(self.profile.decimal_separator, ".")
        try:
            d = Decimal(s)
        except InvalidOperation:
            return None
        if not d.is_finite():
            return None
        return d

    def is_maybe_date(self, s: str) -> bool:
        if self.hooks.is_maybe_date is not None:
            return self.hooks.is_maybe_date(s)
        return has_digit(s)

    def is_maybe_time(self, s: str) -> bool:
        if self.hooks.is_maybe_time is not None:
            return self.hooks.is_maybe_time(s)
        return has_digit(s)


_COMPILED_CACHE: typing.Dict[str, CompiledProfile] = {}


def compile_profile(profile: LanguageProfile) -> CompiledProfile:
    cp = _COMPILED_CACHE.get(profile.lang)
    if cp is None or cp.profile is not profile:
        cp = CompiledProfile(profile)
        _COMPILED_CACHE[profile.lang] = cp
    return cp
