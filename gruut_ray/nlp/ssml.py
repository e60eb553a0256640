"""Minimal SSML subset parser.

The reference implements a ~500-line event-driven state machine over an
etree stream (reference gruut/text_processor.py:486-1001).  This engine
supports the subset that affects batch text processing:

* ``<speak>`` (auto-wrapped), ``<p>``, ``<s>`` — explicit structure
* ``<w>`` / ``<token>`` — explicit words (never split)
* ``<say-as interpret-as=... format=...>`` — spell-out/date/number/
  currency/time interpretation
* ``<sub alias=...>`` — substitution
* ``<break time=...>`` — pause attribution (word/sentence level)
* ``<phoneme ph=...>`` — explicit pronunciations
* inline ``<lexicon xml:id>`` + scoped ``<lookup ref>`` (role-aware)
* ``lang`` attributes on speak/p/s/w

* ``<voice name>`` and ``<mark name>`` — tracked and attributed to words
* ``<prosody rate/pitch/volume>`` and ``<audio src>`` — inner/fallback
  text is processed normally (matching the reference, which treats both
  as unknown elements and processes their text); the attributes are
  additionally carried attribution-only onto the contained words
  (``Tok.prosody`` / ``Tok.audio_src``), like ``<voice>``.

``<lexicon uri="file://...">`` loads a local W3C PLS document (reference
tests/test_ssml.py:358-386); network URIs are not fetched — no network
at scale, pre-resolve remote lexicons offline.
"""

from __future__ import annotations

import re
import typing
import xml.etree.ElementTree as ET

from gruut_ray.nlp import normalize as N
from gruut_ray.profiles import resolve_lang

_INTERPRET_MAP = {
    "spell-out": N.SPELL_OUT,
    "characters": N.SPELL_OUT,
    "date": N.AS_DATE,
    "number": N.AS_NUMBER,
    "cardinal": N.AS_NUMBER,
    "ordinal": N.AS_NUMBER,
    "digits": N.AS_NUMBER,
    "currency": N.AS_CURRENCY,
    "time": N.AS_TIME,
}

_FORMAT_FOR_INTERPRET = {"ordinal": N.F_ORDINAL, "digits": N.F_DIGITS}

_TIME_RE = re.compile(r"^([0-9]+(?:\.[0-9]*)?)\s*(ms|s)?$")


def _parse_break_ms(value: str) -> int:
    """<break time="250ms"|"2s"> (reference gruut/const.py:284-292).
    A unitless value returns 0 like the reference — defaulting to seconds
    would turn the common author mistake time="250" into a 250 s pause."""
    m = _TIME_RE.match(value.strip().lower())
    if m is None or m.group(2) is None:
        return 0
    num = float(m.group(1))
    return int(num * 1000) if m.group(2) == "s" else int(num)


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _elem_id(elem) -> str:
    """xml:id or id attribute (namespace-agnostic)."""
    for key, value in elem.attrib.items():
        if key == "id" or key.endswith("}id"):
            return value
    return ""


def _elem_lang(elem, default: str) -> str:
    """lang or xml:lang attribute (namespace-agnostic; reference reads
    xml:lang per the SSML spec, e.g. tests/test_ssml.py wikipedia case)."""
    for key, value in elem.attrib.items():
        if key == "lang" or key.endswith("}lang"):
            return value
    return default


def _collect_inline_lexicons(root) -> typing.Dict[
        str, typing.Dict[typing.Tuple[str, str], typing.List[str]]]:
    """<lexicon xml:id=...><lexeme [role]><grapheme>w</grapheme>
    <phoneme>p p</phoneme></lexeme>... (reference
    text_processor.py:596-1001 IN_LEXICON states; format shown in
    reference tests/test_ssml.py:305-340).  file:// URIs load local
    PLS documents; network URIs are not fetched (no network at scale
    — pre-resolve offline, SURVEY §2.1)."""
    lexicons: typing.Dict[str, dict] = {}
    for elem in root.iter():
        if _strip_ns(elem.tag).lower() != "lexicon":
            continue
        lex_id = _elem_id(elem)
        entries = lexicons.setdefault(lex_id, {})
        uri = elem.get("uri", "")
        if uri.startswith("file://"):
            # LOCAL file URIs only (reference tests/test_ssml.py
            # test_lexicon_external): a W3C PLS document whose root holds
            # the lexemes.  Network URIs stay unsupported — no network at
            # scale; pre-resolve remote lexicons offline.
            #
            # SECURITY: loading is OPT-IN via $GRUUT_RAY_ALLOW_FILE_LEXICONS
            # — this engine processes UNTRUSTED web documents, and a
            # hostile <lexicon uri="file:///dev/zero"> would otherwise
            # hang/OOM a worker or read local files into output phonemes.
            # Reads are capped and restricted to regular files.
            import os

            if not os.environ.get("GRUUT_RAY_ALLOW_FILE_LEXICONS"):
                continue
            path = uri[len("file://"):]
            try:
                if not os.path.isfile(path) or \
                        os.path.getsize(path) > 5_000_000:
                    continue
                with open(path, encoding="utf-8") as f:
                    elem = ET.fromstring(f.read(5_000_001))
            except (OSError, ET.ParseError):
                continue
        for lexeme in elem:
            if _strip_ns(lexeme.tag).lower() != "lexeme":
                continue
            role = lexeme.get("role", "")
            grapheme = ""
            phonemes: typing.List[str] = []
            for child in lexeme:
                tag = _strip_ns(child.tag).lower()
                body = "".join(child.itertext()).strip()
                if tag == "grapheme":
                    grapheme = body
                elif tag == "phoneme":
                    phonemes = body.split()
            if grapheme and phonemes:
                entries[(grapheme, role)] = phonemes
    return lexicons


def parse_ssml(
    text: str, default_lang: str, lex: N.LexiconCheck = None
) -> typing.List[typing.List[N.SentenceTokens]]:
    """Parse SSML into the paragraphs/sentences token structure consumed by
    :func:`gruut_ray.nlp.normalize.run_fixed_point`."""
    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        try:
            root = ET.fromstring(f"<speak>{text}</speak>")
        except ET.ParseError:
            # not XML at all (stray '<', control chars): degrade to plain
            # text — mirrors the CLI's forgiving stdin handling
            return [[N.SentenceTokens(
                N.tokenize(text, default_lang, lex), implicit=True,
                lang=default_lang)]]

    paragraphs: typing.List[typing.List[N.SentenceTokens]] = []
    pending_pause_ms = 0
    pending_marks: typing.List[str] = []
    inline_lexicons = _collect_inline_lexicons(root)

    def inline_lookup(word: str, role: str,
                      lookup_stack: typing.Tuple[str, ...],
                      ) -> typing.Optional[typing.List[str]]:
        """Scoped probe: innermost <lookup> refs first, then the default
        (empty-id) lexicon; requested role, then default role (reference
        text_processor.py:569-593)."""
        for lex_id in (*lookup_stack, ""):
            entries = inline_lexicons.get(lex_id)
            if not entries:
                continue
            if role:
                pron = entries.get((word, role))
                if pron is not None:
                    return list(pron)
            pron = entries.get((word, ""))
            if pron is not None:
                return list(pron)
        return None

    def stamp_voice(toks, voice: str, prosody: str = "",
                    audio_src: str = "") -> None:
        if voice:
            for t in toks:
                t.voice = voice
        if prosody:
            for t in toks:
                t.prosody = prosody
        if audio_src:
            for t in toks:
                t.audio_src = audio_src

    def apply_inline(toks, lookup_stack) -> None:
        if not inline_lexicons:
            return
        for t in toks:
            if t.kind == N.WORD and t.phonemes is None:
                pron = inline_lookup(t.text, t.role, lookup_stack)
                if pron is not None:
                    t.phonemes = pron
                    t.in_lexicon = True

    def ensure_par() -> typing.List[N.SentenceTokens]:
        if not paragraphs:
            paragraphs.append([])
        return paragraphs[-1]

    def add_tokens(toks, implicit_sentence: bool, lang: str) -> None:
        nonlocal pending_pause_ms
        if not toks:
            return
        if pending_marks:
            toks[0].marks_before = (toks[0].marks_before or []) \
                + pending_marks
            pending_marks.clear()
        par = ensure_par()
        if not par or (par[-1].implicit != implicit_sentence):
            par.append(N.SentenceTokens([], implicit=implicit_sentence,
                                        lang=lang,
                                        pause_before_ms=pending_pause_ms))
            pending_pause_ms = 0
        par[-1].tokens.extend(toks)

    def walk(elem, lang: str, interpret_as: str, fmt: str,
             in_explicit_sentence: bool,
             lookup_stack: typing.Tuple[str, ...] = (),
             voice: str = "", prosody: str = "",
             audio_src: str = "") -> None:
        nonlocal pending_pause_ms
        tag = _strip_ns(elem.tag).lower()
        if tag in ("metadata", "meta", "desc"):
            return  # non-content elements (SSML spec; reference skips them)
        lang = resolve_lang(_elem_lang(elem, lang))
        if tag == "voice":
            voice = elem.get("name", voice)
        if tag == "prosody":
            # attribution-only carry (compact "rate=..;pitch=..;volume=.."
            # string stamped onto contained words); inner text is processed
            # normally — the reference drops the attributes entirely
            attrs = ";".join(f"{k}={elem.get(k)}"
                             for k in ("rate", "pitch", "volume")
                             if elem.get(k))
            if attrs:
                prosody = f"{prosody};{attrs}" if prosody else attrs
        if tag == "audio":
            # fallback content is processed as text (SSML audio semantics);
            # the source is carried attribution-only
            audio_src = elem.get("src", audio_src)

        if tag == "lexicon":
            return  # data element, collected up front
        if tag == "lookup":
            ref = elem.get("ref", "")
            lookup_stack = (ref, *lookup_stack)

        if tag == "mark":
            # <mark name=.../> attributed to the neighboring words
            # (reference MarkNode, text_processor.py:246-342): after the
            # preceding token AND before the following one
            name = elem.get("name", "")
            par = ensure_par()
            if par and par[-1].tokens:
                last = par[-1].tokens[-1]
                last.marks_after = (last.marks_after or []) + [name]
            pending_marks.append(name)
            return
        if tag == "break":
            ms = _parse_break_ms(elem.get("time", "0"))
            par = ensure_par()
            if par and par[-1].tokens:
                # attach to the preceding token (word-level pause; the
                # reference attributes breaks to neighbors,
                # text_processor.py:246-342) — survives sentence splitting
                par[-1].tokens[-1].pause_after_ms += ms
            else:
                pending_pause_ms += ms
            return
        if tag == "phoneme":
            # explicit pronunciation (reference text_processor.py:929-943):
            # ph="h ə l oʊ" splits on whitespace; words inside keep these
            # phonemes and are never further interpreted
            ph = elem.get("ph", "").split()
            word_text = N.normalize_whitespace("".join(elem.itertext()))
            if word_text:
                tok = N.Tok(N.WORD, word_text, word_text + " ", lang,
                            implicit=False, in_lexicon=True,
                            phonemes=ph or None)
                add_tokens([tok], not in_explicit_sentence, lang)
            return
        if tag == "sub":
            alias = elem.get("alias", "")
            toks = N.tokenize(alias + " ", lang, lex,
                              interpret_as=interpret_as, fmt=fmt)
            apply_inline(toks, lookup_stack)
            stamp_voice(toks, voice, prosody, audio_src)
            add_tokens(toks, not in_explicit_sentence, lang)
            return
        if tag == "say-as":
            interpret_key = elem.get("interpret-as", "").lower()
            interpret_as = _INTERPRET_MAP.get(interpret_key, interpret_as)
            fmt = elem.get("format", _FORMAT_FOR_INTERPRET.get(interpret_key, fmt))
        if tag == "p":
            paragraphs.append([])
        explicit_sentence = in_explicit_sentence
        if tag == "s":
            ensure_par().append(
                N.SentenceTokens([], implicit=False, lang=lang,
                                 pause_before_ms=pending_pause_ms))
            pending_pause_ms = 0
            explicit_sentence = True
        if tag in ("w", "token"):
            # explicit word: NO tokenization — the whole element text is one
            # token (reference "No splitting", text_processor.py:659-686);
            # fixed-point transforms still apply to it afterwards
            word_text = N.normalize_whitespace("".join(elem.itertext()))
            if word_text:
                tok = N.Tok(N.WORD, word_text, word_text + " ", lang,
                            interpret_as=interpret_as, fmt=fmt,
                            role=elem.get("role", ""), implicit=False,
                            in_lexicon=bool(lex and lex(word_text)))
                apply_inline([tok], lookup_stack)
                stamp_voice([tok], voice, prosody, audio_src)
                add_tokens([tok], not explicit_sentence, lang)
            return

        if elem.text and elem.text.strip():
            toks = N.tokenize(elem.text, lang, lex,
                              interpret_as=interpret_as, fmt=fmt)
            apply_inline(toks, lookup_stack)
            stamp_voice(toks, voice, prosody, audio_src)
            add_tokens(toks, not explicit_sentence, lang)
        for child in elem:
            walk(child, lang, interpret_as, fmt, explicit_sentence,
                 lookup_stack, voice, prosody, audio_src)
            if child.tail and child.tail.strip():
                toks = N.tokenize(child.tail, lang, lex,
                                  interpret_as=interpret_as, fmt=fmt)
                apply_inline(toks, lookup_stack)
                stamp_voice(toks, voice, prosody, audio_src)
                add_tokens(toks, not explicit_sentence, lang)

    walk(root, default_lang, "", "", False)
    if not paragraphs:
        paragraphs.append([])
    return paragraphs
