"""Drop-in library API matching the reference's top-level surface.

``gruut.sentences(text, lang=...)`` (reference gruut/__init__.py:36-91) is
the function existing gruut users call; :func:`sentences` accepts the same
arguments and yields the same per-sentence records (``SentenceOut`` mirrors
the reference ``Sentence`` dataclass).  The thread-local processor cache of
the reference becomes a module-level stage singleton — stateless to
callers either way.
"""

from __future__ import annotations

import typing

from gruut_ray.nlp.normalize import NormalizeOptions, SentenceOut

import threading

_STAGES: typing.Dict[str, typing.Any] = {}
_STAGE_LOCK = threading.Lock()


def _stage(espeak: bool = False):
    key = "espeak" if espeak else "ipa"
    stage = _STAGES.get(key)
    if stage is None:
        with _STAGE_LOCK:  # one heavy lexicon/G2P build, even threaded
            stage = _STAGES.get(key)
            if stage is None:
                from gruut_ray.stages.phonemize import PhonemizeStage

                stage = _STAGES[key] = PhonemizeStage(espeak=espeak)
    return stage


def is_language_supported(lang: str) -> bool:
    """True if the engine supports ``lang``
    (reference gruut/__init__.py:97-99)."""
    from gruut_ray.profiles import known_langs, resolve_lang

    return resolve_lang(lang) in known_langs()


def get_supported_languages() -> typing.Set[str]:
    """Set of supported languages (reference gruut/__init__.py:102-104)."""
    from gruut_ray.profiles import known_langs

    return set(known_langs())


def sentences(
    text: str,
    lang: str = "en_US",
    ssml: bool = False,
    espeak: bool = False,
    major_breaks: bool = True,
    minor_breaks: bool = True,
    punctuations: bool = True,
    phonemes: bool = True,
    break_phonemes: bool = True,
    pos: bool = True,
    verbalize_numbers: bool = True,
    verbalize_currency: bool = True,
    verbalize_dates: bool = True,
    verbalize_times: bool = True,
    post_process: bool = True,
) -> typing.Iterable[SentenceOut]:
    """Process text into sentences (reference gruut/__init__.py:36-91
    signature).  ``espeak=True`` selects the eSpeak phoneme variant of the
    language data packs (reference ``model_prefix``); languages without an
    eSpeak pack yield words with empty phonemes in that mode."""
    from gruut_ray.nlp.normalize import process_document
    from gruut_ray.phonem.pos import tags_to_roles

    stage = _stage(espeak=espeak)
    short = stage._short(lang)
    stage._ensure_lang(short)  # lazy per-language pack load
    word_set = stage._word_sets.get(short)
    lex_check = (lambda w: w in word_set) if word_set else None
    opts = NormalizeOptions(
        detect_numbers=verbalize_numbers, verbalize_numbers=verbalize_numbers,
        detect_currency=verbalize_currency,
        verbalize_currency=verbalize_currency,
        detect_dates=verbalize_dates, verbalize_dates=verbalize_dates,
        detect_times=verbalize_times, verbalize_times=verbalize_times,
    )

    # post hooks run HERE, after phonemization — the reference's
    # post_process_sentence timing (hooks like French liaison read
    # word.phonemes, text_processor.py:1186-1199) — not inside
    # process_document's assemble
    sents = process_document(text, lang=lang, lex=lex_check, opts=opts,
                             ssml=ssml, post_process=False)
    from gruut_ray.profiles import get_compiled

    def _models_for(word_lang: str):
        """Per-WORD lexicon/G2P: multi-language SSML (xml:lang) must not
        phonemize Spanish words with the English lexicon (the reference
        resolves settings per word.lang)."""
        wshort = stage._short(word_lang or lang)
        stage._ensure_lang(wshort)
        return stage.lexicons.get(wshort), stage.g2p.get(wshort)

    for sent in sents:
        sent_short = stage._short(sent.lang or lang)
        spoken = [i for i, w in enumerate(sent.words) if w.is_spoken]
        if pos and spoken:
            # pack CRF tagger when the language ships one, en heuristic
            # otherwise (stage.pos_tags resolves; reference lang.py:75-85)
            tags = stage.pos_tags(
                sent_short, [sent.words[i].text for i in spoken])
            if tags is not None:
                roles = tags_to_roles(tags)
                for k, i in enumerate(spoken):
                    sent.words[i].pos = tags[k]
                    if not sent.words[i].role:
                        sent.words[i].role = roles[k]
        kept = []
        for w in sent.words:
            if w.is_major_break and not major_breaks:
                continue
            if w.is_minor_break and not minor_breaks:
                continue
            if w.is_punctuation and not punctuations:
                continue
            if w.is_break and not break_phonemes:
                w.phonemes = None
            if phonemes and w.is_spoken and w.phonemes is None:
                lexicon, g2p = _models_for(w.lang or sent.lang)
                # Lexicon.lookup already probes casefolded/stripped forms
                pron = lexicon.lookup(w.text, role=w.role or None) \
                    if lexicon else None
                if pron is not None:
                    w.phonemes = list(pron)
                elif g2p is not None and w.text:
                    # reference lowercases before the G2P guess
                    # (lang.py:116 transform_func=str.lower)
                    w.phonemes = list(g2p(w.text.lower()))
            kept.append(w)
        for i, w in enumerate(kept):
            w.idx = i
        sent.words = kept
        if post_process:
            post = get_compiled(sent.lang or lang).hooks.post_process_sentence
            if post is not None:
                post(sent)
        yield sent
