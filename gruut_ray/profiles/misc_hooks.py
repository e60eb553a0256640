"""Catalan + Persian sentence post-processing hooks.

* Catalan (reference gruut/lang.py:2206-2490): (1) the training corpora
  leak an invalid phoneme sequence ``l ʎ l`` which is rewritten to
  ``l l``; (2) contiguous word pairs get sandhi adjustments — diphthong
  formation, vowel fusion, and elision — driven by the reference's
  stressed/high/neutral vowel classes.  Pairing follows the reference's
  node-stream semantics: a break or punctuation between two words blocks
  the pair (the nodes list includes them, and only WordNode-WordNode
  neighbors qualify).
* Persian (reference gruut/lang.py:507-524): append the ezafe vowel
  ``e̞`` to words tagged with the genitive POS ``Ne``.  The reference
  gets that tag from the optional hazm tagger (not installable here), so
  in practice the tag arrives via an explicitly set ``word.pos`` — the
  hook semantics are identical either way.

Both run after phonemization (post_process_sentence timing).
"""

from __future__ import annotations

import typing

from gruut_ray.profiles.base import Hooks, register_hooks

# reference gruut/lang.py:2206-2209
_VOWELS = {"'a", "'ɛ", "'ɔ", "'e", "'i", "'o", "'u", "ə", "i", "u"}
_STRESSED = {"'a", "'ɛ", "'ɔ", "'e", "'i", "'o", "'u"}
_HIGH = {"i", "u", "'i", "'u"}
_NEUTRAL = {"ə"}


def _is_stressed(p: str) -> bool:
    return p in _STRESSED


def _is_high(p: str) -> bool:
    return p in _HIGH


def _is_high_unstressed(p: str) -> bool:
    return p in _HIGH and p in _VOWELS and p not in _STRESSED


def _is_neutral(p: str) -> bool:
    return p in _NEUTRAL


def _ca_diphthong(w1, w2) -> None:
    """reference diphthong_if_needed (gruut/lang.py:2344-2421)."""
    # a preceding pair's elision/fusion can empty a one-phoneme word
    # (reference guards the same way, lang.py:2348)
    if not (w1.phonemes and w2.phonemes):
        return
    last1, first2 = w1.phonemes[-1], w2.phonemes[0]
    if (_is_stressed(last1) and not _is_high(last1)) \
            and _is_high_unstressed(first2):
        # [stressed non-high vowel] + i/u -> glide
        if first2 == "i":
            w2.phonemes[0] = "j"
        elif first2 == "u":
            w2.phonemes[0] = "uw"
    elif _is_high_unstressed(last1) and _is_stressed(first2):
        if last1 == "i" and first2 != "'i" and w1.text in ("hi", "ho", "i"):
            w1.phonemes[-1] = "y"
        # reference leaves the u-case as a no-op (lang.py:2390-2396)
    elif _is_neutral(last1) and _is_high_unstressed(first2):
        if first2 == "i":
            w2.phonemes[0] = "j"
        elif first2 == "u":
            w2.phonemes[0] = "uw"


def _ca_fusion(w1, w2) -> None:
    """reference fusion_if_needed (gruut/lang.py:2259-2305)."""
    if not (w1.phonemes and w2.phonemes):
        return
    last1, first2 = w1.phonemes[-1], w2.phonemes[0]
    if (_is_high_unstressed(last1) and _is_high(first2)
            and _is_stressed(first2)
            and last1 == first2.replace("'", "")):
        w1.phonemes.pop()          # [i]+['i] -> ['i]; [u]+['u] -> ['u]
    elif (_is_high_unstressed(last1) and _is_high_unstressed(first2)
          and last1 == first2):
        w1.phonemes.pop()          # [i]+[i] -> [i]; [u]+[u] -> [u]
    elif (_is_neutral(last1) and _is_neutral(first2)
          and w1.text != "a" and w2.text != "a"):
        w1.phonemes.pop()          # [ə]+[ə] -> [ə] (unless preposition a)


def _ca_elision(w1, w2) -> None:
    """reference elision_if_needed (gruut/lang.py:2308-2341)."""
    if not (w1.phonemes and w2.phonemes):
        return
    last1, first2 = w1.phonemes[-1], w2.phonemes[0]
    if (_is_stressed(last1) and not _is_high(last1)) \
            and (_is_neutral(first2) and w2.text != "a"):
        w2.phonemes.pop(0)
    elif _is_neutral(last1) and (_is_stressed(first2)
                                 and not _is_high(first2)):
        w1.phonemes.pop()


def ca_post_process_sentence(sent) -> None:
    if (sent.lang or "ca") not in ("ca", "ca-ce"):
        return
    # l ʎ l fix runs on every word first (reference order)
    for word in sent.words:
        if not (word.text and word.phonemes):
            continue
        text = " ".join(word.phonemes)
        if "l ʎ l" in text:
            word.phonemes = text.replace("l ʎ l", "l l").split(" ")
    # contiguous pairs: adjacency in the FULL word stream, so a break or
    # punctuation between two words blocks the pair
    pairs: typing.List[tuple] = []
    for w1, w2 in zip(sent.words, sent.words[1:]):
        if w1.is_spoken and w2.is_spoken and w1.text and w1.phonemes \
                and w2.text and w2.phonemes:
            pairs.append((w1, w2))
    for w1, w2 in pairs:
        _ca_diphthong(w1, w2)
        _ca_fusion(w1, w2)
        _ca_elision(w1, w2)


def fa_post_process_sentence(sent) -> None:
    for word in sent.words:
        if word.phonemes and getattr(word, "pos", None) == "Ne":
            word.phonemes = list(word.phonemes) + ["e̞"]


from gruut_ray.profiles.ca_stress import CaPreProcess  # noqa: E402

register_hooks("ca", Hooks(post_process_sentence=ca_post_process_sentence,
                           pre_process_text=CaPreProcess()))
register_hooks("fa", Hooks(post_process_sentence=fa_post_process_sentence))
