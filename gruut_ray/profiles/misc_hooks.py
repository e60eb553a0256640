"""Catalan + Persian sentence post-processing hooks.

* Catalan (reference gruut/lang.py:2424-2470): the reference training
  corpora leak an invalid phoneme sequence ``l ʎ l``; the hook rewrites
  it to ``l l`` in any word's phonemes.
* Persian (reference gruut/lang.py:507-524): append the ezafe vowel
  ``e̞`` to words tagged with the genitive POS ``Ne``.  The reference
  gets that tag from the optional hazm tagger (not installable here), so
  in practice the tag arrives via an explicitly set ``word.pos`` —
  the hook semantics are identical either way.

Both run after phonemization (post_process_sentence timing).
"""

from __future__ import annotations

from gruut_ray.profiles.base import Hooks, register_hooks


def ca_post_process_sentence(sent) -> None:
    for word in sent.words:
        if not (word.text and word.phonemes):
            continue
        text = " ".join(word.phonemes)
        if "l ʎ l" in text:
            word.phonemes = text.replace("l ʎ l", "l l").split(" ")


def fa_post_process_sentence(sent) -> None:
    for word in sent.words:
        if word.phonemes and getattr(word, "pos", None) == "Ne":
            word.phonemes = list(word.phonemes) + ["e̞"]


register_hooks("ca", Hooks(post_process_sentence=ca_post_process_sentence))
register_hooks("fa", Hooks(post_process_sentence=fa_post_process_sentence))
