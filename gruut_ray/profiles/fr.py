"""French behavior hooks — liaison (reference gruut/lang.py:553-676).

``fr_post_process_sentence`` appends the liaison consonant to a word's
phonemes when (1) it ends with a silent consonant letter, (2) the next
word starts with a French vowel phoneme, and (3) the word pair is a
mandatory-liaison context (determiner/number → noun, pronoun → verb,
preposition/"très", adjective → noun, verb → vowel — the reference's
rule set, after https://www.commeunefrancaise.com/blog/la-liaison).

The reference consults its CRF part-of-speech tagger for the context
check; no French POS model ships in this checkout, so the POS classes
are resolved from closed-class function-word tables (determiners,
numbers, pronouns, short prepositions, the prenominal "BAGS" adjectives)
— which cover exactly the mandatory-liaison triggers.  A word carrying
an explicit ``pos`` attribute still wins.

The hook runs AFTER phonemization (words carry ``phonemes``), matching
the reference's post_process_sentence timing (text_processor.py:1186-99).
"""

from __future__ import annotations

import typing

from gruut_ray.profiles.base import Hooks, register_hooks

# closed-class tables (public French grammar); lowercase match
_DET = {
    "le", "la", "les", "un", "une", "des", "du", "au", "aux",
    "ce", "cet", "cette", "ces", "mon", "ma", "mes", "ton", "ta", "tes",
    "son", "sa", "ses", "notre", "votre", "leur", "nos", "vos", "leurs",
    "quel", "quelle", "quels", "quelles", "quelques", "plusieurs", "tout",
    "tous", "toutes",
}
_NUM = {
    "deux", "trois", "quatre", "cinq", "six", "sept", "huit", "neuf",
    "dix", "vingt", "cent", "cents", "premiers", "premières",
}
_PRON = {
    "on", "ils", "elles", "nous", "vous", "tu", "je", "il", "elle",
    "chacun", "certains", "lui", "eux",
}
_ADP = {"en", "dans", "chez", "sous", "sans", "dès", "sur"}
# prenominal ("BAGS") adjectives + common inflections
_ADJ = {
    "petit", "petite", "petits", "petites", "grand", "grande", "grands",
    "grandes", "gros", "grosse", "grosses", "beau", "bel", "belle",
    "belles", "beaux", "bon", "bonne", "bons", "bonnes", "mauvais",
    "mauvaise", "mauvaises", "jeune", "jeunes", "vieux", "vieil",
    "vieille", "vieilles", "joli", "jolie", "jolis", "jolies", "long",
    "longue", "longs", "longues", "nouveau", "nouvel", "nouvelle",
    "nouveaux", "nouvelles", "autre", "autres", "ancien", "ancienne",
    "anciens", "anciennes", "excellent", "excellente", "excellents",
    "excellentes", "premier", "première", "dernier", "dernière", "haut",
    "haute", "hauts", "hautes",
}
_VERB = {
    "est", "sont", "ont", "êtes", "sommes", "suis", "es", "a", "avons",
    "avez", "était", "étaient", "avait", "avaient", "serait", "seraient",
    "vont", "vais", "va", "allons", "allez",
}

# exactly the reference's fr_is_vowel set (gruut/lang.py:643-662)
_VOWELS = {
    "i", "y", "u", "e", "ø", "o", "ə", "ɛ", "œ", "ɔ", "a",
    "ɔ̃", "ɛ̃", "ɑ̃", "œ̃",
}


def _pos_of(word) -> str:
    if getattr(word, "pos", None):
        return word.pos
    text = (word.text or "").lower()
    if text in _DET:
        return "DET"
    if text in _NUM:
        return "NUM"
    if text in _PRON:
        return "PRON"
    if text in _ADP:
        return "ADP"
    if text in _ADJ:
        return "ADJ"
    if text in _VERB:
        return "VERB"
    return ""


def _has_silent_consonant(last_char: str, last_phoneme: str) -> bool:
    """Reference fr_has_silent_consonant (gruut/lang.py:628-640)."""
    if last_char in {"d", "p", "t"}:
        return last_phoneme != last_char
    if last_char == "r":
        return last_phoneme != "ʁ"
    if last_char in {"s", "x", "z"}:
        return last_phoneme not in {"s", "z"}
    if last_char == "n":
        return last_phoneme not in {"n", "ŋ"}
    return False


def fr_post_process_sentence(sent) -> None:
    """Mutate liaison consonants onto ``sent.words`` phonemes."""
    spoken = [w for w in sent.words if w.is_spoken]
    for word1, word2 in zip(spoken, spoken[1:]):
        if not (word1.text and word1.phonemes
                and word2.text and word2.phonemes):
            continue
        last_char1 = word1.text[-1].lower()
        if not _has_silent_consonant(last_char1, word1.phonemes[-1]):
            continue
        if word2.phonemes[0] not in _VOWELS:
            continue

        pos1 = _pos_of(word1)
        pos2 = _pos_of(word2)
        liaison = False
        if word1.text.lower() == "et":
            pass  # never liaise after "et"
        elif pos1 in {"DET", "NUM"}:
            liaison = True
        elif pos1 == "PRON" and pos2 in {"AUX", "VERB"}:
            liaison = True
        elif pos1 == "ADP" or word1.text.lower() == "très":
            liaison = True
        elif pos1 == "ADJ" and pos2 in {"NOUN", "PROPN", ""}:
            # no French noun tagger: a following non-function word is
            # treated as the noun the prenominal adjective modifies
            liaison = True
        elif pos1 in {"AUX", "VERB"}:
            liaison = True

        if not liaison:
            continue
        # s/x/z -> z ; d -> t ; t/p/n -> same letter (reference :611-625)
        phonemes = list(word1.phonemes)
        if last_char1 in {"s", "x", "z"}:
            phonemes.append("z")
        elif last_char1 == "d":
            phonemes.append("t")
        elif last_char1 in {"t", "p", "n"}:
            phonemes.append(last_char1)
        word1.phonemes = phonemes


register_hooks("fr", Hooks(post_process_sentence=fr_post_process_sentence))
