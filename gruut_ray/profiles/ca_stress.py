"""Catalan orthographic stress marking for out-of-lexicon words.

The reference pre-processes Catalan text before tokenization
(``CatalanPreProcessText``, gruut/lang.py:2156-2204): every token missing
from the lexicon is rewritten with its tonic accent mark
(``Transcripcio.stress_word``, lang.py:1702-2140) so the downstream
lexicon/G2P sees the accented form — e.g. ``aerolliscador`` →
``aerolliscadór``, ``ple`` → ``plè``.  This module reimplements that
algorithm from the reference's behavior spec in condensed form:

1. nucleus finding — which vowel letters are syllable nuclei, with the
   i/u glide rules, gu/qu digraphs, diaeresis and -isme/-ir suffix cases
   (``MotNuclis.troba_nuclis_mot``, lang.py:1322-1580);
2. syllable splitting — consonant-cluster boundaries with the
   inseparable-onset table (``separa_sillabes``, lang.py:1583-1690);
3. tonic placement — graphic accent wins; monosyllables are tonic unless
   function words; ``-ment`` adverbs stress both stem and suffix; else
   the twelve-termination paroxytone rule (``troba_accent_tonic_mot`` /
   ``dotze_term`` / ``accentua_mot``, lang.py:1898-2068);
4. accent character — è always for e, ó in the final syllable / ò
   earlier for o, table lookup otherwise (``stress_tonic``,
   lang.py:2070-2131).

Data tables below are the reference's spec data (lang.py:856-1061),
same category as profiles/data.py's punctuation/abbreviation tables.
"""

from __future__ import annotations

import typing

# --- spec data (reference gruut/lang.py:856-1061) --------------------------

VOWELS = set("aäàeëéèiíïoöóòuüú")
ACCENTED = set("àéèíóòú")
NUCLITIC = set("aàeéèíïoóòú")
ACCENT_CHANGES = {"a": "à", "e": "é", "i": "í", "ï": "í",
                  "o": "ó", "u": "ú", "ü": "ú"}
INSEPARABLES = {
    "bh", "bl", "br", "ch", "cl", "cr", "dh", "dj", "dr", "fh", "fl",
    "fr", "gh", "gl", "gr", "gu", "gü", "jh", "kh", "kl", "kr", "lh",
    "ll", "mh", "nh", "ny", "ph", "pl", "pr", "qu", "qü", "rh", "sh",
    "th", "tr", "vh", "wh", "xh", "yh", "zh",
}
VOC_IR = {"cuir", "vair"}
EINESGRAM = {
    "-de-", "-en", "-hi", "-ho", "-i", "-i-", "-la", "-les", "-li",
    "-lo", "-los", "-me", "-ne", "-nos", "-se", "-te", "-us", "-vos",
    "a", "a-", "al", "als", "amb", "bi-", "co", "de", "de-", "del",
    "dels", "el", "els", "em", "en", "ens", "es", "et", "hi", "ho",
    "i", "i-", "la", "les", "li", "lo", "ma", "me", "mon", "na",
    "pel", "pels", "per", "que", "re", "sa", "se", "ses", "si", "sos",
    "sub", "ta", "te", "tes", "ton", "un", "uns", "us",
}
EXCEP_ACC = {
    "antropologico": "antropològico", "arterio": "artèrio",
    "artistico": "artístico", "basquet": "bàsquet", "cardio": "càrdio",
    "catolico": "catòlico", "cientifico": "científico",
    "circum": "círcum", "civico": "cívico", "democrata": "demòcrata",
    "democratico": "democràtico", "dumping": "dúmping",
    "economico": "econòmico", "edgar": "èdgar", "fenicio": "fenício",
    "filosofico": "filosòfico", "fisico": "físico", "fisio": "físio",
    "geografico": "geogràfico", "hetero": "hétero",
    "higenico": "higènico", "higienico": "higiènico", "hiper": "híper",
    "historico": "històrico", "ibero": "íbero",
    "ideologico": "ideològico", "input": "ínput", "inter": "ínter",
    "jonatan": "jònatan", "juridico": "jurídico", "labio": "làbio",
    "linguo": "línguo", "literario": "literàrio", "logico": "lògico",
    "magico": "màgico", "maniaco": "maníaco", "marketing": "màrketing",
    "oxido": "òxido", "petroleo": "petròleo", "politico": "político",
    "quantum": "quàntum", "quimico": "químico", "quimio": "químio",
    "radio": "ràdio", "romanico": "romànico", "simbolico": "simbòlico",
    "socio": "sòcio", "super": "súper", "tecnico": "tècnico",
    "teorico": "teòrico", "tragico": "tràgico", "traqueo": "tràqueo",
}
DIFT_DECR = ("au", "ai", "eu", "ei", "ou", "oi", "iu", "àu", "ui")
VOC_SOLA = set("aeiouïü")
VOC_MES_S = {"as", "es", "is", "os", "us", "às", "ès"}
EN_IN = {"en", "in", "àn"}

# -ir/-isme verbal & nominal suffixes where the i IS a nucleus even after
# a vowel (reference gicf_suf, lang.py:1094-1160)
_I_SUFFIXES = ("isme", "ista", "ismes", "istes", "ir", "int", "iré",
               "iràs", "irà", "irem", "ireu", "iran", "iria", "iries",
               "iríem", "iríeu", "irien")


def _i_suffix(word: str, pos: int) -> bool:
    rest = word[pos:]
    # -isme/-ista endings match on the tail alone; the verbal -ir family
    # matches only when the FIRST occurrence sits at pos (reference uses
    # word.find(suffix) == pos, gicf_suf lang.py:1102-1160)
    if rest in ("isme", "ista", "ismes", "istes"):
        return True
    for suf in _I_SUFFIXES[4:]:
        if rest == suf and word.find(suf) == pos:
            return word not in VOC_IR if suf == "ir" else True
    return False


def find_nuclei(word: str) -> typing.List[int]:
    """Syllable-nucleus positions (reference troba_nuclis_mot,
    lang.py:1339-1580, minus the adverb wrapping handled by the caller)."""
    n = len(word)
    nuclei: typing.List[int] = []
    for i, c in enumerate(word):
        if nuclei and nuclei[-1] == i:
            continue  # pre-claimed by the argü two-nucleus case
        prev = word[:i]
        if c in NUCLITIC:
            nuclei.append(i)
        elif c == "i":
            if _i_suffix(word, i):
                nuclei.append(i)
            elif not prev or prev == "h":
                # iode/hiena (glide before vowel) vs i/hi/ira (nucleus)
                if i == n - 1 or word[i + 1] not in VOWELS:
                    nuclei.append(i)
            elif prev in ("u", "hu"):
                # ui/uix word-initial: u already handled; i after u…
                if not (i == n - 1 or word[i + 1] == "x"):
                    nuclei.append(i)
                elif prev == "hu" and i == n - 1:
                    nuclei.append(i)
            elif word[i - 1] == "u":
                # vowel+u+i → u is glide, i is nucleus; gui/qui → nucleus
                if len(prev) > 1 and (word[i - 2] in VOWELS
                                      or word[i - 2] in "qg"):
                    nuclei.append(i)
            elif word[i - 1] == "ü":
                nuclei.append(i)
            elif word[i - 1] in VOWELS:
                pass  # falling diphthong: vowel + i glide
            else:
                nuclei.append(i)
        elif c == "u":
            if not prev or prev == "h":
                if i == n - 1 or word in ("ui", "uix") \
                        or word.find("ix") == i + 1 \
                        or word[i + 1] not in VOWELS:
                    nuclei.append(i)
            elif prev == "i":
                nuclei.append(i)
            elif word[i - 1] == "i":
                # vowel+i+u → i glide, u nucleus; gui/qui+u → glide
                if len(prev) > 2 and word[i - 3:i - 1] in ("gu", "qu"):
                    pass
                elif len(prev) >= 2 and word[i - 2] in VOWELS:
                    nuclei.append(i)
            elif word[i - 1] in "gq":
                if i == n - 1 or word[i + 1] not in VOWELS:
                    nuclei.append(i)
            elif word[i - 1] == "ü":
                nuclei.append(i)
            elif word[i - 1] in VOWELS:
                pass  # falling diphthong
            else:
                nuclei.append(i)
        elif c == "ü":
            pos = word.find("argü")
            if pos != -1:
                if pos + 3 == i:
                    nuclei.append(i)
                    nuclei.append(i + 1)
            elif i > 0 and word[i - 1] not in "gq":
                nuclei.append(i)
    return nuclei


def split_syllables(word: str, nuclei: typing.List[int],
                    ) -> typing.Tuple[typing.List[str], typing.List[int]]:
    """Split on consonant clusters between nuclei (reference
    separa_sillabes, lang.py:1583-1690).  Returns (syllables,
    per-syllable nucleus index)."""
    if len(nuclei) == 1:
        return [word], [nuclei[0]]
    borders: typing.List[int] = []
    for i in range(len(nuclei) - 1):
        gap = nuclei[i + 1] - nuclei[i] - 1
        start = nuclei[i] + 1
        if gap <= 1:
            borders.append(nuclei[i])
        elif gap == 2:
            if word[start:start + 2] in INSEPARABLES \
                    or word[start + 1] == "h":
                borders.append(nuclei[i])
            else:
                borders.append(nuclei[i] + 1)
        elif gap == 3:
            if word[start + 1:start + 3] in INSEPARABLES:
                borders.append(nuclei[i] if word[start] == "-"
                               else nuclei[i] + 1)
            else:
                borders.append(nuclei[i] + 1 if word[start + 2] == "-"
                               else nuclei[i] + 2)
        elif gap == 4:
            cluster = word[start:start + 4]
            s_pos = cluster.find("s")
            borders.append(nuclei[i] + s_pos + 1 if s_pos != -1
                           else nuclei[i] + 2)
        elif gap == 5:
            borders.append(nuclei[i] + 3)
        else:
            raise ValueError(f"consonant cluster too large in {word!r}")
    sylls: typing.List[str] = []
    prev_end = 0
    for b in borders:
        sylls.append(word[prev_end:b + 1])
        prev_end = b + 1
    sylls.append(word[prev_end:])
    nuc_local = [nuclei[0]]
    consumed = len(sylls[0])
    for i in range(1, len(nuclei)):
        nuc_local.append(nuclei[i] - consumed)
        consumed += len(sylls[i])
    return sylls, nuc_local


def _is_adverb(word: str) -> bool:
    # endswith -ment and not in the (empty in this reference version)
    # noun-exception set (reference es_adverbi, lang.py:1455-1469)
    return word.endswith("ment")


def _dotze_term(sylls: typing.List[str], nuc: typing.List[int]) -> bool:
    """True when the word is paroxytone by the twelve-terminations /
    falling-diphthong rule (reference dotze_term, lang.py:1904-1963)."""
    last = sylls[-1].lower()
    size = len(last)
    if size >= 2:
        last2 = last[-2:]
        for dift in DIFT_DECR:
            if last2 == dift:
                # diphthong whose second vowel is the nucleus → aguda
                return not nuc[-1] == size - 2
        if last[-1] in VOC_SOLA:
            return True
        if last[-1] == "s":
            if size >= 3:
                for dift in DIFT_DECR:
                    if last[-3:-1] == dift:
                        return not nuc[-1] == size - 3
            if last2 in VOC_MES_S:
                return True
        if last2 in EN_IN:
            return True
    return last[-1] in VOC_SOLA


def stress_word(word: str) -> str:
    """Accent-mark an out-of-lexicon Catalan word (reference
    Transcripcio.stress_word, lang.py:2133-2140).  Lowercases like the
    reference's normalize step; words already carrying a graphic accent
    (or with no vowel nucleus) come back otherwise unchanged."""
    w = word.lower()
    w = EXCEP_ACC.get(w, w)

    adverb = _is_adverb(w)
    stem = w[:-4] if adverb else w
    nuclei = find_nuclei(stem)
    if adverb:
        nuclei = nuclei + [len(w) - 3]  # the e of -ment
    if not nuclei:
        return w
    sylls, nuc = split_syllables(w, nuclei)
    numsil = len(sylls)
    tonic = [False] * numsil

    has_accent = False
    for i, s in enumerate(sylls):
        if any(ch in ACCENTED for ch in s):
            has_accent = True
            tonic[i] = True
            if sylls[-1] == "ment":
                tonic[-1] = True
            break
    if not has_accent:
        if numsil == 1:
            if w in EINESGRAM:
                return w
            tonic[0] = True
        elif sylls[-1] == "ment":
            if numsil - 1 > 1:
                if _dotze_term(sylls[:-1], nuc[:-1]):
                    tonic[numsil - 3] = True
                else:
                    tonic[numsil - 2] = True
                tonic[-1] = True
                nuc[-1] = 1  # the e of ment
            else:
                tonic[0] = True
                tonic[-1] = True
        else:
            if _dotze_term(sylls, nuc):
                tonic[numsil - 2] = True
            else:
                tonic[numsil - 1] = True

    if any(ch in ACCENTED for ch in w):
        # graphic accent already present → text unchanged
        return w
    out: typing.List[str] = []
    for j, (s, k, t) in enumerate(zip(sylls, nuc, tonic)):
        if t and 0 <= k < len(s) and s[k] not in ACCENTED:
            ch = s[k]
            if ch == "e":
                ch = "è"
            elif ch == "o":
                ch = "ó" if j == numsil - 1 else "ò"
            else:
                ch = ACCENT_CHANGES.get(ch, ch)
            s = s[:k] + ch + s[k + 1:]
        out.append(s)
    return "".join(out)


# --- the pre-process hook (reference CatalanPreProcessText) ----------------

_BREAK_CHARS = set(" .?!,;:…\"“«[(<„¡¿”»])>_\n\t\r")


class CaPreProcess:
    """Whole-text rewrite: accent-mark every token the ca lexicon does
    not know (reference lang.py:2156-2204).  The lexicon word-set loads
    lazily once per process from the discovered ca pack."""

    def __init__(self):
        self._lookup: typing.Optional[typing.Callable] = None
        self._loaded = False

    def _lexicon_has(self, token: str) -> bool:
        if not self._loaded:
            self._loaded = True
            try:
                from gruut_ray.phonem.lexicon import Lexicon
                from gruut_ray.phonem.packs import discover

                pack = discover().get("ca")
                if pack is not None and pack.lexicon_db:
                    lex = Lexicon.from_sqlite(pack.lexicon_db)
                    self._lookup = lex.lookup
            except Exception:  # noqa: BLE001 — degrade to stress-all
                self._lookup = None
        if self._lookup is None:
            return False
        try:
            return self._lookup(token) is not None
        except Exception:  # noqa: BLE001
            return False

    def __call__(self, text: str) -> str:
        out: typing.List[str] = []
        token: typing.List[str] = []

        def flush():
            if token:
                tok = "".join(token)
                del token[:]
                try:
                    out.append(tok if self._lexicon_has(tok)
                               else stress_word(tok))
                except Exception:  # noqa: BLE001 — reference never raises
                    out.append(tok)

        for ch in text.strip():
            if ch in _BREAK_CHARS:
                flush()
                out.append(ch)
            else:
                token.append(ch)
        flush()
        return "".join(out)
