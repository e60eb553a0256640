"""Multi-language phonemizer parity against the reference's own test
vectors (vendored from reference tests/test_sqlite_phonemizer.py — the
"my hovercraft is full of eels" suite).

Strict goldens run for languages whose pronunciations resolve fully from
real gruut data packs (it, lb, sv via lexicon.db + CRF model.crf) or the
committed seed lexicons (de, fr, es) — plus en in tests/test_phonem.py.
Languages whose packs ship alignments but no IPA CRF model (cs, nl) check
the lexicon words strictly and require non-empty trained-perceptron
guesses for the rest.

Pack-dependent tests skip cleanly when no gruut data packs are on disk
(see gruut_ray/phonem/packs.py search order).
"""

from __future__ import annotations

import pytest

import gruut_ray
from gruut_ray.phonem import packs

PACKS = packs.discover()


def get_phonemes(text, lang, espeak=False):
    """(word, phonemes) pairs — reference tests/test_sqlite_phonemizer.py
    get_phonemes shape."""
    return [(w.text, list(w.phonemes))
            for s in gruut_ray.sentences(text, lang=lang, espeak=espeak)
            for w in s.words if w.phonemes]


def _needs(lang, what="lexicon_db"):
    pack = PACKS.get(lang)
    return pytest.mark.skipif(
        pack is None or getattr(pack, what, None) is None,
        reason=f"no {lang} gruut data pack ({what}) found")


# -- strict goldens: seeds (always run) -------------------------------------

def test_hovercraft_de():
    assert get_phonemes("Mein Luftkissenfahrzeug ist voller Aale.",
                        "de_DE") == [
        ("Mein", ["m", "aɪ̯", "n"]),
        ("Luftkissenfahrzeug",
         ["l", "ʊ", "f", "t", "k", "ɪ", "s", "z", "ɛ", "n",
          "f", "a", "ʁ", "t", "s", "ɔ", "ɔʏ̯", "k"]),
        ("ist", ["ʔ", "ɪ", "s", "t"]),
        ("voller", ["v", "ɔ", "l", "l", "ɐ"]),
        ("Aale", ["ʔ", "aː", "l", "ə"]),
        (".", ["‖"]),
    ]


def test_hovercraft_fr():
    assert get_phonemes("Mon aéroglisseur est plein d'anguilles.",
                        "fr_FR") == [
        ("Mon", ["m", "ɔ̃", "n"]),
        ("aéroglisseur", ["a", "e", "ʁ", "ɔ", "ɡ", "l", "i", "s", "œ", "ʁ"]),
        ("est", ["ɛ"]),
        ("plein", ["p", "l", "ɛ̃"]),
        ("d'anguilles", ["d", "ɑ̃", "ɡ", "i", "j"]),
        (".", ["‖"]),
    ]


def test_hovercraft_es():
    assert get_phonemes("Mi aerodeslizador está lleno de anguilas.",
                        "es_ES") == [
        ("Mi", ["m", "i"]),
        ("aerodeslizador",
         ["a", "e", "ɾ", "o", "d", "e", "s", "l", "i", "θ", "a", "d",
          "o", "ɾ"]),
        ("está", ["e", "s", "t", "a"]),
        ("lleno", ["ʎ", "e", "n", "o"]),
        ("de", ["d", "e"]),
        ("anguilas", ["a", "n", "g", "i", "l", "a", "s"]),
        (".", ["‖"]),
    ]


# -- strict goldens: real packs (lexicon.db + model.crf) --------------------

@_needs("it")
def test_hovercraft_it():
    assert get_phonemes("Il mio hovercraft è pieno di anguille.",
                        "it_IT") == [
        ("Il", ["i", "l"]),
        ("mio", ["ˈm", "i", "o"]),
        ("hovercraft", ["o", "v", "e", "r", "k", "r", "a", "f", "t"]),
        ("è", ["ɛ"]),
        ("pieno", ["ˈp", "j", "ɛ", "n", "o"]),
        ("di", ["ˈd", "i"]),
        ("anguille", ["a", "n", "ɡ", "w", "i", "l", "l", "e"]),
        (".", ["‖"]),
    ]


@_needs("lb")
def test_hovercraft_lb():
    # note the curly apostrophe in d’Sonn: the lb profile's replacement
    # normalizes it and the CRF guess runs on the lowercased word —
    # both required for reference parity
    assert get_phonemes(
        "An der Zäit hunn sech den Nordwand an d’Sonn gestridden.",
        "lb_LB") == [
        ("An", ["ɑ", "n"]),
        ("der", ["d", "ɐ"]),
        ("Zäit", ["ʦ", "æːɪ", "t"]),
        ("hunn", ["h", "u", "n"]),
        ("sech", ["z", "ə", "ɕ"]),
        ("den", ["d", "ə", "n"]),
        ("Nordwand", ["n", "o", "ʀ", "d", "v", "ɑ", "n", "t"]),
        ("an", ["ɑ", "n"]),
        ("d'Sonn", ["d", "z", "o", "n"]),
        ("gestridden", ["g", "ə", "ʃ", "t", "ʀ", "i", "d", "ə", "n"]),
        (".", ["‖"]),
    ]


@_needs("sv")
def test_hovercraft_sv():
    assert get_phonemes("Min svävare är full med ål.", "sv_SE") == [
        ("Min", ["m", "iː", "n"]),
        ("svävare", ["²s", "v", "'ɛː", "v", "a", "r", "ɛ"]),
        ("är", ["ɛː", "r"]),
        ("full", ["f", "ɵ", "l"]),
        ("med", ["m", "eː", "d"]),
        ("ål", ["oː", "l"]),
        (".", ["‖"]),
    ]


# -- lexicon-strict + trained-perceptron guesses (cs, nl) -------------------

@_needs("cs")
def test_hovercraft_cs():
    out = dict(get_phonemes("Moje vznášedlo je plné úhořů.", "cs-cz"))
    assert out["Moje"] == ["m", "o", "j", "ɛ"]
    assert out["vznášedlo"] == ["v", "z", "n", "aː", "ʃ", "ɛ", "d", "l", "o"]
    assert out["je"] == ["j", "ɛ"]
    assert out["plné"] == ["p", "l", "n", "ɛː"]
    assert out["."] == ["‖"]
    # úhořů is OOV: guessed by the committed trained perceptron (no IPA
    # model.crf ships for cs) — which reproduces the reference golden
    assert out["úhořů"] == ["uː", "ɦ", "o", "r̝", "uː"]


@_needs("nl")
def test_hovercraft_nl():
    # FULL golden parity (reference tests/test_sqlite_phonemizer.py
    # test_nl) — the nl pack lexicon covers every word since lazy pack
    # loading landed; upgraded from the old partial form in r3
    assert get_phonemes("Mijn luchtkussenboot zit vol paling.", "nl") == [
        ("Mijn", ["m", "ɛi", "n"]),
        ("luchtkussenboot",
         ["ˈl", "ʏ", "x", "t", "k", "ʏ", "s", "ə", "n", "ˌb", "o", "t"]),
        ("zit", ["z", "ɪ", "t"]),
        ("vol", ["v", "ɔ", "l"]),
        ("paling", ["p", "a", "l", "ɪ", "ŋ"]),
        (".", ["‖"]),
    ]


@_needs("ca")
def test_ca_pack_loads():
    out = dict(get_phonemes("El meu aerolliscador està ple d'anguiles.",
                            "ca"))
    assert out["meu"] == ["m", "'e", "uw"]  # lexicon hit (reference golden)
    # remaining words resolve via lexicon or ca CRF — all non-empty
    assert all(len(p) > 0 for p in out.values())


# -- espeak variant ---------------------------------------------------------

@_needs("en", "espeak_crf_model")
def test_espeak_mode_en():
    out = dict(get_phonemes("My hovercraft is full of eels.", "en_US",
                            espeak=True))
    assert len(out) >= 6  # every word got espeak phonemes
    assert out["hovercraft"]  # non-empty, from the espeak lexicon/CRF


def test_espeak_mode_no_ray_packs_ok():
    # espeak mode with no pack for the language: words keep empty phonemes
    # (documented degradation), no crash
    out = [(w.text, w.phonemes)
           for s in gruut_ray.sentences("hello", lang="zh", espeak=True)
           for w in s.words]
    assert out  # processed without error


# -- API surface ------------------------------------------------------------

def test_supported_languages_api():
    assert gruut_ray.is_language_supported("en_US")
    assert gruut_ray.is_language_supported("de")
    assert not gruut_ray.is_language_supported("xx-zz")
    langs = gruut_ray.get_supported_languages()
    assert {"en-us", "de-de", "fr-fr", "es-es"} <= langs


# -- CRF model reader unit checks ------------------------------------------

@_needs("lb", "crf_model")
def test_crf_reader_matches_reference_outputs():
    """Words whose reference pronunciations are CRF-derived (not in any
    lexicon) reproduce bit-identically — validates the from-scratch
    crf1d reader + Viterbi against known reference outputs."""
    from gruut_ray.phonem.crf_g2p import CrfG2P

    lb = CrfG2P.load(PACKS["lb"].crf_model)
    assert list(lb("d'sonn")) == ["d", "z", "o", "n"]
    if PACKS.get("it") and PACKS["it"].crf_model:
        it = CrfG2P.load(PACKS["it"].crf_model)
        assert list(it("il")) == ["i", "l"]
        assert list(it("anguille")) == ["a", "n", "ɡ", "w", "i", "l",
                                        "l", "e"]


# -- French liaison (reference tests/test_fr.py, gruut/lang.py:553-676) -----

def _fr_word(text, word, post_process=True):
    sent = next(iter(gruut_ray.sentences(text, lang="fr_FR",
                                         post_process=post_process)))
    return next(w for w in sent.words if w.text == word).phonemes


@_needs("fr", "crf_model")
def test_fr_liason_after_determiner():
    assert _fr_word("Les arbres", "Les", post_process=False) == ["l", "e"]
    assert _fr_word("Les arbres", "Les") == ["l", "e", "z"]


@_needs("fr", "crf_model")
def test_fr_liason_adjective_noun():
    text = "J’ai des petites oreilles."
    assert _fr_word(text, "petites", post_process=False) == \
        ["p", "ə", "t", "i", "t"]
    assert _fr_word(text, "petites") == ["p", "ə", "t", "i", "t", "z"]


@_needs("fr", "crf_model")
def test_fr_liason_pronoun_verb():
    assert _fr_word("On est là!", "On", post_process=False) == ["ɔ̃"]
    assert _fr_word("On est là!", "On") == ["ɔ̃", "n"]


@_needs("fr", "crf_model")
def test_fr_liason_tres():
    text = "C’est très amusant!"
    assert _fr_word(text, "très", post_process=False) == ["t", "ʁ", "ɛ"]
    assert _fr_word(text, "très") == ["t", "ʁ", "ɛ", "z"]


# -- Catalan / Persian post hooks (reference lang.py:2424-2470, 507-524) ----

def test_ca_l_pal_l_fix():
    from gruut_ray.nlp.normalize import SentenceOut, WordOut
    from gruut_ray.profiles import get_compiled

    w = WordOut(idx=0, text="illa", text_with_ws="illa ",
                phonemes=["i", "l", "ʎ", "l", "a"])
    sent = SentenceOut(idx=0, par_idx=0, text="illa", text_with_ws="illa ",
                       text_spoken="illa", lang="ca", words=[w])
    get_compiled("ca").hooks.post_process_sentence(sent)
    assert w.phonemes == ["i", "l", "l", "a"]


def test_fa_ezafe_appended():
    from gruut_ray.nlp.normalize import SentenceOut, WordOut
    from gruut_ray.profiles import get_compiled

    w = WordOut(idx=0, text="کتاب", text_with_ws="کتاب ",
                phonemes=["k", "e", "t", "ɒː", "b"], pos="Ne")
    other = WordOut(idx=1, text="من", text_with_ws="من ",
                    phonemes=["m", "æ", "n"], pos="")
    sent = SentenceOut(idx=0, par_idx=0, text="", text_with_ws="",
                       text_spoken="", lang="fa", words=[w, other])
    get_compiled("fa").hooks.post_process_sentence(sent)
    assert w.phonemes[-1] == "e̞"
    assert other.phonemes == ["m", "æ", "n"]


@_needs("pt", "crf_model")
def test_hovercraft_pt():
    # full golden parity via the pt CRF G2P alone (no pt lexicon.db ships
    # in this checkout — every word is a CRF guess and matches exactly)
    assert get_phonemes("O meu hovercraft está cheio de enguias.",
                        "pt") == [
        ("O", ["u"]),
        ("meu", ["m", "ew"]),
        ("hovercraft", ["o", "v", "e", "ɹ", "k", "ɾ", "ɐ", "f", "t", "ʃ"]),
        ("está", ["e", "s", "t", "ɐ"]),
        ("cheio", ["ʃ", "ej", "u"]),
        ("de", ["d", "ʒ", "i"]),
        ("enguias", ["ẽ", "ɡ", "j", "ɐ", "s"]),
        (".", ["‖"]),
    ]


@_needs("sw", "crf_model")
def test_hovercraft_sw():
    # full golden parity via the sw CRF G2P alone
    assert get_phonemes("Gari langu linaloangama limejaa na mikunga.",
                        "sw") == [
        ("Gari", ["ɠ", "ɑ", "ɾ", "i"]),
        ("langu", ["l", "ɑ", "ᵑg", "u"]),
        ("linaloangama",
         ["l", "i", "n", "ɑ", "l", "ɔ", "ɑ", "ᵑg", "ɑ", "m", "ɑ"]),
        ("limejaa", ["l", "i", "m", "ɛ", "ʄ", "ɑ", "ɑ"]),
        ("na", ["n", "ɑ"]),
        ("mikunga", ["m", "i", "k", "u", "ᵑg", "ɑ"]),
        (".", ["‖"]),
    ]


@_needs("ca")
def test_hovercraft_ca():
    # FULL golden parity (reference tests/test_sqlite_phonemizer.py
    # test_ca): requires the Catalan stress-marking pre-process
    # (profiles/ca_stress.py — reference Transcripcio, lang.py:1702-2140),
    # the ca replacements (apostrophe/hyphen/l·l), the pack lexicon and
    # the sandhi post-hooks all composing in reference order.
    assert get_phonemes("El meu aerolliscador està ple d'anguiles.",
                        "ca-ce") == [
        ("el", ["ə", "l"]),
        ("meu", ["m", "'e", "uw"]),
        ("aerolliscadór",
         ["ə", "ə", "ɾ", "u", "ʎ", "i", "s", "k", "ə", "ð", "'o"]),
        ("està", ["s", "t", "'a"]),
        ("plè", ["p", "l", "'ɛ"]),
        ("danguíles", ["d", "ə", "ŋ", "g", "'i", "l", "ə", "s"]),
        (".", ["‖"]),
    ]


def test_ca_stress_word_cases():
    """Unit cases for the stress marker (reference Transcripcio rules):
    aguda vs the twelve-termination paroxytone rule, -ment adverbs,
    exception table, function words, graphic-accent passthrough."""
    from gruut_ray.profiles.ca_stress import stress_word

    assert stress_word("aerolliscador") == "aerolliscadór"  # aguda -r
    assert stress_word("ple") == "plè"                # monosyllable tonic
    assert stress_word("d'anguiles") == "d'anguíles"  # gui nucleus, -es
    assert stress_word("el") == "el"                  # einesgram untouched
    assert stress_word("radio") == "ràdio"            # exception table
    assert stress_word("està") == "està"              # already accented
    assert stress_word("xyz") == "xyz"                # no nucleus


@_needs("ar", "crf_model")
def test_hovercraft_ar():
    # reference test_ar golden (tests/test_sqlite_phonemizer.py:14-25).
    # The reference first rewrites the raw input "حَوّامتي مُمْتِلئة"
    # through the mishkal diacritizer (lang.py:203-225 — an optional
    # third-party model, not installable offline); its golden WORD FORMS
    # are that diacritized output.  Feeding the diacritized forms
    # directly, the ar pack CRF matches the golden phonemes EXACTLY —
    # the only blocked piece is the external diacritization pre-process.
    assert get_phonemes("حَوَّامَتُي مُمْتِلِئَة", "ar") == [
        ("حَوَّامَتُي", ["ħ", "a", "u", "aː", "m", "t", "iː"]),
        ("مُمْتِلِئَة", ["m", "u", "m", "t", "i", "l", "i", "ʔ", "i"]),
    ]


@_needs("ru", "crf_model")
def test_hovercraft_ru_partial():
    # CRF guesses match the goldens except vowel length on three words
    # whose reference pronunciations come from the (unshipped) ru lexicon
    out = dict(get_phonemes("Моё судно на воздушной подушке полно угрей.",
                            "ru_RU"))
    assert out["Моё"] == ["m", "o", "j", "oː"]
    assert out["судно"] == ["s", "uː", "d", "n", "o"]
    assert out["воздушной"] == ["v", "o", "z", "d", "uː", "ʂ", "n", "o", "j"]
    assert out["подушке"] == ["p", "o", "d", "uː", "ʂ", "kʲ", "e"]
    assert all(out.values())


@_needs("fa", "crf_model")
def test_hovercraft_fa_partial():
    # fa golden needs the hazm POS tagger (ezafe) + lexicon; the CRF body
    # of the first word matches the golden minus the trailing ezafe vowel
    out = dict(get_phonemes("هاورکرافت من پر مارماهى است", "fa"))
    assert out["هاورکرافت"] == ["h", "ɒː", "v", "æ", "ɾ", "k", "æ", "ɾ",
                                "ɒː", "f", "t"]
    assert out["من"] == ["m", "æ", "n"]
    assert all(out.values())


def test_ca_sandhi_pairs():
    """Catalan diphthong/fusion/elision between contiguous words
    (reference lang.py:2259-2421 vowel classes and cases)."""
    from gruut_ray.nlp.normalize import SentenceOut, WordOut
    from gruut_ray.profiles import get_compiled

    def run(*words):
        ws = [WordOut(idx=i, text=t, text_with_ws=t + " ",
                      phonemes=list(p)) for i, (t, p) in enumerate(words)]
        sent = SentenceOut(idx=0, par_idx=0, text="", text_with_ws="",
                           text_spoken="", lang="ca", words=ws)
        get_compiled("ca").hooks.post_process_sentence(sent)
        return [w.phonemes for w in ws]

    # diphthong case 1: stressed non-high vowel + i -> glide j
    got = run(("casa", ["k", "'a"]), ("insecte", ["i", "n"]))
    assert got == [["k", "'a"], ["j", "n"]]
    # fusion case 2: i + i -> single i
    got = run(("si", ["s", "i"]), ("vius", ["i", "w", "s"]))
    assert got == [["s"], ["i", "w", "s"]]
    # elision case 1: stressed + neutral -> neutral dropped
    assert run(("està", ["t", "'a"]), ("en", ["ə", "n"])) == \
        [["t", "'a"], ["n"]]
    # preposition "a" protected from fusion/elision
    got = run(("porta", ["t", "ə"]), ("a", ["ə"]))
    assert got == [["t", "ə"], ["ə"]]
    # punctuation between words blocks the pair
    from gruut_ray.nlp.normalize import SentenceOut as S, WordOut as W
    ws = [W(idx=0, text="si", text_with_ws="si ", phonemes=["s", "i"]),
          W(idx=1, text=",", text_with_ws=", ", is_punctuation=True),
          W(idx=2, text="vius", text_with_ws="vius ",
            phonemes=["i", "w", "s"])]
    sent = S(idx=0, par_idx=0, text="", text_with_ws="", text_spoken="",
             lang="ca", words=ws)
    get_compiled("ca").hooks.post_process_sentence(sent)
    assert ws[0].phonemes == ["s", "i"]  # no fusion across the comma


def test_ca_sandhi_emptied_word_no_crash():
    """Elision can pop the ONLY phoneme of a one-phoneme word; the next
    pair's diphthong check must guard the empty list (reference
    diphthong_if_needed returns on empty, lang.py:2348). These inputs
    raised IndexError through the public API before the fix."""
    from gruut_ray.nlp.normalize import SentenceOut, WordOut
    from gruut_ray.profiles import get_compiled

    ws = [WordOut(idx=0, text="està", text_with_ws="està ",
                  phonemes=["t", "'a"]),
          WordOut(idx=1, text="e", text_with_ws="e ", phonemes=["ə"]),
          WordOut(idx=2, text="b", text_with_ws="b ", phonemes=["'e"])]
    sent = SentenceOut(idx=0, par_idx=0, text="", text_with_ws="",
                       text_spoken="", lang="ca", words=ws)
    get_compiled("ca").hooks.post_process_sentence(sent)  # must not raise
    assert ws[1].phonemes == []  # elided to empty, pair 2 skipped

    # end-to-end through the public API (the ADVICE repro inputs)
    for text in ("mà e i", "està e b"):
        for s in gruut_ray.sentences(text, lang="ca"):
            for w in s.words:
                assert w.phonemes is not None or True  # just must not raise


def test_multilang_ssml_phonemizes_per_word_language():
    """Multi-language SSML (xml:lang) must resolve lexicon/G2P per WORD:
    the es sentence's words get Spanish phonemes, not English guesses
    (code-review r02 #2; reference resolves settings per word.lang)."""
    text = """<speak xml:lang="en-US">
  <s>full of eels.</s>
  <s xml:lang="es">lleno de anguilas.</s>
</speak>"""
    sents = list(gruut_ray.sentences(text, ssml=True))
    en = {w.text: w.phonemes for w in sents[0].words if w.is_spoken}
    es = {w.text: w.phonemes for w in sents[1].words if w.is_spoken}
    # the en sentence phonemizes exactly as a plain en-only run would
    plain_en = {w.text: w.phonemes
                for s in gruut_ray.sentences("full of eels.", lang="en_US")
                for w in s.words if w.is_spoken}
    assert en == plain_en
    # the es sentence resolves from the SPANISH seed lexicon
    assert es["lleno"] == ["ʎ", "e", "n", "o"]
    assert es["de"] == ["d", "e"]               # es 'de', not English
    assert es["anguilas"] == ["a", "n", "g", "i", "l", "a", "s"]


def test_hovercraft_en():
    # reference tests/test_sqlite_phonemizer.py test_en_us — full golden
    assert get_phonemes("My hovercraft is full of eels.", "en_US") == [
        ("My", ["m", "ˈaɪ"]),
        ("hovercraft",
         ["h", "ˈʌ", "v", "ɚ", "k", "ɹ", "ˌæ", "f", "t"]),
        ("is", ["ˈɪ", "z"]),
        ("full", ["f", "ˈʊ", "l"]),
        ("of", ["ə", "v"]),
        ("eels", ["ˈi", "l", "z"]),
        (".", ["‖"]),
    ]
