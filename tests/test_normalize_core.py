"""Core tokenizer/splitter goldens with custom profiles, vendored from the
reference (tests/test_text_processor.py — settings-parameterized cases)."""

import pytest

from gruut_ray import process_document
from gruut_ray.profiles import LanguageProfile, register_profile


def _register(lang, **kw):
    defaults = dict(major_breaks=(), minor_breaks=(), word_breaks=(),
                    begin_punctuations=(), end_punctuations=(),
                    replacements=(), abbreviations=())
    defaults.update(kw)
    register_profile(LanguageProfile(lang=lang, **defaults))


def rows(text, lang, ssml=False):
    sents = process_document(text, lang=lang, ssml=ssml)
    return [
        (s.par_idx, w.sent_idx, w.text, w.text_with_ws,
         w.is_punctuation, w.is_minor_break, w.is_major_break)
        for s in sents for w in s.words
    ]


def test_whitespace_preserved():
    # reference tests/test_text_processor.py:15-30
    _register("x-ws")
    assert rows("This is  a   test    ", "x-ws") == [
        (0, 0, "This", "This ", False, False, False),
        (0, 0, "is", "is  ", False, False, False),
        (0, 0, "a", "a   ", False, False, False),
        (0, 0, "test", "test    ", False, False, False),
    ]


def test_punctuation_split():
    # reference tests/test_text_processor.py:49-87
    _register("x-punct", begin_punctuations=('"', "«"),
              end_punctuations=('"', "»"), minor_breaks=(",",),
              major_breaks=(".",))
    assert rows('This «is»,  a "test".', "x-punct") == [
        (0, 0, "This", "This ", False, False, False),
        (0, 0, "«", "«", True, False, False),
        (0, 0, "is", "is", False, False, False),
        (0, 0, "»", "»", True, False, False),
        (0, 0, ",", ",  ", False, True, False),
        (0, 0, "a", "a ", False, False, False),
        (0, 0, '"', '"', True, False, False),
        (0, 0, "test", "test", False, False, False),
        (0, 0, '"', '"', True, False, False),
        (0, 0, ".", ".", False, False, True),
    ]


def test_punctuation_with_inner_break():
    # reference tests/test_text_processor.py:89-122 — closing quote stays in
    # the first sentence (sentence breaks move whole top-level groups)
    _register("x-inner", begin_punctuations=('"',), end_punctuations=('"',),
              major_breaks=(".",))
    assert rows('Test "one." Test two.', "x-inner") == [
        (0, 0, "Test", "Test ", False, False, False),
        (0, 0, '"', '"', True, False, False),
        (0, 0, "one", "one", False, False, False),
        (0, 0, ".", ".", False, False, True),
        (0, 0, '"', '" ', True, False, False),
        (0, 1, "Test", "Test ", False, False, False),
        (0, 1, "two", "two", False, False, False),
        (0, 1, ".", ".", False, False, True),
    ]


def test_replacements():
    # reference tests/test_text_processor.py:124-153
    _register("x-repl", minor_breaks=(",",), major_breaks=(".",),
              replacements=((r"\B'", '"'), (r"'\B", '"'),
                            (r'[\<\>\(\)\[\]"]+', "")))
    assert rows("\"This,\" [is] <a> (test) 'sentence.'", "x-repl") == [
        (0, 0, "This", "This", False, False, False),
        (0, 0, ",", ", ", False, True, False),
        (0, 0, "is", "is ", False, False, False),
        (0, 0, "a", "a ", False, False, False),
        (0, 0, "test", "test ", False, False, False),
        (0, 0, "sentence", "sentence", False, False, False),
        (0, 0, ".", ".", False, False, True),
    ]


def test_abbreviations():
    # reference tests/test_text_processor.py:155-194
    _register("x-abbr", minor_breaks=(",",), major_breaks=(".", "?"),
              abbreviations=((r"^([dD])r\.", r"\1octor"),
                             (r"^([mM])r\.", r"\1ister"),
                             (r"^([sS])t\.", r"\1treet")))
    assert rows("Mr.? I'm just a dr., on this St. at least.", "x-abbr") == [
        (0, 0, "Mister", "Mister", False, False, False),
        (0, 0, "?", "? ", False, False, True),
        (0, 1, "I'm", "I'm ", False, False, False),
        (0, 1, "just", "just ", False, False, False),
        (0, 1, "a", "a ", False, False, False),
        (0, 1, "doctor", "doctor", False, False, False),
        (0, 1, ",", ", ", False, True, False),
        (0, 1, "on", "on ", False, False, False),
        (0, 1, "this", "this ", False, False, False),
        (0, 1, "Street", "Street ", False, False, False),
        (0, 1, "at", "at ", False, False, False),
        (0, 1, "least", "least", False, False, False),
        (0, 1, ".", ".", False, False, True),
    ]


def test_multiple_sentences_and_assembly():
    # reference tests/test_text_processor.py:196-262
    _register("x-sent", major_breaks=(".", "!"))
    sents = process_document("First  sentence. Second sentence! ", lang="x-sent")
    assert [s.text for s in sents] == ["First sentence.", "Second sentence!"]
    assert [s.text_with_ws for s in sents] == ["First  sentence. ",
                                               "Second sentence! "]
    assert [s.text_spoken for s in sents] == ["First sentence",
                                              "Second sentence"]


def test_multiple_paragraphs_ssml():
    # reference tests/test_text_processor.py:264-298
    _register("x-par")
    got = rows("<speak><p>First paragraph</p><p>Second paragraph</p></speak>",
               "x-par", ssml=True)
    assert got == [
        (0, 0, "First", "First ", False, False, False),
        (0, 0, "paragraph", "paragraph", False, False, False),
        (1, 0, "Second", "Second ", False, False, False),
        (1, 0, "paragraph", "paragraph", False, False, False),
    ]


def test_explicit_sentence_not_split():
    # reference tests/test_text_processor.py:300-322
    _register("x-expl", major_breaks=(".", "!"))
    got = rows("<s>First sentence. Second sentence!</s>", "x-expl", ssml=True)
    assert [r[1] for r in got] == [0] * len(got)
    assert [r[2] for r in got] == ["First", "sentence", ".",
                                  "Second", "sentence", "!"]


def test_minor_breaks():
    # reference tests/test_text_processor.py:324-343
    _register("x-min", minor_breaks=(",",))
    assert rows("this, is a test", "x-min") == [
        (0, 0, "this", "this", False, False, False),
        (0, 0, ",", ", ", False, True, False),
        (0, 0, "is", "is ", False, False, False),
        (0, 0, "a", "a ", False, False, False),
        (0, 0, "test", "test", False, False, False),
    ]


def test_word_breaks():
    # reference tests/test_text_processor.py:345-360
    _register("x-word", word_breaks=("-",))
    assert rows("ninety-nine", "x-word") == [
        (0, 0, "ninety", "ninety ", False, False, False),
        (0, 0, "nine", "nine", False, False, False),
    ]


def test_initialism_custom():
    # reference tests/test_text_processor.py:409-432 uses custom callables;
    # here the built-in English hooks cover the same shape
    sents = process_document("TTS.", lang="en-us")
    got = [(w.text, w.text_with_ws) for s in sents for w in s.words]
    assert got == [("T", "T "), ("T", "T "), ("S", "S"), (".", ".")]


def test_break_phonemes():
    sents = process_document("one, two.", lang="en-us")
    w = {x.text: x for s in sents for x in s.words}
    assert w[","].phonemes == ["|"]
    assert w["."].phonemes == ["‖"]


@pytest.mark.parametrize("lang,text,expected", [
    ("de", "21", ["einundzwanzig"]),
    ("de", "1999", ["neunzehnhundertneunundneunzig"]),
    ("fr", "71", ["soixante", "et", "onze"]),
    ("fr", "80", ["quatre", "vingts"]),
    ("es", "21", ["veintiuno"]),
    ("es", "100", ["cien"]),
    ("ru", "2", ["два"]),
    # zh splits chars first (reference lang.py:843 split_words=list), so
    # "21" is two digit tokens
    ("zh", "21", ["二", "一"]),
])
def test_multilingual_numbers(lang, text, expected):
    sents = process_document(text, lang=lang)
    got = [w.text for s in sents for w in s.words]
    assert got == expected


def test_german_date():
    # de default format omy: "1.4.1999" -> erste April ...
    sents = process_document("1.4.1999", lang="de")
    got = [w.text for s in sents for w in s.words]
    assert got[0] == "erste"
    assert got[1] == "April"


def test_chinese_char_tokenization():
    sents = process_document("你好。世界！", lang="zh")
    assert len(sents) == 2
    assert [w.text for w in sents[0].words] == ["你", "好", "。"]


def test_batch_invariance_of_pure_function():
    # Same text processed twice gives identical output (determinism)
    text = "Dr. Smith paid $1,234.56 on 1/4/1999 at 4:01pm! Really?"
    a = process_document(text)
    b = process_document(text)
    assert [(s.text, [w.text for w in s.words]) for s in a] == \
           [(s.text, [w.text for w in s.words]) for s in b]


def test_pre_and_post_process_hooks():
    """User-extension hooks (reference pre_process_text /
    post_process_sentence, gruut/const.py:603-740)."""
    from gruut_ray.nlp.normalize import process_document
    from gruut_ray.profiles import register_profile
    from gruut_ray.profiles.base import (
        HOOK_REGISTRY,
        Hooks,
        LanguageProfile,
        register_hooks,
    )

    def pre(text: str) -> str:
        return text.replace("§", "section")

    def post(sent) -> None:
        for w in sent.words:
            if w.is_spoken:
                w.phonemes = ["X"]

    register_hooks("hooktest", Hooks(pre_process_text=pre,
                                     post_process_sentence=post))
    register_profile(LanguageProfile(lang="xx-hook", hooks="hooktest",
                                     major_breaks=(".",)))
    try:
        sents = process_document("See § one.", "xx-hook")
        assert sents[0].text_spoken == "See section one"
        assert all(w.phonemes == ["X"] for s in sents for w in s.words
                   if w.is_spoken)
    finally:
        HOOK_REGISTRY.pop("hooktest", None)


def test_two_digit_year_dates_es_ru():
    """dateparser-convention 2-digit years (00-68 → 20xx, 69-99 → 19xx)
    — the es/ru long-tail date forms (VERDICT r02 missing #4)."""
    from gruut_ray.nlp.normalize import process_document

    def words(text, lang):
        return [w.text for s in process_document(text, lang=lang)
                for w in s.words if w.is_spoken]

    assert words("1.4.99", "es") == [
        "uno", "abril", "mil", "novecientos", "noventa", "y", "nueve"]
    assert words("1.4.05", "es")[:2] == ["uno", "abril"]  # 2005
    assert "dos" in " ".join(words("1.4.05", "es"))       # 20xx century
    assert words("01.04.99", "ru")[0:2] == ["один", "апреля"]
    # en keeps its stricter maybe-date gate: slashes parse, dots don't
    assert words("1/4/99", "en") == [
        "January", "fourth", "nineteen", "ninety", "nine"]
    assert words("10.5.12", "en") == ["10.5.12"]


def test_partial_say_as_dates():
    """Explicit <say-as interpret-as="date"> month/year and bare-year
    forms resolve deterministically (reference retries dateparser
    non-strict there, text_processor.py:1989-1994, which backfills from
    wall-clock *today*; this engine backfills 1 and drops the
    unspecified fields from the spoken format instead — VERDICT r02
    missing #4 es/ru long tail)."""
    import gruut_ray

    def spoken(text, lang):
        return " ".join(s.text_spoken for s in gruut_ray.process_document(
            text, lang=lang, ssml=True))

    say = '<speak><say-as interpret-as="date">{}</say-as></speak>'
    assert spoken(say.format("04/1999"), "es") == \
        "abril mil novecientos noventa y nueve"
    assert spoken(say.format("1999"), "es") == \
        "mil novecientos noventa y nueve"
    assert spoken(say.format("1999"), "ru") == \
        "одна тысяча девятьсот девяносто девять"
    assert spoken(say.format("04.1999"), "fr") == \
        "avril mille neuf cent quatre vingt dix neuf"
    assert spoken(say.format("1999/04"), "en") == "April nineteen ninety nine"
    # explicit format attribute still wins over the auto format
    both = ('<speak><say-as interpret-as="date" format="y">'
            "04/1999</say-as></speak>")
    assert spoken(both, "en") == "nineteen ninety nine"
    # out-of-range month is NOT a date even when explicitly marked
    assert spoken(say.format("13/1999"), "en") == "13/1999"
    # plain text (no say-as) is unaffected by the lenient path
    plain = " ".join(s.text_spoken for s in gruut_ray.process_document(
        "04/1999", lang="es"))
    assert plain == "04/1999"
