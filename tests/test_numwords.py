"""Number verbalization parity with num2words output shapes (the library the
reference calls at gruut/text_processor.py:2108-2421; not installable here —
expectations cross-checked against the reference's vendored test outputs)."""

from decimal import Decimal

import pytest

from gruut_ray.nlp.numwords import (
    NumberVerbalizeError,
    de_cardinal_int,
    de_year,
    en_cardinal_int,
    en_currency,
    en_ordinal,
    en_year,
    es_cardinal_int,
    fr_cardinal_int,
    num_to_words,
    ru_cardinal_int,
    zh_cardinal_int,
)


@pytest.mark.parametrize("n,text", [
    (0, "zero"),
    (7, "seven"),
    (13, "thirteen"),
    (21, "twenty-one"),
    (100, "one hundred"),
    (101, "one hundred and one"),
    (121, "one hundred and twenty-one"),
    (1000, "one thousand"),
    (1005, "one thousand and five"),
    (1100, "one thousand, one hundred"),
    (5111, "five thousand, one hundred and eleven"),
    (123456, "one hundred and twenty-three thousand, four hundred and fifty-six"),
    (1000000, "one million"),
    (2000001, "two million and one"),
    (-42, "minus forty-two"),
])
def test_en_cardinal(n, text):
    assert en_cardinal_int(n) == text


@pytest.mark.parametrize("n,text", [
    (1, "first"), (2, "second"), (3, "third"), (4, "fourth"),
    (5, "fifth"), (8, "eighth"), (9, "ninth"), (12, "twelfth"),
    (20, "twentieth"), (21, "twenty-first"), (23, "twenty-third"),
    (32, "thirty-second"), (44, "forty-fourth"),
    (121, "one hundred and twenty-first"),
    (5111, "five thousand, one hundred and eleventh"),
])
def test_en_ordinal(n, text):
    assert en_ordinal(n) == text


@pytest.mark.parametrize("n,text", [
    (1999, "nineteen ninety-nine"),
    (2020, "twenty twenty"),
    (2000, "two thousand"),
    (2005, "two thousand and five"),
    (1900, "nineteen hundred"),
    (1905, "nineteen oh-five"),
    (1066, "ten sixty-six"),
    (800, "eight hundred"),
])
def test_en_year(n, text):
    assert en_year(n) == text


def test_en_currency():
    assert en_currency(Decimal("100"), "USD", "|") == \
        "one hundred dollars| zero cents"
    assert en_currency(Decimal("1"), "USD", "|") == "one dollar| zero cents"
    assert en_currency(Decimal("1.50"), "USD", "|") == \
        "one dollar| fifty cents"
    assert en_currency(Decimal("2.23"), "EUR", "|") == \
        "two euro| twenty-three cents"


def test_en_point():
    assert num_to_words(Decimal("1.5"), "en") == "one point five"
    assert num_to_words(Decimal("3.14"), "en") == "three point one four"


@pytest.mark.parametrize("n,text", [
    (1, "eins"), (11, "elf"), (21, "einundzwanzig"),
    (100, "einhundert"), (101, "einhunderteins"),
    (1234, "eintausendzweihundertvierunddreißig"),
])
def test_de_cardinal(n, text):
    assert de_cardinal_int(n) == text


def test_de_year():
    assert de_year(1999) == "neunzehnhundertneunundneunzig"
    assert de_year(2005) == "zweitausendfünf"


@pytest.mark.parametrize("n,text", [
    (21, "vingt et un"), (71, "soixante et onze"), (80, "quatre-vingts"),
    (81, "quatre-vingt-un"), (91, "quatre-vingt-onze"), (100, "cent"),
    (200, "deux cents"), (201, "deux cent un"), (1000, "mille"),
    (1999, "mille neuf cent quatre-vingt-dix-neuf"),
])
def test_fr_cardinal(n, text):
    assert fr_cardinal_int(n) == text


@pytest.mark.parametrize("n,text", [
    (16, "dieciséis"), (21, "veintiuno"), (31, "treinta y uno"),
    (100, "cien"), (101, "ciento uno"), (500, "quinientos"),
    (1000, "mil"), (2022, "dos mil veintidós"),
])
def test_es_cardinal(n, text):
    assert es_cardinal_int(n) == text


@pytest.mark.parametrize("n,text", [
    (1, "один"), (21, "двадцать один"), (100, "сто"),
    (1000, "одна тысяча"), (2000, "две тысячи"), (5000, "пять тысяч"),
    (1999, "одна тысяча девятьсот девяносто девять"),
])
def test_ru_cardinal(n, text):
    assert ru_cardinal_int(n) == text


@pytest.mark.parametrize("n,text", [
    (0, "零"), (10, "十"), (11, "十一"), (21, "二十一"),
    (100, "一百"), (105, "一百零五"), (110, "一百一十"),
    (1000, "一千"), (10000, "一万"), (100000001, "一亿零一"),
])
def test_zh_cardinal(n, text):
    assert zh_cardinal_int(n) == text


def test_unsupported_raises():
    # every profile language has cardinals now; unknown languages raise
    with pytest.raises(NumberVerbalizeError):
        num_to_words(Decimal(5), "xx", to="cardinal")


def test_cs_ar_cardinals():
    cases = {
        ("cs", 21): "dvacet jedna",
        ("cs", 345): "tři sta čtyřicet pět",
        ("cs", 2500): "dva tisíce pět set",
        ("ar", 21): "واحد وعشرون",
        ("ar", 345): "ثلاثمئة وخمسة وأربعون",
        ("ar", 2024): "ألفان وأربعة وعشرون",
    }
    for (lang, n), expect in cases.items():
        assert num_to_words(Decimal(n), lang) == expect, (lang, n)


def test_generic_currency_languages():
    from decimal import Decimal

    from gruut_ray.nlp.numwords import num_to_words

    assert num_to_words(Decimal("5.50"), "de", to="currency",
                        currency="EUR", separator="|") == \
        "fünf Euro| fünfzig Cent"
    assert num_to_words(Decimal("1"), "de", to="currency",
                        currency="EUR", separator="|").startswith("ein Euro")
    assert num_to_words(Decimal("2.05"), "fr", to="currency",
                        currency="EUR", separator="|") == \
        "deux euros| cinq centimes"
    assert num_to_words(Decimal("21"), "ru", to="currency",
                        currency="RUB", separator="|").split("|")[0] == \
        "двадцать один рубль"
    assert num_to_words(Decimal("5"), "ru", to="currency",
                        currency="RUB", separator="|").split("|")[0] == \
        "пять рублей"
    assert num_to_words(Decimal("3"), "zh", to="currency",
                        currency="CNY", separator="|").split("|")[0] == "三元"


def test_currency_verbalized_in_document_context():
    from gruut_ray.nlp.normalize import process_document

    cases = {
        ("de", "Das kostet €5,50."): "fünf Euro fünfzig Cent",
        ("fr", "Ça coûte €5,50."): "cinq euros cinquante centimes",
        ("es", "Cuesta €5,50."): "cinco euros cincuenta céntimos",
        ("ru", "Это ₽21."): "двадцать один рубль",
    }
    for (lang, text), expect in cases.items():
        spoken = " ".join(s.text_spoken
                          for s in process_document(text, lang))
        assert expect in spoken, (lang, spoken)


def test_it_nl_pt_sv_cardinals():
    from decimal import Decimal

    from gruut_ray.nlp.numwords import num_to_words

    cases = {
        ("it", 21): "ventuno",
        ("it", 88): "ottantotto",
        ("it", 2500): "duemila cinquecento",
        ("nl", 22): "tweeëntwintig",
        ("nl", 147): "honderdzevenenveertig",
        ("pt", 345): "trezentos e quarenta e cinco",
        ("pt", 100): "cem",
        ("sv", 21): "tjugoett",
        ("sv", 135): "etthundratrettiofem",
    }
    for (lang, n), expect in cases.items():
        assert num_to_words(Decimal(n), lang) == expect, (lang, n)
    # decimal + sign words
    assert num_to_words(Decimal("-1.5"), "it") == "meno uno virgola cinque"
    assert num_to_words(Decimal("2.5"), "nl") == "twee komma vijf"


def test_it_nl_pt_sv_in_document_context():
    from gruut_ray.nlp.normalize import process_document

    cases = {
        ("it", "Ho 21 gatti."): "ventuno",
        ("nl", "Ik heb 22 katten."): "tweeëntwintig",
        ("pt", "Tenho 21 gatos."): "vinte e um",
        ("sv", "Jag har 21 katter."): "tjugoett",
    }
    for (lang, text), expect in cases.items():
        spoken = " ".join(s.text_spoken for s in process_document(text, lang))
        assert expect in spoken, (lang, spoken)


def test_ca_lb_sw_fa_cardinals():
    from decimal import Decimal

    from gruut_ray.nlp.numwords import num_to_words

    cases = {
        ("ca", 21): "vint-i-u",
        ("ca", 356): "tres-cents cinquanta-sis",
        ("lb", 21): "eenanzwanzeg",
        ("lb", 147): "honnertsiwenanvéierzeg",
        ("sw", 21): "ishirini na moja",
        ("sw", 345): "mia tatu na arobaini na tano",
        ("fa", 21): "بیست و یک",
        ("fa", 345): "سیصد و چهل و پنج",
    }
    for (lang, n), expect in cases.items():
        assert num_to_words(Decimal(n), lang) == expect, (lang, n)


def test_ca_lb_sw_fa_in_document_context():
    from gruut_ray.nlp.normalize import process_document

    cases = {
        # "-" word-breaks split compound numerals into words, like the
        # reference word_breaks behavior
        ("ca", "Tinc 21 gats."): "vint i u",
        ("lb", "Ech hu 21 Kazen."): "eenanzwanzeg",
        ("sw", "Nina paka 21 nzuri."): "ishirini na moja",
        ("fa", "من 21 گربه دارم."): "بیست و یک",
    }
    for (lang, text), expect in cases.items():
        spoken = " ".join(s.text_spoken for s in process_document(text, lang))
        assert expect in spoken, (lang, spoken)


def test_dates_verbalize_in_all_month_name_languages():
    from gruut_ray.nlp.normalize import process_document

    cases = {
        ("it", "Era il 4/1/1999."): "gennaio",
        ("nl", "Het was 4/1/1999."): "januari",
        ("pt", "Foi em 4/1/1999."): "janeiro",
        ("ca", "Era el 4/1/1999."): "gener",
        ("cs", "Bylo to 4/1/1999."): "ledna",
        ("sw", "Ilikuwa 4/1/1999."): "Januari",
        ("ar", "كان في 4/1/1999."): "يناير",
        ("lb", "Et war 4/1/1999."): "Januar",
    }
    for (lang, text), expect in cases.items():
        spoken = " ".join(s.text_spoken for s in process_document(text, lang))
        assert expect in spoken, (lang, spoken)
        assert "1999" not in spoken, (lang, spoken)


def test_currency_all_new_languages():
    from gruut_ray.nlp.normalize import process_document

    cases = {
        ("it", "Costa €5,50."): "cinque euro cinquanta centesimi",
        ("nl", "Het kost €5,50."): "vijf euro vijftig cent",
        ("pt", "Custa €5,50."): "cinco euros cinquenta cêntimos",
        ("ca", "Costa €5,50."): "cinc euros cinquanta cèntims",
        ("cs", "Stojí €5."): "pět eur",
        ("cs", "Stojí €3."): "tři eura",
    }
    for (lang, text), expect in cases.items():
        spoken = " ".join(s.text_spoken for s in process_document(text, lang))
        assert expect in spoken, (lang, spoken)
