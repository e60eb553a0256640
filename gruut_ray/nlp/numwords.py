"""Number verbalization without the num2words dependency.

The reference verbalizes via ``num2words(n, to=cardinal|ordinal|year|digits|
currency)`` (reference gruut/text_processor.py:2108-2421).  num2words is not
installable in this sandbox, so the subset the engine needs is re-implemented
here with output identical to num2words for the supported languages (verified
against the reference's vendored test expectations, e.g. tests/test_en.py).

English is complete (cardinal incl. "and"/comma joins, ordinal, year with
"oh", currency with pluralization); de/fr/es/ru/zh get cardinals (+ simple
ordinals/years where the formats need them).  Unsupported (lang, to) pairs
raise :class:`NumberVerbalizeError`, mirroring num2words raising
``NotImplementedError`` for unknown languages (the caller then leaves the
token unexpanded, reference text_processor.py:2147-2153).
"""

from __future__ import annotations

from decimal import Decimal


class NumberVerbalizeError(NotImplementedError):
    pass


# ---------------------------------------------------------------------------
# English — mirrors num2words lang_EN merge semantics exactly
# ---------------------------------------------------------------------------

_EN_ONES = [
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
]
_EN_TENS = {
    2: "twenty", 3: "thirty", 4: "forty", 5: "fifty",
    6: "sixty", 7: "seventy", 8: "eighty", 9: "ninety",
}
_EN_SCALES = [
    (10 ** 15, "quadrillion"),
    (10 ** 12, "trillion"),
    (10 ** 9, "billion"),
    (10 ** 6, "million"),
    (10 ** 3, "thousand"),
]
_EN_ORDINAL_MAP = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def _en_under_100(n: int) -> str:
    if n < 20:
        return _EN_ONES[n]
    tens, ones = divmod(n, 10)
    if ones == 0:
        return _EN_TENS[tens]
    return f"{_EN_TENS[tens]}-{_EN_ONES[ones]}"


def _en_under_1000(n: int) -> str:
    hundreds, rem = divmod(n, 100)
    if hundreds == 0:
        return _en_under_100(rem)
    text = f"{_EN_ONES[hundreds]} hundred"
    if rem:
        text += f" and {_en_under_100(rem)}"
    return text


def en_cardinal_int(n: int) -> str:
    if n < 0:
        return "minus " + en_cardinal_int(-n)
    if n < 1000:
        return _en_under_1000(n)
    parts = []  # (text, value) per scale group, high to low
    rem = n
    for scale, name in _EN_SCALES:
        group, rem = divmod(rem, scale)
        if group:
            parts.append((f"{en_cardinal_int(group)} {name}", group * scale))
    out = ""
    for text, _value in parts:
        out = text if not out else f"{out}, {text}"
    if rem:
        # num2words joins a trailing <100 group with " and ", >=100 with ", "
        joiner = " and " if rem < 100 else ", "
        out = _en_under_1000(rem) if not out else f"{out}{joiner}{_en_under_1000(rem)}"
    return out or "zero"


def _digits_after_point(num: Decimal) -> str:
    s = format(num.normalize(), "f")
    if "." not in s:
        return ""
    return s.split(".", 1)[1]


def _point_words(num: Decimal, int_word_fn, digit_words) -> str:
    """"1.5" -> "<one> point <five>" (num2words float handling)."""
    int_part = int(num)
    frac = _digits_after_point(abs(num))
    text = int_word_fn(int_part)
    if frac:
        text += " point " + " ".join(digit_words[int(d)] for d in frac)
    return text


def en_cardinal(num: Decimal) -> str:
    if num == num.to_integral_value():
        return en_cardinal_int(int(num))
    sign = "minus " if num < 0 else ""
    return sign + _point_words(abs(num), en_cardinal_int, _EN_ONES)


def en_ordinal(n: int) -> str:
    """Cardinal with the final word made ordinal (num2words to_ordinal)."""
    card = en_cardinal_int(n)
    head, sep, last = card.rpartition(" ")
    lhead, lsep, llast = last.rpartition("-")
    if llast in _EN_ORDINAL_MAP:
        llast = _EN_ORDINAL_MAP[llast]
    elif llast.endswith("y"):
        llast = llast[:-1] + "ieth"
    else:
        llast = llast + "th"
    return f"{head}{sep}{lhead}{lsep}{llast}"


def en_year(n: int) -> str:
    """num2words to_year: 1999 -> nineteen ninety-nine, 2020 -> twenty
    twenty, 2005 -> two thousand and five, 1905 -> nineteen oh-five."""
    if n < 0:
        return en_cardinal_int(n)
    high, low = divmod(n, 100)
    if high == 0 or (high % 10 == 0 and low < 10) or high >= 100:
        return en_cardinal_int(n)
    if low == 0:
        low_text = "hundred"
    elif low < 10:
        low_text = f"oh-{en_cardinal_int(low)}"
    else:
        low_text = _en_under_100(low)
    return f"{en_cardinal_int(high)} {low_text}"


_EN_CURRENCY_FORMS = {
    # code: ((unit singular, unit plural), (cent singular, cent plural))
    "USD": (("dollar", "dollars"), ("cent", "cents")),
    "EUR": (("euro", "euro"), ("cent", "cents")),
    "GBP": (("pound sterling", "pounds sterling"), ("penny", "pence")),
    "JPY": (("yen", "yen"), ("sen", "sen")),
    "RUB": (("rouble", "roubles"), ("kopek", "kopeks")),
}


def en_currency(num: Decimal, currency: str, separator: str) -> str:
    """num2words to_currency with custom separator: the caller splits on the
    separator to drop 'zero cents' (reference text_processor.py:2381-2398)."""
    forms = _EN_CURRENCY_FORMS.get(currency)
    if forms is None:
        raise NumberVerbalizeError(f"currency {currency}")
    (unit_s, unit_p), (cent_s, cent_p) = forms
    minus = "minus " if num < 0 else ""
    num = abs(num)
    units = int(num)
    cents = int((num * 100).to_integral_value()) % 100
    unit_word = unit_s if units == 1 else unit_p
    cent_word = cent_s if cents == 1 else cent_p
    return (
        f"{minus}{en_cardinal_int(units)} {unit_word}{separator} "
        f"{en_cardinal_int(cents)} {cent_word}"
    )


# ---------------------------------------------------------------------------
# German
# ---------------------------------------------------------------------------

_DE_ONES = [
    "null", "eins", "zwei", "drei", "vier", "fünf", "sechs", "sieben",
    "acht", "neun", "zehn", "elf", "zwölf", "dreizehn", "vierzehn",
    "fünfzehn", "sechzehn", "siebzehn", "achtzehn", "neunzehn",
]
_DE_ONES_PREFIX = ["", "ein", "zwei", "drei", "vier", "fünf", "sechs",
                   "sieben", "acht", "neun"]
_DE_TENS = {2: "zwanzig", 3: "dreißig", 4: "vierzig", 5: "fünfzig",
            6: "sechzig", 7: "siebzig", 8: "achtzig", 9: "neunzig"}


def _de_under_100(n: int, as_prefix: bool = False) -> str:
    if n < 20:
        if n == 1 and as_prefix:
            return "ein"
        return _DE_ONES[n]
    tens, ones = divmod(n, 10)
    if ones == 0:
        return _DE_TENS[tens]
    return f"{_DE_ONES_PREFIX[ones]}und{_DE_TENS[tens]}"


def _de_under_1000(n: int, as_prefix: bool = False) -> str:
    hundreds, rem = divmod(n, 100)
    if hundreds == 0:
        return _de_under_100(rem, as_prefix)
    text = f"{_DE_ONES_PREFIX[hundreds]}hundert"
    if rem:
        text += _de_under_100(rem, as_prefix=True) if rem != 1 else "eins"
    return text


def de_cardinal_int(n: int) -> str:
    if n < 0:
        return "minus " + de_cardinal_int(-n)
    if n < 1000:
        return _de_under_1000(n)
    out = ""
    for scale, singular, plural in (
        (10 ** 9, "eine Milliarde", "Milliarden"),
        (10 ** 6, "eine Million", "Millionen"),
    ):
        group, n = divmod(n, scale)
        if group:
            text = singular if group == 1 else f"{_de_under_1000(group)} {plural}"
            out = text if not out else f"{out} {text}"
    thousands, rem = divmod(n, 1000)
    if thousands:
        text = f"{_de_under_1000(thousands, as_prefix=True)}tausend"
        out = text if not out else f"{out} {text}"
    if rem:
        text = _de_under_1000(rem)
        out = text if not out else f"{out}{text}" if " " not in out else f"{out} {text}"
    return out or "null"


def de_year(n: int) -> str:
    high, low = divmod(n, 100)
    if 11 <= high <= 19:
        text = f"{_de_under_100(high)}hundert"
        if low:
            text += _de_under_100(low, as_prefix=True) if low != 1 else "eins"
        return text
    return de_cardinal_int(n)


def de_ordinal(n: int) -> str:
    irregular = {1: "erste", 3: "dritte", 7: "siebte", 8: "achte"}
    if n in irregular:
        return irregular[n]
    card = de_cardinal_int(n)
    return card + ("te" if n < 20 else "ste")


# ---------------------------------------------------------------------------
# French
# ---------------------------------------------------------------------------

_FR_ONES = [
    "zéro", "un", "deux", "trois", "quatre", "cinq", "six", "sept", "huit",
    "neuf", "dix", "onze", "douze", "treize", "quatorze", "quinze", "seize",
    "dix-sept", "dix-huit", "dix-neuf",
]
_FR_TENS = {2: "vingt", 3: "trente", 4: "quarante", 5: "cinquante",
            6: "soixante"}


def _fr_under_100(n: int) -> str:
    if n < 20:
        return _FR_ONES[n]
    if n < 70:
        tens, ones = divmod(n, 10)
        base = _FR_TENS[tens]
        if ones == 0:
            return base
        if ones == 1:
            return f"{base} et un"
        return f"{base}-{_FR_ONES[ones]}"
    if n < 80:
        if n == 71:
            return "soixante et onze"
        return f"soixante-{_FR_ONES[n - 60]}"
    if n == 80:
        return "quatre-vingts"
    if n < 100:
        return f"quatre-vingt-{_FR_ONES[n - 80]}"
    raise AssertionError(n)


def _fr_under_1000(n: int) -> str:
    hundreds, rem = divmod(n, 100)
    if hundreds == 0:
        return _fr_under_100(rem)
    if hundreds == 1:
        text = "cent"
    else:
        text = f"{_FR_ONES[hundreds]} cents" if rem == 0 else f"{_FR_ONES[hundreds]} cent"
    if rem:
        text += f" {_fr_under_100(rem)}"
    return text


def fr_cardinal_int(n: int) -> str:
    if n < 0:
        return "moins " + fr_cardinal_int(-n)
    if n < 1000:
        return _fr_under_1000(n)
    out = ""
    for scale, singular, plural in (
        (10 ** 9, "un milliard", "milliards"),
        (10 ** 6, "un million", "millions"),
    ):
        group, n = divmod(n, scale)
        if group:
            text = singular if group == 1 else f"{_fr_under_1000(group)} {plural}"
            out = text if not out else f"{out} {text}"
    thousands, rem = divmod(n, 1000)
    if thousands:
        text = "mille" if thousands == 1 else f"{_fr_under_1000(thousands)} mille"
        out = text if not out else f"{out} {text}"
    if rem:
        text = _fr_under_1000(rem)
        out = text if not out else f"{out} {text}"
    return out or "zéro"


def fr_ordinal(n: int) -> str:
    if n == 1:
        return "premier"
    card = fr_cardinal_int(n)
    if card.endswith("e"):
        card = card[:-1]
    elif card.endswith("cinq"):
        card += "u"
    elif card.endswith("neuf"):
        card = card[:-1] + "v"
    elif card.endswith("vingts"):
        card = card[:-1]
    return card + "ième"


# ---------------------------------------------------------------------------
# Spanish
# ---------------------------------------------------------------------------

_ES_ONES = [
    "cero", "uno", "dos", "tres", "cuatro", "cinco", "seis", "siete",
    "ocho", "nueve", "diez", "once", "doce", "trece", "catorce", "quince",
    "dieciséis", "diecisiete", "dieciocho", "diecinueve",
]
_ES_TENS = {2: "veinte", 3: "treinta", 4: "cuarenta", 5: "cincuenta",
            6: "sesenta", 7: "setenta", 8: "ochenta", 9: "noventa"}
_ES_TWENTIES = {
    21: "veintiuno", 22: "veintidós", 23: "veintitrés", 24: "veinticuatro",
    25: "veinticinco", 26: "veintiséis", 27: "veintisiete",
    28: "veintiocho", 29: "veintinueve",
}
_ES_HUNDREDS = {
    1: "ciento", 2: "doscientos", 3: "trescientos", 4: "cuatrocientos",
    5: "quinientos", 6: "seiscientos", 7: "setecientos", 8: "ochocientos",
    9: "novecientos",
}


def _es_under_100(n: int) -> str:
    if n < 20:
        return _ES_ONES[n]
    if n in _ES_TWENTIES:
        return _ES_TWENTIES[n]
    tens, ones = divmod(n, 10)
    if ones == 0:
        return _ES_TENS[tens]
    return f"{_ES_TENS[tens]} y {_ES_ONES[ones]}"


def _es_under_1000(n: int) -> str:
    if n == 100:
        return "cien"
    hundreds, rem = divmod(n, 100)
    if hundreds == 0:
        return _es_under_100(rem)
    text = _ES_HUNDREDS[hundreds]
    if rem:
        text += f" {_es_under_100(rem)}"
    return text


def es_cardinal_int(n: int) -> str:
    if n < 0:
        return "menos " + es_cardinal_int(-n)
    if n < 1000:
        return _es_under_1000(n)
    out = ""
    for scale, singular, plural in (
        (10 ** 9, "mil millones", "mil millones"),
        (10 ** 6, "un millón", "millones"),
    ):
        group, n = divmod(n, scale)
        if group:
            text = singular if group == 1 else f"{_es_under_1000(group)} {plural}"
            out = text if not out else f"{out} {text}"
    thousands, rem = divmod(n, 1000)
    if thousands:
        text = "mil" if thousands == 1 else f"{_es_under_1000(thousands)} mil"
        out = text if not out else f"{out} {text}"
    if rem:
        text = _es_under_1000(rem)
        out = text if not out else f"{out} {text}"
    return out or "cero"


# ---------------------------------------------------------------------------
# Russian (nominative cardinals)
# ---------------------------------------------------------------------------

_RU_ONES = [
    "ноль", "один", "два", "три", "четыре", "пять", "шесть", "семь",
    "восемь", "девять", "десять", "одиннадцать", "двенадцать",
    "тринадцать", "четырнадцать", "пятнадцать", "шестнадцать",
    "семнадцать", "восемнадцать", "девятнадцать",
]
_RU_TENS = {2: "двадцать", 3: "тридцать", 4: "сорок", 5: "пятьдесят",
            6: "шестьдесят", 7: "семьдесят", 8: "восемьдесят",
            9: "девяносто"}
_RU_HUNDREDS = {1: "сто", 2: "двести", 3: "триста", 4: "четыреста",
                5: "пятьсот", 6: "шестьсот", 7: "семьсот",
                8: "восемьсот", 9: "девятьсот"}


def _ru_under_1000(n: int, feminine: bool = False) -> str:
    parts = []
    hundreds, rem = divmod(n, 100)
    if hundreds:
        parts.append(_RU_HUNDREDS[hundreds])
    if rem >= 20:
        tens, ones = divmod(rem, 10)
        parts.append(_RU_TENS[tens])
        rem = ones
    if rem:
        if feminine and rem == 1:
            parts.append("одна")
        elif feminine and rem == 2:
            parts.append("две")
        else:
            parts.append(_RU_ONES[rem])
    return " ".join(parts)


def _ru_plural(n: int, forms) -> str:
    if n % 100 in (11, 12, 13, 14):
        return forms[2]
    if n % 10 == 1:
        return forms[0]
    if n % 10 in (2, 3, 4):
        return forms[1]
    return forms[2]


def ru_cardinal_int(n: int) -> str:
    if n < 0:
        return "минус " + ru_cardinal_int(-n)
    if n == 0:
        return "ноль"
    parts = []
    for scale, forms, fem in (
        (10 ** 9, ("миллиард", "миллиарда", "миллиардов"), False),
        (10 ** 6, ("миллион", "миллиона", "миллионов"), False),
        (10 ** 3, ("тысяча", "тысячи", "тысяч"), True),
    ):
        group, n = divmod(n, scale)
        if group:
            parts.append(f"{_ru_under_1000(group, feminine=fem)} {_ru_plural(group, forms)}")
    if n:
        parts.append(_ru_under_1000(n))
    return " ".join(parts)


# ---------------------------------------------------------------------------
# Chinese
# ---------------------------------------------------------------------------

_ZH_DIGITS = "零一二三四五六七八九"


def zh_cardinal_int(n: int) -> str:
    if n < 0:
        return "负" + zh_cardinal_int(-n)
    if n < 10:
        return _ZH_DIGITS[n]

    def under_10000(m: int) -> str:
        out = []
        units = [(1000, "千"), (100, "百"), (10, "十")]
        started = False
        pending_zero = False
        for val, name in units:
            d, m = divmod(m, val)
            if d:
                if pending_zero:
                    out.append("零")
                    pending_zero = False
                if d == 1 and val == 10 and not started:
                    out.append(name)  # 10..19: 十, 十一
                else:
                    out.append(_ZH_DIGITS[d] + name)
                started = True
            elif started:
                pending_zero = True
        if m:
            if pending_zero:
                out.append("零")
            out.append(_ZH_DIGITS[m])
        return "".join(out)

    parts = []
    for scale, name in ((10 ** 8, "亿"), (10 ** 4, "万")):
        group, n = divmod(n, scale)
        if group:
            parts.append(under_10000(group) + name)
    if n:
        if parts and n < 1000:
            parts.append("零")
        parts.append(under_10000(n))
    return "".join(parts)


# ---------------------------------------------------------------------------
# Italian
# ---------------------------------------------------------------------------

_IT_ONES = ["zero", "uno", "due", "tre", "quattro", "cinque", "sei", "sette",
            "otto", "nove", "dieci", "undici", "dodici", "tredici",
            "quattordici", "quindici", "sedici", "diciassette", "diciotto",
            "diciannove"]
_IT_TENS = {2: "venti", 3: "trenta", 4: "quaranta", 5: "cinquanta",
            6: "sessanta", 7: "settanta", 8: "ottanta", 9: "novanta"}


def _it_under_100(n: int) -> str:
    if n < 20:
        return _IT_ONES[n]
    tens, unit = divmod(n, 10)
    word = _IT_TENS[tens]
    if unit == 0:
        return word
    if unit in (1, 8):  # vowel elision: ventuno, ventotto
        word = word[:-1]
    if unit == 3:
        return word + "tré"
    return word + _IT_ONES[unit]


def _it_under_1000(n: int) -> str:
    hundreds, rest = divmod(n, 100)
    if hundreds == 0:
        return _it_under_100(rest)
    head = "cento" if hundreds == 1 else _IT_ONES[hundreds] + "cento"
    if rest == 0:
        return head
    if rest // 10 == 8:  # centottanta elision
        head = head[:-1]
    return head + _it_under_100(rest)


def it_cardinal_int(n: int) -> str:
    if n < 0:
        return "meno " + it_cardinal_int(-n)
    if n < 1000:
        return _it_under_1000(n)
    parts = []
    millions, n = divmod(n, 10 ** 6)
    if millions:
        parts.append("un milione" if millions == 1
                     else it_cardinal_int(millions) + " milioni")
    thousands, n = divmod(n, 1000)
    if thousands:
        parts.append("mille" if thousands == 1
                     else _it_under_1000(thousands) + "mila")
    if n:
        parts.append(_it_under_1000(n))
    return " ".join(parts) if len(parts) > 1 else parts[0]


# ---------------------------------------------------------------------------
# Dutch
# ---------------------------------------------------------------------------

_NL_ONES = ["nul", "een", "twee", "drie", "vier", "vijf", "zes", "zeven",
            "acht", "negen", "tien", "elf", "twaalf", "dertien", "veertien",
            "vijftien", "zestien", "zeventien", "achttien", "negentien"]
_NL_TENS = {2: "twintig", 3: "dertig", 4: "veertig", 5: "vijftig",
            6: "zestig", 7: "zeventig", 8: "tachtig", 9: "negentig"}


def _nl_under_100(n: int) -> str:
    if n < 20:
        return _NL_ONES[n]
    tens, unit = divmod(n, 10)
    if unit == 0:
        return _NL_TENS[tens]
    joiner = "ën" if _NL_ONES[unit].endswith("e") else "en"
    return _NL_ONES[unit] + joiner + _NL_TENS[tens]


def _nl_under_1000(n: int) -> str:
    hundreds, rest = divmod(n, 100)
    if hundreds == 0:
        return _nl_under_100(rest)
    head = "honderd" if hundreds == 1 else _NL_ONES[hundreds] + "honderd"
    return head if rest == 0 else head + _nl_under_100(rest)


def nl_cardinal_int(n: int) -> str:
    if n < 0:
        return "min " + nl_cardinal_int(-n)
    if n < 1000:
        return _nl_under_1000(n)
    parts = []
    millions, n = divmod(n, 10 ** 6)
    if millions:
        parts.append(_nl_under_1000(millions) + " miljoen")
    thousands, n = divmod(n, 1000)
    if thousands:
        parts.append("duizend" if thousands == 1
                     else _nl_under_1000(thousands) + "duizend")
    if n:
        parts.append(_nl_under_1000(n))
    return " ".join(parts) if len(parts) > 1 else parts[0]


# ---------------------------------------------------------------------------
# Portuguese
# ---------------------------------------------------------------------------

_PT_ONES = ["zero", "um", "dois", "três", "quatro", "cinco", "seis", "sete",
            "oito", "nove", "dez", "onze", "doze", "treze", "catorze",
            "quinze", "dezesseis", "dezessete", "dezoito", "dezenove"]
_PT_TENS = {2: "vinte", 3: "trinta", 4: "quarenta", 5: "cinquenta",
            6: "sessenta", 7: "setenta", 8: "oitenta", 9: "noventa"}
_PT_HUNDREDS = {1: "cento", 2: "duzentos", 3: "trezentos", 4: "quatrocentos",
                5: "quinhentos", 6: "seiscentos", 7: "setecentos",
                8: "oitocentos", 9: "novecentos"}


def _pt_under_100(n: int) -> str:
    if n < 20:
        return _PT_ONES[n]
    tens, unit = divmod(n, 10)
    if unit == 0:
        return _PT_TENS[tens]
    return f"{_PT_TENS[tens]} e {_PT_ONES[unit]}"


def _pt_under_1000(n: int) -> str:
    if n == 100:
        return "cem"
    hundreds, rest = divmod(n, 100)
    if hundreds == 0:
        return _pt_under_100(rest)
    head = _PT_HUNDREDS[hundreds]
    return head if rest == 0 else f"{head} e {_pt_under_100(rest)}"


def pt_cardinal_int(n: int) -> str:
    if n < 0:
        return "menos " + pt_cardinal_int(-n)
    if n < 1000:
        return _pt_under_1000(n)
    parts = []
    millions, n = divmod(n, 10 ** 6)
    if millions:
        parts.append("um milhão" if millions == 1
                     else pt_cardinal_int(millions) + " milhões")
    thousands, n = divmod(n, 1000)
    if thousands:
        parts.append("mil" if thousands == 1
                     else _pt_under_1000(thousands) + " mil")
    if n:
        joiner = " e " if (n < 100 or n % 100 == 0) else " "
        return joiner.join([" ".join(parts), _pt_under_1000(n)]) \
            if parts else _pt_under_1000(n)
    return " ".join(parts)


# ---------------------------------------------------------------------------
# Swedish
# ---------------------------------------------------------------------------

_SV_ONES = ["noll", "ett", "två", "tre", "fyra", "fem", "sex", "sju",
            "åtta", "nio", "tio", "elva", "tolv", "tretton", "fjorton",
            "femton", "sexton", "sjutton", "arton", "nitton"]
_SV_TENS = {2: "tjugo", 3: "trettio", 4: "fyrtio", 5: "femtio",
            6: "sextio", 7: "sjuttio", 8: "åttio", 9: "nittio"}


def _sv_under_1000(n: int) -> str:
    hundreds, rest = divmod(n, 100)
    out = ""
    if hundreds:
        out = ("ett" if hundreds == 1 else _SV_ONES[hundreds]) + "hundra"
    if rest == 0:
        return out or "noll"
    if rest < 20:
        return out + _SV_ONES[rest]
    tens, unit = divmod(rest, 10)
    word = _SV_TENS[tens]
    if unit:
        word += _SV_ONES[unit]
    return out + word


def sv_cardinal_int(n: int) -> str:
    if n < 0:
        return "minus " + sv_cardinal_int(-n)
    if n < 1000:
        return _sv_under_1000(n)
    parts = []
    millions, n = divmod(n, 10 ** 6)
    if millions:
        parts.append("en miljon" if millions == 1
                     else sv_cardinal_int(millions) + " miljoner")
    thousands, n = divmod(n, 1000)
    if thousands:
        parts.append("ettusen" if thousands == 1
                     else _sv_under_1000(thousands) + "tusen")
    if n:
        parts.append(_sv_under_1000(n))
    return " ".join(parts) if len(parts) > 1 else parts[0]


# ---------------------------------------------------------------------------
# Catalan
# ---------------------------------------------------------------------------

_CA_ONES = ["zero", "u", "dos", "tres", "quatre", "cinc", "sis", "set",
            "vuit", "nou", "deu", "onze", "dotze", "tretze", "catorze",
            "quinze", "setze", "disset", "divuit", "dinou"]
_CA_TENS = {2: "vint", 3: "trenta", 4: "quaranta", 5: "cinquanta",
            6: "seixanta", 7: "setanta", 8: "vuitanta", 9: "noranta"}


def _ca_under_100(n: int) -> str:
    if n < 20:
        return _CA_ONES[n]
    tens, unit = divmod(n, 10)
    if unit == 0:
        return _CA_TENS[tens]
    joiner = "-i-" if tens == 2 else "-"  # vint-i-un, trenta-dos
    return f"{_CA_TENS[tens]}{joiner}{_CA_ONES[unit]}"


def _ca_under_1000(n: int) -> str:
    hundreds, rest = divmod(n, 100)
    if hundreds == 0:
        return _ca_under_100(rest)
    head = "cent" if hundreds == 1 else f"{_CA_ONES[hundreds]}-cents"
    return head if rest == 0 else f"{head} {_ca_under_100(rest)}"


def ca_cardinal_int(n: int) -> str:
    if n < 0:
        return "menys " + ca_cardinal_int(-n)
    if n < 1000:
        return _ca_under_1000(n)
    parts = []
    millions, n = divmod(n, 10 ** 6)
    if millions:
        parts.append("un milió" if millions == 1
                     else ca_cardinal_int(millions) + " milions")
    thousands, n = divmod(n, 1000)
    if thousands:
        parts.append("mil" if thousands == 1
                     else _ca_under_1000(thousands) + " mil")
    if n:
        parts.append(_ca_under_1000(n))
    return " ".join(parts) if len(parts) > 1 else parts[0]


# ---------------------------------------------------------------------------
# Luxembourgish (German-pattern compounds)
# ---------------------------------------------------------------------------

_LB_ONES = ["null", "eent", "zwee", "dräi", "véier", "fënnef", "sechs",
            "siwen", "aacht", "néng", "zéng", "eelef", "zwielef", "dräizéng",
            "véierzéng", "fofzéng", "siechzéng", "siwwenzéng", "uechtzéng",
            "nonzéng"]
_LB_ONES_PREFIX = ["", "een", "zwee", "dräi", "véier", "fënnef", "sechs",
                   "siwen", "aacht", "néng"]
_LB_TENS = {2: "zwanzeg", 3: "drësseg", 4: "véierzeg", 5: "fofzeg",
            6: "siechzeg", 7: "siwwenzeg", 8: "achtzeg", 9: "nonzeg"}


def _lb_under_100(n: int) -> str:
    if n < 20:
        return _LB_ONES[n]
    tens, unit = divmod(n, 10)
    if unit == 0:
        return _LB_TENS[tens]
    return f"{_LB_ONES_PREFIX[unit]}an{_LB_TENS[tens]}"


def _lb_under_1000(n: int) -> str:
    hundreds, rest = divmod(n, 100)
    if hundreds == 0:
        return _lb_under_100(rest)
    head = ("" if hundreds == 1 else _LB_ONES_PREFIX[hundreds]) + "honnert"
    return head if rest == 0 else head + _lb_under_100(rest)


def lb_cardinal_int(n: int) -> str:
    if n < 0:
        return "minus " + lb_cardinal_int(-n)
    if n < 1000:
        return _lb_under_1000(n)
    parts = []
    thousands, n = divmod(n, 1000)
    if thousands:
        parts.append("dausend" if thousands == 1
                     else _lb_under_1000(thousands) + "dausend")
    if n:
        parts.append(_lb_under_1000(n))
    return "".join(parts)


# ---------------------------------------------------------------------------
# Swahili (fully regular: na-joined)
# ---------------------------------------------------------------------------

_SW_ONES = ["sifuri", "moja", "mbili", "tatu", "nne", "tano", "sita",
            "saba", "nane", "tisa"]
_SW_TENS = {1: "kumi", 2: "ishirini", 3: "thelathini", 4: "arobaini",
            5: "hamsini", 6: "sitini", 7: "sabini", 8: "themanini",
            9: "tisini"}


def _sw_under_100(n: int) -> str:
    if n < 10:
        return _SW_ONES[n]
    tens, unit = divmod(n, 10)
    word = _SW_TENS[tens]
    return word if unit == 0 else f"{word} na {_SW_ONES[unit]}"


def sw_cardinal_int(n: int) -> str:
    if n < 0:
        return "kasoro " + sw_cardinal_int(-n)
    if n < 100:
        return _sw_under_100(n)
    parts = []
    millions, n = divmod(n, 10 ** 6)
    if millions:
        parts.append(f"milioni {sw_cardinal_int(millions)}")
    thousands, n = divmod(n, 1000)
    if thousands:
        parts.append(f"elfu {sw_cardinal_int(thousands)}")
    hundreds, n = divmod(n, 100)
    if hundreds:
        parts.append(f"mia {_SW_ONES[hundreds]}")
    if n:
        parts.append(_sw_under_100(n))
    if len(parts) > 1:
        return " na ".join(parts)
    return parts[0] if parts else "sifuri"


# ---------------------------------------------------------------------------
# Persian (Farsi)
# ---------------------------------------------------------------------------

_FA_ONES = ["صفر", "یک", "دو", "سه", "چهار", "پنج", "شش", "هفت", "هشت",
            "نه", "ده", "یازده", "دوازده", "سیزده", "چهارده", "پانزده",
            "شانزده", "هفده", "هجده", "نوزده"]
_FA_TENS = {2: "بیست", 3: "سی", 4: "چهل", 5: "پنجاه", 6: "شصت",
            7: "هفتاد", 8: "هشتاد", 9: "نود"}
_FA_HUNDREDS = {1: "صد", 2: "دویست", 3: "سیصد", 4: "چهارصد", 5: "پانصد",
                6: "ششصد", 7: "هفتصد", 8: "هشتصد", 9: "نهصد"}


def _fa_under_1000(n: int) -> str:
    parts = []
    hundreds, rest = divmod(n, 100)
    if hundreds:
        parts.append(_FA_HUNDREDS[hundreds])
    if rest >= 20:
        tens, unit = divmod(rest, 10)
        parts.append(_FA_TENS[tens] if unit == 0
                     else f"{_FA_TENS[tens]} و {_FA_ONES[unit]}")
    elif rest:
        parts.append(_FA_ONES[rest])
    return " و ".join(parts) if parts else _FA_ONES[0]


def fa_cardinal_int(n: int) -> str:
    if n < 0:
        return "منفی " + fa_cardinal_int(-n)
    if n < 1000:
        return _fa_under_1000(n)
    parts = []
    millions, n = divmod(n, 10 ** 6)
    if millions:
        parts.append(f"{_fa_under_1000(millions)} میلیون")
    thousands, n = divmod(n, 1000)
    if thousands:
        parts.append("هزار" if thousands == 1
                     else f"{_fa_under_1000(thousands)} هزار")
    if n:
        parts.append(_fa_under_1000(n))
    return " و ".join(parts)


# ---------------------------------------------------------------------------
# Czech
# ---------------------------------------------------------------------------

_CS_ONES = ["nula", "jedna", "dva", "tři", "čtyři", "pět", "šest", "sedm",
            "osm", "devět", "deset", "jedenáct", "dvanáct", "třináct",
            "čtrnáct", "patnáct", "šestnáct", "sedmnáct", "osmnáct",
            "devatenáct"]
_CS_TENS = {2: "dvacet", 3: "třicet", 4: "čtyřicet", 5: "padesát",
            6: "šedesát", 7: "sedmdesát", 8: "osmdesát", 9: "devadesát"}


def _cs_under_100(n: int) -> str:
    if n < 20:
        return _CS_ONES[n]
    tens, unit = divmod(n, 10)
    word = _CS_TENS[tens]
    return word if unit == 0 else f"{word} {_CS_ONES[unit]}"


def _cs_hundreds(h: int) -> str:
    if h == 1:
        return "sto"
    if h == 2:
        return "dvě stě"
    if h in (3, 4):
        return f"{_CS_ONES[h]} sta"
    return f"{_CS_ONES[h]} set"


def _cs_under_1000(n: int) -> str:
    hundreds, rest = divmod(n, 100)
    if hundreds == 0:
        return _cs_under_100(rest)
    head = _cs_hundreds(hundreds)
    return head if rest == 0 else f"{head} {_cs_under_100(rest)}"


def cs_cardinal_int(n: int) -> str:
    if n < 0:
        return "minus " + cs_cardinal_int(-n)
    if n < 1000:
        return _cs_under_1000(n)
    parts = []
    thousands, n = divmod(n, 1000)
    if thousands:
        if thousands == 1:
            parts.append("tisíc")
        elif 2 <= thousands <= 4:
            parts.append(f"{_cs_under_1000(thousands)} tisíce")
        else:
            parts.append(f"{_cs_under_1000(thousands)} tisíc")
    if n:
        parts.append(_cs_under_1000(n))
    return " ".join(parts)


# ---------------------------------------------------------------------------
# Arabic (MSA, masculine counting forms)
# ---------------------------------------------------------------------------

_AR_ONES = ["صفر", "واحد", "اثنان", "ثلاثة", "أربعة", "خمسة", "ستة",
            "سبعة", "ثمانية", "تسعة", "عشرة"]
_AR_TEENS = {11: "أحد عشر", 12: "اثنا عشر"}
_AR_TENS = {2: "عشرون", 3: "ثلاثون", 4: "أربعون", 5: "خمسون",
            6: "ستون", 7: "سبعون", 8: "ثمانون", 9: "تسعون"}
_AR_HUNDREDS = {1: "مئة", 2: "مئتان", 3: "ثلاثمئة", 4: "أربعمئة",
                5: "خمسمئة", 6: "ستمئة", 7: "سبعمئة", 8: "ثمانمئة",
                9: "تسعمئة"}


def _ar_under_100(n: int) -> str:
    if n <= 10:
        return _AR_ONES[n]
    if n in _AR_TEENS:
        return _AR_TEENS[n]
    if n < 20:
        return f"{_AR_ONES[n - 10]} عشر"
    tens, unit = divmod(n, 10)
    if unit == 0:
        return _AR_TENS[tens]
    return f"{_AR_ONES[unit]} و{_AR_TENS[tens]}"  # unit wa-tens


def _ar_under_1000(n: int) -> str:
    hundreds, rest = divmod(n, 100)
    if hundreds == 0:
        return _ar_under_100(rest)
    head = _AR_HUNDREDS[hundreds]
    return head if rest == 0 else f"{head} و{_ar_under_100(rest)}"


def ar_cardinal_int(n: int) -> str:
    if n < 0:
        return "سالب " + ar_cardinal_int(-n)
    if n < 1000:
        return _ar_under_1000(n)
    parts = []
    thousands, n = divmod(n, 1000)
    if thousands:
        if thousands == 1:
            parts.append("ألف")
        elif thousands == 2:
            parts.append("ألفان")
        elif 3 <= thousands <= 10:
            parts.append(f"{_AR_ONES[thousands]} آلاف")
        else:
            parts.append(f"{_ar_under_1000(thousands)} ألف")
    if n:
        parts.append(_ar_under_1000(n))
    return " و".join(parts)


# ---------------------------------------------------------------------------
# Currency forms for the non-English locales (num2words to_currency parity
# in structure: "<cardinal> <unit><sep> <cardinal> <subunit>"; exact unit
# word choices are this engine's goldens — SURVEY §7 hard part 3)
# ---------------------------------------------------------------------------

# lang -> currency -> ((unit sing, unit plur), (sub sing, sub plur))
# For ru the "plural" slot holds (form_1, form_2_4, form_5plus).
_GENERIC_CURRENCY_FORMS: dict = {
    "de": {
        "EUR": (("Euro", "Euro"), ("Cent", "Cent")),
        "USD": (("Dollar", "Dollar"), ("Cent", "Cent")),
        "GBP": (("Pfund", "Pfund"), ("Penny", "Pence")),
    },
    "fr": {
        "EUR": (("euro", "euros"), ("centime", "centimes")),
        "USD": (("dollar", "dollars"), ("centime", "centimes")),
        "GBP": (("livre", "livres"), ("penny", "pence")),
    },
    "es": {
        "EUR": (("euro", "euros"), ("céntimo", "céntimos")),
        "USD": (("dólar", "dólares"), ("centavo", "centavos")),
        "GBP": (("libra", "libras"), ("penique", "peniques")),
    },
    "ru": {
        "RUB": ((("рубль", "рубля", "рублей"),),
                (("копейка", "копейки", "копеек"),)),
        "USD": ((("доллар", "доллара", "долларов"),),
                (("цент", "цента", "центов"),)),
        "EUR": ((("евро", "евро", "евро"),), (("цент", "цента", "центов"),)),
    },
    "zh": {
        "CNY": (("元", "元"), ("分", "分")),
        "USD": (("美元", "美元"), ("美分", "美分")),
        "EUR": (("欧元", "欧元"), ("分", "分")),
    },
    "it": {
        "EUR": (("euro", "euro"), ("centesimo", "centesimi")),
        "USD": (("dollaro", "dollari"), ("centesimo", "centesimi")),
    },
    "nl": {
        "EUR": (("euro", "euro"), ("cent", "cent")),
        "USD": (("dollar", "dollar"), ("cent", "cent")),
    },
    "pt": {
        "EUR": (("euro", "euros"), ("cêntimo", "cêntimos")),
        "USD": (("dólar", "dólares"), ("centavo", "centavos")),
    },
    "sv": {
        "SEK": (("krona", "kronor"), ("öre", "öre")),
        "EUR": (("euro", "euro"), ("cent", "cent")),
        "USD": (("dollar", "dollar"), ("cent", "cent")),
    },
    "ca": {
        "EUR": (("euro", "euros"), ("cèntim", "cèntims")),
        "USD": (("dòlar", "dòlars"), ("centau", "centaus")),
    },
    "cs": {  # Czech uses the Slavic 3-form rule (1 / 2-4 / 5+)
        "CZK": ((("koruna", "koruny", "korun"),),
                (("haléř", "haléře", "haléřů"),)),
        "EUR": ((("euro", "eura", "eur"),),
                (("cent", "centy", "centů"),)),
    },
    "lb": {
        "EUR": (("Euro", "Euro"), ("Cent", "Cent")),
    },
    "sw": {
        "TZS": (("shilingi", "shilingi"), ("senti", "senti")),
        "USD": (("dola", "dola"), ("senti", "senti")),
        "EUR": (("yuro", "yuro"), ("senti", "senti")),
    },
    "fa": {
        "IRR": (("ریال", "ریال"), ("دینار", "دینار")),
        "USD": (("دلار", "دلار"), ("سنت", "سنت")),
        "EUR": (("یورو", "یورو"), ("سنت", "سنت")),
    },
}


def generic_currency(num: Decimal, sl: str, currency: str,
                     separator: str) -> str:
    """Cardinal + unit-name currency verbalization for de/fr/es/ru/zh."""
    lang_forms = _GENERIC_CURRENCY_FORMS.get(sl)
    forms = lang_forms.get(currency) if lang_forms else None
    card = _CARDINAL_INT.get(sl)
    if forms is None or card is None:
        raise NumberVerbalizeError(f"{sl}:currency {currency}")
    unit_forms, sub_forms = forms

    def word_for(n: int, f) -> str:
        if sl in ("ru", "cs"):  # Slavic 3-form plural (1 / 2-4 / 5+)
            return _ru_plural(n, f[0])
        sing, plur = f
        return sing if n == 1 else plur

    minus = {"de": "minus", "fr": "moins", "es": "menos", "ru": "минус",
             "zh": "负"}.get(sl, "minus")
    sign = f"{minus} " if num < 0 else ""
    num = abs(num)
    units = int(num)
    cents = int((num * 100).to_integral_value()) % 100
    joiner = "" if sl == "zh" else " "

    def amount(n: int) -> str:
        if sl == "de" and n == 1:
            return "ein"  # attributive form before a noun ("ein Euro")
        if sl == "ru" and n == 1:
            return "один"
        return card(n)

    main = f"{sign}{amount(units)}{joiner}{word_for(units, unit_forms)}"
    frac = f"{amount(cents)}{joiner}{word_for(cents, sub_forms)}"
    return f"{main}{separator} {frac}"


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

_CARDINAL_INT = {
    "en": en_cardinal_int,
    "de": de_cardinal_int,
    "fr": fr_cardinal_int,
    "es": es_cardinal_int,
    "ru": ru_cardinal_int,
    "zh": zh_cardinal_int,
    "it": it_cardinal_int,
    "nl": nl_cardinal_int,
    "pt": pt_cardinal_int,
    "sv": sv_cardinal_int,
    "ca": ca_cardinal_int,
    "lb": lb_cardinal_int,
    "sw": sw_cardinal_int,
    "fa": fa_cardinal_int,
    "cs": cs_cardinal_int,
    "ar": ar_cardinal_int,
}
_ORDINAL = {"en": en_ordinal, "de": de_ordinal, "fr": fr_ordinal}
_YEAR = {"en": en_year, "de": de_year}
_DIGIT_WORDS = {
    "en": _EN_ONES, "de": _DE_ONES, "fr": _FR_ONES, "es": _ES_ONES,
    "ru": _RU_ONES, "zh": list(_ZH_DIGITS), "it": _IT_ONES,
    "nl": _NL_ONES, "pt": _PT_ONES, "sv": _SV_ONES,
    "ca": _CA_ONES, "lb": _LB_ONES, "sw": _SW_ONES, "fa": _FA_ONES,
    "cs": _CS_ONES, "ar": _AR_ONES[:10],
}


def _short_lang(lang: str) -> str:
    from gruut_ray.profiles import short_lang

    return short_lang(lang)


# Magnitude bounds per language: the largest value the scale tables verbalize
# CORRECTLY (empirically probed: beyond these, tables either raise
# IndexError/KeyError or compose semantic garbage like "tienhonderd
# miljoen").  At/above the bound we raise NumberVerbalizeError — which the
# verbalize callers catch, leaving the token unexpanded — never a bare
# IndexError that would poison the document.
_MAX_MAGNITUDE = {
    "en": 10 ** 18,
    "de": 10 ** 12, "fr": 10 ** 12, "es": 10 ** 12, "ru": 10 ** 12,
    "zh": 10 ** 12, "pt": 10 ** 12,
    "it": 10 ** 9, "nl": 10 ** 9, "sv": 10 ** 9, "ca": 10 ** 9,
    "sw": 10 ** 9, "fa": 10 ** 9,
    "cs": 10 ** 6, "lb": 10 ** 6, "ar": 10 ** 6,
}
_DEFAULT_MAX_MAGNITUDE = 10 ** 6


def num_to_words(num: Decimal, lang: str, to: str = "cardinal",
                 currency: str = "USD", separator: str = "|") -> str:
    """Dispatch mirroring ``num2words(num, lang=..., to=...)``."""
    sl = _short_lang(lang)
    if abs(num) >= _MAX_MAGNITUDE.get(sl, _DEFAULT_MAX_MAGNITUDE):
        raise NumberVerbalizeError(f"{sl}: magnitude {num} out of range")
    if to == "currency":
        if sl == "en":
            return en_currency(num, currency, separator)
        return generic_currency(num, sl, currency, separator)
    if to == "year":
        fn = _YEAR.get(sl)
        if fn is None:
            # num2words falls back to cardinal for languages without to_year
            return num_to_words(num, lang, to="cardinal")
        return fn(int(num))
    if to == "ordinal":
        fn = _ORDINAL.get(sl)
        if fn is None:
            raise NumberVerbalizeError(f"{sl}:ordinal")
        return fn(int(num))
    # cardinal
    card = _CARDINAL_INT.get(sl)
    if card is None:
        raise NumberVerbalizeError(f"{sl}:cardinal")
    if num == num.to_integral_value():
        return card(int(num))
    sign_word = {"en": "minus", "de": "minus", "fr": "moins", "es": "menos",
                 "ru": "минус", "zh": "负", "it": "meno", "nl": "min",
                 "pt": "menos", "sv": "minus"}.get(sl, "minus")
    point_word = {"en": "point", "de": "Komma", "fr": "virgule",
                  "es": "punto", "ru": "запятая", "zh": "点",
                  "it": "virgola", "nl": "komma", "pt": "vírgula",
                  "sv": "komma"}.get(sl, "point")
    sign = f"{sign_word} " if num < 0 else ""
    num = abs(num)
    frac = format(num.normalize(), "f").split(".", 1)
    frac_digits = frac[1] if len(frac) > 1 else ""
    digits = _DIGIT_WORDS[sl]
    joiner = "" if sl == "zh" else " "
    frac_text = joiner.join(digits[int(d)] for d in frac_digits)
    if sl == "zh":
        return f"{sign}{card(int(num))}{point_word}{frac_text}"
    return f"{sign}{card(int(num))} {point_word} {frac_text}"
