"""Per-language profiles, re-expressing the reference's settings tables
(reference gruut/lang.py, one ``get_<lang>_settings`` per language) as plain
data.  Punctuation/break/abbreviation tables match the reference verbatim —
they are behavioral spec, not code.

``stopwords`` are a north-rule addition (quality-filter stopword density);
they are the top function words of each language (public knowledge).
"""

from __future__ import annotations

from gruut_ray.profiles.base import LanguageProfile

# ruff: noqa: E501

_Q_BEGIN = ('"', "“", "«", "[", "(", "<", "„")
_Q_END = ('"', "”", "»", "]", ")", ">")

EN_US = LanguageProfile(
    lang="en-us",
    major_breaks=(".", "?", "!"),
    minor_breaks=(",", ";", ":", "..."),
    word_breaks=("-", "_"),
    begin_punctuations=('"', "'", "“", "«", "[", "(", "<", "*", "_"),
    end_punctuations=('"', "'", "”", "»", "]", ")", ">", "*", "_"),
    default_currency="USD",
    currencies=(("$", "USD"), ("€", "EUR"), ("£", "GBP"), ("¥", "JPY")),
    default_date_format="{m} {o}, {y}",
    replacements=(("’", "'"),),
    # reference gruut/lang.py:382-403
    abbreviations=(
        (r"^([cC])o\.", r"\1ompany"),
        (r"^([dD])r\.", r"\1octor"),
        (r"^([dD])rs\.", r"\1octors"),
        (r"^([jJ])r\.('s)?", r"\1unior\2"),
        (r"^([lL])td\.", r"\1imited"),
        (r"^([mM])r\.", r"\1ister"),
        (r"^([mM])s\.", r"\1iss"),
        (r"^([mM])rs\.", r"\1issus"),
        (r"^([sS])t\.", r"\1treet"),
        (r"^([vV])s\.?", r"\1ersus"),
        (r"(.*\d)%", r"\1 percent"),
        (r"^&(\s*)$", r"and\1"),
        (r"^([mM])t\.", r"\1ount"),
        ("^II$", "two"),
        ("^III$", "three"),
        ("^IV$", "four"),
        ("^VI$", "six"),
        ("^VII$", "seven"),
        ("^VIII$", "eight"),
    ),
    spell_out_words=(
        (".", "dot"),
        ("-", "dash"),
        ("@", "at"),
        ("*", "star"),
        ("+", "plus"),
        ("/", "slash"),
    ),
    group_separators=(",",),
    decimal_separator=".",
    date_order="mdy",
    month_names=(
        "January", "February", "March", "April", "May", "June", "July",
        "August", "September", "October", "November", "December",
    ),
    hooks="en",
    # Dotted words the reference's 100k-word lexicon keeps whole during
    # tokenization (in_lexicon guard); required for "4:01 p.m." semantics.
    protected_words=("a.m.", "p.m.", "a.m", "p.m"),
    stopwords=(
        "the", "of", "and", "a", "to", "in", "is", "you", "that", "it",
        "he", "was", "for", "on", "are", "as", "with", "his", "they", "I",
        "at", "be", "this", "have", "from", "or", "one", "had", "by", "but",
        "not", "what", "all", "were", "we", "when", "your", "can", "said",
        "there", "an", "which", "she", "do", "how", "their", "if", "will",
    ),
)

DE = LanguageProfile(
    lang="de-de",
    minor_breaks=(",", ";", ":", "..."),
    begin_punctuations=('"', "“", "«", "[", "(", "<", "’", "„"),
    end_punctuations=('"', "”", "»", "]", ")", ">", "’"),
    default_currency="EUR",
    currencies=(("€", "EUR"), ("$", "USD"), ("£", "GBP")),
    default_date_format="omy",
    replacements=(("’", "'"), ("ß", "ss")),
    group_separators=(".",),
    decimal_separator=",",
    date_order="dmy",
    month_names=(
        "Januar", "Februar", "März", "April", "Mai", "Juni", "Juli",
        "August", "September", "Oktober", "November", "Dezember",
    ),
    stopwords=(
        "der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich",
        "des", "auf", "für", "ist", "im", "dem", "nicht", "ein", "eine",
        "als", "auch", "es", "an", "werden", "aus", "er", "hat", "dass",
        "sie", "nach", "wird", "bei", "einer", "um", "am", "sind", "noch",
    ),
)

FR = LanguageProfile(
    lang="fr-fr",
    hooks="fr",
    minor_breaks=(",", ";", ":", "..."),
    begin_punctuations=_Q_BEGIN,
    end_punctuations=_Q_END,
    default_currency="EUR",
    currencies=(("€", "EUR"), ("$", "USD"), ("£", "GBP")),
    default_date_format="omy",
    group_separators=(" ", " "),
    decimal_separator=",",
    date_order="dmy",
    month_names=(
        "janvier", "février", "mars", "avril", "mai", "juin", "juillet",
        "août", "septembre", "octobre", "novembre", "décembre",
    ),
    stopwords=(
        "de", "la", "le", "et", "les", "des", "en", "un", "du", "une", "que",
        "est", "pour", "qui", "dans", "a", "par", "plus", "pas", "au", "sur",
        "ne", "se", "ce", "il", "sont", "la", "avec", "son", "aux", "d'un",
    ),
)

ES = LanguageProfile(
    lang="es-es",
    minor_breaks=(",", ";", ":", "..."),
    begin_punctuations=('"', "“", "«", "[", "(", "<", "¡", "¿"),
    end_punctuations=_Q_END,
    default_currency="EUR",
    currencies=(("€", "EUR"), ("$", "USD"), ("£", "GBP")),
    default_date_format="dmy",
    group_separators=(".",),
    decimal_separator=",",
    date_order="dmy",
    month_names=(
        "enero", "febrero", "marzo", "abril", "mayo", "junio", "julio",
        "agosto", "septiembre", "octubre", "noviembre", "diciembre",
    ),
    stopwords=(
        "de", "la", "que", "el", "en", "y", "a", "los", "del", "se", "las",
        "por", "un", "para", "con", "no", "una", "su", "al", "lo", "como",
        "más", "pero", "sus", "le", "ya", "o", "este", "sí", "porque",
    ),
)

RU = LanguageProfile(
    lang="ru-ru",
    begin_punctuations=_Q_BEGIN,
    end_punctuations=_Q_END,
    default_currency="RUB",
    currencies=(("₽", "RUB"), ("€", "EUR"), ("$", "USD")),
    default_date_format="dmy",
    group_separators=(" ", " "),
    decimal_separator=",",
    date_order="dmy",
    month_names=(
        "января", "февраля", "марта", "апреля", "мая", "июня", "июля",
        "августа", "сентября", "октября", "ноября", "декабря",
    ),
    stopwords=(
        "и", "в", "не", "на", "я", "что", "с", "он", "как", "а", "то", "все",
        "она", "так", "его", "но", "к", "у", "же", "вы", "за", "бы", "по",
        "ее", "мне", "было", "из", "мы", "есть", "для", "это", "от",
    ),
)

ZH = LanguageProfile(
    lang="zh-cn",
    major_breaks=("。", "！", "？"),
    minor_breaks=("；", "：", "，", "、", "……"),
    begin_punctuations=("（", "［", "【", "「", "﹁", '"', "《", "〈"),
    end_punctuations=("）", "］", " 】", "」", "﹂", '"', "》", "〉"),
    word_breaks=("‧",),
    replacements=(),
    split_mode="chars",
    join_str="",
    date_order="ymd",
    stopwords=(
        "的", "一", "是", "在", "不", "了", "有", "和", "人", "这", "中",
        "大", "为", "上", "个", "国", "我", "以", "要", "他", "时", "来",
        "用", "们", "生", "到", "作", "地", "于", "出",
    ),
)

AR = LanguageProfile(
    lang="ar",
    month_names=("يناير", "فبراير", "مارس", "أبريل", "مايو", "يونيو", "يوليو", "أغسطس", "سبتمبر", "أكتوبر", "نوفمبر", "ديسمبر"),
    major_breaks=(".", "؟", "!"),
    minor_breaks=("،", ";", ":"),
    begin_punctuations=_Q_BEGIN,
    end_punctuations=_Q_END,
    default_date_format="dmy",
    date_order="dmy",
    stopwords=("في", "من", "على", "أن", "إلى", "عن", "مع", "هذا", "كان", "لا"),
)

CS = LanguageProfile(
    lang="cs-cz",
    month_names=("ledna", "února", "března", "dubna", "května", "června", "července", "srpna", "září", "října", "listopadu", "prosince"),
    begin_punctuations=('"', "“", "«", "[", "(", "<", "’", "„"),
    end_punctuations=('"', "”", "»", "]", ")", ">", "’"),
    default_currency="EUR",
    currencies=(("€", "EUR"), ("Kč", "CZK")),
    default_date_format="dmy",
    group_separators=(" ",),
    decimal_separator=",",
    date_order="dmy",
    stopwords=("a", "se", "na", "je", "v", "že", "s", "do", "to", "po"),
)

FA = LanguageProfile(
    lang="fa",
    hooks="fa",
    month_names=("ژانویه", "فوریه", "مارس", "آوریل", "مه", "ژوئن", "ژوئیه", "اوت", "سپتامبر", "اکتبر", "نوامبر", "دسامبر"),
    major_breaks=(".", "؟", "!"),
    begin_punctuations=('"', "“", "«", "[", "(", "<", "’", "„"),
    end_punctuations=('"', "”", "»", "]", ")", ">", "’"),
    default_date_format="dmy",
    date_order="dmy",
    stopwords=("و", "در", "به", "از", "که", "این", "را", "با", "است", "برای"),
)

# NOTE: the reference attaches its French liaison hook to Italian
# (gruut/lang.py get_it_settings "post_process_sentence":
# fr_post_process_sentence) — but that hook is INERT there: its liaison
# conditions all require POS tags and no Italian POS model ships, so it
# never fires.  Wiring our table-based French function-word variant onto
# Italian text WOULD fire (le/la/... are also Italian articles), changing
# output where the reference doesn't — so Italian deliberately gets no
# hook.
IT = LanguageProfile(
    lang="it-it",
    month_names=("gennaio", "febbraio", "marzo", "aprile", "maggio", "giugno", "luglio", "agosto", "settembre", "ottobre", "novembre", "dicembre"),
    minor_breaks=(",", ";", ":", "..."),
    begin_punctuations=_Q_BEGIN,
    end_punctuations=_Q_END,
    default_currency="EUR",
    currencies=(("€", "EUR"), ("$", "USD")),
    default_date_format="dmy",
    group_separators=(".",),
    decimal_separator=",",
    date_order="dmy",
    stopwords=("di", "e", "il", "la", "che", "in", "un", "per", "è", "non"),
)

LB = LanguageProfile(
    lang="lb",
    month_names=("Januar", "Februar", "Mäerz", "Abrëll", "Mee", "Juni", "Juli", "August", "September", "Oktober", "November", "Dezember"),
    minor_breaks=(",", ";", ":", "..."),
    begin_punctuations=_Q_BEGIN,
    end_punctuations=_Q_END,
    default_currency="EUR",
    currencies=(("€", "EUR"),),
    default_date_format="dmy",
    group_separators=(".",),
    decimal_separator=",",
    date_order="dmy",
    stopwords=("an", "de", "den", "d'", "vun", "ze", "fir", "op", "mat", "ass"),
)

NL = LanguageProfile(
    lang="nl",
    month_names=("januari", "februari", "maart", "april", "mei", "juni", "juli", "augustus", "september", "oktober", "november", "december"),
    minor_breaks=(",", ";", ":", "..."),
    begin_punctuations=_Q_BEGIN,
    end_punctuations=_Q_END,
    default_currency="EUR",
    currencies=(("€", "EUR"),),
    default_date_format="dmy",
    group_separators=(".",),
    decimal_separator=",",
    date_order="dmy",
    stopwords=("de", "en", "van", "het", "een", "in", "is", "dat", "op", "te"),
)

PT = LanguageProfile(
    lang="pt",
    month_names=("janeiro", "fevereiro", "março", "abril", "maio", "junho", "julho", "agosto", "setembro", "outubro", "novembro", "dezembro"),
    minor_breaks=(",", ";", ":", "..."),
    begin_punctuations=_Q_BEGIN,
    end_punctuations=_Q_END,
    default_currency="EUR",
    currencies=(("€", "EUR"), ("R$", "BRL")),
    default_date_format="dmy",
    group_separators=(".",),
    decimal_separator=",",
    date_order="dmy",
    stopwords=("de", "a", "o", "que", "e", "do", "da", "em", "um", "para"),
)

SV = LanguageProfile(
    lang="sv-se",
    month_names=("januari", "februari", "mars", "april", "maj", "juni", "juli", "augusti", "september", "oktober", "november", "december"),
    minor_breaks=(",", ";", ":", "..."),
    begin_punctuations=_Q_BEGIN,
    end_punctuations=_Q_END,
    default_currency="SEK",
    currencies=(("kr", "SEK"), ("€", "EUR")),
    default_date_format="dmy",
    group_separators=(" ",),
    decimal_separator=",",
    date_order="ymd",
    stopwords=("och", "i", "att", "det", "som", "en", "på", "är", "av", "för"),
)

SW = LanguageProfile(
    lang="sw",
    month_names=("Januari", "Februari", "Machi", "Aprili", "Mei", "Juni", "Julai", "Agosti", "Septemba", "Oktoba", "Novemba", "Desemba"),
    begin_punctuations=_Q_BEGIN,
    end_punctuations=_Q_END,
    default_date_format="dmy",
    date_order="dmy",
    stopwords=("ya", "na", "wa", "kwa", "ni", "za", "katika", "la", "kuwa", "cha"),
)

CA = LanguageProfile(
    lang="ca-ce",
    hooks="ca",
    # reference get_ca_settings replacements (lang.py:2516-2521):
    # normalize then strip orthographic apostrophes, drop hyphens,
    # collapse the l·l geminate
    replacements=(("’", "'"), ("'", ""), ("-", ""), ("l·l", "l")),
    month_names=("gener", "febrer", "març", "abril", "maig", "juny", "juliol", "agost", "setembre", "octubre", "novembre", "desembre"),
    minor_breaks=(",", ";", ":", "..."),
    begin_punctuations=_Q_BEGIN,
    end_punctuations=_Q_END,
    default_currency="EUR",
    currencies=(("€", "EUR"),),
    default_date_format="dmy",
    group_separators=(".",),
    decimal_separator=",",
    date_order="dmy",
    stopwords=("de", "la", "que", "el", "i", "a", "en", "les", "un", "per"),
)

ALL_PROFILES = (
    EN_US, DE, FR, ES, RU, ZH, AR, CS, FA, IT, LB, NL, PT, SV, SW, CA,
)
