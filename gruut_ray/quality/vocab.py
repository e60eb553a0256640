"""Per-language seed vocabulary (common words, public knowledge).

Used for three things, all deterministic and offline:
* training the char-n-gram language-ID model (north rule: fastText-style
  langid, built from scratch — no model downloads in this sandbox),
* building the char-n-gram perplexity LM per language,
* generating the synthetic Common-Crawl-style page table
  (``gruut_ray.sources.synth``) whose ``lang`` labels the langid stage must
  recover.
"""

from __future__ import annotations

import typing

from gruut_ray.profiles import get_profile

# ~80 high-frequency words per language beyond the profile stopwords.
_EXTRA: typing.Dict[str, typing.Tuple[str, ...]] = {
    "en-us": (
        "time", "people", "year", "way", "day", "man", "thing", "woman",
        "life", "child", "world", "school", "state", "family", "student",
        "group", "country", "problem", "hand", "part", "place", "case",
        "week", "company", "system", "program", "question", "work",
        "government", "number", "night", "point", "home", "water", "room",
        "mother", "area", "money", "story", "fact", "month", "lot", "right",
        "study", "book", "eye", "job", "word", "business", "issue", "side",
        "kind", "head", "house", "service", "friend", "father", "power",
        "hour", "game", "line", "end", "member", "law", "car", "city",
        "community", "name", "president", "team", "minute", "idea", "body",
        "information", "back", "parent", "face", "others", "level", "office",
        "door", "health", "person", "art", "war", "history", "party",
    ),
    "de-de": (
        "Zeit", "Jahr", "Mensch", "Tag", "Land", "Frage", "Haus", "Fall",
        "Arbeit", "Prozent", "Hand", "Stadt", "Herr", "Teil", "Problem",
        "Welt", "Recht", "Ende", "Million", "Schule", "Woche", "Seite",
        "Regierung", "Mann", "Leben", "Frau", "Kind", "Auge", "Wasser",
        "Geld", "Entwicklung", "Monat", "Grund", "Weg", "Stunde", "Name",
        "Gesellschaft", "Politik", "Platz", "Geschichte", "System",
        "Unternehmen", "Beispiel", "Staat", "Familie", "Art", "Krieg",
        "Abend", "Bild", "Buch", "Wort", "Raum", "Person", "Anfang",
        "Interesse", "Stelle", "Sprache", "Punkt", "Freund", "Thema",
        "aber", "wenn", "wir", "kann", "gegen", "schon", "wie", "ihre",
        "dann", "unter", "sehr", "selbst", "hier", "alle", "wieder",
        "meine", "gut", "weil", "ohne", "durch", "neue", "immer", "beim",
    ),
    "fr-fr": (
        "temps", "année", "jour", "homme", "monde", "vie", "femme", "fois",
        "France", "chose", "pays", "ville", "moment", "enfant", "travail",
        "question", "main", "histoire", "eau", "mois", "exemple", "groupe",
        "droit", "société", "père", "mère", "nuit", "semaine", "heure",
        "état", "guerre", "nombre", "maison", "oeil", "mot", "livre",
        "famille", "effet", "raison", "place", "fin", "point", "tête",
        "gouvernement", "service", "ami", "idée", "côté", "projet", "forme",
        "tout", "être", "faire", "comme", "mais", "nous", "vous", "leur",
        "bien", "où", "sans", "peut", "cette", "entre", "aussi", "faut",
        "depuis", "très", "autres", "après", "votre", "ans", "deux",
        "même", "encore", "était", "donc", "cours", "contre", "tous",
    ),
    "es-es": (
        "tiempo", "año", "día", "hombre", "mundo", "vida", "mujer", "vez",
        "casa", "parte", "país", "ciudad", "momento", "niño", "trabajo",
        "pregunta", "mano", "historia", "agua", "mes", "ejemplo", "grupo",
        "derecho", "sociedad", "padre", "madre", "noche", "semana", "hora",
        "estado", "guerra", "número", "ojo", "palabra", "libro", "familia",
        "efecto", "razón", "lugar", "fin", "punto", "cabeza", "gobierno",
        "servicio", "amigo", "idea", "lado", "proyecto", "forma", "gente",
        "todo", "ser", "hacer", "nosotros", "bien", "donde", "puede",
        "entre", "también", "desde", "muy", "otros", "después", "años",
        "dos", "mismo", "todavía", "era", "curso", "contra", "todos",
        "sobre", "cuando", "hasta", "hay", "tiene", "nos", "durante",
    ),
    "ru-ru": (
        "время", "год", "день", "человек", "мир", "жизнь", "женщина",
        "раз", "дом", "часть", "страна", "город", "момент", "ребенок",
        "работа", "вопрос", "рука", "история", "вода", "месяц", "пример",
        "группа", "право", "общество", "отец", "мать", "ночь", "неделя",
        "час", "государство", "война", "число", "глаз", "слово", "книга",
        "семья", "эффект", "причина", "место", "конец", "точка", "голова",
        "правительство", "служба", "друг", "идея", "сторона", "проект",
        "форма", "люди", "быть", "делать", "хорошо", "где", "может",
        "между", "тоже", "очень", "другие", "после", "лет", "два",
        "самый", "еще", "был", "против", "всех", "когда", "только",
        "себя", "них", "тогда", "чтобы", "вот", "будет", "нет", "если",
    ),
    "zh-cn": (
        "我们", "他们", "这个", "那个", "什么", "可以", "没有", "自己",
        "现在", "时候", "知道", "这样", "看到", "问题", "工作", "生活",
        "学习", "中国", "世界", "国家", "社会", "经济", "发展", "历史",
        "文化", "政府", "城市", "地方", "孩子", "朋友", "老师", "学生",
        "公司", "时间", "今天", "明天", "昨天", "年代", "方面", "情况",
        "研究", "教育", "科学", "技术", "信息", "系统", "管理", "服务",
        "市场", "企业", "产品", "环境", "资源", "能力", "水平", "条件",
        "过程", "结果", "方法", "目标", "计划", "组织", "活动", "项目",
    ),
}


def words_for_lang(lang: str) -> typing.List[str]:
    """Stopwords + extra common words for a language."""
    profile = get_profile(lang)
    words = list(profile.stopwords)
    words.extend(_EXTRA.get(profile.lang, ()))
    return words


def seed_text(lang: str, repeats: int = 20) -> str:
    """Deterministic seed corpus for model building: the vocabulary cycled
    with varied adjacency so char n-grams cross word boundaries."""
    words = words_for_lang(lang)
    if not words:
        return ""
    sep = "" if get_profile(lang).split_mode == "chars" else " "
    chunks = []
    n = len(words)
    for r in range(repeats):
        # vary order deterministically: stride through the vocab
        stride = (r * 2 + 1) % n or 1
        chunks.append(sep.join(words[(i * stride) % n] for i in range(n)))
    return (sep or " ").join(chunks)
