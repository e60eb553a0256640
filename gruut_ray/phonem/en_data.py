"""Seed English (GenAm) pronunciation data — public-knowledge IPA for the
most common words, plus homographs disambiguated by POS role (the role
convention is the reference's: ``gruut:<PENN_TAG>`` from the POS pass,
gruut/text_processor.py:1102-1113, and ``gruut:letter`` for spelled-out
letters, gruut/const.py:209-216).

This is a *seed*: a real deployment plugs a full gruut ``lexicon.db`` into
``Lexicon.from_sqlite`` — the stage accepts any lexicon source.  The seed
keeps the engine self-contained (no network, nothing copied from the
reference's binary data) and gives tests stable goldens.
"""

from __future__ import annotations

# word → space-separated IPA phonemes (default role)
EN_SEED: dict = {
    "a": "ə",
    "about": "ə ˈb aʊ t",
    "after": "ˈæ f t ɚ",
    "all": "ɔ l",
    "also": "ˈɔ l s oʊ",
    "an": "ə n",
    "and": "ə n d",
    "any": "ˈɛ n i",
    "are": "ɑ ɹ",
    "as": "æ z",
    "at": "æ t",
    "back": "b æ k",
    "be": "b i",
    "because": "b ɪ ˈk ɔ z",
    "but": "b ʌ t",
    "by": "b aɪ",
    "can": "k æ n",
    "come": "k ʌ m",
    "could": "k ʊ d",
    "day": "d eɪ",
    "do": "d u",
    "even": "ˈi v ə n",
    "first": "f ɚ s t",
    "for": "f ɔ ɹ",
    "from": "f ɹ ʌ m",
    "get": "ɡ ɛ t",
    "give": "ɡ ɪ v",
    "go": "ɡ oʊ",
    "good": "ɡ ʊ d",
    "have": "h æ v",
    "he": "h i",
    "her": "h ɚ",
    "him": "h ɪ m",
    "his": "h ɪ z",
    "how": "h aʊ",
    "i": "aɪ",
    "if": "ɪ f",
    "in": "ɪ n",
    "into": "ˈɪ n t u",
    "is": "ˈɪ z",
    "it": "ɪ t",
    "its": "ɪ t s",
    "just": "dʒ ʌ s t",
    "know": "n oʊ",
    "like": "l aɪ k",
    "look": "l ʊ k",
    "make": "m eɪ k",
    "me": "m i",
    "most": "m oʊ s t",
    "my": "m ˈaɪ",
    "new": "n u",
    "no": "n oʊ",
    "not": "n ɑ t",
    "now": "n aʊ",
    "of": "ə v",
    "on": "ɑ n",
    "one": "w ʌ n",
    "only": "ˈoʊ n l i",
    "or": "ɔ ɹ",
    "other": "ˈʌ ð ɚ",
    "our": "ˈaʊ ɚ",
    "out": "aʊ t",
    "over": "ˈoʊ v ɚ",
    "people": "ˈp i p ə l",
    "say": "s eɪ",
    "see": "s i",
    "she": "ʃ i",
    "so": "s oʊ",
    "some": "s ʌ m",
    "take": "t eɪ k",
    "than": "ð æ n",
    "that": "ð æ t",
    "the": "ð ə",
    "their": "ð ɛ ɹ",
    "them": "ð ɛ m",
    "then": "ð ɛ n",
    "there": "ð ɛ ɹ",
    "these": "ð i z",
    "they": "ð eɪ",
    "think": "θ ɪ ŋ k",
    "this": "ð ɪ s",
    "time": "t aɪ m",
    "to": "t u",
    "two": "t u",
    "up": "ʌ p",
    "us": "ʌ s",
    "use": "j u z",
    "want": "w ɑ n t",
    "was": "w ʌ z",
    "way": "w eɪ",
    "we": "w i",
    "well": "w ɛ l",
    "were": "w ɚ",
    "what": "w ʌ t",
    "when": "w ɛ n",
    "which": "w ɪ tʃ",
    "who": "h u",
    "will": "w ɪ l",
    "with": "w ɪ ð",
    "work": "w ɚ k",
    "would": "w ʊ d",
    "year": "j ɪ ɹ",
    "you": "j u",
    "your": "j ɔ ɹ",
    # number words (verbalizer output feeds the phonemizer)
    "zero": "ˈz ɪ ɹ oʊ",
    "three": "θ ɹ i",
    "four": "f ɔ ɹ",
    "five": "f aɪ v",
    "six": "s ɪ k s",
    "seven": "ˈs ɛ v ə n",
    "eight": "eɪ t",
    "nine": "n aɪ n",
    "ten": "t ɛ n",
    "eleven": "ɪ ˈl ɛ v ə n",
    "twelve": "t w ɛ l v",
    "twenty": "ˈt w ɛ n t i",
    "thirty": "ˈθ ɚ t i",
    "forty": "ˈf ɔ ɹ t i",
    "fifty": "ˈf ɪ f t i",
    "hundred": "ˈh ʌ n d ɹ ə d",
    "thousand": "ˈθ aʊ z ə n d",
    "million": "ˈm ɪ l j ə n",
    "first_": "f ɚ s t",
    "second": "ˈs ɛ k ə n d",
    "third": "θ ɚ d",
    "dollar": "ˈd ɑ l ɚ",
    "dollars": "ˈd ɑ l ɚ z",
    "cent": "s ɛ n t",
    "cents": "s ɛ n t s",
    "point": "p ɔɪ n t",
    # time verbalization vocabulary (en_verbalize_time output)
    "oh": "oʊ",
    "o'clock": "ə ˈk l ɑ k",
    "noon": "n u n",
    "midnight": "ˈm ɪ d n aɪ t",
    "quarter": "ˈk w ɔ ɹ t ɚ",
    "half": "h æ f",
    "past": "p æ s t",
    # frequent irregulars the LTS rules get wrong
    "has": "h æ z",
    "had": "h æ d",
    "does": "d ʌ z",
    "done": "d ʌ n",
    "said": "s ɛ d",
    "says": "s ɛ z",
    "gone": "ɡ ɔ n",
    "once": "w ʌ n s",
    "whose": "h u z",
    "women": "ˈw ɪ m ə n",
    # test-suite classics
    "hovercraft": "h ˈʌ v ɚ k ɹ ˌæ f t",
    "full": "f ˈʊ l",
    "eels": "ˈi l z",
}

# homographs: word → {role → IPA}; default role listed first
EN_HOMOGRAPHS: dict = {
    "read": {"": "ɹ i d", "gruut:VB": "ɹ i d", "gruut:VBP": "ɹ i d",
             "gruut:VBD": "ɹ ɛ d", "gruut:VBN": "ɹ ɛ d"},
    "reads": {"": "ɹ i d z"},
    "wind": {"": "w ɪ n d", "gruut:NN": "w ɪ n d", "gruut:VB": "w aɪ n d"},
    "wound": {"": "w u n d", "gruut:NN": "w u n d",
              "gruut:VBD": "w aʊ n d", "gruut:VBN": "w aʊ n d"},
    "lead": {"": "l i d", "gruut:VB": "l i d", "gruut:NN": "l ɛ d"},
    "live": {"": "l ɪ v", "gruut:VB": "l ɪ v", "gruut:JJ": "l aɪ v"},
    "tear": {"": "t ɪ ɹ", "gruut:NN": "t ɪ ɹ", "gruut:VB": "t ɛ ɹ"},
    "bow": {"": "b oʊ", "gruut:NN": "b oʊ", "gruut:VB": "b aʊ"},
    "bass": {"": "b eɪ s", "gruut:NN": "b eɪ s"},
    "use": {"": "j u z", "gruut:VB": "j u z", "gruut:NN": "j u s"},
    "close": {"": "k l oʊ z", "gruut:VB": "k l oʊ z", "gruut:JJ": "k l oʊ s"},
}

# letters for role=gruut:letter (spell-out / initialisms,
# gruut/text_processor.py:1774-1820)
EN_LETTERS: dict = {
    "a": "eɪ", "b": "b i", "c": "s i", "d": "d i", "e": "i", "f": "ɛ f",
    "g": "dʒ i", "h": "eɪ tʃ", "i": "aɪ", "j": "dʒ eɪ", "k": "k eɪ",
    "l": "ɛ l", "m": "ɛ m", "n": "ɛ n", "o": "oʊ", "p": "p i", "q": "k j u",
    "r": "ɑ ɹ", "s": "ɛ s", "t": "t i", "u": "j u", "v": "v i",
    "w": "ˈd ʌ b ə l j u", "x": "ɛ k s", "y": "w aɪ", "z": "z i",
}


def build_en_lexicon():
    """Seed :class:`gruut_ray.phonem.lexicon.Lexicon` for en-us."""
    from gruut_ray.phonem.lexicon import Lexicon

    lex = Lexicon()
    for word, ipa in EN_SEED.items():
        if word.endswith("_"):  # alt spellings guard (first_)
            continue
        lex.add(word, ipa.split())
    for word, roles in EN_HOMOGRAPHS.items():
        for role, ipa in roles.items():
            lex.add(word, ipa.split(), role=role)
    for letter, ipa in EN_LETTERS.items():
        lex.add(letter, ipa.split(), role="gruut:letter")
    return lex
