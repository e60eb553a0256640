"""Grapheme-to-phoneme fallback for out-of-lexicon words.

Two engines, matching the reference's contract (``guess_phonemes`` hook,
gruut/text_processor.py:1150-1165):

* :class:`PerceptronG2P` — from-scratch trainable per-grapheme sequence
  classifier using the reference CRF's exact feature template (grapheme +
  ±3-char window + begin/end + bias, gruut/g2p.py:108-148) and label
  semantics (``_`` eps phoneme dropped, ``|`` joins multi-phoneme labels,
  gruut/g2p.py:25-33,78-90).  pycrfsuite is not installable here, so the
  linear model is an averaged perceptron — same features, same labels,
  trained from the same Phonetisaurus alignment format
  (``g|g}p|p`` groups, gruut/corpus2db.py:40-43).
* :class:`EnRuleG2P` — deterministic English letter-to-sound rules, the
  zero-dependency default for en when no trained model is supplied.
"""

from __future__ import annotations

import typing
import unicodedata

EPS_PHONEME = "_"
PHONEME_JOIN = "|"


def grapheme_features(word: str, i: int,
                      chars_backward: int = 3,
                      chars_forward: int = 3) -> typing.Tuple[str, ...]:
    """Feature keys for grapheme ``i`` — the reference template
    (gruut/g2p.py:108-148) as plain strings (no base64: our model keys on
    str directly)."""
    n = len(word)
    feats = ["bias", f"g={word[i]}"]
    if i == 0:
        feats.append("begin")
    for j in range(1, chars_backward + 1):
        if i >= j:
            feats.append(f"g-{j}={word[i - j]}")
    for j in range(1, chars_forward + 1):
        if i < n - j:
            feats.append(f"g+{j}={word[i + j]}")
    if i == n - 1:
        feats.append("end")
    return tuple(feats)


def parse_alignment(alignment: str) -> typing.List[typing.Tuple[str, str]]:
    """Parse one Phonetisaurus alignment string into (graphemes, phonemes)
    groups: ``"a|a}aː c|h}χ t}t"`` → [("aa","aː"), ("ch","χ"), ("t","t")]
    (format: gruut/corpus2db.py:40-43)."""
    groups = []
    for part in alignment.split():
        if "}" not in part:
            continue
        gs, ps = part.split("}", maxsplit=1)
        graphemes = "".join(g for g in gs.split(PHONEME_JOIN) if g != EPS_PHONEME)
        phonemes = PHONEME_JOIN.join(
            p for p in ps.split(PHONEME_JOIN) if p and p != EPS_PHONEME)
        groups.append((graphemes, phonemes))
    return groups


def alignment_to_labels(alignment: str,
                        ) -> typing.Optional[typing.Tuple[str, typing.List[str]]]:
    """(word, per-grapheme labels).  Multi-grapheme groups put the phoneme
    label on the first grapheme, eps on the rest.  Insertion groups (no
    graphemes, e.g. ``_}t``) attach their phonemes to the PREVIOUS
    grapheme's label — dropping them would train the model to omit
    epenthetic phonemes."""
    word_chars: typing.List[str] = []
    labels: typing.List[str] = []
    pending: typing.List[str] = []  # insertion phonemes before any grapheme
    for graphemes, phonemes in parse_alignment(alignment):
        if not graphemes:
            if phonemes:
                if labels:
                    prev = labels[-1]
                    labels[-1] = (phonemes if prev == EPS_PHONEME
                                  else f"{prev}{PHONEME_JOIN}{phonemes}")
                else:
                    pending.append(phonemes)
            continue
        for k, ch in enumerate(graphemes):
            word_chars.append(ch)
            label = phonemes if k == 0 and phonemes else EPS_PHONEME
            if k == 0 and pending:
                head = PHONEME_JOIN.join(pending)
                label = head if label == EPS_PHONEME \
                    else f"{head}{PHONEME_JOIN}{label}"
                pending.clear()
            labels.append(label)
    if not word_chars:
        return None
    return "".join(word_chars), labels


class PerceptronG2P:
    """Averaged-perceptron per-grapheme classifier.

    Weights are ``{feature: {label: weight}}`` sparse dicts — tiny models
    (≤ a few MB), deterministic training, loadable in an actor
    ``__init__``."""

    def __init__(self):
        self.weights: typing.Dict[str, typing.Dict[str, float]] = {}
        self.labels: typing.List[str] = []
        # per-model memo (same rationale as CrfG2P: Zipf vocabulary means
        # OOV words repeat heavily per actor; bounded for garbage tokens)
        self._cache: typing.Dict[str, typing.Tuple[str, ...]] = {}
        self._cache_max = 200_000

    # -- inference ----------------------------------------------------------

    def predict_labels(self, word: str) -> typing.List[str]:
        out = []
        for i in range(len(word)):
            feats = grapheme_features(word, i)
            scores: typing.Dict[str, float] = {}
            for f in feats:
                wts = self.weights.get(f)
                if wts:
                    for label, w in wts.items():
                        scores[label] = scores.get(label, 0.0) + w
            if not scores:
                out.append(EPS_PHONEME)
            else:
                # deterministic argmax (ties by label string)
                out.append(max(sorted(scores), key=lambda k: scores[k]))
        return out

    def __call__(self, word: str, normalize: bool = True,
                 ) -> typing.Sequence[str]:
        """Phonemes for ``word`` (NFC-normalized first, like the reference,
        gruut/g2p.py:98-101); eps labels dropped, joins expanded."""
        if normalize:
            word = unicodedata.normalize("NFC", word)
        cached = self._cache.get(word)
        if cached is not None:
            return cached
        phonemes: typing.List[str] = []
        for label in self.predict_labels(word):
            for p in label.split(PHONEME_JOIN):
                if p and p != EPS_PHONEME:
                    phonemes.append(p)
        if len(self._cache) >= self._cache_max:
            self._cache.clear()
        self._cache[word] = result = tuple(phonemes)
        return result

    # -- training -----------------------------------------------------------

    @classmethod
    def train(cls, examples: typing.Iterable[typing.Tuple[str, typing.List[str]]],
              epochs: int = 5) -> "PerceptronG2P":
        """Averaged perceptron over (word, per-grapheme labels) examples.
        Examples usually come from :func:`alignment_to_labels` over a
        gruut ``g2p_alignments`` table or corpus file."""
        model = cls()
        data = [(w, tuple(ls)) for w, ls in examples if w and ls]
        label_set = sorted({l for _, ls in data for l in ls})
        model.labels = label_set

        totals: typing.Dict[str, typing.Dict[str, float]] = {}
        stamps: typing.Dict[str, typing.Dict[str, int]] = {}
        weights = model.weights
        step = 0

        def upd(feat: str, label: str, delta: float) -> None:
            wts = weights.setdefault(feat, {})
            tot = totals.setdefault(feat, {})
            stp = stamps.setdefault(feat, {})
            cur = wts.get(label, 0.0)
            tot[label] = tot.get(label, 0.0) + (step - stp.get(label, 0)) * cur
            stp[label] = step
            wts[label] = cur + delta

        for _ in range(epochs):
            for word, gold in data:
                if len(gold) != len(word):
                    continue
                step += 1
                pred = model.predict_labels(word)
                for i, (p, g) in enumerate(zip(pred, gold)):
                    if p != g:
                        for f in grapheme_features(word, i):
                            upd(f, g, +1.0)
                            upd(f, p, -1.0)

        # finalize averaging
        for feat, wts in weights.items():
            tot = totals.get(feat, {})
            stp = stamps.get(feat, {})
            for label, cur in list(wts.items()):
                avg = (tot.get(label, 0.0)
                       + (step - stp.get(label, 0)) * cur) / max(1, step)
                if abs(avg) < 1e-9:
                    del wts[label]
                else:
                    wts[label] = avg
        return model

    @classmethod
    def train_from_alignments(cls, alignments: typing.Iterable[str],
                              epochs: int = 5) -> "PerceptronG2P":
        examples = []
        for a in alignments:
            ex = alignment_to_labels(a)
            if ex is not None:
                examples.append(ex)
        return cls.train(examples, epochs=epochs)

    # -- serialization ------------------------------------------------------

    def to_dict(self) -> dict:
        return {"labels": self.labels, "weights": self.weights}

    @classmethod
    def from_dict(cls, d: dict) -> "PerceptronG2P":
        m = cls()
        m.labels = list(d.get("labels", []))
        m.weights = {f: dict(w) for f, w in d.get("weights", {}).items()}
        return m


# ---------------------------------------------------------------------------
# Rule-based English letter-to-sound (deterministic default fallback)
# ---------------------------------------------------------------------------

# ordered (grapheme, phonemes) rules; longest-match-first within position
_EN_MULTI = (
    ("tch", "tʃ"), ("igh", "aɪ"), ("eau", "oʊ"),
    ("ch", "tʃ"), ("sh", "ʃ"), ("th", "θ"), ("ph", "f"), ("wh", "w"),
    ("ck", "k"), ("ng", "ŋ"), ("qu", "k w"), ("oo", "u"), ("ee", "i"),
    ("ea", "i"), ("ai", "eɪ"), ("ay", "eɪ"), ("oa", "oʊ"), ("ow", "oʊ"),
    ("ou", "aʊ"), ("oi", "ɔɪ"), ("oy", "ɔɪ"), ("au", "ɔ"), ("aw", "ɔ"),
    ("ar", "ɑ ɹ"), ("er", "ɚ"), ("ir", "ɚ"), ("ur", "ɚ"), ("or", "ɔ ɹ"),
    ("kn", "n"), ("wr", "ɹ"), ("gh", ""),
)

_EN_SINGLE = {
    "a": "æ", "b": "b", "c": "k", "d": "d", "e": "ɛ", "f": "f", "g": "ɡ",
    "h": "h", "i": "ɪ", "j": "dʒ", "k": "k", "l": "l", "m": "m", "n": "n",
    "o": "ɑ", "p": "p", "q": "k", "r": "ɹ", "s": "s", "t": "t", "u": "ʌ",
    "v": "v", "w": "w", "x": "k s", "y": "j", "z": "z", "'": "",
}

_EN_LONG_VOWEL = {"a": "eɪ", "e": "i", "i": "aɪ", "o": "oʊ", "u": "j u"}
_VOWELS = set("aeiou")


class EnRuleG2P:
    """Deterministic English LTS: digraphs longest-first, magic-e long
    vowels, soft c/g, final-e elision.  Not a pronunciation authority —
    a stable fallback with sensible output for OOV words."""

    def __call__(self, word: str, normalize: bool = True,
                 ) -> typing.Sequence[str]:
        if normalize:
            word = unicodedata.normalize("NFC", word)
        w = word.lower()
        out: typing.List[str] = []
        i = 0
        n = len(w)
        while i < n:
            # silent final e (magic-e: make, time)
            if (w[i] == "e" and i == n - 1 and i >= 2
                    and w[i - 1] not in _VOWELS and w[i - 2] in _VOWELS):
                i += 1
                continue
            matched = False
            for graph, phon in _EN_MULTI:
                if w.startswith(graph, i):
                    if phon:
                        out.extend(phon.split())
                    i += len(graph)
                    matched = True
                    break
            if matched:
                continue
            ch = w[i]
            # magic-e long vowel: vowel + single consonant + final e
            if (ch in _EN_LONG_VOWEL and i + 2 == n - 1 and w[n - 1] == "e"
                    and w[i + 1] not in _VOWELS):
                out.extend(_EN_LONG_VOWEL[ch].split())
                i += 1
                continue
            if ch == "c" and i + 1 < n and w[i + 1] in "eiy":
                out.append("s")
            elif ch == "g" and i + 1 < n and w[i + 1] in "eiy":
                out.append("dʒ")
            elif ch == "y" and (i == n - 1 or w[min(i + 1, n - 1)] not in _VOWELS) and i > 0:
                out.append("i")
            else:
                phon = _EN_SINGLE.get(ch, "")
                if phon:
                    out.extend(phon.split())
            i += 1
        return out
