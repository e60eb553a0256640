"""Lightweight part-of-speech tagging for pronunciation disambiguation.

The reference runs a pycrfsuite POS CRF per sentence and maps each tag to a
word role ``gruut:<TAG>`` that selects among lexicon pronunciations
(gruut/text_processor.py:1102-1113, gruut/pos.py:52-166).  pycrfsuite and
its trained models are not available here, so this module supplies the same
*interface* with two engines:

* :class:`PerceptronPOS` — trainable averaged perceptron over the
  reference's feature template (±2-word window, prefix/suffix chunks,
  gruut/pos.py:70-156) for users with a tagged corpus;
* :func:`heuristic_tags` — deterministic closed-class + suffix rules,
  the zero-data default.  It only needs to be right *enough* to pick
  homograph pronunciations (read/wound/live...), not to be a treebank
  tagger.
"""

from __future__ import annotations

import typing

# closed-class words → Penn tag (public knowledge)
_CLOSED: typing.Dict[str, str] = {}
for _w in ("the", "a", "an"):
    _CLOSED[_w] = "DT"
for _w in ("he", "she", "it", "they", "we", "i", "you", "who"):
    _CLOSED[_w] = "PRP"
for _w in ("his", "her", "its", "their", "our", "my", "your"):
    _CLOSED[_w] = "PRP$"
for _w in ("in", "on", "at", "by", "for", "with", "from", "to", "of",
           "into", "over", "under", "about"):
    _CLOSED[_w] = "IN"
for _w in ("and", "or", "but", "nor"):
    _CLOSED[_w] = "CC"
for _w in ("is", "are", "was", "were", "be", "been", "am"):
    _CLOSED[_w] = "VB"
for _w in ("will", "would", "can", "could", "shall", "should", "may",
           "might", "must"):
    _CLOSED[_w] = "MD"
for _w in ("have", "has"):
    _CLOSED[_w] = "VBP"
for _w in ("had",):
    _CLOSED[_w] = "VBD"
for _w in ("not", "very", "too", "also", "now", "then", "here", "there"):
    _CLOSED[_w] = "RB"

_PAST_MARKERS = frozenset(("had", "has", "have", "was", "were", "been"))


def heuristic_tags(words: typing.Sequence[str]) -> typing.List[str]:
    """Per-word Penn-ish tags from closed classes, suffixes, and the
    previous word (enough context to disambiguate the lexicon homographs)."""
    tags: typing.List[str] = []
    for i, w in enumerate(words):
        lw = w.lower()
        prev = words[i - 1].lower() if i > 0 else ""
        prev_tag = tags[i - 1] if i > 0 else ""
        tag = _CLOSED.get(lw)
        if tag is None:
            if lw.endswith("ing") and len(lw) > 4:
                tag = "VBG"
            elif lw.endswith("ed") and len(lw) > 3:
                tag = "VBN" if prev in _PAST_MARKERS else "VBD"
            elif lw.endswith("ly") and len(lw) > 3:
                tag = "RB"
            elif prev_tag in ("DT", "PRP$", "JJ"):
                tag = "NN"
            elif prev_tag in ("PRP", "NNS") or prev in _PAST_MARKERS:
                tag = "VBN" if prev in _PAST_MARKERS else "VBP"
            elif prev_tag == "MD" or prev == "to":
                tag = "VB"
            elif w[:1].isupper() and i > 0:
                tag = "NNP"
            elif lw.endswith("s") and len(lw) > 3 and not lw.endswith("ss"):
                tag = "NNS"
            else:
                tag = "NN"
        tags.append(tag)
    return tags


def tags_to_roles(tags: typing.Sequence[str]) -> typing.List[str]:
    """Penn tag → gruut role string (reference text_processor.py:1113)."""
    return [f"gruut:{t}" for t in tags]


# ---------------------------------------------------------------------------
# CRF path: load a gruut pack's pos/model.crf (reference pos.py:52-166,
# loaded at utils.py:75-85) with the from-scratch crf1d reader
# ---------------------------------------------------------------------------

class CrfPos:
    """POS tagger over a pre-trained CRFsuite ``pos/model.crf``.

    Reuses :func:`gruut_ray.phonem.crf_g2p.load_crf1d` (the same public
    crf1d file format as the G2P models) with the reference's POS feature
    template (gruut/pos.py:70-156): per word — bias, b64-coded word,
    length, punctuation/digit flags, 2-/3-char front and back chunks —
    for the word itself and its ±2 neighbors (prefixes ``-1:``/``+2:``…),
    plus BOS/EOS.  Attribute strings follow pycrfsuite's dict-item
    encoding exactly as the G2P reader does: string values become
    ``key:value`` attributes with weight 1.0, bools/numbers become bare
    ``key`` attributes carrying their value as the weight (so ``bias``
    is weight 1.0 and ``len(word)`` is weight ``len(word)``).

    Labels are the tagger's raw tag strings (xpos for en, upos for fr —
    reference module docstring), not b64-coded like G2P labels.

    NOTE: this reference checkout ships no ``pos/model.crf`` files, so at
    runtime this loader is exercised only when a user supplies a full
    gruut language pack; the round-trip is pinned by a synthetic crf1d
    model in tests (tests/test_phonem.py).
    """

    def __init__(self, labels, state, trans):
        import numpy as np
        self.labels = list(labels)
        self.state = state          # attr string -> [(label_id, weight)]
        self.trans = np.asarray(trans, dtype=np.float64)
        self.num_labels = len(self.labels)

    @classmethod
    def load(cls, path: str) -> "CrfPos":
        from gruut_ray.phonem.crf_g2p import load_crf1d
        return cls(*load_crf1d(path))

    # -- features (must match gruut/pos.py:70-156 + pycrfsuite encoding) --

    @staticmethod
    def _b64(s: str) -> str:
        import base64
        return base64.b64encode(s.encode()).decode("ascii")

    @classmethod
    def _local_attrs(cls, word: str, prefix: str = "",
                     ) -> typing.List[typing.Tuple[str, float]]:
        import string as _string
        attrs: typing.List[typing.Tuple[str, float]] = [
            (f"{prefix}bias", 1.0),
            (f"{prefix}word:{cls._b64(word)}", 1.0),
            (f"{prefix}len(word)", float(len(word))),
            (f"{prefix}word.ispunctuation",
             1.0 if word in _string.punctuation else 0.0),
            (f"{prefix}word.isdigit()", 1.0 if word.isdigit() else 0.0),
        ]
        for i in range(2, 4):   # chunks_front = 3
            attrs.append((f"{prefix}word[:{i}]:{word[:i]}", 1.0))
        for i in range(2, 4):   # chunks_back = 3
            attrs.append((f"{prefix}word[-{i}:]:{word[-i:]}", 1.0))
        return attrs

    def _word_attrs(self, words: typing.Sequence[str], i: int,
                    ) -> typing.List[typing.Tuple[str, float]]:
        n = len(words)
        attrs = self._local_attrs(words[i])
        if i == 0:
            attrs.append(("BOS", 1.0))
        if i == n - 1:
            attrs.append(("EOS", 1.0))
        for j in (1, 2):        # words_backward = 2
            if i >= j:
                attrs.extend(self._local_attrs(words[i - j], f"-{j}:"))
        for j in (1, 2):        # words_forward = 2
            if i < n - j:
                attrs.extend(self._local_attrs(words[i + j], f"+{j}:"))
        return attrs

    # -- inference (max-sum Viterbi, crfsuite first-best tie-break) ------

    def tag(self, words: typing.Sequence[str]) -> typing.List[str]:
        import numpy as np
        n = len(words)
        if n == 0:
            return []
        L = self.num_labels
        scores = np.zeros((n, L), dtype=np.float64)
        for i in range(n):
            row = scores[i]
            for attr, aw in self._word_attrs(words, i):
                if aw == 0.0:
                    continue
                for label_id, w in self.state.get(attr, ()):
                    row[label_id] += w * aw
        back = np.zeros((n, L), dtype=np.int32)
        delta = scores[0].copy()
        for t in range(1, n):
            cand = delta[:, None] + self.trans
            back[t] = np.argmax(cand, axis=0)
            delta = cand[back[t], np.arange(L)] + scores[t]
        path = [int(np.argmax(delta))]
        for t in range(n - 1, 0, -1):
            path.append(int(back[t, path[-1]]))
        path.reverse()
        return [self.labels[p] for p in path]

    __call__ = tag


# ---------------------------------------------------------------------------
# Trainable path (same features as the reference CRF)
# ---------------------------------------------------------------------------

def word_features(words: typing.Sequence[str], i: int,
                  chunk_size: int = 3) -> typing.Tuple[str, ...]:
    """Feature keys for word ``i`` — the reference template
    (gruut/pos.py:70-156): word, lower, prefix/suffix chunks, shape flags,
    ±2 neighbors."""
    w = words[i]
    lw = w.lower()
    feats = ["bias", f"w={lw}", f"suf3={lw[-3:]}", f"suf2={lw[-2:]}",
             f"pre3={lw[:chunk_size]}",
             f"upper={w[:1].isupper()}", f"digit={w.isdigit()}"]
    if i == 0:
        feats.append("BOS")
    else:
        feats.append(f"w-1={words[i - 1].lower()}")
        if i > 1:
            feats.append(f"w-2={words[i - 2].lower()}")
    if i == len(words) - 1:
        feats.append("EOS")
    else:
        feats.append(f"w+1={words[i + 1].lower()}")
        if i < len(words) - 2:
            feats.append(f"w+2={words[i + 2].lower()}")
    return tuple(feats)


class PerceptronPOS:
    """Averaged perceptron POS tagger (same sparse-dict layout as
    :class:`gruut_ray.phonem.g2p.PerceptronG2P`)."""

    def __init__(self):
        self.weights: typing.Dict[str, typing.Dict[str, float]] = {}

    def tag(self, words: typing.Sequence[str]) -> typing.List[str]:
        out = []
        for i in range(len(words)):
            scores: typing.Dict[str, float] = {}
            for f in word_features(words, i):
                wts = self.weights.get(f)
                if wts:
                    for label, wt in wts.items():
                        scores[label] = scores.get(label, 0.0) + wt
            if not scores:
                out.append(heuristic_tags([words[i]])[0])
            else:
                out.append(max(sorted(scores), key=lambda k: scores[k]))
        return out

    @classmethod
    def train(cls, sentences: typing.Iterable[
            typing.Sequence[typing.Tuple[str, str]]], epochs: int = 5,
            ) -> "PerceptronPOS":
        """Averaged perceptron (same totals/stamps scheme as
        PerceptronG2P.train — plain last-weight perceptrons are unstable:
        one late mistake can flip tags for common words)."""
        model = cls()
        data = [list(s) for s in sentences if s]
        weights = model.weights
        totals: typing.Dict[str, typing.Dict[str, float]] = {}
        stamps: typing.Dict[str, typing.Dict[str, int]] = {}
        step = 0

        def upd(feat: str, label: str, delta: float) -> None:
            wts = weights.setdefault(feat, {})
            tot = totals.setdefault(feat, {})
            stp = stamps.setdefault(feat, {})
            cur = wts.get(label, 0.0)
            tot[label] = tot.get(label, 0.0) \
                + (step - stp.get(label, 0)) * cur
            stp[label] = step
            wts[label] = cur + delta

        for _ in range(epochs):
            for sent in data:
                step += 1
                words = [w for w, _ in sent]
                gold = [t for _, t in sent]
                pred = model.tag(words)
                for i, (p, g) in enumerate(zip(pred, gold)):
                    if p != g:
                        for f in word_features(words, i):
                            upd(f, g, +1.0)
                            upd(f, p, -1.0)

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
