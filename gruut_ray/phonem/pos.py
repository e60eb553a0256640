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
