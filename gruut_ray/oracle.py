"""Single-threaded pure-Python oracle for the quality filter.

Produces the "reference labels" of FIXTURES.md §F5: one row per document with
keep/drop, drop_reason, scrubbed text and counters, computed sequentially
with NO Ray involvement.  The Ray pipeline must reproduce these at F1≥0.99
(it shares the same pure scoring functions, so the check verifies the
distributed plumbing: batching, actor pooling, partitioning, ordering).
"""

from __future__ import annotations

import typing

from gruut_ray.quality.heuristics import DEFAULT_THRESHOLDS, score_document
from gruut_ray.quality.langid import LangIdModel
from gruut_ray.quality.ngram_lm import PerplexityScorer
from gruut_ray.stages.quality import LangIdStage


def oracle_labels(
    rows: typing.Iterable[typing.Dict[str, typing.Any]],
    text_key: str = "text",
    id_key: str = "url",
    use_langid: bool = True,
    use_ppl: bool = True,
) -> typing.List[typing.Dict[str, typing.Any]]:
    """rows: dicts with at least ``text``.  Returns label records."""
    langid = LangIdModel() if use_langid else None
    scorer = PerplexityScorer() if use_ppl else None
    out = []
    for row in rows:
        text = row.get(text_key) or ""
        if langid is not None:
            langs, scores = langid.predict([text])
            lang = LangIdStage._short(langs[0])
            lang_score = float(scores[0])
        else:
            lang = row.get("lang", "en")
            lang_score = 1.0
        rec = score_document(
            text, lang or "en",
            ppl_fn=scorer.perplexity if scorer else None,
            lang_score=lang_score, th=DEFAULT_THRESHOLDS)
        rec[id_key] = row.get(id_key)
        rec["lang_id"] = lang
        out.append(rec)
    return out


def f1_keep_drop(oracle: typing.Sequence[dict], engine: typing.Sequence[dict],
                 id_key: str = "url") -> float:
    """F1 of the engine's keep decision vs oracle labels, joined on id."""
    oracle_by_id = {r[id_key]: bool(r["keep"]) for r in oracle}
    tp = fp = fn = 0
    for r in engine:
        truth = oracle_by_id.get(r[id_key])
        if truth is None:
            continue
        pred = bool(r["keep"])
        if pred and truth:
            tp += 1
        elif pred and not truth:
            fp += 1
        elif truth and not pred:
            fn += 1
    if tp == 0:
        return 0.0
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    return 2 * precision * recall / (precision + recall)
