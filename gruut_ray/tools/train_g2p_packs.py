"""Train perceptron G2P models for languages whose gruut data packs ship
alignments but no IPA ``model.crf`` (cs, nl in the reference checkout).

``python -m gruut_ray.tools.train_g2p_packs [--langs cs,nl] [--epochs 5]``

Reads ``g2p_alignments`` from each pack's lexicon.db (written by
gruut/corpus2db.py:10-66), trains
:class:`~gruut_ray.phonem.g2p.PerceptronG2P` with the reference feature
template, reports held-out phoneme error rate, and writes
``gruut_ray/phonem/models/<lang>_g2p.json.gz`` — the committed artifacts
:func:`gruut_ray.phonem.packs.load_perceptron_model` loads at runtime.
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import time

from gruut_ray.phonem import packs
from gruut_ray.phonem.g2p import (EPS_PHONEME, PHONEME_JOIN, PerceptronG2P,
                                  alignment_to_labels)


def _gold_phonemes(labels):
    out = []
    for label in labels:
        out.extend(p for p in label.split(PHONEME_JOIN)
                   if p and p != EPS_PHONEME)
    return out


def _levenshtein(a, b) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def train_language(lang: str, lexicon_db: str, out_dir: str,
                   epochs: int = 5, holdout: int = 1000) -> dict:
    aligns = packs.read_alignments(lexicon_db)
    examples = [e for e in (alignment_to_labels(a) for a in aligns) if e]
    if not examples:
        return {"lang": lang, "skipped": "no alignments"}
    # deterministic split: every k-th example held out
    k = max(2, len(examples) // max(1, holdout))
    test = examples[::k][:holdout]
    test_words = {w for w, _ in test}
    train = [e for e in examples if e[0] not in test_words]

    t0 = time.time()
    model = PerceptronG2P.train(train, epochs=epochs)
    train_sec = time.time() - t0

    errs = tot = 0
    for word, labels in test:
        gold = _gold_phonemes(labels)
        pred = list(model(word))
        errs += _levenshtein(pred, gold)
        tot += len(gold)
    per = errs / max(1, tot)

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{lang}_g2p.json.gz")
    with gzip.open(path, "wt", encoding="utf-8") as f:
        json.dump(model.to_dict(), f, ensure_ascii=False)
    return {"lang": lang, "n_train": len(train), "n_test": len(test),
            "epochs": epochs, "train_sec": round(train_sec, 1),
            "per": round(per, 4), "model": path,
            "size_kb": os.path.getsize(path) // 1024}


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="gruut_ray.tools.train_g2p_packs")
    parser.add_argument("--langs", default=None,
                        help="comma-separated short langs (default: every "
                             "pack with alignments but no IPA model.crf)")
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--out-dir", default=os.path.join(
        os.path.dirname(packs.__file__), "models"))
    args = parser.parse_args(argv)

    found = packs.discover()
    wanted = args.langs.split(",") if args.langs else None
    for lang, pack in sorted(found.items()):
        if wanted is not None and lang not in wanted:
            continue
        if not pack.lexicon_db:
            continue
        if wanted is None and pack.crf_model:
            continue  # pack has a real CRF model; no perceptron needed
        stats = train_language(lang, pack.lexicon_db, args.out_dir,
                               epochs=args.epochs)
        print(json.dumps(stats, ensure_ascii=False))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
