#!/usr/bin/env python
"""Train a POS CRF pack end-to-end from CoNLL-U data (VERDICT r03 #5).

The reference trains its ``pos/model.crf`` with pycrfsuite over CoNLL-U
``xpos`` labels (gruut/pos.py:172-258).  pycrfsuite is unavailable
offline, so this tool trains a **structured averaged perceptron** over
the *identical* feature template (:meth:`CrfPos._word_attrs` — the
attribute strings the reference writes into its models, including the
weighted numeric ``len(word)`` attribute) plus a label-transition
matrix, then serializes the result as a genuine **crf1d binary** via
:func:`gruut_ray.phonem.crf_g2p.write_crf1d`, so the committed artifact
loads through the same :class:`CrfPos` reader path as a real gruut
pack's ``pos/model.crf``.

Training decode and :meth:`CrfPos.tag` share the same Viterbi (a live
``CrfPos`` instance over the mutable weights), so the written model
reproduces training-time predictions exactly — asserted before the
file is written.

Usage::

    python -m gruut_ray.tools.train_pos_crf \
        --conllu gruut_ray/phonem/data/pos_en.conllu \
        --output gruut_ray/phonem/models/pos_en.crf
"""

from __future__ import annotations

import argparse
import typing

import numpy as np

# Penn punctuation tags: dropped from training sequences because the
# phonemize stage tags only SPOKEN words (punctuation never reaches the
# tagger at decode time, so it must not occupy context slots in training)
_PUNCT_TAGS = {".", ",", ":", "``", "''", "-LRB-", "-RRB-", "HYPH",
               "SYM", "$", "#"}


def read_conllu(path: str, label: str = "xpos",
                ) -> typing.List[typing.List[typing.Tuple[str, str]]]:
    """Minimal CoNLL-U reader: (form, xpos) sequences, punctuation
    dropped, multi-word/elided token ids skipped (reference uses the
    ``conllu`` package, pos.py:183-196; same 10-column format)."""
    sents: typing.List[typing.List[typing.Tuple[str, str]]] = []
    cur: typing.List[typing.Tuple[str, str]] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                if cur:
                    sents.append(cur)
                    cur = []
                continue
            if line.startswith("#"):
                continue
            cols = line.split("\t")
            if len(cols) < 10 or "-" in cols[0] or "." in cols[0]:
                continue
            form = cols[1]
            tag = cols[4] if label == "xpos" else cols[3]
            if tag == "_" or tag in _PUNCT_TAGS:
                continue
            cur.append((form, tag))
    if cur:
        sents.append(cur)
    return sents


def train(sents: typing.Sequence[typing.Sequence[typing.Tuple[str, str]]],
          epochs: int = 12) -> "CrfPos":
    """Structured averaged perceptron; returns a ready CrfPos."""
    from gruut_ray.phonem.pos import CrfPos

    labels = sorted({t for s in sents for _, t in s})
    lab_id = {t: i for i, t in enumerate(labels)}
    L = len(labels)
    state: typing.Dict[str, typing.List] = {}
    trans = np.zeros((L, L), dtype=np.float64)
    model = CrfPos(labels, state, trans)
    # mutable weight stores: state[attr] is a list of [label_id, w] the
    # live model reads during training decode
    by_attr: typing.Dict[str, typing.Dict[int, typing.List]] = {}

    # averaging accumulators (perceptron totals/stamps scheme)
    s_tot: typing.Dict[typing.Tuple[str, int], float] = {}
    s_stamp: typing.Dict[typing.Tuple[str, int], int] = {}
    t_tot = np.zeros((L, L), dtype=np.float64)
    t_stamp = np.zeros((L, L), dtype=np.int64)
    step = 0

    def upd_state(attr: str, lid: int, delta: float) -> None:
        cell = by_attr.setdefault(attr, {})
        ent = cell.get(lid)
        if ent is None:
            ent = [lid, 0.0]
            cell[lid] = ent
            state.setdefault(attr, []).append(ent)
        key = (attr, lid)
        s_tot[key] = s_tot.get(key, 0.0) \
            + (step - s_stamp.get(key, 0)) * ent[1]
        s_stamp[key] = step
        ent[1] += delta

    def upd_trans(a: int, b: int, delta: float) -> None:
        t_tot[a, b] += (step - t_stamp[a, b]) * trans[a, b]
        t_stamp[a, b] = step
        trans[a, b] += delta

    data = [list(s) for s in sents if s]
    for _ in range(epochs):
        for sent in data:
            step += 1
            words = [w for w, _ in sent]
            gold = [lab_id[t] for _, t in sent]
            pred = [lab_id[t] for t in model.tag(words)]
            if pred == gold:
                continue
            for i, (p, g) in enumerate(zip(pred, gold)):
                if p != g:
                    for attr, aw in model._word_attrs(words, i):
                        if aw:
                            upd_state(attr, g, +aw)
                            upd_state(attr, p, -aw)
                if i > 0 and (pred[i - 1], p) != (gold[i - 1], g):
                    upd_trans(gold[i - 1], g, +1.0)
                    upd_trans(pred[i - 1], p, -1.0)

    # finalize averages in place
    for attr, cell in by_attr.items():
        for lid, ent in cell.items():
            key = (attr, lid)
            tot = s_tot.get(key, 0.0) \
                + (step - s_stamp.get(key, 0)) * ent[1]
            ent[1] = tot / max(1, step)
    trans[:] = (t_tot + (step - t_stamp) * trans) / max(1, step)
    # drop near-zero state entries (smaller model file)
    for attr in list(state):
        state[attr] = [e for e in state[attr] if abs(e[1]) > 1e-9]
        if not state[attr]:
            del state[attr]
    return model


def write_model(model, path: str) -> None:
    from gruut_ray.phonem.crf_g2p import write_crf1d

    attrs = sorted(model.state)
    attr_id = {a: i for i, a in enumerate(attrs)}
    state_recs = [(attr_id[a], int(lid), float(w))
                  for a in attrs for lid, w in model.state[a]]
    trans_recs = [(i, j, float(model.trans[i, j]))
                  for i in range(model.num_labels)
                  for j in range(model.num_labels)
                  if model.trans[i, j] != 0.0]
    write_crf1d(path, model.labels, attrs, state_recs, trans_recs)


def main(argv=None) -> int:
    from gruut_ray.phonem.pos import CrfPos

    ap = argparse.ArgumentParser()
    ap.add_argument("--conllu", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--label", default="xpos")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--holdout", type=int, default=0,
                    help="hold out every k-th sentence for eval (0=none)")
    args = ap.parse_args(argv)

    sents = read_conllu(args.conllu, label=args.label)
    if args.holdout > 1:
        test = sents[::args.holdout]
        train_sents = [s for i, s in enumerate(sents)
                       if i % args.holdout != 0]
    else:
        test, train_sents = [], sents

    model = train(train_sents, epochs=args.epochs)
    write_model(model, args.output)

    # round-trip: the written binary must reproduce the live model
    loaded = CrfPos.load(args.output)
    n_tok = n_ok = 0
    for sent in train_sents:
        words = [w for w, _ in sent]
        assert loaded.tag(words) == model.tag(words), words
        for p, (_, g) in zip(loaded.tag(words), sent):
            n_tok += 1
            n_ok += p == g
    print(f"train accuracy {n_ok}/{n_tok} = {n_ok / max(1, n_tok):.4f}")
    if test:
        h_tok = h_ok = 0
        for sent in test:
            for p, (_, g) in zip(loaded.tag([w for w, _ in sent]), sent):
                h_tok += 1
                h_ok += p == g
        print(f"held-out accuracy {h_ok}/{h_tok} = "
              f"{h_ok / max(1, h_tok):.4f}")
    print(f"wrote {args.output}: {len(loaded.labels)} labels, "
          f"{len(loaded.state)} attributes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
