"""``python -m gruut_ray.tools.g2p {train,predict,test}`` — G2P model CLI.

Mirrors the reference's ``python -m gruut.g2p`` surface (gruut/g2p.py:
164-453) with the from-scratch perceptron model: ``train`` consumes a
Phonetisaurus-aligned corpus (one alignment string per line, the format in
gruut lexicon DBs' ``g2p_alignments`` table, e.g. ``a|a}aː c|h}χ t}t``);
``predict`` prints ``word phoneme phoneme ...``; ``test`` reports phoneme
error rate on a ``word phonemes...`` lexicon like the reference's PER
harness (gruut/g2p.py:301-365).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from gruut_ray.phonem.g2p import PerceptronG2P


def _levenshtein(a, b) -> int:
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="gruut_ray.tools.g2p")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train")
    p_train.add_argument("--corpus", required=True,
                         help="Aligned corpus (one alignment per line)")
    p_train.add_argument("--output", required=True, help="Model JSON output")
    p_train.add_argument("--epochs", type=int, default=5)

    p_pred = sub.add_parser("predict")
    p_pred.add_argument("--model", required=True)
    p_pred.add_argument("texts", nargs="*", help="Words (default: stdin)")

    p_test = sub.add_parser("test")
    p_test.add_argument("--model", required=True)
    p_test.add_argument("--lexicon", required=True,
                        help="word phoneme phoneme ... per line")

    args = parser.parse_args(argv)

    if args.command == "train":
        with open(args.corpus, encoding="utf-8") as f:
            alignments = [line.strip() for line in f if line.strip()]
        model = PerceptronG2P.train_from_alignments(alignments,
                                                    epochs=args.epochs)
        with open(args.output, "w", encoding="utf-8") as f:
            json.dump(model.to_dict(), f, ensure_ascii=False)
        print(f"trained on {len(alignments)} alignments -> {args.output}",
              file=sys.stderr)
        return 0

    with open(args.model, encoding="utf-8") as f:
        model = PerceptronG2P.from_dict(json.load(f))

    if args.command == "predict":
        words = args.texts or [w.strip() for w in sys.stdin if w.strip()]
        for word in words:
            print(word, " ".join(model(word)))
        return 0

    # test: phoneme error rate (reference gruut/g2p.py:342-362)
    n_phonemes = n_errors = n_words = 0
    start = time.perf_counter()
    with open(args.lexicon, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue
            word, expected = parts[0], parts[1:]
            actual = list(model(word))
            n_errors += _levenshtein(expected, actual)
            n_phonemes += len(expected)
            n_words += 1
    elapsed = time.perf_counter() - start
    per = n_errors / n_phonemes if n_phonemes else 0.0
    wps = n_words / elapsed if elapsed else 0.0
    print(f"PER: {per:.4f} ({n_errors}/{n_phonemes}), "
          f"words/sec: {wps:.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
