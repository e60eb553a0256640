"""Unigram-LM tokenizer induction (SentencePiece's unigram model,
Kudo 2018, arXiv:1804.10959) — the EM-trained sibling of ``bpe.py``'s
merge-based vocabulary.

Distributed plan (same shape as BPE — reference scale argument in
``bpe.py``'s module docstring): ONE corpus scan builds the word-
frequency table, capped at ``max_words`` rows by the bounded top-k
reduce, so documents never move again; seed-vocabulary extraction, the
EM lattice passes, and pruning all run on that capped table only
(driver-side, deterministic — the table is exact integers with a
deterministic tie-break, so the whole fit is partition-invariant);
the final Viterbi encode is a distributed ``map_batches`` pass with
the piece table broadcast once via ``ray.put``.
"""

from __future__ import annotations

import math
import typing

import numpy as np
import pandas as pd
import pyarrow as pa

from gruut_ray.pipelines.bpe import PRETOKEN_RE, count_words

if typing.TYPE_CHECKING:
    import ray.data

_NEG_INF = -1e30


def _seed_vocab(word_counts: typing.Mapping[str, int],
                max_piece_len: int = 6,
                seed_size: int = 2000) -> typing.Dict[str, float]:
    """Initial piece set: all single characters (mandatory, never
    pruned) plus the ``seed_size`` highest-score substrings
    (count · len, the SentencePiece seed heuristic), with log-probs
    initialised from the substring counts."""
    sub_counts: typing.Dict[str, int] = {}
    chars: typing.Set[str] = set()
    for w, c in word_counts.items():
        chars.update(w)
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(n, i + max_piece_len) + 1):
                s = w[i:j]
                sub_counts[s] = sub_counts.get(s, 0) + c
    multi = sorted(
        ((s, c) for s, c in sub_counts.items() if len(s) > 1),
        key=lambda kv: (-kv[1] * len(kv[0]), kv[0]))[:seed_size]
    pieces = {c: float(sub_counts.get(c, 1)) for c in sorted(chars)}
    pieces.update({s: float(c) for s, c in multi})
    total = sum(pieces.values())
    return {s: math.log(v / total) for s, v in pieces.items()}


def _lattice_edges(word: str, vocab: typing.Mapping[str, float],
                   max_piece_len: int) -> typing.List[
                       typing.List[typing.Tuple[int, str, float]]]:
    """edges[i] = [(j, piece, logp)] for pieces spanning [i, j)."""
    n = len(word)
    edges: typing.List[typing.List[typing.Tuple[int, str, float]]] = \
        [[] for _ in range(n)]
    for i in range(n):
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            p = word[i:j]
            lp = vocab.get(p)
            if lp is not None:
                edges[i].append((j, p, lp))
    return edges


def _forward_backward(word: str, count: int,
                      vocab: typing.Mapping[str, float],
                      expected: typing.Dict[str, float],
                      max_piece_len: int) -> float:
    """Accumulate ``count``-weighted expected piece usages over ALL
    segmentations of ``word`` (sum-product lattice); returns the
    word's log marginal likelihood (0.0 contribution skipped if the
    word is unsegmentable, which cannot happen while single chars stay
    in the vocab)."""
    n = len(word)
    edges = _lattice_edges(word, vocab, max_piece_len)
    alpha = np.full(n + 1, _NEG_INF)
    alpha[0] = 0.0
    for i in range(n):
        if alpha[i] <= _NEG_INF / 2:
            continue
        for j, _, lp in edges[i]:
            v = alpha[i] + lp
            alpha[j] = v if alpha[j] <= _NEG_INF / 2 else \
                np.logaddexp(alpha[j], v)
    if alpha[n] <= _NEG_INF / 2:
        return 0.0
    beta = np.full(n + 1, _NEG_INF)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        for j, _, lp in edges[i]:
            if beta[j] <= _NEG_INF / 2:
                continue
            v = lp + beta[j]
            beta[i] = v if beta[i] <= _NEG_INF / 2 else \
                np.logaddexp(beta[i], v)
    z = alpha[n]
    for i in range(n):
        if alpha[i] <= _NEG_INF / 2:
            continue
        for j, p, lp in edges[i]:
            if beta[j] <= _NEG_INF / 2:
                continue
            post = math.exp(alpha[i] + lp + beta[j] - z)
            expected[p] = expected.get(p, 0.0) + count * post
    return count * float(z)


def viterbi_encode(word: str, vocab: typing.Mapping[str, float],
                   max_piece_len: int = 6) -> typing.List[str]:
    """Most-likely segmentation (ties break toward LONGER first piece,
    deterministically)."""
    n = len(word)
    edges = _lattice_edges(word, vocab, max_piece_len)
    best = np.full(n + 1, _NEG_INF)
    back: typing.List[typing.Optional[typing.Tuple[int, str]]] = \
        [None] * (n + 1)
    best[0] = 0.0
    for i in range(n):
        if best[i] <= _NEG_INF / 2:
            continue
        for j, p, lp in edges[i]:
            v = best[i] + lp
            if v > best[j] + 1e-12:
                best[j] = v
                back[j] = (i, p)
    if back[n] is None:
        return list(word)  # unreachable while single chars remain
    out: typing.List[str] = []
    j = n
    while j > 0:
        i, p = back[j]  # type: ignore[misc]
        out.append(p)
        j = i
    return out[::-1]


def unigram_train(word_counts: typing.Mapping[str, int],
                  vocab_size: int = 400,
                  max_piece_len: int = 6,
                  seed_size: int = 2000,
                  em_iters: int = 2,
                  shrink_factor: float = 0.75
                  ) -> typing.Dict[str, float]:
    """EM + prune loop over the capped word table (driver-side by
    design — see module docstring).  Between prune rounds, ``em_iters``
    full EM sweeps re-estimate piece log-probs; pruning keeps the top
    ``shrink_factor`` fraction by expected count (single characters
    are never pruned) until ``vocab_size`` is reached."""
    vocab = _seed_vocab(word_counts, max_piece_len, seed_size)
    chars = {s for s in vocab if len(s) == 1}
    while True:
        for _ in range(em_iters):
            expected: typing.Dict[str, float] = {}
            for w, c in word_counts.items():
                _forward_backward(w, c, vocab, expected, max_piece_len)
            total = sum(expected.values())
            if total <= 0:
                break
            floor = math.log(1e-12)
            vocab = {s: max(math.log(e / total), floor)
                     for s, e in expected.items() if e > 0}
            for ch in chars:  # chars always survive
                vocab.setdefault(ch, floor)
        if len(vocab) <= vocab_size:
            break
        keep = max(vocab_size, int(len(vocab) * shrink_factor))
        multi = sorted(((s, lp) for s, lp in vocab.items()
                        if len(s) > 1),
                       key=lambda kv: (-kv[1], kv[0]))
        n_multi = max(0, keep - len(chars))
        vocab = {s: lp for s, lp in multi[:n_multi]}
        for ch in chars:
            vocab[ch] = min(0.0, vocab.get(ch, math.log(1e-12)))
        if len(vocab) <= vocab_size:
            # one final EM pass to re-normalise the pruned vocab
            expected = {}
            for w, c in word_counts.items():
                _forward_backward(w, c, vocab, expected, max_piece_len)
            total = sum(expected.values())
            if total > 0:
                floor = math.log(1e-12)
                vocab = {s: max(math.log(e / total), floor)
                         for s, e in expected.items() if e > 0}
                for ch in chars:
                    vocab.setdefault(ch, floor)
            break
    return vocab


def unigram_encode_stats(ds: "ray.data.Dataset",
                         vocab: typing.Mapping[str, float],
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         max_piece_len: int = 6) -> "ray.data.Dataset":
    """Per-doc (n_pretokens, n_unigram_tokens) under the learned
    vocabulary — Viterbi per distinct word, piece table broadcast
    once, per-batch word cache (mirror of ``bpe_encode_stats``)."""
    import ray

    vocab_ref = ray.put(dict(vocab))

    def encode(batch: pa.Table, _cache={}) -> pa.Table:
        v = _cache.get(vocab_ref)
        if v is None:
            _cache.clear()
            v = _cache[vocab_ref] = ray.get(vocab_ref)
        ids = batch.column(id_col)
        n_pre: typing.List[int] = []
        n_uni: typing.List[int] = []
        word_cache: typing.Dict[str, int] = {}
        for text in batch.column(text_col).to_pylist():
            words = [t.strip() for t in PRETOKEN_RE.findall(text or "")]
            words = [w for w in words if w]
            total = 0
            for w in words:
                n = word_cache.get(w)
                if n is None:
                    n = word_cache[w] = len(
                        viterbi_encode(w, v, max_piece_len))
                total += n
            n_pre.append(len(words))
            n_uni.append(total)
        return pa.table({
            id_col: ids,
            "n_pretokens": pa.array(n_pre, type=pa.int64()),
            "n_unigram_tokens": pa.array(n_uni, type=pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        encode, batch_format="pyarrow")


def unigram_vocab_summary(ds: "ray.data.Dataset",
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          vocab_size: int = 400,
                          max_words: int = 100_000) -> pd.DataFrame:
    """Train + encode in one call (the queries() entry): vocabulary
    size, corpus token totals, and the exact-integer compression
    ratio."""
    top = count_words(ds, text_col=text_col, max_words=max_words)
    vocab = unigram_train(dict(zip(top["word"],
                                   top["n"].astype(int))),
                          vocab_size=vocab_size)
    stats = unigram_encode_stats(ds, vocab, text_col=text_col,
                                 id_col=id_col).to_pandas()
    n_pre = int(stats["n_pretokens"].sum())
    n_uni = int(stats["n_unigram_tokens"].sum())
    return pd.DataFrame({
        "vocab_size": [len(vocab)],
        "n_docs": [len(stats)],
        "n_pretokens": [n_pre],
        "n_unigram_tokens": [n_uni],
        "tokens_per_pretoken_ppm": [n_uni * 1_000_000 // max(n_pre, 1)],
    })
