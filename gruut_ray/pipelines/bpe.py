"""BPE tokenizer-vocabulary induction over a document corpus.

The standard LLM-training-data operator the reference has no analog
for: learn byte-pair-encoding merges from the corpus (Sennrich et al.
2016, arXiv:1508.07909 — the algorithm every GPT/Llama tokenizer
trainer implements), then encode documents with the learned merges.

Scale shape
-----------
Training never moves documents: one ``map_batches`` pass emits
per-batch (word, count) partials through the GPT-2-style pretokenizer
regex, a distributed groupby sums them, and a bottom-k-by-count-desc
reduce (``agg_util.topk_reduce``) caps the table at ``max_words``
distinct words before it reaches the driver — the same
word-frequency-sketch cut every production BPE trainer makes (HF
tokenizers samples similarly; merges learned from the top ~100k word
shapes are indistinguishable because pair counts are dominated by
frequent words).  The merge loop itself is a driver-side iteration
over that ≤ max_words table: each round counts adjacent symbol pairs
weighted by word frequency (pure dict arithmetic over ≤ max_words
rows), merges the argmax pair (count desc, then lexicographic — fully
deterministic), and repeats.  Encoding broadcasts the merge-rank dict
once via ``ray.put``; each batch applies merges per word with the
classic lowest-rank-first loop.

Determinism: word counts are exact integers, ties break
lexicographically, and the word-table cap uses (count desc, word asc)
ordering — the learned merge list is a pure function of the corpus.
"""

from __future__ import annotations

import re
import typing

import pandas as pd
import pyarrow as pa

if typing.TYPE_CHECKING:
    import ray.data

# GPT-2-style pretokenizer (the RE2-safe variant used by
# bpe_tokens_by_source; public knowledge)
PRETOKEN_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[0-9A-Za-z_]+| ?[^\s0-9A-Za-z_]+|\s+")

END = "</w>"  # end-of-word marker (Sennrich's convention)


def _word_symbols(word: str) -> typing.Tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + END,)


def learn_bpe(word_counts: typing.Mapping[str, int],
              num_merges: int) -> typing.List[typing.Tuple[str, str]]:
    """Driver-side merge loop over a word-frequency table (≤ max_words
    rows — see module docstring for why this is not a scale problem)."""
    vocab: typing.Dict[typing.Tuple[str, ...], int] = {
        _word_symbols(w): c for w, c in word_counts.items() if w}
    merges: typing.List[typing.Tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: typing.Dict[typing.Tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:  # nothing repeats: further merges are noise
            break
        (a, b), _n = best
        merges.append((a, b))
        merged = a + b
        new_vocab: typing.Dict[typing.Tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: typing.List[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: typing.Mapping[typing.Tuple[str, str],
                                                 int],
                ) -> typing.List[str]:
    """Classic lowest-rank-first merge application (one word)."""
    syms = list(_word_symbols(word)) if word else []
    while len(syms) > 1:
        best_i = -1
        best_rank = None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_i < 0:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def count_words(ds: "ray.data.Dataset", text_col: str = "text",
                max_words: int = 100_000) -> pd.DataFrame:
    """Distributed word-frequency table, capped at ``max_words`` rows
    via the bounded top-k reduce (count desc, word asc)."""
    from ray.data.aggregate import Sum

    from gruut_ray.pipelines.agg_util import topk_reduce

    def partials(batch: pa.Table) -> pa.Table:
        counts: typing.Dict[str, int] = {}
        for text in batch.column(text_col).to_pylist():
            for tok in PRETOKEN_RE.findall(text or ""):
                tok = tok.strip()
                if tok:
                    counts[tok] = counts.get(tok, 0) + 1
        return pa.table({
            "word": pa.array(list(counts), type=pa.string()),
            "n": pa.array(list(counts.values()), type=pa.int64()),
        })

    word_counts = (ds.select_columns([text_col])
                   .map_batches(partials, batch_format="pyarrow")
                   .groupby("word")
                   .aggregate(Sum("n", alias_name="n")))
    top = topk_reduce(word_counts, max_words, by=["n", "word"],
                      ascending=[False, True])
    return top


def bpe_train(ds: "ray.data.Dataset", text_col: str = "text",
              num_merges: int = 200, max_words: int = 100_000,
              ) -> typing.List[typing.Tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus (see module
    docstring for the distributed plan)."""
    top = count_words(ds, text_col=text_col, max_words=max_words)
    return learn_bpe(dict(zip(top["word"], top["n"].astype(int))),
                     num_merges)


def bpe_encode_stats(ds: "ray.data.Dataset",
                     merges: typing.Sequence[typing.Tuple[str, str]],
                     text_col: str = "text",
                     id_col: str = "doc_id") -> "ray.data.Dataset":
    """Per-doc (n_pretokens, n_bpe_tokens) under the learned merges —
    the compression the vocabulary buys.  Merge ranks broadcast once."""
    import ray

    ranks_ref = ray.put({tuple(m): i for i, m in enumerate(merges)})

    def encode(batch: pa.Table, _cache={}) -> pa.Table:
        ranks = _cache.get(ranks_ref)
        if ranks is None:
            _cache.clear()
            ranks = _cache[ranks_ref] = ray.get(ranks_ref)
        ids = batch.column(id_col)
        n_pre: typing.List[int] = []
        n_bpe: typing.List[int] = []
        word_cache: typing.Dict[str, int] = {}
        for text in batch.column(text_col).to_pylist():
            words = [t.strip() for t in PRETOKEN_RE.findall(text or "")]
            words = [w for w in words if w]
            total = 0
            for w in words:
                n = word_cache.get(w)
                if n is None:
                    n = word_cache[w] = len(encode_word(w, ranks))
                total += n
            n_pre.append(len(words))
            n_bpe.append(total)
        return pa.table({
            id_col: ids,
            "n_pretokens": pa.array(n_pre, type=pa.int64()),
            "n_bpe_tokens": pa.array(n_bpe, type=pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        encode, batch_format="pyarrow")


def bpe_vocab_summary(ds: "ray.data.Dataset", text_col: str = "text",
                      id_col: str = "doc_id", num_merges: int = 200,
                      max_words: int = 100_000) -> pd.DataFrame:
    """Train + encode in one call: merge count, vocabulary compression
    ratio and token totals over the corpus (the queries() entry)."""
    merges = bpe_train(ds, text_col=text_col, num_merges=num_merges,
                       max_words=max_words)
    stats = bpe_encode_stats(ds, merges, text_col=text_col,
                             id_col=id_col).to_pandas()
    n_pre = int(stats["n_pretokens"].sum())
    n_bpe = int(stats["n_bpe_tokens"].sum())
    return pd.DataFrame({
        "n_merges": [len(merges)],
        "n_docs": [len(stats)],
        "n_pretokens": [n_pre],
        "n_bpe_tokens": [n_bpe],
        # exact integer ratio ×1e6 (hash-stable, no float formatting)
        "tokens_per_pretoken_ppm": [n_bpe * 1_000_000 // max(n_pre, 1)],
    })
