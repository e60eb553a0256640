"""Distributed distillation of the quality filter into a linear scorer.

The production pattern behind FineWeb-Edu-style filters: distill the
expensive rule/model ensemble into one cheap linear classifier, then
run THAT at full-corpus scale.  Here the teacher is the engine's own
rule-based quality filter (keep/drop labels, recomputed in-stream —
labels never materialize); the student is logistic regression over
cheap features that need NO normalizer pass: hashed lowercase word
frequencies (fastText-supervised shape) plus repetition / stopword /
shape ratios from a plain whitespace split.

Scale shape — IRLS (Newton) with scatter partials: each of the ~8
rounds broadcasts the weight vector, one ``map_batches`` pass emits
every batch's EXACT (Hessian, gradient, loss) contribution as one
fixed-size blob (d ≈ 264 → ~560 KB), and a two-level tree reduce sums
the blobs so the driver receives ONE — never blocks × blob.  Newton
converges in single-digit passes where plain gradient descent needs
hundreds of corpus scans (measured: 0.64 majority-collapse after 300
GD rounds vs 0.978 agreement after 8 IRLS rounds), which is the whole
game when one round = one full corpus scan.
"""

from __future__ import annotations

import typing

import numpy as np
import pandas as pd
import pyarrow as pa

if typing.TYPE_CHECKING:
    import ray.data

HASH_BITS = 8  # 256 hashed word buckets + 8 ratio features


_BUCKET_CACHE: typing.Dict[str, int] = {}


def _word_bucket(word: str, dim: int) -> int:
    # md5 keeps buckets deterministic across processes; the per-worker
    # memo exploits the Zipfian vocabulary (most words repeat) — 9
    # corpus scans (8 IRLS + eval) would otherwise re-hash every token.
    # Single dim in practice (HASH_BITS); cleared if a second dim shows
    # up or the vocab outgrows the bound.
    b = _BUCKET_CACHE.get(word)
    if b is None:
        import hashlib

        if len(_BUCKET_CACHE) >= (1 << 20):
            _BUCKET_CACHE.clear()
        h = int(hashlib.md5(word.encode()).hexdigest()[:8], 16)
        _BUCKET_CACHE[word] = b = h
    return b & (dim - 1)


def doc_features(text: str, lang: str, bits: int = HASH_BITS,
                 ) -> np.ndarray:
    """Cheap per-doc features (no normalizer): hashed word-frequency
    profile + unique/top-word/stopword/shape ratios.  Pure function
    shared verbatim by the trainer and the scorer."""
    from collections import Counter

    from gruut_ray.profiles import get_compiled

    dim = 1 << bits
    v = np.zeros(dim + 8, dtype=np.float64)
    tt = (text or "")[:4000]
    words = tt.lower().split()
    cp = get_compiled(lang or "en")
    stop = cp.stopwords or set()
    if words:
        idx = np.fromiter((_word_bucket(w, dim) for w in words),
                          dtype=np.int64, count=len(words))
        v[:dim] = np.bincount(idx, minlength=dim) / len(words)
        v[dim + 0] = len(set(words)) / len(words)
        v[dim + 1] = Counter(words).most_common(1)[0][1] / len(words)
        v[dim + 2] = (sum(1 for w in words if w in stop) / len(words)) \
            if stop else -1.0
        v[dim + 3] = np.log1p(len(words)) / 3.0
        v[dim + 4] = (sum(len(w) for w in words) / len(words)) / 5.0
    v[dim + 5] = np.log1p(len(tt)) / 3.0
    v[dim + 6] = 1.0 if stop else 0.0
    v[dim + 7] = 1.0  # bias
    return v


def _features_and_labels(batch: pa.Table, text_col: str, bits: int,
                         ) -> typing.Tuple[np.ndarray, np.ndarray]:
    from gruut_ray.quality.heuristics import score_document

    texts = batch.column(text_col).to_pylist()
    langs = batch.column("lang").to_pylist() \
        if "lang" in batch.column_names else ["en"] * batch.num_rows
    X = np.stack([doc_features(t, lang, bits)
                  for t, lang in zip(texts, langs)])
    y = np.fromiter(
        (1.0 if score_document(t or "", lang or "en")["keep"] else 0.0
         for t, lang in zip(texts, langs)),
        dtype=np.float64, count=len(texts))
    return X, y


def _sum_blob_reduce(parts: "ray.data.Dataset", nbytes_cols,
                     width: int = 32) -> dict:
    """Tree-reduce a dataset of fixed-size float64 blobs by summing —
    the driver receives one row (same two-level shape as topk_reduce)."""

    def reduce_block(batch: pa.Table) -> pa.Table:
        out = {}
        for col in nbytes_cols:
            total = None
            for blob in batch.column(col).to_pylist():
                arr = np.frombuffer(blob, dtype=np.float64)
                total = arr.copy() if total is None else total + arr
            out[col] = pa.array([total.tobytes()], type=pa.binary())
        return pa.table(out)

    level1 = parts.repartition(width).map_batches(
        reduce_block, batch_format="pyarrow", batch_size=None)
    final = level1.repartition(1).map_batches(
        reduce_block, batch_format="pyarrow", batch_size=None).to_pandas()
    return {col: np.frombuffer(final[col].iloc[0], dtype=np.float64)
            for col in nbytes_cols}


def train_quality_classifier(
        ds: "ray.data.Dataset", text_col: str = "text",
        iters: int = 8, l2: float = 1e-3,
        bits: int = HASH_BITS, num_blocks: int = 64) -> np.ndarray:
    """Distill the rule-based filter into logistic-regression weights
    by distributed IRLS (see module docstring).

    The slim (text, lang) projection is repartitioned and materialized
    ONCE, then every Newton round scans the object-store copy: the
    source (often one parquet file → 1-2 blocks) would otherwise cap
    each of the ~8 scans at 1-2 tasks AND re-read the file per round —
    measured ~25 s → ~10 s on the sf0.1 suite entry."""
    import ray

    dim = (1 << bits) + 8
    w = np.zeros(dim, dtype=np.float64)
    cols = [c for c in (text_col, "lang")]
    ds = ds.select_columns(cols).repartition(num_blocks).materialize()

    for _ in range(iters):
        w_ref = ray.put(w)

        def newton_partials(batch: pa.Table, _cache={}) -> pa.Table:
            wt = _cache.get(w_ref)
            if wt is None:
                _cache.clear()
                wt = _cache[w_ref] = ray.get(w_ref)
            X, y = _features_and_labels(batch, text_col, bits)
            z = np.clip(X @ wt, -30, 30)
            p = 1.0 / (1.0 + np.exp(-z))
            wgt = np.maximum(p * (1 - p), 1e-6)
            H = (X * wgt[:, None]).T @ X          # (d, d)
            g = X.T @ (y - p)                     # (d,)
            return pa.table({
                "H": pa.array([H.tobytes()], type=pa.binary()),
                "g": pa.array([g.tobytes()], type=pa.binary()),
            })

        parts = ds.map_batches(newton_partials, batch_format="pyarrow")
        tot = _sum_blob_reduce(parts, ["H", "g"])
        H = tot["H"].reshape(dim, dim) + l2 * np.eye(dim)
        g = tot["g"] - l2 * w
        w = w + np.linalg.solve(H, g)
    return w


def score_with_classifier(ds: "ray.data.Dataset", weights: np.ndarray,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          bits: int = HASH_BITS) -> "ray.data.Dataset":
    """Per-doc student probability + prediction (broadcast weights)."""
    import ray

    w_ref = ray.put(np.asarray(weights, dtype=np.float64))

    def score(batch: pa.Table, _cache={}) -> pa.Table:
        wt = _cache.get(w_ref)
        if wt is None:
            _cache.clear()
            wt = _cache[w_ref] = ray.get(w_ref)
        texts = batch.column(text_col).to_pylist()
        langs = batch.column("lang").to_pylist() \
            if "lang" in batch.column_names else ["en"] * batch.num_rows
        X = np.stack([doc_features(t, lang, bits)
                      for t, lang in zip(texts, langs)])
        p = 1.0 / (1.0 + np.exp(-np.clip(X @ wt, -30, 30)))
        return pa.table({
            id_col: batch.column(id_col),
            "p_keep": pa.array(p, type=pa.float64()),
            "pred_keep": pa.array(p >= 0.5, type=pa.bool_()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def distill_quality_classifier(ds: "ray.data.Dataset",
                               text_col: str = "text",
                               id_col: str = "doc_id",
                               iters: int = 8,
                               num_blocks: int = 64) -> pd.DataFrame:
    """Train + evaluate: student-vs-teacher confusion counts (the
    queries() entry).  Teacher labels recompute in the evaluation scan;
    nothing materializes but the final counters."""

    w = train_quality_classifier(ds, text_col=text_col, iters=iters,
                                 num_blocks=num_blocks)
    import ray

    w_ref = ray.put(w)
    bits = HASH_BITS

    def eval_partials(batch: pa.Table, _cache={}) -> pa.Table:
        wt = _cache.get(w_ref)
        if wt is None:
            _cache.clear()
            wt = _cache[w_ref] = ray.get(w_ref)
        X, y = _features_and_labels(batch, text_col, bits)
        pred = (X @ wt) > 0
        truth = y > 0.5
        return pa.table({
            "tp": pa.array([int((pred & truth).sum())], pa.int64()),
            "tn": pa.array([int((~pred & ~truth).sum())], pa.int64()),
            "fp": pa.array([int((pred & ~truth).sum())], pa.int64()),
            "fn": pa.array([int((~pred & truth).sum())], pa.int64()),
        })

    parts = ds.select_columns([text_col, "lang"]) \
        .repartition(num_blocks) \
        .map_batches(eval_partials, batch_format="pyarrow").to_pandas()
    tp, tn = int(parts["tp"].sum()), int(parts["tn"].sum())
    fp, fn = int(parts["fp"].sum()), int(parts["fn"].sum())
    n = tp + tn + fp + fn
    return pd.DataFrame({
        "n_docs": [n], "tp": [tp], "tn": [tn], "fp": [fp], "fn": [fn],
        "agreement_ppm": [(tp + tn) * 1_000_000 // max(n, 1)],
    })
