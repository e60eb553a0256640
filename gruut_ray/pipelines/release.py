"""The composed training-data RELEASE pipeline (capstone composition).

``cc_end_to_end`` covers the ingest side (policy → extract → quality);
this covers the release side every LLM data team runs before training:

    quality filter → exact dedup → benchmark decontamination →
    source-weighted mixture sampling → FFD packing stats →
    WebDataset shard export (+ manifest)

Every stage is the production operator from its own module — this file
only composes them and accounts for survivors.

Scale notes: quality and decontamination are pure streaming filters
(the benchmark gram set broadcasts once); the ONLY shuffle is exact
dedup's content-hash groupby; mixture sampling is a deterministic
per-row hash filter; the shard writer is a native Datasink.  The
``materialize()`` calls pin the *filtered* survivor sets — each stage
boundary is also the natural resume point of a release job, and the
alternative (flag columns + one plan) would ship every dropped doc
through the dedup shuffle."""

from __future__ import annotations

import typing

import pandas as pd
import pyarrow as pa

if typing.TYPE_CHECKING:
    import ray.data


def build_training_shards(
    docs: "ray.data.Dataset",
    benchmark: "ray.data.Dataset",
    rates: typing.Mapping[str, float],
    out_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    contamination_n: int = 5,
    max_hit_frac: float = 0.5,
    seq_len: int = 512,
    rows_per_shard: int = 2000,
    default_rate: float = 1.0,
    use_ppl: bool = False,
) -> pd.DataFrame:
    """Run the full release flow; returns the stage-by-stage summary."""
    import numpy as np
    import ray

    from gruut_ray.pipelines.contamination import _gram_hashes
    from gruut_ray.pipelines.dedup import exact_dedup
    from gruut_ray.pipelines.mixing import mixture_sample, pack_sequences
    from gruut_ray.pipelines.quality_filter import quality_filter
    from gruut_ray.sources.webdataset import write_webdataset

    n_input = docs.count()

    # 1) quality filter (streaming; scrubbed text replaces raw)
    scored = quality_filter(docs, text_col=text_col, use_ppl=use_ppl)

    def keep_quality(batch: pa.Table) -> pa.Table:
        batch = batch.filter(batch.column("keep"))
        keep_cols = [id_col, "scrubbed_text", "lang", "source"]
        batch = batch.select([c for c in keep_cols
                              if c in batch.column_names])
        return batch.rename_columns(
            [text_col if c == "scrubbed_text" else c
             for c in batch.column_names])

    # repartition before the dedup join: filtered blocks can be EMPTY
    # and schema-less, which acero's hash join rejects (Ray Data 2.49
    # gotcha — merging blocks drops the empties)
    kept = scored.map_batches(keep_quality,
                              batch_format="pyarrow") \
        .repartition(8).materialize()
    n_quality = kept.count()

    # 2) exact dedup (the one shuffle)
    deduped = exact_dedup(kept, text_col=text_col,
                          id_col=id_col).materialize()
    n_dedup = deduped.count()

    # 3) benchmark decontamination: bench gram-hash set broadcast once,
    #    docs with > max_hit_frac overlapping n-grams drop
    def _g64(digests: set) -> np.ndarray:
        # truncate the 128-bit gram digests to int64 (collision odds
        # ~2^-64 per pair are already absorbed by the digest itself)
        return np.fromiter(
            (int.from_bytes(d[:8], "little", signed=True)
             for d in digests), dtype=np.int64, count=len(digests))

    def bench_partials(batch: pa.Table) -> pa.Table:
        grams: set = set()
        for t in batch.column(text_col).to_pylist():
            grams |= _gram_hashes(t or "", contamination_n)
        return pa.table({"g": pa.array(_g64(grams), type=pa.int64())})

    bench_set = np.unique(np.concatenate(
        [b.column("g").to_numpy() for b in
         benchmark.select_columns([text_col])
         .map_batches(bench_partials, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow", batch_size=None)]
        + [np.array([], dtype=np.int64)]))
    bench_ref = ray.put(bench_set)

    def decontaminate(batch: pa.Table, _cache={}) -> pa.Table:
        bs = _cache.get(bench_ref)
        if bs is None:
            _cache.clear()
            bs = _cache[bench_ref] = ray.get(bench_ref)
        keep_mask = []
        for t in batch.column(text_col).to_pylist():
            grams = _gram_hashes(t or "", contamination_n)
            if not grams:
                keep_mask.append(True)
                continue
            arr = _g64(grams)
            if len(bs):
                pos = np.searchsorted(bs, arr)
                pos = np.minimum(pos, len(bs) - 1)
                hits = int((bs[pos] == arr).sum())
            else:
                hits = 0
            keep_mask.append(hits <= max_hit_frac * len(grams))
        return batch.filter(pa.array(keep_mask))

    # materialize: the count below must not re-run the filter, and the
    # mixture stage consumes the same survivor set
    clean = deduped.map_batches(decontaminate,
                                batch_format="pyarrow").materialize()
    n_clean = clean.count()

    # 4) deterministic mixture sampling (per-row hash filter)
    mixed = mixture_sample(clean, rates, id_col=id_col,
                           default_rate=default_rate).materialize()
    n_mixed = mixed.count()

    # 5) packing stats over the final set (per-block FFD summary);
    #    an empty survivor set short-circuits (map_batches skips empty
    #    blocks, so the packing frame would come back column-less)
    if n_mixed:
        packing = pack_sequences(mixed, seq_len=seq_len, id_col=id_col,
                                 text_col=text_col)
        n_packs = int(packing["n_packs"][0])
        total_tokens = int(packing["total_tokens"][0])
    else:
        n_packs = total_tokens = 0

    # 6) shard export (native Datasink + manifest)
    if n_mixed:
        manifest = write_webdataset(mixed, out_dir,
                                    meta_cols=["lang", "source"],
                                    rows_per_shard=rows_per_shard)
    else:
        manifest = {"num_rows": 0, "num_shards": 0}

    return pd.DataFrame({
        "n_input": [int(n_input)],
        "n_quality_kept": [int(n_quality)],
        "n_after_dedup": [int(n_dedup)],
        "n_after_decontam": [int(n_clean)],
        "n_after_mixture": [int(n_mixed)],
        "n_rows_written": [int(manifest["num_rows"])],
        "n_shards": [int(manifest["num_shards"])],
        "n_packs": [n_packs],
        "total_tokens": [total_tokens],
    })
