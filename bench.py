#!/usr/bin/env python
"""Benchmark harness for the gruut_ray engine (driver contract).

Default mode: ``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (32 when
unset), run the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) and print ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling`` mode: run the headline quality-filter job twice in FRESH
processes (``num_cpus=8`` then ``num_cpus=32``) on identical input and report
throughput at both plus scaling efficiency — the sandbox stand-in for the
north rule's N vs 4N cluster-size criterion (BASELINE.md).

The headline input is the sf documents table replicated
``$GRAFT_BENCH_REPLICATE`` times (default 8) by listing the parquet file
multiple times in ``read_parquet`` — deterministic, no synthetic rows, and
big enough that per-doc compute (not Ray startup) dominates wall time.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# Headline input is large enough that fixed startup (~6-9s of worker/actor
# spawn + read warmup) stays under ~20% of wall time: the r01 default of 8
# replicas measured actor spawn, not the pipeline (VERDICT r01), reporting
# 0.27× the sustained docs/s.
REPLICATE = int(os.environ.get("GRAFT_BENCH_REPLICATE", "64"))
# Scaling mode runs even longer — the criterion models sustained
# 10^12-doc throughput, where startup is pure noise.
SCALING_REPLICATE = int(os.environ.get("GRAFT_BENCH_SCALING_REPLICATE", "192"))
SCALING_REPEATS = int(os.environ.get("GRAFT_SCALING_REPEATS", "3"))


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _init_ray(num_cpus: int) -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    # Ray's reservation allocator pins op_resource_reservation_ratio
    # (default 0.5) of the cpus to each operator EQUALLY — in a shallow
    # read→scrub→agg plan that caps the one hot operator at ~60% of the
    # box while trivial read/agg slots idle (measured: scrub ran 5-wide
    # on 8 cpus).  0.1 keeps a starvation guard per op but lets the hot
    # stage claim the shared pool: 21.0k → 25.3k docs/s @32 cpus,
    # 5.5k → 7.0k @8 (bench owns this session, so mutating the global
    # DataContext here is safe; library code never touches it).
    import ray.data
    ray.data.DataContext.get_current().op_resource_reservation_ratio = float(
        os.environ.get("GRAFT_BENCH_RESERVATION_RATIO", "0.1"))


def _read(table: str, columns=None, replicate: int = 1):
    import ray.data
    import pyarrow.parquet as pq
    path = os.path.join(SF_DIR, f"{table}.parquet")
    paths = [path] * replicate if replicate > 1 else path
    # explicit metadata-stripped schema: the pandas schema-metadata dict
    # is unhashable and defeats Ray's schema dedup (warning spam + a
    # full unify per rebatch)
    schema = pq.read_schema(path).remove_metadata()
    if columns is not None:  # schema must match the column selection
        import pyarrow as _pa
        schema = _pa.schema([schema.field(c) for c in columns])
    return ray.data.read_parquet(paths, columns=columns, schema=schema)


# ---------------------------------------------------------------------------
# headline: the north-rule quality-filter pipeline
# ---------------------------------------------------------------------------

def run_headline(num_cpus: int, replicate: int = REPLICATE):
    """Quality filter (langid → scrub/stats/ppl → keep/drop) over the
    replicated documents table.  Returns (n_docs, n_kept, elapsed_sec)."""
    from gruut_ray.pipelines.quality_filter import quality_filter

    ds = _read("documents", columns=["doc_id", "text", "lang"],
               replicate=replicate)
    # pool="tasks": the scorer still initializes once per worker process
    # (module cache), output-identical to actors (tests/test_quality.py).
    # Tasks win on BOTH legs once the reservation ratio is lowered (see
    # _init_ray): no actor spin-up (~2.5 s at 32 cpus) and — decisive —
    # no pinned pool starving the read operator (a 31-actor pool leaves
    # 1 cpu for ALL reads: measured 18.0k vs 25.3k docs/s @32 cpus).
    # Tasks elastically rebalance cpus between read and scrub as the
    # stream progresses, which is also the right shape at cluster scale.
    out = quality_filter(
        ds, text_col="text", use_ppl=True, fused=True,
        quality_concurrency=max(2, num_cpus - 1),
        batch_size=256,
        pool=os.environ.get("GRAFT_BENCH_POOL", "tasks"),
    )
    t0 = time.perf_counter()
    # consume via a tiny aggregate — full streaming execution, nothing
    # materialized on the driver
    kept = out.sum("keep")
    elapsed = time.perf_counter() - t0
    n_docs = 0
    import pyarrow.parquet as pq
    n_docs = pq.ParquetFile(
        os.path.join(SF_DIR, "documents.parquet")).metadata.num_rows * replicate
    return n_docs, int(kept or 0), elapsed


# ---------------------------------------------------------------------------
# secondary pipelines (operator coverage under time)
# ---------------------------------------------------------------------------

def _q_tokens_by_lang():
    from gruut_ray.pipelines.text_stats import tokens_by_lang
    tokens_by_lang(_read("documents", ["lang", "text"]))


def _q_exact_dedup():
    from gruut_ray.pipelines.dedup import exact_dedup
    exact_dedup(_read("documents", ["doc_id", "text"])).count()


def _q_minhash_dedup():
    from gruut_ray.pipelines.dedup import minhash_lsh_dedup
    minhash_lsh_dedup(_read("documents", ["doc_id", "text"]),
                      jaccard_threshold=0.9).count()


def _q_knn():
    import numpy as np
    from gruut_ray.pipelines.similarity import brute_force_topk
    ds = _read("embeddings", ["vec_id", "embedding"])
    first = ds.take(1)[0]
    brute_force_topk(ds, np.asarray([first["embedding"]], dtype=np.float32),
                     k=10)

def _q_pricing_summary():
    from gruut_ray.pipelines.relational import pricing_summary
    pricing_summary(_read("lineitem",
                          ["l_quantity", "l_extendedprice", "l_discount",
                           "l_tax", "l_returnflag", "l_linestatus",
                           "l_shipdate"]))


def _q_skew_join():
    """orders ⋈ lineitem via the skew-aware join (MG hot-key sketch,
    broadcast hot side, shuffle cold side) + exact rollup."""
    from gruut_ray.pipelines.relational import revenue_by_priority_skew
    revenue_by_priority_skew(
        _read("orders", ["o_orderkey", "o_orderpriority"]),
        _read("lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]))


def _q_semantic_dedup():
    from gruut_ray.pipelines.similarity import semantic_dedup
    ds = _read("embeddings", ["vec_id", "embedding"])
    dim = len(ds.take(1)[0]["embedding"])
    semantic_dedup(ds, dim=dim, threshold=0.8, n_lists=8).count()


def _q_rolling_window():
    from gruut_ray.pipelines.relational import user_rolling_window
    user_rolling_window(
        _read("events", ["event_id", "ts", "user_id", "value"]), window=10)


def _q_sessionize():
    from gruut_ray.pipelines.relational import sessionize
    sessionize(_read("events", ["ts", "user_id"]))


def _q_normalize():
    """Full gruut-style normalizer (fixed-point tokenize/verbalize) per doc."""
    import pyarrow as pa
    from gruut_ray.nlp.normalize import process_document

    ds = _read("documents", ["doc_id", "text", "lang"])

    def norm(batch: pa.Table) -> pa.Table:
        counts = [sum(1 for s in process_document(t or "", lang=l or "en")
                      for w in s.words if w.is_spoken)
                  for t, l in zip(batch.column("text").to_pylist(),
                                  batch.column("lang").to_pylist())]
        return pa.table({"n": pa.array(counts, type=pa.int64())})

    ds.map_batches(norm, batch_format="pyarrow", batch_size=256).sum("n")


_ACTIVE_CPUS = [NUM_CPUS]  # set per run; module default otherwise


def _q_phonemize():
    """Lexicon + G2P + POS phonemization over en documents."""
    from gruut_ray.stages.phonemize import phonemize
    ds = _read("documents", ["doc_id", "text", "lang"])
    phonemize(ds, concurrency=max(2, _ACTIVE_CPUS[0] // 4),
              batch_size=128).sum("n_phonemes")


def _q_cc_end_to_end():
    """Composed flagship: policy filter → extract → quality → per-host
    dedup over synth CC pages (2× documents rows)."""
    import pyarrow.parquet as pq

    from gruut_ray.pipelines.quality_filter import cc_end_to_end
    from gruut_ray.sources.synth import synth_dataset

    n = pq.ParquetFile(os.path.join(SF_DIR,
                                    "documents.parquet")).metadata.num_rows
    cc_end_to_end(synth_dataset(n * 2), n_pages=n * 2,
                  blocked_hosts=[f"site{i}.example" for i in range(10)],
                  use_ppl=False)


def _q_intra_source_dedup():
    """Per-domain exact dedup: (source, 128-bit hash) combiner →
    distributed groupby → per-source rollup."""
    from gruut_ray.pipelines.webstats import intra_source_dedup
    intra_source_dedup(_read("documents", ["source", "text"]))


def _q_top_bigrams():
    """Adjacent-pair Counter partials → groupby sum → per-lang top-k."""
    from gruut_ray.pipelines.text_stats import top_bigrams_by_lang
    top_bigrams_by_lang(_read("documents", ["lang", "text"]), k=5)


def _q_centroid_analytics():
    """Embedding-analytics family (VERDICT r03 #8): per-label centroid
    sums + nearest-centroid confusion counts — exact scaled-int math,
    broadcast centroids, one matmul/scatter per batch."""
    from gruut_ray.pipelines.similarity import (label_centroids,
                                                nearest_centroid_confusion)
    label_centroids(_read("embeddings", ["label", "embedding"]))
    nearest_centroid_confusion(_read("embeddings", ["label", "embedding"]))


def _q_kmeans():
    """Distributed Lloyd's k-means: broadcast centroids, scatter
    partials, distributed bottom-pool seeding (topk_reduce)."""
    from gruut_ray.pipelines.similarity import kmeans_fit
    kmeans_fit(_read("embeddings", ["vec_id", "embedding"]), k=10, iters=4)


def _q_pq_topk():
    """PQ ANN (VERDICT r04 #8): distributed codebook training + ADC
    scan + exact re-rank of the k×rerank_factor shortlist."""
    import numpy as np
    from gruut_ray.pipelines.similarity import pq_topk
    ds = _read("embeddings", ["vec_id", "embedding"])
    first = ds.take(1)[0]
    pq_topk(ds, np.asarray([first["embedding"]], dtype=np.float32),
            dim=len(first["embedding"]), m=16, k_codebook=16, k=10)


def _q_distill_classifier():
    """Quality-classifier distillation: distributed IRLS (broadcast
    weights, tree-reduced Hessian/gradient blobs, ~8 corpus scans)."""
    from gruut_ray.pipelines.train_classifier import \
        distill_quality_classifier
    distill_quality_classifier(_read("documents",
                                     ["doc_id", "text", "lang"]))


def _q_release_shards():
    """Capstone release composition: quality → exact dedup →
    decontaminate → mixture → FFD stats → WebDataset shards."""
    import shutil
    import tempfile

    import pyarrow as pa

    from gruut_ray.pipelines.release import build_training_shards

    rates = {"src1": 1.0, "src2": 0.5, "src3": 0.25, "src4": 0.1,
             "src5": 0.75, "src6": 0.0, "src7": 1.0, "src8": 0.33}
    ds = _read("documents", ["doc_id", "text", "lang", "source"])

    def split(b: pa.Table, want_bench: bool) -> pa.Table:
        mask = (b.column("doc_id").to_numpy() % 100 == 0)
        return b.filter(pa.array(mask if want_bench else ~mask))

    bench_ds = ds.map_batches(lambda b: split(b, True),
                              batch_format="pyarrow")
    corpus = ds.map_batches(lambda b: split(b, False),
                            batch_format="pyarrow")
    out = tempfile.mkdtemp(prefix="gruut_ray_bench_release_", dir="/tmp")
    try:
        build_training_shards(corpus, bench_ds, rates, out,
                              default_rate=0.75, max_hit_frac=0.5)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _q_ccnet_buckets():
    """CCNet head/middle/tail perplexity bucketing: one actor-pool
    scoring scan → quantized (lang, ppl_d) histogram → exact tercile
    arithmetic on the histogram."""
    from gruut_ray.pipelines.quality_filter import ccnet_perplexity_buckets
    ccnet_perplexity_buckets(_read("documents", ["lang", "text"]))


def _q_bfs_depth():
    """Recursive-CTE dual: one shuffle-joined distinct edge build +
    one broadcast-frontier semi-join scan per BFS level."""
    from gruut_ray.pipelines.graphrank import bfs_depth_histogram
    bfs_depth_histogram(
        _read("orders", ["o_orderkey", "o_custkey"]),
        _read("lineitem", ["l_orderkey", "l_partkey", "l_quantity"]))


def _q_unigram_vocab():
    """SentencePiece-style unigram-LM induction: capped distributed
    word counts → driver EM+prune → broadcast-vocab Viterbi encode."""
    from gruut_ray.pipelines.unigram import unigram_vocab_summary
    unigram_vocab_summary(_read("documents", ["doc_id", "text"]))


def _q_exact_median():
    """Distributed selection over an unbounded domain: min/max scan +
    ≤3 refinement combiner scans + final in-range histogram."""
    from gruut_ray.pipelines.relational import exact_median_price_by_flag
    exact_median_price_by_flag(
        _read("lineitem", ["l_returnflag", "l_extendedprice"]))


SECONDARY = {
    "tokens_by_lang": _q_tokens_by_lang,
    "cc_end_to_end": _q_cc_end_to_end,
    "intra_source_dedup": _q_intra_source_dedup,
    "top_bigrams": _q_top_bigrams,
    "phonemize": _q_phonemize,
    "exact_dedup": _q_exact_dedup,
    "minhash_lsh_dedup": _q_minhash_dedup,
    "knn_top10": _q_knn,
    "pricing_summary": _q_pricing_summary,
    "skew_join_revenue": _q_skew_join,
    "semantic_dedup": _q_semantic_dedup,
    "centroid_analytics": _q_centroid_analytics,
    "kmeans": _q_kmeans,
    "pq_topk": _q_pq_topk,
    "ccnet_buckets": _q_ccnet_buckets,
    "bfs_depth": _q_bfs_depth,
    "unigram_vocab": _q_unigram_vocab,
    "exact_median": _q_exact_median,
    "distill_classifier": _q_distill_classifier,
    "release_shards": _q_release_shards,
    "rolling_window": _q_rolling_window,
    "sessionize": _q_sessionize,
    "normalize_spoken": _q_normalize,
}

# --sf1 runs the headline plus the suite's heavy data-volume entries at
# 10x the sf0.1 row counts (VERDICT r04 #4: anchor throughput-vs-scale)
SF1_SUBSET = ("cc_end_to_end", "exact_dedup", "minhash_lsh_dedup")


def run_bench(num_cpus: int, headline_only: bool = False,
              only: "tuple[str, ...] | None" = None,
              replicate: "int | None" = None) -> dict:
    _ACTIVE_CPUS[0] = num_cpus
    _init_ray(num_cpus)
    queries: dict[str, float] = {}

    rep = replicate if replicate is not None else \
        (SCALING_REPLICATE if headline_only else REPLICATE)
    n_docs, n_kept, headline_sec = run_headline(num_cpus, replicate=rep)
    queries["quality_filter"] = round(headline_sec, 3)

    if not headline_only:
        for name, fn in SECONDARY.items():
            if only is not None and name not in only:
                continue
            t0 = time.perf_counter()
            fn()
            queries[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(queries.values()), 3)
    return {
        "metric": "gruut_ray bench: quality-filter headline + operator suite",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_of(SF_DIR),
        "num_cpus": num_cpus,
        "headline": {
            "docs": n_docs,
            "kept": n_kept,
            "sec": round(headline_sec, 3),
            "docs_per_sec": round(n_docs / headline_sec, 1),
            "replicate": rep,
        },
    }


# ---------------------------------------------------------------------------
# scaling mode: fresh-process runs at two parallelism levels
# ---------------------------------------------------------------------------

def _scaling_child(cpus: int) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__),
         "--child", "--num-cpus", str(cpus)],
        capture_output=True, text=True, timeout=1800,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    lines = proc.stdout.strip().splitlines()
    if proc.returncode != 0 or not lines:
        raise RuntimeError(
            f"scaling child (num_cpus={cpus}) failed "
            f"rc={proc.returncode}; stderr tail:\n"
            + "\n".join(proc.stderr.splitlines()[-20:]))
    return json.loads(lines[-1])


def measure_hardware_scaling(low: int, high: int,
                             seconds: float = 8.0) -> dict:
    """Single-box SMP calibration: aggregate throughput of ``low`` vs
    ``high`` IDENTICAL busy processes (blake2b loops — no Ray, no shared
    state, no Python-level contention).  On this sandbox, 8→32 busy cores
    yield only ~0.74 of linear (turbo clocks + shared memory bandwidth /
    LLC) — a property of packing 4× the work onto ONE box.  A real
    N→4N-node cluster keeps per-node density constant, so the cluster
    criterion is the PIPELINE's efficiency relative to this hardware
    ceiling, with all raw numbers reported."""
    probe = (
        "import time, hashlib\n"
        f"t0=time.perf_counter(); n=0\n"
        f"while time.perf_counter()-t0 < {seconds}:\n"
        "    hashlib.blake2b(b'x'*4096).digest(); n+=1\n"
        "print(n)\n")

    def agg(m: int) -> int:
        procs = [subprocess.Popen([sys.executable, "-c", probe],
                                  stdout=subprocess.PIPE)
                 for _ in range(m)]
        return sum(int(p.communicate()[0]) for p in procs)

    ops = {low: agg(low), high: agg(high)}
    eff = (ops[high] / ops[low]) / (high / low)
    return {"agg_ops": {str(low): ops[low], str(high): ops[high]},
            "hardware_efficiency": round(eff, 3)}


def run_scaling(low: int = 8, high: int = 32,
                repeats: int = SCALING_REPEATS) -> dict:
    """Noise-robust scaling measurement (BASELINE.md §scaling).

    Runs the same headline job in fresh processes at ``low`` and ``high``
    cpus, ``repeats`` times each, legs INTERLEAVED so co-tenant load hits
    both legs alike.  Efficiency is computed from the median throughput
    per leg — the r01 single-pair protocol let one noisy 32-cpu run set
    the round's number (VERDICT r01).  The same-box hardware SMP ceiling
    is calibrated in-process (see :func:`measure_hardware_scaling`) and
    the headline value is the pipeline's efficiency normalized to it —
    the quantity that transfers to the real N vs 4N NODE criterion,
    where per-node density is constant.  All raw numbers are reported."""
    runs: dict = {low: [], high: []}
    hw_runs = []
    docs = None
    for _ in range(repeats):
        for cpus in (low, high):
            res = _scaling_child(cpus)
            runs[cpus].append(res["headline"]["docs_per_sec"])
            docs = res["headline"]["docs"]
        # calibrate INTERLEAVED with the pipeline legs so co-tenant load
        # during calibration and measurement is comparable
        hw_runs.append(measure_hardware_scaling(low, high))
    import statistics
    med_low = statistics.median(runs[low])
    med_high = statistics.median(runs[high])
    raw_efficiency = (med_high / med_low) / (high / low)
    hw_eff = statistics.median(r["hardware_efficiency"] for r in hw_runs)
    hw = {"hardware_efficiency": hw_eff, "runs": hw_runs}  # incl. raw ops
    vs_hw = raw_efficiency / hw_eff
    return {
        "metric": "pipeline scaling efficiency normalized to measured "
                  f"single-box SMP ceiling, num_cpus={low} vs {high} "
                  f"fresh processes (stand-in for N vs 4N nodes), median "
                  f"of {repeats} interleaved runs/leg",
        "value": round(vs_hw, 3),
        "unit": "efficiency",
        "queries": {
            f"median_docs_per_sec@{low}cpus": med_low,
            f"median_docs_per_sec@{high}cpus": med_high,
        },
        "sf": _sf_of(SF_DIR),
        "num_cpus": high,
        "throughput_docs_per_sec": {str(low): med_low, str(high): med_high},
        "raw_runs_docs_per_sec": {str(low): runs[low], str(high): runs[high]},
        "raw_efficiency": round(raw_efficiency, 3),
        "hardware_calibration": hw,
        "efficiency_vs_hardware": round(vs_hw, 3),
        "docs": docs,
        "scaling_efficiency": round(vs_hw, 3),
    }


def _ensure_sf1(dst: str) -> None:
    """Regenerate the deterministic sf1 tiling if missing (BASELINE.md
    §round-4 sf1 gate: sf0.1 tiled 10× with consistent key offsets)."""
    if os.path.isdir(dst) and os.path.exists(
            os.path.join(dst, "documents.parquet")):
        return
    rc = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "jobs", "make_sf_tiles.py"),
         "--src", "/root/testdata/sf0.1", "--dst", dst, "--tiles", "10"],
        capture_output=True, text=True).returncode
    if rc != 0:
        raise RuntimeError(f"make_sf_tiles failed rc={rc}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--sf1", action="store_true",
                    help="headline + heavy suite entries over the 10x "
                         "sf1 tiling (throughput-vs-scale anchor)")
    ap.add_argument("--child", action="store_true",
                    help="internal: headline-only run in this process")
    ap.add_argument("--num-cpus", type=int, default=NUM_CPUS)
    args = ap.parse_args()

    if args.sf1:
        global SF_DIR
        SF_DIR = os.environ.get("GRAFT_SF1_DIR", "/tmp/sf1")
        _ensure_sf1(SF_DIR)
        out = run_bench(args.num_cpus, only=SF1_SUBSET,
                        replicate=int(os.environ.get(
                            "GRAFT_BENCH_SF1_REPLICATE", "8")))
        out["metric"] = ("gruut_ray bench at sf1 (10x tiling): "
                        "quality-filter headline + heavy suite entries")
    elif args.child:
        out = run_bench(args.num_cpus, headline_only=True)
    elif args.scaling:
        out = run_scaling()
    else:
        out = run_bench(args.num_cpus)

    print(json.dumps(out))
    import ray
    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
