"""The flagship north-rule pipeline:

    read CC-style Parquet (or synthesize)
      → extract_text (stateless, drops html immediately)
      → LangIdStage (actor pool)
      → QualityScrubStage (actor pool: scrub + gruut tokenization stats +
        perplexity + keep/drop)
      → write partitioned Parquet + per-partition manifests  (or return
        the lazy Dataset for further composition)

Never calls ray.init(); the caller owns the session.  Everything streams —
no driver-side materialization of document rows.
"""

from __future__ import annotations

import typing

import numpy as np
import pandas as pd
import pyarrow as pa

from gruut_ray.quality.heuristics import (
    DEFAULT_THRESHOLDS,
    RULES_VERSION,
    QualityThresholds,
)
from gruut_ray.stages.extract import extract_batch
from gruut_ray.stages.quality import LangIdStage, QualityScrubStage
from gruut_ray.state import manifest as mf

if typing.TYPE_CHECKING:
    import ray.data


def quality_filter(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    html_col: typing.Optional[str] = None,
    thresholds: QualityThresholds = DEFAULT_THRESHOLDS,
    use_ppl: bool = True,
    fused: bool = True,
    langid_concurrency: typing.Union[int, typing.Tuple[int, int]] = (1, 4),
    quality_concurrency: typing.Union[int, typing.Tuple[int, int]] = (2, 8),
    batch_size: int = 256,
    pool: str = "actors",
) -> "ray.data.Dataset":
    """Compose the quality-filter stages onto a Dataset (lazy).

    ``fused=True`` (default) runs langid inside the quality actor pool —
    one pool, one text decode per row, no intermediate object-store hop.
    Pass an ``int`` concurrency for a fixed-size eagerly-started pool
    (recommended for batch jobs: autoscaling pools ramp from min and leave
    cpus idle for the first tens of seconds); a ``(min, max)`` tuple keeps
    the autoscaling behavior for long-running / shared clusters.

    ``pool="tasks"`` runs the scrub as plain ``map_batches`` TASKS with a
    per-worker-process module cache holding the scorer (state still
    initializes once per process — Ray reuses workers — but there is no
    actor-pool scheduling latency and tasks elastically use every free
    cpu).  Output-identical to the actor path (the scorer is
    deterministic); preferable when the job is short relative to actor
    spin-up, actors when per-actor state is huge or must pin resources.
    """
    if html_col is not None:
        # per-block batches for the html stage: blocks are byte-bounded
        # (dynamic block splitting), a row-count batch_size is not —
        # multi-MB html rows would coalesce into GB batches (SURVEY §4)
        ds = ds.map_batches(
            lambda b: extract_batch(b, html_col=html_col, out_col=text_col),
            batch_format="pyarrow",
            batch_size=None,
        )
    if not fused:
        ds = ds.map_batches(
            LangIdStage,
            fn_constructor_kwargs={"text_col": text_col},
            batch_format="pyarrow",
            batch_size=batch_size * 4,
            concurrency=langid_concurrency,
            num_cpus=1,
        )
    if pool == "tasks":
        scrub_kwargs = {"thresholds": thresholds, "text_col": text_col,
                        "use_ppl": use_ppl, "langid": fused}
        ds = ds.map_batches(
            _scrub_task,
            fn_kwargs=scrub_kwargs,
            batch_format="pyarrow",
            batch_size=batch_size,
            num_cpus=1,
        )
        return ds
    ds = ds.map_batches(
        QualityScrubStage,
        fn_constructor_kwargs={"thresholds": thresholds, "text_col": text_col,
                               "use_ppl": use_ppl, "langid": fused},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=quality_concurrency,
        num_cpus=1,
    )
    return ds


_TASK_SCRUB_CACHE: typing.Dict[tuple, QualityScrubStage] = {}


def _scrub_task(batch, *, thresholds, text_col, use_ppl, langid):
    """Task-pool scrub kernel: one QualityScrubStage per worker PROCESS
    per parameter set (Ray reuses worker processes across tasks, so this
    initializes once per worker like an actor's ``__init__``)."""
    key = (repr(thresholds), text_col, use_ppl, langid)
    stage = _TASK_SCRUB_CACHE.get(key)
    if stage is None:
        import os
        import time
        t0 = time.perf_counter()
        stage = _TASK_SCRUB_CACHE[key] = QualityScrubStage(
            thresholds=thresholds, text_col=text_col,
            use_ppl=use_ppl, langid=langid)
        log = os.environ.get("GRUUT_RAY_SCRUB_INIT_LOG")
        if log:  # diagnostics: one line per worker-process init
            with open(log, "a") as f:
                f.write(f"{os.getpid()} {time.perf_counter() - t0:.3f}\n")
    return stage(batch)


def quality_filter_routed(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    lang_col: str = "lang",
    thresholds: QualityThresholds = DEFAULT_THRESHOLDS,
    use_ppl: bool = True,
    num_salts: int = 8,
) -> "ray.data.Dataset":
    """Language-ROUTED quality filter: documents are hash-shuffled to
    ``(lang, salt)`` partitions before scoring, so each reducer sees one
    language only (the north-star "language-keyed groupby routes documents
    to the right lexicon actors, with explicit salting for skewed
    languages").

    When to use which (SURVEY §4): the default :func:`quality_filter` is
    per-row and shuffle-free — every actor lazily holds every language's
    (small) models; routing only pays when per-language state is too big
    to co-load (multi-GB lexicons/LMs).  Salting bounds skew: en (~40% of
    a CC corpus) spreads over ``num_salts`` reducers instead of one.

    Scoring state lives in a worker-process-level cache (one
    ``QualityScrubStage`` per worker), NOT per group — groups are many and
    small.  Output rows are identical to the unrouted path (asserted in
    tests); only the physical plan differs."""
    import numpy as np
    import pyarrow.compute as pc

    def add_route(batch: pa.Table) -> pa.Table:
        # salt spreads a hot language's rows over num_salts groups; the
        # scrub output is per-row and salt-agnostic.  splitmix64 of the
        # row index, vectorized (VERDICT r02 #6)
        h = np.arange(batch.num_rows, dtype=np.uint64)
        h = (h + np.uint64(0x9E3779B97F4A7C15)) \
            * np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(31)
        salts = (h % np.uint64(num_salts)).astype(np.int32)
        return batch.append_column("_salt",
                                   pa.array(salts, type=pa.int32()))

    _cache: typing.Dict[str, QualityScrubStage] = {}

    def scrub_group(group: pa.Table) -> pa.Table:
        stage = _cache.get("stage")
        if stage is None:  # once per worker process, not per group
            stage = _cache["stage"] = QualityScrubStage(
                thresholds=thresholds, text_col=text_col,
                use_ppl=use_ppl, langid=True)
        return stage(group)

    routed = ds.map_batches(add_route, batch_format="pyarrow")
    out = routed.groupby([lang_col, "_salt"]).map_groups(
        scrub_group, batch_format="pyarrow")
    return out.map_batches(lambda b: b.drop_columns(["_salt"]),
                           batch_format="pyarrow")


def lang_counters(ds: "ray.data.Dataset"):
    """Keep/drop/scrub counters per language: per-batch partials then a tiny
    driver-side merge over (num_batches × num_langs) rows — documents never
    shuffle (SURVEY §2.5)."""
    from gruut_ray.pipelines.agg_util import partial_then_merge
    from gruut_ray.stages.quality import partial_counters

    return partial_then_merge(
        ds, partial_counters, ["lang"],
        {"docs": "sum", "kept": "sum", "pii_hits": "sum", "toxic": "sum",
         "tokens": "sum"})


def run_to_parquet(
    ds: "ray.data.Dataset",
    out_dir: str,
    *,
    num_partitions: int = 16,
    resume: bool = True,
    **kwargs,
) -> typing.Dict[str, typing.Any]:
    """Execute the quality filter and write partitioned output with
    per-partition manifests; skips partitions already completed by a prior
    run (checkpoint/resume, SURVEY §4).

    Partitioning is by ``hash(url) % num_partitions`` so it is stable across
    runs regardless of input order.  Each partition is one output directory
    written atomically (parquet files first, manifest last).
    """
    import pyarrow.compute as pc

    # Partitioning is by url hash over ALL input fragments, so a change
    # to ANY fragment can add/remove rows in EVERY partition: a completed
    # partition is reusable only when the whole input fragment list (and
    # the rules version) matches what it was built from (SURVEY §4;
    # VERDICT r02 #5).  Manifests without lineage (older runs) are
    # conservatively recomputed.
    lineage = mf.input_lineage(ds)
    done = {}
    if resume:
        done = {
            p: payload
            for p, payload in mf.completed_partitions(out_dir).items()
            if payload.get("lineage_hash") == lineage["lineage_hash"]
            and payload.get("rules_version") == RULES_VERSION
        }

    filtered = quality_filter(ds, **kwargs)

    def add_part(batch: pa.Table) -> pa.Table:
        # stable partition id from url hash (not input order)
        urls = batch.column("url").to_pylist()
        import zlib
        parts = [zlib.crc32((u or "").encode()) % num_partitions
                 for u in urls]
        return batch.append_column("part", pa.array(parts, type=pa.int32()))

    filtered = filtered.map_batches(add_part, batch_format="pyarrow")

    stats: typing.Dict[str, typing.Any] = {"partitions": {}}
    todo = [p for p in range(num_partitions) if p not in done]
    for payload in done.values():
        stats["partitions"][payload["part_id"]] = payload

    if todo:
        # A crashed run may have left data files WITHOUT a manifest in a
        # todo partition; write_parquet appends uniquely-named files, so
        # stale generations would double every row — clean first.
        import os
        import shutil

        for p in todo:
            pdir = mf.partition_dir(out_dir, p)
            if os.path.isdir(pdir):
                shutil.rmtree(pdir)

        # One pass: split by partition id with a filtered write per partition
        # would re-execute the pipeline num_partitions times; instead
        # materialize per-partition row groups via a single write with
        # partition columns, then stamp manifests.
        to_write = filtered
        if len(todo) < num_partitions:
            todo_arr = pa.array(todo, type=pa.int32())
            to_write = filtered.map_batches(
                lambda b: b.filter(pc.is_in(b.column("part"), todo_arr)),
                batch_format="pyarrow")
        to_write.write_parquet(out_dir, partition_cols=["part"])

        # Stamp manifests with per-partition counters
        import glob
        import os

        import pyarrow.dataset as pads
        for p in todo:
            pdir = os.path.join(out_dir, f"part={p}")
            files = glob.glob(os.path.join(pdir, "*.parquet"))
            rows = kept = 0
            if files:
                dset = pads.dataset(files)
                tbl = dset.to_table(columns=["keep", "n_pii_hits"])
                rows = tbl.num_rows
                kept = int(pc.sum(pc.cast(tbl.column("keep"), pa.int64())).as_py() or 0)
                scrubbed = int(pc.sum(pc.cast(
                    pc.greater(tbl.column("n_pii_hits"), 0),
                    pa.int64())).as_py() or 0)
                pii_hits = int(pc.sum(tbl.column("n_pii_hits")).as_py()
                               or 0)
            else:
                scrubbed = pii_hits = 0
            payload = {"rows": rows, "kept": kept,
                       "scrubbed": scrubbed, "pii_hits": pii_hits,
                       "rules_version": RULES_VERSION,
                       "lineage_hash": lineage["lineage_hash"]}
            mf.write_partition_manifest(out_dir, p, payload)
            stats["partitions"][p] = payload

    mf.write_run_manifest(out_dir, {
        "num_partitions": num_partitions,
        "rules_version": RULES_VERSION,
        "partitions_completed": len(stats["partitions"]),
        "lineage_hash": lineage["lineage_hash"],
        "input_fragments": lineage["fragments"],
    })
    stats["rows"] = sum(p.get("rows", 0) for p in stats["partitions"].values())
    stats["kept"] = sum(p.get("kept", 0) for p in stats["partitions"].values())
    return stats


def cc_end_to_end(pages: "ray.data.Dataset",
                  blocked_hosts: typing.Sequence[str] = (),
                  blocked_patterns: typing.Sequence[str] = (r"/zh/",),
                  n_pages: typing.Optional[int] = None,
                  **qf_kwargs) -> "pd.DataFrame":
    """The composed flagship: URL policy filter → html extract (byte-
    identity asserted in-stream) → fused langid/quality/PII scrub →
    per-host exact dedup accounting.  One streaming pass per stage, no
    shuffle until the final (host, hash) dedup groupby; returns a
    one-row counter summary.

    Every stage is the production operator (webstats.url_policy_filter,
    stages.extract, quality_filter, webstats-style hash pairs), so this
    pipeline is exactly what `jobs/quality_filter_job.py` runs plus the
    web-layer passes — the composition the north rule describes."""
    import hashlib

    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from gruut_ray.pipelines.agg_util import partial_then_merge
    from gruut_ray.pipelines.webstats import url_policy_filter
    from gruut_ray.stages.extract import extract_text

    flagged = url_policy_filter(pages, blocked_hosts=blocked_hosts,
                                blocked_patterns=blocked_patterns)

    def count_and_keep(batch: pa.Table) -> pa.Table:
        reasons = batch.column("drop_reason").to_pylist()
        keep = pa.array([r == "" for r in reasons])
        return batch.filter(keep)

    # pass n_pages when known (synth/counted input): pages.count() on a
    # generated chain re-executes it end to end (the whole pipeline ran
    # 3x before this counter moved in-stream)
    if n_pages is None:
        n_pages = pages.count()
    kept_pages = flagged.map_batches(count_and_keep,
                                     batch_format="pyarrow")

    def check_extract(batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()
        truths = batch.column("text").to_pylist()
        extracted = [extract_text(h) for h in htmls]
        ok = [e == t for e, t in zip(extracted, truths)]
        batch = batch.drop_columns(["html", "text"])
        batch = batch.append_column(
            "text", pa.array(extracted, type=pa.large_string()))
        return batch.append_column("extract_ok", pa.array(ok, pa.bool_()))

    # batch_size=None: one batch per incoming BLOCK.  Blocks are byte-
    # bounded by Ray's dynamic block splitting (target_max_block_size),
    # so the extract task's working set stays bounded even when single
    # html rows are multi-MB (SURVEY §4 "wide rows") — a fixed row-count
    # batch_size would coalesce blocks into row_count × row_bytes
    # batches (256 × 10 MB = 2.5 GB per task).  tests/test_extract_synth
    # pins the wide-row path.
    extracted = kept_pages.map_batches(check_extract,
                                       batch_format="pyarrow",
                                       batch_size=None)
    scored = quality_filter(extracted, text_col="text", **qf_kwargs)

    def pair_partials(batch: pa.Table) -> pa.Table:
        keep = batch.column("keep").to_pylist()
        ok = batch.column("extract_ok").to_pylist()
        hosts = batch.column("host").to_pylist()
        texts = batch.column("scrubbed_text").to_pylist()
        rows = {}
        n_kept = 0
        for k, o, h, t in zip(keep, ok, hosts, texts):
            assert o, "extract_text(html) != text for a row"
            if not k:
                continue
            n_kept += 1
            hh = hashlib.blake2b((t or "").encode(),
                                 digest_size=16).hexdigest()
            # coalesce None → "": Ray's sort-based aggregate partitions
            # blocks by sorting the key columns, and a None among
            # strings breaks the boundary search (TypeError) — hit only
            # once block counts grow enough to sample both (sf1 gate)
            rows[(h or "", hh)] = rows.get((h or "", hh), 0) + 1
        # sentinel row (n=0) carries the batch's survivor count so the
        # policy stage never needs a second execution; final_partials
        # excludes n==0 rows from the unique/kept accounting.  The
        # sentinel host is "" (NOT None — see above); it cannot collide
        # with a real pair because no blake2b hex digest is "__seen__"
        hosts_out = [k[0] for k in rows] + [""]
        hashes_out = [k[1] for k in rows] + ["__seen__"]
        n_out = list(rows.values()) + [0]
        kept_out = ([n_kept] + [0] * (len(rows) - 1) if rows else []) + [0]
        seen_out = [0] * len(rows) + [len(keep)]
        return pa.table({
            "host": pa.array(hosts_out, type=pa.string()),
            "h": pa.array(hashes_out, type=pa.string()),
            "n": pa.array(n_out, type=pa.int64()),
            "n_kept": pa.array(kept_out, type=pa.int64()),
            "n_seen": pa.array(seen_out, type=pa.int64()),
        })

    pairs = (scored.map_batches(pair_partials, batch_format="pyarrow")
             .groupby(["host", "h"])
             .aggregate(Sum("n", alias_name="n"),
                        Sum("n_kept", alias_name="n_kept"),
                        Sum("n_seen", alias_name="n_seen")))

    def final_partials(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({"g": pa.array([], type=pa.int64()),
                             "n_kept": pa.array([], type=pa.int64()),
                             "n_unique": pa.array([], type=pa.int64()),
                             "n_seen": pa.array([], type=pa.int64())})
        real = pc.greater(batch.column("n"), 0)  # drop the seen-sentinel
        return pa.table({
            "g": pa.array([0] * 1, type=pa.int64()),
            "n_kept": pa.array(
                [pc.sum(batch.column("n_kept")).as_py() or 0],
                type=pa.int64()),
            "n_unique": pa.array(
                [pc.sum(pc.cast(real, pa.int64())).as_py() or 0],
                type=pa.int64()),
            "n_seen": pa.array(
                [pc.sum(batch.column("n_seen")).as_py() or 0],
                type=pa.int64()),
        })

    summary = partial_then_merge(pairs, final_partials, ["g"],
                                 {"n_kept": "sum", "n_unique": "sum",
                                  "n_seen": "sum"})
    n_kept = int(summary["n_kept"].sum()) if not summary.empty else 0
    n_unique = int(summary["n_unique"].sum()) if not summary.empty else 0
    n_after_policy = (int(summary["n_seen"].sum())
                      if not summary.empty else 0)
    return pd.DataFrame({
        "n_pages": [int(n_pages)],
        "n_blocked": [int(n_pages - n_after_policy)],
        "n_kept": [n_kept],
        "n_unique_per_host": [n_unique],
    })


class _PplHistStage:
    """Actor-pool stage: per-batch (lang, ppl_d, n) histogram partials
    of the char-trigram LM perplexity, quantized to deci-perplexity
    (round(ppl·10)) — models load once per actor."""

    def __init__(self, text_col: str = "text", lang_col: str = "lang"):
        from gruut_ray.quality.ngram_lm import PerplexityScorer

        self.scorer = PerplexityScorer()
        self.text_col = text_col
        self.lang_col = lang_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = batch.column(self.lang_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        ppl_d = np.array(
            [int(round(self.scorer.perplexity(t or "", lg) * 10))
             for t, lg in zip(texts, langs)], dtype=np.int64)
        df = pd.DataFrame({"lang": langs, "ppl_d": ppl_d})
        agg = df.groupby(["lang", "ppl_d"], as_index=False).size() \
            .rename(columns={"size": "n"})
        agg["n"] = agg["n"].astype("int64")
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)


def ccnet_perplexity_buckets(ds: "ray.data.Dataset",
                             text_col: str = "text",
                             lang_col: str = "lang",
                             concurrency: typing.Union[
                                 int, typing.Tuple[int, int]] = (1, 4),
                             ) -> pd.DataFrame:
    """CCNet-style per-language perplexity bucketing (Wenzek et al.
    2020, arXiv:1911.00359): score every document with the per-lang
    char-trigram LM, compute EXACT per-lang tercile thresholds, and
    label head / middle / tail.  Returns (lang, bucket, n_docs,
    sum_ppl_d) — the corpus-curation summary; the same thresholds
    drive a keep-head/middle filter in a release pipeline.

    Scale shape: perplexity quantizes to deci-points, so the score
    domain is BOUNDED and the threshold pass is the exact counting-
    histogram quantile of ``quantity_percentiles`` (only distinct
    (lang, ppl_d) pairs reach the driver — |langs|×|domain|, not
    docs).  Thresholds use percentile_disc ceil(p·n) semantics at
    p=1/3, 2/3.  The bucket rollup is pure arithmetic on the SAME
    histogram — the corpus is scanned exactly once, and the result is
    partition-invariant by construction (tested)."""
    import math

    from gruut_ray.pipelines.agg_util import partial_then_merge

    hist = partial_then_merge(
        ds.select_columns([lang_col, text_col]).map_batches(
            _PplHistStage,
            fn_constructor_kwargs={"text_col": text_col,
                                   "lang_col": lang_col},
            batch_format="pyarrow", concurrency=concurrency,
            num_cpus=1),
        lambda b: b, ["lang", "ppl_d"], {"n": "sum"})
    if hist.empty:
        return pd.DataFrame({"lang": pd.Series(dtype="object"),
                             "bucket": pd.Series(dtype="object"),
                             "n_docs": pd.Series(dtype="int64"),
                             "sum_ppl_d": pd.Series(dtype="int64")})
    rows = []
    for lang, grp in hist.groupby("lang", sort=True):
        g = grp.sort_values("ppl_d")
        n_arr = g["n"].to_numpy(dtype=np.int64)
        v_arr = g["ppl_d"].to_numpy(dtype=np.int64)
        cum = np.cumsum(n_arr)
        total = int(cum[-1])
        # percentile_disc thresholds at 1/3 and 2/3 (ceil(p*n), 1-based)
        t_pos = [max(1, math.ceil(total / 3.0)),
                 max(1, math.ceil(2.0 * total / 3.0))]
        t_val = [int(v_arr[int(np.searchsorted(cum, p, side="left"))])
                 for p in t_pos]
        head = v_arr <= t_val[0]
        tail = v_arr > t_val[1]
        mid = ~head & ~tail
        for bucket, mask in (("head", head), ("middle", mid),
                             ("tail", tail)):
            if not mask.any():
                continue
            rows.append((lang, bucket, int(n_arr[mask].sum()),
                         int((n_arr[mask] * v_arr[mask]).sum())))
    out = pd.DataFrame(rows, columns=["lang", "bucket", "n_docs",
                                      "sum_ppl_d"])
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sum_ppl_d"] = out["sum_ppl_d"].astype("int64")
    return (out.sort_values(["lang", "bucket"])
            .reset_index(drop=True))
