"""Host-graph PageRank over crawled pages (graph-analytics family).

Classic crawl-frontier / quality-prior signal: extract every page's
outlinks, collapse to a host→host edge multigraph, and power-iterate
PageRank (Page et al. 1999) with damping and dangling-mass
redistribution.

Scale shape (the same broadcast-model / scatter-partials skeleton as
``similarity.kmeans_fit``): pages are scanned ONCE to build weighted
host edges — per-batch (src, dst, n) combiner partials, merged by
``partial_then_merge`` (distributed shrink past its driver limit).
Each iteration broadcasts the rank vector via ``ray.put`` and one
``map_batches`` pass over the EDGE table (already reduced: ≤ one row
per host pair, edges never re-extract from pages) emits per-batch
(dst, contribution) partials.  The driver holds only per-HOST state
(rank vector + out-degree) — bounded by the host count, not pages;
at ≥ ~10⁷ hosts swap the broadcast dict for a keyed join per
iteration (documented cut-over, same contract as the other broadcast
operators).
"""

from __future__ import annotations

import typing

import numpy as np
import pandas as pd
import pyarrow as pa

if typing.TYPE_CHECKING:
    import ray.data


def _host_of(url: str) -> str:
    try:
        rest = url.split("://", 1)[1]
    except IndexError:
        return ""
    return rest.split("/", 1)[0].split("@")[-1].split(":")[0].lower()


def host_link_edges(pages: "ray.data.Dataset",
                    url_col: str = "url",
                    html_col: str = "html") -> pd.DataFrame:
    """Weighted host→host edge table (self-links dropped)."""
    from gruut_ray.pipelines.agg_util import partial_then_merge
    from gruut_ray.stages.extract import extract_links

    def edge_partials(batch: pa.Table) -> pa.Table:
        counts: typing.Dict[typing.Tuple[str, str], int] = {}
        for url, html in zip(batch.column(url_col).to_pylist(),
                             batch.column(html_col).to_pylist()):
            src = _host_of(url or "")
            if not src:
                continue
            for link in extract_links(bytes(html)):
                dst = _host_of(link)
                if dst and dst != src:
                    counts[(src, dst)] = counts.get((src, dst), 0) + 1
        if not counts:
            return pa.table({"src": pa.array([], type=pa.string()),
                             "dst": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        keys = list(counts)
        return pa.table({
            "src": pa.array([k[0] for k in keys], type=pa.string()),
            "dst": pa.array([k[1] for k in keys], type=pa.string()),
            "n": pa.array(list(counts.values()), type=pa.int64()),
        })

    return partial_then_merge(
        pages.select_columns([url_col, html_col]),
        edge_partials, ["src", "dst"], {"n": "sum"})


def pagerank_from_edges(edges: pd.DataFrame, damping: float = 0.85,
                        iters: int = 20,
                        tol: float = 1e-9) -> pd.DataFrame:
    """Driver-side reference power iteration over a (src, dst, n) edge
    table (hosts bounded — see module docstring); returns
    (host, rank) with Σrank = 1.  Used directly below the edge-table
    driver limit and as the golden for the distributed path."""
    hosts = sorted(set(edges["src"]) | set(edges["dst"]))
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    if n == 0:
        return pd.DataFrame(columns=["host", "rank"])
    src = edges["src"].map(idx).to_numpy()
    dst = edges["dst"].map(idx).to_numpy()
    w = edges["n"].to_numpy(dtype=np.float64)
    out_w = np.zeros(n)
    np.add.at(out_w, src, w)
    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        share = rank[src] * w / out_w[src]
        np.add.at(contrib, dst, share)
        dangling = rank[out_w == 0].sum()
        new = (1 - damping) / n + damping * (contrib + dangling / n)
        if np.abs(new - rank).sum() < tol:
            rank = new
            break
        rank = new
    return pd.DataFrame({"host": hosts, "rank": rank})


def host_pagerank(pages: "ray.data.Dataset", damping: float = 0.85,
                  iters: int = 20, top_k: int = 20,
                  driver_edge_limit: int = 2_000_000) -> pd.DataFrame:
    """PageRank over the page corpus's host graph; top-k hosts by rank
    (rank reported as ppm ints for stable comparison).

    Below ``driver_edge_limit`` edge rows the power iteration runs
    driver-side on the reduced edge table; above it, each iteration
    broadcasts the rank vector and scatters (dst, contribution)
    partials over the distributed edge Dataset — both paths iterate
    the same update rule (tested identical on the same edges)."""
    import ray
    import ray.data

    from gruut_ray.pipelines.agg_util import partial_then_merge

    edges = host_link_edges(pages)
    if edges.empty:
        return pd.DataFrame(columns=["host", "rank_ppm"])

    if len(edges) <= driver_edge_limit:
        ranks = pagerank_from_edges(edges, damping=damping, iters=iters)
    else:  # distributed scatter path (same update rule)
        hosts = sorted(set(edges["src"]) | set(edges["dst"]))
        idx = {h: i for i, h in enumerate(hosts)}
        n = len(hosts)
        e = pa.table({
            "src": pa.array(edges["src"].map(idx), type=pa.int64()),
            "dst": pa.array(edges["dst"].map(idx), type=pa.int64()),
            "n": pa.array(edges["n"], type=pa.int64()),
        })
        out_w = np.zeros(n)
        np.add.at(out_w, e.column("src").to_numpy(),
                  e.column("n").to_numpy().astype(np.float64))
        eds = ray.data.from_arrow(e)
        rank = np.full(n, 1.0 / n)
        for _ in range(iters):
            rank_ref = ray.put(rank)

            def scatter(batch: pa.Table, _cache={}) -> pa.Table:
                r = _cache.get(rank_ref)
                if r is None:
                    _cache.clear()
                    r = _cache[rank_ref] = ray.get(rank_ref)
                s = batch.column("src").to_numpy()
                d = batch.column("dst").to_numpy()
                w = batch.column("n").to_numpy().astype(np.float64)
                contrib = np.zeros(len(r))
                np.add.at(contrib, d, r[s] * w / out_w[s])
                nz = np.nonzero(contrib)[0]
                return pa.table({
                    "dst": pa.array(nz, type=pa.int64()),
                    "c": pa.array(contrib[nz], type=pa.float64()),
                })

            parts = partial_then_merge(eds, scatter, ["dst"],
                                       {"c": "sum"})
            contrib = np.zeros(n)
            contrib[parts["dst"].to_numpy()] = parts["c"].to_numpy()
            dangling = rank[out_w == 0].sum()
            rank = (1 - damping) / n + damping * (contrib + dangling / n)
        ranks = pd.DataFrame({"host": hosts, "rank": rank})

    ranks["rank_ppm"] = (ranks["rank"] * 1_000_000).round().astype("int64")
    out = (ranks.sort_values(["rank_ppm", "host"],
                             ascending=[False, True])
           .head(top_k)[["host", "rank_ppm"]]
           .reset_index(drop=True))
    return out
