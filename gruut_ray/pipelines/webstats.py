"""Web-domain operators over Common-Crawl-shaped pages.

A CC-style corpus is processed per *registrable host* at least as often as
per document: politeness grouping, per-domain quality priors, intra-domain
near-duplicate collapse (boilerplate reuse inside one site dwarfs cross-site
duplication).  This module adds the three primitives those jobs share:

* :func:`canonicalize_url_batch` — an Arrow-vectorized URL canonicalizer
  (lowercase scheme/host, strip fragments and default ports, normalize the
  empty path) so that per-host keys agree across crawls;
* :func:`host_stats` — per-host page/byte rollups with the repo's standard
  combiner-before-merge shape;
* :func:`intra_source_dedup` — exact duplicate collapse *within* each
  domain/source, shuffling only (source, 128-bit hash) pairs.

The reference (rhasspy/gruut) has no web layer; these are north-rule
additions for the quality-filter workload (BASELINE.json input_hint:
``url:string`` column on the CC pages table).
"""

from __future__ import annotations

import typing

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

if typing.TYPE_CHECKING:
    import ray.data

# scheme :// authority rest — authority ends at the first '/', '?' or '#';
# fragment is stripped before this pattern is applied.
_URL_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
           r"(?P<authority>[^/?#]*)(?P<rest>(?:[/?].*)?)$")
_HOSTPORT_RE = r"^(?P<h>.*?)(?::(?P<p>[0-9]+))?$"
_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80",
                  "wss": "443"}


def canonicalize_url_batch(urls: pa.ChunkedArray | pa.Array
                           ) -> typing.Tuple[pa.Array, pa.Array]:
    """Vectorized URL canonicalization; returns ``(canonical, host)``.

    Rules (the stable subset of RFC 3986 §6.2 normalization a dedup key
    needs): drop the fragment, lowercase scheme and host, drop the scheme's
    default port, rewrite an empty path as ``/``.  Userinfo, query order,
    percent-escapes and dot-segments are preserved as-is — rewriting those
    can change semantics, so they stay out of a dedup key.  Rows that do
    not parse as absolute URLs pass through unchanged with a null host.

    Every step is a pyarrow kernel over the whole column — no per-row
    Python — so this sits cheaply in front of the per-host shuffles."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    urls = pc.cast(urls, pa.string())
    defragged = pc.replace_substring_regex(urls, pattern=r"#.*$",
                                           replacement="")
    parts = pc.extract_regex(defragged, pattern=_URL_RE)
    ok = pc.is_valid(parts)
    scheme = pc.utf8_lower(pc.struct_field(parts, [0]))
    authority = pc.struct_field(parts, [1])
    rest = pc.struct_field(parts, [2])
    # split userinfo@ off the authority (kept verbatim in the output)
    userinfo = pc.extract_regex(authority, pattern=r"^(?P<u>[^@]*@)")
    user_prefix = pc.coalesce(
        pc.struct_field(userinfo, [0]), pa.scalar("", pa.string()))
    hostport = pc.replace_substring_regex(authority, pattern=r"^[^@]*@",
                                          replacement="")
    hp = pc.extract_regex(hostport, pattern=_HOSTPORT_RE)
    host = pc.utf8_lower(pc.struct_field(hp, [0]))
    port = pc.struct_field(hp, [1])
    # drop the port when it is the scheme's default
    default_port = pc.case_when(
        pc.make_struct(*[pc.equal(scheme, s) for s in _DEFAULT_PORTS]),
        *[pa.scalar(p, pa.string()) for p in _DEFAULT_PORTS.values()],
        pa.scalar("", pa.string()))
    # an unmatched optional group extracts as "" (not null) — treat both
    # as "no port"
    port = pc.coalesce(port, "")
    keep_port = pc.and_(pc.not_equal(port, ""),
                        pc.not_equal(port, default_port))
    port_part = pc.if_else(
        keep_port,
        pc.binary_join_element_wise(":", pc.coalesce(port, ""), ""),
        pa.scalar("", pa.string()))
    # empty path (and no query) → "/"
    path = pc.if_else(pc.equal(rest, ""), pa.scalar("/", pa.string()), rest)
    canon = pc.binary_join_element_wise(
        scheme, "://", user_prefix, host, port_part, path, "")
    return (pc.if_else(ok, canon, urls).combine_chunks()
            if isinstance(canon, pa.ChunkedArray) else pc.if_else(ok, canon, urls),
            pc.if_else(ok, host, pa.scalar(None, pa.string())))


def add_host_column(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """map_batches kernel: append ``canonical_url`` and ``host`` columns."""
    canon, host = canonicalize_url_batch(batch.column(url_col))
    batch = batch.append_column("canonical_url", canon)
    return batch.append_column("host", host)


def host_stats(pages: "ray.data.Dataset", url_col: str = "url",
               html_col: str = "html") -> pd.DataFrame:
    """Per-host rollup over CC-shaped pages: page count and raw HTML bytes.

    Scale shape: the canonicalizer + a per-batch groupby combine each block
    to ≤ (hosts-in-block) rows before :func:`partial_then_merge`; nothing
    wider than (hosts × blocks) ever moves."""
    from gruut_ray.pipelines.agg_util import partial_then_merge

    def partials(batch: pa.Table) -> pa.Table:
        _, host = canonicalize_url_batch(batch.column(url_col))
        df = pa.table({
            "host": host,
            "html_bytes": pc.cast(pc.binary_length(batch.column(html_col)),
                                  pa.int64()),
        }).to_pandas()
        agg = df.groupby("host", as_index=False, dropna=False).agg(
            n_pages=("html_bytes", "size"),
            total_html_bytes=("html_bytes", "sum"))
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(
        pages.select_columns([url_col, html_col]), partials, ["host"],
        {"n_pages": "sum", "total_html_bytes": "sum"},
        exact_int_cols=["total_html_bytes"])
    out["total_html_bytes"] = out["total_html_bytes"].astype("int64")
    return out


def intra_source_dedup(ds: "ray.data.Dataset", group_col: str = "source",
                       text_col: str = "text",
                       num_partitions: int = 16) -> pd.DataFrame:
    """Exact duplicate collapse WITHIN each domain/source group: per group,
    the number of pages and the number of distinct texts (most CC duplicate
    mass is same-site boilerplate, so per-domain dedup is the standard
    first pass before any cross-site near-dup join).

    Scale shape: each batch combines to distinct (group, 128-bit hash,
    count) triples, the distributed groupby shuffles only those — never
    text — and the per-group rollup combines again per batch before the
    tiny driver merge.  Mirrors ``exact_dedup`` (dedup.py) with a
    composite key."""
    import hashlib

    from ray.data.aggregate import Sum

    from gruut_ray.pipelines.agg_util import partial_then_merge

    def pair_partials(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        hashes = [hashlib.blake2b((t or "").encode(),
                                  digest_size=16).hexdigest()
                  for t in texts]
        df = pd.DataFrame({
            "grp": batch.column(group_col).to_pylist(),
            "h": hashes,
        })
        agg = df.groupby(["grp", "h"], as_index=False, dropna=False) \
            .size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    pairs = (ds.select_columns([group_col, text_col])
             .map_batches(pair_partials, batch_format="pyarrow")
             .groupby(["grp", "h"])
             .aggregate(Sum("n", alias_name="n"))
             .repartition(num_partitions))  # merge schema-less empties

    def group_partials(batch: pa.Table) -> pa.Table:
        df = pa.table({
            "grp": batch.column("grp"),
            "n": pc.cast(batch.column("n"), pa.int64()),
        }).to_pandas()
        agg = df.groupby("grp", as_index=False, dropna=False).agg(
            n_docs=("n", "sum"), n_unique=("n", "size"))
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(pairs, group_partials, ["grp"],
                             {"n_docs": "sum", "n_unique": "sum"})
    out = out.rename(columns={"grp": group_col})
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_unique"] = out["n_unique"].astype("int64")
    return out


def url_policy_filter(pages: "ray.data.Dataset",
                      blocked_hosts: typing.Iterable[str] = (),
                      blocked_patterns: typing.Iterable[str] = (),
                      url_col: str = "url") -> "ray.data.Dataset":
    """Deny-list URL filtering (the blocklist pass every CC-style pipeline
    runs before content work): drop pages whose canonical host is on
    ``blocked_hosts`` or whose canonical URL matches any of
    ``blocked_patterns`` (RE2 regexes).  Returns the surviving rows with
    ``canonical_url``/``host`` appended (downstream stages reuse them),
    plus a ``drop_reason`` column on the dropped rows — callers keep
    either side via a cheap filter.

    Scale shape: the host set broadcasts once via ``ray.put`` (read per
    actor, never per batch); patterns compile into ONE alternation applied
    as a single vectorized ``pc.match_substring_regex`` pass; no shuffle.
    Rows with an unparseable URL (null host) are kept — a malformed URL is
    a quality signal, not a policy match."""
    import ray

    hosts_ref = ray.put(frozenset(h.lower() for h in blocked_hosts))
    pattern = "|".join(f"(?:{p})" for p in blocked_patterns)

    def apply_policy(batch: pa.Table, _cache={}) -> pa.Table:
        if "hosts" not in _cache:
            _cache["hosts"] = ray.get(hosts_ref)
        hosts = _cache["hosts"]
        batch = add_host_column(batch, url_col=url_col)
        host_np = batch.column("host").to_numpy(zero_copy_only=False)
        blocked_host = np.array(
            [h in hosts if h is not None else False for h in host_np],
            dtype=bool) if hosts else np.zeros(len(host_np), dtype=bool)
        if pattern:
            m = pc.match_substring_regex(batch.column("canonical_url"),
                                         pattern)
            blocked_pat = pc.fill_null(m, False).to_numpy(
                zero_copy_only=False)
        else:
            blocked_pat = np.zeros(len(host_np), dtype=bool)
        reason = np.where(blocked_host, "blocked_host",
                          np.where(blocked_pat, "blocked_pattern", ""))
        return batch.append_column("drop_reason",
                                   pa.array(reason, type=pa.string()))

    return pages.map_batches(apply_policy, batch_format="pyarrow")


def group_prior_flags(ds: "ray.data.Dataset", group_col: str = "source",
                      value_col: str = "n_chars") -> pd.DataFrame:
    """Two-pass per-group prior rescoring — the aggregate → broadcast →
    rescore shape a CC pipeline uses for per-domain quality priors: pass 1
    computes each group's (count, sum) prior, pass 2 re-scans the corpus
    with the tiny prior table broadcast via ``ray.put`` and counts rows
    strictly above their own group's mean.  No shuffle joins: the prior
    table is (num groups) rows, read once per task.

    The above-mean test is exact integer arithmetic
    (``value*n_docs > total``), so the DuckDB oracle compares bit-for-bit
    with no float mean in between."""
    import ray

    from gruut_ray.pipelines.agg_util import partial_then_merge

    def prior_partials(batch: pa.Table) -> pa.Table:
        df = pa.table({
            "grp": batch.column(group_col),
            "v": pc.cast(batch.column(value_col), pa.int64()),
        }).to_pandas()
        agg = df.groupby("grp", as_index=False, dropna=False).agg(
            n_docs=("v", "size"), total=("v", "sum"))
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    slim = ds.select_columns([group_col, value_col])
    prior = partial_then_merge(slim, prior_partials, ["grp"],
                               {"n_docs": "sum", "total": "sum"},
                               exact_int_cols=["total"])
    prior_map = {g: (int(n), int(t)) for g, n, t in
                 zip(prior["grp"], prior["n_docs"], prior["total"])}
    prior_ref = ray.put(prior_map)

    def rescore(batch: pa.Table, _cache={}) -> pa.Table:
        if "prior" not in _cache:
            _cache["prior"] = ray.get(prior_ref)
        pm = _cache["prior"]
        grp = batch.column(group_col).to_pylist()
        v = pc.cast(batch.column(value_col),
                    pa.int64()).to_numpy(zero_copy_only=False)
        n = np.fromiter((pm[g][0] for g in grp), dtype=np.int64,
                        count=len(grp))
        tot = np.fromiter((pm[g][1] for g in grp), dtype=object,
                          count=len(grp))  # python ints: no int64 overflow
        above = np.fromiter(
            (int(vi) * int(ni) > ti for vi, ni, ti in zip(v, n, tot)),
            dtype=bool, count=len(grp))
        df = pd.DataFrame({"grp": grp, "above": above})
        agg = df.groupby("grp", as_index=False, dropna=False).agg(
            n_above=("above", "sum"), n_docs=("above", "size"))
        agg["n_above"] = agg["n_above"].astype("int64")
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    out = partial_then_merge(slim, rescore, ["grp"],
                             {"n_above": "sum", "n_docs": "sum"})
    out = out.rename(columns={"grp": group_col})
    out["n_above"] = out["n_above"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    return out
