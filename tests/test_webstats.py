"""URL canonicalizer + per-host/per-source web operators (webstats.py)."""

import os

import duckdb
import hypothesis
import hypothesis.strategies as st
import pandas as pd
import pyarrow as pa
import pytest

from gruut_ray.pipelines.webstats import (add_host_column,
                                          canonicalize_url_batch)

CASES = [
    # (input, canonical, host)
    ("https://Site3.Example/en/01", "https://site3.example/en/01",
     "site3.example"),
    ("HTTP://WWW.EXAMPLE.COM:80/path?q=1#frag",
     "http://www.example.com/path?q=1", "www.example.com"),
    ("https://example.com:443", "https://example.com/", "example.com"),
    ("https://example.com:8443/x", "https://example.com:8443/x",
     "example.com"),
    ("http://user:pw@Host.com:80/a/b#c", "http://user:pw@host.com/a/b",
     "host.com"),
    ("ftp://FILES.example.com:21/pub", "ftp://files.example.com/pub",
     "files.example.com"),
    ("wss://Chat.Example:443/sock", "wss://chat.example/sock",
     "chat.example"),
    ("ws://x.io:81/q", "ws://x.io:81/q", "x.io"),
    # query with empty path is preserved as-is (path not rewritten when a
    # query follows — rewriting would change the string other tools key on)
    ("https://example.com?q=2", "https://example.com?q=2", "example.com"),
    ("https://example.com/#", "https://example.com/", "example.com"),
    # non-URLs pass through unchanged with a null host
    ("not a url", "not a url", None),
    ("", "", None),
    ("mailto:someone@example.com", "mailto:someone@example.com", None),
]


def test_canonicalize_cases():
    canon, host = canonicalize_url_batch(
        pa.array([c[0] for c in CASES] + [None]))
    assert canon.to_pylist() == [c[1] for c in CASES] + [None]
    assert host.to_pylist() == [c[2] for c in CASES] + [None]


def test_canonicalize_idempotent_on_cases():
    once, _ = canonicalize_url_batch(pa.array([c[0] for c in CASES]))
    twice, _ = canonicalize_url_batch(once)
    assert once.to_pylist() == twice.to_pylist()


_host_st = st.from_regex(r"[A-Za-z]([A-Za-z0-9-]{0,10}\.)?[A-Za-z]{1,8}",
                         fullmatch=True)
_path_st = st.from_regex(r"(/[A-Za-z0-9._~%-]{0,8}){0,3}", fullmatch=True)


@hypothesis.given(
    scheme=st.sampled_from(["http", "HTTP", "https", "HTTPS", "ws"]),
    host=_host_st,
    port=st.sampled_from(["", ":80", ":443", ":8080", ":1"]),
    path=_path_st,
    query=st.sampled_from(["", "?a=1", "?a=1&b=%20"]),
    frag=st.sampled_from(["", "#x", "#a/b?c"]),
)
@hypothesis.settings(max_examples=200, deadline=None)
def test_canonicalize_matches_urllib(scheme, host, port, path, query, frag):
    """Host agrees with urllib.parse; canonical form is idempotent and
    keeps scheme/host lowercase with fragment stripped."""
    from urllib.parse import urlsplit

    url = f"{scheme}://{host}{port}{path}{query}{frag}"
    canon, got_host = canonicalize_url_batch(pa.array([url]))
    canon, got_host = canon.to_pylist()[0], got_host.to_pylist()[0]
    split = urlsplit(url)
    assert got_host == split.hostname
    assert canon.startswith(scheme.lower() + "://" + split.hostname)
    assert "#" not in canon
    default = {"http": ":80", "https": ":443", "ws": ":80"}[scheme.lower()]
    if port == default:
        assert default not in canon
    elif port:
        assert port in canon
    again, _ = canonicalize_url_batch(pa.array([canon]))
    assert again.to_pylist()[0] == canon


def test_add_host_column():
    batch = pa.table({"url": ["https://A.b/x", "nope"], "v": [1, 2]})
    out = add_host_column(batch)
    assert out.column("host").to_pylist() == ["a.b", None]
    assert out.column("canonical_url").to_pylist() == ["https://a.b/x",
                                                       "nope"]


@pytest.fixture(scope="module")
def synth_parquet(tmp_path_factory):
    """Materialize the synth CC pages once for the DuckDB oracle."""
    import pyarrow.parquet as pq

    from gruut_ray.sources.synth import make_batch_for_ids

    out = make_batch_for_ids(list(range(2000)))
    path = str(tmp_path_factory.mktemp("webstats") / "pages.parquet")
    pq.write_table(pa.table({
        "url": pa.array(out["url"], type=pa.string()),
        "html": pa.array(list(out["html"]), type=pa.binary()),
    }), path)
    return path


def test_host_stats_matches_duckdb(synth_parquet, ray_session):
    import ray

    from gruut_ray.pipelines.webstats import host_stats

    got = host_stats(ray.data.read_parquet(synth_parquet))
    want = duckdb.connect().execute(f"""
        SELECT lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#@]*)', 1))
                   AS host,
               count(*) AS n_pages,
               CAST(sum(octet_length(html)) AS BIGINT) AS total_html_bytes
        FROM read_parquet('{synth_parquet}')
        GROUP BY host ORDER BY host
    """).fetchdf()
    got = got.sort_values("host").reset_index(drop=True)
    want = want.sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["host", "n_pages", "total_html_bytes"]].astype(
            {"n_pages": "int64", "total_html_bytes": "int64"}),
        want.astype({"n_pages": "int64", "total_html_bytes": "int64"}))


def test_intra_source_dedup_counts_duplicates(ray_session):
    import ray

    from gruut_ray.pipelines.webstats import intra_source_dedup

    rows = pa.table({
        "source": ["a", "a", "a", "b", "b", "c"],
        "text": ["x", "x", "y", "x", "z", None],
    })
    out = intra_source_dedup(
        ray.data.from_arrow(rows).repartition(3))
    out = out.set_index("source")
    assert out.loc["a", "n_docs"] == 3 and out.loc["a", "n_unique"] == 2
    assert out.loc["b", "n_docs"] == 2 and out.loc["b", "n_unique"] == 2
    assert out.loc["c", "n_docs"] == 1 and out.loc["c", "n_unique"] == 1


def test_url_policy_filter_matches_duckdb(synth_parquet, ray_session):
    """Blocked-host + blocked-pattern counts agree with a DuckDB oracle
    over the same materialized pages; host blocking wins when both hit."""
    import ray

    from gruut_ray.pipelines.webstats import url_policy_filter

    flagged = url_policy_filter(
        ray.data.read_parquet(synth_parquet),
        blocked_hosts=[f"site{i}.example" for i in range(10)],
        blocked_patterns=[r"/zh/"])
    got = (flagged.to_pandas().groupby("drop_reason", dropna=False)
           .size().to_dict())
    want = duckdb.connect().execute(f"""
        SELECT CASE
            WHEN lower(regexp_extract(url,
                 '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#@:]*)', 1))
                 SIMILAR TO 'site[0-9]\\.example' THEN 'blocked_host'
            WHEN regexp_matches(url, '/zh/') THEN 'blocked_pattern'
            ELSE '' END AS drop_reason,
            count(*) AS n
        FROM read_parquet('{synth_parquet}') GROUP BY 1
    """).fetchdf().set_index("drop_reason")["n"].to_dict()
    assert got == want
    assert set(want) == {"", "blocked_host", "blocked_pattern"}


def test_url_policy_filter_unparseable_url_kept(ray_session):
    import ray

    from gruut_ray.pipelines.webstats import url_policy_filter

    rows = pa.table({"url": ["::nope::", "https://bad.example/x"]})
    out = url_policy_filter(ray.data.from_arrow(rows),
                            blocked_hosts=["bad.example"]).to_pandas()
    by_url = out.set_index("url")["drop_reason"].to_dict()
    assert by_url["::nope::"] == ""
    assert by_url["https://bad.example/x"] == "blocked_host"


def test_cc_end_to_end_counters(ray_session):
    """Composed pipeline invariants: blocked count matches the oracle
    count of blocked hosts/patterns; kept ≤ survivors; per-host unique ≤
    kept; all extract byte-identities held (in-stream assert)."""
    import ray

    from gruut_ray.pipelines.quality_filter import cc_end_to_end
    from gruut_ray.sources.synth import make_batch_for_ids, synth_dataset

    n = 1000
    blocked = [f"site{i}.example" for i in range(10)]
    out = cc_end_to_end(synth_dataset(n), blocked_hosts=blocked,
                        use_ppl=False).iloc[0]

    raw = make_batch_for_ids(list(range(n)))
    import re
    exp_blocked = sum(
        1 for u in raw["url"]
        if u.split("://")[1].split("/")[0] in blocked or re.search("/zh/", u))
    assert out["n_pages"] == n
    assert out["n_blocked"] == exp_blocked
    assert 0 < out["n_kept"] <= n - exp_blocked
    assert 0 < out["n_unique_per_host"] <= out["n_kept"]
