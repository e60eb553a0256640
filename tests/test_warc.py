"""WARC source (sources/warc.py): record round-trip, gzip members,
Ray read path, extract integration."""

import numpy as np
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _pages(n=20, seed=0):
    from gruut_ray.sources.synth import make_batch_for_ids

    out = make_batch_for_ids(list(range(n)), seed=seed)
    return [{"url": out["url"][i], "warc_ts": out["warc_ts"][i],
             "html": out["html"][i], "text": out["text"][i]}
            for i in range(n)]


@pytest.mark.parametrize("suffix", ["warc", "warc.gz"])
def test_warc_round_trip(ray_session, tmp_path, suffix):
    from gruut_ray.sources.warc import parse_warc, write_warc

    pages = _pages(15)
    path = str(tmp_path / f"crawl-00000.{suffix}")
    assert write_warc(path, pages) == 15
    recs = list(parse_warc(open(path, "rb").read()))
    assert len(recs) == 15
    for p, r in zip(pages, recs):
        assert r["url"] == p["url"]
        assert r["html"] == p["html"]          # byte-identical payload
        assert r["warc_ts"] == np.datetime64(p["warc_ts"], "s")


def test_read_warc_dataset_and_extract(ray_session, tmp_path):
    """Multi-file read → page table → extract_text byte-identity."""
    from gruut_ray.sources.warc import read_warc, write_warc
    from gruut_ray.stages.extract import extract_text

    pages = _pages(30)
    paths = []
    for shard in range(3):
        path = str(tmp_path / f"crawl-{shard:05d}.warc.gz")
        write_warc(path, pages[shard * 10:(shard + 1) * 10])
        paths.append(path)

    ds = read_warc(paths)
    got = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(got) == 30
    assert set(got.columns) == {"url", "warc_ts", "html"}
    by_url = {p["url"]: p for p in pages}
    for _, row in got.iterrows():
        src = by_url[row["url"]]
        assert bytes(row["html"]) == bytes(src["html"])
        # the html survives WARC round-trip well enough that text
        # extraction reproduces the original text byte-for-byte
        assert extract_text(bytes(row["html"])) == src["text"]


def test_parse_warc_skips_non_response_records(ray_session):
    from gruut_ray.sources.warc import build_record, parse_warc

    info = (b"WARC/1.0\r\n"
            b"WARC-Type: warcinfo\r\n"
            b"Content-Type: application/warc-fields\r\n"
            b"Content-Length: 9\r\n\r\n"
            b"robots: x\r\n\r\n")
    rec = build_record("https://a.example/1",
                       np.datetime64("2024-01-02T03:04:05"), b"<p>hi</p>")
    recs = list(parse_warc(info + rec))
    assert len(recs) == 1
    assert recs[0]["html"] == b"<p>hi</p>"
