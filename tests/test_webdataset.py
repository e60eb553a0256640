"""WebDataset tar sink (sources/webdataset.py): round-trip, sharding,
manifest lineage."""

import json
import os
import tarfile

import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs(n=250):
    return pd.DataFrame({
        "doc_id": range(n),
        "text": [f"doc {i} body" for i in range(n)],
        "lang": ["en" if i % 2 else "de" for i in range(n)],
    })


def test_webdataset_round_trip(ray_session, tmp_path):
    import ray.data

    from gruut_ray.sources.webdataset import (read_webdataset_keys,
                                              write_webdataset)

    df = _docs()
    out = str(tmp_path / "wds")
    manifest = write_webdataset(
        ray.data.from_pandas(df).repartition(4), out,
        meta_cols=["lang"], rows_per_shard=40)
    assert manifest["num_rows"] == len(df)
    assert sum(s["rows"] for s in manifest["shards"]) == len(df)
    # every shard respects the row bound
    assert all(s["rows"] <= 40 for s in manifest["shards"])
    # every doc appears exactly once across all shards
    keys = read_webdataset_keys(out)
    assert sorted(keys) == [f"{i:012d}" for i in range(len(df))]


def test_webdataset_payload_and_meta(ray_session, tmp_path):
    import ray.data

    from gruut_ray.sources.webdataset import write_webdataset

    df = _docs(10)
    out = str(tmp_path / "wds2")
    manifest = write_webdataset(ray.data.from_pandas(df), out,
                                meta_cols=["lang"], rows_per_shard=100)
    shard = os.path.join(out, manifest["shards"][0]["shard"])
    with tarfile.open(shard) as tf:
        names = tf.getnames()
        txt = tf.extractfile(f"{3:012d}.txt").read().decode()
        meta = json.loads(tf.extractfile(f"{3:012d}.json").read())
    assert txt == "doc 3 body"
    assert meta == {"lang": "en"}
    # sample entries are adjacent: key.txt directly followed by key.json
    i = names.index(f"{3:012d}.txt")
    assert names[i + 1] == f"{3:012d}.json"


def test_webdataset_rerun_overwrites_not_duplicates(ray_session, tmp_path):
    import ray.data

    from gruut_ray.sources.webdataset import write_webdataset

    df = _docs(60)
    out = str(tmp_path / "wds3")
    ds = ray.data.from_pandas(df).repartition(3)
    m1 = write_webdataset(ds, out, rows_per_shard=25)
    m2 = write_webdataset(ds, out, rows_per_shard=25)
    assert [s["shard"] for s in m1["shards"]] == \
        [s["shard"] for s in m2["shards"]]
    assert m2["num_rows"] == 60


def test_webdataset_stale_shards_removed_on_rewrite(ray_session, tmp_path):
    """A smaller re-run deletes shards the new manifest doesn't list —
    glob-based loaders must never see rows from a previous run."""
    import os

    import ray.data

    from gruut_ray.sources.webdataset import write_webdataset

    out = str(tmp_path / "wds4")
    write_webdataset(ray.data.from_pandas(_docs(100)), out,
                     rows_per_shard=20)
    assert len([f for f in os.listdir(out) if f.endswith(".tar")]) == 5
    m2 = write_webdataset(ray.data.from_pandas(_docs(30)), out,
                          rows_per_shard=20)
    tars = sorted(f for f in os.listdir(out) if f.endswith(".tar"))
    assert tars == sorted(s["shard"] for s in m2["shards"])
