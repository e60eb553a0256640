"""Inverted-index build + bucket-pruned lookup (pipelines/index.py)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from gruut_ray.pipelines.index import (_bucket_of, build_inverted_index,
                                       index_lookup)


def _docs(texts):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.large_string()),
    })).repartition(4)


def test_build_and_lookup_matches_bruteforce(ray_session, tmp_path):
    texts = ["the cat sat", "the cat ran far", "dog ran", "cat cat cat",
             "far away the dog sat", "nothing relevant here"]
    d = str(tmp_path / "idx")
    m = build_inverted_index(_docs(texts), d, num_buckets=4)
    assert m["num_docs"] == 6 and m["num_terms"] > 0

    # brute-force expected scores
    tf = {}
    for i, t in enumerate(texts):
        for w in t.split():
            tf[(i, w)] = tf.get((i, w), 0) + 1
    df = {}
    for (_, w) in tf:
        df[w] = df.get(w, 0) + 1
    query = ["cat", "dog"]
    want = {}
    for (i, w), f in tf.items():
        if w in query:
            want[i] = want.get(i, 0) + f * (6 * 1_000_000 // df[w])
    expected = (pd.DataFrame(sorted(want.items()),
                             columns=["doc_id", "score_ppm"])
                .sort_values(["score_ppm", "doc_id"],
                             ascending=[False, True])
                .reset_index(drop=True))
    got = index_lookup(d, query, num_docs=6, num_buckets=4, k=10)
    pd.testing.assert_frame_equal(
        got, expected.astype({"doc_id": "int64", "score_ppm": "int64"}))


def test_lookup_reads_only_query_buckets(ray_session, tmp_path):
    texts = [f"word{i} filler common" for i in range(20)]
    d = str(tmp_path / "idx")
    build_inverted_index(_docs(texts), d, num_buckets=8)
    # postings for a term live only in its md5 bucket file
    b = _bucket_of("common", 8)
    tbl = pq.read_table(os.path.join(d, f"bucket={b}.parquet"))
    assert "common" in set(tbl.column("term").to_pylist())
    for f in os.listdir(d):
        if f == f"bucket={b}.parquet":
            continue
        other = pq.read_table(os.path.join(d, f))
        assert "common" not in set(other.column("term").to_pylist())


def test_lookup_unknown_terms_and_partition_invariance(ray_session,
                                                       tmp_path):
    texts = ["alpha beta", "beta gamma", "gamma alpha beta"]
    d1 = str(tmp_path / "i1")
    d2 = str(tmp_path / "i2")
    build_inverted_index(_docs(texts), d1, num_buckets=2)
    build_inverted_index(_docs(texts).repartition(1), d2, num_buckets=2)
    a = index_lookup(d1, ["beta"], num_docs=3, num_buckets=2)
    b = index_lookup(d2, ["beta"], num_docs=3, num_buckets=2)
    pd.testing.assert_frame_equal(a, b)
    empty = index_lookup(d1, ["zzz"], num_docs=3, num_buckets=2)
    assert empty.empty
