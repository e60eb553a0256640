"""Inverted-index build + bucket-pruned lookup (pipelines/index.py)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from gruut_ray.pipelines.index import (_bucket_fragments, _bucket_of,
                                       build_inverted_index, index_lookup)


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
    # postings for a term live only in its md5 bucket's fragments
    b = _bucket_of("common", 8)
    mine = set()
    for f in _bucket_fragments(d, b):
        mine |= set(pq.read_table(f).column("term").to_pylist())
    assert "common" in mine
    for ob in range(8):
        if ob == b:
            continue
        for f in _bucket_fragments(d, ob):
            other = pq.read_table(f)
            assert "common" not in set(other.column("term").to_pylist())
    # no uncommitted temp files survive a clean build
    for root, _dirs, files in os.walk(d):
        assert not [f for f in files if f.startswith(".tmp")]


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


def test_lookup_merges_bucket_fragments(tmp_path):
    """A bucket split into two fragments (Ray splitting one keyed
    partition into two batches) must score identically to the
    single-fragment layout: per-doc tf sums and df counts distinct
    docs AFTER the merge (ADVICE r04)."""
    post_t = pa.list_(pa.struct([("doc_id", pa.int64()),
                                 ("tf", pa.int64())]))

    def write(dirname, rows):
        d = tmp_path / dirname
        b = _bucket_of("cat", 4)
        bdir = d / f"bucket={b}"
        bdir.mkdir(parents=True)
        for i, (dfs, posts) in enumerate(rows):
            tbl = pa.table({
                "term": pa.array(["cat"] * len(dfs), type=pa.string()),
                "df": pa.array(dfs, type=pa.int64()),
                "postings": pa.array(posts, type=post_t),
            })
            pq.write_table(tbl, str(bdir / f"part-{i:04d}.parquet"))
        return str(d)

    # doc 1 appears in BOTH fragments (partial tfs 2 and 3); doc 2 in one
    split = write("split", [
        ([2], [[{"doc_id": 1, "tf": 2}, {"doc_id": 2, "tf": 1}]]),
        ([1], [[{"doc_id": 1, "tf": 3}]]),
    ])
    merged = write("merged", [
        ([2], [[{"doc_id": 1, "tf": 5}, {"doc_id": 2, "tf": 1}]]),
    ])
    a = index_lookup(split, ["cat"], num_docs=10, num_buckets=4)
    b = index_lookup(merged, ["cat"], num_docs=10, num_buckets=4)
    pd.testing.assert_frame_equal(a, b)
    # df=2 distinct docs -> idf 5_000_000; doc1 score = 5*idf
    assert a.loc[a["doc_id"] == 1, "score_ppm"].iloc[0] == 25_000_000
