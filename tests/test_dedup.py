"""Dedup operators: exact, MinHash+LSH (distributed label propagation),
SimHash, n-gram Jaccard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gruut_ray.pipelines.dedup import (
    MinHasher,
    minhash_lsh_dedup,
    ngram_jaccard,
    simhash64,
)


def _docs_table(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    })


BASE = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest looking for tasty food")


def test_minhash_similarity_estimates():
    mh = MinHasher(128)
    s1 = mh.signature(BASE)
    s2 = mh.signature(BASE)
    assert (s1 == s2).all()  # deterministic
    near = mh.signature(BASE.replace("lazy", "sleepy"))
    far = mh.signature("completely different text about other things entirely")
    assert (s1 == near).mean() > 0.6
    assert (s1 == far).mean() < 0.2


def test_minhash_lsh_dedup_keeps_min_id(ray_session):
    import ray.data

    rows = [
        (10, BASE),
        (11, BASE),                      # exact dup of 10
        (12, BASE + " extra"),           # near dup of 10
        (20, "a totally unrelated document about ray data pipelines and "
             "arrow tables flowing through actor pools at scale"),
        (30, "short unique text that matches nothing else in this corpus "
             "because its words are rare: zygote quasar bumblebee"),
    ]
    ds = ray.data.from_arrow(_docs_table(rows))
    kept = minhash_lsh_dedup(ds, jaccard_threshold=0.7).to_pandas()
    ids = sorted(kept["doc_id"].tolist())
    assert 10 in ids          # min id of the dup component survives
    assert 11 not in ids
    assert 20 in ids and 30 in ids


def test_minhash_lsh_dedup_no_dups_is_identity(ray_session):
    import ray.data

    rows = [(i, f"unique document number {i} with distinct words "
             + " ".join(f"tok{i}_{j}" for j in range(20))) for i in range(6)]
    ds = ray.data.from_arrow(_docs_table(rows))
    kept = minhash_lsh_dedup(ds, jaccard_threshold=0.8).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == list(range(6))


def test_minhash_chain_component_collapses(ray_session):
    # A~B, B~C but A!~C: one surviving representative (min id) via label
    # propagation across the chain
    import ray.data

    a = BASE
    b = BASE.replace("quick", "swift").replace("lazy", "sleepy")
    c = b.replace("brown", "black").replace("dog", "cat")
    ds = ray.data.from_arrow(_docs_table([(1, a), (2, b), (3, c)]))
    kept = minhash_lsh_dedup(ds, jaccard_threshold=0.55,
                             max_label_rounds=4).to_pandas()
    ids = sorted(kept["doc_id"].tolist())
    assert ids[0] == 1
    assert len(ids) < 3


def test_simhash_hamming_locality():
    h1 = simhash64(BASE)
    h2 = simhash64(BASE.replace("lazy", "sleepy"))
    h3 = simhash64("entirely different words everywhere nothing shared")
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(h1, h2) < ham(h1, h3)
    assert ham(h1, h2) <= 12


def test_ngram_jaccard():
    assert ngram_jaccard(BASE, BASE) == 1.0
    assert ngram_jaccard(BASE, "nothing in common here at all") == 0.0
    mid = ngram_jaccard(BASE, BASE + " with a small suffix added")
    assert 0.5 < mid < 1.0


def test_ngram_verified_dedup(ray_session):
    import ray.data

    rows = [
        (1, BASE),
        (2, BASE + " tail"),            # true near-dup (high word-3gram J)
        (9, "entirely different words everywhere nothing shared with base "
            "content whatsoever in any shingle or gram"),
    ]
    ds = ray.data.from_arrow(_docs_table(rows))
    kept = minhash_lsh_dedup(ds, jaccard_threshold=0.6,
                             verify="ngram").to_pandas()
    ids = sorted(kept["doc_id"].tolist())
    assert ids == [1, 9]


def test_simhash_signatures_frozen_fixture():
    """Frozen signature goldens over real sf0.001 docs (VERDICT r01 #9):
    any change to the simhash kernel that alters outputs fails here."""
    import json
    import os

    import pyarrow.parquet as pq

    fix_path = os.path.join(os.path.dirname(__file__),
                            "fixtures_simhash_sf0001.json")
    with open(fix_path) as f:
        expected = {int(k): v for k, v in json.load(f).items()}
    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"])
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    for doc_id, want in expected.items():
        assert simhash64(texts[doc_id] or "") == want, doc_id


def test_minhash_dedup_count_matches_exact_jaccard(ray_session):
    """minhash_lsh_dedup survivor count vs brute-force exact n-gram
    Jaccard ground truth on sf0.001 (VERDICT r01 #9)."""
    import pyarrow.parquet as pq
    import ray.data

    from gruut_ray.pipelines.dedup import minhash_lsh_dedup, ngram_jaccard

    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"])
    ids = tbl["doc_id"].to_pylist()
    texts = tbl["text"].to_pylist()

    # ground truth: all-pairs exact Jaccard >= threshold -> components ->
    # min-id survivor per component
    threshold = 0.9
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    by_id = dict(zip(ids, texts))
    id_list = sorted(ids)
    for a_i in range(len(id_list)):
        for b_i in range(a_i + 1, len(id_list)):
            a, b = id_list[a_i], id_list[b_i]
            if ngram_jaccard(by_id[a] or "", by_id[b] or "") >= threshold:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    expected_survivors = len({find(i) for i in ids})

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text"])
    kept = minhash_lsh_dedup(ds, jaccard_threshold=threshold,
                             verify="ngram").count()
    assert kept == expected_survivors


def test_minhash_small_vs_distributed_paths_identical(ray_session):
    """The driver-pairs cut-over must not change results: run both paths
    on the same input and compare surviving id sets."""
    import ray.data

    from gruut_ray.pipelines.dedup import minhash_lsh_dedup

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text"])
    def ids_of(out):
        return sorted(r["doc_id"]
                      for r in out.select_columns(["doc_id"]).take_all())

    small = ids_of(minhash_lsh_dedup(ds, jaccard_threshold=0.9))
    # mid path: driver-side banding, distributed verify + propagation
    mid = ids_of(minhash_lsh_dedup(ds, jaccard_threshold=0.9,
                                   driver_pairs_limit=0))
    # fully distributed path (what runs at 10^12-doc scale)
    dist = ids_of(minhash_lsh_dedup(ds, jaccard_threshold=0.9,
                                    driver_pairs_limit=0,
                                    driver_explode_limit=0))
    assert small == mid == dist


def test_minhash_never_materializes_exploded_banding(ray_session):
    """VERDICT r02 #1: the (corpus × bands) exploded banding table is the
    widest intermediate and must STREAM into the collision groupby, never
    be pinned with .materialize() (at 10^12 docs that is ~3×10^14 B).
    Tripwire: run the fully distributed path and record the row count of
    every materialized intermediate — none may equal corpus × bands."""
    import ray.data

    from gruut_ray.pipelines import dedup as dedup_mod

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text"])
    n_docs = ds.count()
    bands = 16
    mat_rows = []
    orig = ray.data.Dataset.materialize

    def spy(self):
        out = orig(self)
        mat_rows.append(out.count())  # metadata-only on materialized data
        return out

    ray.data.Dataset.materialize = spy
    try:
        out = dedup_mod.minhash_lsh_dedup(
            ds, bands=bands, jaccard_threshold=0.9,
            driver_pairs_limit=0, driver_explode_limit=0)
        out.count()
    finally:
        ray.data.Dataset.materialize = orig
    assert mat_rows, "distributed path should materialize small tables"
    assert n_docs * bands not in mat_rows, (
        f"full-width exploded table pinned: {mat_rows}")


def test_winnowing_guarantee_and_determinism():
    """Winnowing (Schleimer et al. 2003) invariants: any shared substring
    of length >= k + window - 1 shares a fingerprint; disjoint texts
    share none; output is deterministic."""
    from gruut_ray.pipelines.text_stats import winnow_fingerprints

    k, w = 5, 4
    shared = "a very long shared passage of text"
    a = winnow_fingerprints("PREFIX ONE " + shared + " SUFFIX ONE", k, w)
    b = winnow_fingerprints("other start " + shared + " other end", k, w)
    assert set(a.tolist()) & set(b.tolist())
    c = winnow_fingerprints("zzz completely different material qqq", k, w)
    assert not (set(a.tolist()) & set(c.tolist()))
    assert winnow_fingerprints("hello world", k, w).tolist() == \
        winnow_fingerprints("hello world", k, w).tolist()
    # density: at most one fingerprint per window position
    long = winnow_fingerprints("x" * 50 + "abcdefghijklmnop" * 5, k, w)
    assert 0 < len(long) <= 50 + 80


def test_winnow_sketches_pipeline(ray_session):
    import ray.data

    from gruut_ray.pipelines.text_stats import winnow_sketches

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text"])
    out = winnow_sketches(ds).select_columns(
        ["doc_id", "sketch_size"]).to_pandas()
    assert len(out) == ds.count()
    assert (out["sketch_size"] > 0).all()


def test_repetition_stats_batch_matches_naive():
    """Gopher-style word-repetition signals: engine batch kernel vs a
    naive per-doc Counter, incl. the SQL edge convention (empty/ws-only
    text splits to the [""] singleton → n_words = 1)."""
    import collections

    import pyarrow as pa

    from gruut_ray.pipelines.text_stats import repetition_stats_batch

    texts = [
        "a b a c a",                 # repetition: a×3
        "unique words only here",
        "x x x x x x",               # fully duplicated
        "  padded   whitespace  a ", # trim + multi-space split
        "",                          # SQL singleton convention
        "   ",
        "tab\tand\nnewline tab",
    ]
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = repetition_stats_batch(batch).to_pandas().set_index("doc_id")
    for i, t in enumerate(texts):
        words = t.strip().split() if t.strip() else [""]
        c = collections.Counter(words)
        assert out.loc[i, "n_words"] == len(words), t
        assert out.loc[i, "n_distinct_words"] == len(c), t
        assert out.loc[i, "max_word_count"] == max(c.values()), t


def _line_dedup_naive(docs: dict, min_docs: int = 2):
    """Reference implementation: per-line distinct-doc counts, then
    per-doc removal accounting."""
    import collections

    by_line = collections.defaultdict(set)
    for i, t in docs.items():
        for line in t.split("\n"):
            by_line[line].add(i)
    dups = {l for l, ids in by_line.items() if len(ids) >= min_docs}
    out = {}
    for i, t in docs.items():
        lines = t.split("\n")
        kept = [l for l in lines if l not in dups]
        out[i] = (len(lines), len(lines) - len(kept),
                  sum(len(l) for l in kept) + max(len(kept) - 1, 0))
    return out


@pytest.mark.parametrize("path", ["broadcast", "join"])
def test_line_dedup_stats_paths_match_naive(ray_session, path):
    """C4 line-dedup rule: both the broadcast and the semi-join path
    reproduce a naive per-line accounting, including all-lines-removed
    and empty-doc edges."""
    import pandas as pd
    import ray

    from gruut_ray.pipelines.dedup import line_dedup_stats

    boiler = "subscribe to our newsletter"
    docs = {
        1: f"unique opening\n{boiler}\nunique close",
        2: f"{boiler}\nanother body line\n{boiler}",  # dup twice in-doc
        3: "totally unique document",
        4: boiler,              # one line, fully removed
        5: "",                  # empty: [''] — unique at min_docs=2? no:
        6: "",                  # two empty docs share the '' line
        7: "x\n\ny",            # interior blank line joins the '' group
    }
    expected = _line_dedup_naive(docs)
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    out = line_dedup_stats(
        ray.data.from_pandas(df).repartition(3), min_docs=2,
        force_path=path).to_pandas().set_index("doc_id")
    for i, (nl, rm, clean) in expected.items():
        assert out.loc[i, "n_lines"] == nl, (path, i)
        assert out.loc[i, "n_removed_lines"] == rm, (path, i)
        assert out.loc[i, "n_chars_clean"] == clean, (path, i)


def test_substring_dup_pairs_planted_span(ray_session):
    """Docs sharing a long span are flagged; unrelated docs are not."""
    import ray.data

    from gruut_ray.pipelines.dedup import substring_dup_pairs

    import numpy as np
    rng = np.random.default_rng(13)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    def rand_text(n):
        return " ".join(rng.choice(words, size=n))
    span = rand_text(80)  # ~500 chars, well above k+window-1
    docs = []
    for i in range(30):
        body = rand_text(120)
        if i in (3, 17):  # plant the shared span in two docs
            body = body[:200] + " " + span + " " + body[200:]
        docs.append({"doc_id": i, "text": body})
    ds = ray.data.from_items(docs).repartition(4)
    out = substring_dup_pairs(ds, k=20, window=16, min_shared=2)
    assert {(3, 17)} <= set(zip(out["a"], out["b"]))
    # the planted pair dominates every accidental one
    top = out.sort_values("shared", ascending=False).iloc[0]
    assert (top["a"], top["b"]) == (3, 17)


def test_substring_dup_pairs_driver_vs_distributed(ray_session):
    import ray.data

    from gruut_ray.pipelines.dedup import substring_dup_pairs

    docs = [{"doc_id": i,
             "text": f"common boilerplate footer shared by all pages "
                     f"number {i} " + "x " * 50}
            for i in range(20)]
    ds = ray.data.from_items(docs)
    drv = substring_dup_pairs(ds, k=10, window=8, min_shared=1)
    dist = substring_dup_pairs(ds, k=10, window=8, min_shared=1,
                               driver_limit=0)
    pd.testing.assert_frame_equal(drv, dist)
    assert len(drv) > 0  # the shared boilerplate links the docs


def test_connected_components_path_and_ring(ray_session):
    """Multi-hop propagation: a diameter-9 path and a disjoint ring must
    converge to per-component min labels (LSH near-cliques converge in
    one round; these need several)."""
    import ray

    from gruut_ray.pipelines.dedup import connected_components

    path = [(i, i + 1) for i in range(100, 109)]          # 100..109 chain
    ring = [(200 + i, 200 + (i + 1) % 6) for i in range(6)]  # 200..205
    edges = pa.table({
        "src": pa.array([e[0] for e in path + ring], type=pa.int64()),
        "dst": pa.array([e[1] for e in path + ring], type=pa.int64()),
    })
    labels = connected_components(
        ray.data.from_arrow(edges).repartition(4).materialize(),
        max_rounds=10).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    assert all(got[n] == 100 for n in range(100, 110))
    assert all(got[n] == 200 for n in range(200, 206))


def test_connected_components_single_edge(ray_session):
    import ray

    from gruut_ray.pipelines.dedup import connected_components

    edges = pa.table({"src": pa.array([7], type=pa.int64()),
                      "dst": pa.array([3], type=pa.int64())})
    labels = connected_components(
        ray.data.from_arrow(edges).materialize()).to_pandas()
    assert dict(zip(labels["node"], labels["label"])) == {7: 3, 3: 3}


def test_ngram_jaccard_pairs_dual_path_identity(ray_session):
    """Driver path and keyed-repartition path must be output-identical
    (cut-over contract)."""
    import pandas as pd
    import ray.data

    from gruut_ray.pipelines.dedup import ngram_jaccard_pairs

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"])
    drv = ngram_jaccard_pairs(ds)
    dist = ngram_jaccard_pairs(ds, driver_limit=0)
    pd.testing.assert_frame_equal(drv, dist)
    assert len(drv) > 0  # blocking key must yield real candidates


def test_edit_distance_pairs_dual_path_and_bruteforce(ray_session):
    import duckdb
    import ray.data

    from gruut_ray.pipelines.dedup import edit_distance_name_pairs

    rng = np.random.default_rng(19)
    vocab = ["red widget", "red midget", "blue bolt", "blue belt",
             "blue bolts", "large gear", "large year", "small gizmo",
             "smol gizmo", "x", "xy", "abcdefghij", "abcdefghiz"]
    names = rng.choice(vocab, 400)
    df = pd.DataFrame({"p_name": names})
    ds = ray.data.from_pandas(df).repartition(4)

    driver = edit_distance_name_pairs(ds, grid_block=2048)
    grid = edit_distance_name_pairs(ds, grid_block=3)  # force grid path
    pd.testing.assert_frame_equal(driver, grid)

    want = duckdb.sql("""
        WITH n AS (SELECT p_name, CAST(count(*) AS BIGINT) AS n_rows
                   FROM df GROUP BY 1)
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
               CAST(a.n_rows * b.n_rows AS BIGINT) AS pair_weight
        FROM n a JOIN n b ON a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 2
        ORDER BY 1, 2
    """).df()
    pd.testing.assert_frame_equal(driver, want.astype(
        driver.dtypes.to_dict()))


def test_levenshtein_banded_matches_full_dp():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gruut_ray.pipelines.dedup import _levenshtein_banded

    def full_dp(a, b):
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[lb]

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="abcx ", max_size=12),
           st.text(alphabet="abcx ", max_size=12),
           st.integers(min_value=0, max_value=4))
    def check(a, b, k):
        d = full_dp(a, b)
        got = _levenshtein_banded(a, b, k)
        assert got == (d if d <= k else k + 1)

    check()
