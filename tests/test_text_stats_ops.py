"""Unit tests for the round-3 text-stats operators: quality signals,
grouped argmax, and histogram-exact quantiles."""

import math
from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gruut_ray.pipelines.text_stats import (
    length_quantiles_by_lang,
    longest_doc_per_lang,
    quality_signals_batch,
)


def test_quality_signals_batch_edges():
    texts = [
        "- bullet one\n* bullet two\nplain",
        "trailing dots...\nand unicode… \nno",
        "",                       # empty: 1 line, [""] word, no matches
        "   ",                    # ws-only
        "the cat and the hat",    # stopwords: the, and, the = 3
        "a1b2 33 x\ny...",
        "• dot bullet\n  - indented",
    ]
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = quality_signals_batch(batch).to_pandas().set_index("doc_id")

    assert out.loc[0, "n_lines"] == 3
    assert out.loc[0, "n_bullet_lines"] == 2
    assert out.loc[1, "n_ellipsis_lines"] == 2
    assert out.loc[2, "n_lines"] == 1
    assert out.loc[2, "n_bullet_lines"] == 0
    assert out.loc[2, "n_alpha_words"] == 0
    assert out.loc[3, "n_alpha_words"] == 0
    assert out.loc[4, "n_stop_words"] == 3
    assert out.loc[4, "n_alpha_words"] == 5
    assert out.loc[5, "n_digit_chars"] == 4
    assert out.loc[5, "n_ellipsis_lines"] == 1
    assert out.loc[6, "n_bullet_lines"] == 2


def test_quantile_rank_formula_matches_duckdb():
    """The exact-rational rank ceil(q*n)-1 must reproduce DuckDB's
    quantile_disc — float ceil(0.9*10) is 10 and silently shifts it."""
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    rng = np.random.default_rng(11)
    for _ in range(25):
        n = int(rng.integers(1, 200))
        vals = sorted(rng.integers(0, 40, size=n).tolist())
        for q in (0.25, 0.5, 0.75, 0.9, 0.01, 0.99):
            rank = max(math.ceil(Fraction(str(q)) * n) - 1, 0)
            theirs = con.execute(
                "SELECT quantile_disc(x, ?) FROM (SELECT unnest(?) x)",
                [q, vals]).fetchone()[0]
            assert vals[rank] == theirs, (n, q)


def test_length_quantiles_block_invariant(ray_session):
    """Histogram quantiles are independent of block boundaries."""
    import ray

    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame({
        "lang": rng.choice(["en", "de", "sw"], size=n,
                           p=[0.7, 0.2, 0.1]),
        "n_chars": rng.integers(1, 300, size=n).astype("int64"),
    })
    a = length_quantiles_by_lang(ray.data.from_pandas(df).repartition(1))
    b = length_quantiles_by_lang(ray.data.from_pandas(df).repartition(17))
    pd.testing.assert_frame_equal(a, b)
    # cross-check one cell against pandas' inverted_cdf
    en = np.sort(df.loc[df["lang"] == "en", "n_chars"].to_numpy())
    n_en = len(en)
    rank = math.ceil(Fraction("0.9") * n_en) - 1
    assert a.set_index("lang").loc["en", "p90"] == en[rank]


def test_longest_doc_per_lang_tiebreak(ray_session):
    """Ties on length resolve to the smallest doc_id, regardless of how
    rows land in blocks."""
    import ray

    df = pd.DataFrame({
        "doc_id": [5, 3, 9, 1, 7, 2],
        "lang": ["en", "en", "en", "de", "de", "de"],
        "n_chars": [40, 40, 12, 7, 7, 7],
    })
    for parts in (1, 4):
        out = longest_doc_per_lang(
            ray.data.from_pandas(df).repartition(parts))
        got = out.set_index("lang")
        assert got.loc["en", "doc_id"] == 3
        assert got.loc["de", "doc_id"] == 1


def test_user_retention_paths_match(ray_session):
    """Driver and distributed (keyed-repartition) retention paths are
    output-identical, and match a naive per-user day-set scan."""
    import numpy as np
    import pandas as pd
    import ray

    from gruut_ray.pipelines.relational import user_retention

    rng = np.random.default_rng(5)
    n = 3000
    base = pd.Timestamp("2024-03-01").value // 1000  # us
    us_day = 86_400_000_000
    df = pd.DataFrame({
        "ts": pd.to_datetime(
            base + rng.integers(0, 14, size=n) * us_day
            + rng.integers(0, us_day, size=n), unit="us"),
        "user_id": rng.integers(1, 120, size=n).astype("int64"),
    })
    ds = ray.data.from_pandas(df).repartition(7)
    a = user_retention(ds, driver_limit=10_000_000)      # driver path
    b = user_retention(ds, driver_limit=0)               # distributed
    pd.testing.assert_frame_equal(a, b)

    # naive check
    pairs = set()
    for ts, uid in zip(df["ts"], df["user_id"]):
        pairs.add((ts.value // 1000 // us_day, uid))  # ns -> us -> day
    days = sorted({d for d, _ in pairs})
    naive = {d: [0, 0] for d in days}
    for d, u in pairs:
        naive[d][0] += 1
        if (d + 1, u) in pairs:
            naive[d][1] += 1
    got = a.set_index("day")
    for d in days:
        row = got.loc[pd.Timestamp(d * us_day, unit="us")]
        assert row["n_users"] == naive[d][0]
        assert row["n_retained"] == naive[d][1]


def test_stratified_sample_block_invariant(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from gruut_ray.pipelines.text_stats import stratified_sample

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "doc_id": np.arange(900, dtype="int64"),
        "lang": rng.choice(["en", "de", "sw"], size=900),
    })
    outs = [stratified_sample(ray.data.from_pandas(df).repartition(p),
                              n_per_group=7) for p in (1, 13)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert (outs[0].groupby("lang").size() == 7).all()
    # reproducible: same ids every run
    again = stratified_sample(ray.data.from_pandas(df).repartition(5),
                              n_per_group=7)
    pd.testing.assert_frame_equal(outs[0], again)


def test_vocab_except_matches_bruteforce(ray_session):
    """Set-difference vocabulary: terms in lang_a docs absent from every
    lang_b doc, ranked by lang_a document frequency; partition-invariant
    and tie-stable."""
    import collections

    import pandas as pd
    import ray.data

    from gruut_ray.pipelines.text_stats import vocab_except

    docs = pd.DataFrame({
        "lang": ["en", "en", "en", "de", "de", "fr"],
        "text": ["apple banana apple", "banana cherry", "apple durian",
                 "banana kirsche", "durian apfel", "apple pomme"],
    })
    # brute force: en DF per term minus any term seen in de
    en_df = collections.Counter()
    for t in docs[docs["lang"] == "en"]["text"]:
        en_df.update(set(t.split()))
    de_terms = set()
    for t in docs[docs["lang"] == "de"]["text"]:
        de_terms.update(t.split())
    want = sorted(((term, n) for term, n in en_df.items()
                   if term not in de_terms),
                  key=lambda kv: (-kv[1], kv[0]))[:15]
    for parts in (1, 3):
        got = vocab_except(ray.data.from_pandas(docs).repartition(parts))
        assert list(map(tuple, got.to_numpy())) == want
    # apple: 2 en docs, not in de -> top; banana/durian excluded (in de)
    assert want[0] == ("apple", 2) and "banana" not in dict(want)


def test_vocab_except_empty_side(ray_session):
    """No lang_b docs at all -> plain top-k of lang_a vocabulary; no
    lang_a docs -> typed empty frame."""
    import pandas as pd
    import ray.data

    from gruut_ray.pipelines.text_stats import vocab_except

    only_en = pd.DataFrame({"lang": ["en"], "text": ["x y x"]})
    got = vocab_except(ray.data.from_pandas(only_en))
    assert list(map(tuple, got.to_numpy())) == [("x", 1), ("y", 1)]
    only_de = pd.DataFrame({"lang": ["de"], "text": ["x y"]})
    got = vocab_except(ray.data.from_pandas(only_de))
    assert got.empty and list(got.columns) == ["term", "en_docs"]
