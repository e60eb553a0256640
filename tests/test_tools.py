"""Offline builder CLIs: lexicon2db and g2p train/predict/test."""

import json
import sqlite3

from gruut_ray.phonem.lexicon import Lexicon
from gruut_ray.tools.g2p import main as g2p_main
from gruut_ray.tools.lexicon2db import main as lex_main


def test_lexicon2db_roundtrip(tmp_path):
    src = tmp_path / "lexicon.txt"
    # with --role every row carries a role column; "_" marks the default
    # role (reference lexicon2db.py --empty-role)
    src.write_text("Hello _ h ə l oʊ\nread _ ɹ i d\nread gruut:VBD ɹ ɛ d\n",
                   encoding="utf-8")
    db = str(tmp_path / "lexicon.db")
    lex_main(["--casing", "lower", "--lexicon", str(src),
              "--database", db, "--role"])

    # gruut-schema sqlite (reference lexicon2db.py:53-60)
    conn = sqlite3.connect(db)
    cols = [r[1] for r in conn.execute("PRAGMA table_info(word_phonemes)")]
    assert {"word", "pron_order", "phonemes", "role"} <= set(cols)
    rows = conn.execute(
        "SELECT role, phonemes FROM word_phonemes WHERE word = ? "
        "ORDER BY pron_order", ("read",)).fetchall()
    assert ("", "ɹ i d") in rows and ("gruut:VBD", "ɹ ɛ d") in rows

    lex = Lexicon.from_sqlite(db)
    assert lex.lookup("hello") == ("h", "ə", "l", "oʊ")  # lowered casing
    assert lex.lookup("read", role="gruut:VBD") == ("ɹ", "ɛ", "d")


def test_g2p_train_predict_test(tmp_path, capsys):
    corpus = tmp_path / "aligned.txt"
    corpus.write_text("b}b a}æ t}t\nc}k a}æ t}t\ns}s a}æ t}t\n"
                      "b}b i}ɪ t}t\ns}s i}ɪ t}t\n", encoding="utf-8")
    model_path = str(tmp_path / "model.json")
    g2p_main(["train", "--corpus", str(corpus), "--output", model_path,
              "--epochs", "8"])
    model = json.loads(open(model_path).read())
    assert model["weights"]

    g2p_main(["predict", "--model", model_path, "bat", "sit"])
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "bat b æ t"
    assert out[1] == "sit s ɪ t"

    lexicon = tmp_path / "test_lex.txt"
    lexicon.write_text("bat b æ t\ncat k æ t\n", encoding="utf-8")
    g2p_main(["test", "--model", model_path, "--lexicon", str(lexicon)])
    out = capsys.readouterr().out
    assert "PER: 0.0000" in out


def test_lexicon2db_namespaces_bare_roles(tmp_path):
    # reference lexicon2db.py:88-89: bare roles become gruut:<ROLE> so the
    # runtime POS lookup (role='gruut:VBD') matches
    src = tmp_path / "lex.txt"
    src.write_text(";;; comment header\nread VBD ɹ ɛ d\n", encoding="utf-8")
    db = str(tmp_path / "l.db")
    lex_main(["--casing", "keep", "--lexicon", str(src),
              "--database", db, "--role"])
    lex = Lexicon.from_sqlite(db)
    assert lex.lookup("read", role="gruut:VBD") == ("ɹ", "ɛ", "d")
    assert lex.lookup(";;;") is None  # comment line skipped


def test_corpus2db_roundtrip(tmp_path):
    """corpus2db writes the reference g2p_alignments schema; packs can
    read it back and alignments parse."""
    from gruut_ray.phonem.packs import read_alignments
    from gruut_ray.tools.corpus2db import main as corpus2db_main

    corpus = tmp_path / "g2p.corpus"
    corpus.write_text("t}t e}ˈɛ s}s t}t\n"
                      "s|h}ʃ o|w}ˈoʊ\n"
                      "w}w h}_ y}ˈaɪ\n"
                      "t}t e}ˈɛ s}s t}t\n",  # dup word: first wins
                      encoding="utf-8")
    db = tmp_path / "out.db"
    assert corpus2db_main(["--corpus", str(corpus),
                           "--database", str(db)]) == 0
    rows = read_alignments(str(db))
    assert len(rows) == 3
    import sqlite3
    conn = sqlite3.connect(str(db))
    words = {r[0] for r in conn.execute(
        "SELECT word FROM g2p_alignments")}
    conn.close()
    assert words == {"test", "show", "why"}


def test_make_sf_tiles_integrity(tmp_path):
    """The sf1 gate rests on this tool: tiling must preserve referential
    integrity (offset keys join consistently), modulo-sampling
    semantics, and fixed dimensions."""
    import duckdb

    import sys
    sys.path.insert(0, "/root/repo/jobs")
    import make_sf_tiles

    dst = str(tmp_path / "sf2x")
    assert make_sf_tiles.main(["--src", "/root/testdata/sf0.001",
                               "--dst", dst, "--tiles", "2"]) == 0
    con = duckdb.connect()
    n = lambda t: con.execute(
        f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
    base = lambda t: con.execute(
        f"SELECT count(*) FROM '/root/testdata/sf0.001/{t}.parquet'"
    ).fetchone()[0]
    for t in ("customer", "orders", "lineitem", "documents", "events"):
        assert n(t) == 2 * base(t), t
    for t in ("region", "nation"):  # fixed dimensions: single copy
        assert n(t) == base(t), t
    # referential integrity across the offset: every order's customer
    # exists, every lineitem's order exists
    assert con.execute(f"""
        SELECT count(*) FROM '{dst}/orders.parquet' o
        WHERE NOT EXISTS (SELECT 1 FROM '{dst}/customer.parquet' c
                          WHERE c.c_custkey = o.o_custkey)
    """).fetchone()[0] == 0
    assert con.execute(f"""
        SELECT count(*) FROM '{dst}/lineitem.parquet' l
        WHERE NOT EXISTS (SELECT 1 FROM '{dst}/orders.parquet' o
                          WHERE o.o_orderkey = l.l_orderkey)
    """).fetchone()[0] == 0
    # doc_id % 100 sampling semantics preserved per tile
    frac = con.execute(f"""
        SELECT count(*) FILTER (doc_id % 100 = 0) * 1.0 / count(*)
        FROM '{dst}/documents.parquet'""").fetchone()[0]
    base_frac = con.execute("""
        SELECT count(*) FILTER (doc_id % 100 = 0) * 1.0 / count(*)
        FROM '/root/testdata/sf0.001/documents.parquet'""").fetchone()[0]
    assert abs(frac - base_frac) < 1e-9
