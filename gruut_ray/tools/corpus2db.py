"""``python -m gruut_ray.tools.corpus2db`` — aligned G2P corpus → sqlite.

Same arguments and schema as the reference builder
(gruut/corpus2db.py:10-66): reads a Phonetisaurus-aligned corpus (one
alignment string per line, ``}`` separating graphemes/phonemes, ``|``
joining multi-tokens, ``_`` the empty output) and writes the
``g2p_alignments`` table — the format
:meth:`gruut_ray.phonem.g2p.PerceptronG2P.train_from_alignments` and
:func:`gruut_ray.phonem.packs.read_alignments` consume.  One row per
unique word (first occurrence wins, like the reference).
"""

from __future__ import annotations

import argparse
import sqlite3

from gruut_ray.phonem.g2p import alignment_to_labels


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="gruut_ray.tools.corpus2db")
    parser.add_argument("--corpus", required=True,
                        help="Phonetisaurus G2P corpus file to read")
    parser.add_argument("--database", required=True,
                        help="SQLite database to write")
    parser.add_argument("--no-drop", action="store_true",
                        help="Don't drop an existing g2p_alignments table")
    args = parser.parse_args(argv)

    alignments: dict = {}
    with open(args.corpus, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parsed = alignment_to_labels(line)
            if parsed is None:
                continue
            word = parsed[0]
            if word and word not in alignments:
                alignments[word] = line

    conn = sqlite3.connect(args.database)
    try:
        with conn:
            if not args.no_drop:
                conn.execute("DROP TABLE IF EXISTS g2p_alignments")
            conn.execute(
                "CREATE TABLE IF NOT EXISTS g2p_alignments "
                "(id INTEGER PRIMARY KEY AUTOINCREMENT, "
                "word TEXT, alignment TEXT)")
            conn.executemany(
                "INSERT INTO g2p_alignments (word, alignment) VALUES (?, ?)",
                list(alignments.items()))
    finally:
        conn.close()
    print(f"Added {len(alignments)} alignments to {args.database}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
