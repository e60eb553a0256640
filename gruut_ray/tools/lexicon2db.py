"""``python -m gruut_ray.tools.lexicon2db`` — text lexicon → sqlite.

Same arguments and sqlite schema as the reference builder
(gruut/lexicon2db.py:10-108): ``--casing keep|lower|upper``, ``--lexicon``
text file with ``WORD [ROLE] PHONEME PHONEME ...`` rows (``--role`` enables
the role column, ``--empty-role`` marks the default role), ``--database``
output.  Databases written here load directly into
:class:`gruut_ray.phonem.lexicon.Lexicon` actors — and gruut itself can
read them, since the schema matches.
"""

from __future__ import annotations

import argparse
import sys

from gruut_ray.phonem.lexicon import Lexicon


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="lexicon2db")
    parser.add_argument("--casing", required=True,
                        choices=("keep", "lower", "upper"))
    parser.add_argument("--lexicon", required=True,
                        help="Text lexicon with WORD PHONEME PHONEME ...")
    parser.add_argument("--database", required=True,
                        help="SQLite database to write")
    parser.add_argument("--role", action="store_true",
                        help="Lexicon includes word roles (2nd column)")
    parser.add_argument("--empty-role", default="_",
                        help="String for the default role (with --role)")
    args = parser.parse_args(argv)

    casing = {"lower": str.lower, "upper": str.upper}.get(args.casing)

    lex = Lexicon()
    n = 0
    with open(args.lexicon, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            # reference format uses ';' comments (gruut/lexicon2db.py:77);
            # '#' accepted too
            if not line or line.startswith((";", "#")):
                continue
            parts = line.split()
            if len(parts) < 2:
                continue
            word, rest = parts[0], parts[1:]
            role = ""
            if args.role and rest:
                role, rest = rest[0], rest[1:]
                if role == args.empty_role:
                    role = ""
                elif role and ":" not in role:
                    # bare roles namespace to gruut:<ROLE> (reference
                    # lexicon2db.py:88-89) so runtime POS lookups
                    # (role='gruut:VBD') actually match
                    role = f"gruut:{role}"
            if casing is not None:
                word = casing(word)
            if rest:
                lex.add(word, rest, role=role)
                n += 1
    lex.to_sqlite(args.database)
    print(f"wrote {n} pronunciations for {len(lex)} words "
          f"to {args.database}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
