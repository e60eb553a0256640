"""Discovery/loading of gruut language data packs (lexicons + G2P models).

The reference distributes per-language data as ``gruut-lang-<lang>`` pip
packages, each containing ``gruut_lang_<lang>/lexicon.db`` (sqlite, schema
gruut/lexicon2db.py:53-60), ``g2p/model.crf`` (CRFsuite model,
gruut/g2p.py:56-90) and optionally an ``espeak/`` variant of both
(selected by ``gruut.sentences(espeak=True)``, gruut/__init__.py:40,67).

This module finds those packs on disk and loads them into the engine's
own structures (:class:`~gruut_ray.phonem.lexicon.Lexicon`,
:class:`~gruut_ray.phonem.crf_g2p.CrfG2P`,
:class:`~gruut_ray.phonem.g2p.PerceptronG2P`).  Search order:

1. ``$GRUUT_RAY_DATA`` — colon-separated directories;
2. the reference checkout mounted in this sandbox (``/root/reference``).

Everything degrades gracefully: a missing pack just means that language
phonemizes with whatever seed lexicon / trained model the engine carries.

Scale note: packs are actor-local state loaded ONCE per actor in
``PhonemizeStage.__init__`` (a lexicon.db is single-digit MB, a CRF model
10-100 ms to parse) — never shuffled, never re-read per batch.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import typing
from dataclasses import dataclass, field

_DEFAULT_ROOTS = ("/root/reference",)

# perceptron G2P models trained from pack g2p_alignments (for languages
# whose packs ship no IPA model.crf, e.g. cs / nl)
_MODELS_DIR = os.path.join(os.path.dirname(__file__), "models")


@dataclass
class LanguagePack:
    lang: str
    lexicon_db: typing.Optional[str] = None
    crf_model: typing.Optional[str] = None
    pos_model: typing.Optional[str] = None
    fst_graph: typing.Optional[str] = None
    espeak_lexicon_db: typing.Optional[str] = None
    espeak_crf_model: typing.Optional[str] = None
    extras: dict = field(default_factory=dict)


def data_roots() -> typing.List[str]:
    env = os.environ.get("GRUUT_RAY_DATA", "")
    roots = [p for p in env.split(":") if p]
    roots.extend(_DEFAULT_ROOTS)
    return [r for r in roots if os.path.isdir(r)]


def _scan_pack_dir(path: str) -> dict:
    found = {}
    lex = os.path.join(path, "lexicon.db")
    if os.path.isfile(lex):
        found["lexicon_db"] = lex
    crf = os.path.join(path, "g2p", "model.crf")
    if os.path.isfile(crf):
        found["crf_model"] = crf
    # POS CRF (reference loads <lang_dir>/pos/model.crf, lang.py:75-85;
    # none ship in this checkout, but user-supplied full packs carry one)
    pos = os.path.join(path, "pos", "model.crf")
    if os.path.isfile(pos):
        found["pos_model"] = pos
    # Phonetisaurus numpy graph (reference g2p_phonetisaurus.py — also
    # absent from this checkout; user-supplied)
    fst = os.path.join(path, "g2p", "graph.npz")
    if os.path.isfile(fst):
        found["fst_graph"] = fst
    elex = os.path.join(path, "espeak", "lexicon.db")
    if os.path.isfile(elex):
        found["espeak_lexicon_db"] = elex
    ecrf = os.path.join(path, "espeak", "g2p", "model.crf")
    if os.path.isfile(ecrf):
        found["espeak_crf_model"] = ecrf
    return found


def discover(roots: typing.Optional[typing.Sequence[str]] = None,
             ) -> typing.Dict[str, LanguagePack]:
    """{short_lang: LanguagePack} over all findable gruut data packs.

    ``gruut-lang-<lang>/gruut_lang_<lang>/`` layouts are preferred; bare
    ``data/<code>/`` layouts (the reference source tree) fill gaps."""
    from gruut_ray.profiles import short_lang

    packs: typing.Dict[str, LanguagePack] = {}

    def merge(lang: str, found: dict) -> None:
        if not found:
            return
        pack = packs.setdefault(lang, LanguagePack(lang=lang))
        for key, val in found.items():
            if getattr(pack, key) is None:
                setattr(pack, key, val)

    for root in (roots if roots is not None else data_roots()):
        for pkg in sorted(glob.glob(os.path.join(root, "gruut-lang-*"))):
            inner = glob.glob(os.path.join(pkg, "gruut_lang_*"))
            for path in sorted(inner):
                lang = os.path.basename(path).replace("gruut_lang_", "")
                merge(short_lang(lang), _scan_pack_dir(path))
        data_dir = os.path.join(root, "data")
        if os.path.isdir(data_dir):
            for path in sorted(glob.glob(os.path.join(data_dir, "*"))):
                if os.path.isdir(path):
                    merge(short_lang(os.path.basename(path)),
                          _scan_pack_dir(path))
    return packs


def read_alignments(lexicon_db: str) -> typing.List[str]:
    """Phonetisaurus alignment strings from a pack's ``g2p_alignments``
    table (written by gruut/corpus2db.py:10-66)."""
    import sqlite3

    conn = sqlite3.connect(f"file:{lexicon_db}?mode=ro", uri=True)
    try:
        return [row[0] for row in
                conn.execute("SELECT alignment FROM g2p_alignments")]
    except sqlite3.OperationalError:
        return []
    finally:
        conn.close()


def load_perceptron_model(lang: str):
    """Trained PerceptronG2P for ``lang`` from the committed models dir
    (None if absent).  These are trained by tools/train_g2p.py from pack
    alignment data for languages without an IPA model.crf."""
    from gruut_ray.phonem.g2p import PerceptronG2P

    path = os.path.join(_MODELS_DIR, f"{lang}_g2p.json.gz")
    if not os.path.isfile(path):
        return None
    with gzip.open(path, "rt", encoding="utf-8") as f:
        return PerceptronG2P.from_dict(json.load(f))


def load_pack_lexicons(packs: typing.Optional[dict] = None,
                       espeak: bool = False) -> dict:
    """{short_lang: Lexicon} for every pack with a lexicon.db."""
    from gruut_ray.phonem.lexicon import Lexicon

    packs = discover() if packs is None else packs
    out = {}
    for lang, pack in packs.items():
        path = pack.espeak_lexicon_db if espeak else pack.lexicon_db
        if path:
            out[lang] = Lexicon.from_sqlite(path)
    return out


def load_pack_g2p(packs: typing.Optional[dict] = None,
                  espeak: bool = False) -> dict:
    """{short_lang: callable} G2P guessers: the pack's CRF model when
    present, else a committed trained perceptron."""
    from gruut_ray.phonem.crf_g2p import CrfG2P

    packs = discover() if packs is None else packs
    out = {}
    for lang, pack in packs.items():
        path = pack.espeak_crf_model if espeak else pack.crf_model
        if path:
            out[lang] = CrfG2P.load(path)
        elif not espeak:
            model = load_perceptron_model(lang)
            if model is not None:
                out[lang] = model
    return out
