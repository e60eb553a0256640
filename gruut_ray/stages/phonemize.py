"""Phonemization actor stage: normalize → POS roles → lexicon → G2P.

The Ray-Data re-expression of the reference's per-sentence model pass
(gruut/text_processor.py:1102-1184): POS-tag each sentence, then phonemize
each word via inline/lang lexicon with role fallback, guessing with G2P on
lexicon miss.  All model state (lexicon dicts, G2P weights) loads ONCE per
actor in ``__init__`` (replacing the reference's lazy "Delayed" loaders,
gruut/lang.py:2539-2606); per-batch work is ``__call__`` over Arrow.

Output: the nested Arrow schema from SURVEY §1.3 — one ``sentences``
list<struct> column carrying the full Word/Sentence records (the JSONL
shape of the reference CLI, gruut/__main__.py:125-134), plus flat
per-doc stats columns.

Scale notes: lexicons are broadcast small-side state (≤ tens of MB per
language) held per actor, not shuffled (SURVEY §2.4); documents never
leave their row, so the stage is a pure per-row map — no shuffle, skew
handled by Ray block scheduling.
"""

from __future__ import annotations

import os
import sys
import typing

import pyarrow as pa

from gruut_ray.nlp.normalize import process_document
from gruut_ray.phonem.en_data import build_en_lexicon
from gruut_ray.phonem.g2p import EnRuleG2P, PerceptronG2P
from gruut_ray.phonem.lexicon import Lexicon
from gruut_ray.phonem.pos import heuristic_tags, tags_to_roles

WORD_STRUCT = pa.struct([
    ("idx", pa.int32()),
    ("text", pa.string()),
    ("text_with_ws", pa.string()),
    ("pos", pa.string()),
    ("role", pa.string()),
    ("phonemes", pa.list_(pa.string())),
    ("is_major_break", pa.bool_()),
    ("is_minor_break", pa.bool_()),
    ("is_punctuation", pa.bool_()),
    ("in_lexicon", pa.bool_()),
])

SENTENCE_STRUCT = pa.struct([
    ("idx", pa.int32()),
    ("par_idx", pa.int32()),
    ("text", pa.string()),
    ("text_spoken", pa.string()),
    ("lang", pa.string()),
    ("words", pa.list_(WORD_STRUCT)),
])

SENTENCES_TYPE = pa.list_(SENTENCE_STRUCT)


class PhonemizeStage:
    """``ds.map_batches(PhonemizeStage, concurrency=N, batch_size=B)``.

    Parameters
    ----------
    lexicon_paths : optional {short_lang: sqlite path} of gruut-format
        ``lexicon.db`` files (schema gruut/lexicon2db.py:53-60) — the
        plug-in point for real gruut language data.
    g2p_models : optional {short_lang: PerceptronG2P dict} trained models.
    use_pos : run the POS pass and set word roles (reference
        text_processor.py:1102-1113).
    use_packs : discover and load gruut language data packs
        (lexicon.db + CRF G2P models) from ``$GRUUT_RAY_DATA`` /
        the reference checkout (see :mod:`gruut_ray.phonem.packs`).
        Explicit ``lexicon_paths`` / ``g2p_models`` override pack data.
    pack_langs : restrict pack loading to these short langs (None = all
        discovered — per-actor init cost is a few seconds of sqlite scans).
    espeak : load the packs' eSpeak phoneme variant instead of IPA
        (reference ``model_prefix``, gruut/__init__.py:40,67).  The en
        built-in IPA lexicon and the IPA seed lexicons are skipped in
        this mode.
    """

    def __init__(self,
                 text_col: str = "text",
                 lang_col: str = "lang",
                 lexicon_paths: typing.Optional[typing.Dict[str, str]] = None,
                 g2p_models: typing.Optional[typing.Dict[str, dict]] = None,
                 use_pos: bool = True,
                 keep_text: bool = True,
                 use_packs: bool = True,
                 pack_langs: typing.Optional[typing.Sequence[str]] = None,
                 espeak: bool = False):
        self.text_col = text_col
        self.lang_col = lang_col
        self.use_pos = use_pos
        self.keep_text = keep_text
        self.espeak = espeak

        from gruut_ray.phonem.multi_data import build_seed_lexicons

        self.lexicons: typing.Dict[str, Lexicon] = {}
        self.g2p: typing.Dict[str, typing.Callable] = {}
        if not espeak:
            self.lexicons["en"] = build_en_lexicon()
            self.lexicons.update(build_seed_lexicons())  # de/fr/es seeds
            self.g2p["en"] = EnRuleG2P()

        # Packs are resolved to PATHS here and loaded lazily on the first
        # document of each language (_ensure_lang): an actor only pays for
        # (and holds) the languages it actually serves — with lang-routed
        # partitioning that is typically one or two of the 10+ available
        # packs (~1.4 s and ~100 MB if all were loaded eagerly).  Mirrors
        # the reference's Delayed* loaders (gruut/lang.py:2539-2606).
        self._packs: typing.Dict[str, typing.Any] = {}
        if use_packs:
            from gruut_ray.phonem import packs as _packs

            found = _packs.discover()
            if pack_langs is not None:
                found = {k: v for k, v in found.items() if k in pack_langs}
            self._packs = found

        # explicit constructor args take precedence over pack data (same
        # as the old eager path, where they were applied after the packs)
        self._explicit_lex = set(lexicon_paths or ())
        self._explicit_g2p = set(g2p_models or ())
        if lexicon_paths:
            for lang, path in lexicon_paths.items():
                self.lexicons[lang] = Lexicon.from_sqlite(path)
        if g2p_models:
            for lang, model_dict in g2p_models.items():
                self.g2p[lang] = PerceptronG2P.from_dict(model_dict)

        self._word_sets = {lang: lex.word_set()
                           for lang, lex in self.lexicons.items()}
        self.pos_taggers: typing.Dict[str, typing.Callable] = {}
        self._pack_loaded: typing.Set[str] = set()
        self._pack_lex_done: typing.Set[str] = set()
        self._pack_g2p_done: typing.Set[str] = set()
        self._pack_pos_done: typing.Set[str] = set()
        self._builtin_pos_tried: typing.Set[str] = set()
        self._pack_failures: typing.Dict[str, int] = {}

    def _ensure_lang(self, short: str) -> None:
        """Load the language's pack lexicon/G2P on first use (memoized).

        Pack data OVERRIDES the seed lexicons / builtin G2P, matching the
        eager path's precedence (seeds < packs < explicit args) — en's
        OOV guesses must come from the en pack CRF, not EnRuleG2P, when
        the pack is present.  Lexicon and G2P load independently (a
        failed component is retried on the next document, up to 3 times,
        without re-loading the one that succeeded); EVERY failure is
        logged to stderr so a degraded actor is visible, not silent."""
        if short in self._pack_loaded:
            return
        pack = self._packs.get(short)
        if pack is None:
            self._pack_loaded.add(short)
            return
        from gruut_ray.phonem import packs as _packs
        from gruut_ray.phonem.crf_g2p import CrfG2P

        import sys

        ok = True
        lex_path = (pack.espeak_lexicon_db if self.espeak
                    else pack.lexicon_db)
        if lex_path and short not in self._explicit_lex \
                and short not in self._pack_lex_done:
            try:
                lex = Lexicon.from_sqlite(lex_path)
                self.lexicons[short] = lex
                self._word_sets[short] = lex.word_set()
                self._pack_lex_done.add(short)
            except Exception as exc:  # noqa: BLE001 — degrade per component
                ok = False
                print(f"gruut_ray: failed loading {short} pack lexicon "
                      f"({exc!r})", file=sys.stderr)
        crf_path = (pack.espeak_crf_model if self.espeak
                    else pack.crf_model)
        if short not in self._explicit_g2p \
                and short not in self._pack_g2p_done:
            try:
                if crf_path:
                    self.g2p[short] = CrfG2P.load(crf_path)
                elif pack.fst_graph and not self.espeak:
                    # Phonetisaurus numpy graph: the reference's other
                    # guesser (g2p_phonetisaurus.py) — used when a
                    # user-supplied pack ships graph.npz but no CRF
                    from gruut_ray.phonem.g2p_fst import FstG2P

                    self.g2p[short] = FstG2P.load(pack.fst_graph)
                elif not self.espeak:
                    model = _packs.load_perceptron_model(short)
                    if model is not None:
                        self.g2p[short] = model
                self._pack_g2p_done.add(short)
            except Exception as exc:  # noqa: BLE001
                ok = False
                print(f"gruut_ray: failed loading {short} pack G2P "
                      f"({exc!r})", file=sys.stderr)
        if pack.pos_model and short not in self._pack_pos_done:
            # POS CRF parity (reference lang.py:75-85 loads
            # pos/model.crf when a pack ships one)
            try:
                from gruut_ray.phonem.pos import CrfPos

                self.pos_taggers[short] = CrfPos.load(pack.pos_model)
                self._pack_pos_done.add(short)
            except Exception as exc:  # noqa: BLE001
                ok = False
                print(f"gruut_ray: failed loading {short} pack POS "
                      f"tagger ({exc!r})", file=sys.stderr)
        if ok:
            self._pack_loaded.add(short)
            return
        fails = self._pack_failures.get(short, 0) + 1
        self._pack_failures[short] = fails
        if fails >= 3:
            self._pack_loaded.add(short)
            print(f"gruut_ray: giving up on {short} language pack after "
                  f"{fails} attempts; continuing with partial/seed data",
                  file=sys.stderr)

    def pos_tags(self, short: str, texts: typing.Sequence[str],
                 ) -> typing.Optional[typing.List[str]]:
        """POS tags for a sentence's spoken words: the pack's CRF tagger
        when one loaded for the language (reference pos.py semantics),
        else the committed builtin CRF (en — trained from the in-repo
        CoNLL-U corpus by gruut_ray.tools.train_pos_crf), else the en
        heuristic, else None (no tagging)."""
        self._ensure_lang(short)  # idempotent; SSML sentences may switch
        tagger = self.pos_taggers.get(short)
        if tagger is None and short not in self._builtin_pos_tried:
            # builtin model: loaded once per actor, same CrfPos reader
            # path a real pack's pos/model.crf takes
            self._builtin_pos_tried.add(short)
            path = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "phonem", "models",
                f"pos_{short}.crf")
            if os.path.exists(path):
                try:
                    from gruut_ray.phonem.pos import CrfPos

                    tagger = self.pos_taggers[short] = CrfPos.load(path)
                except Exception as exc:  # noqa: BLE001
                    print(f"gruut_ray: failed loading builtin {short} "
                          f"POS model ({exc!r})", file=sys.stderr)
        if tagger is not None:
            return list(tagger(texts))
        if short == "en":
            return heuristic_tags(texts)
        return None

    # -- per-document -------------------------------------------------------

    @staticmethod
    def _short(lang: str) -> str:
        from gruut_ray.profiles import short_lang

        return short_lang(lang)

    def phonemize_doc(self, text: str, lang: str) -> typing.List[dict]:
        short = self._short(lang)
        self._ensure_lang(short)
        lex = self.lexicons.get(short)
        word_set = self._word_sets.get(short)
        lex_check = (lambda w: w in word_set) if word_set else None

        # post hooks run after phonemes attach (reference
        # post_process_sentence timing — e.g. French liaison reads
        # word.phonemes), so assemble() must not run them
        sentences = process_document(text or "", lang=lang or "en",
                                     lex=lex_check, post_process=False)
        from gruut_ray.profiles import get_compiled

        g2p = self.g2p.get(short)
        out_sents: typing.List[dict] = []
        for sent in sentences:
            spoken_idx = [i for i, w in enumerate(sent.words) if w.is_spoken]
            if self.use_pos and spoken_idx:
                tags = self.pos_tags(
                    short, [sent.words[i].text for i in spoken_idx])
                if tags is not None:
                    roles = tags_to_roles(tags)
                    for k, i in enumerate(spoken_idx):
                        w = sent.words[i]
                        w.pos = tags[k]
                        if not w.role:  # explicit roles (gruut:letter) win
                            w.role = roles[k]
            in_lex_flags: typing.List[bool] = []
            for w in sent.words:
                phonemes = w.phonemes
                # explicit SSML/inline-lexicon pronunciations are
                # authoritative, not out-of-vocabulary
                in_lex = phonemes is not None and w.is_spoken
                if w.is_spoken and phonemes is None:
                    if lex is not None:
                        # Lexicon.lookup probes casefolded/stripped forms
                        pron = lex.lookup(w.text, role=w.role or None)
                        if pron is not None:
                            phonemes = list(pron)
                            in_lex = True
                    if phonemes is None and g2p is not None and w.text:
                        # reference lowercases before the G2P guess
                        # (lang.py:116 transform_func=str.lower)
                        phonemes = list(g2p(w.text.lower()))
                w.phonemes = list(phonemes) if phonemes else None
                in_lex_flags.append(in_lex)
            post = get_compiled(sent.lang or lang or "en") \
                .hooks.post_process_sentence
            if post is not None:
                post(sent)
            out_words = []
            for w, in_lex in zip(sent.words, in_lex_flags):
                out_words.append({
                    "idx": w.idx,
                    "text": w.text,
                    "text_with_ws": w.text_with_ws,
                    "pos": w.pos or "",
                    "role": w.role or "",
                    "phonemes": list(w.phonemes) if w.phonemes else [],
                    "is_major_break": w.is_major_break,
                    "is_minor_break": w.is_minor_break,
                    "is_punctuation": w.is_punctuation,
                    "in_lexicon": in_lex,
                })
            out_sents.append({
                "idx": sent.idx,
                "par_idx": sent.par_idx,
                "text": sent.text,
                "text_spoken": sent.text_spoken,
                "lang": sent.lang,
                "words": out_words,
            })
        return out_sents

    # -- per-batch ----------------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        langs = (batch.column(self.lang_col).to_pylist()
                 if self.lang_col in batch.column_names
                 else ["en"] * len(texts))

        sents_col: typing.List[list] = []
        n_words: typing.List[int] = []
        n_phonemes: typing.List[int] = []
        n_oov: typing.List[int] = []
        for text, lang in zip(texts, langs):
            try:
                sents = self.phonemize_doc(text, lang)
            except Exception:  # poison-document guard (mirrors --no-fail)
                sents = []
            sents_col.append(sents)
            words = [w for s in sents for w in s["words"]
                     if not (w["is_major_break"] or w["is_minor_break"]
                             or w["is_punctuation"])]
            n_words.append(len(words))
            n_phonemes.append(sum(len(w["phonemes"]) for w in words))
            n_oov.append(sum(1 for w in words if not w["in_lexicon"]))

        if not self.keep_text:
            batch = batch.drop_columns([self.text_col])
        batch = batch.append_column(
            "sentences", pa.array(sents_col, type=SENTENCES_TYPE))
        batch = batch.append_column("n_words",
                                    pa.array(n_words, type=pa.int64()))
        batch = batch.append_column("n_phonemes",
                                    pa.array(n_phonemes, type=pa.int64()))
        batch = batch.append_column("n_oov", pa.array(n_oov, type=pa.int64()))
        return batch


def phonemize(ds, *, text_col: str = "text", lang_col: str = "lang",
              concurrency: typing.Union[int, typing.Tuple[int, int]] = (1, 8),
              batch_size: int = 128, **stage_kwargs):
    """Compose the phonemize stage onto a Dataset (lazy)."""
    return ds.map_batches(
        PhonemizeStage,
        fn_constructor_kwargs={"text_col": text_col, "lang_col": lang_col,
                               **stage_kwargs},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def phonemize_routed(ds, *, text_col: str = "text",
                     lang_col: str = "lang", num_salts: int = 8,
                     **stage_kwargs):
    """Language-ROUTED phonemize: documents hash-shuffle to
    ``(lang, salt)`` groups before the stage runs, so each worker's
    lazily-loaded pack set stays one-or-few languages instead of
    eventually all of them (the memory bound that matters when packs
    are multi-GB; same routing contract as
    ``quality_filter_routed``, salting bounds en-skew).  Output rows
    are identical to :func:`phonemize` — only the physical plan
    differs (asserted in tests/test_phonem.py)."""
    import numpy as np

    def add_route(batch: pa.Table) -> pa.Table:
        h = np.arange(batch.num_rows, dtype=np.uint64)
        h = (h + np.uint64(0x9E3779B97F4A7C15)) \
            * np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(31)
        salts = (h % np.uint64(num_salts)).astype(np.int32)
        return batch.append_column("_salt",
                                   pa.array(salts, type=pa.int32()))

    _cache: typing.Dict[str, PhonemizeStage] = {}

    def phonemize_group(group: pa.Table) -> pa.Table:
        stage = _cache.get("stage")
        if stage is None:  # once per worker process, not per group
            stage = _cache["stage"] = PhonemizeStage(
                text_col=text_col, lang_col=lang_col, **stage_kwargs)
        return stage(group)

    routed = ds.map_batches(add_route, batch_format="pyarrow")
    out = routed.groupby([lang_col, "_salt"]).map_groups(
        phonemize_group, batch_format="pyarrow")
    return out.map_batches(lambda b: b.drop_columns(["_salt"]),
                           batch_format="pyarrow")
