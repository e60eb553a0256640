"""Phonemizer package: lexicon lookup semantics, G2P, POS roles, Ray stage.

Lookup-chain expectations mirror the reference's SqlitePhonemizer
(gruut/phonemize.py:47-115); alignment parsing mirrors the Phonetisaurus
format in gruut's lexicon DBs (gruut/corpus2db.py:40-43).
"""

import pyarrow as pa
import pytest

from gruut_ray.phonem.en_data import build_en_lexicon
from gruut_ray.phonem.g2p import (
    EnRuleG2P,
    PerceptronG2P,
    alignment_to_labels,
    parse_alignment,
)
from gruut_ray.phonem.lexicon import Lexicon
from gruut_ray.phonem.pos import heuristic_tags
from gruut_ray.stages.phonemize import PhonemizeStage, phonemize


# ---------------------------------------------------------------------------
# Lexicon
# ---------------------------------------------------------------------------

def test_lexicon_basic_lookup():
    lex = Lexicon()
    lex.add("hello", ["h", "ə", "ˈl", "oʊ"])
    assert lex.lookup("hello") == ("h", "ə", "ˈl", "oʊ")
    assert lex.lookup("missing") is None
    assert "hello" in lex
    assert len(lex) == 1


def test_lexicon_word_transforms():
    # exact → casefold → strip non-word chars (gruut/phonemize.py:96-109)
    lex = Lexicon()
    lex.add("hello", ["h"])
    assert lex.lookup("Hello") == ("h",)
    assert lex.lookup("HELLO") == ("h",)
    assert lex.lookup('"hello"') == ("h",)


def test_lexicon_role_fallback_chain():
    # requested role → default role → any role (gruut/phonemize.py:60-88)
    lex = Lexicon()
    lex.add("read", ["ɹ", "i", "d"])                      # default
    lex.add("read", ["ɹ", "ɛ", "d"], role="gruut:VBD")
    assert lex.lookup("read") == ("ɹ", "i", "d")
    assert lex.lookup("read", role="gruut:VBD") == ("ɹ", "ɛ", "d")
    # unknown role falls back to default
    assert lex.lookup("read", role="gruut:XX") == ("ɹ", "i", "d")
    # word with ONLY a non-default role still resolves (any-role fallback)
    lex2 = Lexicon()
    lex2.add("b", ["b", "i"], role="gruut:letter")
    assert lex2.lookup("b") == ("b", "i")


def test_lexicon_pron_order():
    lex = Lexicon()
    lex.add("route", ["ɹ", "u", "t"])
    lex.add("route", ["ɹ", "aʊ", "t"])
    assert lex.lookup("route") == ("ɹ", "u", "t")  # first pron_order wins


def test_lexicon_sqlite_roundtrip(tmp_path):
    path = str(tmp_path / "lexicon.db")
    lex = Lexicon()
    lex.add("hello", ["h", "oʊ"])
    lex.add("read", ["ɹ", "ɛ", "d"], role="gruut:VBD")
    lex.to_sqlite(path)
    loaded = Lexicon.from_sqlite(path)
    assert loaded.lookup("hello") == ("h", "oʊ")
    assert loaded.lookup("read", role="gruut:VBD") == ("ɹ", "ɛ", "d")


def test_lexicon_from_text():
    lex = Lexicon.from_text([
        "hello h ə l oʊ",
        "read gruut:VBD ɹ ɛ d",
        "# comment",
        "",
    ], has_roles=True)
    assert lex.lookup("hello") == ("h", "ə", "l", "oʊ")
    assert lex.lookup("read", role="gruut:VBD") == ("ɹ", "ɛ", "d")


def test_lexicon_from_text_xsampa_colons_not_roles():
    # ASCII-colon phoneme notations (X-SAMPA 'a:') must survive intact:
    # role parsing is opt-in and namespaced (ADVICE r01)
    lex = Lexicon.from_text(["naam n a: m"])
    assert lex.lookup("naam") == ("n", "a:", "m")
    lex2 = Lexicon.from_text(["naam n a: m"], has_roles=True)
    assert lex2.lookup("naam") == ("n", "a:", "m")


# ---------------------------------------------------------------------------
# G2P
# ---------------------------------------------------------------------------

def test_parse_alignment():
    # real format from gruut data/lb/lexicon.db g2p_alignments
    assert parse_alignment("a}aː e}ə n}n") == [("a", "aː"), ("e", "ə"),
                                               ("n", "n")]
    assert parse_alignment("a|a}aː c|h}χ t}t") == [("aa", "aː"), ("ch", "χ"),
                                                   ("t", "t")]


def test_alignment_to_labels():
    word, labels = alignment_to_labels("a|a}aː c|h}χ t}t")
    assert word == "aacht"
    assert labels == ["aː", "_", "χ", "_", "t"]


def test_perceptron_g2p_learns_training_set():
    alignments = [
        "b}b a}æ t}t",
        "c}k a}æ t}t",
        "h}h a}æ t}t",
        "b}b i}ɪ t}t",
        "s}s i}ɪ t}t",
        "m}m a}æ p}p",
        "t}t a}æ p}p",
    ]
    model = PerceptronG2P.train_from_alignments(alignments, epochs=10)
    assert list(model("bat")) == ["b", "æ", "t"]
    assert list(model("sit")) == ["s", "ɪ", "t"]
    # generalizes to unseen combination of seen contexts
    assert list(model("sat")) == ["s", "æ", "t"]


def test_perceptron_g2p_roundtrip_dict():
    model = PerceptronG2P.train_from_alignments(["b}b a}æ t}t"], epochs=3)
    clone = PerceptronG2P.from_dict(model.to_dict())
    assert list(clone("bat")) == list(model("bat"))


def test_en_rule_g2p_reasonable():
    g2p = EnRuleG2P()
    assert list(g2p("ship")) == ["ʃ", "ɪ", "p"]
    assert list(g2p("chat")) == ["tʃ", "æ", "t"]
    assert list(g2p("thing")) == ["θ", "ɪ", "ŋ"]
    assert list(g2p("make")) == ["m", "eɪ", "k"]   # magic-e
    assert list(g2p("city"))[0] == "s"             # soft c
    assert g2p("") == []


# ---------------------------------------------------------------------------
# POS heuristics
# ---------------------------------------------------------------------------

def test_heuristic_tags_homograph_contexts():
    # "I read a book" → read after PRP = present (VBP)
    tags = heuristic_tags(["I", "read", "a", "book"])
    assert tags[1] in ("VBP", "VB")
    # "I had read it" → read after had = VBN (past participle)
    tags = heuristic_tags(["I", "had", "read", "it"])
    assert tags[2] == "VBN"
    # "the wound" → NN after DT
    tags = heuristic_tags(["the", "wound"])
    assert tags[1] == "NN"


# ---------------------------------------------------------------------------
# Stage (local, no Ray needed for phonemize_doc)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def stage():
    return PhonemizeStage()


def test_phonemize_doc_lexicon_and_g2p(stage):
    sents = stage.phonemize_doc("The hovercraft is full of eels.", "en")
    assert len(sents) == 1
    words = [w for w in sents[0]["words"]
             if not (w["is_major_break"] or w["is_punctuation"])]
    by_text = {w["text"]: w for w in words}
    assert by_text["The"]["phonemes"] == ["ð", "ə"]
    assert by_text["The"]["in_lexicon"]
    assert by_text["hovercraft"]["phonemes"] == list(
        "h ˈʌ v ɚ k ɹ ˌæ f t".split())
    # every spoken word got phonemes (g2p covers OOV)
    assert all(w["phonemes"] for w in words)


def test_phonemize_doc_role_disambiguation(stage):
    # past-participle "read" after "had" → /ɹ ɛ d/
    sents = stage.phonemize_doc("They had read the book.", "en")
    words = {w["text"]: w for w in sents[0]["words"]}
    assert words["read"]["phonemes"] == ["ɹ", "ɛ", "d"]
    # present "read" after pronoun → /ɹ i d/
    sents = stage.phonemize_doc("They read the book.", "en")
    words = {w["text"]: w for w in sents[0]["words"]}
    assert words["read"]["phonemes"] == ["ɹ", "i", "d"]


def test_phonemize_doc_number_verbalization_feeds_lexicon(stage):
    sents = stage.phonemize_doc("I have 2 cats.", "en")
    texts = [w["text"] for w in sents[0]["words"]]
    assert "two" in texts
    words = {w["text"]: w for w in sents[0]["words"]}
    assert words["two"]["phonemes"] == ["t", "u"]


def test_phonemize_doc_breaks_have_break_phonemes(stage):
    sents = stage.phonemize_doc("Hello, world.", "en")
    words = sents[0]["words"]
    kinds = [(w["is_minor_break"], w["is_major_break"]) for w in words]
    assert (True, False) in kinds and (False, True) in kinds
    minor = next(w for w in words if w["is_minor_break"])
    assert minor["phonemes"] == ["|"]


def test_phonemize_batch_arrow(stage):
    batch = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["The cat.", "I read it."], type=pa.string()),
        "lang": pa.array(["en", "en"], type=pa.string()),
    })
    out = stage(batch)
    assert out.num_rows == 2
    assert "sentences" in out.column_names
    assert out.column("n_words").to_pylist() == [2, 3]
    assert all(n > 0 for n in out.column("n_phonemes").to_pylist())


def test_phonemize_stage_in_ray(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(8), type=pa.int64()),
        "text": pa.array(["The cat sat."] * 8),
        "lang": pa.array(["en"] * 8),
    }))
    out = phonemize(ds, concurrency=1, batch_size=4).to_pandas()
    assert len(out) == 8
    assert (out["n_words"] == 3).all()
    first = out.iloc[0]["sentences"]
    assert first[0]["text_spoken"] == "The cat sat"


def test_multilingual_seed_lexicons(stage):
    # de/fr/es seeds phonemize function words and verbalizer output
    sents = stage.phonemize_doc("Ich habe 2 Katzen.", "de")
    words = {w["text"]: w for s in sents for w in s["words"]}
    assert words["zwei"]["phonemes"] == ["ts", "v", "aɪ"]
    assert words["zwei"]["in_lexicon"]
    sents = stage.phonemize_doc("J'ai 2 chats.", "fr")
    words = {w["text"]: w for s in sents for w in s["words"]}
    assert words["deux"]["phonemes"] == ["d", "ø"]
    sents = stage.phonemize_doc("Tengo 2 gatos.", "es")
    words = {w["text"]: w for s in sents for w in s["words"]}
    assert words["dos"]["phonemes"] == ["d", "o", "s"]


# ---------------------------------------------------------------------------
# CRF POS loader (VERDICT r02 #3): synthetic crf1d model round-trip
# ---------------------------------------------------------------------------

def _write_crf1d(path, labels, attrs, state, trans):
    """Thin wrapper over the library writer (lifted into
    gruut_ray.phonem.crf_g2p for the POS pack trainer, VERDICT r03 #5)."""
    from gruut_ray.phonem.crf_g2p import write_crf1d

    write_crf1d(path, labels, attrs, state, trans)


def _toy_pos_model(tmp_path):
    """Synthetic POS model over the reference feature template: word
    identity picks the tag, a numeric-weight attribute (len(word)) and a
    transition weight exercise the weighted-attr and Viterbi paths."""
    from gruut_ray.phonem.pos import CrfPos

    labels = ["DT", "NN", "VB"]
    attrs = [
        f"word:{CrfPos._b64('the')}",       # 0 -> DT
        f"word:{CrfPos._b64('dog')}",       # 1 -> NN
        f"word:{CrfPos._b64('runs')}",      # 2 -> VB
        "len(word)",                        # 3 -> weak NN evidence
        f"-1:word:{CrfPos._b64('the')}",    # 4 -> prev=the boosts NN
    ]
    state = [(0, 0, 5.0), (1, 1, 5.0), (2, 2, 5.0),
             (3, 1, 0.05), (4, 1, 1.0)]
    trans = [(0, 1, 1.5), (1, 2, 1.0)]      # DT->NN, NN->VB
    path = str(tmp_path / "model.crf")
    _write_crf1d(path, labels, attrs, state, trans)
    return path


def test_crf_pos_synthetic_roundtrip(tmp_path):
    from gruut_ray.phonem.pos import CrfPos

    model = CrfPos.load(_toy_pos_model(tmp_path))
    assert model.labels == ["DT", "NN", "VB"]
    assert model.tag(["the", "dog", "runs"]) == ["DT", "NN", "VB"]
    # unknown word after "the": -1:word=the state feature + DT->NN
    # transition + len(word) numeric weight all pull toward NN
    assert model.tag(["the", "wug"]) == ["DT", "NN"]
    assert model.tag([]) == []


def test_crf_pos_pack_wiring(tmp_path, monkeypatch):
    """A pack shipping pos/model.crf gets its CRF tagger wired into
    PhonemizeStage roles (reference lang.py:75-85 loader path)."""
    pack_dir = tmp_path / "gruut-lang-zx" / "gruut_lang_zx"
    (pack_dir / "pos").mkdir(parents=True)
    _toy_pos_model(pack_dir / "pos")
    monkeypatch.setenv("GRUUT_RAY_DATA", str(tmp_path))

    stage = PhonemizeStage(pack_langs=["zx"])
    tags = stage.pos_tags("zx", ["the", "dog", "runs"])
    assert tags == ["DT", "NN", "VB"]
    assert "zx" in stage.pos_taggers
    # en still uses the heuristic (no en pos model ships)
    assert stage.pos_tags("en", ["the", "dog"]) == \
        heuristic_tags(["the", "dog"])


# ---------------------------------------------------------------------------
# Phonetisaurus FST G2P: synthetic numpy-graph round-trip
# ---------------------------------------------------------------------------

def _toy_fst(tmp_path):
    """Tiny FST in the reference .npz layout: c→K, a→AE|EY (ambiguous,
    cost picks AE), t→T, a mid-word eps detour through state 4, and a
    two-grapheme cluster ch→CH.  States: 0 start; 2 and 3 accepting."""
    from gruut_ray.phonem.g2p_fst import write_graph

    symbols = ["<eps>", "c", "a", "t", "K", "AE", "EY", "T",
               "c|h", "CH", "AA"]
    S = {s: i for i, s in enumerate(symbols)}
    edges = [
        (0, 1, S["c"], S["K"]),          # c : K
        (0, 1, S["c|h"], S["CH"]),       # ch : CH (cluster input)
        (1, 2, S["a"], S["AE"]),         # a : AE (cheap)
        (1, 2, S["a"], S["EY"]),         # a : EY (expensive)
        (1, 4, S["<eps>"], S["<eps>"]),  # eps detour (costly)
        (4, 2, S["a"], S["AA"]),         # a : AA via the detour
        (2, 3, S["t"], S["T"]),          # t : T
    ]
    edge_probs = [0.1, 0.1, 0.2, 0.9, 2.0, 0.0, 0.1]
    path = str(tmp_path / "graph.npz")
    write_graph(path, start_node=0, edges=edges, edge_probs=edge_probs,
                symbols=symbols, final_nodes=[2, 3],
                final_probs=[0.3, 0.0])
    return path


def test_fst_g2p_synthetic_roundtrip(tmp_path):
    from gruut_ray.phonem.g2p_fst import FstG2P

    model = FstG2P.load(_toy_fst(tmp_path))
    assert list(model("cat")) == ["K", "AE", "T"]
    # state 2 is accepting with extra cost: "ca" stops there
    assert list(model("ca")) == ["K", "AE"]
    # cluster input symbol consumes two graphemes
    assert list(model("cha")) == ["CH", "AE"]
    # guesses come back cost-ascending: direct AE, then EY, then the
    # eps-detour AA path (proves eps edges traverse without consuming)
    guesses = model.guess("cat", max_guesses=3)
    assert guesses == [["K", "AE", "T"], ["K", "EY", "T"],
                       ["K", "AA", "T"]]
    # unknown grapheme: no accepting path
    assert list(model("cut")) == []
    assert model.guess("") == []


def test_fst_g2p_pack_wiring(tmp_path, monkeypatch):
    """A pack shipping g2p/graph.npz (and no model.crf) gets the FST
    guesser wired as its G2P fallback."""
    pack_dir = tmp_path / "gruut-lang-zy" / "gruut_lang_zy"
    (pack_dir / "g2p").mkdir(parents=True)
    _toy_fst(pack_dir / "g2p")
    monkeypatch.setenv("GRUUT_RAY_DATA", str(tmp_path))

    stage = PhonemizeStage(pack_langs=["zy"])
    stage._ensure_lang("zy")
    assert "zy" in stage.g2p
    assert list(stage.g2p["zy"]("cat")) == ["K", "AE", "T"]


# ---------------------------------------------------------------------------
# Committed en POS CRF pack (trained by gruut_ray.tools.train_pos_crf from
# the in-repo CoNLL-U corpus, VERDICT r03 #5) + homograph goldens
# ---------------------------------------------------------------------------

def test_builtin_en_pos_crf_loads_and_beats_heuristic():
    """The committed pos_en.crf is a genuine crf1d binary readable by the
    same CrfPos path a real gruut pack's pos/model.crf takes, and it
    disambiguates homograph contexts the heuristic cannot (none of these
    probe sentences appear in the training corpus)."""
    import os

    from gruut_ray.phonem.pos import CrfPos

    path = os.path.join(os.path.dirname(__file__), "..", "gruut_ray",
                        "phonem", "models", "pos_en.crf")
    model = CrfPos.load(path)
    probes = [
        (["I", "will", "read", "the", "book"], 2, "VB"),
        (["She", "read", "the", "letter", "yesterday"], 1, "VBD"),
        (["He", "has", "read", "every", "novel"], 2, "VBN"),
        (["The", "wound", "healed", "slowly"], 1, "NN"),
        (["He", "wound", "the", "clock", "again"], 1, "VBD"),
        (["The", "pipe", "contains", "lead"], 3, "NN"),
        (["She", "will", "lead", "the", "group"], 2, "VB"),
        (["We", "saw", "a", "live", "concert"], 3, "JJ"),
        (["They", "live", "in", "Berlin"], 1, "VBP"),
        (["The", "hotel", "is", "close", "to", "the", "beach"], 3, "JJ"),
        (["The", "store", "will", "close", "early"], 3, "VB"),
    ]
    for words, i, want in probes:
        assert model.tag(words)[i] == want, (words, model.tag(words))


def test_homograph_pronunciations_role_driven():
    """Strict en homograph goldens through the full sentences() path:
    CRF POS tag → gruut:<TAG> role → role-specific lexicon pronunciation
    (reference text_processor.py:1102-1113)."""
    import gruut_ray

    def phonemes_of(text, word):
        for s in gruut_ray.sentences(text, lang="en"):
            for w in s.words:
                if w.text.lower() == word:
                    return w.phonemes
        raise AssertionError(f"{word!r} not found in {text!r}")

    # read: present /ɹid/ vs past /ɹɛd/
    assert phonemes_of("I will read the book.", "read") == ["ɹ", "i", "d"]
    assert phonemes_of("She read the letter yesterday.", "read") == \
        ["ɹ", "ɛ", "d"]
    assert phonemes_of("He has read every novel.", "read") == \
        ["ɹ", "ɛ", "d"]
    # wound: noun /wund/ vs past-of-wind /waʊnd/
    assert phonemes_of("The wound healed slowly.", "wound") == \
        ["w", "u", "n", "d"]
    assert phonemes_of("He wound the clock again.", "wound") == \
        ["w", "aʊ", "n", "d"]
    # live: verb /lɪv/ vs adjective /laɪv/
    assert phonemes_of("They live in Berlin.", "live") == ["l", "ɪ", "v"]
    assert phonemes_of("We saw a live concert.", "live") == \
        ["l", "aɪ", "v"]
    # lead: noun metal /lɛd/ vs verb /lid/
    assert phonemes_of("The pipe contains lead.", "lead") == \
        ["l", "ɛ", "d"]
    assert phonemes_of("She will lead the group.", "lead") == \
        ["l", "i", "d"]


def test_phonemize_routed_matches_unrouted(ray_session):
    """Lang-routed phonemize must be output-identical to the per-row
    path — only the physical plan (lang,salt shuffle) differs."""
    import ray.data

    from gruut_ray.stages.phonemize import phonemize, phonemize_routed

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang"])
    cols = ["doc_id", "n_words", "n_phonemes", "n_oov"]
    a = (phonemize(ds, concurrency=(1, 2), batch_size=64)
         .select_columns(cols).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (phonemize_routed(ds, num_salts=4)
         .select_columns(cols).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
