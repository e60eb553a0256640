"""CLI surface: gruut-compatible JSONL/CSV output, flags, stdin modes."""

import io
import json

from gruut_ray.__main__ import main


def _run(argv, stdin_text=""):
    out = io.StringIO()
    main(argv, stdin=io.StringIO(stdin_text), stdout=out)
    return out.getvalue()


def _jsonl(argv, stdin_text=""):
    return [json.loads(line) for line in
            _run(argv, stdin_text).splitlines() if line]


def test_jsonl_shape_matches_reference():
    sents = _jsonl(["-l", "en-us", "Hello world."])
    assert len(sents) == 1
    s = sents[0]
    # reference Sentence dataclass fields (gruut/const.py:450-499)
    for key in ("idx", "par_idx", "text", "text_with_ws", "text_spoken",
                "lang", "voice", "words", "pause_before_ms",
                "pause_after_ms"):
        assert key in s
    w = s["words"][0]
    for key in ("idx", "text", "text_with_ws", "leading_ws", "trailing_ws",
                "sent_idx", "par_idx", "lang", "voice", "pos", "phonemes",
                "is_major_break", "is_minor_break", "is_punctuation",
                "is_break", "is_spoken"):
        assert key in w
    assert s["text_spoken"] == "Hello world"
    assert w["phonemes"]  # lexicon/G2P ran


def test_stdin_lines():
    sents = _jsonl([], "One line.\nTwo lines.\n")
    assert [s["text_spoken"] for s in sents] == ["One line", "Two lines"]


def test_feature_toggles():
    sents = _jsonl(["--no-numbers", "I have 2 cats."])
    texts = [w["text"] for w in sents[0]["words"]]
    assert "2" in texts and "two" not in texts
    sents = _jsonl(["--no-punctuation", "--no-major-breaks", "Hello world."])
    assert all(not w["is_punctuation"] and not w["is_major_break"]
               for s in sents for w in s["words"])
    sents = _jsonl(["--no-lexicon", "--no-g2p", "--no-pos", "Hello."])
    assert all(w["phonemes"] is None or w["is_break"]
               for s in sents for w in s["words"])


def test_csv_mode():
    # unambiguous present-tense context ("every day"): bare "I read it."
    # is genuinely ambiguous and the CRF POS model prefers the past
    # reading there (the more frequent parse), unlike the old heuristic
    out = _run(["--csv"], "id7|I read it every day.\n")
    row = out.strip().split("|")
    assert row[0] == "id7"
    assert row[2] == "I read it every day"
    assert "ɹ i d" in row[3]  # present-tense homograph


def test_ssml_stdin():
    out = _jsonl(["--ssml"], "<speak>I have 2 cats.</speak>")
    assert "two" in [w["text"] for w in out[0]["words"]]


def test_no_fail_skips_bad_lines():
    # no crash even with odd input; produces output for the good line
    sents = _jsonl(["--no-fail"], "\x00\nGood line.\n")
    assert any(s["text_spoken"] == "Good line" for s in sents)


def test_time_vocabulary_phonemized():
    sents = _jsonl(["4:01 pm"])
    words = {w["text"]: w for s in sents for w in s["words"]}
    assert words["oh"]["phonemes"] == ["oʊ"]


def test_library_sentences_api():
    """Drop-in gruut.sentences() parity (reference gruut/__init__.py:36)."""
    import gruut_ray

    sents = list(gruut_ray.sentences("I had read the 2 books.", lang="en_US"))
    assert len(sents) == 1
    words = {w.text: w for w in sents[0].words}
    assert words["read"].phonemes == ["ɹ", "ɛ", "d"]  # VBN homograph
    assert words["two"].phonemes == ["t", "u"]
    # toggles mirror the reference kwargs
    bare = list(gruut_ray.sentences("Hello, world.", lang="en",
                                    punctuations=False, minor_breaks=False,
                                    major_breaks=False, phonemes=False))
    assert [w.text for w in bare[0].words] == ["Hello", "world"]
    assert all(w.phonemes is None for w in bare[0].words)


def test_csv_blank_lines_and_extra_columns():
    # blank lines skip cleanly; text is column 1 like the reference
    # (gruut/__main__.py:102), all original columns echoed
    out = _run(["--csv"], "id1|hello|extra\n\nid2|ok\n")
    rows = [r.split("|") for r in out.strip().splitlines()]
    assert rows[0][:3] == ["id1", "hello", "extra"]
    assert rows[0][3] == "hello"  # column 1 phonemized, not 'extra'
    assert rows[1][0] == "id2"


def test_cli_reference_parity_flags(capsys):
    from gruut_ray.__main__ import main
    import io, json

    # --stdin-format document: whole stdin is one text
    out = io.StringIO()
    rc = main(["--stdin-format", "document", "-l", "en"],
              stdin=io.StringIO("One sentence. Two sentence."), stdout=out)
    assert rc == 0
    recs = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(recs) == 2  # both sentences from the single document

    # --model-prefix espeak behaves like --espeak; unknown prefix errors
    out = io.StringIO()
    assert main(["--model-prefix", "espeak", "hello"], stdout=out) == 0
    assert main(["--model-prefix", "nope", "hello"],
                stdout=io.StringIO()) == 2

    # --no-post-process accepted and passes through
    out = io.StringIO()
    assert main(["--no-post-process", "hello world"], stdout=out) == 0
    assert json.loads(out.getvalue().splitlines()[0])["text"]
