"""SSML subset conformance (reference tests/test_ssml.py behaviors:
say-as, sub, break, explicit <p>/<s>, per-element lang)."""

from gruut_ray.nlp.normalize import process_document


def _spoken(sents):
    return [s.text_spoken for s in sents]


def _words(sents):
    return [w.text for s in sents for w in s.words if w.is_spoken]


def test_plain_text_auto_wrapped():
    sents = process_document("Hello world.", "en", ssml=True)
    assert _spoken(sents) == ["Hello world"]


def test_say_as_spell_out():
    sents = process_document(
        '<speak><say-as interpret-as="spell-out">abc</say-as></speak>',
        "en", ssml=True)
    assert _words(sents) == ["a", "b", "c"]
    # letters carry the letter role (reference WordRole.LETTER)
    roles = [w.role for s in sents for w in s.words if w.is_spoken]
    assert roles == ["gruut:letter"] * 3


def test_say_as_number_ordinal():
    sents = process_document(
        '<speak><say-as interpret-as="ordinal">3</say-as></speak>',
        "en", ssml=True)
    assert _words(sents) == ["third"]


def test_say_as_digits():
    sents = process_document(
        '<speak><say-as interpret-as="digits">12</say-as></speak>',
        "en", ssml=True)
    assert _words(sents) == ["one", "two"]


def test_sub_alias():
    sents = process_document(
        '<speak>The <sub alias="World Wide Web">WWW</sub> rocks.</speak>',
        "en", ssml=True)
    assert "World" in _words(sents) and "WWW" not in _words(sents)


def test_break_time_attribution():
    sents = process_document(
        '<speak>One.<break time="250ms"/>Two.</speak>', "en", ssml=True)
    assert len(sents) == 2
    assert sents[0].pause_after_ms == 250 or sents[1].pause_before_ms == 250


def test_explicit_paragraphs_and_sentences():
    sents = process_document(
        "<speak><p><s>First sentence</s><s>Second sentence</s></p>"
        "<p><s>Third</s></p></speak>", "en", ssml=True)
    assert [s.par_idx for s in sents] == [0, 0, 1]
    assert _spoken(sents) == ["First sentence", "Second sentence", "Third"]
    # explicit <s> never auto-splits
    sents2 = process_document(
        "<speak><s>No. Splitting. Here</s></speak>", "en", ssml=True)
    assert len(sents2) == 1


def test_w_token_is_not_tokenized():
    # reference semantics ("No splitting", text_processor.py:659-686):
    # the element text is ONE token regardless of whitespace/char rules
    sents = process_document(
        '<speak><w>New York</w> rocks.</speak>', "en", ssml=True)
    words = _words(sents)
    assert words[0] == "New York"
    # zh: <token> blocks per-character splitting (reference
    # tests/test_ssml.py:174-206)
    sents = process_document(
        "<speak><token>南京市</token><token>长江大桥</token>。</speak>",
        "zh", ssml=True)
    assert _words(sents) == ["南京市", "长江大桥"]


def test_lang_attribute_switches_language():
    sents = process_document(
        '<speak><s lang="de">drei</s><s lang="en">three</s></speak>',
        "en", ssml=True)
    assert sents[0].lang.startswith("de")
    assert sents[1].lang.startswith("en")


def test_number_verbalized_inside_ssml():
    sents = process_document("<speak>I have 2 cats.</speak>", "en", ssml=True)
    assert "two" in _words(sents)


def test_phoneme_tag_explicit_pronunciation():
    # reference text_processor.py:929-943: <phoneme ph=...> overrides
    sents = process_document(
        '<speak>Say <phoneme ph="t ə ˈm ɑ t oʊ">tomato</phoneme>.</speak>',
        "en", ssml=True)
    words = {w.text: w for s in sents for w in s.words}
    assert words["tomato"].phonemes == ["t", "ə", "ˈm", "ɑ", "t", "oʊ"]
    # the explicit pronunciation survives the full phonemize path untouched
    import gruut_ray
    sents2 = list(gruut_ray.sentences(
        '<speak><phoneme ph="x y">word</phoneme></speak>', lang="en",
        ssml=True))
    w = [w for s in sents2 for w in s.words if w.text == "word"][0]
    assert w.phonemes == ["x", "y"]


def test_inline_lexicon_and_lookup():
    # vendored from reference tests/test_ssml.py:305-356 (test_lexicon):
    # same markup, lookup scoping, and role selection
    text = """<?xml version="1.0"?>
<speak version="1.1" xml:lang="en-US">
  <lexicon xml:id="test" alphabet="ipa">
    <lexeme>
      <grapheme>tomato</grapheme>
      <phoneme>t ə m ˈɑ t oʊ</phoneme>
    </lexeme>
    <lexeme role="fake-role">
      <grapheme>tomato</grapheme>
      <phoneme>t ə m ˈi t oʊ</phoneme>
    </lexeme>
  </lexicon>
  <w>tomato</w>
  <lookup ref="test">
    <w>tomato</w>
    <w role="fake-role">tomato</w>
  </lookup>
</speak>"""
    sents = process_document(text, "en", ssml=True)
    phonemes = [w.phonemes for s in sents for w in s.words if w.is_spoken]
    # outside the lookup: no inline pronunciation (global path applies)
    assert phonemes[0] is None
    assert phonemes[1] == ["t", "ə", "m", "ˈɑ", "t", "oʊ"]
    assert phonemes[2] == ["t", "ə", "m", "ˈi", "t", "oʊ"]


def test_default_inline_lexicon_no_lookup_required():
    text = """<speak>
  <lexicon><lexeme><grapheme>zzz</grapheme><phoneme>z z z</phoneme></lexeme></lexicon>
  <w>zzz</w>
</speak>"""
    sents = process_document(text, "en", ssml=True)
    words = [w for s in sents for w in s.words if w.is_spoken]
    assert words[0].phonemes == ["z", "z", "z"]


def test_mark_attribution():
    # reference tests/test_ssml.py test_mark: marks attach to neighbors
    sents = process_document(
        '<speak>Before<mark name="m1"/> after.</speak>', "en", ssml=True)
    words = [w for s in sents for w in s.words]
    before = next(w for w in words if w.text == "Before")
    after = next(w for w in words if w.text == "after")
    assert before.marks_after == ["m1"]
    assert after.marks_before == ["m1"]
    # mark at document start attaches before the first word
    sents = process_document('<speak><mark name="m0"/>Go.</speak>', "en",
                             ssml=True)
    first = sents[0].words[0]
    assert first.marks_before == ["m0"]


def test_voice_attribute_tracked():
    sents = process_document(
        '<speak><voice name="alice">Hi there.</voice> Bye.</speak>',
        "en", ssml=True)
    words = [(w.text, w.voice) for s in sents for w in s.words if w.is_spoken]
    assert ("Hi", "alice") in words and ("there", "alice") in words
    assert ("Bye", "") in words
    assert sents[0].voice == "alice"


def test_prosody_text_processed_and_attributed():
    # the reference (gruut 2.4.0) has no <prosody> handling: the element's
    # text is processed like any unknown element and the attributes are
    # dropped.  We match the text behavior and additionally carry the
    # attributes onto the contained words.
    sents = process_document(
        '<speak>Say <prosody rate="slow" pitch="high">two words'
        "</prosody> fast.</speak>", "en", ssml=True)
    words = [w for s in sents for w in s.words if w.is_spoken]
    texts = [w.text for w in words]
    assert texts == ["Say", "two", "words", "fast"]
    by_text = {w.text: w.prosody for w in words}
    assert by_text["two"] == "rate=slow;pitch=high"
    assert by_text["words"] == "rate=slow;pitch=high"
    assert by_text["Say"] == "" and by_text["fast"] == ""


def test_prosody_nesting_composes():
    sents = process_document(
        '<speak><prosody rate="slow"><prosody volume="loud">deep'
        "</prosody></prosody></speak>", "en", ssml=True)
    w = [w for s in sents for w in s.words if w.is_spoken][0]
    assert w.prosody == "rate=slow;volume=loud"


def test_audio_fallback_text_and_src():
    # SSML <audio>: fallback content renders when audio can't play; the
    # source is carried attribution-only
    sents = process_document(
        '<speak>Before <audio src="x.wav">fallback words</audio> after.'
        "</speak>", "en", ssml=True)
    words = [w for s in sents for w in s.words if w.is_spoken]
    assert [w.text for w in words] == ["Before", "fallback", "words",
                                      "after"]
    by_text = {w.text: w.audio_src for w in words}
    assert by_text["fallback"] == "x.wav" and by_text["words"] == "x.wav"
    assert by_text["Before"] == "" and by_text["after"] == ""
