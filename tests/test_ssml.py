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


def test_wikipedia_example():
    # reference tests/test_ssml.py:14-62 (lang codes canonicalized here:
    # es-MX resolves to the es profile)
    import gruut_ray

    text = """<?xml version="1.0"?>
<speak xmlns="http://www.w3.org/2001/10/synthesis"
       xmlns:dc="http://purl.org/dc/elements/1.1/"
       version="1.0">
  <metadata>
    <dc:title xml:lang="en">Telephone Menu: Level 1</dc:title>
  </metadata>
  <p>
    <s xml:lang="en-US">
      <voice name="David" gender="male" age="25">
        For English, press <emphasis>one</emphasis>.
      </voice>
    </s>
    <s xml:lang="es-MX">
      <voice name="Miguel" gender="male" age="25">
        Para español, oprima el <emphasis>dos</emphasis>.
      </voice>
    </s>
  </p>
</speak>"""
    rows = [(s.idx, w.idx, w.lang, w.voice, w.text)
            for s in gruut_ray.sentences(text, ssml=True)
            for w in s.words]
    assert rows == [
        (0, 0, "en-us", "David", "For"),
        (0, 1, "en-us", "David", "English"),
        (0, 2, "en-us", "David", ","),
        (0, 3, "en-us", "David", "press"),
        (0, 4, "en-us", "David", "one"),
        (0, 5, "en-us", "David", "."),
        (1, 0, "es-es", "Miguel", "Para"),
        (1, 1, "es-es", "Miguel", "español"),
        (1, 2, "es-es", "Miguel", ","),
        (1, 3, "es-es", "Miguel", "oprima"),
        (1, 4, "es-es", "Miguel", "el"),
        (1, 5, "es-es", "Miguel", "dos"),
        (1, 6, "es-es", "Miguel", "."),
    ]


def test_lang_s_vendored():
    # reference tests/test_ssml.py:64-106 — per-<s> xml:lang switches the
    # date verbalizer (en "February first two thousand" vs it "due
    # gennaio duemila", no article)
    import gruut_ray

    text = """<?xml version="1.0" encoding="ISO-8859-1"?>
    <speak version="1.1" xml:lang="en-US">
    <s>Today, 2/1/2000.</s>
    <s xml:lang="it">Un mese fà, 2/1/2000.</s>
    </speak>"""
    rows = [(s.idx, w.idx, w.lang, w.text)
            for s in gruut_ray.sentences(text, ssml=True) for w in s.words]
    assert rows == [
        (0, 0, "en-us", "Today"), (0, 1, "en-us", ","),
        (0, 2, "en-us", "February"), (0, 3, "en-us", "first"),
        (0, 4, "en-us", ","), (0, 5, "en-us", "two"),
        (0, 6, "en-us", "thousand"), (0, 7, "en-us", "."),
        (1, 0, "it-it", "Un"), (1, 1, "it-it", "mese"),
        (1, 2, "it-it", "fà"), (1, 3, "it-it", ","),
        (1, 4, "it-it", "due"), (1, 5, "it-it", "gennaio"),
        (1, 6, "it-it", "duemila"), (1, 7, "it-it", "."),
    ]


def test_token_zh_vendored():
    # reference tests/test_ssml.py:174-229 — explicit <token>/<w> spans
    # stay whole while surrounding zh text splits per character
    import gruut_ray

    text = """<speak xml:lang="zh-CN">
  <token>南京市</token><token>长江大桥</token>。
  南京市长<w>江大桥</w>。
  上海是个<w>大都会</w>。
  上海人<w>大都</w>会那么说。
</speak>"""
    rows = [(s.idx, w.idx, w.text)
            for s in gruut_ray.sentences(text, ssml=True) for w in s.words]
    assert rows == [
        (0, 0, "南京市"), (0, 1, "长江大桥"), (0, 2, "。"),
        (1, 0, "南"), (1, 1, "京"), (1, 2, "市"), (1, 3, "长"),
        (1, 4, "江大桥"), (1, 5, "。"),
        (2, 0, "上"), (2, 1, "海"), (2, 2, "是"), (2, 3, "个"),
        (2, 4, "大都会"), (2, 5, "。"),
        (3, 0, "上"), (3, 1, "海"), (3, 2, "人"), (3, 3, "大都"),
        (3, 4, "会"), (3, 5, "那"), (3, 6, "么"), (3, 7, "说"),
        (3, 8, "。"),
    ]


def test_lang_element_vendored():
    # reference tests/test_ssml.py:263-304 — <w xml:lang> and <lang>
    # switch language inline without breaking the sentence
    import gruut_ray

    text = """<speak xml:lang="en-US">
  The French word for cat is <w xml:lang="fr">chat</w>.
  He prefers to eat pasta that is <lang xml:lang="it">al dente</lang>.
</speak>"""
    rows = [(s.idx, w.idx, w.lang, w.text)
            for s in gruut_ray.sentences(text, ssml=True) for w in s.words]
    assert rows == [
        (0, 0, "en-us", "The"), (0, 1, "en-us", "French"),
        (0, 2, "en-us", "word"), (0, 3, "en-us", "for"),
        (0, 4, "en-us", "cat"), (0, 5, "en-us", "is"),
        (0, 6, "fr-fr", "chat"), (0, 7, "en-us", "."),
        (1, 0, "en-us", "He"), (1, 1, "en-us", "prefers"),
        (1, 2, "en-us", "to"), (1, 3, "en-us", "eat"),
        (1, 4, "en-us", "pasta"), (1, 5, "en-us", "that"),
        (1, 6, "en-us", "is"), (1, 7, "it-it", "al"),
        (1, 8, "it-it", "dente"), (1, 9, "en-us", "."),
    ]


def test_lexicon_external_file_uri(monkeypatch):
    # reference tests/test_ssml.py:358-386 — <lexicon uri="file://..."/>
    # loads a local W3C PLS document (network URIs stay unsupported).
    # Loading is opt-in: hostile web SSML must not read worker-local
    # files, so it requires $GRUUT_RAY_ALLOW_FILE_LEXICONS.
    import os

    import gruut_ray

    pls = "/root/reference/etc/sample_lexicon.xml"
    if not os.path.isfile(pls):
        import pytest
        pytest.skip("reference sample_lexicon.xml not available")
    monkeypatch.setenv("GRUUT_RAY_ALLOW_FILE_LEXICONS", "1")
    text = f"""<?xml version="1.0"?>
<speak version="1.1" xml:lang="en-US">
  <lexicon xml:id="test" alphabet="ipa" uri="file://{pls}" />
  <lookup ref="test">
    <w>tomato</w>
  </lookup>
</speak>"""
    rows = [(s.idx, w.idx, w.phonemes)
            for s in gruut_ray.sentences(text, ssml=True)
            for w in s.words]
    assert rows == [(0, 0, ["t", "ə", "m", "e", "i̥", "ɾ", "o", "u̥"])]


def test_lexicon_external_file_uri_denied_by_default(monkeypatch):
    # without the opt-in env var a file:// lexicon is ignored: the word
    # gets no phonemes from it (security: untrusted web SSML)
    import gruut_ray

    monkeypatch.delenv("GRUUT_RAY_ALLOW_FILE_LEXICONS", raising=False)
    text = """<speak xml:lang="en-US">
  <lexicon xml:id="t" uri="file:///root/reference/etc/sample_lexicon.xml"/>
  <lookup ref="t"><w>xqzw</w></lookup>
</speak>"""
    words = [w for s in gruut_ray.sentences(text, ssml=True, phonemes=False)
             for w in s.words]
    assert [w.text for w in words] == ["xqzw"]
    assert not words[0].phonemes  # the PLS file was not consulted
