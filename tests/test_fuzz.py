"""Hypothesis fuzz: the normalizer never crashes, is deterministic, and
preserves whitespace byte-exactly when no verbalization rewrites apply
(the reference's text_with_ws contract, SURVEY §7 hard part 1)."""

import unicodedata

from hypothesis import given, settings
from hypothesis import strategies as st

from gruut_ray.nlp.normalize import NormalizeOptions, process_document

LANGS = ["en", "de", "fr", "es", "ru", "zh", "it", "nl", "pt", "sv", "ar"]

any_text = st.text(max_size=200)
# structured text whose every token contains letters: pure-symbol tokens
# are legitimately DROPPED by the pipeline (reference is_non_word filter,
# gruut/lang.py:274,377), so they are excluded from the byte-fidelity
# property
def _is_en_abbreviation(w: str) -> bool:
    # abbreviation expansion ("vs" -> "versus") is a rewrite like
    # verbalization (reference text_processor.py:1731-1772) — excluded
    # from the byte-fidelity property, exactly like initialisms
    from gruut_ray.profiles import get_compiled

    trig = get_compiled("en").abbrev_trigger
    return trig is not None and trig.match(w) is not None


_word = st.text(alphabet=st.sampled_from(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJäöüßéàçñабвгд你好"),
    min_size=1, max_size=12).filter(
    # all-caps tokens are initialisms ("AA" -> "A A", a rewrite like
    # verbalization, reference text_processor.py:1774-1820) — excluded
    lambda w: w.strip() and not (len(w) >= 2 and w.isupper())
    and not _is_en_abbreviation(w))
_decorated = st.tuples(
    st.sampled_from(["", '"', "«", "("]), _word,
    st.sampled_from(["", ",", ";", "?", "!", ")", "»", '"'])).map("".join)
plain_text = st.lists(_decorated, min_size=0, max_size=20).map(" ".join)


@settings(max_examples=200, deadline=None)
@given(any_text, st.sampled_from(LANGS))
def test_never_crashes(text, lang):
    sents = process_document(text, lang)
    for s in sents:
        for w in s.words:
            assert isinstance(w.text, str)


@settings(max_examples=100, deadline=None)
@given(any_text, st.sampled_from(LANGS))
def test_deterministic(text, lang):
    a = process_document(text, lang)
    b = process_document(text, lang)
    assert [(w.text, w.text_with_ws) for s in a for w in s.words] == \
           [(w.text, w.text_with_ws) for s in b for w in s.words]


@settings(max_examples=200, deadline=None)
@given(plain_text)
def test_whitespace_reconstruction(text):
    # NFC-normalize the input: the tokenizer treats combining sequences as
    # given; byte fidelity is asserted on the normalized form
    text = unicodedata.normalize("NFC", text)
    sents = process_document(text, "en", opts=NormalizeOptions(
        detect_numbers=False, detect_currency=False, detect_dates=False,
        detect_times=False, verbalize_numbers=False,
        verbalize_currency=False, verbalize_dates=False,
        verbalize_times=False))
    recon = "".join(w.text_with_ws for s in sents for w in s.words)
    assert recon == text


@settings(max_examples=100, deadline=None)
@given(any_text)
def test_ssml_auto_wrap_never_crashes(text):
    # arbitrary (usually non-XML) text through the SSML path
    process_document(text, "en", ssml=True)


@settings(max_examples=150, deadline=None)
@given(any_text)
def test_ssml_parser_never_crashes(text):
    """Malformed web text fed through the SSML path (broken tags, stray
    entities, control chars) must degrade, never raise."""
    for wrapper in (text, f"<speak>{text}</speak>",
                    f"<speak><s>{text}</s><prosody rate='x'>{text}"
                    f"</prosody></speak>"):
        sents = process_document(wrapper, lang="en", ssml=True)
        for s in sents:
            for w in s.words:
                assert w.text is not None


@settings(max_examples=100, deadline=None)
@given(any_text)
def test_ssml_attributes_never_crash(text):
    clean = text.replace('"', "").replace("<", "").replace(">", "")
    ssml = (f'<speak><voice name="{clean}"><break time="{clean}"/>'
            f'<audio src="{clean}">x</audio>'
            f'<say-as interpret-as="{clean}">5</say-as></voice></speak>')
    process_document(ssml, lang="en", ssml=True)
