"""English normalizer goldens, vendored from the reference test suite
(reference tests/test_en.py, tests/test_text_processor.py — expectations are
hard-coded there, so no gruut execution is needed; see FIXTURES.md §F2)."""

from gruut_ray import process_document


def words(text, lang="en-us", ssml=False):
    sents = process_document(text, lang=lang, ssml=ssml)
    return [w.text for s in sents for w in s.words]


def test_unclean_text():
    # reference tests/test_en.py:11-52
    text = "IT’S <a> 'test' (seNtEnce) for-only $100, Dr., & [I] ## *like* ## it 100%!"
    sents = process_document(text)
    got = [w.text for w in sents[0].words]
    assert got == [
        "IT'S", "<", "a", ">", "'", "test", "'", "(", "seNtEnce", ")",
        "for", "only", "one", "hundred", "dollars", ",", "Doctor", ",",
        "and", "[", "I", "]", "*", "like", "*", "it", "one", "hundred",
        "percent", "!",
    ]


def test_spell_out():
    # reference tests/test_en.py:54-75
    got = words('<say-as interpret-as="spell-out">abc@1+2-3*.*</say-as>',
                ssml=True)
    assert got == ["a", "b", "c", "at", "one", "plus", "two", "dash",
                   "three", "star", "dot", "star"]


def test_initialisms():
    # reference tests/test_en.py:77-85
    assert words("ABC abc A.B.C.") == ["A", "B", "C", "abc", "A", "B", "C"]


def test_dates():
    # reference tests/test_en.py:87-109
    assert words("1/4/1999 vs. 4/1/1999") == [
        "January", "fourth", ",", "nineteen", "ninety", "nine",
        "versus", "April", "first", ",", "nineteen", "ninety", "nine",
    ]


def test_ordinals():
    # reference tests/test_en.py:111-153
    assert words("1st, 2nd, 3rd, 4th, 5th, 23rd, 32nd, 44th, 121st, 5,111st.") == [
        "first", ",", "second", ",", "third", ",", "fourth", ",", "fifth",
        ",", "twenty", "third", ",", "thirty", "second", ",", "forty",
        "fourth", ",", "one", "hundred", "and", "twenty", "first", ",",
        "five", "thousand", ",", "one", "hundred", "and", "eleventh", ".",
    ]


def test_times():
    # reference tests/test_en.py:155-163
    assert words("4:01am and 4:01 p.m.") == [
        "four", "oh", "one", "A", "M", "and", "four", "oh", "one", "P", "M",
    ]


def test_spell_out_with_digits():
    # reference tests/test_text_processor.py:383-407
    got = words('<say-as interpret-as="spell-out">test123</say-as>', ssml=True)
    assert got == ["t", "e", "s", "t", "one", "two", "three"]


def test_numbers_simple():
    # reference tests/test_text_processor.py:434-448
    assert words("1 2 3") == ["one", "two", "three"]


def test_year_vs_grouped_number():
    # reference text_processor.py:1883-1890 — "2020" year, "2,020" cardinal
    assert words("2020") == ["twenty", "twenty"]
    assert words("2,020") == ["two", "thousand", "and", "twenty"]


def test_decimal_number():
    assert words("1.5") == ["one", "point", "five"]


def test_currency_cents():
    assert words("$1.50") == ["one", "dollar", "fifty", "cents"]
    assert words("$2") == ["two", "dollars"]
