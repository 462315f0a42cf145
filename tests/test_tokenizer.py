from joie_spark.tokenizer import segment, tokenize, tokenize_terms


def test_basic_segmentation_offsets():
    text = "The party rolls dice"
    toks = tokenize(text)
    assert [t.term for t in toks] == ["the", "parti", "roll", "dice"]
    assert [(t.start, t.end) for t in toks] == [(0, 3), (4, 9), (10, 15), (16, 20)]
    # byte offsets slice the original text
    for t, raw in zip(toks, ["The", "party", "rolls", "dice"]):
        assert text.encode()[t.start : t.end].decode() == raw


def test_punctuation_splits_but_mid_chars_join():
    # UAX#29: apostrophe joins letters, comma joins digits,
    # hyphen always splits
    assert [w for _, _, w in segment("don't stop")] == ["don't", "stop"]
    assert [w for _, _, w in segment("1,000 dice")] == ["1,000", "dice"]
    assert [w for _, _, w in segment("crystal-kingdom")] == ["crystal", "kingdom"]
    assert [w for _, _, w in segment("a,b")] == ["a", "b"]
    assert [w for _, _, w in segment("3:4")] == ["3", "4"]


def test_unicode_byte_offsets():
    text = "café naïve"
    toks = tokenize(text)
    data = text.encode("utf-8")
    assert data[toks[0].start : toks[0].end].decode() == "café"
    assert data[toks[1].start : toks[1].end].decode() == "naïve"


def test_non_latin_and_empty():
    assert tokenize_terms("Привет мир") == ["привет", "мир"]
    assert tokenize("") == []
    assert tokenize("   ...   ") == []


def test_case_folding_and_stemming_applied():
    assert tokenize_terms("Running RUNNING running") == ["run", "run", "run"]


def test_ascii_fast_path_equals_unicode_path():
    """segment()'s stdlib-`re` ASCII fast path is pinned bit-equal to the
    full-unicode `regex` path on ASCII input (hypothesis + adversarial
    goldens around every mid-character rule)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from joie_spark.tokenizer import _segment_unicode

    goldens = [
        "don't stop", "1,000,000", "3:4", "a.b.c", "1.5", "x'y'z",
        "a:b c;d", "__ __a__ 9;9", "':;.,'", "can't,won't", "1,a,2",
        "trailing'", "'leading", "1;2;3", "A:B:C", "mid.dot.",
    ]
    for t in goldens:
        assert segment(t) == _segment_unicode(t), t

    alphabet = st.sampled_from(list("abZ09_'.,:;·- \t"))

    @settings(max_examples=500, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=40))
    def check(t):
        if t.isascii():
            assert segment(t) == _segment_unicode(t)
        else:  # the · draws exercise the dispatch itself
            assert segment(t) == _segment_unicode(t)

    check()
