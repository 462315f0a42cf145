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
