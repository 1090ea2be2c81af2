"""Analysis edge-case conformance: UAX#29 word-break classes, filter
position semantics, char-filter entity handling, parameterized chains.

Expectations pin Lucene-documented behavior (StandardTokenizer implements
UAX#29 word break; WordDelimiterGraphFilter part positions; ShingleFilter
same-position unigram+shingle emission; HTMLStripCharFilter entity
decoding). Reference surface: AnalyzerCreator's predefined/custom chain
construction (reference server/analysis/AnalyzerCreator.java) and
analysis.proto's CustomAnalyzer message.
"""

import pytest

from nrtsearch_tpu.analysis import get_analyzer
from nrtsearch_tpu.analysis.analyzers import _DEFAULT_REGISTRY, get_normalizer


def _custom(spec):
    return _DEFAULT_REGISTRY.from_custom(spec)


def _terms(spec, text):
    return [t.text for t in _custom(spec).analyze(text)]


def _tp(spec, text):
    return [(t.text, t.position) for t in _custom(spec).analyze(text)]


# ---------------------------------------------------------------------------
# UAX#29 word-break classes (Lucene StandardTokenizer parity)
# ---------------------------------------------------------------------------

UAX29 = [
    # MidNumLet '.' joins letters and is stripped at the edge (WB6/WB7)
    ("john.doe@example.com", ["john.doe", "example.com"]),
    ("U.S.A. I.B.M.", ["u.s.a", "i.b.m"]),
    # MidNum ',' and '.' join digit runs (WB11/WB12)
    ("3.14159 1,000,000", ["3.14159", "1,000,000"]),
    # Single_Quote joins letters (WB6/WB7)
    ("can't won't O'Neil", ["can't", "won't", "o'neil"]),
    # hyphen is NOT a joiner: splits
    ("wi-fi state-of-the-art", ["wi", "fi", "state", "of", "the", "art"]),
    # symbols drop entirely
    ("C++ C# .NET", ["c", "c", "net"]),
    # Han has no word-break props -> singles; Katakana runs stay together
    ("日本語のテキスト", ["日", "本", "語", "の", "テキスト"]),
    # Hangul syllables form words
    ("한국어 텍스트", ["한국어", "텍스트"]),
    # letter/digit runs join (ALetter x Numeric)
    ("a1b2c3 42abc", ["a1b2c3", "42abc"]),
    # ExtendNumLet '_' joins everything it touches (WB13a/WB13b)
    ("foo_bar baz__qux", ["foo_bar", "baz__qux"]),
    # non-ASCII letters are ALetter; lowercase preserves non-ASCII case maps
    ("Ünïcödé Ångström", ["ünïcödé", "ångström"]),
    # degenerate inputs
    ("", []),
    ("!!! ... ---", []),
    ("   ", []),
]


@pytest.mark.parametrize("text,expected", UAX29, ids=[c[0][:20] or "empty" for c in UAX29])
def test_uax29_word_break(text, expected):
    assert get_analyzer("standard").terms(text) == expected


def test_uax29_positions_are_dense():
    toks = get_analyzer("standard").analyze("one two three")
    assert [(t.text, t.position) for t in toks] == [
        ("one", 0), ("two", 1), ("three", 2)]


# ---------------------------------------------------------------------------
# WordDelimiterGraphFilter position semantics
# ---------------------------------------------------------------------------

WS = {"tokenizer": {"name": "whitespace"}}


def test_wdf_parts_advance_positions_and_shift_downstream():
    # Lucene WDGF: each part takes its own position; downstream tokens
    # shift by the inserted count (phrase queries over parts work).
    got = _tp({**WS, "tokenFilters": [{"name": "wordDelimiterGraph"}]},
              "Wi-Fi PowerShot500 tail")
    assert got == [("Wi", 0), ("Fi", 1), ("Power", 2), ("Shot", 3),
                   ("500", 4), ("tail", 5)]


def test_wdf_preserve_original_at_first_part_position():
    got = _tp({**WS, "tokenFilters": [
        {"name": "wordDelimiterGraph", "params": {"preserveOriginal": "1"}}]},
        "Wi-Fi tail")
    # original at the first part's position (posInc 0), parts follow
    assert got == [("Wi-Fi", 0), ("Wi", 0), ("Fi", 1), ("tail", 2)]


def test_wdf_unsplit_token_emitted_once():
    got = _tp({**WS, "tokenFilters": [
        {"name": "wordDelimiterGraph", "params": {"preserveOriginal": "1"}}]},
        "plain words")
    assert got == [("plain", 0), ("words", 1)]


def test_wdf_strips_edge_punctuation():
    # single part != original: the cleaned part is emitted
    got = _terms({**WS, "tokenFilters": [{"name": "wordDelimiter"}]},
                 "abc. def")
    assert got == ["abc", "def"]


def test_wdf_case_transition_split():
    # Lucene splitOnCaseChange: an uppercase run followed by lowercase
    # splits before its last uppercase (XMLHttpRequest -> XML Http Request)
    got = _terms({**WS, "tokenFilters": [{"name": "wordDelimiterGraph"}]},
                 "iPhone McDonalds XMLHttpRequest")
    assert got == ["i", "Phone", "Mc", "Donalds", "XML", "Http", "Request"]


# ---------------------------------------------------------------------------
# Char filters
# ---------------------------------------------------------------------------

def test_html_strip_decodes_entities():
    # HTMLStripCharFilter decodes '&amp;' -> '&' (punctuation, dropped by
    # the tokenizer) — 'amp' must NOT surface as a term. Custom chains
    # apply ONLY the declared filters (no implicit lowercase).
    got = _terms({"charFilters": [{"name": "htmlStrip"}]},
                 "<b>Bold</b> &amp; <i>x</i>")
    assert got == ["Bold", "x"]


def test_html_strip_entity_becomes_boundary():
    got = _terms({"charFilters": [{"name": "htmlStrip"}]}, "a&lt;b c&gt;d")
    assert got == ["a", "b", "c", "d"]


def test_html_strip_numeric_entity():
    got = _terms({"charFilters": [{"name": "htmlStrip"}]}, "caf&#233;")
    assert got == ["café"]


def test_mapping_char_filter_multichar():
    got = _terms({"charFilters": [
        {"name": "mapping", "params": {"mappings": "ph=>f"}}]}, "phone")
    assert got == ["fone"]


def test_char_filters_apply_in_declared_order():
    # mapping runs first (ph->f), patternReplace then collapses ff->f
    got = _terms({"charFilters": [
        {"name": "mapping", "params": {"mappings": "ph=>f"}},
        {"name": "patternReplace",
         "params": {"pattern": "f+", "replacement": "f"}},
    ]}, "phfone")
    assert got == ["fone"]


def test_pattern_replace_splits_tokens():
    got = _terms({"charFilters": [
        {"name": "patternReplace",
         "params": {"pattern": "[0-9]+", "replacement": " "}}]},
        "abc123def")
    assert got == ["abc", "def"]


# ---------------------------------------------------------------------------
# Token filters: positions and parameters
# ---------------------------------------------------------------------------

def test_shingle_unigrams_and_shingles_share_start_position():
    got = _tp({"tokenFilters": [
        {"name": "shingle",
         "params": {"minShingleSize": "2", "maxShingleSize": "3"}}]},
        "a b c d")
    assert got == [
        ("a", 0), ("a b", 0), ("a b c", 0),
        ("b", 1), ("b c", 1), ("b c d", 1),
        ("c", 2), ("c d", 2), ("d", 3),
    ]


def test_stop_then_shingle_respects_position_holes():
    # 'the' is removed leaving a hole; shingles never bridge a hole as if
    # adjacent-with-gap tokens were contiguous text positions
    got = _tp({"tokenFilters": [
        {"name": "lowercase"}, {"name": "stop"}, {"name": "shingle"}]},
        "the quick fox")
    assert got == [("quick", 1), ("quick fox", 1), ("fox", 2)]


def test_edge_ngram_all_prefixes():
    got = _terms({"tokenFilters": [
        {"name": "edgeNGram",
         "params": {"minGramSize": "1", "maxGramSize": "3"}}]}, "fox")
    assert got == ["f", "fo", "fox"]


def test_ngram_window():
    got = _terms({"tokenFilters": [
        {"name": "nGram",
         "params": {"minGramSize": "2", "maxGramSize": "2"}}]}, "foxy")
    assert got == ["fo", "ox", "xy"]


def test_synonym_expansion_same_position():
    got = _tp({"tokenFilters": [
        {"name": "synonym", "params": {"synonyms": "tv=>television,telly"}}]},
        "my tv is on")
    assert got == [("my", 0), ("tv", 1), ("television", 1), ("telly", 1),
                   ("is", 2), ("on", 3)]


def test_synonym_multiple_groups():
    got = _tp({"tokenFilters": [
        {"name": "synonym",
         "params": {"synonyms": "usa=>united states;uk=>united kingdom"}}]},
        "usa and uk")
    assert got == [("usa", 0), ("united states", 0), ("and", 1),
                   ("uk", 2), ("united kingdom", 2)]


def test_length_filter_bounds_inclusive():
    got = _terms({"tokenFilters": [
        {"name": "length", "params": {"min": "2", "max": "3"}}]},
        "a ab abc abcd")
    assert got == ["ab", "abc"]


def test_truncate_then_remove_duplicates():
    got = _terms({"tokenFilters": [
        {"name": "truncate", "params": {"length": "2"}},
        {"name": "removeDuplicates"}]},
        "aa ab")
    assert got == ["aa", "ab"]


def test_stop_language_parameter():
    got = _tp({"tokenFilters": [
        {"name": "lowercase"},
        {"name": "stop", "params": {"language": "fr"}}]},
        "le chat et la souris")
    # stopwords removed, position holes preserved
    assert got == [("chat", 1), ("souris", 4)]


def test_stop_custom_wordlist():
    got = _terms({"tokenFilters": [
        {"name": "stop", "params": {"stopwords": "foo,bar"}}]},
        "foo keep bar also")
    assert got == ["keep", "also"]


def test_snowball_porter_language_dispatch():
    assert _terms({"tokenFilters": [
        {"name": "snowballPorter", "params": {"language": "French"}}]},
        "chevaux") == ["cheval"]
    assert _terms({"tokenFilters": [
        {"name": "stemmer", "params": {"language": "German"}}]},
        "häuser") == ["haus"]


def test_unknown_stemmer_language_raises():
    with pytest.raises(KeyError, match="no stemmer"):
        _custom({"tokenFilters": [
            {"name": "snowballPorter", "params": {"language": "Klingon"}}]})


def test_elision_custom_articles():
    got = _terms({"tokenFilters": [
        {"name": "elision", "params": {"articles": "z"}},
        {"name": "lowercase"}]},
        "z'avion l'autre")
    # only z' elided; l' kept (custom article list replaces the default)
    assert got == ["avion", "l'autre"]


def test_asciifolding_diacritics():
    got = _terms({"tokenFilters": [
        {"name": "asciifolding"}, {"name": "lowercase"}]},
        "Crème Brûlée")
    assert got == ["creme", "brulee"]


def test_conditional_protected_term_skips_wrapped_filters():
    got = _terms({"conditionalTokenFilters": [
        {"condition": {"name": "protectedTerm", "params": {"terms": "NASA"}},
         "tokenFilters": [{"name": "lowercase"}]}]},
        "NASA ROCKET")
    assert got == ["NASA", "rocket"]


def test_unknown_token_filter_raises_with_known_list():
    with pytest.raises(KeyError, match="unknown token filter"):
        _custom({"tokenFilters": [{"name": "nope"}]})


def test_unknown_char_filter_raises():
    with pytest.raises(KeyError, match="unknown char filter"):
        _custom({"charFilters": [{"name": "nope"}]})


# ---------------------------------------------------------------------------
# Normalizers (ATOM fields)
# ---------------------------------------------------------------------------

def test_normalizer_lowercase_keeps_whole_value():
    assert get_normalizer({"predefined": "lowercase"}).terms("A B") == ["a b"]


def test_custom_normalizer_chain():
    n = get_normalizer({"custom": {"tokenFilters": [
        {"name": "asciifolding"}, {"name": "lowercase"}]}})
    assert n.terms("Crème Brûlée") == ["creme brulee"]
