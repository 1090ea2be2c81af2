"""Token/char-filter conformance matrix over custom analyzer chains.

Pins the semantics of every filter reachable through the proto
CustomAnalyzer surface (analysis.proto:36-76 — charFilters -> tokenizer ->
tokenFilters [+ conditional]), including the position/offset contracts the
index depends on (stopword holes, shingle spans, word-delimiter position
shifts). Reference behaviors: Lucene's factories resolved by
AnalyzerCreator (server/analysis/AnalyzerCreator.java); expectations below
are transcribed from the documented Lucene filter semantics, not from
reference code.
"""

import pytest

from nrtsearch_tpu.analysis.analyzers import _DEFAULT_REGISTRY


def custom(spec):
    return _DEFAULT_REGISTRY.from_custom(spec)


def terms(spec, text):
    return custom(spec).terms(text)


def toks(spec, text):
    return custom(spec).analyze(text)


# ---------------------------------------------------------------------------
# token filters, one golden each
# ---------------------------------------------------------------------------

FILTER_MATRIX = [
    # (id, tokenFilters, input, expected terms)
    ("lowercase", [{"name": "lowercase"}], "MiXeD Case", ["mixed", "case"]),
    ("uppercase", [{"name": "uppercase"}], "MiXeD Case", ["MIXED", "CASE"]),
    ("reverse", [{"name": "reverse"}], "abc def", ["cba", "fed"]),
    ("trim", [{"name": "trim"}], "abc", ["abc"]),
    ("asciifolding", [{"name": "asciifolding"}], "café naïve",
     ["cafe", "naive"]),
    ("stop_list", [{"name": "lowercase"},
                   {"name": "stop", "params": {"stopwords": "foo,bar"}}],
     "Foo keeps Bar drops", ["keeps", "drops"]),
    ("stop_lang_fr", [{"name": "lowercase"},
                      {"name": "stop", "params": {"language": "fr"}}],
     "le chat et la maison", ["chat", "maison"]),
    ("length", [{"name": "length", "params": {"min": "3", "max": "4"}}],
     "ab abc abcd abcde", ["abc", "abcd"]),
    ("truncate", [{"name": "truncate", "params": {"length": "3"}}],
     "abcdef ab", ["abc", "ab"]),
    ("porterstem", [{"name": "lowercase"}, {"name": "porterstem"}],
     "running easily", ["run", "easili"]),
    ("stemmer_german", [{"name": "lowercase"},
                        {"name": "stemmer", "params": {"language": "german"}}],
     "häuser", ["haus"]),
    ("synonym", [{"name": "lowercase"},
                 {"name": "synonym",
                  "params": {"synonyms": "tv=>television;couch=>sofa,settee"}}],
     # expansion keeps the original at the same position (graph-flat)
     "tv couch", ["tv", "television", "couch", "sofa", "settee"]),
    ("elision_custom", [{"name": "lowercase"},
                        {"name": "elision", "params": {"articles": "d,l"}}],
     "l'avion d'or qu'il", ["avion", "or", "qu'il"]),
    ("shingle_2_3",
     [{"name": "lowercase"},
      {"name": "shingle",
       "params": {"minShingleSize": "2", "maxShingleSize": "3"}}],
     "a b c",
     ["a", "a b", "a b c", "b", "b c", "c"]),
    ("edge_ngram",
     [{"name": "edgeNGram",
       "params": {"minGramSize": "1", "maxGramSize": "3"}}],
     "abcd", ["a", "ab", "abc"]),
    ("ngram",
     [{"name": "nGram", "params": {"minGramSize": "2", "maxGramSize": "2"}}],
     "abc", ["ab", "bc"]),
    ("word_delimiter", [{"name": "wordDelimiter"}],
     "XMLHttpRequest", ["XML", "Http", "Request"]),
    ("word_delimiter_digits", [{"name": "wordDelimiterGraph"}],
     "SD500 j2se", ["SD", "500", "j", "2", "se"]),
    ("word_delimiter_preserve",
     [{"name": "wordDelimiter", "params": {"preserveOriginal": "true"}}],
     "PowerShot", ["PowerShot", "Power", "Shot"]),
    ("remove_duplicates",
     [{"name": "lowercase"},
      {"name": "synonym", "params": {"synonyms": "tv=>tv,television"}},
      {"name": "removeDuplicates"}],
     "tv", ["tv", "television"]),
]


@pytest.mark.parametrize(
    "name,filters,text,expected", FILTER_MATRIX,
    ids=[m[0] for m in FILTER_MATRIX],
)
def test_token_filter_golden(name, filters, text, expected):
    spec = {"tokenizer": {"name": "whitespace"}, "tokenFilters": filters}
    assert terms(spec, text) == expected


# ---------------------------------------------------------------------------
# char filters
# ---------------------------------------------------------------------------


def test_html_strip():
    spec = {"charFilters": [{"name": "htmlStrip"}],
            "tokenFilters": [{"name": "lowercase"}]}
    assert terms(spec, "<b>Bold</b> &amp; <i>text</i>") == [
        "bold", "text"
    ]


def test_mapping_char_filter_dash_to_space():
    spec = {
        "charFilters": [
            {"name": "mapping", "params": {"mappings": "-=> "}}
        ],
        "tokenizer": {"name": "whitespace"},
    }
    assert terms(spec, "brown-fox") == ["brown", "fox"]


def test_pattern_replace_char_filter():
    spec = {
        "charFilters": [
            {"name": "patternReplace",
             "params": {"pattern": r"\d+", "replacement": "NUM"}}
        ],
        "tokenizer": {"name": "whitespace"},
    }
    assert terms(spec, "a1 b22") == ["aNUM", "bNUM"]


def test_unknown_names_raise():
    with pytest.raises(KeyError, match="unknown token filter"):
        terms({"tokenFilters": [{"name": "nope"}]}, "x")
    with pytest.raises(KeyError, match="unknown char filter"):
        terms({"charFilters": [{"name": "nope"}]}, "x")


# ---------------------------------------------------------------------------
# conditional filters (protectedTerm is the reference's only condition)
# ---------------------------------------------------------------------------


def test_conditional_protected_terms_skip_stemming():
    spec = {
        "tokenizer": {"name": "whitespace"},
        "tokenFilters": [{"name": "lowercase"}],
        "conditionalTokenFilters": [{
            "condition": {"name": "protectedTerm",
                          "params": {"terms": "running"}},
            "tokenFilters": [{"name": "porterstem"}],
        }],
    }
    # 'running' is protected (unstemmed); 'jumping' stems
    assert terms(spec, "running jumping") == ["running", "jump"]


def test_conditional_unknown_condition_raises():
    spec = {
        "conditionalTokenFilters": [{
            "condition": {"name": "startsWithX"},
            "tokenFilters": [{"name": "porterstem"}],
        }],
    }
    with pytest.raises(KeyError, match="condition"):
        custom(spec)


# ---------------------------------------------------------------------------
# position / offset contracts (what phrase queries + highlighting consume)
# ---------------------------------------------------------------------------


def test_stopword_hole_positions():
    spec = {"tokenizer": {"name": "whitespace"},
            "tokenFilters": [
                {"name": "lowercase"},
                {"name": "stop", "params": {"stopwords": "the"}}]}
    out = toks(spec, "the quick the fox")
    assert [t.text for t in out] == ["quick", "fox"]
    # holes preserved: quick at 1, fox at 3 (Lucene posInc semantics)
    assert [t.position for t in out] == [1, 3]


def test_shingle_positions_and_offsets():
    spec = {"tokenizer": {"name": "whitespace"},
            "tokenFilters": [
                {"name": "shingle",
                 "params": {"minShingleSize": "2", "maxShingleSize": "2"}}]}
    out = toks(spec, "aa bb cc")
    by_text = {t.text: t for t in out}
    assert by_text["aa bb"].position == by_text["aa"].position
    assert by_text["aa bb"].start_offset == 0
    assert by_text["aa bb"].end_offset == 5
    assert by_text["bb cc"].end_offset == 8


def test_word_delimiter_position_shift():
    spec = {"tokenizer": {"name": "whitespace"},
            "tokenFilters": [{"name": "wordDelimiter"}]}
    out = toks(spec, "PowerShot zoom")
    # Power@0 Shot@1 zoom@2 — downstream tokens shift by inserted parts
    assert [(t.text, t.position) for t in out] == [
        ("Power", 0), ("Shot", 1), ("zoom", 2)
    ]


def test_ngram_offsets_point_into_source():
    spec = {"tokenizer": {"name": "whitespace"},
            "tokenFilters": [
                {"name": "nGram",
                 "params": {"minGramSize": "2", "maxGramSize": "2"}}]}
    out = toks(spec, "xy abc")
    ab = [t for t in out if t.text == "ab"][0]
    assert (ab.start_offset, ab.end_offset) == (3, 5)


# ---------------------------------------------------------------------------
# end-to-end: custom analyzer through the schema -> phrase positions
# ---------------------------------------------------------------------------


def test_custom_analyzer_drives_phrase_search(tmp_path):
    """A mapping char filter + stop filter applied at index AND query time:
    phrase matching honors the filtered positions (hole between terms)."""
    from nrtsearch_tpu.core.writer import IndexWriter
    from nrtsearch_tpu.core.searcher import Searcher
    from nrtsearch_tpu.query.plan import parse_query
    from nrtsearch_tpu.schema.fields import create_field_def

    fds = {
        "id": create_field_def("id", {"type": "_ID", "store": True}),
        "t": create_field_def("t", {
            "type": "TEXT", "search": True,
            "analyzer": {"custom": {
                "tokenizer": {"name": "whitespace"},
                "tokenFilters": [
                    {"name": "lowercase"},
                    {"name": "stop", "params": {"stopwords": "of"}},
                ],
            }},
        }),
    }
    w = IndexWriter(fds)
    w.add_documents([
        {"id": "1", "t": "bank of america"},
        {"id": "2", "t": "bank america"},
        {"id": "3", "t": "america bank"},
    ])
    segs = w.refresh()
    s = Searcher(segs, fds)
    # exact phrase with the stopword hole: "bank of america" leaves
    # bank@0 america@2 — slop 0 phrase "bank america" matches only doc 2
    td = s.search(parse_query({"phraseQuery": {
        "field": "t", "terms": ["bank", "america"]}}), top_hits=10)
    assert td.total_hits == 1
    # slop 1 lets the hole match too (doc 1), still not the reversed doc 3
    td2 = s.search(parse_query({"phraseQuery": {
        "field": "t", "terms": ["bank", "america"], "slop": 1}}),
        top_hits=10)
    assert td2.total_hits == 2
