"""Phrase, match-phrase, fuzzy, wildcard, constant-score queries."""

import numpy as np
import pytest

from nrtsearch_tpu.core.searcher import Searcher
from nrtsearch_tpu.core.writer import IndexWriter
from nrtsearch_tpu.query.plan import parse_query
from nrtsearch_tpu.schema.fields import create_field_def

FIELDS = {
    "doc_id": create_field_def("doc_id", {"type": "_ID", "store": True}),
    "body": create_field_def("body", {"type": "TEXT", "search": True, "store": True}),
    "tags": create_field_def(
        "tags", {"type": "TEXT", "search": True, "multiValued": True}
    ),
}

DOCS = [
    {"doc_id": "0", "body": "the quick brown fox jumps"},
    {"doc_id": "1", "body": "quick fox runs but brown dog sleeps"},
    {"doc_id": "2", "body": "a brown quick fox appears twice quick brown fox here"},
    {"doc_id": "3", "body": "completely unrelated words", "tags": ["alpha beta", "gamma delta"]},
]


@pytest.fixture(scope="module")
def searcher():
    w = IndexWriter(FIELDS)
    w.add_documents(DOCS)
    return Searcher(w.refresh(), FIELDS, version=1)


def test_exact_phrase(searcher):
    q = parse_query({"phraseQuery": {"field": "body", "terms": ["quick", "brown"]}})
    td = searcher.search(q, 10)
    assert sorted(h.global_ord for h in td.hits) == [0, 2]
    # doc 2 has phrase freq 1 ("quick brown fox here"); doc 0 has freq 1.
    # higher score = shorter doc => doc 0 ranks first
    assert td.hits[0].global_ord == 0


def test_phrase_three_terms(searcher):
    q = parse_query(
        {"phraseQuery": {"field": "body", "terms": ["quick", "brown", "fox"]}}
    )
    td = searcher.search(q, 10)
    assert sorted(h.global_ord for h in td.hits) == [0, 2]

    q2 = parse_query(
        {"phraseQuery": {"field": "body", "terms": ["brown", "fox", "jumps"]}}
    )
    td2 = searcher.search(q2, 10)
    assert [h.global_ord for h in td2.hits] == [0]


def test_sloppy_phrase(searcher):
    # "quick ... dog" are 4 apart in doc 1 ("quick fox runs but brown dog")
    q0 = parse_query({"phraseQuery": {"field": "body", "terms": ["quick", "dog"]}})
    assert searcher.search(q0, 10).total_hits == 0
    q4 = parse_query(
        {"phraseQuery": {"field": "body", "terms": ["quick", "dog"], "slop": 4}}
    )
    assert [h.global_ord for h in searcher.search(q4, 10).hits] == [1]


def test_match_phrase_analyzed(searcher):
    q = parse_query(
        {"matchPhraseQuery": {"field": "body", "query": "Quick Brown FOX"}}
    )
    td = searcher.search(q, 10)
    assert sorted(h.global_ord for h in td.hits) == [0, 2]


def test_phrase_not_across_multivalue_gap(searcher):
    # "beta" ends value 1, "gamma" starts value 2: position gap prevents match
    q = parse_query({"phraseQuery": {"field": "tags", "terms": ["beta", "gamma"]}})
    assert searcher.search(q, 10).total_hits == 0
    q2 = parse_query({"phraseQuery": {"field": "tags", "terms": ["alpha", "beta"]}})
    assert searcher.search(q2, 10).total_hits == 1


def test_fuzzy(searcher):
    q = parse_query({"fuzzyQuery": {"field": "body", "text": "quik", "maxEdits": 1}})
    td = searcher.search(q, 10)
    assert sorted(h.global_ord for h in td.hits) == [0, 1, 2]
    # maxEdits 0: no match
    q0 = parse_query({"fuzzyQuery": {"field": "body", "text": "quik", "maxEdits": 0}})
    assert searcher.search(q0, 10).total_hits == 0


def test_wildcard(searcher):
    q = parse_query({"wildcardQuery": {"field": "body", "pattern": "qu*k"}})
    td = searcher.search(q, 10)
    assert sorted(h.global_ord for h in td.hits) == [0, 1, 2]
    q2 = parse_query({"wildcardQuery": {"field": "body", "pattern": "sle?ps"}})
    assert [h.global_ord for h in searcher.search(q2, 10).hits] == [1]


def test_constant_score(searcher):
    q = parse_query(
        {
            "constantScoreQuery": {
                "filter": {"matchQuery": {"field": "body", "query": "fox"}}
            },
            "boost": 3.5,
        }
    )
    td = searcher.search(q, 10)
    assert {h.global_ord for h in td.hits} == {0, 1, 2}
    assert all(h.score == pytest.approx(3.5) for h in td.hits)


def test_phrase_survives_persistence(tmp_path, searcher):
    from nrtsearch_tpu.core.directory import commit_segments, open_commit

    commit_segments(searcher.segments, tmp_path, gen=1, version=1)
    _, segments = open_commit(tmp_path)
    s2 = Searcher(segments, FIELDS, version=1)
    q = parse_query({"phraseQuery": {"field": "body", "terms": ["quick", "brown"]}})
    assert sorted(h.global_ord for h in s2.search(q, 10).hits) == [0, 2]


def test_phrase_survives_merge():
    from nrtsearch_tpu.core.merge import merge_segments

    w = IndexWriter(FIELDS)
    for d in DOCS:
        w.add_documents([d])
        w.refresh()
    merged, _ = merge_segments(w.segments, FIELDS)
    s = Searcher([merged], FIELDS, version=1)
    q = parse_query({"phraseQuery": {"field": "body", "terms": ["quick", "brown"]}})
    td = s.search(q, 10)
    ids = sorted(s.segments[h.segment_idx].stored[h.local_id]["doc_id"] for h in td.hits)
    assert ids == ["0", "2"]


def test_match_phrase_prefix(searcher):
    # "quick bro" -> last term expands by prefix to "brown"
    q = parse_query(
        {"matchPhrasePrefixQuery": {"field": "body", "query": "quick bro"}}
    )
    td = searcher.search(q, 10)
    assert sorted(h.global_ord for h in td.hits) == [0, 2]
    # full-word prefix also matches
    q2 = parse_query(
        {"matchPhrasePrefixQuery": {"field": "body", "query": "quick brown"}}
    )
    assert sorted(h.global_ord for h in searcher.search(q2, 10).hits) == [0, 2]
    # non-matching prefix
    q3 = parse_query(
        {"matchPhrasePrefixQuery": {"field": "body", "query": "quick zzz"}}
    )
    assert searcher.search(q3, 10).total_hits == 0


def test_match_phrase_prefix_single_term(searcher):
    q = parse_query({"matchPhrasePrefixQuery": {"field": "body", "query": "jum"}})
    td = searcher.search(q, 10)
    assert [h.global_ord for h in td.hits] == [0]


def test_match_phrase_prefix_max_expansions(searcher):
    # cap expansions to 1: the sorted first expansion of "q" is "quick";
    # phrase "brown q" with slop still behaves sanely
    q = parse_query(
        {"matchPhrasePrefixQuery": {"field": "body", "query": "brown fo",
                                    "maxExpansions": 1}}
    )
    td = searcher.search(q, 10)
    assert sorted(h.global_ord for h in td.hits) == [0, 2]


MM_FIELDS = {
    "doc_id": create_field_def("doc_id", {"type": "_ID", "store": True}),
    "title": create_field_def("title", {"type": "TEXT", "search": True}),
    "body": create_field_def("body", {"type": "TEXT", "search": True}),
}
MM_DOCS = [
    {"doc_id": "0", "title": "quick fox", "body": "lazy dog"},
    {"doc_id": "1", "title": "slow fox", "body": "quick cat runs"},
    {"doc_id": "2", "title": "quick", "body": "quick"},
    {"doc_id": "3", "title": "nothing here", "body": "irrelevant"},
]


@pytest.fixture(scope="module")
def mm_searcher():
    w = IndexWriter(MM_FIELDS)
    w.add_documents(MM_DOCS)
    return Searcher(w.refresh(), MM_FIELDS, version=1)


def test_multi_match_best_fields_dismax(mm_searcher):
    # BEST_FIELDS default: score = best field only (tieBreaker 0)
    q = parse_query({"multiMatchQuery": {
        "fields": ["title", "body"], "query": "quick"}})
    td = mm_searcher.search(q, 10)
    ids = {h.global_ord for h in td.hits}
    assert ids == {0, 1, 2}
    # with tieBreaker 1.0 scores become sum of both fields: doc 2 (matches
    # in both fields) must gain relative to tieBreaker 0
    q_tb = parse_query({"multiMatchQuery": {
        "fields": ["title", "body"], "query": "quick",
        "tieBreakerMultiplier": 1.0}})
    td_tb = mm_searcher.search(q_tb, 10)
    s0 = {h.global_ord: h.score for h in td.hits}
    s1 = {h.global_ord: h.score for h in td_tb.hits}
    assert s1[2] > s0[2]
    assert s1[0] == pytest.approx(s0[0])  # single-field match unchanged


def test_multi_match_cross_fields(mm_searcher):
    # CROSS_FIELDS + MUST: every term must match in SOME field
    q = parse_query({"multiMatchQuery": {
        "fields": ["title", "body"], "query": "quick dog",
        "type": "CROSS_FIELDS", "operator": "MUST"}})
    td = mm_searcher.search(q, 10)
    assert [h.global_ord for h in td.hits] == [0]  # quick@title + dog@body
    # SHOULD: any term matching suffices
    q2 = parse_query({"multiMatchQuery": {
        "fields": ["title", "body"], "query": "quick dog",
        "type": "CROSS_FIELDS"}})
    assert {h.global_ord for h in mm_searcher.search(q2, 10).hits} == {0, 1, 2}


def test_multi_match_phrase_prefix_type(mm_searcher):
    q = parse_query({"multiMatchQuery": {
        "fields": ["title", "body"], "query": "quick ca",
        "type": "PHRASE_PREFIX"}})
    td = mm_searcher.search(q, 10)
    assert [h.global_ord for h in td.hits] == [1]  # "quick cat" in body


def test_disjunction_max(mm_searcher):
    q = parse_query({"disjunctionMaxQuery": {"disjuncts": [
        {"matchQuery": {"field": "title", "query": "quick"}},
        {"matchQuery": {"field": "body", "query": "quick"}},
    ]}})
    td = mm_searcher.search(q, 10)
    assert {h.global_ord for h in td.hits} == {0, 1, 2}
    # tieBreaker adds the non-best disjunct: doc 2 (both fields) gains
    q_tb = parse_query({"disjunctionMaxQuery": {"disjuncts": [
        {"matchQuery": {"field": "title", "query": "quick"}},
        {"matchQuery": {"field": "body", "query": "quick"}},
    ], "tieBreakerMultiplier": 0.5}})
    s0 = {h.global_ord: h.score for h in td.hits}
    s1 = {h.global_ord: h.score for h in mm_searcher.search(q_tb, 10).hits}
    assert s1[2] > s0[2]
    assert s1[0] == pytest.approx(s0[0])


def test_min_score_query(mm_searcher):
    base = parse_query({"matchQuery": {"field": "title", "query": "quick fox"}})
    td = mm_searcher.search(base, 10)
    scores = sorted((h.score for h in td.hits), reverse=True)
    assert len(scores) >= 2
    cutoff = (scores[0] + scores[1]) / 2
    q = parse_query({"minScoreQuery": {
        "query": {"matchQuery": {"field": "title", "query": "quick fox"}},
        "minScore": cutoff}})
    td2 = mm_searcher.search(q, 10)
    assert len(td2.hits) == sum(1 for s in scores if s >= cutoff)


VEC_FIELDS = {
    "doc_id": create_field_def("doc_id", {"type": "_ID", "store": True}),
    "price": create_field_def("price", {"type": "FLOAT", "storeDocValues": True}),
    "v": create_field_def("v", {"type": "VECTOR", "vectorDimensions": 2,
                                "vectorSimilarity": "l2_norm"}),
}


@pytest.fixture(scope="module")
def vec_searcher():
    w = IndexWriter(VEC_FIELDS)
    w.add_documents([
        {"doc_id": "0", "price": "5", "v": [1.0, 0.0]},
        {"doc_id": "1", "price": "0", "v": [0.0, 1.0]},
        {"doc_id": "2", "price": "2", "v": [0.9, 0.1]},
    ])
    return Searcher(w.refresh(), VEC_FIELDS, version=1)


def test_exact_vector_query(vec_searcher):
    q = parse_query({"exactVectorQuery": {"field": "v",
                                          "queryFloatVector": [1.0, 0.0]}})
    td = vec_searcher.search(q, 10)
    assert [h.global_ord for h in td.hits] == [0, 2, 1]  # by l2 similarity
    with pytest.raises(ValueError):
        vec_searcher.search(parse_query(
            {"exactVectorQuery": {"field": "v", "queryFloatVector": [1.0]}}), 10)


def test_function_filter_query(vec_searcher):
    q = parse_query({"functionFilterQuery": {"script": {"source": "price - 1"}}})
    td = vec_searcher.search(q, 10)
    # only docs with price - 1 > 0 match; score is the function value
    assert {h.global_ord for h in td.hits} == {0, 2}
    s = {h.global_ord: h.score for h in td.hits}
    assert s[0] == pytest.approx(4.0)
    assert s[2] == pytest.approx(1.0)


def test_span_near_in_order(searcher):
    # "quick ... fox" within 1 intervening position, in order:
    # doc 0 "quick brown fox" (gap 1), doc 1 "quick fox" (gap 0),
    # doc 2 has both "quick fox appears" and "quick brown fox"
    q = parse_query({"spanQuery": {"spanNearQuery": {
        "clauses": [
            {"spanTermQuery": {"field": "body", "textValue": "quick"}},
            {"spanTermQuery": {"field": "body", "textValue": "fox"}},
        ], "slop": 1, "inOrder": True}}})
    td = searcher.search(q, 10)
    assert sorted(h.global_ord for h in td.hits) == [0, 1, 2]
    # slop 0: only adjacent "quick fox"
    q0 = parse_query({"spanQuery": {"spanNearQuery": {
        "clauses": [
            {"spanTermQuery": {"field": "body", "textValue": "quick"}},
            {"spanTermQuery": {"field": "body", "textValue": "fox"}},
        ], "slop": 0, "inOrder": True}}})
    assert sorted(h.global_ord for h in searcher.search(q0, 10).hits) == [1, 2]


def test_span_near_unordered(searcher):
    # unordered: "fox quick" also matches (doc 2 "brown quick fox": fox
    # after quick; reversed order pair in doc 1 "quick fox runs")
    q = parse_query({"spanQuery": {"spanNearQuery": {
        "clauses": [
            {"spanTermQuery": {"field": "body", "textValue": "fox"}},
            {"spanTermQuery": {"field": "body", "textValue": "quick"}},
        ], "slop": 0, "inOrder": False}}})
    td = searcher.search(q, 10)
    assert 1 in {h.global_ord for h in td.hits}


def test_span_multi_term_prefix(searcher):
    # prefix span: "qui*" near "dog" within 2 -> doc 1 "quick fox runs but
    # brown dog": quick..dog distance is 5 -> no; use doc 0 "fox jumps":
    q = parse_query({"spanQuery": {"spanNearQuery": {
        "clauses": [
            {"spanMultiTermQuery": {"prefixQuery": {"field": "body", "prefix": "bro"}}},
            {"spanTermQuery": {"field": "body", "textValue": "fox"}},
        ], "slop": 0, "inOrder": True}}})
    td = searcher.search(q, 10)
    # "brown fox" adjacent: docs 0 and 2
    assert sorted(h.global_ord for h in td.hits) == [0, 2]


def test_span_bare_term(searcher):
    q = parse_query({"spanQuery": {"spanTermQuery": {"field": "body",
                                                     "textValue": "turtle"}}})
    assert searcher.search(q, 10).total_hits == 0
    q2 = parse_query({"spanQuery": {"spanTermQuery": {"field": "body",
                                                      "textValue": "dog"}}})
    assert {h.global_ord for h in searcher.search(q2, 10).hits} == {1}


def test_span_mixed_fields_rejected():
    with pytest.raises(ValueError):
        parse_query({"spanQuery": {"spanNearQuery": {"clauses": [
            {"spanTermQuery": {"field": "body", "textValue": "a"}},
            {"spanTermQuery": {"field": "tags", "textValue": "b"}},
        ]}}})


def test_span_regexp(searcher):
    # regexp "qu.*k" expands to "quick"; near "fox" within 1 (docs 0 via
    # "quick brown fox", 1 adjacent, 2 adjacent)
    q = parse_query({"spanQuery": {"spanNearQuery": {
        "clauses": [
            {"spanMultiTermQuery": {"regexpQuery": {"field": "body", "text": "qu.*k"}}},
            {"spanTermQuery": {"field": "body", "textValue": "fox"}},
        ], "slop": 1, "inOrder": True}}})
    td = searcher.search(q, 10)
    assert sorted(h.global_ord for h in td.hits) == [0, 1, 2]
    # slop 0: only adjacent "quick fox" (docs 1, 2)
    q0 = parse_query({"spanQuery": {"spanNearQuery": {
        "clauses": [
            {"spanMultiTermQuery": {"regexpQuery": {"field": "body", "text": "qu.*k"}}},
            {"spanTermQuery": {"field": "body", "textValue": "fox"}},
        ], "slop": 0, "inOrder": True}}})
    assert sorted(h.global_ord for h in searcher.search(q0, 10).hits) == [1, 2]


def test_span_term_range(searcher):
    # terms in ["do", "dp") -> "dog"; near "brown" within 1 (doc 1)
    q = parse_query({"spanQuery": {"spanNearQuery": {
        "clauses": [
            {"spanTermQuery": {"field": "body", "textValue": "brown"}},
            {"spanMultiTermQuery": {"termRangeQuery": {
                "field": "body", "lowerTerm": "do", "upperTerm": "dp",
                "includeLower": True, "includeUpper": False}}},
        ], "slop": 1, "inOrder": True}}})
    td = searcher.search(q, 10)
    assert sorted(h.global_ord for h in td.hits) == [1]


def test_span_nested_near(searcher):
    # inner: "quick brown" adjacent in order (docs 0, 2); outer: that group
    # near "fox" within 0 in order -> "quick brown fox" (docs 0, 2)
    q = parse_query({"spanQuery": {"spanNearQuery": {
        "clauses": [
            {"spanNearQuery": {"clauses": [
                {"spanTermQuery": {"field": "body", "textValue": "quick"}},
                {"spanTermQuery": {"field": "body", "textValue": "brown"}},
            ], "slop": 0, "inOrder": True}},
            {"spanTermQuery": {"field": "body", "textValue": "fox"}},
        ], "slop": 0, "inOrder": True}}})
    td = searcher.search(q, 10)
    assert sorted(h.global_ord for h in td.hits) == [0, 2]
    # inner group matching nothing adjacent -> no hits
    q0 = parse_query({"spanQuery": {"spanNearQuery": {
        "clauses": [
            {"spanNearQuery": {"clauses": [
                {"spanTermQuery": {"field": "body", "textValue": "brown"}},
                {"spanTermQuery": {"field": "body", "textValue": "sleeps"}},
            ], "slop": 0, "inOrder": True}},
            {"spanTermQuery": {"field": "body", "textValue": "fox"}},
        ], "slop": 5, "inOrder": False}}})
    td0 = searcher.search(q0, 10)
    assert [h.global_ord for h in td0.hits] == []


def test_index_prefixes_companion_field(tmp_path):
    """indexPrefixes (reference: PrefixFieldDef.java:33, luceneserver.proto
    IndexPrefixes): in-range prefix queries answer from the materialized
    companion postings as a SINGLE term; results identical to the
    expansion path, surviving merge and commit+reload."""
    from nrtsearch_tpu.core.searcher import Searcher
    from nrtsearch_tpu.core.writer import IndexWriter
    from nrtsearch_tpu.query.plan import parse_query
    from nrtsearch_tpu.schema.fields import create_field_def

    mk = lambda px: {
        "id": create_field_def("id", {"type": "_ID", "store": True}),
        "t": create_field_def("t", {
            "type": "TEXT", "search": True,
            **({"indexPrefixes": {"minChars": 2, "maxChars": 4}} if px
               else {}),
        }),
    }
    docs = [
        {"id": "0", "t": "apple pie order"},
        {"id": "1", "t": "applesauce jar"},
        {"id": "2", "t": "apricot jam"},
        {"id": "3", "t": "banana applet"},
        {"id": "4", "t": "appliance store"},
    ]
    w_px = IndexWriter(mk(True), merge_factor=100)
    w_px.add_documents(docs[:3]); w_px.refresh()
    w_px.add_documents(docs[3:]); w_px.refresh()
    s_px = Searcher(w_px.segments, mk(True), version=1)
    w_plain = IndexWriter(mk(False))
    w_plain.add_documents(docs); w_plain.refresh()
    s_plain = Searcher(w_plain.segments, mk(False), version=1)

    # companion exists with positions mirroring source tokens
    tfi = w_px.segments[0].fields["t._index_prefix"]
    assert "ap" in tfi.terms and "appl" in tfi.terms
    assert "apple" not in tfi.terms  # > maxChars: expansion path serves it

    for prefix in ["ap", "app", "appl", "appli", "a"]:
        node = parse_query({"prefixQuery": {"field": "t", "prefix": prefix}})
        got = s_px.search(node, 10)
        want = s_plain.search(node, 10)
        assert got.total_hits == want.total_hits, prefix
        assert sorted(h.global_ord for h in got.hits) == sorted(
            h.global_ord for h in want.hits
        ), prefix

    # merge keeps the companion
    from nrtsearch_tpu.core.merge import merge_segments

    merged, _ = merge_segments(w_px.segments, mk(True))
    assert "t._index_prefix" in merged.fields
    s_m = Searcher([merged], mk(True), version=2)
    node = parse_query({"prefixQuery": {"field": "t", "prefix": "appl"}})
    # apple, applesauce, applet, appliance
    assert s_m.search(node, 10).total_hits == 4

    # boolean-filter context uses the companion too (compiled path)
    node_b = parse_query({"booleanQuery": {"clauses": [
        {"occur": "MUST", "query": {"matchQuery": {"field": "t",
                                                   "query": "jar pie applet store"}}},
        {"occur": "FILTER", "query": {"prefixQuery": {"field": "t",
                                                      "prefix": "appl"}}},
    ]}})
    got_b = s_px.search(node_b, 10)
    want_b = s_plain.search(node_b, 10)
    assert got_b.total_hits == want_b.total_hits
    assert sorted(h.global_ord for h in got_b.hits) == sorted(
        h.global_ord for h in want_b.hits
    )
