"""Compiled-tree evaluator (query/compiled.py) vs the eager evaluator:
identical hits, scores, totals, and collector arrays across the query surface.

The compiled path stages the same ops in the same order, so outputs must be
bit-compatible (scores compared exactly, not approximately)."""

import numpy as np
import pytest

from nrtsearch_tpu.core.searcher import Searcher, SortSpec
from nrtsearch_tpu.core.writer import IndexWriter
from nrtsearch_tpu.query.plan import parse_query
from nrtsearch_tpu.schema.fields import create_field_def

FIELDS = {
    "doc_id": create_field_def(
        "doc_id", {"type": "_ID", "storeDocValues": True, "store": True}
    ),
    "body": create_field_def("body", {"type": "TEXT", "search": True, "store": True}),
    "title": create_field_def("title", {"type": "TEXT", "search": True}),
    "price": create_field_def("price", {"type": "INT", "storeDocValues": True}),
    "rating": create_field_def("rating", {"type": "FLOAT", "storeDocValues": True}),
    "tag": create_field_def("tag", {"type": "ATOM", "storeDocValues": True}),
    "loc": create_field_def("loc", {"type": "LAT_LON", "storeDocValues": True}),
}

DOCS = [
    {"doc_id": "1", "body": "the quick brown fox jumps over the lazy dog",
     "title": "fox story", "price": "10", "rating": "4.5", "tag": "animal",
     "loc": [37.7, -122.4]},
    {"doc_id": "2", "body": "a quick brown cat sleeps all day long",
     "title": "cat story", "price": "20", "rating": "3.0", "tag": "animal",
     "loc": [40.7, -74.0]},
    {"doc_id": "3", "body": "the slow green turtle walks home quick quick",
     "title": "turtle tale", "price": "30", "rating": "2.5", "tag": "reptile",
     "loc": [51.5, -0.1]},
    {"doc_id": "4", "body": "python programming on tensor processing units",
     "title": "tpu guide", "price": "40", "rating": "5.0", "tag": "tech",
     "loc": [37.4, -122.1]},
    {"doc_id": "5", "body": "fast matrix multiplication kernels for search",
     "title": "kernel tricks", "price": "50", "rating": "4.0", "tag": "tech",
     "loc": [37.8, -122.3]},
    {"doc_id": "6", "body": "brown bears fish in the quick river",
     "title": "bear facts", "price": "15", "rating": "3.5", "tag": "animal",
     "loc": [47.6, -122.3]},
]

QUERIES = [
    {"matchQuery": {"field": "body", "query": "quick brown"}},
    {"matchQuery": {"field": "body", "query": "quick brown", "operator": "MUST"}},
    {"matchQuery": {"field": "body", "query": "quik", "fuzzyParams": {"maxEdits": 1}}},
    {"termQuery": {"field": "body", "textValue": "turtle"}},
    {"termQuery": {"field": "price", "longValue": 30}},
    {"termQuery": {"field": "tag", "textValue": "tech"}},
    {"termInSetQuery": {"field": "tag", "textTerms": {"terms": ["animal", "reptile"]}}},
    {"termInSetQuery": {"field": "price", "longTerms": {"terms": [10, 50]}}},
    {"rangeQuery": {"field": "price", "lower": "15", "upper": "40"}},
    {"rangeQuery": {"field": "rating", "lower": "3.0", "upper": "5.0",
                    "lowerExclusive": True}},
    {"existsQuery": {"field": "loc"}},
    {"prefixQuery": {"field": "body", "prefix": "qu"}},
    {"wildcardQuery": {"field": "body", "pattern": "br*n"}},
    {"fuzzyQuery": {"field": "body", "text": "quich", "maxEdits": 1}},
    {"phraseQuery": {"field": "body", "terms": ["quick", "brown"]}},
    {"constantScoreQuery": {
        "filter": {"rangeQuery": {"field": "price", "upper": "30"}}}},
    {"disjunctionMaxQuery": {
        "disjuncts": [
            {"matchQuery": {"field": "body", "query": "quick"}},
            {"matchQuery": {"field": "title", "query": "story"}},
        ],
        "tieBreakerMultiplier": 0.3,
    }},
    {"multiMatchQuery": {"fields": ["body", "title"], "query": "quick story"}},
    {"multiMatchQuery": {"fields": ["body", "title"], "query": "quick story",
                         "type": "CROSS_FIELDS"}},
    {"functionScoreQuery": {
        "query": {"matchQuery": {"field": "body", "query": "quick"}},
        "function": "_score * log(price + 1)",
    }},
    {"functionFilterQuery": {"script": {"source": "rating - 3.0"}}},
    {"geoBoundingBoxQuery": {"field": "loc",
                             "topLeft": {"latitude": 48.0, "longitude": -123.0},
                             "bottomRight": {"latitude": 37.0, "longitude": -74.0}}},
    {"geoRadiusQuery": {"field": "loc", "center": {"latitude": 37.7, "longitude": -122.4},
                        "radius": "100 km"}},
    {"booleanQuery": {"clauses": [
        {"occur": "MUST", "query": {"matchQuery": {"field": "body", "query": "quick"}}},
        {"occur": "FILTER", "query": {"rangeQuery": {"field": "price", "upper": "35"}}},
        {"occur": "MUST_NOT", "query": {"termQuery": {"field": "tag", "textValue": "reptile"}}},
    ]}},
    {"booleanQuery": {"clauses": [
        {"occur": "SHOULD", "query": {"matchQuery": {"field": "body", "query": "fox"}}},
        {"occur": "SHOULD", "query": {"matchQuery": {"field": "body", "query": "cat"}}},
        {"occur": "SHOULD", "query": {"matchQuery": {"field": "title", "query": "guide"}}},
    ], "minimumNumberShouldMatch": 1}},
    {"booleanQuery": {"clauses": [   # nested boolean tree
        {"occur": "MUST", "query": {"booleanQuery": {"clauses": [
            {"occur": "SHOULD", "query": {"matchQuery": {"field": "body", "query": "quick"}}},
            {"occur": "SHOULD", "query": {"matchQuery": {"field": "body", "query": "fast"}}},
        ]}}},
        {"occur": "FILTER", "query": {"booleanQuery": {"clauses": [
            {"occur": "SHOULD", "query": {"termQuery": {"field": "tag", "textValue": "tech"}}},
            {"occur": "SHOULD", "query": {"termQuery": {"field": "tag", "textValue": "animal"}}},
        ]}}},
    ]}},
    {"multiFunctionScoreQuery": {
        "query": {"matchQuery": {"field": "body", "query": "quick"}},
        "functions": [
            {"filter": {"termQuery": {"field": "tag", "textValue": "animal"}},
             "weight": 2.0},
            {"script": {"source": "rating"}, "weight": 0.5},
        ],
        "scoreMode": "SCORE_MODE_SUM",
        "boostMode": "BOOST_MODE_MULTIPLY",
    }},
]


@pytest.fixture(scope="module")
def searcher():
    w = IndexWriter(FIELDS, merge_factor=100)
    w.add_documents(DOCS[:3])
    w.add_documents(DOCS[3:])   # two segments
    segs = w.refresh()
    return Searcher(segs, FIELDS, version=1)


def _run(searcher, q, monkeypatch, compiled: bool, **kw):
    # pin the GENERAL evaluator: the filtered-text pushdown (which is only
    # active in compiled mode) has its own equivalence suite in
    # test_packed_view.py; here we compare compiled-vs-eager tree evaluation
    from nrtsearch_tpu.core.searcher import Searcher

    monkeypatch.setattr(Searcher, "_fast_filtered_text", lambda *a, **k: None)
    monkeypatch.setenv("NRT_COMPILED_EVAL", "1" if compiled else "0")
    return searcher.search(q, top_hits=10, **kw)


@pytest.mark.parametrize("qjson", QUERIES, ids=lambda q: next(iter(q)))
def test_compiled_matches_eager(searcher, qjson, monkeypatch):
    q = parse_query(qjson)
    got = _run(searcher, q, monkeypatch, True)
    want = _run(searcher, q, monkeypatch, False)
    assert got.total_hits == want.total_hits
    assert [(h.global_ord, h.score) for h in got.hits] == [
        (h.global_ord, h.score) for h in want.hits
    ]


def test_compiled_sort_and_filter(searcher, monkeypatch):
    q = parse_query({"matchQuery": {"field": "body", "query": "quick brown fast"}})
    f = parse_query({"rangeQuery": {"field": "price", "upper": "45"}})
    kw = dict(sort=SortSpec("price", reverse=True), extra_filter=f)
    got = _run(searcher, q, monkeypatch, True, **kw)
    want = _run(searcher, q, monkeypatch, False, **kw)
    assert got.total_hits == want.total_hits
    assert [(h.global_ord, h.sort_key) for h in got.hits] == [
        (h.global_ord, h.sort_key) for h in want.hits
    ]


def test_compiled_return_arrays(searcher, monkeypatch):
    q = parse_query({"matchQuery": {"field": "body", "query": "quick"}})
    got_td, got_arr = _run(searcher, q, monkeypatch, True, return_arrays=True)
    want_td, want_arr = _run(searcher, q, monkeypatch, False, return_arrays=True)
    assert got_td.total_hits == want_td.total_hits
    assert len(got_arr) == len(want_arr)
    for (gs, gm), (ws, wm) in zip(got_arr, want_arr):
        np.testing.assert_array_equal(np.asarray(gm), np.asarray(wm))
        np.testing.assert_array_equal(
            np.where(np.asarray(gm), np.asarray(gs), 0.0),
            np.where(np.asarray(wm), np.asarray(ws), 0.0),
        )


def test_compiled_count_and_masks(searcher, monkeypatch):
    q = parse_query({"termInSetQuery": {"field": "tag",
                                        "textTerms": {"terms": ["animal", "tech"]}}})
    monkeypatch.setenv("NRT_COMPILED_EVAL", "1")
    got = searcher.count(q)
    got_masks = [np.asarray(m) for m in searcher.match_masks(q)]
    monkeypatch.setenv("NRT_COMPILED_EVAL", "0")
    want = searcher.count(q)
    want_masks = [np.asarray(m) for m in searcher.match_masks(q)]
    assert got == want
    for g, w in zip(got_masks, want_masks):
        np.testing.assert_array_equal(g, w)


def test_compiled_after_delete(searcher, monkeypatch):
    """Deletions produce a NEW segment object; the live-root cache must not
    leak stale masks across delete generations."""
    w = IndexWriter(FIELDS, merge_factor=100)
    w.add_documents(DOCS)
    segs = w.refresh()
    s1 = Searcher(segs, FIELDS, version=1)
    q = parse_query({"matchQuery": {"field": "body", "query": "quick"}})
    before = _run(s1, q, monkeypatch, True)
    w.delete_by_id(["1"])
    s2 = Searcher(w.refresh(), FIELDS, version=2)
    got = _run(s2, q, monkeypatch, True)
    want = _run(s2, q, monkeypatch, False)
    assert before.total_hits == want.total_hits + 1
    assert [(h.global_ord, h.score) for h in got.hits] == [
        (h.global_ord, h.score) for h in want.hits
    ]
