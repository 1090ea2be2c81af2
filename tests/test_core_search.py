"""End-to-end core engine tests: build segments, search, verify against a
pure-numpy BM25 reference implementation."""

import math

import numpy as np
import pytest

from nrtsearch_tpu.core.searcher import Searcher, SortSpec
from nrtsearch_tpu.core.writer import IndexWriter
from nrtsearch_tpu.query.plan import parse_query
from nrtsearch_tpu.schema.fields import create_field_def
from nrtsearch_tpu.utils.smallfloat import quantize_length

FIELDS = {
    "doc_id": create_field_def("doc_id", {"type": "_ID", "storeDocValues": True, "store": True}),
    "body": create_field_def("body", {"type": "TEXT", "search": True, "store": True}),
    "title": create_field_def("title", {"type": "TEXT", "search": True, "store": True}),
    "price": create_field_def("price", {"type": "INT", "storeDocValues": True}),
    "ts": create_field_def("ts", {"type": "LONG", "storeDocValues": True}),
    "tags": create_field_def(
        "tags", {"type": "ATOM", "storeDocValues": True, "multiValued": True}
    ),
}

DOCS = [
    {"doc_id": "1", "body": "the quick brown fox jumps over the lazy dog",
     "title": "fox story", "price": "10", "ts": "1700000000001", "tags": ["animal", "fast"]},
    {"doc_id": "2", "body": "a quick brown cat sleeps all day",
     "title": "cat story", "price": "20", "ts": "1700000000002", "tags": ["animal"]},
    {"doc_id": "3", "body": "the slow green turtle walks home quick quick",
     "title": "turtle tale", "price": "30", "ts": "1700000000003", "tags": ["animal", "slow"]},
    {"doc_id": "4", "body": "python programming on tensor processing units",
     "title": "tpu guide", "price": "40", "ts": "1700000000004", "tags": ["tech"]},
    {"doc_id": "5", "body": "fast matrix multiplication kernels for search",
     "title": "kernel tricks", "price": "50", "ts": "1700000000005", "tags": ["tech", "fast"]},
]


def build_searcher(docs=DOCS, merge_factor=10):
    w = IndexWriter(FIELDS, merge_factor=merge_factor)
    w.add_documents(docs)
    segs = w.refresh()
    return w, Searcher(segs, FIELDS, version=1)


def ref_bm25(query_terms, field="body", k1=1.2, b=0.75):
    """Reference BM25 (Lucene formulation) over DOCS, quantized lengths."""
    from nrtsearch_tpu.analysis import get_analyzer

    an = get_analyzer("standard")
    docs_tokens = [an.terms(d[field]) for d in DOCS]
    dls = [int(quantize_length(len(t))) for t in docs_tokens]
    n = len(DOCS)
    avgdl = sum(dls) / n
    scores = []
    for i, toks in enumerate(docs_tokens):
        s = 0.0
        for t in query_terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            df = sum(1 for dt in docs_tokens if t in dt)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf / (tf + k1 * (1 - b + b * dls[i] / avgdl))
        scores.append(s)
    return scores


def test_match_query_bm25_parity():
    _, searcher = build_searcher()
    q = parse_query({"matchQuery": {"field": "body", "query": "quick brown"}})
    td = searcher.search(q, top_hits=10)
    expected = ref_bm25(["quick", "brown"])
    got = {h.global_ord: h.score for h in td.hits}
    matching = [i for i, s in enumerate(expected) if s > 0]
    assert set(got) == set(matching)
    for i in matching:
        assert got[i] == pytest.approx(expected[i], rel=1e-5)
    # ranking order
    order = [h.global_ord for h in td.hits]
    assert order == sorted(matching, key=lambda i: (-expected[i], i))


def test_match_query_and_operator():
    _, searcher = build_searcher()
    q = parse_query(
        {"matchQuery": {"field": "body", "query": "quick brown", "operator": "MUST"}}
    )
    td = searcher.search(q, top_hits=10)
    assert sorted(h.global_ord for h in td.hits) == [0, 1]
    assert td.total_hits == 2


def test_term_query_text():
    _, searcher = build_searcher()
    q = parse_query({"termQuery": {"field": "title", "textValue": "fox"}})
    td = searcher.search(q, top_hits=10)
    assert [h.global_ord for h in td.hits] == [0]


def test_term_query_numeric_and_range():
    _, searcher = build_searcher()
    q = parse_query({"termQuery": {"field": "price", "intValue": 30}})
    td = searcher.search(q, top_hits=10)
    assert [h.global_ord for h in td.hits] == [2]

    rq = parse_query({"rangeQuery": {"field": "price", "lower": "15", "upper": "40"}})
    td = searcher.search(rq, top_hits=10)
    assert sorted(h.global_ord for h in td.hits) == [1, 2, 3]

    rq = parse_query(
        {"rangeQuery": {"field": "price", "lower": "20", "upper": "40",
                        "lowerExclusive": True}}
    )
    td = searcher.search(rq, top_hits=10)
    assert sorted(h.global_ord for h in td.hits) == [2, 3]


def test_range_on_exact_long():
    _, searcher = build_searcher()
    # values only differ in the low bits — requires exact int64 handling
    rq = parse_query(
        {"rangeQuery": {"field": "ts", "lower": "1700000000002", "upper": "1700000000004"}}
    )
    td = searcher.search(rq, top_hits=10)
    assert sorted(h.global_ord for h in td.hits) == [1, 2, 3]


def test_boolean_query():
    _, searcher = build_searcher()
    q = parse_query(
        {
            "booleanQuery": {
                "clauses": [
                    {"occur": "MUST", "query": {"matchQuery": {"field": "body", "query": "quick"}}},
                    {"occur": "MUST_NOT", "query": {"termQuery": {"field": "title", "textValue": "cat"}}},
                    {"occur": "FILTER", "query": {"rangeQuery": {"field": "price", "upper": "35"}}},
                ]
            }
        }
    )
    td = searcher.search(q, top_hits=10)
    assert sorted(h.global_ord for h in td.hits) == [0, 2]


def test_term_in_set_and_multivalued_atom():
    _, searcher = build_searcher()
    q = parse_query(
        {"termInSetQuery": {"field": "tags", "textTerms": {"terms": ["fast"]}}}
    )
    td = searcher.search(q, top_hits=10)
    assert sorted(h.global_ord for h in td.hits) == [0, 4]


def test_sort_by_field():
    _, searcher = build_searcher()
    q = parse_query({"matchAllQuery": {}})
    td = searcher.search(q, top_hits=3, sort=SortSpec("price", reverse=True))
    assert [h.global_ord for h in td.hits] == [4, 3, 2]
    td = searcher.search(q, top_hits=3, sort=SortSpec("ts", reverse=False))
    assert [h.global_ord for h in td.hits] == [0, 1, 2]
    assert td.total_hits == 5


def test_delete_by_id_and_upsert():
    w, searcher = build_searcher()
    w.delete_by_id(["2"])
    searcher = Searcher(w.refresh(), FIELDS, version=2)
    q = parse_query({"matchQuery": {"field": "body", "query": "quick"}})
    td = searcher.search(q, top_hits=10)
    assert 1 not in [h.global_ord for h in td.hits]
    assert td.total_hits == 2

    # upsert doc 3 with new body
    w.add_documents([{"doc_id": "3", "body": "completely different now", "price": "99"}])
    searcher = Searcher(w.refresh(), FIELDS, version=3)
    td = searcher.search(q, top_hits=10)
    assert td.total_hits == 1  # only doc 1 still matches "quick"
    assert searcher.num_docs == 4  # 5 - deleted + upsert replaces


def test_multi_segment_and_merge():
    w = IndexWriter(FIELDS, merge_factor=2)
    for d in DOCS:
        w.add_documents([d])
        w.refresh()
    # merge_factor=2 -> merged into fewer segments
    assert len(w.segments) <= 3
    searcher = Searcher(w.segments, FIELDS, version=1)
    q = parse_query({"matchQuery": {"field": "body", "query": "quick brown"}})
    td = searcher.search(q, top_hits=10)
    expected = ref_bm25(["quick", "brown"])
    matching = [i for i, s in enumerate(expected) if s > 0]
    # global ords may be remapped after merge; compare via stored doc_id
    got_ids = set()
    for h in td.hits:
        seg = searcher.segments[h.segment_idx]
        got_ids.add(seg.stored[h.local_id]["doc_id"])
    assert got_ids == {str(i + 1) for i in matching}
    for h in td.hits:
        seg = searcher.segments[h.segment_idx]
        i = int(seg.stored[h.local_id]["doc_id"]) - 1
        assert h.score == pytest.approx(expected[i], rel=1e-5)


def test_exists_and_prefix_and_matchall():
    _, searcher = build_searcher()
    q = parse_query({"existsQuery": {"field": "price"}})
    assert searcher.search(q, top_hits=10).total_hits == 5
    q = parse_query({"prefixQuery": {"field": "body", "prefix": "qui"}})
    assert sorted(h.global_ord for h in searcher.search(q, 10).hits) == [0, 1, 2]
    q = parse_query({"matchAllQuery": {}})
    assert searcher.search(q, top_hits=10).total_hits == 5


def test_function_score():
    _, searcher = build_searcher()
    q = parse_query(
        {
            "functionScoreQuery": {
                "query": {"matchQuery": {"field": "body", "query": "quick"}},
                "script": {"source": "_score * price"},
            }
        }
    )
    td = searcher.search(q, top_hits=10)
    base = ref_bm25(["quick"])
    prices = [10, 20, 30, 40, 50]
    for h in td.hits:
        assert h.score == pytest.approx(base[h.global_ord] * prices[h.global_ord], rel=1e-5)


def test_tiered_merge_leaves_large_segments_alone():
    # Tiered policy: one big segment + many small ones -> the small ones
    # merge together, the big one is not rewritten (reference: Lucene
    # TieredMergePolicy write-amplification behavior).
    w = IndexWriter(FIELDS, merge_factor=100)
    big = [
        {"doc_id": str(i), "body": f"big segment doc {i}", "price": "1"}
        for i in range(100, 150)
    ]
    w.add_documents(big)
    w.refresh()
    big_seg_id = w.segments[0].seg_id
    w.segments_per_tier = 3
    for i in range(5):  # five 1-doc segments
        w.add_documents(
            [{"doc_id": str(i), "body": f"small {i} quick", "price": "2"}]
        )
        w.refresh()
    assert len(w.segments) <= 3
    assert any(s.seg_id == big_seg_id for s in w.segments)  # untouched
    searcher = Searcher(w.segments, FIELDS, version=1)
    q = parse_query({"matchQuery": {"field": "body", "query": "quick"}})
    assert searcher.search(q, top_hits=10).total_hits == 5


def test_tiered_merge_respects_max_merged_docs():
    w = IndexWriter(FIELDS, merge_factor=100)
    w.segments_per_tier = 2
    w.max_merged_docs = 3
    for i in range(8):
        w.add_documents(
            [{"doc_id": str(i), "body": f"doc number {i}", "price": "1"}]
        )
        w.refresh()
    # groups are capped at 3 docs, so no single mega-segment
    assert all(s.live_doc_count <= 3 for s in w.segments)
    searcher = Searcher(w.segments, FIELDS, version=1)
    q = parse_query({"matchQuery": {"field": "body", "query": "doc"}})
    assert searcher.search(q, top_hits=10).total_hits == 8
