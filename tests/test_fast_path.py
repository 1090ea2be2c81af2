"""The scatter-free fast path must agree with the general evaluator."""

import numpy as np
import pytest

from nrtsearch_tpu.core.searcher import Searcher
from nrtsearch_tpu.core.writer import IndexWriter
from nrtsearch_tpu.query.plan import parse_query
from nrtsearch_tpu.schema.fields import create_field_def

FIELDS = {
    "id": create_field_def("id", {"type": "_ID", "store": True}),
    "t": create_field_def("t", {"type": "TEXT", "search": True}),
    "n": create_field_def("n", {"type": "INT", "storeDocValues": True}),
}


@pytest.fixture(scope="module")
def searcher():
    import random

    rng = random.Random(4)
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    w = IndexWriter(FIELDS, merge_factor=100)
    n = 0
    for seg in range(3):  # multiple segments
        docs = []
        for i in range(40):
            docs.append({
                "id": str(n), "n": str(n),
                "t": " ".join(rng.choice(words) for _ in range(12)),
            })
            n += 1
        w.add_documents(docs)
        w.refresh()
    return Searcher(w.segments, FIELDS, version=1)


def _slow(searcher, node, k):
    """Force the general evaluator by disabling the fast path."""
    orig = searcher._fast_text_search
    searcher._fast_text_search = lambda *a, **kw: None
    try:
        return searcher.search(node, k)
    finally:
        searcher._fast_text_search = orig


@pytest.mark.parametrize("qdict", [
    {"matchQuery": {"field": "t", "query": "alpha beta"}},
    {"matchQuery": {"field": "t", "query": "gamma delta epsilon"}},
    {"matchQuery": {"field": "t", "query": "alpha beta", "operator": "MUST"}},
    {"termQuery": {"field": "t", "textValue": "zeta"}},
    {"matchQuery": {"field": "t", "query": "alpha missingterm"}},
    {"matchQuery": {"field": "t", "query": "missingterm", "operator": "MUST"}},
])
def test_fast_path_matches_general(searcher, qdict):
    node = parse_query(qdict)
    fast = searcher.search(node, 20)
    slow = _slow(searcher, node, 20)
    assert fast.total_hits == slow.total_hits
    # rank-by-rank score parity; doc order may flip on float ties (the two
    # paths accumulate in different orders: cumsum-diff vs scatter-add).
    # Under NRT_BUCKET=1 scores carry the documented 15-bit quantization
    # (ops/bucket_retrieval.py): one quantum of the query's max score.
    import os

    rel = 1e-3 if os.environ.get("NRT_BUCKET") == "1" else 2e-5
    for hf, hs in zip(fast.hits, slow.hits):
        assert hf.score == pytest.approx(hs.score, rel=rel, abs=1e-4)
    slow_scores = {h.global_ord: h.score for h in _slow(searcher, node, 200).hits}
    for hf in fast.hits:
        assert hf.score == pytest.approx(
            slow_scores[hf.global_ord], rel=rel, abs=1e-4
        )


def test_fast_path_applies_after_deletes(searcher):
    # deletes fold into impacts; rebuild a writer to keep the fixture clean
    w = IndexWriter(FIELDS)
    w.add_documents([
        {"id": "0", "t": "alpha alpha"},
        {"id": "1", "t": "alpha beta"},
        {"id": "2", "t": "alpha gamma"},
    ])
    w.refresh()
    w.delete_by_id(["1"])
    s = Searcher(w.refresh(), FIELDS, version=2)
    node = parse_query({"matchQuery": {"field": "t", "query": "alpha"}})
    fast = s.search(node, 10)
    slow = _slow(s, node, 10)
    assert fast.total_hits == slow.total_hits == 2
    assert [h.global_ord for h in fast.hits] == [h.global_ord for h in slow.hits]


def test_fast_path_not_used_with_sort_or_filters(searcher):
    # sorted searches take the general path and still work
    from nrtsearch_tpu.core.searcher import SortSpec

    node = parse_query({"matchQuery": {"field": "t", "query": "alpha"}})
    td = searcher.search(node, 5, sort=SortSpec("n", reverse=True))
    assert td.hits and td.hits[0].sort_key is not None
