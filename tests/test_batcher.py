"""Serving micro-batcher: concurrent queries coalesce into one dispatch and
return exactly what sequential searches return."""

import threading

import pytest

from nrtsearch_tpu.core.searcher import Searcher
from nrtsearch_tpu.core.writer import IndexWriter
from nrtsearch_tpu.query.plan import parse_query
from nrtsearch_tpu.schema.fields import create_field_def
from nrtsearch_tpu.server.batcher import SearchBatcher

FIELDS = {
    "id": create_field_def("id", {"type": "_ID", "store": True}),
    "t": create_field_def("t", {"type": "TEXT", "search": True}),
}

QUERIES = [
    "alpha beta", "gamma", "delta epsilon", "alpha", "beta gamma delta",
    "epsilon", "alpha gamma", "beta",
]


@pytest.fixture(scope="module")
def searcher():
    import random

    rng = random.Random(11)
    words = "alpha beta gamma delta epsilon".split()
    w = IndexWriter(FIELDS)
    w.add_documents([
        {"id": str(i), "t": " ".join(rng.choice(words) for _ in range(8))}
        for i in range(200)
    ])
    w.refresh()
    return Searcher(w.segments, FIELDS, version=1)


@pytest.fixture(scope="module")
def searcher_sortable():
    import random

    rng = random.Random(7)
    words = "alpha beta gamma delta epsilon".split()
    fields = dict(FIELDS)
    fields["price"] = create_field_def(
        "price", {"type": "INT", "storeDocValues": True, "sort": True}
    )
    w = IndexWriter(fields)
    w.add_documents([
        {"id": str(i), "t": " ".join(rng.choice(words) for _ in range(8)),
         "price": (i * 13) % 251}
        for i in range(200)
    ])
    w.refresh()
    return Searcher(w.segments, fields, version=1)


def test_concurrent_searches_match_sequential(searcher):
    batcher = SearchBatcher(max_batch=8, window_ms=20.0)
    try:
        expected = {}
        for q in QUERIES:
            node = parse_query({"matchQuery": {"field": "t", "query": q}})
            expected[q] = searcher.search(node, 10)

        results = {}
        errors = []

        def run(q):
            try:
                node = parse_query({"matchQuery": {"field": "t", "query": q}})
                spec = searcher.fast_query_spec(node)
                results[q] = batcher.search(searcher, spec, 10)
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=run, args=(q,)) for q in QUERIES]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors
        for q in QUERIES:
            got, want = results[q], expected[q]
            assert got.total_hits == want.total_hits, q
            assert [h.global_ord for h in got.hits] == [
                h.global_ord for h in want.hits
            ], q
            for hg, hw in zip(got.hits, want.hits):
                assert hg.score == pytest.approx(hw.score, rel=1e-6)
    finally:
        batcher.stop()


def test_batcher_groups_concurrent_queries(searcher):
    """With a wide-open window, simultaneous queries should share dispatches
    (observable via fewer search_batch calls than queries)."""
    calls = []
    orig = searcher.fast_search_batch

    def counted(specs, k):
        calls.append(len([s for s in specs if s.terms]))
        return orig(specs, k)

    searcher.fast_search_batch = counted
    batcher = SearchBatcher(max_batch=8, window_ms=50.0)
    try:
        barrier = threading.Barrier(len(QUERIES))

        def run(q):
            barrier.wait()
            node = parse_query({"matchQuery": {"field": "t", "query": q}})
            batcher.search(searcher, node and searcher.fast_query_spec(node), 10)

        threads = [threading.Thread(target=run, args=(q,)) for q in QUERIES]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert sum(calls) == len(QUERIES)
        assert len(calls) < len(QUERIES), f"no batching happened: {calls}"
    finally:
        searcher.fast_search_batch = orig
        batcher.stop()


def test_batcher_error_propagates(searcher):
    batcher = SearchBatcher(max_batch=4, window_ms=1.0)
    try:
        class Boom(Exception):
            pass

        def boom(specs, k):
            raise Boom("kernel failed")

        searcher2 = Searcher(searcher.segments, FIELDS, version=2)
        searcher2.fast_search_batch = boom
        node = parse_query({"matchQuery": {"field": "t", "query": "alpha"}})
        spec = searcher2.fast_query_spec(node)
        with pytest.raises(Boom):
            batcher.search(searcher2, spec, 10)
    finally:
        batcher.stop()


def test_mixed_sorted_filtered_batch(searcher_sortable):
    """Widened eligibility: sorted, filtered, and plain queries coalesce in
    ONE batch and each returns exactly its sequential result (VERDICT r2
    item #7 — the fused kernel takes per-query filter masks / sort keys)."""
    from nrtsearch_tpu.core.searcher import SortSpec

    searcher = searcher_sortable
    batcher = SearchBatcher(max_batch=8, window_ms=50.0)
    try:
        plain = parse_query({"matchQuery": {"field": "t", "query": "alpha beta"}})
        filtered = parse_query({"booleanQuery": {"clauses": [
            {"occur": "MUST", "query": {
                "matchQuery": {"field": "t", "query": "gamma"}}},
            {"occur": "FILTER", "query": {
                "rangeQuery": {"field": "price", "upper": "120"}}},
        ]}})
        sorted_node = parse_query({"matchQuery": {"field": "t", "query": "beta"}})
        sort = SortSpec(field="price", reverse=False)

        jobs = [
            ("plain", plain, None),
            ("filtered", filtered, None),
            ("sorted", sorted_node, sort),
            ("sorted_filtered", filtered, sort),
        ]
        expected = {
            name: searcher.search(node, 10, sort=s) for name, node, s in jobs
        }

        results, errors = {}, []
        barrier = threading.Barrier(len(jobs))

        def run(name, node, s):
            try:
                barrier.wait()
                spec = searcher.compile_batchable(node, s)
                assert spec is not None, name
                results[name] = batcher.search(searcher, spec, 10)
            except Exception as e:  # pragma: no cover
                errors.append((name, e))

        threads = [threading.Thread(target=run, args=j) for j in jobs]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors
        for name, node, s in jobs:
            got, want = results[name], expected[name]
            assert got.total_hits == want.total_hits, name
            assert [h.global_ord for h in got.hits] == [
                h.global_ord for h in want.hits
            ], name
    finally:
        batcher.stop()
