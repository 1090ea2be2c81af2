"""Packed multi-segment view + MaxScore pruning.

The pruned (certified) program must return the same top-k docs as the
full-width one with scores equal to f32 rounding, with the hit count
downgraded to a lower bound (GREATER_THAN_OR_EQUAL_TO) when pruning actually
withheld postings — matching Lucene's WAND contract.
"""

import numpy as np
import pytest

import nrtsearch_tpu.core.maxscore as ms
import nrtsearch_tpu.core.packed_view as pv
from nrtsearch_tpu.core.packed_view import QuerySpec
from nrtsearch_tpu.core.searcher import Searcher
from nrtsearch_tpu.core.writer import IndexWriter
from nrtsearch_tpu.query.plan import parse_query
from nrtsearch_tpu.schema.fields import create_field_def

FIELDS = {
    "id": create_field_def("id", {"type": "_ID", "store": True}),
    "t": create_field_def("t", {"type": "TEXT", "search": True}),
}


@pytest.fixture(scope="module")
def searcher():
    """3 segments; 'common' appears everywhere, 'rare' only in a cluster of
    docs with high tf — the shape where block-max pruning wins."""
    import random

    rng = random.Random(7)
    w = IndexWriter(FIELDS, merge_factor=100)
    n = 0
    for seg in range(3):
        docs = []
        for i in range(300):
            words = ["common"] * rng.randint(1, 3)
            words += [rng.choice(["x", "y", "z", "w"])
                      for _ in range(rng.randint(2, 6))]
            if seg == 1 and 40 <= i < 60:
                words += ["rare"] * 3
            docs.append({"id": str(n), "t": " ".join(words)})
            n += 1
        w.add_documents(docs)
        w.refresh()
    return Searcher(w.segments, FIELDS, version=1)


def test_packed_view_single_dispatch_matches_general(searcher):
    node = parse_query({"matchQuery": {"field": "t", "query": "common x"}})
    fast = searcher.search(node, 15)
    orig = searcher._fast_text_search
    searcher._fast_text_search = lambda *a, **kw: None
    try:
        slow = searcher.search(node, 15)
    finally:
        searcher._fast_text_search = orig
    if fast.relation == "EQUAL_TO":
        assert fast.total_hits == slow.total_hits
    else:  # certified tier-1 count is a lower bound (WAND contract)
        assert fast.total_hits <= slow.total_hits
    assert [h.global_ord for h in fast.hits] == [h.global_ord for h in slow.hits]
    for hf, hs in zip(fast.hits, slow.hits):
        assert hf.score == pytest.approx(hs.score, rel=2e-5)


@pytest.fixture()
def force_prune(monkeypatch):
    """Shrink MaxScore engagement floors so the tiny test corpus prunes."""
    monkeypatch.setattr(ms, "PRUNE_MIN_WIDTH", 16)
    monkeypatch.setattr(ms, "THETA_BUDGET", 64)
    monkeypatch.setattr(ms, "WINDOW_MIN", 64)


def test_pruned_topk_bit_identical(searcher, force_prune):
    # the 900-df 'common' term has idf ~ 0.0006: the MaxScore split drops
    # it from the essential dispatch naturally
    view = Searcher(searcher.segments, FIELDS, version=3).packed_view("t")
    spec = QuerySpec(field="t", terms=("rare", "common"), require_all=False)
    k = 10
    pruned = view.search_batch([spec], k, prune=True)[0]
    full = view.search_batch([spec], k, prune=False)[0]
    assert pruned.pruned, "maxscore should certify on this skewed query"
    valid = full.scores > -np.inf
    np.testing.assert_array_equal(pruned.docs[valid], full.docs[valid])
    # pruned scores = essential kernel partials + probed mass: equal to the
    # full program up to f32 summation order
    np.testing.assert_allclose(pruned.scores[valid], full.scores[valid],
                               rtol=2e-5, atol=2e-6)
    # hit count is a lower bound, never an overcount
    assert pruned.total_hits <= full.total_hits


def test_pruned_relation_via_searcher(searcher, force_prune, monkeypatch):
    # NRT_MAXSCORE defaults OFF since round 4 (dense-head is the measured
    # winner); opt in explicitly to exercise the pruned relation contract
    monkeypatch.setenv("NRT_MAXSCORE", "1")
    # fresh searcher so the packed-view cache is clean
    s = Searcher(searcher.segments, FIELDS, version=2)
    node = parse_query({"matchQuery": {"field": "t", "query": "rare common"}})
    td = s.search(node, 10)
    assert td.relation == "GREATER_THAN_OR_EQUAL_TO"
    assert td.hits
    # top hits must match the unpruned general evaluator exactly
    orig = s._fast_text_search
    s._fast_text_search = lambda *a, **kw: None
    try:
        slow = s.search(node, 10)
    finally:
        s._fast_text_search = orig
    assert [h.global_ord for h in td.hits] == [h.global_ord for h in slow.hits]
    for hf, hs in zip(td.hits, slow.hits):
        assert hf.score == pytest.approx(hs.score, rel=2e-5)


def test_mixed_must_should_batch(searcher):
    view = searcher.packed_view("t")
    specs = [
        QuerySpec(field="t", terms=("common", "x"), require_all=True),
        QuerySpec(field="t", terms=("common", "x"), require_all=False),
        QuerySpec(field="t", terms=("rare", "zeta_missing"), require_all=True),
    ]
    res = view.search_batch(specs, 10, prune=False)
    single_must = view.search_batch([specs[0]], 10, prune=False)[0]
    single_should = view.search_batch([specs[1]], 10, prune=False)[0]
    np.testing.assert_array_equal(res[0].docs, single_must.docs)
    np.testing.assert_array_equal(res[1].docs, single_should.docs)
    assert res[0].total_hits == single_must.total_hits
    assert res[1].total_hits == single_should.total_hits
    assert res[1].total_hits >= res[0].total_hits  # OR matches at least AND
    assert res[2].total_hits == 0  # missing required term matches nothing


def test_batched_matches_sequential(searcher):
    view = searcher.packed_view("t")
    specs = [
        QuerySpec(field="t", terms=("common",)),
        QuerySpec(field="t", terms=("x", "y")),
        QuerySpec(field="t", terms=("rare",)),
        QuerySpec(field="t", terms=("z", "common", "w")),
    ]
    batch = view.search_batch(specs, 8, prune=False)
    for spec, got in zip(specs, batch):
        solo = view.search_batch([spec], 8, prune=False)[0]
        np.testing.assert_array_equal(got.docs, solo.docs)
        np.testing.assert_allclose(got.scores, solo.scores, rtol=1e-6)
        assert got.total_hits == solo.total_hits


def test_custom_similarity_in_fast_path():
    """Per-field k1/b now parameterize the packed impacts, so non-default
    similarity no longer falls back to the dense evaluator."""
    fields = {
        "id": create_field_def("id", {"type": "_ID", "store": True}),
        "t": create_field_def("t", {
            "type": "TEXT", "search": True,
            "similarity": "BM25", "similarityParams": {"k1": 0.9, "b": 0.3},
        }),
    }
    w = IndexWriter(fields)
    w.add_documents([
        {"id": "0", "t": "alpha alpha alpha beta"},
        {"id": "1", "t": "alpha beta beta"},
        {"id": "2", "t": "beta gamma"},
    ])
    w.refresh()
    s = Searcher(w.segments, fields, version=1)
    node = parse_query({"matchQuery": {"field": "t", "query": "alpha beta"}})
    fast = s.search(node, 5)
    assert s.fast_query_spec(node) is not None
    orig = s._fast_text_search
    s._fast_text_search = lambda *a, **kw: None
    try:
        slow = s.search(node, 5)
    finally:
        s._fast_text_search = orig
    assert fast.total_hits == slow.total_hits
    for hf, hs in zip(fast.hits, slow.hits):
        assert hf.global_ord == hs.global_ord
        assert hf.score == pytest.approx(hs.score, rel=2e-5)


def test_maxscore_pruning_bit_identical(searcher, force_prune):
    """MaxScore must return exactly the full top-k across query shapes —
    certification failures escalate."""
    s = Searcher(searcher.segments, FIELDS, version=4)
    view = s.packed_view("t")
    for terms in [("common", "x"), ("common", "x", "y", "z"), ("rare", "w")]:
        spec = QuerySpec(field="t", terms=terms, require_all=False)
        two = view.search_batch([spec], 10, prune=True)[0]
        full = view.search_batch([spec], 10, prune=False)[0]
        valid = full.scores > -np.inf
        np.testing.assert_array_equal(two.docs[valid], full.docs[valid], terms)
        np.testing.assert_allclose(two.scores[valid], full.scores[valid],
                                   rtol=2e-5, atol=2e-6)
        assert two.total_hits <= full.total_hits
