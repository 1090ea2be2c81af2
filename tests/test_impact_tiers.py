"""Impact-tiered certify-or-escalate search (core/impact_tiers.py).

The tiered path must return the SAME top-k docs as the full-width dispatch —
certification is a proof, not a heuristic — with scores equal to f32
rounding. Adversarially flat corpora must escalate rather than return
uncertified results."""

import numpy as np
import pytest

from nrtsearch_tpu.core.impact_tiers import TieredPostings
from nrtsearch_tpu.core.packed_view import QuerySpec
from nrtsearch_tpu.core.searcher import Searcher
from nrtsearch_tpu.core.writer import IndexWriter
from nrtsearch_tpu.query.plan import parse_query
from nrtsearch_tpu.schema.fields import create_field_def


def test_tiered_postings_build_partition():
    rng = np.random.default_rng(3)
    # two terms: a stopword-ish one (tiny idf -> mostly tier-2) and an
    # informative one (high idf -> fully tier-1)
    lens = np.array([20000, 300], np.int32)
    offs = np.array([0, 20000], np.int64)
    weights = np.array([0.1, 4.0], np.float32)
    P = int(lens.sum())
    imps = rng.uniform(0.01, 1.0, P).astype(np.float32)
    eps = 0.05
    tiers = TieredPostings.build(imps, offs, lens, weights, eps=eps)
    # term 0: tier-1 = entries with contribution 0.1 * imp > 0.05
    expect_q0 = int((imps[:20000] > eps / 0.1).sum())
    assert tiers.t1_lens[0] == expect_q0
    # term 1: every contribution 4.0 * imp > 0.05 -> all tier-1, no cut
    assert tiers.t1_lens[1] == 300 and tiers.cuts[1] == 0.0
    perm = tiers.order
    q0 = tiers.t1_lens[0]
    t1 = perm[:q0]
    t2 = perm[q0:20000]
    assert t1.max() < 20000 and t2.max() < 20000
    # every tier-1 impact > threshold >= every tier-2 impact
    assert imps[t1].min() > eps / 0.1 >= imps[t2].max()
    assert tiers.cuts[0] == pytest.approx(imps[t2].max())
    # both tiers keep the original (doc-sorted) order
    assert (np.diff(t1) > 0).all() and (np.diff(t2) > 0).all()
    # informative term untouched
    np.testing.assert_array_equal(perm[20000:], np.arange(20000, P))


FIELDS = {
    "id": create_field_def("id", {"type": "_ID", "storeDocValues": True}),
    "body": create_field_def("body", {"type": "TEXT", "search": True}),
    "price": create_field_def("price", {"type": "INT", "storeDocValues": True}),
}


def _zipf_searcher(n_docs=4000, vocab=400, seed=11, uniform=False):
    rng = np.random.default_rng(seed)
    if uniform:
        # adversarial: every doc identical length, tf=1, same terms — scores
        # tie everywhere and certification has nothing to separate
        docs = [{"id": str(i), "body": "aa bb cc dd", "price": str(i % 100)}
                for i in range(n_docs)]
    else:
        ranks = np.arange(1, vocab + 1)
        probs = (1.0 / ranks) / (1.0 / ranks).sum()
        docs = []
        for i in range(n_docs):
            words = rng.choice(vocab, size=rng.integers(5, 30), p=probs)
            docs.append({
                "id": str(i),
                "body": " ".join(f"w{w}" for w in words),
                "price": str(int(rng.integers(0, 1000))),
            })
    w = IndexWriter(FIELDS, merge_factor=100)
    half = len(docs) // 2
    w.add_documents(docs[:half])
    w.add_documents(docs[half:])   # two segments
    return Searcher(w.refresh(), FIELDS, version=1)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_tiered_matches_full(seed, monkeypatch):
    monkeypatch.setenv("NRT_IMPACT_TIERS", "1")
    searcher = _zipf_searcher(seed=20 + seed)
    view = searcher.packed_view("body")
    rng = np.random.default_rng(seed)
    specs = []
    for _ in range(12):
        terms = tuple(f"w{t}" for t in rng.integers(0, 400, size=3))
        specs.append(QuerySpec("body", terms, require_all=bool(rng.integers(2))))
    tiered = view.search_batch(specs, 10, prune=True)
    full = view.search_batch(specs, 10, prune=False)
    for spec, t, f in zip(specs, tiered, full):
        valid = f.scores > -np.inf
        np.testing.assert_array_equal(t.docs[valid], f.docs[valid], err_msg=str(spec))
        np.testing.assert_allclose(
            t.scores[valid], f.scores[valid], rtol=2e-5, atol=1e-6
        )
        assert t.total_hits <= f.total_hits
        if not t.pruned:
            assert t.total_hits == f.total_hits


def test_adversarial_ties_escalate_exactly(monkeypatch):
    monkeypatch.setenv("NRT_IMPACT_TIERS", "1")
    searcher = _zipf_searcher(n_docs=1200, uniform=True)
    view = searcher.packed_view("body")
    specs = [QuerySpec("body", ("aa", "bb"))]
    tiered = view.search_batch(specs, 10, prune=True)[0]
    full = view.search_batch(specs, 10, prune=False)[0]
    # flat scores cannot be certified: the tiered path must have escalated
    # and must therefore match the full dispatch EXACTLY (count included)
    np.testing.assert_array_equal(tiered.docs, full.docs)
    np.testing.assert_array_equal(tiered.scores, full.scores)
    assert not tiered.pruned
    assert tiered.total_hits == full.total_hits == 1200


def test_filtered_fast_path_matches_general(monkeypatch):
    searcher = _zipf_searcher(seed=33)
    q = parse_query({"booleanQuery": {"clauses": [
        {"occur": "MUST", "query": {"matchQuery": {"field": "body", "query": "w3 w17"}}},
        {"occur": "FILTER", "query": {"rangeQuery": {"field": "price", "upper": "500"}}},
        {"occur": "MUST_NOT", "query": {"termQuery": {"field": "price", "longValue": 7}}},
    ]}})
    fast = searcher.search(q, 10)
    # force the general path for comparison
    monkeypatch.setattr(Searcher, "_fast_filtered_text", lambda *a, **k: None)
    general = searcher.search(q, 10)
    assert [h.global_ord for h in fast.hits] == [h.global_ord for h in general.hits]
    for hf, hg in zip(fast.hits, general.hits):
        assert hf.score == pytest.approx(hg.score, rel=2e-5)
    if fast.relation == "EQUAL_TO":
        assert fast.total_hits == general.total_hits
    else:
        assert fast.total_hits <= general.total_hits


def test_filtered_fast_path_used(monkeypatch):
    """The eligible shape actually takes the pushdown path."""
    searcher = _zipf_searcher(seed=44)
    called = {}
    orig = Searcher._fast_filtered_text

    def spy(self, node, top_hits, gsort=None):
        out = orig(self, node, top_hits, gsort)
        called["result"] = out
        return out

    monkeypatch.setattr(Searcher, "_fast_filtered_text", spy)
    q = parse_query({"booleanQuery": {"clauses": [
        {"occur": "MUST", "query": {"matchQuery": {"field": "body", "query": "w2"}}},
        {"occur": "FILTER", "query": {"rangeQuery": {"field": "price", "lower": "100"}}},
    ]}})
    td = searcher.search(q, 10)
    assert called["result"] is not None
    assert td.total_hits > 0


def test_decomposed_boolean_with_scored_columnar_must(monkeypatch):
    """The stress shape (BASELINE config #3): one scored text MUST + scored
    non-text MUSTs (range, deep SHOULD-range boolean) + filters. The
    decomposed pushdown (kernel filter + additive columnar scores) must
    match the general evaluator exactly — scores included."""
    searcher = _zipf_searcher(seed=55)
    q = parse_query({"booleanQuery": {"clauses": [
        {"occur": "MUST", "query": {"matchQuery": {"field": "body", "query": "w3 w17 w40"}}},
        {"occur": "MUST", "query": {"rangeQuery": {"field": "price", "upper": "800"}}},
        {"occur": "MUST", "query": {"booleanQuery": {"clauses": [
            {"occur": "SHOULD", "query": {"rangeQuery": {"field": "price", "lower": "0", "upper": "250"}}},
            {"occur": "SHOULD", "query": {"rangeQuery": {"field": "price", "lower": "251", "upper": "500"}}},
            {"occur": "SHOULD", "query": {"rangeQuery": {"field": "price", "lower": "501", "upper": "901"}}},
            {"occur": "SHOULD", "query": {"termQuery": {"field": "price", "longValue": 42}}},
        ]}}},
        {"occur": "FILTER", "query": {"existsQuery": {"field": "price"}}},
        {"occur": "MUST_NOT", "query": {"termQuery": {"field": "price", "longValue": 13}}},
    ]}})
    called = {}
    orig = Searcher._fast_filtered_text

    def spy(self, node, top_hits, gsort=None):
        out = orig(self, node, top_hits, gsort)
        called["result"] = out
        return out

    monkeypatch.setattr(Searcher, "_fast_filtered_text", spy)
    fast = searcher.search(q, 10)
    assert called.get("result") is not None, "pushdown path not taken"
    monkeypatch.setattr(Searcher, "_fast_filtered_text", lambda *a, **k: None)
    general = searcher.search(q, 10)
    assert [h.global_ord for h in fast.hits] == [h.global_ord for h in general.hits]
    for hf, hg in zip(fast.hits, general.hits):
        assert hf.score == pytest.approx(hg.score, rel=2e-5)
    assert fast.total_hits == general.total_hits
    assert fast.relation == "EQUAL_TO"
