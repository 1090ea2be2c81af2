"""Server-side dense-head + merge-tail path (PackedFieldView.dense_search_batch).

The round-4 serving default on TPU: the packed view lazily builds bf16
dense impact rows for head terms ON DEVICE from the already-resident
postings buffers, scores plain text queries with one MXU matmul + narrow
merge tail, and falls back to the merge/MaxScore paths for filters, sorts,
additive masses, and true conjunctions. Reference role: the BulkScorer hot
loop + impacts (server/search/MyIndexSearcher.java:79).
"""

import numpy as np
import pytest

from nrtsearch_tpu.core.packed_view import QuerySpec
from nrtsearch_tpu.core.searcher import Searcher
from nrtsearch_tpu.core.writer import IndexWriter
from nrtsearch_tpu.schema.fields import create_field_def

FIELDS = {
    "id": create_field_def("id", {"type": "_ID", "store": True}),
    "t": create_field_def("t", {"type": "TEXT", "search": True}),
}

BF16_REL = 6e-3


@pytest.fixture(scope="module")
def searcher():
    """Multi-segment index with one genuinely-dense term ('common', present
    in most docs — becomes a head row at min_df = max(256, D/512)) plus sparse tail
    terms (df < 256)."""
    import random

    rng = random.Random(13)
    w = IndexWriter(FIELDS, merge_factor=100)
    n = 0
    for seg in range(3):
        docs = []
        for i in range(700):
            words = []
            if rng.random() < 0.9:
                words += ["common"] * rng.randint(1, 2)
            words += [rng.choice(["alpha", "beta", "gamma", "delta"])
                      for _ in range(rng.randint(1, 4))]
            if i % 37 == 0:
                words += ["needle"]
            docs.append({"id": str(n), "t": " ".join(words)})
            n += 1
        w.add_documents(docs)
        w.refresh()
    return Searcher(w.segments, FIELDS, version=1)


@pytest.fixture(scope="module")
def view(searcher):
    return searcher.packed_view("t")


def _dense_state_forced(view):
    """Build the dense state; with max_doc ~2100, min_df = max(256,
    max_doc // 512) = 256 and 'common' (df ~1890) becomes a head row."""
    st = view._dense_state()
    assert st is not None, "expected a dense head row for 'common'"
    assert "common" in st["head_pos"]
    return st


def test_dense_matches_merge_path(view):
    _dense_state_forced(view)
    specs = [
        QuerySpec(field="t", terms=("common", "alpha")),
        QuerySpec(field="t", terms=("needle",)),
        QuerySpec(field="t", terms=("common", "needle", "beta")),
        QuerySpec(field="t", terms=("gamma",), boost=2.0),
    ]
    base = view.search_batch(specs, 10, prune=False)
    res = view.dense_search_batch(specs, 10)
    assert res is not None
    for q, (b, r) in enumerate(zip(base, res)):
        assert r.total_hits <= b.total_hits
        if not r.pruned:
            assert r.total_hits == b.total_hits
        nb = int(np.sum(b.scores > -np.inf))
        nr = int(np.sum(r.scores > -np.inf))
        assert nb == nr or r.pruned
        for j in range(min(nb, nr)):
            rel = abs(r.scores[j] - b.scores[j]) / max(abs(b.scores[j]), 1e-9)
            assert rel < BF16_REL, (q, j, b.scores[j], r.scores[j])
            if rel < 1e-9:
                assert r.docs[j] == b.docs[j]


def test_dense_rejects_filtered_and_sorted(view):
    _dense_state_forced(view)
    import jax.numpy as jnp

    mask = jnp.ones(view.max_doc, bool)
    assert view.dense_search_batch(
        [QuerySpec(field="t", terms=("common",), filter=mask)], 5
    ) is None
    assert view.dense_search_batch(
        [QuerySpec(field="t", terms=("common",),
                   sort=(jnp.zeros(view.max_doc), True))], 5
    ) is None


def test_dense_rejects_truly_conjunctive(view):
    _dense_state_forced(view)
    # multi-term MUST -> merge path (conjunction semantics)
    assert view.dense_search_batch(
        [QuerySpec(field="t", terms=("common", "alpha"), require_all=True)], 5
    ) is None
    # single-term MUST is OR-equivalent: allowed
    res = view.dense_search_batch(
        [QuerySpec(field="t", terms=("needle",), require_all=True)], 5
    )
    assert res is not None
    base = view.search_batch(
        [QuerySpec(field="t", terms=("needle",), require_all=True)], 5,
        prune=False,
    )
    assert res[0].total_hits == base[0].total_hits


def test_dense_dead_and_unknown_terms(view):
    _dense_state_forced(view)
    res = view.dense_search_batch(
        [QuerySpec(field="t", terms=("zzzz",)),
         QuerySpec(field="t", terms=("zzzz",), require_all=True)], 5
    )
    assert res is not None
    for r in res:
        assert r.total_hits == 0
        assert (r.scores == -np.inf).all()


def test_dense_respects_deletes(searcher):
    """Deleted docs carry zero impacts — they must not match on the dense
    path either."""
    import random

    rng = random.Random(3)
    w = IndexWriter(FIELDS, merge_factor=100)
    docs = [{"id": str(i), "t": "common " + ("needle" if i % 5 == 0 else "x")}
            for i in range(1500)]
    w.add_documents(docs)
    w.refresh()
    w.delete_by_id([str(i) for i in range(0, 1500, 5)])  # all needle docs
    w.refresh()
    s = Searcher(w.segments, FIELDS, version=2)
    v = s.packed_view("t")
    st = v._dense_state()
    if st is None:
        pytest.skip("corpus below dense threshold")
    res = v.dense_search_batch([QuerySpec(field="t", terms=("needle",))], 10)
    assert res is not None
    assert res[0].total_hits == 0
