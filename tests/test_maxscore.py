"""MaxScore pruned search (core/maxscore.py) vs the full-width dispatch.

The pruned path must return EXACTLY the same top-k docs and scores as the
unpruned fused dispatch (the reference's contract for BlockMaxWAND /
MaxScore inside Lucene's BulkScorer: pruning is a pure optimization,
reference server/search/MyIndexSearcher.java). Hit counts on the pruned
path are lower bounds (exact=False), mirroring Lucene's
GREATER_THAN_OR_EQUAL_TO relation under WAND.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nrtsearch_tpu.core import maxscore
from nrtsearch_tpu.core.maxscore import PrunedIndex, run_upper_bounds
from nrtsearch_tpu.ops.bm25 import lucene_idf


def _build_corpus(num_docs, vocab, avg_len, seed=0):
    """Tiny Zipf corpus in the packed flat-postings layout."""
    rng = np.random.default_rng(seed)
    doc_lens = np.maximum(
        rng.lognormal(np.log(avg_len), 0.4, num_docs).astype(np.int64), 2
    )
    total = int(doc_lens.sum())
    ranks = np.arange(1, vocab + 1)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    terms = rng.choice(vocab, size=total, p=probs).astype(np.int32)
    docs = np.repeat(np.arange(num_docs, dtype=np.int32), doc_lens)
    key = docs.astype(np.int64) * vocab + terms
    uniq, counts = np.unique(key, return_counts=True)
    u_docs = (uniq // vocab).astype(np.int32)
    u_terms = (uniq % vocab).astype(np.int32)
    order = np.lexsort((u_docs, u_terms))
    post_docs = u_docs[order]
    post_freqs = counts[order].astype(np.float32)
    post_terms = u_terms[order]
    offsets = np.zeros(vocab, np.int64)
    lengths = np.zeros(vocab, np.int32)
    t_uniq, t_start, t_count = np.unique(
        post_terms, return_index=True, return_counts=True
    )
    offsets[t_uniq] = t_start
    lengths[t_uniq] = t_count
    dl = np.zeros(num_docs, np.float32)
    np.add.at(dl, u_docs, counts)
    return post_docs, post_freqs, offsets, lengths, dl


def _make_index(num_docs=4000, vocab=600, avg_len=24, seed=0):
    post_docs, post_freqs, offsets, lengths, dl = _build_corpus(
        num_docs, vocab, avg_len, seed
    )
    k1, b = 1.2, 0.75
    avgdl = dl.sum() / num_docs
    imp = post_freqs / (
        post_freqs + k1 * (1.0 - b + b * dl[post_docs] / avgdl)
    )
    pad = 1
    while pad < len(post_docs) + 256:
        pad <<= 1
    d_ids = np.zeros(pad, np.int32)
    d_ids[: len(post_docs)] = post_docs
    d_imp = np.zeros(pad, np.float32)
    d_imp[: len(post_docs)] = imp
    idx = PrunedIndex(
        jax.device_put(d_ids), jax.device_put(d_imp),
        offsets, lengths, num_docs,
    )
    return idx, offsets, lengths, num_docs


def _queries(idx_lengths, num_docs, rng, n_queries, terms_per_q, vocab):
    ranks = np.arange(1, vocab + 1)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    out = []
    for _ in range(n_queries):
        tids = rng.choice(vocab, size=terms_per_q, replace=False, p=probs)
        entries = [
            (lucene_idf(num_docs, int(idx_lengths[t])), [int(t)])
            for t in tids
            if idx_lengths[t] > 0
        ]
        out.append(
            {"entries": entries, "require_all": False, "n_terms": 1}
        )
    return out


def _assert_topk_equal(pruned, full, k, ctx=""):
    """Same docs + scores modulo f32 summation-order noise; ties (equal
    scores) may permute docs."""
    ps, pd, _, _ = pruned
    fs, fd, _, _ = full
    np.testing.assert_allclose(ps[:k], fs[:k], rtol=2e-4, atol=2e-5,
                               err_msg=f"scores diverge {ctx}")
    mism = pd[:k] != fd[:k]
    if mism.any():
        # every mismatching position must be a score tie (within noise)
        bad = np.abs(ps[:k][mism] - fs[:k][mism]) > 2e-4 * np.abs(
            fs[:k][mism]
        ) + 2e-5
        assert not bad.any(), (
            f"doc mismatch at non-tied scores {ctx}: "
            f"{pd[:k][mism][:5]} vs {fd[:k][mism][:5]}"
        )


@pytest.fixture()
def low_thresholds(monkeypatch):
    """Shrink engagement thresholds so tiny test corpora take the pruned
    path (production floors target 64k+ postings widths)."""
    monkeypatch.setattr(maxscore, "PRUNE_MIN_WIDTH", 64)
    monkeypatch.setattr(maxscore, "THETA_BUDGET", 256)
    monkeypatch.setattr(maxscore, "WINDOW_MIN", 128)


def test_run_upper_bounds_are_upper_bounds():
    idx, offsets, lengths, _ = _make_index(seed=3)
    imp = np.asarray(idx.impacts)
    for t in range(0, len(offsets), 37):
        if lengths[t] == 0:
            continue
        true_max = imp[offsets[t] : offsets[t] + lengths[t]].max()
        assert idx.run_ub[t] >= true_max - 1e-7
        assert idx.run_ub[t] <= 1.0


def test_pruned_matches_full_topk(low_thresholds):
    idx, offsets, lengths, num_docs = _make_index()
    rng = np.random.default_rng(7)
    queries = _queries(lengths, num_docs, rng, 24, 5, len(lengths))
    k = 10
    pruned = idx.search(queries, k, prune=True)
    full = idx.search(queries, k, prune=False)
    n_pruned_path = 0
    for qi, (p, f) in enumerate(zip(pruned, full)):
        _assert_topk_equal(p, f, k, ctx=f"query {qi}")
        assert f[3] is True or f[3] == True  # noqa: E712  full = exact
        # pruned hits must be a LOWER bound of the exact count
        assert p[2] <= f[2] + 0  # lower bound (equal when escalated)
        n_pruned_path += int(not p[3])
    # the fixture thresholds must actually engage pruning on a good share
    # of queries (some legitimately find nothing prunable or escalate)
    assert n_pruned_path >= len(queries) // 3, (
        f"only {n_pruned_path}/{len(queries)} took the pruned path"
    )


def test_pruned_matches_full_many_seeds(low_thresholds):
    k = 25
    for seed in range(4):
        idx, offsets, lengths, num_docs = _make_index(
            num_docs=2500, vocab=400, seed=seed
        )
        rng = np.random.default_rng(100 + seed)
        queries = _queries(lengths, num_docs, rng, 12, 4, len(lengths))
        pruned = idx.search(queries, k, prune=True)
        full = idx.search(queries, k, prune=False)
        for qi, (p, f) in enumerate(zip(pruned, full)):
            _assert_topk_equal(p, f, k, ctx=f"seed {seed} query {qi}")


def test_pruned_with_filter_mask(low_thresholds):
    idx, offsets, lengths, num_docs = _make_index(seed=11)
    rng = np.random.default_rng(5)
    mask = jax.device_put(rng.random(num_docs) < 0.3)
    queries = _queries(lengths, num_docs, rng, 16, 5, len(lengths))
    for q in queries:
        q["filter"] = mask
    k = 10
    pruned = idx.search(queries, k, prune=True)
    full = idx.search(queries, k, prune=False)
    mask_h = np.asarray(mask)
    for qi, (p, f) in enumerate(zip(pruned, full)):
        _assert_topk_equal(p, f, k, ctx=f"filtered query {qi}")
        # every returned doc passes the filter
        real = p[0] > -np.inf
        assert mask_h[p[1][real].astype(np.int64)].all()


def test_pruned_with_additive_mass(low_thresholds):
    idx, offsets, lengths, num_docs = _make_index(seed=13)
    rng = np.random.default_rng(9)
    additive = jax.device_put(
        (rng.random(num_docs) * 2.0).astype(np.float32)
    )
    queries = _queries(lengths, num_docs, rng, 16, 4, len(lengths))
    for q in queries:
        q["additive"] = additive
    k = 10
    pruned = idx.search(queries, k, prune=True)
    full = idx.search(queries, k, prune=False)
    for qi, (p, f) in enumerate(zip(pruned, full)):
        _assert_topk_equal(p, f, k, ctx=f"additive query {qi}")


def test_require_all_and_sort_take_full_path(low_thresholds):
    idx, offsets, lengths, num_docs = _make_index(seed=17)
    rng = np.random.default_rng(3)
    queries = _queries(lengths, num_docs, rng, 4, 4, len(lengths))
    for q in queries:
        q["require_all"] = True
        q["n_terms"] = len(q["entries"])
    res = idx.search(queries, 10, prune=True)
    for r in res:
        assert r[3] is True or r[3] == True  # noqa: E712  exact (full path)


def test_empty_and_single_term_queries(low_thresholds):
    idx, offsets, lengths, num_docs = _make_index(seed=19)
    queries = [
        {"entries": [], "require_all": False, "n_terms": 0},
        {
            "entries": [(1.5, [int(np.argmax(lengths))])],
            "require_all": False,
            "n_terms": 1,
        },
    ]
    res = idx.search(queries, 10, prune=True)
    assert res[0][2] == 0
    assert (res[0][0] == -np.inf).all()
    # single-term query: full path, exact
    full = idx.search(queries, 10, prune=False)
    _assert_topk_equal(res[1], full[1], 10, "single-term")


def test_big_k_disables_pruning(low_thresholds):
    idx, offsets, lengths, num_docs = _make_index(seed=23)
    rng = np.random.default_rng(1)
    queries = _queries(lengths, num_docs, rng, 4, 4, len(lengths))
    res = idx.search(queries, 2048, prune=True)
    for r in res:
        assert r[3]  # k > 1024 -> full path, exact


def test_escalation_on_window_overflow(low_thresholds, monkeypatch):
    """Force a 1-slot candidate window: nearly every query must overflow the
    coverage certificate and escalate to the full dispatch — still exact."""
    monkeypatch.setattr(maxscore, "WINDOW_MIN", 1)
    monkeypatch.setattr(maxscore, "WINDOW_K_MULT", 0)
    idx, offsets, lengths, num_docs = _make_index(seed=29)
    rng = np.random.default_rng(2)
    queries = _queries(lengths, num_docs, rng, 12, 5, len(lengths))
    k = 1  # window M = max(0*k, 1) = 1
    pruned = idx.search(queries, k, prune=True)
    full = idx.search(queries, k, prune=False)
    for qi, (p, f) in enumerate(zip(pruned, full)):
        _assert_topk_equal(p, f, k, ctx=f"overflow query {qi}")
