"""Dense-head + merge-tail path (ops/dense_head.dense_merge_topk, round 4).

The round-4 default retrieval path: head terms as one bf16 MXU matmul,
tail terms through the narrow bitonic merge (exact f32), combined via a
theta-pruned candidate window with lax.cond escalation to the full gather.
Reference role: Lucene's BulkScorer + MaxScore competitive pruning
(reference server/search/MyIndexSearcher.java:79; SURVEY §5 long-posting-
list analogue).

Score tolerance: head impacts quantize to bfloat16 (8-bit mantissa, the
same resolution class as Lucene's SmallFloat norms), so scores match the
exact f32 merge path within ~0.5% relative; docs match except at
quantization-induced near-ties.
"""

import os

import numpy as np
import pytest

from nrtsearch_tpu.models.flagship import SyntheticCorpus
from nrtsearch_tpu.ops.dense_head import decode_packed2

BF16_REL = 6e-3


@pytest.fixture(scope="module")
def corpus_model():
    corpus = SyntheticCorpus(60_000, 4_000, 28, seed=11)
    model = corpus.to_model()
    model.attach_dense(max_rows=48, min_df=1_000, bucket_docs=8_192)
    return corpus, model


def _exact(model, qs, k):
    qb = model.compile_queries(qs)
    s, d, h = model.search(qb, k)
    return np.asarray(s), np.asarray(d), np.asarray(h)


def _merge_path(model, qs, k, **kw):
    plan = model.plan_dense_merge(qs)
    out = model.serve_dense_merge(plan, k, **kw)
    return plan, decode_packed2(np.asarray(out), k)


def _check_topk(s0, d0, s1, d1, k):
    """Docs equal except near-ties; scores within bf16 tolerance."""
    B = s0.shape[0]
    for q in range(B):
        n = int(np.sum(s0[q] > -np.inf))
        n = min(n, k)
        for j in range(n):
            if d0[q, j] == d1[q, j]:
                rel = abs(s1[q, j] - s0[q, j]) / max(abs(s0[q, j]), 1e-9)
                assert rel < BF16_REL, (q, j, s0[q, j], s1[q, j])
            else:
                # quantization near-tie: the other path's score at this rank
                # must be within tolerance of ours
                rel = abs(s1[q, j] - s0[q, j]) / max(abs(s0[q, j]), 1e-9)
                assert rel < BF16_REL, (
                    "rank disagreement beyond tie tolerance",
                    q, j, d0[q, j], d1[q, j], s0[q, j], s1[q, j],
                )


def test_mixed_queries_match_exact_path(corpus_model):
    corpus, model = corpus_model
    qs = corpus.sample_queries(12, 4)
    s0, d0, h0 = _exact(model, qs, 10)
    _, (s1, d1, h1, ex) = _merge_path(model, qs, 10)
    _check_topk(s0, d0, s1, d1, 10)
    for q in range(12):
        assert h1[q] <= h0[q]
        if ex[q]:
            assert h1[q] == h0[q]


def test_exact_counts_flag_forces_full_branch(corpus_model):
    corpus, model = corpus_model
    qs = corpus.sample_queries(8, 4)
    s0, d0, h0 = _exact(model, qs, 10)
    _, (s1, d1, h1, ex) = _merge_path(model, qs, 10, exact_counts=True)
    assert ex.all()
    np.testing.assert_array_equal(h1, h0)
    _check_topk(s0, d0, s1, d1, 10)


def test_tail_only_queries_exact_f32(corpus_model):
    """All-tail queries bypass the head entirely: exact f32 scores."""
    corpus, model = corpus_model
    tail_terms = [
        str(t) for t in range(2_500, 4_000) if model.lengths[t] > 0
    ]
    qs = [[tail_terms[i * 4 + j] for j in range(4)] for i in range(6)]
    s0, d0, h0 = _exact(model, qs, 10)
    _, (s1, d1, h1, ex) = _merge_path(model, qs, 10)
    np.testing.assert_allclose(s1, s0, rtol=1e-6)
    np.testing.assert_array_equal(d1, d0)
    np.testing.assert_array_equal(h1, h0)


def test_head_only_queries(corpus_model):
    """All-head queries: one matmul, no tail dispatch."""
    corpus, model = corpus_model
    head_terms = [str(int(t)) for t in model.dense_idx.head_ids[:12]]
    qs = [head_terms[i : i + 3] for i in range(0, 12, 3)]
    s0, d0, h0 = _exact(model, qs, 10)
    plan, (s1, d1, h1, ex) = _merge_path(model, qs, 10)
    assert not plan.has_tail
    assert ex.all()
    np.testing.assert_array_equal(h1, h0)
    _check_topk(s0, d0, s1, d1, 10)


def test_duplicate_terms_merge_weights(corpus_model):
    corpus, model = corpus_model
    head = str(int(model.dense_idx.head_ids[0]))
    qs = [[head, head, "3000"]]
    s0, d0, h0 = _exact(model, qs, 10)
    _, (s1, d1, h1, ex) = _merge_path(model, qs, 10)
    _check_topk(s0, d0, s1, d1, 10)


def test_empty_and_unknown_terms(corpus_model):
    corpus, model = corpus_model
    qs = [["zzz_not_a_term"], []]
    plan, (s1, d1, h1, ex) = _merge_path(model, qs, 10)
    assert (s1 == -np.inf).all()
    assert (d1 == -1).all()
    assert (h1 == 0).all()


def test_pruned_branch_engages_and_is_exact():
    """Constructed strong-head / spread-tail corpus where the theta window
    provably engages: head term in every doc (uniform impact, so theta -
    head_ub cancels to the k-th tail part), tail term over 1000 docs with
    spread tf levels so the M-th tail sum sits strictly below the k-th.
    The pruned branch must return exact top-k docs/scores while touching
    only the M-candidate window, with hit counts as lower bounds."""
    import jax

    from nrtsearch_tpu.models.flagship import BatchedBM25

    D = 20_000
    n_tail = 1_000
    # postings: term 0 = head (every doc, tf 1); term 1 = tail (first 1000
    # docs, tf 10 + i % 40 — 25 docs per level, so the 100th and 128th
    # largest tail impacts sit on different levels)
    head_docs = np.arange(D, dtype=np.int32)
    head_freqs = np.ones(D, np.float32)
    tail_docs = np.arange(n_tail, dtype=np.int32)
    tail_freqs = (10 + np.arange(n_tail) % 40).astype(np.float32)
    post_docs = np.concatenate([head_docs, tail_docs])
    post_freqs = np.concatenate([head_freqs, tail_freqs])
    pad = (1 << 16) + 65_536   # comfortably above len + DMA slack
    doc_ids = np.zeros(pad, np.int32)
    doc_ids[: len(post_docs)] = post_docs
    freqs = np.zeros(pad, np.float32)
    freqs[: len(post_freqs)] = post_freqs
    d_pad = 1 << 15
    doc_lens = np.zeros(d_pad, np.float32)
    doc_lens[:D] = 10.0
    live = np.zeros(d_pad, bool)
    live[:D] = True
    model = BatchedBM25(
        terms={"head": 0, "tail": 1},
        offsets=np.array([0, D], np.int64),
        lengths=np.array([D, n_tail], np.int32),
        doc_ids=jax.device_put(doc_ids),
        freqs=jax.device_put(freqs),
        doc_lens=jax.device_put(doc_lens),
        live=jax.device_put(live),
        num_docs_real=D,
    )
    model.attach_dense(max_rows=8, min_df=5_000, bucket_docs=8_192)
    assert model.dense_idx.n_rows == 1          # head only
    qs = [["head", "tail"]]
    s0, d0, h0 = _exact(model, qs, 100)
    _, (s1, d1, h1, ex) = _merge_path(model, qs, 100)
    assert not ex[0], "theta pruning did not engage on the constructed case"
    _check_topk(s0, d0, s1, d1, 100)
    assert h1[0] <= h0[0]
