"""Fused dense path (ops/dense_fused.dense_fused_topk, round 5).

The round-5 default retrieval path on TPU: compact-row head matmul
(gather only the batch's head rows), slice-gather combine (exact head
scores at every tail position), no pruning window — exact docs, scores,
AND hit counts for every variant, including the general shapes round 4
excluded: filters, additive score columns, doc-value sorts, and
all-head-term conjunctions. Reference roles: Lucene's BulkScorer hot loop
serving filtered/sorted collection through the same scorer
(reference server/search/MyIndexSearcher.java:79, server/search/collectors/).

Score tolerance vs the exact-f32 oracle: head impacts quantize to bf16
(~0.4% relative); tail contributions and sort keys are exact.
"""

import numpy as np
import pytest

from nrtsearch_tpu.models.flagship import SyntheticCorpus
from nrtsearch_tpu.ops.dense_fused import dispatch_fused
from nrtsearch_tpu.ops.dense_head import decode_packed2

BF16_REL = 6e-3


@pytest.fixture(scope="module")
def corpus_model():
    corpus = SyntheticCorpus(60_000, 4_000, 28, seed=11)
    model = corpus.to_model()
    model.attach_dense(max_rows=48, min_df=1_000, bucket_docs=8_192)
    return corpus, model


def _exact(model, qs, k, **kw):
    qb = model.compile_queries(qs)
    s, d, h = model.search(qb, k, **kw)
    return np.asarray(s), np.asarray(d), np.asarray(h)


def _merge_oracle(model, qs, k, **kw):
    """Full-width exact-f32 merge path with filter/additive/sort support."""
    import jax.numpy as jnp

    from nrtsearch_tpu.ops.merge_scoring import merge_score_topk

    qb = model.compile_queries(qs)
    s, d, h = merge_score_topk(
        model.doc_ids, model.impacts,
        jnp.asarray(qb.term_offsets), jnp.asarray(qb.term_lengths),
        jnp.asarray(qb.term_weights), jnp.asarray(qb.n_terms),
        run_len=qb.run_len, k=k, **kw,
    )
    return np.asarray(s), np.asarray(d), np.asarray(h)


def _fused(model, qs, k, **kw):
    plan = model.plan_dense_merge(qs)
    out = dispatch_fused(
        model.dense_idx, plan, model.doc_ids, model.impacts, k, **kw
    )
    return plan, decode_packed2(np.asarray(out), k)


def _check_topk(s0, d0, s1, d1, k, rel=BF16_REL):
    B = s0.shape[0]
    for q in range(B):
        n = min(int(np.sum(s0[q] > -np.inf)), k)
        for j in range(n):
            r = abs(s1[q, j] - s0[q, j]) / max(abs(s0[q, j]), 1e-9)
            assert r < rel, (q, j, d0[q, j], d1[q, j], s0[q, j], s1[q, j])


def test_mixed_queries(corpus_model):
    """OR queries: docs/scores within bf16 tolerance always; hits exact
    when the counts_exact flag is set, lower bounds otherwise (the WAND
    GREATER_THAN_OR_EQUAL_TO relation when the pruned combine engages)."""
    corpus, model = corpus_model
    qs = corpus.sample_queries(12, 4)
    s0, d0, h0 = _exact(model, qs, 10)
    _, (s1, d1, h1, ex) = _fused(model, qs, 10)
    for q in range(12):
        assert h1[q] <= h0[q]
        if ex[q]:
            assert h1[q] == h0[q]
    _check_topk(s0, d0, s1, d1, 10)


def test_exact_counts_forces_exact_branch(corpus_model):
    corpus, model = corpus_model
    qs = corpus.sample_queries(12, 4)
    s0, d0, h0 = _exact(model, qs, 10)
    _, (s1, d1, h1, ex) = _fused(model, qs, 10, exact_counts=True)
    assert ex.all()
    np.testing.assert_array_equal(h1, h0)
    _check_topk(s0, d0, s1, d1, 10)


def test_matches_dense_merge_path(corpus_model):
    """Same score contract as round-4 dense_merge_topk (exact_counts)."""
    corpus, model = corpus_model
    qs = corpus.sample_queries(8, 4)
    plan = model.plan_dense_merge(qs)
    m = decode_packed2(
        np.asarray(model.serve_dense_merge(plan, 10, exact_counts=True)), 10
    )
    _, f = _fused(model, qs, 10, exact_counts=True)
    np.testing.assert_array_equal(f[1], m[1])          # docs
    np.testing.assert_allclose(f[0], m[0], rtol=1e-6)  # scores
    np.testing.assert_array_equal(f[2], m[2])          # hits


def test_pruned_docs_scores_exact_vs_full(corpus_model):
    """Whether or not the certificate engages, docs and scores must equal
    the exact branch bit-for-bit (pruning only ever changes hit counts)."""
    corpus, model = corpus_model
    qs = corpus.sample_queries(16, 4)
    _, (s1, d1, h1, ex1) = _fused(model, qs, 10)
    _, (s0, d0, h0, ex0) = _fused(model, qs, 10, prune=False)
    np.testing.assert_array_equal(d1, d0)
    np.testing.assert_allclose(s1, s0, rtol=1e-6)


def test_tail_only_exact_f32(corpus_model):
    corpus, model = corpus_model
    tail_terms = [str(t) for t in range(2_500, 4_000) if model.lengths[t] > 0]
    qs = [[tail_terms[i * 4 + j] for j in range(4)] for i in range(6)]
    s0, d0, h0 = _exact(model, qs, 10)
    _, (s1, d1, h1, ex) = _fused(model, qs, 10)
    np.testing.assert_allclose(s1, s0, rtol=1e-6)
    np.testing.assert_array_equal(d1, d0)
    np.testing.assert_array_equal(h1, h0)


def test_head_only_queries(corpus_model):
    corpus, model = corpus_model
    head_terms = [str(int(t)) for t in model.dense_idx.head_ids[:12]]
    qs = [head_terms[i : i + 3] for i in range(0, 12, 3)]
    s0, d0, h0 = _exact(model, qs, 10)
    plan, (s1, d1, h1, ex) = _fused(model, qs, 10)
    assert not plan.has_tail
    np.testing.assert_array_equal(h1, h0)
    _check_topk(s0, d0, s1, d1, 10)


def test_empty_and_unknown_terms(corpus_model):
    corpus, model = corpus_model
    qs = [["zzz_not_a_term"], []]
    _, (s1, d1, h1, ex) = _fused(model, qs, 10)
    assert (s1 == -np.inf).all()
    assert (d1 == -1).all()
    assert (h1 == 0).all()


def test_conjunction_all_head_terms(corpus_model):
    """AND over head terms: the indicator matmul counts matched terms per
    doc; docs carrying every distinct term match, others do not."""
    corpus, model = corpus_model
    head_terms = [str(int(t)) for t in model.dense_idx.head_ids[:8]]
    qs = [head_terms[i : i + 2] for i in range(0, 8, 2)]
    s0, d0, h0 = _exact(model, qs, 10, require_all_terms=True)
    n_req = np.array([len(set(q)) for q in qs], np.int32)
    plan, (s1, d1, h1, ex) = _fused(
        model, qs, 10, require_all=True, n_req=n_req
    )
    assert not plan.has_tail
    np.testing.assert_array_equal(h1, h0)
    _check_topk(s0, d0, s1, d1, 10)


def test_filter_mask(corpus_model):
    """A [D] filter mask gates both head and tail sides; hits exact over
    the filtered set (the reference's filtered-search contract)."""
    import jax

    corpus, model = corpus_model
    rng = np.random.default_rng(5)
    D = model.dense_idx.capacity
    mask = rng.random(D) < 0.3
    fdev = jax.device_put(mask)
    qs = corpus.sample_queries(8, 4)
    s0, d0, h0 = _merge_oracle(model, qs, 10, filter_mask=fdev)
    _, (s1, d1, h1, ex) = _fused(model, qs, 10, filt=fdev)
    np.testing.assert_array_equal(h1, h0)
    _check_topk(s0, d0, s1, d1, 10)


def test_additive_column(corpus_model):
    """A [D] additive score column rides the same slice gathers."""
    import jax

    corpus, model = corpus_model
    rng = np.random.default_rng(6)
    D = model.dense_idx.capacity
    add = (rng.random(D) * 3.0).astype(np.float32)
    adev = jax.device_put(add)
    qs = corpus.sample_queries(8, 4)
    s0, d0, h0 = _merge_oracle(model, qs, 10, additive=adev)
    _, (s1, d1, h1, ex) = _fused(model, qs, 10, additive=adev)
    np.testing.assert_array_equal(h1, h0)
    _check_topk(s0, d0, s1, d1, 10)


@pytest.mark.parametrize("ascending", [True, False])
def test_sort_by_doc_value_key(corpus_model, ascending):
    """Doc-value sort: rank matched docs by a [D] key; returned 'scores'
    are the key values; docs match the merge oracle exactly (the match set
    is quantization-independent)."""
    import jax

    corpus, model = corpus_model
    rng = np.random.default_rng(7)
    D = model.dense_idx.capacity
    keys = rng.permutation(D).astype(np.float32)  # distinct -> unique order
    kdev = jax.device_put(keys)
    qs = corpus.sample_queries(8, 4)
    s0, d0, h0 = _merge_oracle(
        model, qs, 10, sort_keys=kdev, sort_ascending=ascending
    )
    _, (s1, d1, h1, ex) = _fused(
        model, qs, 10, sort_keys=kdev, sort_ascending=ascending
    )
    np.testing.assert_array_equal(d1, d0)
    np.testing.assert_allclose(s1, s0, rtol=1e-6)
    np.testing.assert_array_equal(h1, h0)


def test_filter_plus_sort_compose(corpus_model):
    import jax

    corpus, model = corpus_model
    rng = np.random.default_rng(8)
    D = model.dense_idx.capacity
    mask = rng.random(D) < 0.5
    keys = rng.permutation(D).astype(np.float32)
    fdev, kdev = jax.device_put(mask), jax.device_put(keys)
    qs = corpus.sample_queries(6, 4)
    s0, d0, h0 = _merge_oracle(
        model, qs, 10, filter_mask=fdev, sort_keys=kdev, sort_ascending=True
    )
    _, (s1, d1, h1, ex) = _fused(
        model, qs, 10, filt=fdev, sort_keys=kdev, sort_ascending=True
    )
    np.testing.assert_array_equal(d1, d0)
    np.testing.assert_array_equal(h1, h0)


def test_gather_rows_matches_take():
    import jax.numpy as jnp

    from nrtsearch_tpu.ops.dense_fused import gather_rows

    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.random((64, 512)).astype(np.float32))
    idx = jnp.asarray(np.array([5, 0, 63, 7, 7, 0, 12, 31], np.int32))
    out = np.asarray(gather_rows(rows, idx))
    np.testing.assert_array_equal(out, np.asarray(rows)[np.asarray(idx)])
