"""The scatter-free bitonic-merge kernel must agree exactly with the
scatter-add formulation (and a numpy reference) on scores, ranking, and
total-hit counts."""

import numpy as np
import pytest

from nrtsearch_tpu.models.flagship import SyntheticCorpus
from nrtsearch_tpu.ops.merge_scoring import (
    DOC_SENTINEL,
    merge_sorted_runs,
    segmented_scores,
)


def test_merge_sorted_runs_exact():
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    R, L = 4, 64
    runs = np.sort(rng.integers(0, 500, (3, R, L)).astype(np.int32), axis=-1)
    payload = rng.random((3, R, L)).astype(np.float32)
    docs, vals = merge_sorted_runs(jnp.asarray(runs), jnp.asarray(payload))
    docs, vals = np.asarray(docs), np.asarray(vals)
    for b in range(3):
        ref_order = np.argsort(runs[b].ravel(), kind="stable")
        np.testing.assert_array_equal(docs[b], runs[b].ravel()[ref_order])
        # same multiset of (doc, payload) pairs
        got = sorted(zip(docs[b].tolist(), vals[b].tolist()))
        exp = sorted(zip(runs[b].ravel().tolist(), payload[b].ravel().tolist()))
        assert got == exp


def test_segmented_scores():
    import jax.numpy as jnp

    docs = jnp.asarray([[1, 1, 3, 3, 3, 7, DOC_SENTINEL, DOC_SENTINEL]], dtype=jnp.int32)
    vals = jnp.asarray([[1.0, 2.0, 1.0, 1.0, 1.0, 5.0, 0.0, 0.0]])
    seg_scores, seg_counts, tail, valid = segmented_scores(docs, vals)
    seg_scores, seg_counts, tail = (
        np.asarray(seg_scores), np.asarray(seg_counts), np.asarray(tail),
    )
    # tails at positions 1 (doc1), 4 (doc3), 5 (doc7), 7 (sentinel)
    assert tail[0].tolist() == [False, True, False, False, True, True, False, True]
    assert seg_scores[0][1] == pytest.approx(3.0)
    assert seg_scores[0][4] == pytest.approx(3.0)
    assert seg_scores[0][5] == pytest.approx(5.0)
    assert seg_counts[0][1] == 2
    assert seg_counts[0][4] == 3
    assert seg_counts[0][5] == 1


def test_flagship_matches_numpy_reference():
    corpus = SyntheticCorpus(num_docs=3000, vocab_size=500, avg_doc_len=20, seed=3)
    model = corpus.to_model()
    queries = corpus.sample_queries(6, 3)
    batch = model.compile_queries(queries, max_terms=4)
    scores, docs, hits = model.search(batch, k=10)
    scores, docs, hits = np.asarray(scores), np.asarray(docs), np.asarray(hits)

    # numpy reference
    n = corpus.num_docs
    avgdl = corpus.doc_lens.sum() / n
    for qi, q in enumerate(queries):
        ref = np.zeros(n)
        matched = np.zeros(n, bool)
        for t in q:
            t = int(t)
            off, ln = corpus.term_offsets[t], corpus.term_lengths[t]
            if ln == 0:
                continue
            d = corpus.post_docs[off : off + ln]
            f = corpus.post_freqs[off : off + ln]
            idf = np.log(1 + (n - ln + 0.5) / (ln + 0.5))
            dl = corpus.doc_lens[d]
            ref[d] += idf * f / (f + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
            matched[d] = True
        assert hits[qi] == matched.sum()
        order = np.argsort(-np.where(matched, ref, -np.inf), kind="stable")[:10]
        valid = scores[qi] > -np.inf
        # rank-by-rank score parity (doc order may flip on float32 ties)
        np.testing.assert_allclose(
            scores[qi][valid], ref[order[: valid.sum()]], rtol=3e-5
        )
        # each returned doc's score must equal its reference score
        np.testing.assert_allclose(
            scores[qi][valid], ref[docs[qi][valid]], rtol=3e-5
        )


def test_flagship_require_all_terms():
    corpus = SyntheticCorpus(num_docs=1000, vocab_size=100, avg_doc_len=10, seed=5)
    model = corpus.to_model()
    queries = corpus.sample_queries(4, 2)
    batch = model.compile_queries(queries, max_terms=2)
    _, _, hits_or = model.search(batch, k=10)
    _, docs_and, hits_and = model.search(batch, k=10, require_all_terms=True)
    hits_or, hits_and = np.asarray(hits_or), np.asarray(hits_and)
    assert (hits_and <= hits_or).all()
    # verify AND semantics on the numpy side
    n = corpus.num_docs
    for qi, q in enumerate(queries):
        count = np.zeros(n, np.int32)
        for t in q:
            t = int(t)
            off, ln = corpus.term_offsets[t], corpus.term_lengths[t]
            count[corpus.post_docs[off : off + ln]] += 1
        assert hits_and[qi] == (count >= len(q)).sum()
