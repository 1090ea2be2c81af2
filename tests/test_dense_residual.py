"""Dekker residual rows: ~f32-exact head scores on the fused dense path.

Round-5 parity feature (VERDICT r4 ask #6: overlap@100 >= 0.999). The bf16
head rows quantize impacts at ~2^-9 relative, which measured overlap@100
mean 0.99578 / min 0.96 vs the exact-f32 merge path at bench scale. With
residual rows (rows_lo = bf16(imp - f32(rows))) the fused kernel runs the
3-product correction W_hi*R_hi + W_hi*R_lo + W_lo*R_hi (f32 accumulation),
cutting head-score error to ~2^-17 relative — top-k rankings match the
exact-f32 oracle except for genuine sub-ulp ties.

Reference role: BASELINE #2 "exact-match parity" — Lucene's BulkScorer
computes f32 BM25 sums (reference server/search/MyIndexSearcher.java:79);
the serving default must rank like the exact path.
"""

import numpy as np
import pytest

from nrtsearch_tpu.models.flagship import SyntheticCorpus
from nrtsearch_tpu.ops.dense_fused import dispatch_fused
from nrtsearch_tpu.ops.dense_head import decode_packed2

RESID_REL = 5e-5   # corrected head scores: |err| ~ 2^-17 + f32 accumulation


@pytest.fixture(scope="module")
def corpus_models():
    corpus = SyntheticCorpus(60_000, 4_000, 28, seed=23)
    plain = corpus.to_model()
    plain.attach_dense(max_rows=48, min_df=1_000, bucket_docs=8_192)
    res = corpus.to_model()
    res.attach_dense(
        max_rows=48, min_df=1_000, bucket_docs=8_192, residual=True
    )
    return corpus, plain, res


def _exact(model, qs, k, **kw):
    qb = model.compile_queries(qs)
    s, d, h = model.search(qb, k, **kw)
    return np.asarray(s), np.asarray(d), np.asarray(h)


def _fused(model, qs, k, **kw):
    plan = model.plan_dense_merge(qs)
    out = dispatch_fused(
        model.dense_idx, plan, model.doc_ids, model.impacts, k, **kw
    )
    return plan, decode_packed2(np.asarray(out), k)


def test_residual_rows_reconstruct_impacts(corpus_models):
    """hi + lo recovers the f32 impact to ~2^-17 relative."""
    corpus, _plain, res = corpus_models
    idx = res.dense_idx
    hi = np.asarray(idx.rows, dtype=np.float32)
    lo = np.asarray(idx.rows_lo, dtype=np.float32)
    rec = hi + lo
    # rebuild the exact rows from postings
    offs = np.asarray(res.offsets, np.int64)
    lens = np.asarray(res.lengths, np.int32)
    docs = np.asarray(res.doc_ids)
    imps = np.asarray(res.impacts)
    for i, tid in enumerate(idx.head_ids[:8]):
        off, ln = int(offs[tid]), int(lens[tid])
        d = docs[off : off + ln]
        v = imps[off : off + ln]
        err = np.abs(rec[i, d] - v) / np.maximum(np.abs(v), 1e-9)
        assert float(err.max()) < 1e-4, (i, float(err.max()))


def test_residual_scores_f32_grade(corpus_models):
    """Fused-with-residual scores match the exact-f32 oracle to RESID_REL
    (vs ~6e-3 for the plain bf16 contract)."""
    corpus, plain, res = corpus_models
    qs = corpus.sample_queries(16, 4)
    s0, d0, h0 = _exact(res, qs, 10)
    _, (s1, d1, h1, ex) = _fused(res, qs, 10)
    B, k = s0.shape
    for q in range(B):
        n = min(int(np.sum(s0[q] > -np.inf)), k)
        for j in range(n):
            r = abs(s1[q, j] - s0[q, j]) / max(abs(s0[q, j]), 1e-9)
            assert r < RESID_REL, (q, j, s0[q, j], s1[q, j])


def test_residual_topk_docs_match_exact(corpus_models):
    """With score error ~2^-17, the returned doc SETS match the exact
    oracle (rank swaps only possible for genuinely near-equal scores; the
    synthetic corpus has none within 5e-5 relative at these shapes)."""
    corpus, plain, res = corpus_models
    qs = corpus.sample_queries(24, 4)
    s0, d0, h0 = _exact(res, qs, 10)
    _, (s1, d1, h1, ex) = _fused(res, qs, 10)
    for q in range(len(qs)):
        n = int(np.sum(s0[q] > -np.inf))
        assert set(d1[q][:n]) == set(d0[q][:n].tolist()), q


def test_residual_improves_on_plain_bf16(corpus_models):
    """The residual path's max relative error vs exact must be at least
    10x smaller than the plain bf16 path's on the same queries."""
    corpus, plain, res = corpus_models
    qs = corpus.sample_queries(16, 4)
    s0, _, _ = _exact(plain, qs, 10)
    _, (sp, dp, *_r1) = _fused(plain, qs, 10)
    _, (sr, dr, *_r2) = _fused(res, qs, 10)
    fin = s0 > -np.inf

    def max_rel(s):
        return float(
            np.max(np.abs(s[fin] - s0[fin]) / np.maximum(np.abs(s0[fin]), 1e-9))
        )

    ep, er = max_rel(sp), max_rel(sr)
    assert er < ep / 10, (ep, er)


def test_residual_with_filter_and_conjunction(corpus_models):
    """The corrected S rides every fused variant: filters and AND mode."""
    import jax

    corpus, _plain, res = corpus_models
    rng = np.random.default_rng(9)
    D = res.dense_idx.capacity
    mask = rng.random(D) < 0.4
    fdev = jax.device_put(mask)
    qs = corpus.sample_queries(8, 4)
    # exact oracle with the same filter via the merge kernel
    import jax.numpy as jnp

    from nrtsearch_tpu.ops.merge_scoring import merge_score_topk

    qb = res.compile_queries(qs)
    s0, d0, h0 = merge_score_topk(
        res.doc_ids, res.impacts,
        jnp.asarray(qb.term_offsets), jnp.asarray(qb.term_lengths),
        jnp.asarray(qb.term_weights), jnp.asarray(qb.n_terms),
        run_len=qb.run_len, k=10, filter_mask=fdev,
    )
    s0, d0, h0 = np.asarray(s0), np.asarray(d0), np.asarray(h0)
    _, (s1, d1, h1, ex) = _fused(res, qs, 10, filt=fdev)
    np.testing.assert_array_equal(h1, h0)
    fin = s0 > -np.inf
    err = np.abs(s1[fin] - s0[fin]) / np.maximum(np.abs(s0[fin]), 1e-9)
    assert float(err.max()) < RESID_REL

    # AND over head terms
    head_terms = [str(int(t)) for t in res.dense_idx.head_ids[:8]]
    qs2 = [head_terms[i : i + 2] for i in range(0, 8, 2)]
    qb2 = res.compile_queries(qs2)
    s2, d2, h2 = res.search(qb2, 10, require_all_terms=True)
    s2, d2 = np.asarray(s2), np.asarray(d2)
    n_req = np.array([len(set(q)) for q in qs2], np.int32)
    _, (s3, d3, h3, ex3) = _fused(res, qs2, 10, require_all=True, n_req=n_req)
    fin = s2 > -np.inf
    err = np.abs(s3[fin] - s2[fin]) / np.maximum(np.abs(s2[fin]), 1e-9)
    assert float(err.max()) < RESID_REL


def _tiny_searcher():
    import random

    from nrtsearch_tpu.core.searcher import Searcher
    from nrtsearch_tpu.core.writer import IndexWriter
    from nrtsearch_tpu.schema.fields import create_field_def

    fields = {
        "id": create_field_def("id", {"type": "_ID", "store": True}),
        "t": create_field_def("t", {"type": "TEXT", "search": True}),
    }
    rng = random.Random(31)
    w = IndexWriter(fields, merge_factor=100)
    docs = []
    for i in range(900):
        words = ["common"] * rng.randint(1, 3)
        words += [rng.choice(["alpha", "beta", "gamma"])]
        docs.append({"id": str(i), "t": " ".join(words)})
    w.add_documents(docs)
    w.refresh()
    return Searcher(w.segments, fields, version=1)


def test_serving_path_builds_residual_by_default(monkeypatch):
    """The packed view's dense state carries rows_lo unless
    NRT_DENSE_RESIDUAL=0 (the serving default is the parity contract), and
    the served scores match the exact merge path to RESID_REL."""
    from nrtsearch_tpu.core.packed_view import QuerySpec

    monkeypatch.delenv("NRT_DENSE_RESIDUAL", raising=False)
    s = _tiny_searcher()
    view = s.packed_view("t")
    st = view._dense_state()
    assert st is not None and "common" in st["head_pos"]
    assert st["rows_lo"] is not None
    assert st["rows_lo"].shape == st["rows"].shape

    specs = [QuerySpec(field="t", terms=("common", "alpha"))]
    base = view.search_batch(specs, 10, prune=False)
    res = view.dense_search_batch(specs, 10)
    assert res is not None
    b, r = base[0], res[0]
    np.testing.assert_array_equal(r.docs, b.docs)
    fin = b.scores > -np.inf
    err = np.abs(r.scores[fin] - b.scores[fin]) / np.maximum(
        np.abs(b.scores[fin]), 1e-9
    )
    assert float(err.max()) < RESID_REL

    monkeypatch.setenv("NRT_DENSE_RESIDUAL", "0")
    s2 = _tiny_searcher()
    view2 = s2.packed_view("t")
    st2 = view2._dense_state()
    assert st2 is not None
    assert st2["rows_lo"] is None
