"""Dense-head + sparse-tail retrieval (ops/dense_head.py) parity.

Kernels run in Pallas interpret mode against the numpy reference (same
bf16-head / 15-bit-tail quantization semantics), plus a cross-check against
the f32 merge engine. Mirrors the reference's search golden style
(reference: server/src/test/.../search — exact doc ids + scores)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from nrtsearch_tpu.ops import dense_head as dh  # noqa: E402
from tests.test_bucket_retrieval import build_corpus  # noqa: E402


def run_kernel(post_docs, post_imps, idx, plan, k):
    tail = plan.tail
    if tail is not None:
        tail_args = dict(
            toffs=jnp.asarray(tail.term_offs),
            bounds=jnp.asarray(tail.bounds),
            wts=jnp.asarray(tail.weights),
            n_terms=jnp.asarray(tail.n_terms),
            scales=jnp.asarray(tail.scales),
        )
        tail_static = dict(
            T=tail.term_offs.shape[1], caps=tail.caps, tile=tail.tile,
            bucket_bits=idx.tail.bucket_bits, m=idx.tail.n_buckets,
        )
    else:
        B = plan.W.shape[0]
        z = jnp.zeros((B, 1), jnp.int32)
        tail_args = dict(
            toffs=z, bounds=jnp.zeros((B, 1, 2), jnp.int32),
            wts=jnp.zeros((B, 1), jnp.float32), n_terms=jnp.zeros(B, jnp.int32),
            scales=jnp.ones(B, jnp.float32),
        )
        tail_static = dict(T=0, caps=(), tile=0, bucket_bits=0, m=0)
    packed = dh.dense_tail_topk(
        idx.rows, jnp.asarray(post_docs), jnp.asarray(post_imps),
        jnp.asarray(plan.W),
        tail_args["toffs"], tail_args["bounds"], tail_args["wts"],
        tail_args["n_terms"], tail_args["scales"],
        k=k, has_head=plan.has_head, interpret=True, **tail_static,
    )
    return dh.decode_packed(packed, k)


def assert_matches_reference(post_docs, post_imps, to, tl, idx, queries, k,
                             *, rel=3e-3):
    plan = dh.plan_dense_batch(idx, queries, to)
    scores, docs, hits = run_kernel(post_docs, post_imps, idx, plan, k)
    rs, rd, rh = dh.reference_dense_search(
        post_docs, post_imps, idx, queries, to, tl, k
    )
    np.testing.assert_array_equal(hits, rh)
    for qi in range(len(queries)):
        n = int(min(rh[qi], k))
        # scores agree rank-for-rank within quantization tolerance
        np.testing.assert_allclose(
            scores[qi, :n], rs[qi, :n], rtol=rel, atol=1e-5
        )
        assert (docs[qi, n:] == -1).all()
        assert np.isneginf(scores[qi, n:]).all()
        # doc sets agree modulo near-ties: any symmetric difference must be
        # within tolerance of the boundary score
        a, b = set(docs[qi, :n].tolist()), set(rd[qi, :n].tolist())
        if a != b:
            boundary = rs[qi, n - 1]
            ref_all = {
                int(d): float(s)
                for s, d in zip(rs[qi, :n], rd[qi, :n])
            }
            for d in a ^ b:
                s = ref_all.get(int(d), boundary)
                assert abs(s - boundary) <= rel * abs(boundary) + 1e-4, (
                    qi, d, s, boundary,
                )


def zipf_queries(rng, V, n, terms=4):
    ranks = np.arange(1, V + 1)
    p = 1.0 / ranks
    p /= p.sum()
    out = []
    for _ in range(n):
        tids = rng.choice(V, size=terms, replace=False, p=p)
        out.append([(int(t), float(rng.uniform(0.5, 2.5))) for t in tids])
    return out


def build_zipf_corpus(rng, V, D, avg_len=12):
    """Zipf term draws so head terms are genuinely dense (df ~ D)."""
    ranks = np.arange(1, V + 1)
    p = 1.0 / ranks
    p /= p.sum()
    doc_lens = np.maximum(
        rng.poisson(avg_len, D).astype(np.int64), 2
    )
    total = int(doc_lens.sum())
    terms = rng.choice(V, size=total, p=p).astype(np.int32)
    docs = np.repeat(np.arange(D, dtype=np.int32), doc_lens)
    key = docs.astype(np.int64) * V + terms
    uniq = np.unique(key)
    u_docs = (uniq // V).astype(np.int32)
    u_terms = (uniq % V).astype(np.int32)
    order = np.lexsort((u_docs, u_terms))
    pd_v = u_docs[order]
    pt = u_terms[order]
    to = np.zeros(V, np.int64)
    tl = np.zeros(V, np.int32)
    t_uniq, t_start, t_count = np.unique(
        pt, return_index=True, return_counts=True
    )
    to[t_uniq] = t_start
    tl[t_uniq] = t_count
    P = ((len(pd_v) + 8192 + 127) // 128) * 128
    post_docs = np.zeros(P, np.int32)
    post_imps = np.zeros(P, np.float32)
    post_docs[: len(pd_v)] = pd_v
    post_imps[: len(pd_v)] = rng.uniform(0.1, 1.0, len(pd_v)).astype(
        np.float32
    )
    return post_docs, post_imps, to, tl, len(pd_v)


def test_mixed_head_tail_parity():
    rng = np.random.default_rng(11)
    D, V = 2048, 40
    pd, pi, to, tl, _ = build_zipf_corpus(rng, V, D)
    idx = dh.DenseHeadIndex.build(
        pd, pi, to, tl, capacity=2048, max_rows=6, min_df=64, bucket_docs=512
    )
    assert idx.n_rows > 0
    queries = zipf_queries(rng, V, 6)
    # ensure at least one query mixes head and tail
    queries.append([(int(idx.head_ids[0]), 1.0), (V - 1, 1.5)])
    assert_matches_reference(pd, pi, to, tl, idx, queries, 10)


def test_head_only_queries():
    rng = np.random.default_rng(12)
    D, V = 1024, 20
    pd, pi, to, tl, _ = build_zipf_corpus(rng, V, D)
    idx = dh.DenseHeadIndex.build(
        pd, pi, to, tl, capacity=1024, max_rows=4, min_df=32, bucket_docs=512
    )
    queries = [
        [(int(t), float(rng.uniform(0.5, 2.0))) for t in idx.head_ids[:3]],
        [(int(idx.head_ids[0]), 2.0)],
    ]
    plan = dh.plan_dense_batch(idx, queries, to)
    assert plan.tail is None
    assert_matches_reference(pd, pi, to, tl, idx, queries, 8)


def test_tail_only_queries():
    rng = np.random.default_rng(13)
    pd, pi, to, tl, _ = build_corpus(rng, 30, 1500, max_df=60)
    idx = dh.DenseHeadIndex.build(
        pd, pi, to, tl, capacity=2048, max_rows=4, min_df=500,
        bucket_docs=1024,
    )
    assert idx.n_rows == 0
    queries = [
        [(int(t), 1.0) for t in rng.choice(30, size=3, replace=False)]
        for _ in range(4)
    ]
    plan = dh.plan_dense_batch(idx, queries, to)
    assert not plan.has_head and plan.tail is not None
    assert_matches_reference(pd, pi, to, tl, idx, queries, 10)


def test_doc_in_both_head_and_tail_not_duplicated():
    """A doc matching head AND tail terms appears once, with the summed
    score (the searchsorted dedup path)."""
    D = 512
    # term 0: dense (all docs), term 1: sparse ({5, 9})
    t0_docs = np.arange(D, dtype=np.int32)
    t1_docs = np.array([5, 9], np.int32)
    to = np.array([0, D], np.int64)
    tl = np.array([D, 2], np.int32)
    P = ((D + 2 + 8192 + 127) // 128) * 128
    pd = np.zeros(P, np.int32)
    pi = np.zeros(P, np.float32)
    pd[:D] = t0_docs
    pd[D : D + 2] = t1_docs
    pi[:D] = 0.5
    pi[D : D + 2] = 1.0
    idx = dh.DenseHeadIndex.build(
        pd, pi, to, tl, capacity=512, max_rows=2, min_df=256, bucket_docs=256
    )
    assert list(idx.head_ids) == [0]
    queries = [[(0, 1.0), (1, 2.0)]]
    plan = dh.plan_dense_batch(idx, queries, to)
    scores, docs, hits = run_kernel(pd, pi, idx, plan, 5)
    assert hits[0] == D  # every doc matches term 0; 5 and 9 not re-counted
    assert set(docs[0, :2].tolist()) == {5, 9}
    assert not len(set(docs[0].tolist())) < 5  # no duplicate docs
    assert_matches_reference(pd, pi, to, tl, idx, queries, 5)


def test_deletions_never_match():
    rng = np.random.default_rng(14)
    D, V = 1024, 30
    pd, pi, to, tl, pv = build_zipf_corpus(rng, V, D)
    deleted = rng.random(D) < 0.3
    pi[:pv] = np.where(deleted[pd[:pv]], 0.0, pi[:pv])
    idx = dh.DenseHeadIndex.build(
        pd, pi, to, tl, capacity=1024, max_rows=4, min_df=64, bucket_docs=512
    )
    queries = zipf_queries(rng, V, 4)
    plan = dh.plan_dense_batch(idx, queries, to)
    scores, docs, hits = run_kernel(pd, pi, idx, plan, 12)
    for row in docs:
        for d in row:
            assert d == -1 or not deleted[d]
    assert_matches_reference(pd, pi, to, tl, idx, queries, 12)


def test_empty_and_unknown_term_queries():
    rng = np.random.default_rng(15)
    D, V = 1024, 20
    pd, pi, to, tl, _ = build_zipf_corpus(rng, V, D)
    idx = dh.DenseHeadIndex.build(
        pd, pi, to, tl, capacity=1024, max_rows=4, min_df=64, bucket_docs=512
    )
    queries = [[], [(3, 0.0)], [(int(idx.head_ids[0]), 1.0)]]
    plan = dh.plan_dense_batch(idx, queries, to)
    scores, docs, hits = run_kernel(pd, pi, idx, plan, 5)
    assert hits[0] == 0 and hits[1] == 0
    assert (docs[0] == -1).all() and (docs[1] == -1).all()
    assert hits[2] == tl[idx.head_ids[0]]


def test_duplicate_terms_merge_weights():
    rng = np.random.default_rng(16)
    D, V = 1024, 20
    pd, pi, to, tl, _ = build_zipf_corpus(rng, V, D)
    idx = dh.DenseHeadIndex.build(
        pd, pi, to, tl, capacity=1024, max_rows=4, min_df=64, bucket_docs=512
    )
    h = int(idx.head_ids[0])
    t = int(
        next(i for i in range(V) if i not in idx.head_pos and tl[i] > 0)
    )
    queries = [[(h, 1.0), (h, 0.5), (t, 2.0), (t, 0.25)]]
    plan = dh.plan_dense_batch(idx, queries, to)
    assert plan.tail.n_terms[0] == 1
    assert_matches_reference(pd, pi, to, tl, idx, queries, 8)


def test_cross_engine_overlap_with_f32_merge_path():
    from nrtsearch_tpu.ops.merge_scoring import merge_score_topk, plan_runs

    rng = np.random.default_rng(17)
    D, V = 4096, 50
    pd, pi, to, tl, _ = build_zipf_corpus(rng, V, D)
    idx = dh.DenseHeadIndex.build(
        pd, pi, to, tl, capacity=4096, max_rows=8, min_df=256,
        bucket_docs=1024,
    )
    queries = zipf_queries(rng, V, 4)
    plan = dh.plan_dense_batch(idx, queries, to)
    k = 20
    scores, docs, hits = run_kernel(pd, pi, idx, plan, k)

    B = len(queries)
    T = max(len(q) for q in queries)
    offs = np.zeros((B, T), np.int64)
    lens = np.zeros((B, T), np.int32)
    ws = np.zeros((B, T), np.float32)
    for qi, ents in enumerate(queries):
        for ti, (tid, w) in enumerate(ents):
            offs[qi, ti] = to[tid]
            lens[qi, ti] = tl[tid]
            ws[qi, ti] = w
    ro, rl, rw, run_len = plan_runs(offs, lens, ws)
    f_scores, f_docs, f_hits = merge_score_topk(
        jnp.asarray(pd), jnp.asarray(pi), jnp.asarray(ro), jnp.asarray(rl),
        jnp.asarray(rw), jnp.asarray(np.full(B, T, np.int32)),
        run_len=run_len, k=k,
    )
    np.testing.assert_array_equal(hits, np.asarray(f_hits))
    for qi in range(B):
        a = set(int(d) for d in docs[qi] if d >= 0)
        b = set(int(d) for d in np.asarray(f_docs[qi])[: int(hits[qi])][:k])
        overlap = len(a & b) / max(1, min(len(a), len(b)))
        assert overlap >= 0.85, (qi, overlap)
        # rank-for-rank scores within bf16 quantization of the f32 truth
        n = int(min(hits[qi], k))
        np.testing.assert_allclose(
            scores[qi, :n], np.asarray(f_scores[qi])[:n], rtol=1.5e-2
        )


def test_static_weight_shape_and_row_padding():
    """The head weight matrix is always [B, Hp] with Hp static (padded to a
    sublane multiple), so every batch hits one compiled program."""
    rng = np.random.default_rng(18)
    D, V = 1024, 30
    pd, pi, to, tl, _ = build_zipf_corpus(rng, V, D)
    idx = dh.DenseHeadIndex.build(
        pd, pi, to, tl, capacity=1024, max_rows=16, min_df=32,
        bucket_docs=512,
    )
    assert idx.n_rows >= 3
    Hp = idx.rows.shape[0]
    assert Hp % 8 == 0 and Hp >= idx.n_rows
    queries = [[(int(t), 1.0)] for t in idx.head_ids[:3]]
    plan1 = dh.plan_dense_batch(idx, queries, to)
    plan2 = dh.plan_dense_batch(idx, queries[:1] * 3, to)
    assert plan1.W.shape == plan2.W.shape == (3, Hp)
    # padding rows are all-zero on device
    pad = np.asarray(idx.rows)[idx.n_rows:]
    assert (pad == 0).all()
