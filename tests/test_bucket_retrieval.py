"""Bucket-local fused retrieval kernel (ops/bucket_retrieval.py) parity.

Kernels run in Pallas interpret mode against the bit-exact numpy reference
(same quantized-scoring semantics), plus a cross-check of top-k overlap
against the f32 merge_scoring engine. Mirrors the reference's search golden
style (reference: server/src/test/.../search — exact doc ids + scores)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from nrtsearch_tpu.ops import bucket_retrieval as br  # noqa: E402


def build_corpus(rng, V, D, *, max_df=400, delete_frac=0.0):
    rows = []
    for _ in range(V):
        df = int(rng.integers(1, max_df))
        docs = np.sort(rng.choice(D, size=df, replace=False)).astype(np.int32)
        imps = rng.uniform(0.1, 1.0, df).astype(np.float32)
        rows.append((docs, imps))
    term_offsets = np.zeros(V, np.int64)
    term_lengths = np.zeros(V, np.int32)
    pd_, pi_ = [], []
    off = 0
    for t, (docs, imps) in enumerate(rows):
        term_offsets[t] = off
        term_lengths[t] = len(docs)
        off += len(docs)
        pd_.append(docs)
        pi_.append(imps)
    P_valid = off
    P = ((P_valid + 8192 + 127) // 128) * 128
    post_docs = np.zeros(P, np.int32)
    post_imps = np.zeros(P, np.float32)
    post_docs[:P_valid] = np.concatenate(pd_)
    post_imps[:P_valid] = np.concatenate(pi_)
    if delete_frac:
        deleted = rng.random(D) < delete_frac
        post_imps[:P_valid] = np.where(
            deleted[post_docs[:P_valid]], 0.0, post_imps[:P_valid]
        )
    return post_docs, post_imps, term_offsets, term_lengths, P_valid


def run_kernel(post_docs, post_imps, idx, plan, k, *, require_all=False):
    tk, tp, hits = br.bucket_search_topk(
        jnp.asarray(post_docs), jnp.asarray(post_imps),
        jnp.asarray(plan.term_offs), jnp.asarray(plan.bounds),
        jnp.asarray(plan.weights), jnp.asarray(plan.n_terms),
        T=plan.term_offs.shape[1], caps=plan.caps, tile=plan.tile,
        bucket_bits=idx.bucket_bits, m=idx.n_buckets, k=k,
        require_all=require_all, interpret=True,
    )
    scores, docs = br.decode_topk(tk, tp, plan.scales)
    return scores, docs, np.asarray(hits)


def assert_matches_reference(post_docs, post_imps, idx, plan, k,
                             *, require_all=False):
    scores, docs, hits = run_kernel(
        post_docs, post_imps, idx, plan, k, require_all=require_all
    )
    rs, rd, rh = br.reference_bucket_search(
        post_docs, post_imps, idx, plan, k, require_all=require_all
    )
    np.testing.assert_array_equal(hits, rh)
    np.testing.assert_array_equal(docs, rd)
    ks = np.where(np.isneginf(scores), -1.0, scores)
    rs2 = np.where(np.isneginf(rs), -1.0, rs)
    np.testing.assert_allclose(ks, rs2, atol=1e-5)


def test_basic_parity():
    rng = np.random.default_rng(1)
    pd, pi, to, tl, _ = build_corpus(rng, 60, 3000)
    idx = br.BucketIndex.build(pd, pi, to, tl, capacity=4096, bucket_docs=1024)
    queries = []
    for _ in range(6):
        tids = rng.choice(60, size=int(rng.integers(1, 6)), replace=False)
        queries.append([(int(t), float(rng.uniform(0.5, 3.0))) for t in tids])
    plan = br.plan_bucket_batch(idx, queries, to, max_terms=8)
    assert_matches_reference(pd, pi, idx, plan, 10)


def test_require_all_terms():
    rng = np.random.default_rng(2)
    pd, pi, to, tl, _ = build_corpus(rng, 30, 1500, max_df=600)
    idx = br.BucketIndex.build(pd, pi, to, tl, capacity=2048, bucket_docs=512)
    queries = [
        [(int(t), 1.0) for t in rng.choice(30, size=3, replace=False)]
        for _ in range(4)
    ]
    plan = br.plan_bucket_batch(idx, queries, to, max_terms=4)
    assert_matches_reference(pd, pi, idx, plan, 8, require_all=True)


def test_deletions_never_match():
    rng = np.random.default_rng(3)
    pd, pi, to, tl, pv = build_corpus(rng, 40, 2000, delete_frac=0.3)
    idx = br.BucketIndex.build(pd, pi, to, tl, capacity=2048, bucket_docs=1024)
    queries = [[(int(t), 1.0) for t in rng.choice(40, size=4, replace=False)]
               for _ in range(4)]
    plan = br.plan_bucket_batch(idx, queries, to, max_terms=4)
    scores, docs, hits = run_kernel(pd, pi, idx, plan, 12)
    deleted_docs = set(pd[:pv][pi[:pv] == 0.0])
    live_by_doc = {}
    for d, im in zip(pd[:pv], pi[:pv]):
        live_by_doc[d] = live_by_doc.get(d, False) or im > 0.0
    fully_deleted = {d for d in deleted_docs if not live_by_doc.get(d)}
    for row in docs:
        for d in row:
            assert d == -1 or d not in fully_deleted
    assert_matches_reference(pd, pi, idx, plan, 12)


def test_duplicate_query_terms_merge_weights():
    rng = np.random.default_rng(4)
    pd, pi, to, tl, _ = build_corpus(rng, 20, 1000)
    idx = br.BucketIndex.build(pd, pi, to, tl, capacity=1024, bucket_docs=512)
    queries = [[(5, 1.0), (5, 0.5), (9, 2.0)]]
    plan = br.plan_bucket_batch(idx, queries, to, max_terms=4)
    assert plan.n_terms[0] == 2  # duplicates merged
    assert_matches_reference(pd, pi, idx, plan, 5)


def test_empty_and_single_term_queries():
    rng = np.random.default_rng(5)
    pd, pi, to, tl, _ = build_corpus(rng, 20, 1000)
    idx = br.BucketIndex.build(pd, pi, to, tl, capacity=1024, bucket_docs=256)
    queries = [[], [(3, 1.0)], [(0, 0.0)]]
    plan = br.plan_bucket_batch(idx, queries, to, max_terms=4)
    scores, docs, hits = run_kernel(pd, pi, idx, plan, 5)
    assert hits[0] == 0 and hits[2] == 0
    assert (docs[0] == -1).all() and (docs[2] == -1).all()
    assert hits[1] == tl[3]
    assert_matches_reference(pd, pi, idx, plan, 5)


def test_skewed_df_capacity_classes():
    """One term with df ~ half the corpus: slot capacities must decay and
    parity must hold at the cap boundary."""
    rng = np.random.default_rng(6)
    D = 4096
    # a slot's capacity floor is 1024 elements (8x128 DMA alignment); a
    # (term,bucket) slice can only exceed it when bucket_docs > 1024, so use
    # 2048-doc buckets with a near-dense heavy term (~2000 per bucket).
    heavy_docs = np.sort(rng.choice(D, size=4032, replace=False)).astype(np.int32)
    light_docs = np.sort(rng.choice(D, size=15, replace=False)).astype(np.int32)
    mid_docs = np.sort(rng.choice(D, size=300, replace=False)).astype(np.int32)
    pd_list = [heavy_docs, light_docs, mid_docs]
    to = np.zeros(3, np.int64)
    tl = np.zeros(3, np.int32)
    off = 0
    for t, d in enumerate(pd_list):
        to[t] = off
        tl[t] = len(d)
        off += len(d)
    P = ((off + 8192 + 127) // 128) * 128
    pd = np.zeros(P, np.int32)
    pi = np.zeros(P, np.float32)
    pd[:off] = np.concatenate(pd_list)
    pi[:off] = rng.uniform(0.2, 1.0, off).astype(np.float32)
    idx = br.BucketIndex.build(pd, pi, to, tl, capacity=4096, bucket_docs=2048)
    plan = br.plan_bucket_batch(
        idx, [[(0, 1.2), (1, 3.0), (2, 0.7)]], to, max_terms=4
    )
    assert plan.caps[0] > plan.caps[-1]
    assert_matches_reference(pd, pi, idx, plan, 20)


def test_topk_beyond_hits_pads_invalid():
    rng = np.random.default_rng(7)
    pd, pi, to, tl, _ = build_corpus(rng, 10, 300, max_df=20)
    idx = br.BucketIndex.build(pd, pi, to, tl, capacity=512, bucket_docs=256)
    plan = br.plan_bucket_batch(idx, [[(2, 1.0)]], to, max_terms=2)
    scores, docs, hits = run_kernel(pd, pi, idx, plan, 64)
    assert hits[0] == tl[2]
    assert (docs[0, hits[0]:] == -1).all()
    assert np.isneginf(scores[0, hits[0]:]).all()
    assert_matches_reference(pd, pi, idx, plan, 64)


def test_tie_break_lowest_doc_id():
    """Equal quantized scores rank by ascending doc id (Lucene tie-break)."""
    D = 512
    docs = np.arange(0, 500, dtype=np.int32)
    to = np.array([0], np.int64)
    tl = np.array([500], np.int32)
    P = ((500 + 8192 + 127) // 128) * 128
    pd = np.zeros(P, np.int32)
    pi = np.zeros(P, np.float32)
    pd[:500] = docs
    pi[:500] = 0.5  # identical impacts -> identical quantized scores
    idx = br.BucketIndex.build(pd, pi, to, tl, capacity=512, bucket_docs=256)
    plan = br.plan_bucket_batch(idx, [[(0, 1.0)]], to, max_terms=2)
    scores, out_docs, hits = run_kernel(pd, pi, idx, plan, 10)
    np.testing.assert_array_equal(out_docs[0], np.arange(10))


def test_cross_engine_overlap_with_f32_path():
    """Quantized top-k vs the f32 merge engine: doc sets agree modulo
    quantization ties (recall@k >= 0.9 on random impacts)."""
    from nrtsearch_tpu.ops.merge_scoring import merge_score_topk, plan_runs

    rng = np.random.default_rng(8)
    pd, pi, to, tl, _ = build_corpus(rng, 50, 4000, max_df=800)
    idx = br.BucketIndex.build(pd, pi, to, tl, capacity=4096, bucket_docs=1024)
    queries = [
        [(int(t), float(rng.uniform(0.5, 2.0)))
         for t in rng.choice(50, size=4, replace=False)]
        for _ in range(4)
    ]
    plan = br.plan_bucket_batch(idx, queries, to, max_terms=4)
    k = 20
    scores, docs, hits = run_kernel(pd, pi, idx, plan, k)

    B = len(queries)
    offs = np.zeros((B, 4), np.int64)
    lens = np.zeros((B, 4), np.int32)
    ws = np.zeros((B, 4), np.float32)
    for qi, ents in enumerate(queries):
        for ti, (tid, w) in enumerate(ents):
            offs[qi, ti] = to[tid]
            lens[qi, ti] = tl[tid]
            ws[qi, ti] = w
    ro, rl, rw, run_len = plan_runs(offs, lens, ws)
    f_scores, f_docs, f_hits = merge_score_topk(
        jnp.asarray(pd), jnp.asarray(pi), jnp.asarray(ro), jnp.asarray(rl),
        jnp.asarray(rw), jnp.asarray(np.full(B, 4, np.int32)),
        run_len=run_len, k=k,
    )
    np.testing.assert_array_equal(hits, np.asarray(f_hits))
    for qi in range(B):
        a = set(int(d) for d in docs[qi] if d >= 0)
        b = set(int(d) for d in np.asarray(f_docs[qi])[:int(hits[qi])][:k])
        overlap = len(a & b) / max(1, min(len(a), len(b)))
        assert overlap >= 0.9, (qi, overlap)


def test_bucket_serving_path_parity():
    """NRT_BUCKET=1 serving route: the bucket-local kernel (interpret mode
    on CPU) answers multi-segment packed-view batches with doc/hit parity
    vs the merge path — modulo 15-bit score-quantization ties."""
    import os
    import random

    import numpy as np

    from nrtsearch_tpu.core.searcher import Searcher
    from nrtsearch_tpu.core.writer import IndexWriter
    from nrtsearch_tpu.query.plan import parse_query
    from nrtsearch_tpu.schema.fields import create_field_def

    fields = {
        "id": create_field_def("id", {"type": "_ID"}),
        "t": create_field_def("t", {"type": "TEXT", "search": True}),
    }
    rng = random.Random(13)
    words = [f"w{i}" for i in range(30)]
    w = IndexWriter(fields, merge_factor=100)
    for _seg in range(3):
        w.add_documents([
            {"id": str(i), "t": " ".join(rng.choices(words, k=7))}
            for i in range(100)
        ])
        w.refresh()
    searcher = Searcher(w.segments, fields, version=1)
    view = searcher.packed_view("t")

    queries = [
        ("w1 w4 w9", False),
        ("w2", False),
        ("w3 w5", True),      # require_all over 3 segments
        ("nope w1", True),    # dead: required term absent
        ("w0 w0 w7", False),  # duplicate terms merge weights
    ]
    specs = []
    for text, must in queries:
        node = parse_query({"matchQuery": {
            "field": "t", "query": text,
            **({"operator": "MUST"} if must else {}),
        }})
        specs.append(searcher.fast_query_spec(node))
    assert all(s is not None for s in specs)

    # AND and OR can't share one bucket program: route them separately
    for group in ([s for s in specs if not s.require_all],
                  [s for s in specs if s.require_all]):
        if not group:
            continue
        bucket = view.bucket_search_batch(group, 10)
        assert bucket is not None, "bucket path refused an eligible batch"
        merge = view.search_batch(group, 10, prune=False)
        for b, mres, spec in zip(bucket, merge, group):
            assert b.total_hits == mres.total_hits, spec.terms
            b_docs = [int(d) for s, d in zip(b.scores, b.docs) if s > -np.inf]
            m_docs = [int(d) for s, d in zip(mres.scores, mres.docs)
                      if s > -np.inf]
            # quantized ties may swap adjacent docs: compare as sets plus
            # rank-for-rank score agreement within one quantum
            assert set(b_docs) == set(m_docs), spec.terms
            b_s = [s for s in b.scores if s > -np.inf]
            m_s = [s for s in mres.scores if s > -np.inf]
            for bs, ms in zip(b_s, m_s):
                assert abs(bs - ms) <= ms * 2e-3 + 1e-4, (spec.terms, bs, ms)


def test_bucket_serving_ineligible_shapes_fall_through():
    import numpy as np

    from nrtsearch_tpu.core.searcher import Searcher
    from nrtsearch_tpu.core.writer import IndexWriter
    from nrtsearch_tpu.query.plan import parse_query
    from nrtsearch_tpu.schema.fields import create_field_def

    fields = {
        "id": create_field_def("id", {"type": "_ID"}),
        "t": create_field_def("t", {"type": "TEXT", "search": True}),
        "p": create_field_def("p", {"type": "INT", "storeDocValues": True,
                                    "sort": True}),
    }
    w = IndexWriter(fields)
    w.add_documents([
        {"id": str(i), "t": "alpha beta", "p": i} for i in range(20)
    ])
    w.refresh()
    s = Searcher(w.segments, fields, version=1)
    view = s.packed_view("t")
    node = parse_query({"booleanQuery": {"clauses": [
        {"occur": "MUST", "query": {"matchQuery": {"field": "t",
                                                   "query": "alpha"}}},
        {"occur": "FILTER", "query": {"rangeQuery": {"field": "p",
                                                     "upper": "10"}}},
    ]}})
    spec = s.compile_batchable(node, None)
    assert spec is not None and spec.filter is not None
    assert view.bucket_search_batch([spec], 5) is None  # filters -> merge
