"""Probe the bucket-local retrieval kernel vs the fused merge path on TPU.

Builds the same 1M-doc Zipf corpus as bench.py, plans a 32-query batch on
both engines, checks top-k parity (exact modulo score-quantization ties),
and times each stage. Shapes print so width/tile taxes are visible.

P_SWEEP=16384,8192,4096 sweeps bucket sizes in one process (the corpus
build + device pack amortize across the sweep). Also times the pipelined
effective batch (depth 3) — the serving number bench.py reports.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NUM_DOCS = int(os.environ.get("P_NUM_DOCS", 1_000_000))
VOCAB = int(os.environ.get("P_VOCAB", 100_000))
BATCH = int(os.environ.get("P_BATCH", 32))
K = int(os.environ.get("P_TOPK", 100))
ITERS = int(os.environ.get("P_ITERS", 5))
SWEEP = [int(x) for x in os.environ.get(
    "P_SWEEP", os.environ.get("P_BUCKET_DOCS", "16384")).split(",")]
TPQ = int(os.environ.get("P_TERMS", 4))


def t(run, label):
    run()  # compile
    run()
    best = min(
        (lambda s: (run(), time.perf_counter() - s)[1])(time.perf_counter())
        for _ in range(ITERS)
    )
    print(f"{label:44s} {best*1e3:9.1f} ms", file=sys.stderr, flush=True)
    return best


def t_piped(run_async, drain, label, depth=3):
    """Pipelined effective time/iter: issue `depth` dispatches before
    forcing the oldest — overlaps host planning/readback with device work."""
    from collections import deque

    pend = deque()
    run_async()()  # compile AND force: warm-up device work + readback must
    drain(pend)    # finish before the timer starts (ADVICE r3)
    n = max(ITERS * 2, 8)
    t0 = time.perf_counter()
    for _ in range(n):
        pend.append(run_async())
        while len(pend) >= depth:
            force = pend.popleft()
            force()
    while pend:
        pend.popleft()()
    eff = (time.perf_counter() - t0) / n
    print(f"{label:44s} {eff*1e3:9.1f} ms (pipelined depth {depth})",
          file=sys.stderr, flush=True)
    return eff


def bucket_path(model, idx, queries, br, f_out, fused_t):
    from nrtsearch_tpu.ops.bm25 import lucene_idf

    def to_entries(qterms):
        ents = []
        for term in qterms:
            tid = model.terms.get(term)
            if tid is None or not model.lengths[tid]:
                continue
            ents.append(
                (tid, float(lucene_idf(NUM_DOCS, int(model.lengths[tid])))))
        return ents

    t0 = time.perf_counter()
    plan = br.plan_bucket_batch(
        idx, [to_entries(q) for q in queries], model.offsets, max_terms=8
    )
    print(
        f"plan: {(time.perf_counter()-t0)*1e3:.0f} ms caps={plan.caps} "
        f"tile={plan.tile} grid={BATCH}x{idx.n_buckets}",
        file=sys.stderr, flush=True,
    )
    toffs = jnp.asarray(plan.term_offs)
    bounds = jnp.asarray(plan.bounds)
    wts = jnp.asarray(plan.weights)
    nt = jnp.asarray(plan.n_terms)
    b_out = [None]

    def dispatch():
        return br.bucket_search_topk(
            model.doc_ids, model.impacts, toffs, bounds, wts, nt,
            T=plan.term_offs.shape[1], caps=plan.caps, tile=plan.tile,
            bucket_bits=idx.bucket_bits, m=idx.n_buckets, k=K,
        )

    def run_bucket():
        tk, td, h = dispatch()
        jax.block_until_ready(tk)
        b_out[0] = br.decode_topk(np.asarray(tk), np.asarray(td), plan.scales) + (
            np.asarray(h),
        )

    bucket_t = t(run_bucket, "bucket-local step (gather+sort+topk)")

    def run_async():
        tk, td, h = dispatch()
        return lambda: (np.asarray(tk), np.asarray(td), np.asarray(h))

    def drain(pend):
        while pend:
            pend.popleft()()

    bucket_eff = t_piped(run_async, drain, "bucket-local effective")

    # stage split (jitted so we time the kernels, not tracing)
    import functools as ft

    k1_jit = jax.jit(ft.partial(
        br.gather_pack_pallas,
        T=plan.term_offs.shape[1], caps=plan.caps, tile=plan.tile,
        bucket_bits=idx.bucket_bits, m=idx.n_buckets,
    ))

    def run_k1():
        keys = k1_jit(model.doc_ids, model.impacts, (toffs, bounds, wts))
        jax.block_until_ready(keys)
        return keys

    t(run_k1, "  kernel1 gather+pack only")
    keys = run_k1()

    k2_jit = jax.jit(ft.partial(
        br.sort_finish_pallas,
        tile=plan.tile, max_seg=plan.term_offs.shape[1],
        require_all=False, bucket_bits=idx.bucket_bits,
        n_buckets=idx.n_buckets,
    ))

    def run_k2():
        r, d = k2_jit(keys, nt)
        jax.block_until_ready(r)

    t(run_k2, "  kernel2 sort+finish only")

    ranked = k2_jit(keys, nt)[0]
    B = toffs.shape[0]
    topk_jit = jax.jit(lambda r: br._hierarchical_topk_i32(
        r.reshape(B, idx.n_buckets * plan.tile), K))

    def run_topk():
        jax.block_until_ready(topk_jit(ranked))

    t(run_topk, "  topk only")

    # ---- parity ---------------------------------------------------------
    fs, fd, fh = f_out[0]
    bs, bd, bh = b_out[0]
    mism = hit_mism = 0
    for qi in range(BATCH):
        if fh[qi] != bh[qi]:
            hit_mism += 1
        a = [int(x) for x in fd[qi][:K] if x >= 0]
        bset = set(int(x) for x in bd[qi][:K] if x >= 0)
        ov = len(set(a) & bset) / max(1, min(len(a), len(bset)))
        if ov < 0.99:
            mism += 1
            if mism <= 3:
                print(f"q{qi}: overlap {ov:.3f}", file=sys.stderr)
    print(
        f"parity: {BATCH - mism}/{BATCH} queries with >=99% top-{K} overlap; "
        f"hit-count mismatches {hit_mism}",
        file=sys.stderr, flush=True,
    )
    print(
        f"SUMMARY bucket_docs={1 << idx.bucket_bits} fused={fused_t*1e3:.1f}ms "
        f"bucket={bucket_t*1e3:.1f}ms eff={bucket_eff*1e3:.1f}ms "
        f"speedup={fused_t/bucket_t:.2f}x",
        file=sys.stderr, flush=True,
    )


def main():
    from nrtsearch_tpu.models.flagship import SyntheticCorpus, _pad_pow2
    from nrtsearch_tpu.ops import bucket_retrieval as br

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    corpus = SyntheticCorpus(NUM_DOCS, VOCAB, 48, seed=42)
    print(f"corpus built: {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    model = corpus.to_model()
    print(f"packed to device: {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)
    queries = corpus.sample_queries(BATCH, TPQ)

    # ---- existing fused full-width path --------------------------------
    b = model.compile_queries(queries)
    print(
        f"fused: run_len={b.run_len} R={b.term_offsets.shape[1]} "
        f"width={b.run_len * b.term_offsets.shape[1]}",
        file=sys.stderr, flush=True,
    )
    f_out = [None]

    def run_fused():
        s, d, h = model.search(b, k=K)
        jax.block_until_ready(s)
        f_out[0] = (np.asarray(s), np.asarray(d), np.asarray(h))

    fused_t = t(run_fused, "fused full-width step")

    docs_h = np.asarray(model.doc_ids)
    imps_h = np.asarray(model.impacts)
    offs_h = np.asarray(model.offsets, np.int64)
    lens_h = np.asarray(model.lengths, np.int32)
    for bd in SWEEP:
        t0 = time.perf_counter()
        idx = br.BucketIndex.build(
            docs_h, imps_h, offs_h, lens_h,
            capacity=_pad_pow2(NUM_DOCS), bucket_docs=bd,
        )
        print(f"BucketIndex.build(bucket_docs={bd}): "
              f"{time.perf_counter()-t0:.1f}s m={idx.n_buckets}",
              file=sys.stderr, flush=True)
        bucket_path(model, idx, queries, br, f_out, fused_t)


if __name__ == "__main__":
    main()
