"""Stage-level profile of the dense-head + sparse-tail path (round 4).

Times each stage of ops/dense_head.dense_tail_topk separately at bench
shapes, with synthetic device arrays (no corpus build — matmul/top-k/kernel
cost does not depend on the values, only the shapes). Run on the TPU:

    python benchmarks/profile_dense.py

Each sync number includes one axon dispatch round trip; the `floor` line
measures that RT so device time can be read as (stage - floor). The piped
lines overlap dispatch with readback at depth 4 (serving overlap).
"""

import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

D = int(os.environ.get("P_D", 1 << 20))        # padded doc space
HP = int(os.environ.get("P_H", 256))           # dense head rows
B = int(os.environ.get("P_B", 32))             # batch
K = int(os.environ.get("P_K", 100))
T = int(os.environ.get("P_T", 8))              # tail slots
CAP = int(os.environ.get("P_CAP", 1024))       # per-slot per-bucket cap
TILE = int(os.environ.get("P_TILE", 1024))     # per-bucket tile
BK_DOCS = int(os.environ.get("P_BK", 32768))   # bucket width
ITERS = int(os.environ.get("P_ITERS", 10))


def t_sync(run, label):
    run()
    run()
    best = 1e9
    for _ in range(ITERS):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:52s} {best*1e3:9.2f} ms", file=sys.stderr, flush=True)
    return best


def t_piped(dispatch, force, label, depth=4, n=None):
    """Effective per-iter time with `depth` dispatches in flight."""
    n = n or ITERS * 3
    force(dispatch())
    pend = deque()
    t0 = time.perf_counter()
    for _ in range(n):
        pend.append(dispatch())
        while len(pend) >= depth:
            force(pend.popleft())
    while pend:
        force(pend.popleft())
    eff = (time.perf_counter() - t0) / n
    print(f"{label:52s} {eff*1e3:9.2f} ms (piped depth {depth})",
          file=sys.stderr, flush=True)
    return eff


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}  D={D} Hp={HP} B={B} T={T} cap={CAP} tile={TILE}",
          file=sys.stderr)
    on_tpu = dev.platform == "tpu"
    rng = np.random.default_rng(0)

    # --- dispatch floor -----------------------------------------------------
    tiny = jax.device_put(np.zeros((8, 128), np.float32))
    f_inc = jax.jit(lambda x: x + 1)
    floor = t_sync(lambda: np.asarray(f_inc(tiny)), "dispatch floor (tiny jit RT)")
    t_piped(lambda: f_inc(tiny), np.asarray, "dispatch floor piped")

    # concurrent RTs from worker threads: does the tunnel overlap at all?
    from concurrent.futures import ThreadPoolExecutor

    for nthreads in (4, 16):
        with ThreadPoolExecutor(nthreads) as pool:
            n = 64
            t0 = time.perf_counter()
            futs = [
                pool.submit(lambda: np.asarray(f_inc(tiny)))
                for _ in range(n)
            ]
            for f in futs:
                f.result()
            per = (time.perf_counter() - t0) / n
            print(f"{'tiny RT x64, ' + str(nthreads) + ' threads':52s} "
                  f"{per*1e3:9.2f} ms/op", file=sys.stderr, flush=True)

    # --- dense head: matmul -------------------------------------------------
    rows = jax.device_put(
        (rng.random((HP, D), np.float32) * (rng.random((HP, D)) < 0.3)).astype(
            jnp.bfloat16
        )
    )
    W = jax.device_put(np.abs(rng.random((B, HP), np.float32)).astype(np.float32))

    @jax.jit
    def mm_only(W, rows):
        S = jax.lax.dot_general(
            W.astype(jnp.bfloat16), rows, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.max(S, axis=-1)          # tiny readback

    t_sync(lambda: np.asarray(mm_only(W, rows)), "head matmul [B,Hp]@[Hp,D] (+rowmax)")
    t_piped(lambda: mm_only(W, rows), np.asarray, "head matmul piped")

    # --- matmul + mask + hierarchical top-k --------------------------------
    from nrtsearch_tpu.ops.merge_scoring import _hierarchical_topk

    @jax.jit
    def mm_topk(W, rows):
        S = jax.lax.dot_general(
            W.astype(jnp.bfloat16), rows, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        masked = jnp.where(S > 0.0, S, -jnp.inf)
        s, d = _hierarchical_topk(masked, K)
        hits = jnp.sum((S > 0.0).astype(jnp.int32), axis=-1)
        return s, d, hits

    t_sync(lambda: np.asarray(mm_topk(W, rows)[0]), "matmul + mask + hier topk + hits")
    t_piped(lambda: mm_topk(W, rows), lambda o: np.asarray(o[0]),
            "matmul + topk piped")

    @jax.jit
    def mm_topk_flat(W, rows):
        S = jax.lax.dot_general(
            W.astype(jnp.bfloat16), rows, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        masked = jnp.where(S > 0.0, S, -jnp.inf)
        return jax.lax.top_k(masked, K)

    t_sync(lambda: np.asarray(mm_topk_flat(W, rows)[0]), "matmul + flat lax.top_k")

    # --- tail kernels -------------------------------------------------------
    from nrtsearch_tpu.ops.bucket_retrieval import (
        gather_pack_pallas, sort_finish_pallas,
    )

    m = D // BK_DOCS
    bits = BK_DOCS.bit_length() - 1
    P = 1 << 24
    post_docs = jax.device_put(
        np.sort(rng.integers(0, D, P)).astype(np.int32)
    )
    post_imps = jax.device_put(np.abs(rng.random(P, np.float32)))
    # synthetic tail tables: T slots per query, each slot a run of ~CAP*m/4
    toffs = np.zeros((B, T), np.int32)
    bounds = np.zeros((B, T, m + 1), np.int32)
    for qi in range(B):
        for ti in range(T):
            ln = int(rng.integers(CAP * m // 8, CAP * m // 2))
            off = int(rng.integers(0, P - ln - BK_DOCS - 2048))
            toffs[qi, ti] = off
            # per-bucket split of the run (roughly even)
            cuts = np.sort(rng.integers(0, ln, m - 1))
            bounds[qi, ti, 1:m] = cuts
            bounds[qi, ti, m] = ln
    wts = np.abs(rng.random((B, T), np.float32)) * 100
    n_terms = np.ones(B, np.int32)
    toffs_d = jax.device_put(toffs)
    bounds_d = jax.device_put(bounds)
    wts_d = jax.device_put(wts)
    n_terms_d = jax.device_put(n_terms)
    caps = (CAP,) * T

    def tail_gather():
        keys = gather_pack_pallas(
            post_docs, post_imps, (toffs_d, bounds_d, wts_d),
            T=T, caps=caps, tile=TILE, bucket_bits=bits, m=m,
            interpret=not on_tpu,
        )
        return keys

    t_sync(lambda: np.asarray(tail_gather()[0, 0, 0]), "tail gather_pack (grid B*m)")

    keys_d = tail_gather()

    def tail_sort():
        ranked, docs = sort_finish_pallas(
            keys_d, n_terms_d, tile=TILE, max_seg=T, require_all=False,
            bucket_bits=bits, n_buckets=m, interpret=not on_tpu,
        )
        return ranked

    t_sync(lambda: np.asarray(tail_sort()[0, 0]), "tail sort_finish (grid B*m)")

    def tail_both():
        keys = gather_pack_pallas(
            post_docs, post_imps, (toffs_d, bounds_d, wts_d),
            T=T, caps=caps, tile=TILE, bucket_bits=bits, m=m,
            interpret=not on_tpu,
        )
        ranked, docs = sort_finish_pallas(
            keys, n_terms_d, tile=TILE, max_seg=T, require_all=False,
            bucket_bits=bits, n_buckets=m, interpret=not on_tpu,
        )
        return ranked

    t_sync(lambda: np.asarray(tail_both()[0, 0]), "tail gather+sort")
    t_piped(tail_both, lambda o: np.asarray(o[0, 0]), "tail gather+sort piped")

    # --- combine (support merge + final topk) on fake intermediates --------
    S_fake = jax.device_put(rng.random((B, D), np.float32))
    sup_q = jax.device_put(
        rng.integers(1, 30000, (B, m * TILE)).astype(np.int32)
    )
    sup_d = jax.device_put(
        np.sort(rng.integers(0, D, (B, m * TILE)), axis=1).astype(np.int32)
    )
    head_s = jax.device_put(rng.random((B, K), np.float32))
    head_d = jax.device_put(
        rng.integers(0, D, (B, K)).astype(np.int32)
    )
    scales = jax.device_put(np.ones(B, np.float32))

    @jax.jit
    def combine(S, sup_q, sup_d, head_s, head_d, scales):
        valid = sup_q != np.iinfo(np.int32).min
        sd = jnp.clip(sup_d, 0, D - 1)
        s_at = jnp.take_along_axis(S, sd, axis=1)
        sup_s = jnp.where(
            valid, sup_q.astype(jnp.float32) / scales[:, None] + s_at, -jnp.inf
        )
        p = jax.vmap(lambda ar, vr: jnp.searchsorted(ar, vr))(sup_d, head_d)
        pc = jnp.clip(p, 0, sup_d.shape[1] - 1)
        dup = (jnp.take_along_axis(sup_d, pc, axis=1) == head_d) & (
            p < sup_d.shape[1]
        )
        hs = jnp.where(dup, -jnp.inf, head_s)
        all_s = jnp.concatenate([sup_s, hs], axis=1)
        all_d = jnp.concatenate([sup_d, head_d], axis=1)
        fs, fi = jax.lax.top_k(all_s, K)
        return fs, jnp.take_along_axis(all_d, fi, axis=1)

    t_sync(
        lambda: np.asarray(
            combine(S_fake, sup_q, sup_d, head_s, head_d, scales)[0]
        ),
        "combine: gather S@support + dedup + topk",
    )

    # --- full fused program (synthetic tables, real code path) -------------
    from nrtsearch_tpu.ops.dense_head import dense_tail_topk

    def full():
        return dense_tail_topk(
            rows, post_docs, post_imps, W,
            toffs_d, bounds_d, wts_d, n_terms_d,
            jax.device_put(np.full(B, 100.0, np.float32)),
            k=K, has_head=True, T=T, caps=caps, tile=TILE,
            bucket_bits=bits, m=m, interpret=not on_tpu,
        )

    t_sync(lambda: np.asarray(full()), "FULL dense_tail_topk (one dispatch)")
    t_piped(full, np.asarray, "FULL dense_tail_topk piped")

    # --- batch scaling of the head program (the amortization lever) --------
    for BB in (64, 128, 256, 512):
        Wb = jax.device_put(
            np.abs(rng.random((BB, HP), np.float32)).astype(np.float32)
        )
        t_sync(
            lambda: np.asarray(mm_topk(Wb, rows)[0]),
            f"matmul + topk + hits  B={BB}",
        )

    print("done", file=sys.stderr)


if __name__ == "__main__":
    main()
