"""Device-time breakdown of the round-5 FUSED dense path (run on the TPU).

Answers: why does dense_fused_topk (compact rows + Dekker + annotated-tail
pruned combine) measure SLOWER than round-4 dense_merge_topk (full-H matmul
+ candidate window) on plain bench queries (1,003 vs 1,985 qps, BENCH r5
in-flight log), and where do the fused p99 402 ms outliers come from?

Same loop-differencing methodology as profile_dense_stages.py: each stage
runs N times inside one jitted fori_loop (one axon dispatch), per-iter =
(t(4N) - t(N)) / 3N.

Stages:
  gather_rows pallas     compact [U, D] row gather (the round-5 premise)
  matmul compact         W[B,U] @ rows_used[U,D]
  matmul full-H          scatter W + [B,Hp] @ [Hp,D] (the round-4 way)
  dekker 3x compact      3 compact matmuls + 2 row gathers (residual path)
  annotated tail         _annotated_tail bitonic merge-join + ffill
  topk ub M+1            lax.top_k(ub[B, W2], 513)
  slice-gather combine   _gather_at_docs over the full tail stream (the
                         escalation branch: one-hot lane select)
  element-gather combine take_along_axis at M=512 candidates (round-4 way)
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# the axon TPU plugin prepends itself to jax_platforms, overriding the env
# var — pin the config before any backend init (same as tests/conftest.py)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

D = int(os.environ.get("P_NUM_DOCS", 1_000_000))
HP = int(os.environ.get("P_ROWS", 1024))
U = int(os.environ.get("P_USED", 128))
N = int(os.environ.get("P_TAIL", 16384))
K = int(os.environ.get("P_TOPK", 100))
LOOP = int(os.environ.get("P_LOOP", 10))
B = int(os.environ.get("P_BATCH", 32))


def timeit_loop(make_body, label, *args):
    def make(n):
        @jax.jit
        def run(*args):
            def body(i, acc):
                return acc + make_body(acc, *args)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return run

    lo, hi = make(LOOP), make(4 * LOOP)
    float(lo(*args))
    float(hi(*args))
    t_lo = min(
        (lambda s: (float(lo(*args)), time.perf_counter() - s)[1])(
            time.perf_counter()
        )
        for _ in range(3)
    )
    t_hi = min(
        (lambda s: (float(hi(*args)), time.perf_counter() - s)[1])(
            time.perf_counter()
        )
        for _ in range(3)
    )
    per = (t_hi - t_lo) / (3 * LOOP) * 1e3
    print(f"{label:34s} {per:9.3f} ms/iter", flush=True)
    return per


def main():
    from nrtsearch_tpu.ops.dense_fused import (
        _annotated_tail, _gather_at_docs, gather_rows,
    )

    rng = np.random.default_rng(0)
    Dp = -(-D // 128) * 128
    nr = Dp // 128
    rows = jnp.asarray(
        rng.random((HP, Dp), np.float32).astype(np.float32)
    ).astype(jnp.bfloat16)
    rows_lo = rows * jnp.bfloat16(2**-8)
    W = jnp.asarray(rng.random((B, U), np.float32))
    row_idx = jnp.asarray(rng.integers(0, HP, U).astype(np.int32))
    docs = jnp.asarray(
        np.sort(rng.integers(0, Dp, (B, N)).astype(np.int32), axis=1)
    )
    tail_sum = jnp.asarray(rng.random((B, N), np.float32))
    live = tail_sum > 0.2
    bmax = jnp.asarray(rng.random((B, nr), np.float32))
    S = jnp.asarray(rng.random((B, Dp), np.float32))
    mm_dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    def mm(a, b):
        return jax.lax.dot_general(
            a.astype(mm_dt), b.astype(mm_dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out = {}

    def perturb(acc, x):
        return x * (1.0 + acc * 1e-30)

    out["gather_rows"] = timeit_loop(
        lambda acc, rows, idx: jnp.sum(
            gather_rows(rows, idx)[:, :128].astype(jnp.float32)
        ) * 0 + acc * 0 + 1e-9,
        "gather_rows pallas [U,D]", rows, row_idx,
    )
    out["mm_compact"] = timeit_loop(
        lambda acc, W, rows, idx: jnp.sum(
            mm(perturb(acc, W), gather_rows(rows, idx))[:, :8]
        ) * 1e-20,
        "compact gather+matmul", W, rows, row_idx,
    )

    def full_h(acc, W, rows, idx):
        Wf = jnp.zeros((B, HP), W.dtype).at[:, idx].add(perturb(acc, W))
        return jnp.sum(mm(Wf, rows)[:, :8]) * 1e-20

    out["mm_fullH"] = timeit_loop(full_h, "full-H scatter+matmul", W, rows,
                                  row_idx)

    def dekker(acc, W, rows, rows_lo, idx):
        ru = gather_rows(rows, idx)
        rl = gather_rows(rows_lo, idx)
        W_hi = perturb(acc, W).astype(jnp.bfloat16)
        W_lo = (W - W_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        S = mm(W_hi, ru) + mm(W_hi, rl) + mm(W_lo, ru)
        return jnp.sum(S[:, :8]) * 1e-20

    out["dekker"] = timeit_loop(dekker, "dekker 2 gathers + 3 matmuls", W,
                                rows, rows_lo, row_idx)

    def ann(acc, docs, tail_sum, live, bmax):
        keys, sums, bfill = _annotated_tail(
            docs, perturb(acc, tail_sum), live, bmax
        )
        return jnp.sum(sums[:, :8] * 1e-20) + jnp.sum(bfill[:, :8] * 1e-20)

    out["annotated_tail"] = timeit_loop(ann, "annotated tail merge-join",
                                        docs, tail_sum, live, bmax)

    W2 = 2 * max(N, nr)
    ub = jnp.asarray(rng.random((B, W2), np.float32))
    M = 512

    def topk_ub(acc, ub):
        s, p = jax.lax.top_k(perturb(acc, ub), M + 1)
        return jnp.sum(s[:, :8]) * 1e-20

    out["topk_ub"] = timeit_loop(topk_ub, f"lax.top_k(ub[{B},{W2}], {M+1})",
                                 ub)

    def slice_combine(acc, S, docs):
        s_at = _gather_at_docs(
            perturb(acc, S).reshape(B, nr, 128), docs, nr
        )
        return jnp.sum(s_at[:, :8]) * 1e-20

    out["slice_combine"] = timeit_loop(
        slice_combine, f"slice-gather combine [{B},{N}]", S, docs
    )

    sel = jnp.asarray(rng.integers(0, Dp, (B, M)).astype(np.int32))

    def elem_combine(acc, S, sel):
        s_at = jnp.take_along_axis(perturb(acc, S), sel, axis=1)
        return jnp.sum(s_at[:, :8]) * 1e-20

    out["elem_combine_M"] = timeit_loop(
        elem_combine, f"element gather at M={M}", S, sel
    )

    def elem_combine_full(acc, S, docs):
        dc = jnp.clip(docs, 0, Dp - 1)
        s_at = jnp.take_along_axis(perturb(acc, S), dc, axis=1)
        return jnp.sum(s_at[:, :8]) * 1e-20

    out["elem_combine_N"] = timeit_loop(
        elem_combine_full, f"element gather at N={N}", S, docs
    )

    import json

    print(json.dumps({"stages_ms": {k: round(v, 3) for k, v in out.items()},
                      "B": B, "D": D, "HP": HP, "U": U, "N": N}))


if __name__ == "__main__":
    main()
