"""Device-time breakdown of the dense-head path (run on the TPU).

The axon tunnel costs ~31 ms per synchronous dispatch and same-thread
pipelining does not amortize it (PERF_CEILING.md fact #1), so per-stage
device time is measured by running each stage N times inside ONE jitted
lax.fori_loop (one dispatch, N executions) and dividing. The carry scalar
is mixed into an input with a ~1e-30 perturbation so XLA cannot hoist the
loop body as loop-invariant, while values stay numerically sane (the
hierarchical top-k has data-dependent lax.cond branches).

Stages (B x Hp @ Hp x D dense head, bench shapes):
  matmul            S = W @ rows (f32 accumulation) + cheap reduce
  +mask+hits        + where(S>0) + row-sum of matches
  +hier topk        + _hierarchical_topk(masked, k)   <- r4 suspect: the
                      take_along_axis row-gather moves ~13 ns/element
  hier gather only  take_along_axis(m3, fixed 256-row indices)
  blockmax+topk     row_max over [B, D/128, 128] + lax.top_k over [B, D/128]
  full topk         lax.top_k over the full [B, D]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

D = int(os.environ.get("P_NUM_DOCS", 1_000_000))
HP = int(os.environ.get("P_ROWS", 1024))
K = int(os.environ.get("P_TOPK", 100))
LOOP = int(os.environ.get("P_LOOP", 10))
BATCHES = tuple(
    int(x) for x in os.environ.get("P_BATCHES", "32,128").split(",")
)


def timeit_loop(make_body, label, *args):
    """Per-iteration device ms for one stage.

    block_until_ready is a NO-OP through the axon tunnel (measured this
    round: 0.03 ms after a 25 ms real execution; only a value readback
    forces). So: run the body N times inside one jitted fori_loop, force
    with float(), and difference two loop depths to cancel the constant
    dispatch+readback cost: per_iter = (t(4N) - t(N)) / 3N.
    """

    def make(n):
        @jax.jit
        def run(*args):
            def body(i, acc):
                return acc + make_body(acc, *args)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return run

    lo, hi = make(LOOP), make(4 * LOOP)
    float(lo(*args))   # compile + flush queue
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
    print(f"{label:34s} {per:9.3f} ms/iter  "
          f"(loop{LOOP} {t_lo*1e3:.1f} ms)", file=sys.stderr)
    return per


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}  D={D} Hp={HP} k={K} loop={LOOP}", file=sys.stderr)
    if dev.platform != "tpu":
        raise SystemExit("profile requires TPU")

    from nrtsearch_tpu.ops.merge_scoring import _hierarchical_topk

    Dp = -(-D // 128) * 128
    rng = np.random.default_rng(0)
    # ~5% density impact rows like a Zipf head
    rows_np = np.where(
        rng.random((HP, Dp)) < 0.05, rng.random((HP, Dp)) * 8.0, 0.0
    ).astype(np.float32)
    rows = jax.device_put(rows_np.astype(jnp.bfloat16))
    del rows_np

    out = {}
    for B in BATCHES:
        W_np = np.zeros((B, HP), np.float32)
        for b in range(B):
            for t in rng.choice(HP, size=4, replace=False):
                W_np[b, t] = rng.random() * 4.0 + 0.5
        W = jax.device_put(W_np)

        def mm(acc, W, rows):
            W2 = W * (1.0 + acc * 1e-30)
            S = jax.lax.dot_general(
                W2.astype(jnp.bfloat16), rows,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return S[:, :128].sum()

        def mm_hits(acc, W, rows):
            W2 = W * (1.0 + acc * 1e-30)
            S = jax.lax.dot_general(
                W2.astype(jnp.bfloat16), rows,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            hits = jnp.sum((S > 0.0).astype(jnp.int32), axis=-1)
            return hits.sum().astype(jnp.float32)

        def mm_hier(acc, W, rows):
            W2 = W * (1.0 + acc * 1e-30)
            S = jax.lax.dot_general(
                W2.astype(jnp.bfloat16), rows,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            masked = jnp.where(S > 0.0, S, -jnp.inf)
            hs, hd = _hierarchical_topk(masked, K)
            hits = jnp.sum((S > 0.0).astype(jnp.int32), axis=-1)
            return (
                jnp.where(hs > -jnp.inf, hs, 0.0).sum()
                + hd.sum().astype(jnp.float32) * 1e-12
                + hits.sum().astype(jnp.float32) * 1e-12
            )

        def blockmax_topk(acc, W, rows):
            W2 = W * (1.0 + acc * 1e-30)
            S = jax.lax.dot_general(
                W2.astype(jnp.bfloat16), rows,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            masked = jnp.where(S > 0.0, S, -jnp.inf)
            m3 = masked.reshape(B, Dp // 128, 128)
            row_max = jnp.max(m3, axis=-1)
            rm_top, rm_idx = jax.lax.top_k(row_max, 256)
            return (
                jnp.where(rm_top > -jnp.inf, rm_top, 0.0).sum()
                + rm_idx.sum().astype(jnp.float32) * 1e-12
            )

        # the hierarchical row-gather in isolation (fixed indices)
        m3_np = rng.random((B, Dp // 128, 128)).astype(np.float32)
        m3 = jax.device_put(m3_np)
        idx = jax.device_put(
            np.sort(
                rng.integers(0, Dp // 128, size=(B, 256)), axis=-1
            ).astype(np.int32)
        )

        def hier_gather(acc, m3, idx):
            i2 = idx + (acc * 1e-30).astype(jnp.int32)
            cand = jnp.take_along_axis(m3, i2[..., None], axis=1)
            return cand[:, :, 0].sum()

        def full_topk(acc, W, rows):
            W2 = W * (1.0 + acc * 1e-30)
            S = jax.lax.dot_general(
                W2.astype(jnp.bfloat16), rows,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            masked = jnp.where(S > 0.0, S, -jnp.inf)
            ts, ti = jax.lax.top_k(masked, K)
            return (
                jnp.where(ts > -jnp.inf, ts, 0.0).sum()
                + ti.sum().astype(jnp.float32) * 1e-12
            )

        print(f"--- B={B} ---", file=sys.stderr)
        r = {}
        r["matmul"] = timeit_loop(mm, f"B={B} matmul", W, rows)
        r["matmul_hits"] = timeit_loop(mm_hits, f"B={B} matmul+hits", W, rows)
        r["blockmax_topk"] = timeit_loop(
            blockmax_topk, f"B={B} matmul+blockmax+topk256", W, rows
        )
        r["matmul_hier"] = timeit_loop(
            mm_hier, f"B={B} matmul+hier_topk", W, rows
        )
        r["hier_gather"] = timeit_loop(
            hier_gather, f"B={B} hier row-gather only", m3, idx
        )
        if os.environ.get("P_FULL_TOPK", "0") == "1":
            r["full_topk"] = timeit_loop(
                full_topk, f"B={B} matmul+full lax.top_k", W, rows
            )
        out[B] = r

    import json

    print(json.dumps(out))


if __name__ == "__main__":
    main()
