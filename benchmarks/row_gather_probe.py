"""Probe: full-H matmul vs compact row-gather matmul at growing head sizes.

The round-4 open question: dense_merge_topk gathers the batch's used head
rows (jnp.take) before the matmul so HBM traffic scales with true usage,
but the H=2048 compact config measured SLOWER than the H=1024 full matmul
(1326 vs 1979 qps). This isolates the two formulations: for each Hp in the
sweep, time (a) W[B, Hp] @ rows[Hp, D] full, (b) take(rows, idx[U]) then
W[B, U] @ rows_u for U in {64, 128, 256}. Each timing runs STEPS iterations
inside one jitted lax.scan so the ~31 ms axon dispatch amortizes away.

AXON CAVEAT (measured 2026-08-19): jax.block_until_ready returns in ~0.1 ms
on the axon backend WITHOUT waiting for device work; the only honest timing
is a value readback (device_get of the scalar), which pays one ~31 ms
tunnel round trip — amortized here across STEPS scan iterations.

    python benchmarks/row_gather_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

D = int(os.environ.get("P_D", 1 << 20))
B = int(os.environ.get("P_B", 32))
STEPS = int(os.environ.get("P_STEPS", 32))
ITERS = int(os.environ.get("P_ITERS", 5))


def timeit(fn, *args):
    """Per-step seconds, measured by scalar readback (see module caveat)."""
    float(fn(*args))  # compile + warm
    best = 1e9
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    rng = np.random.default_rng(0)

    @jax.jit
    def floor(x):
        return jnp.max(x + 1.0)

    x0 = jax.device_put(jnp.zeros((8, 128), jnp.float32))
    float(floor(x0))
    t0 = time.perf_counter()
    float(floor(x0))
    print(f"fetch floor (1 RT): {(time.perf_counter()-t0)*1e3:.2f} ms",
          file=sys.stderr)

    results = {}
    for Hp in (256, 1024, 2048, 4096):
        @jax.jit
        def build(seed, Hp=Hp):
            return jax.random.normal(jax.random.PRNGKey(seed), (Hp, D),
                                     jnp.bfloat16)

        rows = build(0)
        Ws = jax.device_put(
            rng.standard_normal((STEPS, B, Hp)).astype(np.float32))

        @jax.jit
        def full_scan(rows, Ws):
            def step(acc, W):
                S = jax.lax.dot_general(
                    W.astype(jnp.bfloat16), rows,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return acc + jnp.max(S), None
            out, _ = jax.lax.scan(step, 0.0, Ws)
            return out

        t = timeit(full_scan, rows, Ws)
        results[f"full_H{Hp}"] = t
        print(f"full matmul Hp={Hp:5d}:            {t*1e3:8.3f} ms/step",
              file=sys.stderr)

        for U in (64, 128, 256):
            if U > Hp:
                continue
            idxs = jax.device_put(
                rng.integers(0, Hp, (STEPS, U)).astype(np.int32))
            Wc = jax.device_put(
                rng.standard_normal((STEPS, B, U)).astype(np.float32))

            @jax.jit
            def compact_scan(rows, Wc, idxs):
                def step(acc, wi):
                    W, idx = wi
                    rows_u = jnp.take(rows, idx, axis=0)
                    S = jax.lax.dot_general(
                        W.astype(jnp.bfloat16), rows_u,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    return acc + jnp.max(S), None
                out, _ = jax.lax.scan(step, 0.0, (Wc, idxs))
                return out

            t = timeit(compact_scan, rows, Wc, idxs)
            results[f"take_H{Hp}_U{U}"] = t
            print(f"take-gather Hp={Hp:5d} U={U:4d}:    {t*1e3:8.3f} ms/step",
                  file=sys.stderr)
        del rows

    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
