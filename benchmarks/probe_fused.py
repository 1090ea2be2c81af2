"""Probe the primitives for the round-5 fused dense path (run on TPU).

The round-5 redesign replaces the full-H head matmul + element-gather
combine with:
  1. a COMPACT row gather: rows_used[Up, D] = rows[row_idx] where Up is the
     batch's distinct head rows (<= 128) instead of Hp=1024 — the head scan
     then reads Up/Hp of the bytes;
  2. a SLICE-gather combine: head scores at tail candidates read S in
     128-lane blocks (S3[b, doc>>7, :]) and select the lane with a one-hot
     multiply — pure vector ops instead of ~13 ns/element random gathers.

This probe measures each candidate primitive in isolation with the
fori_loop differencing harness from profile_dense_stages (the axon tunnel
costs ~31 ms per dispatch; block_until_ready is a no-op through it).

Stages:
  rowgather scan      lax.scan + dynamic_slice, U rows of [1024, D] bf16
  rowgather pallas    flat-copy Pallas kernel with scalar-prefetch indices
  compact matmul      [B, Up] @ [Up, D] + mask + blockmax + hits (XLA)
  slab gather         take_along_axis [B, nr, 128] x 256 rows (head slab)
  tail slice-gather   S3[b, docs>>7, :] [B, N, 128] + one-hot lane select
"""

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from profile_dense_stages import timeit_loop  # noqa: E402

D = int(os.environ.get("P_NUM_DOCS", 1_000_000))
HP = int(os.environ.get("P_ROWS", 1024))
K = int(os.environ.get("P_TOPK", 100))
N_TAIL = int(os.environ.get("P_TAIL", 16384))


def _pow2(n, minimum=1):
    b = minimum
    while b < n:
        b <<= 1
    return b


def rowgather_scan(rows, idx):
    """U rows from [Hp, D] via scan + dynamic_slice (one contiguous DMA
    per row — XLA's generic gather measured ~24 GB/s; this should stream)."""

    def body(_, i):
        return None, jax.lax.dynamic_slice(rows, (i, 0), (1, rows.shape[1]))

    _, out = jax.lax.scan(body, None, idx)
    return out[:, 0, :]


def rowgather_pallas(rows, idx):
    """U rows from [Hp, D] via a Pallas copy kernel: grid (U, D/CHUNK),
    block index from the scalar-prefetched row ids."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Hp, Dd = rows.shape
    U = idx.shape[0]
    CHUNK = 65536
    while Dd % CHUNK:
        CHUNK //= 2

    def kern(idx_ref, rows_ref, out_ref):
        out_ref[:] = rows_ref[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(U, Dd // CHUNK),
        in_specs=[
            pl.BlockSpec((1, CHUNK), lambda i, j, idx_ref: (idx_ref[i], j)),
        ],
        out_specs=pl.BlockSpec((1, CHUNK), lambda i, j, idx_ref: (i, j)),
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((U, Dd), rows.dtype),
        grid_spec=grid_spec,
    )(idx, rows)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}  D={D} Hp={HP}", file=sys.stderr)
    Dp = -(-D // 128) * 128
    rng = np.random.default_rng(0)
    rows_np = np.where(
        rng.random((HP, Dp)) < 0.05, rng.random((HP, Dp)) * 8.0, 0.0
    ).astype(np.float32)
    rows = jax.device_put(rows_np.astype(jnp.bfloat16))
    del rows_np
    out = {}

    for U in (64, 128):
        idx = jax.device_put(
            np.sort(rng.choice(HP, size=U, replace=False)).astype(np.int32)
        )

        def rg_scan(acc, rows, idx):
            i2 = idx + (acc * 1e-30).astype(jnp.int32)
            return rowgather_scan(rows, i2)[:, ::1024].astype(jnp.float32).sum()

        out[f"rowgather_scan_U{U}"] = timeit_loop(
            rg_scan, f"rowgather scan U={U}", rows, idx
        )
        try:
            def rg_pl(acc, rows, idx):
                i2 = idx + (acc * 1e-30).astype(jnp.int32)
                return rowgather_pallas(rows, i2)[:, ::1024].astype(
                    jnp.float32
                ).sum()

            out[f"rowgather_pallas_U{U}"] = timeit_loop(
                rg_pl, f"rowgather pallas U={U}", rows, idx
            )
        except Exception as e:  # noqa: BLE001
            print(f"pallas rowgather U={U} failed: {e}", file=sys.stderr)

    # compact matmul + epilogue (XLA): the phase-1 replacement
    for B, U in ((32, 64), (32, 128), (128, 128)):
        W_np = np.zeros((B, U), np.float32)
        for b in range(B):
            for t in rng.choice(U, size=4, replace=False):
                W_np[b, t] = rng.random() * 4.0 + 0.5
        W = jax.device_put(W_np)
        rows_u = jax.device_put(
            jnp.asarray(rows[:U])
        )

        def compact(acc, W, rows_u):
            W2 = (W * (1.0 + acc * 1e-30)).astype(jnp.bfloat16)
            S = jax.lax.dot_general(
                W2, rows_u, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            matched = S > 0.0
            m = jnp.where(matched, S, -jnp.inf)
            m3 = m.reshape(B, Dp // 128, 128)
            bmax = jnp.max(m3, axis=-1)
            hits = jnp.sum(matched, axis=-1, dtype=jnp.int32)
            rm_top, rm_idx = jax.lax.top_k(bmax, 256)
            return (
                jnp.where(rm_top > -jnp.inf, rm_top, 0.0).sum()
                + hits.sum().astype(jnp.float32) * 1e-9
                + rm_idx.sum().astype(jnp.float32) * 1e-12
            )

        out[f"compact_scan_B{B}_U{U}"] = timeit_loop(
            compact, f"compact matmul+bmax+hits B={B} U={U}", W, rows_u
        )

    # slice-gather combine: S3[b, blk, :] for N tail entries + one-hot lane
    for B in (32, 128):
        S = jax.device_put(
            rng.random((B, Dp // 128, 128)).astype(np.float32)
        )
        docs = jax.device_put(
            np.sort(rng.integers(0, Dp, size=(B, N_TAIL)), axis=1).astype(
                np.int32
            )
        )

        def tail_gather(acc, S, docs):
            d2 = docs + (acc * 1e-30).astype(jnp.int32)
            blk = d2 >> 7
            lane = d2 & 127
            G = jnp.take_along_axis(S, blk[..., None], axis=1)  # [B, N, 128]
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
                == lane[..., None]
            )
            s_at = jnp.sum(jnp.where(onehot, G, 0.0), axis=-1)  # [B, N]
            return s_at.sum()

        out[f"tail_slice_gather_B{B}_N{N_TAIL}"] = timeit_loop(
            tail_gather, f"tail slice-gather B={B} N={N_TAIL}", S, docs
        )

        # element-gather comparison (the round-4 full-branch cost)
        def tail_elem(acc, S, docs):
            d2 = docs + (acc * 1e-30).astype(jnp.int32)
            Sf = S.reshape(B, Dp)
            s_at = jnp.take_along_axis(Sf, d2, axis=1)
            return s_at.sum()

        out[f"tail_elem_gather_B{B}_N{N_TAIL}"] = timeit_loop(
            tail_elem, f"tail elem-gather B={B} N={N_TAIL}", S, docs
        )

    import json

    print(json.dumps(out))


if __name__ == "__main__":
    main()
