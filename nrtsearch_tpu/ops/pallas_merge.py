"""Pallas TPU kernels for the bitonic merge (hot path of merge_scoring).

The XLA formulation of a compare-exchange stage costs several materialized
copies (layout changes, roll-as-concat), executing ~270x off memory bandwidth.
These kernels bring each stage to one read + one write of the (docs, contribs)
pair, and fuse ALL stages with distance < TILE into a single VMEM-resident
pass:

- ``far_stage``: distance d >= TILE. The flat [B, N] arrays are viewed as
  [B, N/(2d), 2, d] (a contiguous reshape); each program loads a (2, TILE)
  block — the lower and upper halves of one pair at the same offset — does the
  min/max exchange, and writes it back in place (input/output aliasing).
- ``near_stages``: all distances d0, d0/2, ..., 1 with 2*d0 <= TILE run inside
  one kernel: pairs never cross the tile boundary, so each tile loads once,
  applies log2(d0)+1 exchange rounds in VMEM (partner selection via
  ``pltpu.roll`` within the tile + parity masks), and stores once.

Called under jit from ops/merge_scoring.py on TPU backends; the pure-XLA
formulation remains the CPU/test path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1 << 17  # 128k elements: 512KB per f32 tile; stages below 64k fuse into one pass


def _far_kernel(docs_ref, contribs_ref, docs_out, contribs_out):
    lo_d = docs_ref[0, 0, 0, :]
    hi_d = docs_ref[0, 0, 1, :]
    swap = lo_d > hi_d
    docs_out[0, 0, 0, :] = jnp.where(swap, hi_d, lo_d)
    docs_out[0, 0, 1, :] = jnp.where(swap, lo_d, hi_d)
    lo_c = contribs_ref[0, 0, 0, :]
    hi_c = contribs_ref[0, 0, 1, :]
    contribs_out[0, 0, 0, :] = jnp.where(swap, hi_c, lo_c)
    contribs_out[0, 0, 1, :] = jnp.where(swap, lo_c, hi_c)


def far_stage(docs: jax.Array, contribs: jax.Array, d: int):
    """One compare-exchange stage at distance d >= TILE (in-place)."""
    B, N = docs.shape
    nblk = N // (2 * d)
    sub = d // TILE
    docs_v = docs.reshape(B, nblk, 2, d)
    contribs_v = contribs.reshape(B, nblk, 2, d)

    # block (1, 1, 2, TILE): the size-2 axis equals the full array dim, which
    # satisfies the TPU block-shape constraint; w walks TILE chunks of d
    spec = pl.BlockSpec(
        (1, 1, 2, TILE), lambda b, blk, w: (b, blk, 0, w), memory_space=pltpu.VMEM
    )
    out_docs, out_contribs = pl.pallas_call(
        _far_kernel,
        grid=(B, nblk, sub),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct(docs_v.shape, docs_v.dtype),
            jax.ShapeDtypeStruct(contribs_v.shape, contribs_v.dtype),
        ],
        input_output_aliases={0: 0, 1: 1},
    )(docs_v, contribs_v)
    return out_docs.reshape(B, N), out_contribs.reshape(B, N)


_ROWS = TILE // 128


def _near_kernel(docs_ref, contribs_ref, docs_out, contribs_out, *, d0: int):
    """All stages d0..1 on one (ROWS, 128) VMEM tile.

    Linear position p = row*128 + col. For d >= 128 (d multiple of 128 within
    the tile) the exchange partner is a row shift; for d < 128 a lane shift.
    Circular-wrap values are never selected (pairs live within 2d blocks)."""
    docs = docs_ref[0, 0]
    contribs = contribs_ref[0, 0]
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 1)
    d = d0
    while d >= 1:
        if d >= 128:
            shift = d // 128
            hi_bit = (row_idx & shift) != 0
            axis, s = 0, shift
            wrap = _ROWS
        else:
            hi_bit = (col_idx & d) != 0
            axis, s = 1, d
            wrap = 128
        pd = jnp.where(
            hi_bit,
            pltpu.roll(docs, s, axis=axis),
            pltpu.roll(docs, wrap - s, axis=axis),
        )
        pc = jnp.where(
            hi_bit,
            pltpu.roll(contribs, s, axis=axis),
            pltpu.roll(contribs, wrap - s, axis=axis),
        )
        # boolean logic instead of where-on-bools (Mosaic can't trunc i8->i1)
        keep = (hi_bit & (docs >= pd)) | (~hi_bit & (docs <= pd))
        docs = jnp.where(keep, docs, pd)
        contribs = jnp.where(keep, contribs, pc)
        d //= 2
    docs_out[0, 0] = docs
    contribs_out[0, 0] = contribs


def near_stages(docs: jax.Array, contribs: jax.Array, d0: int):
    """All stages d0 down to 1 in one VMEM pass (requires 2*d0 <= TILE)."""
    B, N = docs.shape
    docs_v = docs.reshape(B, N // TILE, _ROWS, 128)
    contribs_v = contribs.reshape(B, N // TILE, _ROWS, 128)
    spec = pl.BlockSpec(
        (1, 1, _ROWS, 128), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
    )
    out_docs, out_contribs = pl.pallas_call(
        functools.partial(_near_kernel, d0=d0),
        grid=(B, N // TILE),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct(docs_v.shape, docs_v.dtype),
            jax.ShapeDtypeStruct(contribs_v.shape, contribs_v.dtype),
        ],
        input_output_aliases={0: 0, 1: 1},
    )(docs_v, contribs_v)
    return out_docs.reshape(B, N), out_contribs.reshape(B, N)


GATHER_TILE = 8192  # postings DMA chunk; postings arrays carry >= this slack


_DMA_ROWS = 8  # row-start alignment for (8, 128)-tiled f32/i32 DMA


def _realign(window, rows: int, span_rows: int, r0, c):
    """Linear window [r0*128 + c, ... + rows*128) out of a (span_rows, 128)
    buffer, via traced-shift rolls (arbitrary linear slicing is unsupported).
    """
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (span_rows, 128), 1)
    rr = pltpu.roll(window, 128 - c, axis=1)          # [r, j] = win[r, (j+c)%128]
    rr_next = pltpu.roll(rr, span_rows - 1, axis=0)   # [r, j] = rr[r+1, j]
    lane_aligned = jnp.where(lane_idx < 128 - c, rr, rr_next)
    row_aligned = pltpu.roll(lane_aligned, span_rows - r0, axis=0)
    return row_aligned[:rows, :]


def _gather_kernel(offs_ref, lens_ref, wts_ref, docs_hbm, imps_hbm,
                   docs_out, imps_out, d_s, i_s, sem_d, sem_i, *, gt: int):
    b = pl.program_id(0)
    r = pl.program_id(1)
    w = pl.program_id(2)
    rows = gt // 128
    span_rows = rows + _DMA_ROWS
    ln = lens_ref[b, r]
    # Clamp the chunk's data offset inside the run: a chunk fully past the
    # run's valid length (w*gt >= ln, possible because runs are padded to a
    # power-of-two run_len that may exceed the builder's DMA slack) would
    # otherwise DMA up to run_len past the last posting — out of bounds.
    # Clamped chunks read in-bounds bytes that the logical-position mask
    # below discards entirely; partially-valid tail chunks are unaffected
    # (w*gt < ln keeps the true offset) and stay within the builder's
    # GATHER_TILE + alignment slack.
    off = offs_ref[b, r] + jnp.minimum(w * gt, jnp.maximum(ln - 1, 0))
    # DMA an aligned row window, then realign in VMEM (postings offsets are
    # arbitrary; HBM DMA starts must be tile-aligned)
    row0 = pl.multiple_of((off // (128 * _DMA_ROWS)) * _DMA_ROWS, _DMA_ROWS)
    shift = off - row0 * 128
    r0 = shift // 128
    c = shift % 128
    cd = pltpu.make_async_copy(docs_hbm.at[pl.ds(row0, span_rows), :], d_s, sem_d)
    cd.start()
    ci = pltpu.make_async_copy(imps_hbm.at[pl.ds(row0, span_rows), :], i_s, sem_i)
    ci.start()
    wt = wts_ref[b, r]
    pos = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        + w * gt
    )
    valid = (pos < ln) & (wt != 0.0)
    cd.wait()
    ci.wait()
    docs = _realign(d_s[:], rows, span_rows, r0, c)
    imps = _realign(i_s[:], rows, span_rows, r0, c)
    from nrtsearch_tpu.ops.merge_scoring import DOC_SENTINEL

    docs_out[0] = jnp.where(valid, docs, DOC_SENTINEL)
    imps_out[0] = jnp.where(valid, wt * imps, 0.0)


def gather_runs_pallas(post_docs, post_impacts, offs, lens, weights, run_len: int):
    """DMA-based postings-run gather: [B, R] run tables -> padded [B, R, run]
    (docs with sentinels, weighted contribs).

    The vmapped dynamic-slice formulation lowers to an XLA gather that runs
    ~30x off bandwidth; here each (query, run, chunk) program issues one
    contiguous async copy. Caller contract: the postings arrays carry at
    least GATHER_TILE + DMA-alignment slack past the last valid entry
    (builders pad 16384); chunks beyond a run's valid length are clamped
    inside the kernel so no DMA ever reads past that slack.
    """
    B, R = offs.shape
    gt = min(GATHER_TILE, run_len)
    W = run_len // gt
    rows = gt // 128
    span_rows = rows + _DMA_ROWS
    P = post_docs.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, R, W),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, rows, 128),
                lambda b, r, w, *refs: (b * R * W + r * W + w, 0, 0),
            ),
            pl.BlockSpec(
                (1, rows, 128),
                lambda b, r, w, *refs: (b * R * W + r * W + w, 0, 0),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((span_rows, 128), jnp.int32),
            pltpu.VMEM((span_rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    docs, imps = pl.pallas_call(
        functools.partial(_gather_kernel, gt=gt),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * R * W, rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((B * R * W, rows, 128), jnp.float32),
        ],
    )(offs.astype(jnp.int32), lens.astype(jnp.int32),
      weights.astype(jnp.float32),
      post_docs.reshape(P // 128, 128), post_impacts.reshape(P // 128, 128))
    return docs.reshape(B, R, run_len), imps.reshape(B, R, run_len)


def merge_level_pallas(docs: jax.Array, contribs: jax.Array, run_len: int):
    """Merge adjacent sorted runs of length run_len (after the caller's
    bitonic reversal): stages run_len, run_len/2, ..., 1."""
    d = run_len
    while d >= TILE:
        docs, contribs = far_stage(docs, contribs, d)
        d //= 2
    if d >= 1:
        docs, contribs = near_stages(docs, contribs, d)
    return docs, contribs
