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


def _far_kernel(docs_ref, contribs_ref, docs_out, contribs_out, *,
                d: int = 0, m: int = 0):
    lo_d = docs_ref[0, 0, 0, :]
    hi_d = docs_ref[0, 0, 1, :]
    swap = lo_d > hi_d
    if m:
        # alternating-direction mode: this pair group starts at blk*2d within
        # its size-m sort block; odd m-blocks sort DESCENDING (scalar per
        # program: 2d <= m so the group never straddles m-blocks)
        blk = pl.program_id(1)
        desc = (blk * 2 * d) & m != 0
        swap = swap != desc
    docs_out[0, 0, 0, :] = jnp.where(swap, hi_d, lo_d)
    docs_out[0, 0, 1, :] = jnp.where(swap, lo_d, hi_d)
    lo_c = contribs_ref[0, 0, 0, :]
    hi_c = contribs_ref[0, 0, 1, :]
    contribs_out[0, 0, 0, :] = jnp.where(swap, hi_c, lo_c)
    contribs_out[0, 0, 1, :] = jnp.where(swap, lo_c, hi_c)


def far_stage(docs: jax.Array, contribs: jax.Array, d: int, m: int = 0):
    """One compare-exchange stage at distance d >= TILE (in-place).

    ``m``: alternating-direction sort-block size (0 = plain ascending)."""
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
        functools.partial(_far_kernel, d=d, m=m if m < N else 0),
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


def _far_pair_kernel(docs_ref, contribs_ref, docs_out, contribs_out, *,
                     d: int, m: int):
    """Two consecutive far stages (d, then d/2) in one memory pass.

    The block view [.., 4, d/2] splits each 2d compare block into quarters:
    stage d pairs (q0,q2),(q1,q3); stage d/2 pairs (q0,q1),(q2,q3) — all
    elementwise between loaded quarters, so both stages run on one load."""
    if m:
        blk = pl.program_id(1)
        desc = ((blk * 2 * d) & m) != 0
    ds = [docs_ref[0, 0, i, :] for i in range(4)]
    cs = [contribs_ref[0, 0, i, :] for i in range(4)]

    def ce(a: int, b: int):
        swap = ds[a] > ds[b]
        if m:
            swap = swap != desc
        ds[a], ds[b] = (jnp.where(swap, ds[b], ds[a]),
                        jnp.where(swap, ds[a], ds[b]))
        cs[a], cs[b] = (jnp.where(swap, cs[b], cs[a]),
                        jnp.where(swap, cs[a], cs[b]))

    ce(0, 2); ce(1, 3)   # stage d
    ce(0, 1); ce(2, 3)   # stage d/2
    for i in range(4):
        docs_out[0, 0, i, :] = ds[i]
        contribs_out[0, 0, i, :] = cs[i]


def far_pair_stage(docs: jax.Array, contribs: jax.Array, d: int, m: int = 0):
    """Fused far stages d and d/2 (requires d/2 >= TILE), in place.

    Chunks at TILE/2 per quarter: the (4, chunk) block is double-buffered by
    the pipeline, so a full-TILE chunk (4 x 512KB x 2 arrays x 2 buffers)
    blows the 16MB scoped-VMEM budget."""
    B, N = docs.shape
    nblk = N // (2 * d)
    chunk = TILE // 2
    sub = (d // 2) // chunk
    docs_v = docs.reshape(B, nblk, 4, d // 2)
    contribs_v = contribs.reshape(B, nblk, 4, d // 2)
    spec = pl.BlockSpec(
        (1, 1, 4, chunk), lambda b, blk, w: (b, blk, 0, w),
        memory_space=pltpu.VMEM,
    )
    out_docs, out_contribs = pl.pallas_call(
        functools.partial(_far_pair_kernel, d=d, m=m if m < N else 0),
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


def _near_kernel(docs_ref, contribs_ref, docs_out, contribs_out, *, d0: int,
                 m: int = 0):
    """All stages d0..1 on one (ROWS, 128) VMEM tile.

    Linear position p = row*128 + col. For d >= 128 (d multiple of 128 within
    the tile) the exchange partner is a row shift; for d < 128 a lane shift.
    Circular-wrap values are never selected (pairs live within 2d blocks).
    ``m``: alternating-direction sort-block size — positions inside an odd
    m-block compare DESCENDING (see merge_sorted_runs_alt)."""
    docs = docs_ref[0, 0]
    contribs = contribs_ref[0, 0]
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 1)
    if m:
        t = pl.program_id(1)
        pos = t * TILE + row_idx * 128 + col_idx
        desc = (pos & m) != 0
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
        if m:
            keep = keep != desc
        docs = jnp.where(keep, docs, pd)
        contribs = jnp.where(keep, contribs, pc)
        d //= 2
    docs_out[0, 0] = docs
    contribs_out[0, 0] = contribs


def near_stages(docs: jax.Array, contribs: jax.Array, d0: int, m: int = 0):
    """All stages d0 down to 1 in one VMEM pass (requires 2*d0 <= TILE)."""
    B, N = docs.shape
    docs_v = docs.reshape(B, N // TILE, _ROWS, 128)
    contribs_v = contribs.reshape(B, N // TILE, _ROWS, 128)
    spec = pl.BlockSpec(
        (1, 1, _ROWS, 128), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
    )
    out_docs, out_contribs = pl.pallas_call(
        functools.partial(_near_kernel, d0=d0, m=m if m < N else 0),
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


def _flip_tile(x, rows: int):
    """Full reverse of the flattened (rows, 128) tile: position p maps to
    rows*128-1-p. Reversal = index XOR (rows*128 - 1), decomposed into
    independent XOR-single-bit permutations, each a uniform roll pair
    (Mosaic has no rev/flip primitive)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    d = 1
    while d < 128:
        hi = (col & d) != 0
        x = jnp.where(hi, pltpu.roll(x, d, axis=1), pltpu.roll(x, 128 - d, axis=1))
        d <<= 1
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    d = 1
    while d < rows:
        hi = (row & d) != 0
        x = jnp.where(hi, pltpu.roll(x, d, axis=0), pltpu.roll(x, rows - d, axis=0))
        d <<= 1
    return x


def _gather_kernel(offs_ref, lens_ref, wts_ref, docs_hbm, imps_hbm,
                   docs_out, imps_out, d_s, i_s, sem_d, sem_i, *, gt: int,
                   n_chunks: int = 1, alternating: bool = False):
    b = pl.program_id(0)
    r = pl.program_id(1)
    w = pl.program_id(2)
    rows = gt // 128
    span_rows = rows + _DMA_ROWS
    ln = lens_ref[b, r]
    if alternating:
        # odd runs emit DESCENDING (alternating-direction bitonic merge needs
        # no reversal passes): output chunk w holds the flip of source chunk
        # n_chunks-1-w
        odd_run = (r & 1) != 0
        w_src = jnp.where(odd_run, n_chunks - 1 - w, w)
    else:
        w_src = w
    # Clamp the chunk's data offset inside the run: a chunk fully past the
    # run's valid length (w*gt >= ln, possible because runs are padded to a
    # power-of-two run_len that may exceed the builder's DMA slack) would
    # otherwise DMA up to run_len past the last posting — out of bounds.
    # Clamped chunks read in-bounds bytes that the logical-position mask
    # below discards entirely; partially-valid tail chunks are unaffected
    # (w*gt < ln keeps the true offset) and stay within the builder's
    # GATHER_TILE + alignment slack.
    off = offs_ref[b, r] + jnp.minimum(w_src * gt, jnp.maximum(ln - 1, 0))
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
        + w_src * gt
    )
    valid = (pos < ln) & (wt != 0.0)
    cd.wait()
    ci.wait()
    docs = _realign(d_s[:], rows, span_rows, r0, c)
    imps = _realign(i_s[:], rows, span_rows, r0, c)
    from nrtsearch_tpu.ops.merge_scoring import DOC_SENTINEL

    docs = jnp.where(valid, docs, DOC_SENTINEL)
    imps = jnp.where(valid, wt * imps, 0.0)
    if alternating:
        # flip of [data asc, HIGH pad] -> [HIGH pad, data desc]: valid for a
        # descending run (front padding sorts first)
        fd = _flip_tile(docs, rows)
        fi = _flip_tile(imps, rows)
        odd_i = (r & 1).astype(jnp.int32)
        docs = jnp.where(odd_i > 0, fd, docs)
        imps = jnp.where(odd_i > 0, fi, imps)
    docs_out[0] = docs
    imps_out[0] = imps


def gather_runs_pallas(post_docs, post_impacts, offs, lens, weights,
                       run_len: int, alternating: bool = False):
    """DMA-based postings-run gather: [B, R] run tables -> padded [B, R, run]
    (docs with sentinels, weighted contribs). With ``alternating``, odd runs
    come out DESCENDING, ready for merge_sorted_runs_alt.

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
        functools.partial(_gather_kernel, gt=gt, n_chunks=W,
                          alternating=alternating),
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


_FIN_HALO = 8  # rows: 1024 entries of context, >= any doc's max entries (R)


def _lin_roll_static(x, s: int, rows: int):
    """result[p] = x[(p - s) mod rows*128], static small shift."""
    sr, sc = s // 128, s % 128
    if sc == 0:
        return pltpu.roll(x, sr, axis=0) if sr else x
    xr = pltpu.roll(x, sc, axis=1)
    xr1 = pltpu.roll(xr, sr, axis=0) if sr else xr
    xr2 = pltpu.roll(xr, sr + 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    return jnp.where(lane < sc, xr2, xr1)


def _finish_kernel(nt_ref, docs_hbm, contribs_hbm, masked_out, d_s, c_s, sems,
                   *, max_seg: int, require_all: bool, nr: int):
    """Segmented per-doc sums + tail masking in ONE halo pass.

    Replaces the XLA bounded-distance scan over the merged stream (log2(R)
    shifted-add materializations) with a single read: each program loads its
    tile with an 8-row halo on both sides (a doc's entries are contiguous and
    number <= R << 1024, so the halo always covers the straddle), computes
    the same bounded-distance scan in VMEM, and writes the center tile of
    where(tail & valid & sum>0 [& count>=n_terms], sum, -inf). Window-wrap
    rolls are harmless: the stream is doc-sorted, so a wrapped value can
    never alias the same doc id within max_seg distance."""
    from nrtsearch_tpu.ops.merge_scoring import DOC_SENTINEL, DOC_SENTINEL_LOW

    b = pl.program_id(0)
    t = pl.program_id(1)
    rt = _ROWS
    span = rt + 2 * _FIN_HALO
    want = t * rt - _FIN_HALO
    row0 = jnp.clip(want, 0, nr - span)
    cp = pltpu.make_async_copy(docs_hbm.at[b, pl.ds(row0, span), :], d_s, sems.at[0])
    cp.start()
    cp2 = pltpu.make_async_copy(contribs_hbm.at[b, pl.ds(row0, span), :], c_s, sems.at[1])
    cp2.start()
    cp.wait(); cp2.wait()
    docs = d_s[...]
    contribs = c_s[...]
    valid = (docs != DOC_SENTINEL) & (docs != DOC_SENTINEL_LOW)
    seg = contribs
    if require_all:
        cnt = valid.astype(jnp.int32)
    d = 1
    while d < max_seg:
        same = docs == _lin_roll_static(docs, d, span)
        seg = seg + jnp.where(same, _lin_roll_static(seg, d, span), 0.0)
        if require_all:
            cnt = cnt + jnp.where(same, _lin_roll_static(cnt, d, span), 0)
        d <<= 1
    total = span * 128
    nxt = _lin_roll_static(docs, total - 1, span)   # docs[p + 1]
    ok = (docs != nxt) & valid & (seg > 0.0)
    if require_all:
        ok = ok & (cnt >= nt_ref[b])
    masked = jnp.where(ok, seg, -jnp.inf)
    center = t * rt - row0
    masked = pltpu.roll(masked, (span - center) % span, axis=0)
    masked_out[0] = masked[:rt, :]


def finish_mask_pallas(docs, contribs, n_terms, max_seg: int,
                       require_all: bool):
    """[B, N] merged stream -> [B, N] tail-masked per-doc scores (-inf
    elsewhere), one pass. Caller does top_k + hit count."""
    B, N = docs.shape
    nr = N // 128
    rt = _ROWS
    nt = nr // rt
    span = rt + 2 * _FIN_HALO
    docs_v = docs.reshape(B, nr, 128)
    contribs_v = contribs.reshape(B, nr, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, rt, 128), lambda b, t, *refs: (b * nt + t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((span, 128), jnp.int32),
            pltpu.VMEM((span, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    masked = pl.pallas_call(
        functools.partial(_finish_kernel, max_seg=max_seg,
                          require_all=require_all, nr=nr),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B * nt, rt, 128), jnp.float32)],
    )(n_terms.astype(jnp.int32), docs_v, contribs_v)[0]
    return masked.reshape(B, N)


def merge_sorted_runs_alt(docs: jax.Array, contribs: jax.Array):
    """Alternating-direction bitonic merge: [B, R, L] runs (even runs
    ASCENDING, odd runs DESCENDING — gather_runs_pallas(alternating=True))
    -> fully sorted ascending [B, R*L].

    Each level's input blocks alternate sort direction, so every
    adjacent-block pair is already bitonic — the per-level run REVERSAL pass
    of the plain formulation (an XLA stack materialization per level, the
    dominant merge cost at bench shapes) disappears entirely. Direction is a
    compare-inversion mask derived from the position's sort-block bit, free
    inside the existing far/near kernels. Level m's output blocks (size m)
    again alternate by block parity; the final level (m = N) is ascending."""
    B, R, L = docs.shape
    N = R * L
    docs = docs.reshape(B, N)
    contribs = contribs.reshape(B, N)
    m = 2 * L
    while m <= N:
        d = m // 2
        while d >= TILE:
            if d // 2 >= TILE:
                docs, contribs = far_pair_stage(docs, contribs, d, m)
                d //= 4
            else:
                docs, contribs = far_stage(docs, contribs, d, m)
                d //= 2
        if d >= 1:
            docs, contribs = near_stages(docs, contribs, d, m)
        m *= 2
    return docs, contribs
