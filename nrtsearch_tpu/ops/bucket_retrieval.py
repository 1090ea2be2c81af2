"""Bucket-local fused BM25 retrieval: the round-3 flagship kernel.

Round-2 profiling showed the scatter-free merge pipeline spending ~60% of
device time in cross-tile bitonic passes over HBM (10+ full-array sweeps at
~13% bandwidth) plus a ~2x pow2 width tax. This module removes both by
making the merge BUCKET-LOCAL:

- At refresh, doc space is partitioned into fixed buckets of ``bucket_docs``
  (power of two, <= 32768 so bucket-local ids fit 15 bits). For every term
  run (doc-sorted, contiguous) the per-bucket split offsets are precomputed
  with one vectorized histogram+cumsum — the TPU analogue of Lucene's skip
  data (reference: lucene Lucene90SkipReader via MyIndexSearcher's
  BulkScorer hot loop, SURVEY §3.3): instead of skipping, the offsets let
  every (query, bucket) pair gather exactly its slice of postings.
- Query time runs TWO Pallas kernels over a [B, m_buckets] grid:
    1. gather+pack: each program DMAs its T term slices back-to-back into a
       VMEM tile and packs each posting into ONE int32 key
       ``(local_doc << 16) | quantized_contrib`` — contributions are
       quantized to a per-query 15-bit scale exactly like Lucene quantizes
       norms/impacts into SmallFloat bytes (reference:
       server/field BM25 norms; lucene SmallFloat), so a posting costs 4
       bytes of traffic from here on.
    2. sort+finish: a full bitonic sort of the tile IN VMEM (keys sort by
       doc id; equal docs group adjacent), a bounded-distance segmented sum
       of the 15-bit contributions (a doc appears at most once per term),
       and a tail mask emitting quantized score keys plus global doc ids —
       one read + two writes of the array, zero cross-tile traffic,
       duplicate combination never leaves VMEM.
- Top-k runs on the int32 score keys with the same hierarchical row-max
  thresholding as the f32 path. Ties break to the LOWER doc id (Lucene's
  docid-ascending tie-break) for free: flat position ascends with the
  global doc id (buckets ascend, docs ascend inside a sorted tile) and
  ``lax.top_k`` prefers the lower index on equal keys. Scores dequantize
  on the way out.

Exactness contract: top-k docs and hit counts are exact over the quantized
scores (15 bits of resolution on the query's maximum possible score — finer
than Lucene's 8-bit norm quantization); A/B against the f32 merge path the
top-k sets agree except where f32 scores tie within one quantum.

The pure-XLA/interpret path (``interpret=True``) runs the identical kernels
on CPU for tests.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32_SENT = np.int32(2**31 - 1)     # pre-sort padding: sorts last
I32_MIN = np.int32(-(2**31))       # post-mask invalid: never tops
_DMA_ROWS = 8                      # (8, 128) f32/i32 DMA alignment
QMAX = 32000                       # 15-bit contribution quantization ceiling


# ---------------------------------------------------------------------------
# Refresh-time index
# ---------------------------------------------------------------------------


@dataclass
class BucketIndex:
    """Per-term bucket split offsets + impact bounds over packed postings."""

    bucket_bits: int               # bucket_docs = 1 << bucket_bits
    n_buckets: int
    bounds: np.ndarray             # int32 [vocab, m+1] term-relative offsets
    max_impact: np.ndarray         # float32 [vocab] per-term impact bound

    # NOTE: per-(term,bucket) block maxima were built here through round 4
    # but consumed by no query-time code; rank-cut pruning measured strictly
    # slower at Zipf top-100 across three rounds (PERF_CEILING.md), so the
    # metadata was deleted rather than kept as dead refresh-time cost
    # (VERDICT r4 ask #8).

    @classmethod
    def build(
        cls,
        post_docs: np.ndarray,     # int32 [P] doc ids, term-major, doc-sorted
        post_impacts: np.ndarray,  # float32 [P] impacts (0 for deleted)
        term_offsets: np.ndarray,  # int64 [V]
        term_lengths: np.ndarray,  # int32 [V]
        capacity: int,             # padded doc-space size (power of two)
        bucket_docs: int = 16384,
    ) -> "BucketIndex":
        assert bucket_docs & (bucket_docs - 1) == 0 and bucket_docs <= 32768
        bits = int(bucket_docs).bit_length() - 1
        m = max(1, -(-capacity // bucket_docs))
        V = len(term_lengths)
        P = int(term_offsets[-1] + term_lengths[-1]) if V else 0
        P = max(P, int((term_offsets + term_lengths).max()) if V else 0)
        term_of = np.repeat(
            np.arange(V, dtype=np.int64), np.asarray(term_lengths, np.int64)
        )
        docs = post_docs[: len(term_of)]
        g = docs.astype(np.int64) >> bits
        counts = np.zeros((V, m), np.int32)
        np.add.at(counts, (term_of, g), 1)
        bounds = np.zeros((V, m + 1), np.int32)
        np.cumsum(counts, axis=1, out=bounds[:, 1:])
        max_impact = np.zeros(V, np.float32)
        imps = post_impacts[: len(term_of)]
        np.maximum.at(max_impact, term_of, imps)
        return cls(bits, m, bounds, max_impact)


# ---------------------------------------------------------------------------
# Query planning
# ---------------------------------------------------------------------------


@dataclass
class BucketPlan:
    """Host-compiled tables for one batch (all arrays ride scalar prefetch)."""

    term_offs: np.ndarray    # int32 [B, T] absolute run starts
    bounds: np.ndarray       # int32 [B, T, m+1] term-relative bucket offsets
    weights: np.ndarray      # float32 [B, T] idf*boost*scale (0 = unused)
    n_terms: np.ndarray      # int32 [B]
    scales: np.ndarray       # float32 [B] score quantization scales
    caps: tuple              # static per-slot DMA capacities (elements)
    tile: int                # static per-bucket tile width (pow2)
    shape_key: tuple         # (T, caps, tile, m) — program cache key


def _pow2(n: int, minimum: int = 1) -> int:
    b = minimum
    while b < n:
        b <<= 1
    return b


def plan_bucket_batch(
    idx: BucketIndex,
    queries: list[list[tuple[int, float]]],  # per query [(term_id, weight)]
    term_offsets: np.ndarray,
    *,
    max_terms: int = 8,
    force_caps: tuple = (),
    force_tile: int = 0,
) -> BucketPlan:
    """Queries -> prefetch tables + static shape (caps per slot, tile width).

    Slots are ordered by descending slice mass so static DMA capacities decay
    (slot 0 carries the heavy term); duplicate term ids merge their weights.
    """
    B = len(queries)
    T = max_terms
    m = idx.n_buckets
    term_offs = np.zeros((B, T), np.int32)
    bounds = np.zeros((B, T, m + 1), np.int32)
    weights = np.zeros((B, T), np.float32)
    n_terms = np.zeros(B, np.int32)
    scales = np.ones(B, np.float32)
    for qi, entries in enumerate(queries):
        merged: dict[int, float] = {}
        for tid, w in entries:
            if w != 0.0:
                merged[tid] = merged.get(tid, 0.0) + w
        ents = sorted(
            merged.items(),
            key=lambda kv: -(idx.bounds[kv[0], -1]),
        )[:T]
        n_terms[qi] = len(ents)
        smax = sum(w * float(idx.max_impact[t]) for t, w in ents)
        scale = QMAX / smax if smax > 0 else 1.0
        scales[qi] = scale
        for ti, (tid, w) in enumerate(ents):
            term_offs[qi, ti] = int(term_offsets[tid])
            bounds[qi, ti] = idx.bounds[tid]
            weights[qi, ti] = w * scale

    lens = bounds[:, :, 1:] - bounds[:, :, :-1]      # [B, T, m]
    per_slot = lens.max(axis=(0, 2)) if lens.size else np.zeros(T, np.int64)
    if force_caps:
        # frozen steady-state shapes must actually fit this batch: the
        # gather kernel's DMA ring and take-mask assume ln <= cap and
        # sum(ln) <= tile — overflow would silently corrupt postings
        for t in range(min(T, len(force_caps))):
            if int(per_slot[t]) > int(force_caps[t]):
                raise ValueError(
                    f"bucket plan overflow: slot {t} slice {int(per_slot[t])}"
                    f" > frozen cap {int(force_caps[t])}"
                )
        caps = force_caps
    else:
        caps = tuple(
            max(_DMA_ROWS * 128, -(-int(c) // 1024) * 1024) for c in per_slot
        )
    max_sum = int(lens.sum(axis=1).max()) if lens.size else 0
    if force_tile and max_sum > force_tile:
        raise ValueError(
            f"bucket plan overflow: bucket sum {max_sum} > frozen tile "
            f"{force_tile}"
        )
    tile = force_tile or _pow2(max_sum, _DMA_ROWS * 128)
    return BucketPlan(
        term_offs, bounds, weights, n_terms, scales, caps, tile,
        (T, caps, tile, m),
    )


# ---------------------------------------------------------------------------
# Kernel 1: gather + place + pack
# ---------------------------------------------------------------------------


def _dyn_roll(x, s, rows: int):
    """Circular roll of the flattened (rows, 128) buffer by a TRACED element
    count s (result[p] = x[(p - s) mod rows*128])."""
    sr = s // 128
    sc = s % 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    xr = pltpu.roll(x, sc, axis=1)
    xr1 = pltpu.roll(xr, sr, axis=0)
    xr2 = pltpu.roll(xr, sr + 1, axis=0)
    return jnp.where(lane < sc, xr2, xr1)


def _gather_pack_kernel(
    toffs_ref, bounds_ref, wts_ref, docs_hbm, imps_hbm, keys_out,
    *scratch, T: int, caps: tuple, tile: int, bucket_bits: int,
):
    q = pl.program_id(0)
    bkt = pl.program_id(1)
    rows = tile // 128
    d_bufs = scratch[:T]
    i_bufs = scratch[T : 2 * T]
    sems = scratch[2 * T]
    copies = []
    for t in range(T):
        span_rows = caps[t] // 128 + _DMA_ROWS
        rel0 = bounds_ref[q, t, bkt]
        off = toffs_ref[q, t] + rel0
        row0 = pl.multiple_of((off // (128 * _DMA_ROWS)) * _DMA_ROWS, _DMA_ROWS)
        cd = pltpu.make_async_copy(
            docs_hbm.at[pl.ds(row0, span_rows), :], d_bufs[t], sems.at[2 * t]
        )
        cd.start()
        ci = pltpu.make_async_copy(
            imps_hbm.at[pl.ds(row0, span_rows), :], i_bufs[t], sems.at[2 * t + 1]
        )
        ci.start()
        copies.append((cd, ci, off, row0))

    keys = jnp.full((rows, 128), I32_SENT, jnp.int32)
    pos = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    )
    dest = jnp.int32(0)
    base = (bkt << bucket_bits).astype(jnp.int32)
    for t in range(T):
        cd, ci, off, row0 = copies[t]
        span_rows = caps[t] // 128 + _DMA_ROWS
        ln = bounds_ref[q, t, bkt + 1] - bounds_ref[q, t, bkt]
        wt = wts_ref[q, t]
        cd.wait()
        ci.wait()
        # pack the slice in ITS OWN buffer space first (cheap, small rows),
        # then one dynamic roll moves it to [dest, dest+ln) in tile space
        docs = d_bufs[t][...]
        imps = i_bufs[t][...]
        local = (docs - base) & ((1 << bucket_bits) - 1)
        quant = jnp.clip(
            (wt * imps + 0.5).astype(jnp.int32), 1, QMAX
        )
        pk = jnp.where(imps > 0.0, (local << 16) | quant, I32_SENT)
        # roll in BUFFER space (pad up to tile rows first if smaller): tile
        # position dest + j must read buffer position (off - row0*128) + j;
        # the buffer's ring always covers the slice because
        # (off - row0*128) + ln <= span (alignment shift < 1024, ln <= cap)
        roll_rows = max(span_rows, rows)
        if span_rows < roll_rows:
            pk = jnp.concatenate(
                [pk, jnp.full((roll_rows - span_rows, 128), I32_SENT, jnp.int32)],
                axis=0,
            )
        shift = jnp.mod(dest - (off - row0 * 128), roll_rows * 128)
        placed = _dyn_roll(pk, shift, roll_rows)[:rows, :]
        take = (pos >= dest) & (pos < dest + ln) & (wt != 0.0)
        keys = jnp.where(take, placed, keys)
        dest = dest + jnp.where(wt != 0.0, ln, 0)
    keys_out[0] = keys


def gather_pack_pallas(
    post_docs, post_impacts, plan_dev, *, T: int, caps: tuple, tile: int,
    bucket_bits: int, m: int, interpret: bool = False,
):
    """[B, m] grid gather: packed (doc16|contrib16) key tiles [B*m, rows, 128].

    Caller contract (same as gather_runs_pallas): the postings arrays carry
    >= max(caps) + alignment slack past the last valid entry.
    """
    toffs, bounds, wts = plan_dev
    B = toffs.shape[0]
    rows = tile // 128
    P = post_docs.shape[0]
    scratch = (
        [pltpu.VMEM((caps[t] // 128 + _DMA_ROWS, 128), jnp.int32) for t in range(T)]
        + [pltpu.VMEM((caps[t] // 128 + _DMA_ROWS, 128), jnp.float32) for t in range(T)]
        + [pltpu.SemaphoreType.DMA((2 * T,))]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, m),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, 128), lambda q, b, *refs: (q * m + b, 0, 0)),
        ],
        scratch_shapes=scratch,
    )
    keys = pl.pallas_call(
        functools.partial(
            _gather_pack_kernel, T=T, caps=caps, tile=tile,
            bucket_bits=bucket_bits,
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B * m, rows, 128), jnp.int32)],
        interpret=interpret,
    )(toffs, bounds, wts,
      post_docs.reshape(P // 128, 128), post_impacts.reshape(P // 128, 128))[0]
    return keys


# ---------------------------------------------------------------------------
# Kernel 2: in-VMEM bitonic sort + segmented sum + mask
# ---------------------------------------------------------------------------


def _sort_finish_kernel(nt_ref, keys_ref, out_ref, doc_ref, *, tile: int,
                        max_seg: int, require_all: bool, bucket_bits: int,
                        n_buckets: int = 1):
    rows = tile // 128
    keys = keys_ref[0]
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    pos = row_idx * 128 + col_idx
    # full bitonic sort ascending (keys sort by doc high bits; SENT pads last)
    mlen = 2
    while mlen <= tile:
        desc = (pos & mlen) != 0
        d = mlen // 2
        while d >= 1:
            if d >= 128:
                s = d // 128
                hi = (row_idx & s) != 0
                pk = jnp.where(
                    hi,
                    pltpu.roll(keys, s, axis=0),
                    pltpu.roll(keys, rows - s, axis=0),
                )
            else:
                hi = (col_idx & d) != 0
                pk = jnp.where(
                    hi,
                    pltpu.roll(keys, d, axis=1),
                    pltpu.roll(keys, 128 - d, axis=1),
                )
            keep = (hi & (keys >= pk)) | (~hi & (keys <= pk))
            keep = keep != desc
            keys = jnp.where(keep, keys, pk)
            d //= 2
        mlen *= 2
    # segmented sum of 15-bit contribs over equal doc ids (contiguous now)
    doc = jax.lax.shift_right_logical(keys, 16)
    valid = keys != I32_SENT
    contrib = jnp.where(valid, keys & 0xFFFF, 0)
    total = contrib
    if require_all:
        cnt = valid.astype(jnp.int32)
    d = 1
    while d < max_seg:
        pd = _lin_roll(doc, d, rows)
        pc = _lin_roll(total, d, rows)
        same = (doc == pd) & (pos >= d)
        total = total + jnp.where(same, pc, 0)
        if require_all:
            cnt = cnt + jnp.where(same, _lin_roll(cnt, d, rows), 0)
        d <<= 1
    nxt_doc = _lin_roll(doc, tile - 1, rows)      # doc[p + 1] (circular)
    tail = (doc != nxt_doc) | (pos == tile - 1)
    ok = tail & valid & (total > 0)
    if require_all:
        q = pl.program_id(0) // n_buckets
        ok = ok & (cnt >= nt_ref[q])
    # rank key = quantized score only; global doc order falls out of flat
    # position (buckets ascend, docs ascend within a sorted tile) via
    # lax.top_k's lower-index-first tie-break — Lucene's docid-ascending
    # semantics without spending key bits on the doc id.
    bkt = pl.program_id(0) % n_buckets
    out_ref[0] = jnp.where(ok, jnp.minimum(total, QMAX), I32_MIN)
    doc_ref[0] = (bkt << bucket_bits) | (doc & ((1 << bucket_bits) - 1))


def _lin_roll(x, s: int, rows: int):
    """result[p] = x[(p - s) mod rows*128], static small shift."""
    sr, sc = s // 128, s % 128
    if sc == 0:
        return pltpu.roll(x, sr, axis=0) if sr else x
    xr = pltpu.roll(x, sc, axis=1)
    xr1 = pltpu.roll(xr, sr, axis=0) if sr else xr
    xr2 = pltpu.roll(xr, sr + 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    return jnp.where(lane < sc, xr2, xr1)


def sort_finish_pallas(keys, n_terms, *, tile: int, max_seg: int,
                       require_all: bool, bucket_bits: int, n_buckets: int,
                       interpret: bool = False):
    """[B*m, rows, 128] packed tiles -> (score keys, global doc ids)."""
    nbm, rows, _ = keys.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbm,),
        in_specs=[pl.BlockSpec((1, rows, 128), lambda i, *refs: (i, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, rows, 128), lambda i, *refs: (i, 0, 0)),
            pl.BlockSpec((1, rows, 128), lambda i, *refs: (i, 0, 0)),
        ],
    )
    rank, docs = pl.pallas_call(
        functools.partial(
            _sort_finish_kernel, tile=tile, max_seg=max_seg,
            require_all=require_all, bucket_bits=bucket_bits,
            n_buckets=n_buckets,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(keys.shape, jnp.int32),
            jax.ShapeDtypeStruct(keys.shape, jnp.int32),
        ],
        interpret=interpret,
    )(n_terms.astype(jnp.int32), keys)
    return rank, docs


# ---------------------------------------------------------------------------
# Top-k over int32 ranking keys + dispatch wrapper
# ---------------------------------------------------------------------------


def _hierarchical_topk_i32(masked, k: int):
    """Exact top-k over int32 ranking keys (row-max thresholding — the i32
    twin of merge_scoring._hierarchical_topk)."""
    B, N = masked.shape
    nr = N // 128
    r_take = 256
    while r_take < 2 * k:
        r_take <<= 1
    if nr < 2 * r_take or N % 128:
        return jax.lax.top_k(masked, k)
    m3 = masked.reshape(B, nr, 128)
    row_max = jnp.max(m3, axis=-1)
    rm_top, rm_idx = jax.lax.top_k(row_max, r_take)
    tau = rm_top[:, k - 1 : k]
    safe = jnp.all(
        jnp.sum((row_max >= tau).astype(jnp.int32), axis=-1) <= r_take
    ) & jnp.all(tau > I32_MIN)
    rows_sorted = jnp.sort(rm_idx, axis=-1)

    def hier(_):
        cand = jnp.take_along_axis(m3, rows_sorted[..., None], axis=1)
        cs, ci = jax.lax.top_k(cand.reshape(B, r_take * 128), k)
        row = jnp.take_along_axis(rows_sorted, ci // 128, axis=1)
        return (cs, row * 128 + ci % 128)

    def full(_):
        vs, idx = jax.lax.top_k(masked, k)
        return (vs, idx)

    return jax.lax.cond(safe, hier, full, None)


@functools.partial(
    jax.jit,
    static_argnames=(
        "T", "caps", "tile", "bucket_bits", "m", "k", "require_all",
        "interpret",
    ),
)
def bucket_search_topk(
    post_docs, post_impacts, toffs, bounds, wts, n_terms,
    *, T: int, caps: tuple, tile: int, bucket_bits: int, m: int, k: int,
    require_all: bool = False, interpret: bool = False,
):
    """Fused bucket-local retrieval. Returns (rank_keys [B,k], doc ids
    [B,k], hits [B]): rank_keys are quantized score sums (dequantize with
    the plan's per-query scale). I32_MIN keys mark empty result slots."""
    keys = gather_pack_pallas(
        post_docs, post_impacts, (toffs, bounds, wts),
        T=T, caps=caps, tile=tile, bucket_bits=bucket_bits, m=m,
        interpret=interpret,
    )
    ranked, docs = sort_finish_pallas(
        keys, n_terms, tile=tile, max_seg=T, require_all=require_all,
        bucket_bits=bucket_bits, n_buckets=m, interpret=interpret,
    )
    B = toffs.shape[0]
    flat = ranked.reshape(B, m * tile)
    hits = jnp.sum((flat != I32_MIN).astype(jnp.int32), axis=-1)
    top_keys, top_pos = _hierarchical_topk_i32(flat, k)
    top_docs = jnp.take_along_axis(docs.reshape(B, m * tile), top_pos, axis=1)
    return top_keys, top_docs, hits


def decode_topk(top_keys, top_docs, scales):
    """Score keys + doc ids -> (scores f32 [B,k], doc ids i32 [B,k]).
    Empty slots (key == I32_MIN) come back as (-inf, -1)."""
    top_keys = np.asarray(top_keys)
    top_docs = np.asarray(top_docs)
    valid = top_keys != I32_MIN
    scores = top_keys.astype(np.float32) / scales[:, None]
    return (
        np.where(valid, scores, -np.inf).astype(np.float32),
        np.where(valid, top_docs, -1).astype(np.int32),
    )


# ---------------------------------------------------------------------------
# Reference implementation (numpy, bit-exact semantics) for tests
# ---------------------------------------------------------------------------


def reference_bucket_search(
    post_docs, post_impacts, idx: BucketIndex, plan: BucketPlan, k: int,
    *, require_all: bool = False,
):
    """Same quantized algorithm in numpy: per query, gather each term's
    postings, quantize contributions with the plan's folded scale+weight,
    sum per doc, rank by (quantized sum, -doc)."""
    post_docs = np.asarray(post_docs)
    post_impacts = np.asarray(post_impacts)
    B, T = plan.term_offs.shape
    out_scores = np.full((B, k), -np.inf, np.float32)
    out_docs = np.full((B, k), -1, np.int32)
    hits = np.zeros(B, np.int64)
    for qi in range(B):
        acc: dict[int, int] = {}
        cnt: dict[int, int] = {}
        for ti in range(T):
            w = plan.weights[qi, ti]
            if w == 0.0:
                continue
            off = int(plan.term_offs[qi, ti])
            ln = int(plan.bounds[qi, ti, -1])
            docs = post_docs[off : off + ln]
            imps = post_impacts[off : off + ln]
            live = imps > 0.0
            quant = np.clip((w * imps + 0.5).astype(np.int64), 1, QMAX)
            for d, qv, lv in zip(docs, quant, live):
                if not lv:
                    continue
                acc[d] = acc.get(d, 0) + int(qv)
                cnt[d] = cnt.get(d, 0) + 1
        items = [
            (min(s, QMAX), d)
            for d, s in acc.items()
            if s > 0 and (not require_all or cnt[d] >= plan.n_terms[qi])
        ]
        hits[qi] = len(items)
        items.sort(key=lambda sd: (-sd[0], sd[1]))
        for j, (s, d) in enumerate(items[:k]):
            out_scores[qi, j] = s / plan.scales[qi]
            out_docs[qi, j] = d
    return out_scores, out_docs, hits
