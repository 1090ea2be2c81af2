"""Round-5 fused dense-head retrieval: compact rows + slice-gather combine.

The round-4 dense path (ops/dense_head.dense_merge_topk) left three costs on
the table, measured on v5e (benchmarks/profile_dense_stages.py,
PERF_CEILING.md round 5):

1. **Full-H matmul**: every batch streamed ALL Hp=1024 head rows (2 GB HBM,
   ~3.7 ms) even though a batch uses <= B x max_terms distinct rows
   (typically 64-128). XLA's row gather was measured hopeless (~24 GB/s) so
   round 4 streamed everything; round 5 gathers the batch's rows with a
   `lax.scan` of full-row `dynamic_slice`s — contiguous 2 MB DMAs that run
   at HBM speed — into a COMPACT [U, D] operand, cutting head-scan bytes by
   Hp/U (~8-16x).
2. **Element-gather combine**: the exact combine gathered S at every tail
   position (take_along_axis on [B, D], ~13 ns/ELEMENT — ~5 ms/batch at
   bench shapes, the single largest stage). Replaced by a SLICE gather:
   read S in 128-lane blocks (S3[b, doc >> 7, :], a [*, 128]-slice gather
   XLA executes at near-bandwidth) and select the lane with a one-hot
   multiply — pure vector work, no per-element addressing.
3. **Theta/window machinery**: with the combine now ~free, the candidate
   window + escalation lax.cond of round 4 (which measured engaged on 0.2%
   of bench docs — the full branch WAS the common case) is deleted. This
   path is ALWAYS exact on docs, scores, and hit counts: no
   GREATER_THAN_OR_EQUAL_TO relation, no pruned lower bounds.

The same slice-gather trick extends the dense path to the general query
shapes round 4 excluded (VERDICT r4 ask #2): a filter is a [D] mask ANDed
into the match test (head side: one vector op; tail side: one more slice
gather); additive score columns and doc-value sort keys are more [D]
vectors riding the same gathers; all-head-terms conjunctions reuse the
scan's second matmul (an indicator dot that counts matched terms per doc).

Score contract: identical to dense_merge_topk — query weights and head
impacts quantize through bf16 (MXU operands; f32 accumulation), the tail is
exact f32, ties break (score desc, docid asc) per Lucene's contract
(TopScoreDocCollector; reference server/search/MyIndexSearcher.java:79 is
the hot loop this path replaces).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nrtsearch_tpu.ops.dense_head import (
    NEG_INF,
    _combine_topk_docid,
    _searchsorted_rows,
    _topk_docid,
)
from nrtsearch_tpu.ops.merge_scoring import (
    DOC_SENTINEL,
    DOC_SENTINEL_LOW,
    _hierarchical_topk,
    merge_sorted_runs,
    segmented_scores,
)


def _gather_rows_scan(rows, idx):
    """Row gather via scan + full-row dynamic_slice (one contiguous DMA per
    row). Measured ~41-46 GB/s on v5e (benchmarks/probe_fused.py) — better
    than XLA's generic gather (~24 GB/s) but well off stream speed; the
    CPU-rig fallback."""

    def body(_, i):
        return None, jax.lax.dynamic_slice(rows, (i, 0), (1, rows.shape[1]))

    _, out = jax.lax.scan(body, None, idx)
    return out.reshape(idx.shape[0], rows.shape[1])


def _gather_rows_pallas(rows, idx):
    """Row gather as a Pallas copy kernel: rows viewed [Hp, nr, 128], one
    (1, C, 128) block per grid step with the source row index scalar-
    prefetched — contiguous block DMAs at HBM stream speed. TPU tiling
    requires the middle (sublane) block dim be a multiple of 8."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Hp, D = rows.shape
    nr = D // 128
    U = idx.shape[0]
    C = min(4096, (nr // 8) * 8)
    if C == 0:
        return _gather_rows_scan(rows, idx)
    rows3 = rows.reshape(Hp, nr, 128)

    def kern(idx_ref, rows_ref, out_ref):
        out_ref[:] = rows_ref[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(U, pl.cdiv(nr, C)),
        in_specs=[
            pl.BlockSpec((1, C, 128), lambda i, j, idx_ref: (idx_ref[i], j, 0)),
        ],
        out_specs=pl.BlockSpec((1, C, 128), lambda i, j, idx_ref: (i, j, 0)),
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((U, nr, 128), rows.dtype),
        grid_spec=grid_spec,
    )(idx, rows3)
    return out.reshape(U, D)


def gather_rows(rows, idx):
    """Compact row gather: rows[idx] at stream speed. Pad slots in ``idx``
    may repeat row 0; their weights are zero. Pallas block-copy on TPU,
    scan of full-row dynamic_slices elsewhere."""
    if jax.default_backend() == "tpu" and rows.shape[1] % 128 == 0:
        return _gather_rows_pallas(rows, idx)
    return _gather_rows_scan(rows, idx)


def _ffill_last(vals, is_valid):
    """Forward-fill the last valid value along the trailing axis (an
    associative take-last scan — log passes of pure vector ops)."""

    def comb(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, av), af | bf

    v, _ = jax.lax.associative_scan(comb, (vals, is_valid), axis=-1)
    return v


def _annotated_tail(docs, tail_sum, live, bmax):
    """Merge-join the per-128-doc-block head maxima into the (docid-sorted)
    tail stream WITHOUT gathers (XLA gather measured ~40 GB/s on v5e for
    every formulation, benchmarks/probe_fused.py — the TPU-native join of a
    sorted stream against a doc-space table is a bitonic merge + forward
    fill, all vector ops):

    - entries key as doc*2+1, block markers as (g*128)*2 (so a marker sorts
      immediately before its block's entries); dead entries carry -inf sums
      and can never be selected;
    - one bitonic merge of the two sorted runs, then a take-last scan fills
      each position with its block's head max.

    Returns (keys [B, W], sums [B, W], bfill [B, W]) over the merged width:
    ``keys & 1`` marks entries (doc = key >> 1), ``sums`` their exact tail
    sums, ``bfill`` the head block max governing them (<= 0 means every doc
    in the block has zero head score — exact knowledge for hit counts)."""
    B, N = docs.shape
    nr = bmax.shape[1]
    L = _pow2(max(N, nr))
    dclip = jnp.clip(docs, -(2**29), 2**29)
    ekey = (dclip * 2 + 1).astype(jnp.int32)
    ekey = jnp.where(docs >= DOC_SENTINEL, jnp.int32(2**31 - 1), ekey)
    esum = jnp.where(live, tail_sum, NEG_INF)
    mkey = jnp.broadcast_to(
        (jnp.arange(nr, dtype=jnp.int32) * 256)[None, :], (B, nr)
    )

    def pad(x, fill):
        return jnp.pad(
            x, ((0, 0), (0, L - x.shape[1])), constant_values=fill
        )

    keys = jnp.stack(
        [pad(ekey, 2**31 - 1), pad(mkey, 2**31 - 1)], axis=1
    )                                                     # [B, 2, L]
    sums = jnp.stack([pad(esum, NEG_INF), jnp.full((B, L), NEG_INF)], axis=1)
    bvals = jnp.stack([jnp.full((B, L), NEG_INF), pad(bmax, NEG_INF)], axis=1)
    keys, sums, bvals = merge_sorted_runs(keys, sums, bvals)
    is_marker = (keys & 1) == 0
    bfill = _ffill_last(jnp.where(is_marker, bvals, NEG_INF), is_marker)
    return keys, sums, bfill


def _pow2(n: int, minimum: int = 1) -> int:
    b = minimum
    while b < n:
        b <<= 1
    return b


def _gather_at_docs(col3, docs, nr):
    """Values of a [D] column at tail-stream positions, by 128-lane slices.

    ``col3`` is the column reshaped [..., nr, 128]; ``docs`` [B, N] may
    contain sentinels (clipped — callers mask with ``live``). Returns
    [B, N] gathered values. One [*, 128]-slice gather + a one-hot lane
    select: ~bandwidth, vs ~13 ns/element for a flat take_along_axis."""
    blk = jnp.clip(docs >> 7, 0, nr - 1)
    if col3.ndim == 2:  # shared column [nr, 128] -> broadcast over batch
        g = col3[blk]                               # [B, N, 128]
    else:               # per-batch [B, nr, 128]
        g = jnp.take_along_axis(col3, blk[..., None], axis=1)
    lane = (docs & 127)[..., None]
    onehot = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2) == lane
    return jnp.sum(jnp.where(onehot, g, 0), axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "has_head", "has_tail", "run_len", "require_all",
        "sort_ascending", "use_pallas", "prune", "exact_counts",
    ),
)
def dense_fused_topk(
    rows,             # bf16 [Hp, D] resident head impact rows
    post_docs,        # int32 [P] packed postings
    post_impacts,     # float32 [P]
    W,                # f32 [B, U] compact head weight matrix
    row_idx,          # int32 [U] head rows used by this batch (pad: 0)
    n_req,            # int32 [B] required distinct terms (AND mode)
    run_offs,         # int32 [B, R] tail run tables
    run_lens,         # int32 [B, R]
    run_weights,      # f32 [B, R]
    filt=None,        # optional bool/int8 [D]: docs failing it match nothing
    additive=None,    # optional f32 [D]: added to matched docs' scores
    sort_keys=None,   # optional f32 [D]: rank matched docs by this key
    rows_lo=None,     # optional bf16 [Hp, D] residual rows: when present the
                      # head matmul runs the Dekker-style 3-product correction
                      # (W_hi·R_hi + W_hi·R_lo + W_lo·R_hi, f32 accumulation)
                      # and head scores are ~f32-exact (rel err ~2^-17)
    *,
    k: int,
    has_head: bool,
    has_tail: bool,
    run_len: int,
    require_all: bool = False,
    sort_ascending: bool = True,
    use_pallas: bool = False,
    prune: bool = True,
    exact_counts: bool = False,
):
    """Fused dense retrieval: exact docs and scores for every variant.

    Returns one packed int32 array [B, 2k+2]: scores (f32 bitcast) | docs |
    hits | counts_exact flag. Decode with ``ops.dense_head.decode_packed2``.

    Combine strategy (plain OR queries, ``prune=True``): random access is
    the one thing TPUs can't do fast (every XLA gather formulation measured
    ~40 GB/s, benchmarks/probe_fused.py), so instead of gathering head
    scores at every tail position, a gather-free sorted merge-join
    (_annotated_tail) bounds every tail entry by ITS OWN 128-doc block's
    head maximum — far tighter than round 4's global bound — selects a
    top-M candidate window by that bound, gathers exact head scores for
    just those M (a small, cheap gather), and certifies: when the (M+1)-th
    bound falls below the k-th candidate score, no unselected entry can
    reach the top-k and the result is EXACT on docs/scores (hit counts may
    be lower bounds — the Lucene WAND relation; ``exact_counts=True``
    forces the exact branch). A lax.cond escalates to the full slice-gather
    combine when the certificate fails. This is the TPU re-expression of
    BlockMaxWAND's per-block competitive pruning (reference:
    MyIndexSearcher.java:79; Lucene impacts) — the block max rides a
    bitonic merge instead of a skip list.

    Filters, additive columns, sorts, and conjunctions take the exact path
    (sort/filter ranks are not score-shaped; ``require_all`` demands
    has_tail=False — the caller routes conjunctions with tail terms to the
    merge path).
    """
    B = W.shape[0]
    D = rows.shape[1]
    nr = D // 128

    filt_b = None if filt is None else filt.astype(bool)

    if has_head:
        rows_used = gather_rows(rows, row_idx)      # [U, D] bf16
        mm_dt = (
            jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        )

        def mm(a, b):
            return jax.lax.dot_general(
                a.astype(mm_dt), b.astype(mm_dt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # W always quantizes through bf16 (the dense score contract); the
        # f32 CPU dot of the upcast values accumulates identically to the
        # TPU MXU's f32 accumulation
        W_hi = W.astype(jnp.bfloat16)
        S = mm(W_hi, rows_used)                     # [B, D] f32
        if rows_lo is not None:
            # Dekker-style correction: two extra compact matmuls recover
            # the bf16 quantization of both operands (error ~|W_lo·R_lo|,
            # rel ~2^-18) — head scores become f32-grade without giving up
            # the MXU (bandwidth cost: one more [U, D] stream)
            lo_used = gather_rows(rows_lo, row_idx)
            W_lo = (W - W_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            S = S + mm(W_hi, lo_used) + mm(W_lo, rows_used)
        matched = S > 0.0
        if require_all:
            ind = (rows_used > 0).astype(mm_dt)
            Wind = (W != 0.0).astype(mm_dt)
            C = jax.lax.dot_general(
                Wind, ind, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            matched = matched & (C >= n_req[:, None].astype(jnp.float32))
        if filt_b is not None:
            matched = matched & filt_b[None, :]
        base = S if additive is None else S + additive[None, :]
        if sort_keys is not None:
            skey = -sort_keys if sort_ascending else sort_keys
            rank = jnp.broadcast_to(skey[None, :], (B, D))
        else:
            rank = base
        masked = jnp.where(matched, rank, NEG_INF)
        head_s, head_d = _hierarchical_topk(masked, k)
        head_hits = jnp.sum(matched, axis=-1, dtype=jnp.int32)
        # per-128-doc-block maxima of the masked head scores (the pruned
        # combine's per-entry bound; CSE dedupes this against the identical
        # reduce inside _hierarchical_topk)
        bmax = jnp.max(masked.reshape(B, nr, 128), axis=-1)
    else:
        S = None
        bmax = None
        head_s = jnp.full((B, k), NEG_INF, jnp.float32)
        head_d = jnp.zeros((B, k), jnp.int32)
        head_hits = jnp.zeros((B,), jnp.int32)

    if not has_tail:
        if sort_keys is not None and sort_ascending:
            head_s = jnp.where(head_s > NEG_INF, -head_s, head_s)
        fd = jnp.where(head_s == NEG_INF, -1, head_d)
        return jnp.concatenate(
            [
                jax.lax.bitcast_convert_type(head_s, jnp.int32),
                fd.astype(jnp.int32),
                head_hits[:, None].astype(jnp.int32),
                jnp.ones((B, 1), jnp.int32),
            ],
            axis=1,
        )

    # ---- tail: gather runs -> bitonic merge -> per-doc segment sums -------
    R = run_offs.shape[1]
    p_total = post_docs.shape[0]

    def gather_one(off, ln, w):
        start = jnp.minimum(off, p_total - run_len)
        shift = off - start
        docs = jax.lax.dynamic_slice(post_docs, (start,), (run_len,))
        imps = jax.lax.dynamic_slice(post_impacts, (start,), (run_len,))
        pos = jnp.arange(run_len, dtype=jnp.int32)
        in_run = (pos >= shift) & (pos < shift + ln) & (w != 0.0)
        docs = jnp.where(pos < shift, DOC_SENTINEL_LOW,
                         jnp.where(in_run, docs, DOC_SENTINEL))
        contribs = jnp.where(in_run, w * imps, 0.0)
        return docs, contribs

    docs, contribs = jax.vmap(jax.vmap(gather_one))(
        run_offs, run_lens, run_weights
    )
    docs, contribs = merge_sorted_runs(docs, contribs, use_pallas=use_pallas)
    N = docs.shape[-1]
    seg_scores, _cnt, tail_pos, valid = segmented_scores(
        docs, contribs, max_seg=R
    )
    live = tail_pos & valid & (seg_scores > 0.0)

    # head top-k entries whose doc also appears (live) in the tail stream
    # would double-count (OR scoring) or duplicate (sort): drop the head
    # copy — the complete entry reaches the top-k through the stream (under
    # the pruned certificate: any doc whose true final reaches theta has
    # bound >= final >= theta > residual, so it IS selected)
    if has_head:
        p = _searchsorted_rows(docs, head_d)
        pc = jnp.clip(p, 0, N - 1)
        dup = (
            (jnp.take_along_axis(docs, pc, axis=1) == head_d)
            & jnp.take_along_axis(live, pc, axis=1)
            & (p < N)
        )
        head_s2 = jnp.where(dup, NEG_INF, head_s)
    else:
        head_s2 = head_s

    def full(_):
        """Exact combine: head scores (+ filter/additive/sort columns) at
        EVERY tail position by 128-lane slice gathers; exact hit counts."""
        if has_head:
            s_at = _gather_at_docs(S.reshape(B, nr, 128), docs, nr)
        else:
            s_at = jnp.zeros((B, N), jnp.float32)
        lv = live
        if filt_b is not None:
            f_at = _gather_at_docs(
                filt_b.astype(jnp.float32).reshape(nr, 128), docs, nr
            )
            lv = lv & (f_at > 0.0)
        fin_base = seg_scores + s_at
        if additive is not None:
            fin_base = fin_base + _gather_at_docs(
                additive.reshape(nr, 128), docs, nr
            )
        if sort_keys is not None:
            skey = -sort_keys if sort_ascending else sort_keys
            fin_rank = _gather_at_docs(skey.reshape(nr, 128), docs, nr)
        else:
            fin_rank = fin_base
        fin = jnp.where(lv, fin_rank, NEG_INF)
        # fin ascends by docid (merged stream order); head entries are
        # docid-tie-broken by _hierarchical_topk
        fs, fd = _combine_topk_docid(fin, docs, head_s2, head_d, k)
        hits = head_hits + jnp.sum(
            (lv & (s_at == 0.0)).astype(jnp.int32), axis=-1
        )
        return fs, fd, hits, jnp.ones((B,), jnp.int32)

    plain = (
        has_head and filt is None and additive is None
        and sort_keys is None and not require_all
    )
    if not (plain and prune and not exact_counts):
        fs, fd, hits, exact = full(None)
    else:
        # gather-free per-entry bounds: each tail entry bounded by its own
        # 128-doc block's head maximum (bitonic merge-join + take-last fill)
        keys, sums, bfill = _annotated_tail(docs, tail_sum=seg_scores,
                                            live=live, bmax=bmax)
        W2 = keys.shape[1]
        is_entry = (keys & 1) == 1
        ub = jnp.where(
            is_entry & (sums > NEG_INF),
            sums + jnp.maximum(bfill, 0.0),
            NEG_INF,
        )
        M = min(_pow2(4 * k, 128), W2 - 1)
        sel_ub, sel_pos = jax.lax.top_k(ub, M + 1)
        residual = sel_ub[:, M]
        sel_pos = sel_pos[:, :M]
        sel_doc = jnp.take_along_axis(keys >> 1, sel_pos, axis=1)
        sel_sum = jnp.take_along_axis(sums, sel_pos, axis=1)
        sel_live = sel_ub[:, :M] > NEG_INF
        sd = jnp.clip(sel_doc, 0, D - 1)
        s_at = jnp.take_along_axis(S, sd, axis=1)
        fin = jnp.where(sel_live, sel_sum + s_at, NEG_INF)
        # candidate set is ub-ordered, not docid-ordered: full
        # lexicographic (score desc, docid asc) sort over M + k entries
        fs_p, fd_p = _topk_docid(
            jnp.concatenate([fin, head_s2], axis=1),
            jnp.concatenate([sel_doc, head_d], axis=1),
            k,
        )
        theta = fs_p[:, k - 1]
        safe = jnp.all((residual < theta) | (residual == NEG_INF))
        # hit counts: entries in zero-head blocks (bfill <= 0 proves
        # S == 0) plus selected entries with exact-zero head scores plus
        # head matches; unselected entries in nonzero blocks are unknown
        # -> lower bound (the WAND GREATER_THAN_OR_EQUAL_TO relation)
        zero_blk = is_entry & (sums > NEG_INF) & (bfill <= 0.0)
        unknown = is_entry & (sums > NEG_INF) & (bfill > 0.0)
        unknown = unknown.at[
            jnp.arange(B)[:, None], sel_pos
        ].set(False, mode="drop")
        sel_zero = sel_live & (s_at == 0.0) & jnp.take_along_axis(
            bfill > 0.0, sel_pos, axis=1
        )
        hits_p = (
            head_hits
            + jnp.sum(zero_blk, axis=-1, dtype=jnp.int32)
            + jnp.sum(sel_zero, axis=-1, dtype=jnp.int32)
        )
        exact_p = (jnp.sum(unknown, axis=-1, dtype=jnp.int32) == 0).astype(
            jnp.int32
        )

        def pruned(_):
            return fs_p, fd_p, hits_p, exact_p

        fs, fd, hits, exact = jax.lax.cond(safe, pruned, full, None)

    if sort_keys is not None and sort_ascending:
        fs = jnp.where(fs > NEG_INF, -fs, fs)
    fd = jnp.where(fs == NEG_INF, -1, fd)
    return jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(fs, jnp.int32),
            fd.astype(jnp.int32),
            hits[:, None].astype(jnp.int32),
            exact[:, None].astype(jnp.int32),
        ],
        axis=1,
    )


def dispatch_fused(
    idx,                      # DenseHeadIndex
    plan,                     # DenseMergePlan (ops/dense_head.py)
    post_docs,
    post_impacts,
    k: int,
    *,
    n_req=None,
    filt=None,
    additive=None,
    sort_keys=None,
    require_all: bool = False,
    sort_ascending: bool = True,
    use_pallas: bool = False,
    prune: bool = True,
    exact_counts: bool = False,
):
    """Run one planned batch on the fused path. Returns the packed
    [B, 2k+2] device array (decode with ``ops.dense_head.decode_packed2``)."""
    B = plan.W.shape[0]
    if n_req is None:
        n_req = np.ones(B, np.int32)
    return dense_fused_topk(
        idx.rows, post_docs, post_impacts,
        jnp.asarray(plan.W), jnp.asarray(plan.row_idx),
        jnp.asarray(n_req),
        jnp.asarray(plan.run_offs), jnp.asarray(plan.run_lens),
        jnp.asarray(plan.run_weights),
        filt, additive, sort_keys,
        getattr(idx, "rows_lo", None),
        k=k, has_head=plan.has_head, has_tail=plan.has_tail,
        run_len=plan.run_len, require_all=require_all,
        sort_ascending=sort_ascending, use_pallas=use_pallas,
        prune=prune, exact_counts=exact_counts,
    )
