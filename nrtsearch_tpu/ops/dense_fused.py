"""Round-5 fused dense-head retrieval: compact rows + window combine.

The round-4 dense path (ops/dense_head.dense_merge_topk) streamed ALL Hp
head rows through the MXU per batch (2 GB HBM at H=1024) because XLA's row
gather was measured hopeless (~24 GB/s). Round 5 gathers just the batch's
rows with a Pallas block-copy kernel (contiguous (1, C, 128) DMAs at HBM
stream speed — measured 0.054 ms for 128 rows x 1M docs,
benchmarks/profile_fused_stages.py) into a COMPACT [U, D] operand, which
also makes the Dekker residual correction affordable: two extra compact
matmuls make head scores ~f32-exact (rel err ~2^-17) without giving up the
MXU.

The combine is the round-4 candidate window, kept deliberately: the first
fused revision replaced it with a per-128-doc-block bound merge-join
(_annotated_tail) plus a "slice gather" (one-hot lane select), both of
which MEASURED WORSE on v5e (annotated join 3.2 ms, slice-gather combine
6.5 ms vs 0.6 ms for an element gather at M=512 — the one-hot formulation
is no faster than the element gather it replaced). Profile artifact:
benchmarks/profile_fused_stages.py, round 5. So:

- plain OR queries: top-M tail docs by tail sum, exact finals for just
  those M (element gather, ~0.6 ms), theta certificate against the global
  head upper bound, lax.cond escalation to the full combine when it fails;
- filters / additive columns / doc-value sorts / all-head conjunctions:
  the full combine — element gathers of each [D] column at the true tail
  width (~7 ms at bench shapes; these shapes previously fell to the
  379-qps merge path).

Score contract: identical to dense_merge_topk — query weights and head
impacts quantize through bf16 (MXU operands; f32 accumulation), the Dekker
rows recover ~f32 head scores, the tail is exact f32, ties break (score
desc, docid asc) per Lucene's contract (TopScoreDocCollector; reference
server/search/MyIndexSearcher.java:79 is the hot loop this path replaces).

Shape discipline (the PERF_E2E_r05 finding): every distinct
(B, U, R, run_len) mints a compiled program; serving bounds U to a 2-value
menu with head->tail spill and run_len to a fixed menu
(core/packed_view.dense_search_batch, ops/merge_scoring.plan_run_lists).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nrtsearch_tpu.ops.dense_head import (
    NEG_INF,
    _combine_topk_docid,
    _hierarchical_topk,
    _searchsorted_rows,
    _topk_docid,
)
from nrtsearch_tpu.ops.merge_scoring import (
    DOC_SENTINEL,
    DOC_SENTINEL_LOW,
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


def _pow2(n: int, minimum: int = 1) -> int:
    b = minimum
    while b < n:
        b <<= 1
    return b


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "has_head", "has_tail", "run_len", "require_all",
        "sort_ascending", "use_pallas", "prune", "exact_counts",
    ),
)
def dense_fused_topk(
    rows,             # bf16 [Hp, D] resident head impact rows
    row_max,          # f32 [Hp] per-row max impact (head_ub ingredient)
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

    Plain OR queries take the candidate-window combine (exact docs/scores
    under the theta certificate; hit counts may be lower bounds — the
    Lucene WAND GREATER_THAN_OR_EQUAL_TO relation; ``exact_counts=True``
    forces the full combine). Filters, additive columns, sorts, and
    conjunctions take the full combine (element gathers of each [D] column
    at the true tail width; ``require_all`` demands has_tail=False — the
    caller routes conjunctions with tail terms to the merge path)."""
    B = W.shape[0]
    D = rows.shape[1]

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
            # Dekker-style correction: three extra compact matmuls recover
            # the bf16 quantization of both operands including the
            # lo-lo cross term (residual error ~2^-30 rel — below the f32
            # accumulation noise of the exact path itself) — head scores
            # become f32-grade without giving up the MXU (bandwidth cost:
            # one more [U, D] stream; the extra matmuls reread the same
            # compact operands)
            lo_used = gather_rows(rows_lo, row_idx)
            W_lo = (W - W_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            S = (
                S + mm(W_hi, lo_used) + mm(W_lo, rows_used)
                + mm(W_lo, lo_used)
            )
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
        # per-query head upper bound for the window certificate; the small
        # slack covers bf16 upward rounding of the quantized products
        rmax = jnp.maximum(row_max[row_idx], 0.0)   # [U]
        head_ub = (W * rmax[None, :]).sum(axis=1) * (1.0 + 2.0**-6)
    else:
        S = None
        head_s = jnp.full((B, k), NEG_INF, jnp.float32)
        head_d = jnp.zeros((B, k), jnp.int32)
        head_hits = jnp.zeros((B,), jnp.int32)
        head_ub = jnp.zeros((B,), jnp.float32)

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
    # the certificate: any doc whose true final reaches theta has
    # tail_sum + head_ub >= final >= theta, so it IS selected)
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

    dc = jnp.clip(docs, 0, D - 1)

    def full(_):
        """Exact combine: head scores (+ filter/additive/sort columns) at
        EVERY tail position by element gathers; exact hit counts."""
        if has_head:
            s_at = jnp.take_along_axis(S, dc, axis=1)
        else:
            s_at = jnp.zeros((B, N), jnp.float32)
        lv = live
        if filt_b is not None:
            lv = lv & filt_b[dc]
        fin_base = seg_scores + s_at
        if additive is not None:
            fin_base = fin_base + additive[dc]
        if sort_keys is not None:
            skey = -sort_keys if sort_ascending else sort_keys
            fin_rank = skey[dc]
        else:
            fin_rank = fin_base
        fin = jnp.where(lv, fin_rank, NEG_INF)
        # fin ascends by docid (merged stream order); head entries are
        # docid-tie-broken by the hierarchical top-k
        fs, fd = _combine_topk_docid(fin, docs, head_s2, head_d, k)
        hits = head_hits + jnp.sum(
            (lv & (s_at == 0.0)).astype(jnp.int32), axis=-1
        )
        return fs, fd, hits, jnp.ones((B,), jnp.int32)

    plain = (
        has_head and filt is None and additive is None
        and sort_keys is None and not require_all
    )
    M = min(_pow2(4 * k, 128), N)
    if not (plain and prune and not exact_counts) or M >= N:
        fs, fd, hits, exact = full(None)
    else:
        # candidate window (round-4 combine, measured fastest on v5e):
        # top-M tail docs by tail_sum — the same order as their final-score
        # upper bound tail_sum + head_ub (head_ub is a per-query constant).
        # Exact finals for just those M (element gather, ~0.6 ms at bench
        # shapes); theta = k-th of the combined candidate + head set. Any
        # unselected tail doc has final <= M-th tail_sum + head_ub; when
        # that is strictly below theta, no unselected doc can reach the
        # top-k and the result is EXACT on docs/scores (hits stay a lower
        # bound — the WAND relation). Otherwise escalate via lax.cond.
        tail_sum = jnp.where(live, seg_scores, NEG_INF)
        sel_sum, sel_pos = jax.lax.top_k(tail_sum, M)
        sel_doc = jnp.take_along_axis(docs, sel_pos, axis=1)
        sd = jnp.clip(sel_doc, 0, D - 1)
        s_at = jnp.take_along_axis(S, sd, axis=1)
        fin = jnp.where(sel_sum > NEG_INF, sel_sum + s_at, NEG_INF)
        # sel_doc is in tail_sum order, NOT docid order — the whole M+k
        # candidate set goes through the lexicographic (score desc, docid
        # asc) sort (small: M+k entries)
        fs_p, fd_p = _topk_docid(
            jnp.concatenate([fin, head_s2], axis=1),
            jnp.concatenate([sel_doc, head_d], axis=1),
            k,
        )
        theta = fs_p[:, k - 1]                       # [B], may be -inf
        residual = sel_sum[:, M - 1]                 # M-th tail_sum
        all_selected = residual == NEG_INF           # every tail doc in window
        safe_q = all_selected | (residual + head_ub < theta)
        safe = jnp.all(safe_q)
        hits_p = head_hits + jnp.sum(
            ((sel_sum > NEG_INF) & (s_at == 0.0)).astype(jnp.int32), axis=-1
        )

        def pruned(_):
            return fs_p, fd_p, hits_p, all_selected.astype(jnp.int32)

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
        idx.rows, idx.row_max, post_docs, post_impacts,
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
