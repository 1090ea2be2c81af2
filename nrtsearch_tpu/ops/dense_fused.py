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


def gather_rows(rows, idx):
    """Compact row gather: rows[idx] via scan + full-row dynamic_slice.

    One contiguous [1, D] DMA per row — measured at HBM stream speed on
    v5e, unlike XLA's generic gather (~24 GB/s for the same rows,
    benchmarks/row_gather_probe.py). Pad slots in ``idx`` may repeat row 0;
    their weights are zero."""

    def body(_, i):
        return None, jax.lax.dynamic_slice(rows, (i, 0), (1, rows.shape[1]))

    _, out = jax.lax.scan(body, None, idx)
    return out.reshape(idx.shape[0], rows.shape[1])


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
        "sort_ascending", "use_pallas",
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
    *,
    k: int,
    has_head: bool,
    has_tail: bool,
    run_len: int,
    require_all: bool = False,
    sort_ascending: bool = True,
    use_pallas: bool = False,
):
    """Fused dense retrieval, exact on docs/scores/hits for every variant.

    Returns one packed int32 array [B, 2k+2]: scores (f32 bitcast) | docs |
    hits | counts_exact flag (always 1 here). Decode with
    ``ops.dense_head.decode_packed2``.

    ``require_all`` demands has_tail=False (the caller routes conjunctions
    with any tail term to the merge path): matched docs carry ALL n_req
    distinct terms, counted by a second (indicator) matmul over the same
    compact rows.
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
        # W always quantizes through bf16 (the dense score contract); the
        # f32 CPU dot of the upcast values accumulates identically to the
        # TPU MXU's f32 accumulation
        Wq = W.astype(jnp.bfloat16).astype(mm_dt)
        S = jax.lax.dot_general(
            Wq, rows_used.astype(mm_dt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # [B, D] f32
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
    else:
        S = None
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

    # exact head score at EVERY tail position, by 128-lane slice gathers
    if has_head:
        s_at = _gather_at_docs(S.reshape(B, nr, 128), docs, nr)
    else:
        s_at = jnp.zeros((B, N), jnp.float32)
    if filt_b is not None:
        f_at = _gather_at_docs(
            filt_b.astype(jnp.float32).reshape(nr, 128), docs, nr
        )
        live = live & (f_at > 0.0)
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
    fin = jnp.where(live, fin_rank, NEG_INF)

    # head top-k entries whose doc also appears (live) in the tail stream
    # would double-count (OR scoring) or duplicate (sort): drop the head
    # copy — the complete entry is in the stream
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

    # fin ascends by docid (merged stream order); head entries are
    # docid-tie-broken by _hierarchical_topk
    fs, fd = _combine_topk_docid(fin, docs, head_s2, head_d, k)
    hits = head_hits + jnp.sum(
        (live & (s_at == 0.0)).astype(jnp.int32), axis=-1
    )
    if sort_keys is not None and sort_ascending:
        fs = jnp.where(fs > NEG_INF, -fs, fs)
    fd = jnp.where(fs == NEG_INF, -1, fd)
    return jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(fs, jnp.int32),
            fd.astype(jnp.int32),
            hits[:, None].astype(jnp.int32),
            jnp.ones((B, 1), jnp.int32),
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
        k=k, has_head=plan.has_head, has_tail=plan.has_tail,
        run_len=plan.run_len, require_all=require_all,
        sort_ascending=sort_ascending, use_pallas=use_pallas,
    )
