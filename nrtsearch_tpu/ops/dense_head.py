"""Dense-head + sparse-tail fused BM25 retrieval: the round-4 flagship path.

Round-3 hardware profiling showed the bucket-local kernel regressing to
191 qps because Zipf HEAD terms (df ~ the corpus size) make per-bucket
slices nearly dense: the frozen joint tile reached 65,536 keys, and a full
in-VMEM bitonic sort of 64k elements x 2,048 grid programs is hopelessly
VPU-bound (log^2 passes of compare-exchange, ~136 sweeps per tile). The
TPU-native fix is to stop treating dense data as sparse:

- **Head terms** (df >= ``min_df``, capped at ``max_rows``) are stored as
  DENSE per-doc impact rows, quantized to bfloat16 ([H, D] on device). A
  batch scores them with ONE MXU matmul over ALL head rows:
  ``S = W[B, H] @ rows[H, D]`` (f32 accumulation) — the weight matrix is
  scattered on the host at plan time, so unused rows multiply by zero.
  With H <= 256 the full-H matmul streams the rows at HBM bandwidth
  (~0.6 ms for 256 x 1M bf16 on v5e) with zero gather control flow; a
  per-row DMA gather is not even legal on TPU (HBM slices must be
  sublane-aligned) and jnp.take measured ~24 GB/s. Dense storage is also
  SMALLER than packed postings once df >= D/4 (2 B/doc vs 8 B/posting).
- **Tail terms** (everything else) keep the sparse bucket-local kernel
  (ops/bucket_retrieval.py) — but their slices are now genuinely sparse
  (df < min_df), so per-(query,chunk) tiles collapse from 64k keys to a few
  hundred and the in-VMEM sort runs where it is cheap.
- **Exact combine** (candidate-union): a doc outside the tail support has
  final score == S_head[d], so exact top-k candidates are (top-k of S_head)
  UNION (tail support docs, scored S_tail + gathered S_head). Head entries
  that also appear in the support are masked via a vectorized searchsorted
  (the support doc stream is globally non-decreasing by construction), so
  no doc is double-counted and no scatter into the dense accumulator is
  ever needed.

This is the TPU answer to the role impacts/BlockMaxWAND play in Lucene's
BulkScorer hot loop (reference: server/search/MyIndexSearcher.java:79,
SURVEY §3.3): Lucene avoids *reading* non-competitive postings; on TPU the
same postings cost less than the control flow to skip them, so the head is
made dense and streamed through the MXU instead. Rank-cut pruning
(MaxScore, tiering, per-bucket block maxima) measured strictly slower at
Zipf top-100 across three rounds (PERF_CEILING.md) and is not used on this
path; the theta candidate window in dense_merge_topk is the one surviving
bound (exact, engages on strong-head/weak-tail workloads).

Score semantics: head impacts quantize to bfloat16 (8-bit mantissa —
the same resolution class as Lucene's SmallFloat norm quantization,
reference: lucene SmallFloat / server field norms); tail contributions
quantize to 15 bits of the query's tail score range (ops/bucket_retrieval
contract). Top-k docs and hit counts are exact over these quantized scores.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from nrtsearch_tpu.ops.bucket_retrieval import (
    I32_MIN,
    I32_SENT,
    BucketIndex,
    BucketPlan,
    gather_pack_pallas,
    plan_bucket_batch,
    sort_finish_pallas,
)
from nrtsearch_tpu.ops.merge_scoring import _hierarchical_topk

NEG_INF = np.float32(-np.inf)


# ---------------------------------------------------------------------------
# Refresh-time index
# ---------------------------------------------------------------------------


@dataclass
class DenseHeadIndex:
    """Dense bf16 impact rows for head terms + a bucket index for the tail."""

    rows: jax.Array                 # bf16 [H, D] per-doc impacts (0 = absent)
    head_ids: np.ndarray            # int32 [H] term ids, df-descending
    head_pos: dict                  # term id -> row index
    tail: BucketIndex               # bucket metadata (bounds valid for ALL
                                    # terms; queried only for tail terms)
    capacity: int                   # D (padded doc-space size)
    min_df: int
    row_max: jax.Array = None       # f32 [Hp] per-row max impact (head_ub)
    rows_lo: jax.Array = None       # bf16 [H, D] residual rows: bf16(imp -
                                    # f32(rows)); doubles head HBM, buys the
                                    # fused path ~f32-exact scores (the
                                    # two-matmul Dekker-style correction)

    @classmethod
    def build(
        cls,
        post_docs: np.ndarray,      # int32 [P] doc ids, term-major, doc-sorted
        post_impacts: np.ndarray,   # float32 [P] impacts (0 for deleted)
        term_offsets: np.ndarray,   # int64 [V]
        term_lengths: np.ndarray,   # int32 [V]
        capacity: int,              # padded doc-space size (mult of 128)
        *,
        max_rows: int = 256,
        min_df: int | None = None,
        bucket_docs: int = 32768,
        residual: bool = False,
    ) -> "DenseHeadIndex":
        assert capacity % 128 == 0
        V = len(term_lengths)
        if min_df is None:
            min_df = max(1024, capacity // 64)
        lengths = np.asarray(term_lengths, np.int64)
        cand = np.nonzero(lengths >= min_df)[0]
        if len(cand) > max_rows:
            cand = cand[np.argsort(-lengths[cand], kind="stable")[:max_rows]]
        head_ids = cand[np.argsort(-lengths[cand], kind="stable")].astype(
            np.int32
        )
        H = len(head_ids)
        head_pos = {int(t): i for i, t in enumerate(head_ids)}
        # dense rows: one vectorized scatter per head term's postings.
        # Row count pads to a multiple of 8 (f32 sublane) so the matmul's
        # contracting dim tiles cleanly; pad rows are zero.
        Hp = max(8, -(-H // 8) * 8)
        # scatter in f32 (fast numpy fancy-store), convert to bf16 once —
        # per-row bf16 stores measured ~10x slower (ml_dtypes scalar loop)
        rows_f32 = np.zeros((Hp, capacity), dtype=np.float32)
        for i, tid in enumerate(head_ids):
            off = int(term_offsets[tid])
            ln = int(term_lengths[tid])
            d = post_docs[off : off + ln]
            rows_f32[i, d] = post_impacts[off : off + ln]
        hi_np = rows_f32.astype(jnp.bfloat16)
        rows = jax.device_put(hi_np)
        rows_lo = None
        if residual:
            # Dekker-style split: lo = bf16(imp - f32(hi)), built in row
            # blocks so the f32 temp stays bounded
            lo_np = np.empty_like(hi_np)
            for s in range(0, Hp, 64):
                e = min(s + 64, Hp)
                lo_np[s:e] = (
                    rows_f32[s:e] - hi_np[s:e].astype(np.float32)
                ).astype(jnp.bfloat16)
            rows_lo = jax.device_put(lo_np)
            del lo_np
        del rows_f32, hi_np
        tail = BucketIndex.build(
            post_docs, post_impacts, term_offsets, term_lengths,
            capacity=capacity, bucket_docs=bucket_docs,
        )
        # max in bf16 THEN widen: astype first materializes a 2x-HBM f32
        # copy of the rows (OOM at 4096 rows x 1M docs)
        row_max = jnp.max(rows, axis=1).astype(jnp.float32)
        return cls(
            rows, head_ids, head_pos, tail, capacity, int(min_df), row_max,
            rows_lo,
        )

    @property
    def n_rows(self) -> int:
        return len(self.head_ids)


# ---------------------------------------------------------------------------
# Query planning
# ---------------------------------------------------------------------------


def _pow2(n: int, minimum: int = 1) -> int:
    b = minimum
    while b < n:
        b <<= 1
    return b


@dataclass
class DensePlan:
    """Host-compiled tables for one dense+tail batch."""

    W: np.ndarray            # float32 [B, Hp] FULL head weight matrix
    tail: BucketPlan | None  # bucket-kernel plan for tail terms (None: none)
    has_head: bool
    shape_key: tuple         # static program-cache key


def plan_dense_batch(
    idx: DenseHeadIndex,
    queries: list[list[tuple[int, float]]],   # per query [(term_id, weight)]
    term_offsets: np.ndarray,
    *,
    max_terms: int = 8,
    force_caps: tuple = (),
    force_tile: int = 0,
) -> DensePlan:
    """Split each query's terms into head rows and tail postings.

    The head weight matrix is the FULL [B, Hp] scatter (Hp = padded row
    count, a STATIC shape): unused rows multiply by zero in the MXU matmul,
    so every batch shares one compiled program with no gather and no
    frozen-HU bookkeeping. Duplicate term ids merge weights (matching
    plan_bucket_batch semantics).
    """
    B = len(queries)
    Hp = idx.rows.shape[0]
    W = np.zeros((B, Hp), np.float32)
    tail_qs: list[list[tuple[int, float]]] = []
    any_tail = False
    has_head = False
    for qi, entries in enumerate(queries):
        merged: dict[int, float] = {}
        for tid, w in entries[: max_terms if max_terms else None]:
            if w != 0.0:
                merged[tid] = merged.get(tid, 0.0) + w
        tq: list[tuple[int, float]] = []
        for tid, w in merged.items():
            row = idx.head_pos.get(int(tid))
            if row is not None:
                W[qi, row] += w
                has_head = True
            else:
                tq.append((tid, w))
                any_tail = True
        tail_qs.append(tq)

    tail = None
    if any_tail:
        tail = plan_bucket_batch(
            idx.tail, tail_qs, term_offsets, max_terms=max_terms,
            force_caps=force_caps, force_tile=force_tile,
        )
    tail_key = tail.shape_key if tail is not None else None
    return DensePlan(W, tail, has_head, (B, Hp, has_head, tail_key))


# ---------------------------------------------------------------------------
# Fused query step
# ---------------------------------------------------------------------------


def _searchsorted_rows(a, v):
    """Vectorized per-row searchsorted: a [B, N] non-decreasing, v [B, K]."""
    return jax.vmap(lambda ar, vr: jnp.searchsorted(ar, vr))(a, v)


def _topk_docid(s, d, k: int):
    """Exact top-k under Lucene's (score desc, docid asc) tie contract.

    lax.top_k breaks score ties by position, which for concatenated
    candidate sets resolves ties by SOURCE order, not docid (ADVICE r4: an
    exact tie between a tail doc and a head doc always went to the tail doc;
    bf16 head quantization makes exact ties likely). A three-operand
    lexicographic sort on (-score, docid) fixes the contract; padding
    entries (-inf score) sort last via -(-inf) = +inf regardless of the
    docid key."""
    dk = jnp.where(s == NEG_INF, jnp.int32(2**31 - 1), d)
    _, d_sorted, s_sorted = jax.lax.sort(
        (-s, dk, s), dimension=1, num_keys=2, is_stable=False
    )
    return s_sorted[:, :k], d_sorted[:, :k]


def _combine_topk_docid(s_a, d_a, s_b, d_b, k: int):
    """Top-k of two candidate sets under (score desc, docid asc).

    Source A's entries must ascend by docid (so lax.top_k's position
    tie-break IS the docid tie-break) — it is pre-reduced to k before the
    small lexicographic combine with source B (already internally
    tie-broken, e.g. a top-k output)."""
    if s_a.shape[1] > k:
        s_a, ia = jax.lax.top_k(s_a, k)
        d_a = jnp.take_along_axis(d_a, ia, axis=1)
    return _topk_docid(
        jnp.concatenate([s_a, s_b], axis=1),
        jnp.concatenate([d_a, d_b], axis=1),
        k,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "has_head", "T", "caps", "tile", "bucket_bits", "m",
        "interpret",
    ),
)
def dense_tail_topk(
    rows,             # bf16 [Hp, D] dense head impact rows
    post_docs,        # int32 [P] packed postings (shared with other paths)
    post_impacts,     # float32 [P]
    W,                # f32 [B, Hp] full head weight matrix
    toffs, bounds, wts, n_terms,   # tail bucket tables (unused if m == 0)
    scales,           # f32 [B] tail quantization scales
    *,
    k: int,
    has_head: bool,
    T: int = 0,
    caps: tuple = (),
    tile: int = 0,
    bucket_bits: int = 0,
    m: int = 0,
    interpret: bool = False,
):
    """Fused dense-head + sparse-tail retrieval.

    Returns one packed int32 array [B, 2k+1]: scores (f32 bitcast) | docs |
    hits — a single buffer so serving reads back ONE transfer per batch.
    Decode with ``decode_packed``.
    """
    B = W.shape[0]
    D = rows.shape[1]
    has_tail = m > 0

    if has_head:
        S = jax.lax.dot_general(
            W.astype(jnp.bfloat16), rows,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # [B, D] f32
        masked = jnp.where(S > 0.0, S, NEG_INF)
        head_s, head_d = _hierarchical_topk(masked, k)
        head_hits = jnp.sum((S > 0.0).astype(jnp.int32), axis=-1)
    else:
        head_s = jnp.full((B, k), NEG_INF, jnp.float32)
        head_d = jnp.zeros((B, k), jnp.int32)
        head_hits = jnp.zeros((B,), jnp.int32)

    if has_tail:
        keys = gather_pack_pallas(
            post_docs, post_impacts, (toffs, bounds, wts),
            T=T, caps=caps, tile=tile, bucket_bits=bucket_bits, m=m,
            interpret=interpret,
        )
        ranked, docs = sort_finish_pallas(
            keys, n_terms, tile=tile, max_seg=T, require_all=False,
            bucket_bits=bucket_bits, n_buckets=m, interpret=interpret,
        )
        sup_q = ranked.reshape(B, m * tile)        # int32 quant sums
        sup_d = docs.reshape(B, m * tile)          # global doc ids, non-dec
        valid = sup_q != I32_MIN
        if has_head:
            sd = jnp.clip(sup_d, 0, D - 1)
            s_at = jnp.take_along_axis(S, sd, axis=1)
        else:
            s_at = jnp.zeros_like(sup_q, jnp.float32)
        sup_s = jnp.where(
            valid,
            sup_q.astype(jnp.float32) / scales[:, None] + s_at,
            NEG_INF,
        )
        tail_hits = jnp.sum(
            (valid & (s_at == 0.0)).astype(jnp.int32), axis=-1
        )
        if has_head:
            # mask stale head entries whose doc already has a (complete)
            # support entry; the support stream is globally non-decreasing
            # (chunks ascend; tiles sort ascending; SENT pads to the chunk's
            # last local doc), so a leftmost binary search finds any valid
            # occurrence first
            p = _searchsorted_rows(sup_d, head_d)
            pc = jnp.clip(p, 0, m * tile - 1)
            dup = (
                (jnp.take_along_axis(sup_d, pc, axis=1) == head_d)
                & jnp.take_along_axis(valid, pc, axis=1)
                & (p < m * tile)
            )
            head_s = jnp.where(dup, NEG_INF, head_s)
        # sup_* ascend by docid; head entries are docid-tie-broken by
        # _hierarchical_topk — combine honors (score desc, docid asc)
        fs, fd = _combine_topk_docid(sup_s, sup_d, head_s, head_d, k)
    else:
        fs, fd = head_s, head_d
        tail_hits = jnp.zeros((B,), jnp.int32)

    hits = head_hits + tail_hits
    fd = jnp.where(fs == NEG_INF, -1, fd)
    packed = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(fs, jnp.int32),
            fd.astype(jnp.int32),
            hits[:, None].astype(jnp.int32),
        ],
        axis=1,
    )
    return packed


# ---------------------------------------------------------------------------
# Merge-tail variant (round 4): head matmul + narrow bitonic-merge tail
# ---------------------------------------------------------------------------
#
# Hardware profiling (benchmarks/profile_dense.py, BENCH_r04) showed the
# bucket tail kernels costing ~35 ms device/batch at bench shapes (grid
# dispatch + per-program DMA overhead), while the bitonic merge at TAIL
# widths (tail terms have df < min_df, so the merged stream is ~32-128k wide
# vs the 2M full-width path) costs well under 1 ms. This variant scores the
# tail with the tuned merge kernel (ops/merge_scoring.py) in exact f32 (no
# 15-bit quantization), and prunes the expensive combine step:
#
#   gathering S_head at every tail position measured ~9 ms per 1M gathers
#   (XLA batched gather). Instead, theta = the k-th head-only score is a
#   certified LOWER bound of the final k-th score (final >= head part), so
#   only tail docs with tail_sum + head_ub >= theta can enter the top-k
#   (head_ub = W @ per-row max impact). Select the top-M tail docs by
#   tail_sum (same order as the upper bound), gather S_head at only those M
#   candidates, and escalate via lax.cond to the full gather when more than
#   M docs pass the theta test. This is the TPU re-expression of Lucene's
#   MaxScore/BlockMaxWAND competitive-pruning role (reference:
#   MyIndexSearcher.java:79 BulkScorer; SURVEY §5 long-posting-list
#   analogue): the skip decision is one vectorized compare against a score
#   bound, not per-posting pointer chasing.
#
# Hit counts: the pruned branch returns a LOWER bound (head hits + candidate
# tail-only hits), relation GREATER_THAN_OR_EQUAL_TO — the Lucene WAND
# contract. exact_counts=True forces the full-gather branch (exact hits).


@dataclass
class DenseMergePlan:
    """Host-compiled tables for one dense+merge-tail batch.

    The head weight matrix is COMPACT: ``W[B, U]`` over ``row_idx[U]``, the
    union of head rows any query in the batch uses (padded to a pow2 class).
    The kernel scatters it into the full ``[B, Hp]`` matrix on device and
    runs the FULL matmul — measured strictly faster than gathering the used
    rows at every (H, U) on v5e (benchmarks/row_gather_probe.py: XLA row
    gather moves ~24 GB/s vs ~650 GB/s for the streamed matmul). The
    compact planning keeps the host->device transfer small and the program
    cache keyed on the batch's U class."""

    W: np.ndarray             # float32 [B, U] compact head weight matrix
    row_idx: np.ndarray       # int32 [U] head row ids (pad rows repeat 0)
    run_offs: np.ndarray      # int32 [B, R] tail run offsets
    run_lens: np.ndarray      # int32 [B, R]
    run_weights: np.ndarray   # float32 [B, R]
    run_len: int              # static padded run length
    has_head: bool
    has_tail: bool
    shape_key: tuple


def plan_dense_merge(
    idx: DenseHeadIndex,
    queries: list[list[tuple[int, float]]],
    term_offsets: np.ndarray,
    term_lengths: np.ndarray,
    *,
    max_terms: int = 8,
    force_run_len: int = 0,
) -> DenseMergePlan:
    """Split terms into head rows and tail merge-runs (plan_run_lists)."""
    from nrtsearch_tpu.ops.merge_scoring import plan_run_lists

    B = len(queries)
    used: dict[int, int] = {}       # head row id -> compact slot
    per_q: list[list[tuple[int, float]]] = []
    rows_tail: list[list[tuple[int, int, float]]] = []
    any_tail = False
    for qi, entries in enumerate(queries):
        merged: dict[int, float] = {}
        for tid, w in entries[: max_terms if max_terms else None]:
            if w != 0.0:
                merged[tid] = merged.get(tid, 0.0) + w
        row: list[tuple[int, int, float]] = []
        slots: list[tuple[int, float]] = []
        for tid, w in merged.items():
            r = idx.head_pos.get(int(tid))
            if r is not None:
                if r not in used:
                    used[r] = len(used)
                slots.append((used[r], w))
            else:
                ln = int(term_lengths[tid])
                if ln > 0:
                    row.append((int(term_offsets[tid]), ln, w))
                    any_tail = True
        per_q.append(slots)
        rows_tail.append(row)
    has_head = bool(used)
    U = _pow2(max(len(used), 1), 8)
    W = np.zeros((B, U), np.float32)
    row_idx = np.zeros(U, np.int32)
    for r, slot in used.items():
        row_idx[slot] = r
    for qi, slots in enumerate(per_q):
        for slot, w in slots:
            W[qi, slot] += w
    if any_tail:
        run_offs, run_lens, run_w, run_len = plan_run_lists(
            rows_tail, min_run=512, force_run_len=force_run_len
        )
    else:
        run_offs = np.zeros((B, 1), np.int32)
        run_lens = np.zeros((B, 1), np.int32)
        run_w = np.zeros((B, 1), np.float32)
        run_len = 0
    return DenseMergePlan(
        W, row_idx, run_offs, run_lens, run_w, run_len, has_head, any_tail,
        (B, U, has_head, any_tail, run_offs.shape[1], run_len),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "has_head", "has_tail", "run_len", "cand", "exact_counts",
        "use_pallas",
    ),
)
def dense_merge_topk(
    rows,             # bf16 [Hp, D] dense head impact rows
    row_max,          # f32 [Hp] per-row max impact (head_ub ingredient)
    post_docs,        # int32 [P] packed postings
    post_impacts,     # float32 [P]
    W,                # f32 [B, U] COMPACT head weight matrix
    row_idx,          # int32 [U] head rows used by this batch
    run_offs,         # int32 [B, R] tail run tables
    run_lens,         # int32 [B, R]
    run_weights,      # f32 [B, R]
    *,
    k: int,
    has_head: bool,
    has_tail: bool,
    run_len: int,
    cand: int = 0,           # candidate window M (0 -> pow2(4k))
    exact_counts: bool = False,
    use_pallas: bool = False,
):
    """Fused dense-head + merge-tail retrieval (exact f32 scores).

    Returns one packed int32 array [B, 2k+2]: scores (f32 bitcast) | docs |
    hits | counts_exact flag. Decode with ``decode_packed2``.
    """
    from nrtsearch_tpu.ops.merge_scoring import (
        DOC_SENTINEL, DOC_SENTINEL_LOW, merge_sorted_runs, segmented_scores,
    )

    B = W.shape[0]
    D = rows.shape[1]

    if has_head:
        # full-H matmul: scatter the compact W[B, U] into W_full[B, Hp]
        # (B*U elements, negligible) and stream ALL rows through the MXU.
        # Measured on v5e (benchmarks/row_gather_probe.py, 2026-08-19): the
        # full matmul runs at ~650 GB/s HBM streaming (1.6/3.7/6.5/12.1 ms
        # for H=256/1024/2048/4096 x 1M), while jnp.take of even 64 rows
        # costs MORE than the full H=4096 matmul (27 vs 12 ms) — XLA's
        # gather moves rows at ~24 GB/s. Unused rows multiply by zero.
        Hp = rows.shape[0]
        W_full = (
            jnp.zeros((B, Hp), W.dtype).at[:, row_idx].add(W)
        )
        # CPU XLA lacks the bf16 x bf16 -> f32 DotThunk at this shape;
        # trace-time backend check picks the dtype (program cache is
        # per-backend, so this stays a static decision)
        mm_dt = (
            jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        )
        S = jax.lax.dot_general(
            # W always quantizes through bf16 (the score contract the numpy
            # reference matches); the f32 CPU dot of the upcast values
            # accumulates identically to the TPU MXU's f32 accumulation
            W_full.astype(jnp.bfloat16).astype(mm_dt), rows.astype(mm_dt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # [B, D] f32
        masked = jnp.where(S > 0.0, S, NEG_INF)
        head_s, head_d = _hierarchical_topk(masked, k)
        head_hits = jnp.sum((S > 0.0).astype(jnp.int32), axis=-1)
        head_ub = W_full @ row_max                 # [B]
    else:
        head_s = jnp.full((B, k), NEG_INF, jnp.float32)
        head_d = jnp.zeros((B, k), jnp.int32)
        head_hits = jnp.zeros((B,), jnp.int32)
        head_ub = jnp.zeros((B,), jnp.float32)

    if not has_tail:
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
    tail_sum = jnp.where(live, seg_scores, NEG_INF)     # [B, N]

    # head top-k entries whose doc also appears in the tail stream carry an
    # incomplete score; drop them (their complete score reaches the top-k
    # through the candidate window — guaranteed under `safe`)
    if has_head:
        p = _searchsorted_rows(docs, head_d)
        pc = jnp.clip(p, 0, N - 1)
        dup = (
            (jnp.take_along_axis(docs, pc, axis=1) == head_d)
            & (p < N)
        )
        head_s2 = jnp.where(dup, NEG_INF, head_s)
    else:
        head_s2 = head_s

    M = cand if cand else _pow2(4 * k, 128)
    M = min(M, N)

    def full(_):
        dc = jnp.clip(docs, 0, D - 1)
        s_at = (
            jnp.take_along_axis(S, dc, axis=1) if has_head
            else jnp.zeros((B, N), jnp.float32)
        )
        fin = jnp.where(live, tail_sum + s_at, NEG_INF)
        # fin ascends by docid (merged stream order); head entries are
        # docid-tie-broken by _hierarchical_topk
        fs, fd = _combine_topk_docid(fin, docs, head_s2, head_d, k)
        hits = head_hits + jnp.sum(
            (live & (s_at == 0.0)).astype(jnp.int32), axis=-1
        )
        return fs, fd, hits, jnp.ones((B,), jnp.int32)

    if exact_counts or M >= N or not has_head:
        # no head: the "expensive" combine gather is free (s_at == 0), so
        # the full branch is both exact and optimal
        fs, fd, hits, exact = full(None)
    else:
        # candidate window (cheap, always computed): top-M tail docs by
        # tail_sum — the same order as their final-score upper bound
        # tail_sum + head_ub, since head_ub is a per-query constant. Exact
        # finals for just those M; theta = k-th of the COMBINED candidate +
        # head set (every entry a valid lower bound of a real doc's score,
        # so theta lower-bounds the true k-th). Any unselected tail doc has
        # final <= min(selected tail_sum) + head_ub; when that bound is
        # strictly below theta, no unselected doc can reach the top-k and
        # the pruned result is exact on docs/scores (hits stay a lower
        # bound — the WAND relation). Otherwise escalate to the full
        # gather via lax.cond.
        sel_sum, sel_pos = jax.lax.top_k(tail_sum, M)
        sel_doc = jnp.take_along_axis(docs, sel_pos, axis=1)
        sd = jnp.clip(sel_doc, 0, D - 1)
        s_at = (
            jnp.take_along_axis(S, sd, axis=1) if has_head
            else jnp.zeros((B, M), jnp.float32)
        )
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
        residual = sel_sum[:, M - 1]                 # (M)-th tail_sum
        all_selected = residual == NEG_INF           # every tail doc in window
        safe_q = all_selected | (residual + head_ub < theta)
        safe = jnp.all(safe_q)
        hits_p = head_hits + jnp.sum(
            ((sel_sum > NEG_INF) & (s_at == 0.0)).astype(jnp.int32), axis=-1
        )

        def pruned(_):
            return fs_p, fd_p, hits_p, all_selected.astype(jnp.int32)

        fs, fd, hits, exact = jax.lax.cond(safe, pruned, full, None)

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


def dispatch_merge(
    idx: DenseHeadIndex,
    plan: DenseMergePlan,
    post_docs,
    post_impacts,
    k: int,
    *,
    row_max=None,
    exact_counts: bool = False,
    use_pallas: bool = False,
):
    """Run one planned batch on the merge-tail path. Returns the packed
    [B, 2k+2] device array (decode with ``decode_packed2``)."""
    if row_max is None:
        row_max = idx.row_max
    return dense_merge_topk(
        idx.rows, row_max, post_docs, post_impacts,
        jnp.asarray(plan.W), jnp.asarray(plan.row_idx),
        jnp.asarray(plan.run_offs), jnp.asarray(plan.run_lens),
        jnp.asarray(plan.run_weights),
        k=k, has_head=plan.has_head, has_tail=plan.has_tail,
        run_len=plan.run_len, exact_counts=exact_counts,
        use_pallas=use_pallas,
    )


def decode_packed2(packed, k: int):
    """[B, 2k+2] int32 -> (scores f32 [B,k], docs i32 [B,k], hits i64 [B],
    counts_exact bool [B])."""
    packed = np.asarray(packed)
    scores = packed[:, :k].view(np.float32)
    docs = packed[:, k : 2 * k]
    hits = packed[:, 2 * k].astype(np.int64)
    exact = packed[:, 2 * k + 1].astype(bool)
    return scores, docs, hits, exact


def dispatch(
    idx: DenseHeadIndex,
    plan: DensePlan,
    post_docs,
    post_impacts,
    k: int,
    *,
    interpret: bool = False,
):
    """Assemble device tables for one plan and run the fused step. Returns
    the packed [B, 2k+1] device array (decode with ``decode_packed`` after
    forcing, so serving can pipeline readback)."""
    tail = plan.tail
    B = plan.W.shape[0]
    if tail is not None:
        args = (
            jnp.asarray(tail.term_offs), jnp.asarray(tail.bounds),
            jnp.asarray(tail.weights), jnp.asarray(tail.n_terms),
            jnp.asarray(tail.scales),
        )
        static = dict(
            T=tail.term_offs.shape[1], caps=tail.caps, tile=tail.tile,
            bucket_bits=idx.tail.bucket_bits, m=idx.tail.n_buckets,
        )
    else:
        args = (
            jnp.zeros((B, 1), jnp.int32), jnp.zeros((B, 1, 2), jnp.int32),
            jnp.zeros((B, 1), jnp.float32), jnp.zeros(B, jnp.int32),
            jnp.ones(B, jnp.float32),
        )
        static = dict(T=0, caps=(), tile=0, bucket_bits=0, m=0)
    return dense_tail_topk(
        idx.rows, post_docs, post_impacts,
        jnp.asarray(plan.W), *args,
        k=k, has_head=plan.has_head, interpret=interpret, **static,
    )


def decode_packed(packed, k: int):
    """[B, 2k+1] int32 -> (scores f32 [B,k], docs i32 [B,k], hits i64 [B])."""
    packed = np.asarray(packed)
    scores = packed[:, :k].view(np.float32)
    docs = packed[:, k : 2 * k]
    hits = packed[:, 2 * k].astype(np.int64)
    return scores, docs, hits


# ---------------------------------------------------------------------------
# Reference implementation (numpy, same quantization semantics) for tests
# ---------------------------------------------------------------------------


def reference_dense_search(
    post_docs,
    post_impacts,
    idx: DenseHeadIndex,
    queries: list[list[tuple[int, float]]],
    term_offsets,
    term_lengths,
    k: int,
    *,
    max_terms: int = 8,
):
    """Numpy replication: head contributions via bf16-quantized impacts
    (f32 product accumulation), tail via the 15-bit bucket quantization
    using the PLAN's exact f32 weight tables (so quantization boundaries
    match the kernel bit-for-bit), rank by (-score, doc)."""
    plan = plan_dense_batch(idx, queries, term_offsets, max_terms=max_terms)
    bf16 = np.dtype(jnp.bfloat16)
    B = len(queries)
    out_scores = np.full((B, k), -np.inf, np.float32)
    out_docs = np.full((B, k), -1, np.int32)
    hits = np.zeros(B, np.int64)
    QMAX = 32000
    for qi in range(B):
        acc: dict[int, float] = {}
        tail_acc: dict[int, int] = {}
        # head: W[qi] (already merged/f32) against bf16 dense impacts
        for row in np.nonzero(plan.W[qi])[0]:
            tid = int(idx.head_ids[int(row)])
            wq = np.float32(plan.W[qi, row].astype(bf16))
            off = int(term_offsets[tid])
            ln = int(term_lengths[tid])
            docs = post_docs[off : off + ln]
            imps = post_impacts[off : off + ln]
            contrib = wq * imps.astype(bf16).astype(np.float32)
            for d, c, lv in zip(docs, contrib, imps > 0.0):
                if lv:
                    acc[d] = acc.get(d, 0.0) + float(c)
        # tail: the plan's folded weight*scale tables, 15-bit quantization
        if plan.tail is not None:
            tp = plan.tail
            for ti in range(tp.term_offs.shape[1]):
                wt = tp.weights[qi, ti]
                if wt == 0.0:
                    continue
                off = int(tp.term_offs[qi, ti])
                ln = int(tp.bounds[qi, ti, -1])
                docs = post_docs[off : off + ln]
                imps = post_impacts[off : off + ln]
                quant = np.clip((wt * imps + 0.5).astype(np.int64), 1, QMAX)
                for d, qv, lv in zip(docs, quant, imps > 0.0):
                    if lv:
                        tail_acc[d] = tail_acc.get(d, 0) + int(qv)
            for d, q in tail_acc.items():
                acc[d] = acc.get(d, 0.0) + np.float32(
                    np.float32(min(q, QMAX)) / tp.scales[qi]
                )
        items = [(s, d) for d, s in acc.items() if s > 0]
        hits[qi] = len(items)
        items.sort(key=lambda sd: (-sd[0], sd[1]))
        for j, (s, d) in enumerate(items[:k]):
            out_scores[qi, j] = s
            out_docs[qi, j] = d
    return out_scores, out_docs, hits
