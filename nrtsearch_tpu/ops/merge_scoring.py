"""Scatter-free batched BM25: bitonic merge of doc-sorted postings runs.

Why: XLA scatter on TPU serializes (~11 ns/entry measured on v5e), so the
scatter-add formulation of term-at-a-time scoring caps throughput below a CPU
replica. This kernel replaces the scatter entirely:

1. **Gather runs**: each query term's postings are a *contiguous*, doc-sorted
   run — fetched with ``dynamic_slice`` (measured ~free, unlike random
   gathers). Runs are padded to a power-of-two with doc-id sentinels.
2. **Bitonic merge**: the Q sorted runs are merged into one doc-sorted stream
   with a vectorized bitonic merge network — pure ``min``/``max``
   compare-exchange passes on the VPU, log-linear passes, no data-dependent
   control flow. This is the TPU re-expression of Lucene's doc-at-a-time
   posting merge (ConjunctionDISI / DisjunctionDISIApproximation).
3. **Segmented combine**: per-doc score sums and term counts via
   cumsum + boundary differences (head/tail masks, cummax propagation).
4. **Top-k** over the merged stream (ties break to lower doc id, matching
   Lucene's docid-ascending tie-break).

Outputs are exact BM25 scores — identical to the scatter formulation — plus
exact total hit counts, with everything fully vectorized over the query batch.
Per-entry "impacts" (the tf / (tf + k1·norm) factor) are precomputed per
searcher refresh (ops/bm25.py:precompute_impacts), so the query-time math is
one multiply per entry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DOC_SENTINEL = np.int32(2**31 - 1)       # back padding (sorts last)
DOC_SENTINEL_LOW = np.int32(-(2**31) + 1)  # front padding (sorts first)


def plan_runs(
    offs: np.ndarray,      # int64 [B, T] term postings offsets
    lens: np.ndarray,      # int32 [B, T] term postings lengths
    weights: np.ndarray,   # float32 [B, T]
    *,
    min_run: int = 1024,
    force_run_len: int = 0,
    max_run: int = 0,   # cap run_len (must not exceed the postings array)
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Split long postings runs into fixed-length chunks.

    The merge kernel pads every run to one static ``run_len``; without
    splitting, one high-df term inflates the merged width to
    ``terms x pow2(max_df)``. Chunking each term's (doc-sorted, contiguous)
    postings into runs of at most ``run_len`` keeps the merged width at
    ~2x the true postings touched regardless of df skew. Chunks of one term
    partition its docs, so per-doc term counts are unchanged.

    Returns (run_offs [B, R], run_lens [B, R], run_weights [B, R], run_len).
    """
    B, T = lens.shape
    rows = []
    for b in range(B):
        row = []
        for t in range(T):
            ln = int(lens[b, t])
            if ln > 0 and weights[b, t] != 0.0:
                row.append((int(offs[b, t]), ln, float(weights[b, t])))
        rows.append(row)
    return plan_run_lists(
        rows, min_run=min_run, force_run_len=force_run_len, max_run=max_run
    )


def plan_run_lists(
    rows: list[list[tuple[int, int, float]]],  # per-query [(off, len, weight)]
    *,
    min_run: int = 1024,
    force_run_len: int = 0,
    max_run: int = 0,
    min_runs_pow2: int = 2,
    run_len_menu: tuple[int, ...] = (),
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Plan arbitrary per-query run lists (e.g. block-max-pruned sub-runs)
    into the kernel's padded [B, R] tables with one shared power-of-two
    run_len. See plan_runs for the width-minimization rationale.

    ``run_len_menu`` restricts the run_len choice to a fixed menu (still
    width-minimizing within it). Serving uses this to bound the number of
    distinct compiled programs: with free choice every batch composition
    can mint a new (run_len, R) pair, and each fused-program compile costs
    tens of seconds — the 1M-doc e2e bench measured the resulting compile
    storm at ~40 qps vs ~2,000 kernel qps (PERF_E2E_r05)."""
    B = len(rows)
    max_df = max((ln for row in rows for _, ln, _ in row), default=1)

    # pick the run_len minimizing merged width N = R * run_len, where both R
    # and run_len round up to powers of two (double rounding makes naive
    # target-based choices backfire; include the no-split option)
    def width(rl: int) -> int:
        max_runs = 1
        for row in rows:
            runs = sum(-(-ln // rl) for _, ln, _ in row)
            max_runs = max(max_runs, runs)
        return _pow2(max_runs, min_runs_pow2) * rl

    if max_run:
        min_run = min(min_run, max_run)
    if force_run_len:
        run_len = _pow2(force_run_len)
    elif run_len_menu:
        menu = sorted(_pow2(m) for m in run_len_menu)
        run_len = min(menu, key=lambda rl_: (width(rl_), -rl_))
    else:
        candidates = []
        rl = _pow2(max(min_run, 1))
        top = max(_pow2(max_df), rl)
        if max_run:
            top = min(top, _pow2(max_run) if max_run == _pow2(max_run) else max_run)
        while rl <= top:
            candidates.append(rl)
            rl <<= 1
        if not candidates:
            candidates = [rl]
        # tie-break toward the LARGEST run_len: equal merged width with longer
        # pre-sorted runs means fewer merge levels (levels = log2(R))
        run_len = min(candidates, key=lambda rl_: (width(rl_), -rl_))

    chunked = []
    max_runs = 1
    for row in rows:
        runs = []
        for off, ln, w in row:
            for start in range(0, ln, run_len):
                runs.append((off + start, min(run_len, ln - start), w))
        chunked.append(runs)
        max_runs = max(max_runs, len(runs))
    R = _pow2(max_runs, min_runs_pow2)
    out_offs = np.zeros((B, R), np.int32)
    out_lens = np.zeros((B, R), np.int32)
    out_w = np.zeros((B, R), np.float32)
    for b, runs in enumerate(chunked):
        for i, (o, ln, w) in enumerate(runs):
            out_offs[b, i] = o
            out_lens[b, i] = ln
            out_w[b, i] = w
    return out_offs, out_lens, out_w, run_len


def _pow2(n: int, minimum: int = 1) -> int:
    b = minimum
    while b < n:
        b <<= 1
    return b


_SMALL_BLOCK = 256  # lane-friendly block width for small-distance stages


def _compare_exchange(docs, payloads, d: int):
    """One bitonic stage: compare-exchange at distance d (ascending), static d.

    Two formulations keep XLA in well-tiled layouts:
    - d >= 128: reshape to [..., n/(2d), 2, d] and min/max the two halves
      (last dim d tiles onto lanes, size-2 dim tiles onto sublanes).
    - d < 128: reshape to [..., n/256, 256] and pair partners with a static
      roll inside the 256-wide lane dim. CE pairs always lie within a 2d <=
      256 block, so values that wrap across the roll boundary are never
      selected. The flat [..., 2, d] reshape here would pad d up to 128
      (4x+ memory, the OOM we measured).
    """
    n = docs.shape[-1]
    shape = docs.shape[:-1]
    if d >= 128:
        def ce(x, swap=None):
            x2 = x.reshape(*shape, n // (2 * d), 2, d)
            lo, hi = x2[..., 0, :], x2[..., 1, :]
            if swap is None:
                s = lo > hi
                out = jnp.stack([jnp.where(s, hi, lo), jnp.where(s, lo, hi)], axis=-2)
                return out.reshape(*shape, n), s
            out = jnp.stack([jnp.where(swap, hi, lo), jnp.where(swap, lo, hi)], axis=-2)
            return out.reshape(*shape, n)

        new_docs, swap = ce(docs)
        return new_docs, [ce(p, swap) for p in payloads]

    m = n // _SMALL_BLOCK
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, _SMALL_BLOCK), 1)
    hi_bit = (idx & d) != 0  # [1, 256], broadcasts

    def partner(x):
        x3 = x.reshape(*shape, m, _SMALL_BLOCK)
        return jnp.where(
            hi_bit,
            jnp.roll(x3, d, axis=-1),
            jnp.roll(x3, -d, axis=-1),
        )

    docs3 = docs.reshape(*shape, m, _SMALL_BLOCK)
    pd = partner(docs)
    keep = jnp.where(hi_bit, docs3 >= pd, docs3 <= pd)
    new_docs = jnp.where(keep, docs3, pd).reshape(*shape, n)
    new_payloads = []
    for p in payloads:
        p3 = p.reshape(*shape, m, _SMALL_BLOCK)
        new_payloads.append(jnp.where(keep, p3, partner(p)).reshape(*shape, n))
    return new_docs, new_payloads


def _bitonic_merge_level(docs, payloads, run_len: int, use_pallas: bool = False):
    """Merge adjacent sorted runs of length run_len into runs of 2*run_len."""
    n = docs.shape[-1]
    shape = docs.shape[:-1]
    # reverse every second run -> bitonic sequences of length 2*run_len
    docs2 = docs.reshape(*shape, n // (2 * run_len), 2, run_len)
    docs2 = jnp.stack([docs2[..., 0, :], docs2[..., 1, ::-1]], axis=-2)
    docs = docs2.reshape(*shape, n)
    new_payloads = []
    for p in payloads:
        p2 = p.reshape(*shape, n // (2 * run_len), 2, run_len)
        p2 = jnp.stack([p2[..., 0, :], p2[..., 1, ::-1]], axis=-2)
        new_payloads.append(p2.reshape(*shape, n))
    payloads = new_payloads
    if use_pallas and len(payloads) == 1 and docs.ndim == 2:
        from nrtsearch_tpu.ops.pallas_merge import TILE, merge_level_pallas

        if docs.shape[-1] >= TILE:  # tiles must fill; small widths run XLA
            docs, p0 = merge_level_pallas(docs, payloads[0], run_len)
            return docs, [p0]
    d = run_len
    while d >= 1:
        docs, payloads = _compare_exchange(docs, payloads, d)
        d //= 2
    return docs, payloads


def merge_sorted_runs(docs, *payloads, use_pallas: bool = False):
    """Merge R sorted runs [..., R, L] -> fully sorted [..., R*L].

    R and L must be powers of two; pad runs with DOC_SENTINEL. With
    ``use_pallas`` the compare-exchange stages run as TPU Pallas kernels
    (ops/pallas_merge.py): one read+write per far stage, all near stages
    fused into a single VMEM pass.
    """
    shape = docs.shape[:-2]
    R, L = docs.shape[-2], docs.shape[-1]
    docs = docs.reshape(*shape, R * L)
    payloads = [p.reshape(*shape, R * L) for p in payloads]
    run_len = L
    while run_len < R * L:
        docs, payloads = _bitonic_merge_level(docs, payloads, run_len, use_pallas)
        run_len *= 2
    return (docs, *payloads)


def segmented_scores(docs_sorted, contribs, max_seg: int = 0):
    """Per-doc segment sums over a doc-sorted stream.

    Returns (seg_scores, seg_counts, is_tail, valid): seg_scores[i] holds the
    full per-doc sum at each segment's *tail* position (garbage elsewhere),
    seg_counts the number of entries in the segment (matched term count).

    ``max_seg`` is the maximum entries one doc can have — the number of runs
    (each run holds a doc at most once). When given, sums use a
    bounded-distance segmented scan: log2(max_seg) shifted adds whose partial
    sums never exceed one doc's score. The unbounded formulation (a global
    f32 cumsum + boundary differences) loses ~ulp(prefix) per doc — at
    10M-entry streams that's absolute error ~1e-2 on scores of ~10, killing
    Lucene top-k parity; the scan keeps error at ~ulp(score).
    """
    n = docs_sorted.shape[-1]
    valid = (docs_sorted != DOC_SENTINEL) & (docs_sorted != DOC_SENTINEL_LOW)
    nxt = jnp.concatenate(
        [docs_sorted[..., 1:], jnp.full_like(docs_sorted[..., :1], -2)], axis=-1
    )
    tail = docs_sorted != nxt

    if max_seg and max_seg < n:
        # segmented inclusive scan: equal doc ids are contiguous, so
        # docs[i] == docs[i-d] implies no segment boundary in between
        seg_scores = contribs
        seg_counts = valid.astype(jnp.int32)
        d = 1
        while d < max_seg:
            same = docs_sorted == jnp.concatenate(
                [jnp.full_like(docs_sorted[..., :d], -1), docs_sorted[..., :-d]],
                axis=-1,
            )
            shifted_s = jnp.concatenate(
                [jnp.zeros_like(seg_scores[..., :d]), seg_scores[..., :-d]],
                axis=-1,
            )
            shifted_c = jnp.concatenate(
                [jnp.zeros_like(seg_counts[..., :d]), seg_counts[..., :-d]],
                axis=-1,
            )
            seg_scores = seg_scores + jnp.where(same, shifted_s, 0.0)
            seg_counts = seg_counts + jnp.where(same, shifted_c, 0)
            d <<= 1
        return seg_scores, seg_counts, tail, valid

    prev = jnp.concatenate(
        [jnp.full_like(docs_sorted[..., :1], -1), docs_sorted[..., :-1]], axis=-1
    )
    head = docs_sorted != prev
    cs = jnp.cumsum(contribs, axis=-1)
    cnt = jnp.cumsum(valid.astype(jnp.int32), axis=-1)
    # cumsum value just before each segment's head, propagated forward
    cs_before = jnp.where(head, cs - contribs, -jnp.inf)
    cs_before = jax.lax.cummax(cs_before, axis=docs_sorted.ndim - 1)
    cnt_before = jnp.where(head, cnt - valid.astype(jnp.int32), -1)
    cnt_before = jax.lax.cummax(cnt_before, axis=docs_sorted.ndim - 1)

    seg_scores = cs - cs_before
    seg_counts = cnt - cnt_before
    return seg_scores, seg_counts, tail, valid


@functools.partial(
    jax.jit,
    static_argnames=(
        "run_len", "k", "require_all_terms", "use_pallas", "sort_ascending",
        "reduce_kinds",
    ),
)
def merge_score_topk(
    post_docs: jax.Array,      # int32 [P_pad] doc-sorted postings (flat)
    post_impacts: jax.Array,   # float32 [P_pad] impacts, 0 for DELETED docs
    term_offsets: jax.Array,   # int32 [B, R]
    term_lengths: jax.Array,   # int32 [B, R]
    term_weights: jax.Array,   # float32 [B, R] idf * boost (0 => unused slot)
    n_terms: jax.Array,        # int32 [B] real term count (for AND semantics)
    *,
    run_len: int,              # static: power-of-two padded run length
    k: int,
    require_all_terms: bool = False,
    use_pallas: bool = False,  # static: TPU Pallas merge stages
    filter_mask=None,          # optional bool [D] (global ords): docs failing
                               # it contribute nothing (filter pushdown — the
                               # reference's filtered search keeps its filter
                               # in the lead iterator; here it multiplies
                               # gathered contributions, so top-k and hit
                               # counts are exact over the filtered set)
    additive=None,             # optional f32 [D] (global ords): per-doc score
                               # added to matched docs BEFORE top-k (the
                               # columnar score mass of non-text MUST clauses
                               # in a decomposed boolean tree; match/hit
                               # semantics are untouched)
    sort_keys=None,            # optional f32 [D] (global ords): rank matched
                               # docs by this doc-value key instead of score
                               # (field-sorted search on the fused path; the
                               # returned "scores" are the key values)
    sort_ascending: bool = True,   # static, used with sort_keys
    count_threshold=None,      # optional f32 [B]: ALSO return per query the
                               # number of matched docs with score >= this
                               # (the MaxScore window-coverage certificate,
                               # core/maxscore.py — counting is one extra
                               # reduce over the already-masked stream)
    reduce_cols=(),            # per flat reduction, (values [D], present)
                               # device columns (see _flat_reductions)
    reduce_kinds=(),           # static: per reduction ("ordinal", n) |
                               # ("sum"|"min"|"max",) | ("count",)
):
    """Fused scatter-free retrieval. Returns (scores [B,k], docs [B,k], hits [B])
    plus, when ``count_threshold`` is given, counts [B] of docs at/above it.

    Deletions are handled upstream: ``post_impacts`` of deleted docs are
    zeroed at refresh (ops/bm25.py:precompute_impacts), so they surface here
    as zero scores and are dropped by the ``score > 0`` mask — BM25 contribs
    of live matches are strictly positive.
    """

    if use_pallas:
        from nrtsearch_tpu.ops.pallas_merge import (
            TILE, gather_runs_pallas, merge_sorted_runs_alt)

        alt = term_offsets.shape[1] * run_len >= TILE
        docs, contribs = gather_runs_pallas(
            post_docs, post_impacts, term_offsets, term_lengths, term_weights,
            run_len, alternating=alt,
        )
        if alt:
            # alternating-direction bitonic: no per-level reversal passes
            docs, contribs = merge_sorted_runs_alt(docs, contribs)
        else:
            docs, contribs = merge_sorted_runs(docs, contribs, use_pallas=True)
        if filter_mask is not None:
            contribs = contribs * _filter_gate(docs, filter_mask)
        if alt:
            # single-pass segmented sum + tail mask (vs the XLA scan)
            from nrtsearch_tpu.ops.pallas_merge import finish_mask_pallas

            masked = finish_mask_pallas(
                docs, contribs, n_terms,
                max_seg=term_offsets.shape[1], require_all=require_all_terms,
            )
            total_hits = jnp.sum(masked > -jnp.inf, axis=-1, dtype=jnp.int32)
            reductions = (
                _flat_reductions(masked > -jnp.inf, docs, reduce_cols,
                                 reduce_kinds)
                if reduce_kinds else None
            )
            if sort_keys is not None:
                masked = _rank_by_keys(masked, docs, sort_keys, sort_ascending)
            elif additive is not None:
                D = additive.shape[0]
                extra = additive[jnp.clip(docs, 0, D - 1)]
                masked = jnp.where(masked > -jnp.inf, masked + extra, -jnp.inf)
            top_scores, pos = _hierarchical_topk(masked, k)
            top_docs = jnp.take_along_axis(docs, pos, axis=-1)
            if sort_keys is not None and sort_ascending:
                top_scores = jnp.where(
                    top_scores > -jnp.inf, -top_scores, top_scores
                )
            if count_threshold is not None:
                n_above = jnp.sum(
                    masked >= count_threshold[:, None], axis=-1,
                    dtype=jnp.int32,
                )
                return top_scores, top_docs, total_hits, n_above
            if reductions is not None:
                return top_scores, top_docs, total_hits, reductions
            return top_scores, top_docs, total_hits
        return _finish(
            docs, contribs, n_terms, k, require_all_terms,
            max_seg=term_offsets.shape[1], additive=additive,
            sort_keys=sort_keys, sort_ascending=sort_ascending,
            count_threshold=count_threshold,
            reduce_cols=reduce_cols, reduce_kinds=reduce_kinds,
        )

    def gather_runs(offs, lens, weights):
        def one_term(off, ln, w):
            # dynamic_slice clamps at the array end: when clamped the run's
            # real data starts at position shift. Front padding gets a LOW
            # sentinel and back padding a HIGH one, keeping the run sorted
            # without any roll (rolls cost two extra passes per run).
            p_total = post_docs.shape[0]
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

        return jax.vmap(one_term)(offs, lens, weights)

    docs, contribs = jax.vmap(gather_runs)(term_offsets, term_lengths, term_weights)
    # [B, R, run_len] -> merged [B, R*run_len]
    docs, contribs = merge_sorted_runs(docs, contribs, use_pallas=use_pallas)
    if filter_mask is not None:
        contribs = contribs * _filter_gate(docs, filter_mask)
    return _finish(
        docs, contribs, n_terms, k, require_all_terms,
        max_seg=term_offsets.shape[1], additive=additive,
        sort_keys=sort_keys, sort_ascending=sort_ascending,
        count_threshold=count_threshold,
        reduce_cols=reduce_cols, reduce_kinds=reduce_kinds,
    )


def _hierarchical_topk(masked, k: int):
    """Exact top-k over a huge masked stream via row-max thresholding.

    lax.top_k over [B, N] runs ~15x off bandwidth at N ~ 2M. Instead:
    per-128-lane row maxima (one cheap reduce), tau = k-th largest row-max —
    provably a LOWER bound of the k-th value (if k row-maxima exceeded v_k,
    k distinct elements would exceed v_k) — so every top-k element lives in
    a row with max >= tau. Gather the top R_TAKE rows (ascending row order
    keeps lax.top_k's lowest-index tie-break identical to the flat scan =
    docid order), run top-k over that small slab, and map indices back.
    When ties at tau could push a qualifying row beyond R_TAKE, a lax.cond
    falls back to the full top_k — exactness never depends on score spread.
    """
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
        jnp.sum(row_max >= tau, axis=-1, dtype=jnp.int32) <= r_take
    ) & jnp.all(tau > -jnp.inf)
    rows_sorted = jnp.sort(rm_idx, axis=-1)

    def hier(_):
        cand = jnp.take_along_axis(m3, rows_sorted[..., None], axis=1)
        cs, ci = jax.lax.top_k(cand.reshape(B, r_take * 128), k)
        row = jnp.take_along_axis(rows_sorted, ci // 128, axis=1)
        return cs, row * 128 + ci % 128

    def full(_):
        s, i = jax.lax.top_k(masked, k)
        return s, i

    return jax.lax.cond(safe, hier, full, None)


def _filter_gate(docs, filter_mask):
    """Per-entry filter gate: 1.0 where the doc passes, 0.0 otherwise.
    Sentinel-padded entries gather a clamped index; their contribs are
    already 0 so the gate value is irrelevant."""
    D = filter_mask.shape[0]
    idx = jnp.clip(docs, 0, D - 1)
    return filter_mask[idx].astype(jnp.float32)


def _rank_by_keys(masked, docs, sort_keys, ascending: bool):
    """Replace matched positions' values with the doc-value sort key (negated
    when ascending, so top_k ranks correctly; ties break to lower position =
    lower doc id, the Lucene sort tie-break)."""
    D = sort_keys.shape[0]
    keys = sort_keys[jnp.clip(docs, 0, D - 1)]
    if ascending:
        keys = -keys
    return jnp.where(masked > -jnp.inf, keys, -jnp.inf)


def _flat_reductions(match, docs, reduce_cols, reduce_kinds):
    """Flat field reductions over the fused kernel's unique-match stream.

    The facet/stat lever of VERDICT r2 #3: instead of materializing a dense
    [D] match mask (a postings scatter at 8.8M-doc scale) and reducing that,
    reductions ride the kernel's own (docs, match) stream — one [B, W]
    gather of the doc-value column plus a vmapped per-ordinal masked reduce
    (the pattern that beats TPU scatter-add ~75x in search/collectors.py).
    Matches Lucene's one-pass collection (DrillSidewaysImpl counts during
    the same doc walk that scores).

    match: bool [B, W] — True exactly at unique matched docs' tail slots.
    docs:  int32 [B, W] global doc ords (value at non-tail slots irrelevant).
    reduce_cols: per spec, (values [D], present-or-None) device arrays;
      ordinal columns hold the GLOBAL ordinal (int, -1/absent => present
      False), stat columns float32.
    reduce_kinds: per spec, ("ordinal", n_ords) | ("sum"|"min"|"max",) |
      ("count",).
    Returns a list: int32 [B, n_ords] for ordinal, f32 [B] for stats,
    int32 [B] for count.
    """
    out = []
    for (vals, present), kind in zip(reduce_cols, reduce_kinds):
        if kind[0] == "count":
            out.append(jnp.sum(match, axis=-1, dtype=jnp.int32))
            continue
        D = vals.shape[0]
        safe = jnp.clip(docs, 0, D - 1)
        g = vals[safe]
        eff = match
        if present is not None:
            eff = eff & present[safe]
        if kind[0] == "ordinal":
            n_ords = int(kind[1])
            ords = jnp.arange(n_ords, dtype=g.dtype)
            gi = g.astype(jnp.int32)
            eff_o = eff & (gi >= 0)
            out.append(
                jax.vmap(
                    lambda o, _e=eff_o, _v=gi: jnp.sum(
                        _e & (_v == o), axis=-1, dtype=jnp.int32
                    ),
                    out_axes=1,
                )(ords.astype(jnp.int32))
            )
        elif kind[0] == "sum":
            v = g.astype(jnp.float64) if g.dtype == jnp.float64 else g.astype(jnp.float32)
            out.append(jnp.sum(jnp.where(eff, v, 0), axis=-1))
        elif kind[0] == "min":
            out.append(jnp.min(
                jnp.where(eff, g.astype(jnp.float32), jnp.inf), axis=-1
            ))
        elif kind[0] == "max":
            out.append(jnp.max(
                jnp.where(eff, g.astype(jnp.float32), -jnp.inf), axis=-1
            ))
        else:
            raise ValueError(f"unknown reduction kind: {kind!r}")
    return out


def _finish(docs, contribs, n_terms, k: int, require_all_terms: bool,
            max_seg: int = 0, additive=None, sort_keys=None,
            sort_ascending: bool = True, count_threshold=None,
            reduce_cols=(), reduce_kinds=()):
    seg_scores, seg_counts, tail, valid = segmented_scores(docs, contribs, max_seg)
    ok = tail & valid & (seg_scores > 0.0)
    if require_all_terms:
        ok = ok & (seg_counts >= n_terms[:, None])
    reductions = (
        _flat_reductions(ok, docs, reduce_cols, reduce_kinds)
        if reduce_kinds else None
    )
    if additive is not None and sort_keys is None:
        D = additive.shape[0]
        seg_scores = seg_scores + additive[jnp.clip(docs, 0, D - 1)]
    masked = jnp.where(ok, seg_scores, -jnp.inf)
    if sort_keys is not None:
        masked = _rank_by_keys(masked, docs, sort_keys, sort_ascending)
    top_scores, pos = jax.lax.top_k(masked, k)
    top_docs = jnp.take_along_axis(docs, pos, axis=-1)
    if sort_keys is not None and sort_ascending:
        top_scores = jnp.where(top_scores > -jnp.inf, -top_scores, top_scores)
    total_hits = jnp.sum(ok, axis=-1, dtype=jnp.int32)
    if count_threshold is not None:
        n_above = jnp.sum(
            masked >= count_threshold[:, None], axis=-1, dtype=jnp.int32
        )
        return top_scores, top_docs, total_hits, n_above
    if reductions is not None:
        return top_scores, top_docs, total_hits, reductions
    return top_scores, top_docs, total_hits
