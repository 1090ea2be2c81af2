"""Batched MaxScore pruning: exact top-k touching a fraction of the postings.

This is the TPU re-expression of the role Lucene's BlockMaxWAND / MaxScore
play in the reference's hot loop (MyIndexSearcher -> Lucene BulkScorer with
impacts; reference consumes it via `server/search/MyIndexSearcher.java`):
spend ~zero work on postings that provably cannot reach the top-k. Where
Lucene advances per-query iterators with data-dependent branches (hostile to
a vector unit), this engine makes the SAME safe-pruning decision per query
on the host from precomputed per-run impact bounds, then runs two dense,
batched, statically-shaped device dispatches:

  1. **Theta dispatch** (tiny): merge only the query's rarest terms (a
     postings budget caps the width). The k-th REAL score of that dispatch
     is a valid lower bound ``theta`` of the true k-th score — every score
     it produces is a partial sum of a real doc's score. Filters and
     additive columnar mass ride the kernel exactly like the full dispatch,
     so theta remains a true lower bound under both.
  2. **Split** (host): with per-term upper bounds ub_t = w_t * max_impact_t
     (from device block maxima), the NON-ESSENTIAL set N is the maximal
     ascending-ub prefix with  sum_N ub + max(additive) < theta  (strict).
     A doc matching only N terms scores < theta and can never enter the
     top-k — the MaxScore invariant (Turtle & Flood 1995).
  3. **Essential dispatch**: the fused bitonic-merge kernel
     (ops/merge_scoring.py) over the ESSENTIAL runs only — typically a
     small fraction of the query's postings width under Zipf workloads —
     returning a top-M candidate window (M >> k).
  4. **Probe + finish** (device): each candidate's missing N-term mass is
     recovered exactly with a vectorized binary search over the doc-sorted
     postings (log2(P) rounds of gathers, all queries x candidates x terms
     at once), then the final top-k is taken with the Lucene tie-break
     (score desc, doc id asc).
  5. **Certify or escalate** (host): the essential dispatch also counts the
     docs with essential score >= tau = theta - sum_N ub. A doc below tau
     cannot reach theta even with every non-essential upper bound, so when
     that count fits the window, the window PROVABLY contains every
     potential top-k doc — a coverage certificate that does not depend on
     score-gap spread (window-boundary bounds fail on tie plateaus; this
     does not). Counts above the window escalate to the classic full-width
     dispatch — correctness never depends on the score distribution.

Total hit counts on the pruned path are LOWER bounds (docs matching only
non-essential terms are never seen): callers report
GREATER_THAN_OR_EQUAL_TO, the contract Lucene exposes under WAND
(`totalHitsThreshold`, reference search.proto:794-822). Pruning only engages
above a postings-width floor, so small indexes keep exact counts and tests
keep exact semantics.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np

# pruning engages only when a query's total postings width exceeds this
# (below it the full dispatch is already cheap and counts stay exact)
PRUNE_MIN_WIDTH = 1 << 16
# theta dispatch postings budget: rarest terms whose cumulative df fits
THETA_BUDGET = 1 << 16
# candidate window multiplier: M = pow2(max(WINDOW_K_MULT * k, WINDOW_MIN))
WINDOW_MIN = 512
WINDOW_K_MULT = 4
# non-essential mass must stay below this fraction of theta: tau =
# theta - sum_N ub is the window-coverage counting threshold, so a smaller
# fraction keeps tau high (fewer docs to cover -> certification passes);
# a larger one prunes more terms but risks window overflow
SPLIT_FRAC = 0.5
# impacts block size for per-run upper bounds
_UB_BLOCK = 512


def _pow2(n: int, minimum: int = 1) -> int:
    b = minimum
    while b < n:
        b <<= 1
    return b


def _on_tpu() -> bool:
    try:
        import jax

        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def run_upper_bounds(
    impacts_dev,               # f32 [P_pad] DEVICE (live-folded impacts)
    run_offsets: np.ndarray,   # int64 [NR]
    run_lengths: np.ndarray,   # int32 [NR]
) -> np.ndarray:
    """Per-run max-impact UPPER bounds from device block maxima.

    One device reduce ([P] -> [P/512]) + one small host pull; per-run bounds
    come from the covering blocks (edge blocks shared with neighbour runs
    only ever RAISE the bound — safe). Impacts are < 1 by construction
    (tf/(tf+k1*norm)), so bounds are clipped there too.
    """
    import jax
    import jax.numpy as jnp

    P = int(impacts_dev.shape[0])
    nb = P // _UB_BLOCK
    if nb == 0:
        return np.ones(len(run_offsets), np.float32)
    bm = np.asarray(
        jax.jit(lambda x: jnp.max(x[: nb * _UB_BLOCK].reshape(nb, _UB_BLOCK), axis=1))(
            impacts_dev
        )
    )
    if nb * _UB_BLOCK < P:  # tail block (non-pow2 buffers)
        bm = np.concatenate([bm, [float(np.asarray(jnp.max(impacts_dev[nb * _UB_BLOCK :])))]])
    offs = np.asarray(run_offsets, np.int64)
    lens = np.asarray(run_lengths, np.int64)
    ub = np.zeros(len(offs), np.float32)
    nz = lens > 0
    if not nz.any():
        return ub
    b0 = offs[nz] // _UB_BLOCK
    b1 = (offs[nz] + lens[nz] - 1) // _UB_BLOCK
    # runs are contiguous ascending in the packed layout; sort defensively
    order = np.argsort(b0, kind="stable")
    seg = np.maximum.reduceat(bm, b0[order]) if len(b0) else np.empty(0)
    vals = np.empty(len(b0), np.float32)
    vals[order] = seg
    # reduceat segment [b0_i, b0_{i+1}) can miss the shared edge block b1_i
    vals = np.maximum(vals, bm[np.minimum(b1, len(bm) - 1)])
    # the last sorted segment runs to the array end — harmless (upper bound)
    ub[nz] = np.minimum(vals, 1.0)
    return ub


def _probe_finish_impl(
    post_docs,      # i32 [P_pad] doc-sorted postings (flat, global ords)
    post_impacts,   # f32 [P_pad]
    cand_docs,      # i32 [B, M] window docs (garbage where score == -inf)
    cand_scores,    # f32 [B, M] essential scores (window order, -inf padded)
    probe_offs,     # i32 [B, TN] non-essential run starts (0 => unused)
    probe_lens,     # i32 [B, TN] run lengths (0 => unused)
    probe_w,        # f32 [B, TN] idf * boost (0 => unused)
    *,
    k: int,
    steps: int,     # static: binary-search rounds (>= ceil(log2(max len)))
):
    import jax
    import jax.numpy as jnp

    B, M = cand_docs.shape
    valid = cand_scores > -jnp.inf
    docs = jnp.where(valid, cand_docs, jnp.int32(2**31 - 1))

    def one_query(docs_b, offs_b, lens_b, ws_b):
        def probe_run(off, ln, w):
            lo = jnp.zeros((M,), jnp.int32)
            hi = jnp.maximum(ln, 0) * jnp.ones((M,), jnp.int32)

            def body(_, lohi):
                lo, hi = lohi
                mid = (lo + hi) // 2
                v = post_docs[off + jnp.minimum(mid, jnp.maximum(ln - 1, 0))]
                go_hi = v < docs_b
                return (jnp.where(go_hi, mid + 1, lo), jnp.where(go_hi, hi, mid))

            lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
            pos = jnp.minimum(lo, jnp.maximum(ln - 1, 0))
            found = (lo < ln) & (post_docs[off + pos] == docs_b) & (w != 0.0)
            return jnp.where(found, w * post_impacts[off + pos], 0.0)

        return jax.vmap(probe_run)(offs_b, lens_b, ws_b).sum(axis=0)

    probed = jax.vmap(one_query)(docs, probe_offs, probe_lens, probe_w)
    final = jnp.where(valid, cand_scores + probed, -jnp.inf)
    # Lucene tie-break (score desc, doc asc): pre-sort candidates by doc id
    # so lax.top_k's lowest-index preference picks the lowest doc among ties
    order = jnp.argsort(docs, axis=1)
    docs_s = jnp.take_along_axis(docs, order, axis=1)
    final_s = jnp.take_along_axis(final, order, axis=1)
    top_s, pos = jax.lax.top_k(final_s, k)
    top_d = jnp.take_along_axis(docs_s, pos, axis=1)
    return top_s, top_d, top_s[:, k - 1]


_probe_finish = None


def probe_finish(*args, k: int, steps: int):
    global _probe_finish
    if _probe_finish is None:
        import jax

        _probe_finish = jax.jit(
            _probe_finish_impl, static_argnames=("k", "steps")
        )
    return _probe_finish(*args, k=k, steps=steps)


class PrunedIndex:
    """Device-resident packed postings + the MaxScore search over them.

    Owns ONE device copy of the postings (doc-sorted per run, global ords)
    plus per-run impact upper bounds. Used by the serving packed view
    (core/packed_view.py) and the bench model (models/flagship.py).

    Queries are dicts: ``entries`` [(weight, [run_idx, ...])] per term,
    ``require_all`` bool, ``n_terms`` int, optional ``filter`` / ``additive``
    (device [max_doc] arrays) and ``sort`` ((keys, ascending)).
    """

    def __init__(
        self,
        device_ids,                # i32 [P_pad] DEVICE postings doc ids
        device_impacts,            # f32 [P_pad] DEVICE live-folded impacts
        run_offsets: np.ndarray,   # int64 [NR]
        run_lengths: np.ndarray,   # int32 [NR]
        max_doc: int,
    ):
        self.max_doc = max_doc
        self.run_offsets = np.asarray(run_offsets, np.int64)
        self.run_lengths = np.asarray(run_lengths, np.int32)
        self.doc_ids = device_ids
        self.impacts = device_impacts
        self.run_ub = run_upper_bounds(
            device_impacts, self.run_offsets, self.run_lengths
        )
        self.use_pallas = _on_tpu()
        self._steps = max(int(np.ceil(np.log2(max(self.run_lengths.max(initial=1), 2)))) + 1, 1)
        self._add_max_cache: dict[int, float] = {}

    # -- helpers ---------------------------------------------------------------

    def _additive_max(self, additive) -> float:
        """Max of an additive [D] array (cached per array identity): bounds
        the columnar mass a doc matching no essential term could carry."""
        if additive is None:
            return 0.0
        key = id(additive)
        v = self._add_max_cache.get(key)
        if v is None:
            import jax.numpy as jnp

            v = float(np.asarray(jnp.max(additive)))
            if len(self._add_max_cache) > 64:
                self._add_max_cache.clear()
            self._add_max_cache[key] = v
        return max(v, 0.0)

    def _term_stats(self, entries):
        """Per term: (weight, [runs], df, ub)."""
        out = []
        for w, runs in entries:
            df = int(sum(int(self.run_lengths[r]) for r in runs))
            ub = w * float(max((self.run_ub[r] for r in runs), default=0.0))
            out.append((w, runs, df, ub))
        return out

    def _dispatch(self, rows, n_terms, k: int, require_all: bool,
                  filter_mask=None, additive=None, sort=None, force=(0, 0),
                  device_out: bool = False, count_threshold=None,
                  reduce_cols=(), reduce_kinds=()):
        import jax
        import jax.numpy as jnp

        from nrtsearch_tpu.ops.merge_scoring import (
            merge_score_topk, plan_run_lists,
        )

        offs, lens, weights, run_len = plan_run_lists(
            rows, force_run_len=force[0], max_run=int(self.doc_ids.shape[0])
        )
        if force[1] and offs.shape[1] < force[1]:
            pad = force[1] - offs.shape[1]
            offs = np.pad(offs, ((0, 0), (0, pad)))
            lens = np.pad(lens, ((0, 0), (0, pad)))
            weights = np.pad(weights, ((0, 0), (0, pad)))
        width = run_len * offs.shape[1]
        k_eff = min(k, max(self.max_doc, 1), width)
        out = merge_score_topk(
            self.doc_ids, self.impacts,
            jnp.asarray(offs), jnp.asarray(lens), jnp.asarray(weights),
            jnp.asarray(np.asarray(n_terms, np.int32)),
            run_len=run_len, k=k_eff,
            require_all_terms=require_all,
            use_pallas=self.use_pallas,
            filter_mask=filter_mask,
            additive=additive,
            sort_keys=None if sort is None else sort[0],
            sort_ascending=True if sort is None else bool(sort[1]),
            count_threshold=(
                None if count_threshold is None
                else jnp.asarray(count_threshold, jnp.float32)
            ),
            reduce_cols=reduce_cols, reduce_kinds=reduce_kinds,
        )
        if device_out:
            return out, (run_len, offs.shape[1])
        return jax.device_get(out), (run_len, offs.shape[1])

    # -- doc-space chunked search (in-dispatch timeout) --------------------------

    def split_rows(self, rows, boundaries: np.ndarray) -> np.ndarray:
        """Per-run doc-boundary split offsets via DEVICE bisection.

        ``rows``: [(offset, length, weight)]; ``boundaries``: ascending doc
        ids [C-1]. Returns int32 [len(rows), C+1] split points (run-relative,
        monotone, [0] = 0, [-1] = length): chunk c of run r is
        [splits[r, c], splits[r, c+1]). Postings are doc-sorted per run, so
        32 vectorized bisection steps over [R, C-1] gathers do all runs at
        once — the packed view keeps no host postings copy to searchsorted.
        """
        import jax
        import jax.numpy as jnp

        R, C1 = len(rows), len(boundaries)
        if R == 0:
            return np.zeros((0, C1 + 2), np.int32)
        offs = jnp.asarray([int(o) for o, _, _ in rows], jnp.int32)[:, None]
        lens = jnp.asarray([int(ln) for _, ln, _ in rows], jnp.int32)[:, None]
        bounds = jnp.asarray(boundaries, jnp.int32)[None, :]

        @jax.jit
        def bisect(post_docs, offs, lens, bounds):
            lo = jnp.zeros((offs.shape[0], bounds.shape[1]), jnp.int32)
            hi = jnp.broadcast_to(lens, lo.shape)
            for _ in range(32):
                mid = (lo + hi) >> 1
                idx = offs + jnp.clip(mid, 0, jnp.maximum(lens - 1, 0))
                v = post_docs[idx]
                go_right = (v < bounds) & (mid < hi)
                lo = jnp.where(go_right, mid + 1, lo)
                hi = jnp.where(go_right, hi, mid)
            return lo

        mids = np.asarray(bisect(self.doc_ids, offs, lens, bounds))
        out = np.zeros((R, C1 + 2), np.int32)
        out[:, 1:-1] = mids
        out[:, -1] = [int(ln) for _, ln, _ in rows]
        return out

    def search_chunked(
        self, query: dict, k: int, deadline: float, chunks: int = 8,
    ):
        """One query over doc-space chunks with a deadline check BETWEEN
        chunk dispatches (the reference checks its cutoff per collect:
        SearchCutoffWrapper.java:41; a single fused dispatch cannot be
        preempted, so the packed view is cut into docid-ascending chunks).

        On timeout the collected prefix is exact over the docs visited —
        Lucene's early-termination contract: partial hits, count is a lower
        bound. Returns (scores [k], docs [k], hits, timed_out)."""
        import time as _time

        rows = [
            (int(self.run_offsets[r]), int(self.run_lengths[r]), w)
            for w, runs in query["entries"]
            for r in runs
            if self.run_lengths[r]
        ]
        if not rows:
            return (np.full(k, -np.inf, np.float32), np.zeros(k, np.int64),
                    0, False)
        chunk_docs = -(-self.max_doc // max(chunks, 1))
        boundaries = np.arange(1, chunks, dtype=np.int64) * chunk_docs
        splits = self.split_rows(rows, boundaries)
        fmask, addv = query.get("filter"), query.get("additive")
        srt = query.get("sort")
        req = bool(query.get("require_all"))
        n_terms = query.get("n_terms", 1)

        best: list[tuple] = []   # (score, doc) accumulated across chunks
        total = 0
        timed_out = False
        for c in range(chunks):
            rows_c = [
                (off + int(splits[r, c]),
                 int(splits[r, c + 1]) - int(splits[r, c]), w)
                for r, (off, _ln, w) in enumerate(rows)
            ]
            if not any(ln for _, ln, _ in rows_c):
                continue
            (s, d, h), _shp = self._dispatch(
                self._pad_rows([rows_c]), [n_terms], k, req,
                filter_mask=fmask, additive=addv, sort=srt,
            )
            total += int(h[0])
            for sc, doc in zip(s[0], d[0]):
                if sc > -np.inf:
                    best.append((float(sc), int(doc)))
            if _time.time() > deadline and c + 1 < chunks:
                timed_out = True
                break
        ascending = srt is not None and bool(srt[1])
        best.sort(key=lambda t: (t[0], t[1]) if ascending else (-t[0], t[1]))
        out_s = np.full(k, -np.inf, np.float32)
        out_d = np.zeros(k, np.int64)
        for i, (sc, doc) in enumerate(best[:k]):
            out_s[i], out_d[i] = sc, doc
        return out_s, out_d, total, timed_out

    # -- search ----------------------------------------------------------------

    def search(
        self,
        queries: Sequence[dict],
        k: int,
        shape_log: Optional[dict] = None,
        prune: bool = True,
        force_theta=(0, 0),
        force_essential=(0, 0),
        force_full=(0, 0),
        reduce_cols=(),
        reduce_kinds=(),
    ) -> list[tuple[np.ndarray, np.ndarray, int, bool]]:
        """Batched MaxScore-or-full search.

        Returns per query (scores [k] f32 -inf padded, docs [k] int64,
        total_hits, exact) — ``exact`` False means hits are a lower bound
        (the WAND relation contract)."""
        B = len(queries)
        results: list = [None] * B
        reductions_out: dict[int, list] = {}
        if reduce_kinds:
            # flat reductions read the FULL unique-match stream; pruned
            # dispatches drop provably non-competitive postings, so facet /
            # stat requests always take the exact full-width path
            prune = False
        full_idx: list[int] = []
        pruned: list[dict] = []  # per prunable query: plan state

        for i, q in enumerate(queries):
            if not q["entries"]:
                results[i] = (
                    np.full(k, -np.inf, np.float32), np.zeros(k, np.int64),
                    0, True,
                )
                if reduce_kinds:
                    reductions_out[i] = _zero_reductions(reduce_kinds)
                continue
            plan = self._plan_theta(q, k) if prune else None
            if plan is None:
                full_idx.append(i)
            else:
                plan["i"] = i
                pruned.append(plan)

        if pruned:
            self._run_pruned(queries, pruned, k, results, full_idx,
                             shape_log, force_theta, force_essential)

        if full_idx:
            self._run_full(queries, full_idx, k, results, shape_log,
                           force_full, reduce_cols, reduce_kinds,
                           reductions_out)
        if reduce_kinds:
            return results, [reductions_out[i] for i in range(B)]
        return results

    # -- pruned path -------------------------------------------------------------

    def _plan_theta(self, q: dict, k: int) -> Optional[dict]:
        """Eligibility + theta-dispatch term selection for one query."""
        if q.get("require_all") or q.get("sort") is not None:
            return None
        stats = self._term_stats(q["entries"])
        stats = [s for s in stats if s[2] > 0 and s[0] != 0.0]
        if len(stats) < 2:
            return None
        total_width = sum(df for _, _, df, _ in stats)
        if total_width < PRUNE_MIN_WIDTH or k > 1024:
            return None
        # theta terms: highest-ub (rarest) first, within the postings budget
        by_ub = sorted(stats, key=lambda s: -s[3])
        theta_terms, used = [], 0
        for s in by_ub:
            if used + s[2] <= THETA_BUDGET:
                theta_terms.append(s)
                used += s[2]
        if not theta_terms:
            return None
        return {"stats": stats, "theta_terms": theta_terms}

    def _rows_for(self, terms) -> list[tuple[int, int, float]]:
        return [
            (int(self.run_offsets[r]), int(self.run_lengths[r]), w)
            for w, runs, _df, _ub in terms
            for r in runs
            if self.run_lengths[r]
        ]

    @staticmethod
    def _pad_rows(rows: list) -> list:
        """Pad the BATCH dim to a pow2 bucket: a varying batch size would
        recompile the dispatch per distinct count (20-40s each on TPU).
        Empty padded rows contribute zero runs — no extra postings work,
        only the B-dim of the [B, R] tables grows."""
        b = _pow2(max(len(rows), 1))
        return rows + [[] for _ in range(b - len(rows))]

    def _run_pruned(self, queries, pruned, k, results, full_idx,
                    shape_log, force_theta, force_essential):
        import jax
        import jax.numpy as jnp

        M = _pow2(max(WINDOW_K_MULT * k, WINDOW_MIN))
        groups = _group_by_arrays([queries[p["i"]] for p in pruned],
                                  list(range(len(pruned))))
        for (fmask, addv), pidx in groups:
            plans = [pruned[j] for j in pidx]
            # ---- theta dispatch (tiny) ----
            rows_t = self._pad_rows(
                [self._rows_for(p["theta_terms"]) for p in plans]
            )
            (s_t, _d_t, _h_t), shp = self._dispatch(
                rows_t, [1] * len(rows_t), k, False,
                filter_mask=fmask, additive=addv, force=force_theta,
            )
            _log_shape(shape_log, "theta", shp)
            max_add = self._additive_max(addv)

            # ---- split + essential dispatch planning ----
            ess_rows, probe_tables, run_idx, taus = [], [], [], []
            for row_i, p in enumerate(plans):
                # theta = k-th REAL score of the theta dispatch; with fewer
                # than k slots there is no k-th lower bound at all
                theta = (
                    float(s_t[row_i][k - 1]) if s_t.shape[1] >= k else -np.inf
                )
                split = self._split(p["stats"], theta, max_add)
                if split is None:
                    full_idx.append(p["i"])
                    continue
                ess, non_ess, sum_ub = split
                p["sum_ub"] = sum_ub
                ess_rows.append(self._rows_for(ess))
                probe_tables.append(
                    [
                        (int(self.run_offsets[r]), int(self.run_lengths[r]), w)
                        for w, runs, _df, _ub in non_ess
                        for r in runs
                        if self.run_lengths[r]
                    ]
                )
                # tau: docs below it in ESSENTIAL score cannot reach theta
                # even with every non-essential upper bound; a small relative
                # slack absorbs f32 summation-order noise (count a hair more)
                tau = theta - sum_ub
                taus.append(tau - 1e-5 * max(1.0, abs(tau)))
                run_idx.append(row_i)
            if not ess_rows:
                continue
            live_plans = [plans[j] for j in run_idx]
            ess_rows = self._pad_rows(ess_rows)
            taus = taus + [np.inf] * (len(ess_rows) - len(taus))

            # ---- essential dispatch (device-resident output) ----
            # the kernel also counts docs with score >= tau: if that count
            # fits the window, the window PROVABLY contains every potential
            # top-k doc (docs outside score < tau + sum_ub = theta <= true
            # k-th) — certification independent of score-gap spread
            (s_e, d_e, h_e, n_above), shp = self._dispatch(
                ess_rows, [1] * len(ess_rows), M, False,
                filter_mask=fmask, additive=addv, force=force_essential,
                device_out=True, count_threshold=np.asarray(taus, np.float32),
            )
            _log_shape(shape_log, "essential", shp)
            m_eff = int(s_e.shape[1])

            # ---- probe + finish ----
            # pow2-pad the probe-table width so steady-state serving reuses
            # one compiled probe program across batches
            TN = _pow2(max((len(t) for t in probe_tables), default=1) or 1)
            po = np.zeros((len(ess_rows), TN), np.int32)
            pl = np.zeros((len(ess_rows), TN), np.int32)
            pw = np.zeros((len(ess_rows), TN), np.float32)
            for bi, table in enumerate(probe_tables):
                for ti, (o, ln, w) in enumerate(table):
                    po[bi, ti], pl[bi, ti], pw[bi, ti] = o, ln, w
            top_s, top_d, _kth_f = probe_finish(
                self.doc_ids, self.impacts, d_e, s_e,
                jnp.asarray(po), jnp.asarray(pl), jnp.asarray(pw),
                k=min(k, m_eff), steps=self._steps,
            )
            top_s, top_d, n_above_h, h_e_h = jax.device_get(
                (top_s, top_d, n_above, h_e)
            )

            # ---- certify or escalate ----
            for bi, p in enumerate(live_plans):
                if int(n_above_h[bi]) > m_eff:
                    # more tau-reaching docs than the window holds: a
                    # potential top-k doc may be outside it — escalate
                    full_idx.append(p["i"])
                    continue
                kk = top_s.shape[1]
                out_s = np.full(k, -np.inf, np.float32)
                out_d = np.zeros(k, np.int64)
                out_s[: min(k, kk)] = top_s[bi][:k]
                out_d[: min(k, kk)] = top_d[bi][:k].astype(np.int64)
                out_d[out_s == -np.inf] = 0
                # hits: essential matches only — a LOWER bound of the union
                results[p["i"]] = (out_s, out_d, int(h_e_h[bi]), False)

    @staticmethod
    def _split(stats, theta: float, max_add: float):
        """MaxScore split. Returns (essential, non_essential, sum_ub) or None
        when nothing can be pruned (caller takes the full dispatch)."""
        if not (theta > 0.0) or not np.isfinite(theta):
            return None
        by_ub = sorted(stats, key=lambda s: s[3])  # ascending ub
        budget = SPLIT_FRAC * theta - max_add
        non_ess, cum = [], 0.0
        for s in by_ub:
            if cum + s[3] < budget:
                non_ess.append(s)
                cum += s[3]
            else:
                break
        if not non_ess:
            return None
        ess = [s for s in stats if not any(s is n for n in non_ess)]
        if not ess:
            # keep the highest-ub term essential: the window must exist
            ess = [non_ess.pop()]
            cum = sum(s[3] for s in non_ess)
        return ess, non_ess, cum

    # -- full path ---------------------------------------------------------------

    def _run_full(self, queries, idxs, k, results, shape_log, force_full,
                  reduce_cols=(), reduce_kinds=(), reductions_out=None):
        groups = _group_by_arrays([queries[i] for i in idxs], idxs)
        for key, gidx in groups:
            fmask, addv = key[0], key[1]
            srt = queries[gidx[0]].get("sort")
            rows = self._pad_rows([
                [
                    (int(self.run_offsets[r]), int(self.run_lengths[r]), w)
                    for w, runs in queries[i]["entries"]
                    for r in runs
                    if self.run_lengths[r]
                ]
                for i in gidx
            ])
            n_terms = [queries[i]["n_terms"] for i in gidx]
            n_terms = n_terms + [1] * (len(rows) - len(n_terms))
            req = any(queries[i].get("require_all") for i in gidx)
            out, shp = self._dispatch(
                rows, n_terms, k, req, filter_mask=fmask, additive=addv,
                sort=srt, force=force_full,
                reduce_cols=reduce_cols, reduce_kinds=reduce_kinds,
            )
            if reduce_kinds:
                s2, d2, h2, reds = out
            else:
                s2, d2, h2 = out
            _log_shape(shape_log, "full", shp)
            for row_i, i in enumerate(gidx):
                if reduce_kinds and reductions_out is not None:
                    reductions_out[i] = [np.asarray(r[row_i]) for r in reds]
                kk = s2[row_i].shape[0]
                out_s = np.full(k, -np.inf, np.float32)
                out_d = np.zeros(k, np.int64)
                out_s[: min(k, kk)] = s2[row_i][:k]
                out_d[: min(k, kk)] = d2[row_i][:k].astype(np.int64)
                results[i] = (out_s, out_d, int(h2[row_i]), True)


def _zero_reductions(reduce_kinds) -> list:
    out = []
    for kind in reduce_kinds:
        if kind[0] == "ordinal":
            out.append(np.zeros(int(kind[1]), np.int32))
        elif kind[0] == "count":
            out.append(np.int32(0))
        elif kind[0] == "sum":
            out.append(np.float32(0.0))
        elif kind[0] == "min":
            out.append(np.float32(np.inf))
        else:
            out.append(np.float32(-np.inf))
    return out


def _log_shape(shape_log, key, shp):
    if shape_log is not None:
        prev = shape_log.get(key, (0, 0))
        shape_log[key] = (max(prev[0], shp[0]), max(prev[1], shp[1]))


def _group_by_arrays(queries, idxs):
    """Group query indices by (filter, additive, sort) identity so one
    dispatch shares one [D] array set (per-query [B, D] arrays would not
    fit HBM)."""
    groups: dict = {}
    for q, i in zip(queries, idxs):
        f, a, srt = q.get("filter"), q.get("additive"), q.get("sort")
        key = (id(f) if f is not None else None,
               id(a) if a is not None else None,
               (id(srt[0]), bool(srt[1])) if srt is not None else None)
        groups.setdefault(key, ((f, a), []))[1].append(i)
    out = []
    for key, (arrs, lst) in groups.items():
        out.append((arrs, lst))
    return out
