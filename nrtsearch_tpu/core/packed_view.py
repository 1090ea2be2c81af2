"""Packed multi-segment field view: one device program for any segment count.

Round 1 scored each segment with its own kernel dispatch, so a 10-segment
index paid 10x the dispatch floor per query. This view concatenates every
segment's postings for one field into a single flat device array with doc ids
rebased to GLOBAL ords — runs from different segments are just more sorted
runs in the same bitonic merge (ops/merge_scoring.py), so one
``merge_score_topk`` call scores the whole index for a whole query batch.
This is the TPU re-expression of the reference's segment-slice fan-out
(MyIndexSearcher.java:79,117): where Lucene co-schedules segments onto a
thread pool, we co-schedule them into one XLA program.

The view also carries **block-max metadata** (the Lucene impacts/BlockMaxWAND
analogue, consumed at MyIndexSearcher recall): per 512-entry postings block,
the min/max doc ord and max BM25 impact. At query time a host-side pruning
pass drops whole doc-ord windows that provably cannot reach the current top-k
lower bound:

  theta  = max_t w_t * kth_largest_impact(t)   (exact lower bound: the k docs
           achieving term t's top-k impacts have true scores >= those
           contributions, so the true k-th best score >= theta)
  UB(w)  = sum_t w_t * max_impact_t(window w)  (upper bound on any doc in w)
  prune window w iff UB(w) < theta

Pruned windows shrink the postings runs fed to the kernel — the kernel itself
is unchanged and surviving docs' scores equal the unpruned program's up to
f32 summation order (dropped docs provably rank below the true k-th hit). Matching
Lucene's WAND contract, total hit counts become lower bounds when pruning
fires (relation GREATER_THAN_OR_EQUAL_TO).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Optional, Sequence

import numpy as np

from nrtsearch_tpu.ops.bm25 import lucene_idf

BLOCK = 512                      # postings entries per block-max block
PRUNE_MIN_POSTINGS = 1 << 17     # don't bother pruning small queries
PRUNE_WINDOWS = 2048             # target number of doc-ord windows
# keep margin against f32 accumulation noise in the kernel's cumsum
_PRUNE_EPS = 1e-4


@dataclass(frozen=True)
class QuerySpec:
    """One fast-path text query: analyzed terms against one field."""

    field: str
    terms: tuple[str, ...]
    require_all: bool = False
    boost: float = 1.0


@dataclass
class FastResult:
    scores: np.ndarray   # [k] f32, -inf padded
    docs: np.ndarray     # [k] global ords
    total_hits: int
    pruned: bool         # block-max pruning fired: total_hits is a lower bound


EXACT_WINDOW_LIMIT = 1 << 16   # runs up to this length get exact window maxima
_WINDOW_MERGE_GAP = 4          # coalesce kept windows separated by < this many
_MAX_RANGES = 48               # cap kept ord ranges (bounds run fragmentation)
PRUNE_ACCEPT_FRAC = 0.6        # pruning must drop >= 40% or it's not worth it


class BlockMaxPruner:
    """Per-window impact upper bounds + the pruning pass over one flat
    postings space (global-ord doc ids). Shared by the serving packed view
    and the bench/flagship model (models/flagship.py).

    Selective terms (run <= EXACT_WINDOW_LIMIT entries) get EXACT per-window
    maxima from the postings themselves — the pruning signal is precisely
    "this term is absent/weak in that doc range", which block-granularity
    metadata smears away for mid-frequency terms (a 512-entry block of a
    df=1000 term spans most of the doc space). Dense terms use 512-entry
    block maxima (they really are everywhere, so the approximation is tight).
    Restriction back to runs is exact to the entry via searchsorted over the
    doc-sorted postings."""

    def __init__(self, host_ids: np.ndarray, host_impacts: np.ndarray,
                 max_doc: int):
        self.host_impacts = host_impacts
        self.host_ords = host_ids.astype(np.int64)
        total = len(host_ids)
        if total:
            bounds = np.arange(0, total, BLOCK)
            self.blk_min = np.minimum.reduceat(self.host_ords, bounds)
            self.blk_max = np.maximum.reduceat(self.host_ords, bounds)
            self.blk_imp = np.maximum.reduceat(host_impacts, bounds)
        else:
            self.blk_min = np.empty(0, np.int64)
            self.blk_max = np.empty(0, np.int64)
            self.blk_imp = np.empty(0, np.float32)
        self.window_width = _pow2(max(-(-max(max_doc, 1) // PRUNE_WINDOWS), 64))
        self.n_windows = -(-max(max_doc, 1) // self.window_width)
        self._theta_cache: dict[tuple, float] = {}
        # per-term exact window maxima are query-repetitive: cache by run key
        self._wmax_cache: dict[tuple, np.ndarray] = {}

    def kth_run_impact(self, key, runs: list[tuple[int, int]], k: int) -> float:
        """The k-th largest live impact within a term's runs (0.0 if the term
        has fewer than k postings). ``key`` identifies the term for caching;
        k is bucketed to the next power of two."""
        kb = _pow2(max(k, 1))
        ck = (key, kb)
        hit = self._theta_cache.get(ck)
        if hit is not None:
            return hit
        pieces = [self.host_impacts[off : off + ln] for off, ln in runs if ln]
        if not pieces:
            self._theta_cache[ck] = 0.0
            return 0.0
        imps = np.concatenate(pieces) if len(pieces) > 1 else pieces[0]
        if len(imps) < kb:
            val = 0.0
        else:
            val = float(np.partition(imps, len(imps) - kb)[len(imps) - kb])
        self._theta_cache[ck] = val
        return val

    def analyze(self, entries, k: int):
        """Precompute the per-window upper bounds for one query.

        Returns None when the query is too small to bother, else a state dict
        reused by candidate_rows/prune_with_theta (the two phases share the
        block -> window mapping)."""
        flat_all = [
            (off, ln, w) for _, w, runs in entries for off, ln in runs
        ]
        total = sum(ln for _, ln, _ in flat_all)
        if total < PRUNE_MIN_POSTINGS:
            return None
        theta_static = max(
            (w * self.kth_run_impact(key, runs, k)
             for key, w, runs in entries if w),
            default=0.0,
        )
        W = self.n_windows
        width = self.window_width
        ub = np.zeros(W + 1, np.float64)  # +1 slack for max-ord edge
        wcount = np.zeros(W + 1, np.float64)  # est. postings entries / window
        term_runs = []  # (w, [(off, ln)]) for restriction
        for _, w, runs in entries:
            if not w or not runs:
                continue
            wmax = np.zeros(W + 1, np.float32)
            for off, ln in runs:
                if ln <= EXACT_WINDOW_LIMIT:
                    ck = (off, ln)
                    cached = self._wmax_cache.get(ck)
                    if cached is None:
                        ords = self.host_ords[off : off + ln]
                        imps = self.host_impacts[off : off + ln]
                        win = ords // width
                        wm = np.zeros(W + 1, np.float32)
                        np.maximum.at(wm, win, imps)
                        cnt = np.zeros(W + 1, np.float64)
                        np.add.at(cnt, win, 1.0)
                        cached = (wm, cnt)
                        self._wmax_cache[ck] = cached
                    wm, cnt = cached
                    np.maximum(wmax, wm, out=wmax)
                    wcount += cnt
                else:
                    # dense run: 512-entry block maxima (tight for terms that
                    # genuinely appear in nearly every window). Cached like
                    # exact runs — stopwords repeat in every batch and the
                    # spanning-block fill is a host loop.
                    ck = (off, ln)
                    cached = self._wmax_cache.get(ck)
                    if cached is None:
                        wm = np.zeros(W + 1, np.float32)
                        cnt = np.zeros(W + 1, np.float64)
                        b0, b1 = off // BLOCK, (off + ln - 1) // BLOCK
                        blocks = np.arange(b0, b1 + 1)
                        wlo = (self.blk_min[blocks] // width).astype(np.int64)
                        whi = (self.blk_max[blocks] // width).astype(np.int64)
                        imp = self.blk_imp[blocks]
                        same = wlo == whi
                        np.maximum.at(wm, wlo[same], imp[same])
                        np.add.at(cnt, wlo[same], float(BLOCK))
                        for j in np.nonzero(~same)[0]:
                            lo, hi = int(wlo[j]), int(whi[j])
                            np.maximum.at(
                                wm, np.arange(lo, hi + 1),
                                np.full(hi - lo + 1, imp[j], np.float32),
                            )
                            cnt[lo : hi + 1] += BLOCK / (hi - lo + 1)
                        cached = (wm, cnt)
                        self._wmax_cache[ck] = cached
                    wm, cnt = cached
                    np.maximum(wmax, wm, out=wmax)
                    wcount += cnt
            ub += w * wmax.astype(np.float64)
            term_runs.append((w, runs))
        # prunability: how much of the window UB mass sits well below the
        # peak. Flat UB (all query terms are stopwords: every window holds a
        # near-max scorer) means no theta can prune — skip the phase-1
        # dispatch entirely for those queries.
        ub_max = float(ub.max()) if len(ub) else 0.0
        prunable_frac = (
            float(np.mean(ub[:W] < 0.9 * ub_max)) if ub_max > 0 else 0.0
        )
        return {
            "ub": ub,
            "wcount": wcount,
            "term_runs": term_runs,
            "theta_static": theta_static,
            "flat_all": flat_all,
            "total": total,
            "k": k,
            "prunable_frac": prunable_frac,
        }

    def candidate_rows(
        self, state, budget_entries: int = 1 << 16
    ) -> list[tuple[int, int, float]]:
        """Phase-1 candidate runs: postings restricted to the highest-UB
        windows (where the true top-k plausibly lives), bounded by an entry
        budget. Scoring these EXACTLY yields a much tighter theta than the
        static single-term bound (the WAND heap analogue: build the lower
        bound from real multi-term scores)."""
        ub = state["ub"]
        wcount = state["wcount"]
        order = np.argsort(-ub, kind="stable")
        taken = np.cumsum(wcount[order])
        n_take = int(np.searchsorted(taken, budget_entries)) + 1
        keep = np.zeros(len(ub), bool)
        keep[order[:n_take]] = True
        return self._restrict(state, keep)

    def prune_with_theta(
        self, state, theta: float
    ) -> tuple[list[tuple[int, int, float]], bool]:
        """Drop postings blocks in windows whose upper bound cannot reach
        theta. Surviving docs keep ALL their entries, so their scores equal
        the unpruned program's (up to f32 summation order — pruning changes
        run splits, which reorders equal-doc-id contributions).

        Pruning is only ACCEPTED when it drops a meaningful share of the
        postings: a 10% cut is not worth the run fragmentation it causes
        (fragmented runs pad to more merge chunks than they save)."""
        if theta <= 0.0:
            return state["flat_all"], False
        keep = state["ub"] >= theta * (1.0 - _PRUNE_EPS)
        if keep.all():
            return state["flat_all"], False
        out = self._restrict(state, keep)
        kept_total = sum(ln for _, ln, _ in out)
        if kept_total > PRUNE_ACCEPT_FRAC * state["total"]:
            return state["flat_all"], False
        return out, True

    def _restrict(self, state, keep: np.ndarray) -> list[tuple[int, int, float]]:
        """Runs clipped to kept doc-ord windows, exact to the entry: postings
        are doc-sorted, so each kept ord range maps to one contiguous span
        per run (searchsorted). Nearby kept windows coalesce to bound run
        fragmentation."""
        idx = np.nonzero(keep)[0]
        if len(idx) == 0:
            return []
        # merge kept windows separated by small gaps into maximal ord ranges;
        # cap the range count by doubling the merge gap (fragmented sub-runs
        # would otherwise inflate the padded merge width past the UNPRUNED
        # width — keeping extra gap entries is always safe, just less pruned)
        width = self.window_width
        gap = _WINDOW_MERGE_GAP
        while True:
            splits = np.nonzero(np.diff(idx) > gap)[0] + 1
            if len(splits) + 1 <= _MAX_RANGES or gap > self.n_windows:
                break
            gap *= 2
        ranges = [
            (int(g[0]) * width, (int(g[-1]) + 1) * width)
            for g in np.split(idx, splits)
        ]
        lo_ords = np.array([r[0] for r in ranges], np.int64)
        hi_ords = np.array([r[1] for r in ranges], np.int64)
        out: list[tuple[int, int, float]] = []
        for w, runs in state["term_runs"]:
            for off, ln in runs:
                ords = self.host_ords[off : off + ln]
                starts = np.searchsorted(ords, lo_ords, side="left")
                ends = np.searchsorted(ords, hi_ords, side="left")
                for s_, e_ in zip(starts, ends):
                    if e_ > s_:
                        out.append((off + int(s_), int(e_ - s_), w))
        return out

    def prune(
        self,
        entries: list[tuple[object, float, list[tuple[int, int]]]],
        k: int,
    ) -> tuple[list[tuple[int, int, float]], bool]:
        """Single-phase (static theta) pruning. ``entries``: per term
        (key, weight, runs). Returns (flat run list, pruned?)."""
        state = self.analyze(entries, k)
        if state is None:
            return [
                (off, ln, w) for _, w, runs in entries for off, ln in runs
            ], False
        return self.prune_with_theta(state, state["theta_static"])


class PackedFieldView:
    """All live segments' postings for one field, packed for fused search."""

    def __init__(self, searcher, field: str):
        import jax
        import jax.numpy as jnp

        from nrtsearch_tpu.ops.bm25 import precompute_impacts
        from nrtsearch_tpu.ops.pallas_merge import GATHER_TILE

        self.field = field
        fd = searcher.field_defs[field]
        self.k1 = float(fd.sim_k1)
        self.b = float(fd.sim_b)
        self.avgdl = float(searcher.stats.avgdl(field))
        self.doc_count = int(searcher.stats.doc_count(field))
        self.stats = searcher.stats
        self.max_doc = int(searcher.max_doc)

        parts_ids, parts_imp = [], []
        host_ids_parts, host_imp_parts = [], []
        # (segment_idx, tfi, pack_offset) for term lookups
        self.seg_entries: list[tuple[int, object, int]] = []
        cursor = 0
        for idx, seg in enumerate(searcher.segments):
            tfi = seg.fields.get(field)
            if tfi is None or tfi.postings_len == 0:
                continue
            base = int(searcher.bases[idx])
            pl = tfi.postings_len
            imp = precompute_impacts(
                tfi.doc_ids, tfi.freqs, tfi.doc_lens, seg.live,
                jnp.float32(self.k1), jnp.float32(self.b),
                jnp.float32(self.avgdl),
            )
            parts_ids.append(tfi.doc_ids[:pl] + np.int32(base))
            parts_imp.append(imp[:pl])
            # host mirrors for block metadata + theta (live-folded like the
            # device impacts, so pruning bounds match kernel scores exactly)
            hd = tfi.host_doc_ids
            hf = tfi.host_freqs
            dl = np.asarray(tfi.doc_lens)
            him = hf / (hf + self.k1 * (1.0 - self.b + self.b * dl[hd] / self.avgdl))
            him = np.where(seg.host_live[hd], him, 0.0).astype(np.float32)
            host_ids_parts.append(hd.astype(np.int64) + base)
            host_imp_parts.append(him)
            self.seg_entries.append((idx, tfi, cursor))
            cursor += pl
        self.total_len = cursor
        if cursor == 0:
            self.doc_ids = None
            self.impacts = None
            self.pruner = BlockMaxPruner(
                np.empty(0, np.int64), np.empty(0, np.float32), self.max_doc
            )
        else:
            p_pad = _pow2(cursor + 2 * GATHER_TILE)
            pad = p_pad - cursor
            parts_ids.append(jnp.zeros(pad, jnp.int32))
            parts_imp.append(jnp.zeros(pad, jnp.float32))
            self.doc_ids = jnp.concatenate(parts_ids)
            self.impacts = jnp.concatenate(parts_imp)
            self.pruner = BlockMaxPruner(
                np.concatenate(host_ids_parts),
                np.concatenate(host_imp_parts),
                self.max_doc,
            )
        try:
            self.use_pallas = jax.devices()[0].platform == "tpu"
        except Exception:
            self.use_pallas = False

    # -- term plumbing ---------------------------------------------------------

    def term_entries(
        self, terms: Sequence[str], boost: float = 1.0
    ) -> list[tuple[str, float, list[tuple[int, int]]]]:
        """Per term: (term, idf*boost weight, [(packed_off, len), ...])."""
        out = []
        for term in terms:
            df = self.stats.doc_freq(self.field, term)
            w = lucene_idf(self.doc_count, df) * boost if df else 0.0
            runs = []
            if w:
                for _, tfi, pack_off in self.seg_entries:
                    off, ln = tfi.lookup(term)
                    if ln:
                        runs.append((pack_off + off, ln))
            out.append((term, w, runs))
        return out

    def kth_impact(self, term: str, k: int) -> float:
        """The k-th largest live impact of a term (0.0 if df < k)."""
        runs = []
        for _, tfi, pack_off in self.seg_entries:
            off, ln = tfi.lookup(term)
            if ln:
                runs.append((pack_off + off, ln))
        return self.pruner.kth_run_impact(term, runs, k)

    def prune_entries(self, entries, k: int):
        """Block-max window pruning over per-term (term, weight, runs)."""
        return self.pruner.prune(entries, k)

    # -- fused batched search -----------------------------------------------------

    def _dispatch(self, rows, n_terms: np.ndarray, k: int, require_all: bool):
        """One fused kernel dispatch over padded per-query run lists."""
        import jax.numpy as jnp

        from nrtsearch_tpu.ops.merge_scoring import merge_score_topk, plan_run_lists

        offs, lens, weights, run_len = plan_run_lists(
            rows, max_run=int(self.doc_ids.shape[0])
        )
        import jax

        scores, docs, hits = merge_score_topk(
            self.doc_ids, self.impacts,
            jnp.asarray(offs), jnp.asarray(lens), jnp.asarray(weights),
            jnp.asarray(n_terms),
            run_len=run_len, k=min(k, max(self.max_doc, 1)),
            require_all_terms=require_all,
            use_pallas=self.use_pallas,
        )
        # one batched transfer for all three outputs (separate np.asarray
        # fetches pay a device round trip each)
        return jax.device_get((scores, docs, hits))

    def search_batch(
        self,
        specs: Sequence[QuerySpec],
        k: int,
        prune: bool = True,
        two_phase: bool = True,
    ) -> list[FastResult]:
        """Score a batch of fast-path queries in ONE kernel dispatch (two for
        heavy disjunctions, where a small phase-1 pass over the highest-UB
        windows buys a tight pruning bound — the TPU re-expression of
        BlockMaxWAND's running heap threshold)."""
        B = len(specs)
        empty = FastResult(
            np.full(k, -np.inf, np.float32), np.zeros(k, np.int64), 0, False
        )
        if self.total_len == 0:
            return [empty] * B
        rows: list[list[tuple[int, int, float]]] = []
        # per-query matched-term floor: MUST queries need all their terms,
        # SHOULD queries need >= 1 — so one require_all_terms=True dispatch
        # covers mixed batches (count >= 1 IS disjunction semantics)
        n_terms = np.ones(B, np.int32)
        pruned_flags = [False] * B
        dead = [False] * B
        states: list = [None] * B
        for qi, spec in enumerate(specs):
            entries = self.term_entries(spec.terms, spec.boost)
            if spec.require_all:
                n_terms[qi] = len(spec.terms)
                if any(not runs for _, _, runs in entries):
                    dead[qi] = True   # a required term matches nothing
                    rows.append([])
                    continue
            flat = [
                (off, ln, w) for _, w, runs in entries for off, ln in runs
            ]
            if prune and not spec.require_all:
                # theta is only a valid lower bound for pure disjunctions:
                # for MUST queries the top single-term docs may not match all
                # terms, so conjunctions run unpruned (they're cheap anyway)
                state = self.pruner.analyze(entries, k)
                if state is not None:
                    states[qi] = state
                    flat, was_pruned = self.pruner.prune_with_theta(
                        state, state["theta_static"]
                    )
                    pruned_flags[qi] = was_pruned
            rows.append(flat)

        # phase 1: for heavy queries where the static bound kept most of the
        # postings, exactly score the top-UB candidate windows and use the
        # k-th best REAL score as a (much tighter) theta
        if prune and two_phase:
            escalate = [
                qi for qi in range(B)
                if states[qi] is not None
                and sum(ln for _, ln, _ in rows[qi]) > 0.7 * states[qi]["total"]
                and states[qi]["total"] >= 2 * PRUNE_MIN_POSTINGS
                and states[qi]["prunable_frac"] > 0.25
            ]
            if escalate:
                cand_rows = [
                    self.pruner.candidate_rows(states[qi]) for qi in escalate
                ]
                if any(cand_rows):
                    s1, _, _ = self._dispatch(
                        cand_rows, np.ones(len(escalate), np.int32), k, False
                    )
                    for row_i, qi in enumerate(escalate):
                        sq = s1[row_i]
                        valid = sq[sq > -np.inf]
                        # theta2 is valid only as the k-th best of >= k REAL
                        # scores (fewer candidates would overstate the bound)
                        if s1.shape[1] >= k and len(valid) >= k:
                            theta2 = float(valid[k - 1])
                            theta = max(states[qi]["theta_static"], theta2)
                            flat, was = self.pruner.prune_with_theta(
                                states[qi], theta
                            )
                            rows[qi] = flat
                            pruned_flags[qi] = pruned_flags[qi] or was

        if all(not r for r in rows):
            return [empty] * B
        scores, docs, hits = self._dispatch(
            rows, n_terms, k,
            # matched-term counting costs an extra scan; skip it for pure-OR
            # batches (n_terms floor of 1 is implied by score > 0)
            require_all=any(s.require_all for s in specs),
        )
        out = []
        kk = scores.shape[1]
        for qi, spec in enumerate(specs):
            if dead[qi] or not rows[qi]:
                out.append(empty)
                continue
            s, d, h = scores[qi], docs[qi], int(hits[qi])
            if kk < k:
                s = np.concatenate([s, np.full(k - kk, -np.inf, np.float32)])
                d = np.concatenate([d, np.zeros(k - kk, d.dtype)])
            out.append(FastResult(s, d.astype(np.int64), h, pruned_flags[qi]))
        return out


def _pow2(n: int, minimum: int = 1) -> int:
    b = minimum
    while b < n:
        b <<= 1
    return b
