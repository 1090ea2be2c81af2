"""Impact-tiered postings: exact top-k over a fraction of the postings.

The block-max window pruner (round 2a) pruned by DOC RANGE, which fails on
Zipf workloads: a high-df term has a strong scorer in nearly every doc
window, so window upper bounds stay flat and ~97% of postings survive. This
module prunes by CONTRIBUTION instead — the impact-ordered /
score-at-a-time family (JASS, anytime ranking; Lucene's impacts serve the
same role inside BlockMaxWAND), with an absolute score budget:

  For each term run, partition the (doc-sorted) postings into
    tier-1: entries whose score contribution  w_t * impact  >  TIER_EPS
    tier-2: the rest (contributions that cannot matter beyond TIER_EPS),
  both internally doc-sorted (stable partition), stored back to back.
  w_t is the term's idf, known at build time, so the split is exact in
  SCORE units: a df~N stopword (idf ~ 0) goes almost entirely tier-2 while
  an informative mid-frequency term stays fully tier-1 — precisely the
  split BM25 top-k needs. A query's phase-1 dispatch merges tier-1 runs
  only; its total missed mass per doc is bounded by
      missing_max = sum_t w_q,t * cut_t   (<= n_terms * TIER_EPS for
                                           unboosted queries)
  where cut_t is the max tier-2 impact actually stored (query-time boosts
  just scale the bound — correctness never depends on the build heuristic).

  Phase-1 scores are LOWER bounds (a doc may have tier-2 entries). Exactness
  is restored in two cheap host steps over the top window W >> k returned by
  the kernel:
    1. rescore the W candidates exactly against the FULL postings (host
       binary search per (term, doc) — microseconds), and
    2. certify: every doc outside the window has true score
          <= phase1(W-th) + missing_max
       so if the k-th EXACT rescored score clears that bound, the top-k is
       provably the true top-k (docs and scores exact).
  Certification failure (e.g. all-stopword queries, adversarially flat
  score distributions) falls back to the unpruned full-width dispatch —
  correctness never depends on skew.

Total hit counts from phase-1 undercount (tier-2-only matches are unseen);
callers report GREATER_THAN_OR_EQUAL_TO, the same contract Lucene exposes
under WAND.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

TIER_EPS = 0.05      # tier-2 holds contributions (idf * impact) <= this
WINDOW_MIN = 1024    # rescore window: pow2(max(4k, WINDOW_MIN))


@dataclass
class TieredPostings:
    """Impact-partitioned reordering of one flat postings space."""

    order: np.ndarray       # int64 [P]: new position -> original position
    t1_lens: np.ndarray     # int32 per term: tier-1 length
    cuts: np.ndarray        # float32 per term: max tier-2 impact (0 if none)

    @staticmethod
    def build(
        host_impacts: np.ndarray,   # float32 [P] per-entry impacts
        offsets: np.ndarray,        # int64 [T] term run starts
        lengths: np.ndarray,        # int32 [T] term run lengths
        weights: np.ndarray,        # float32 [T] per-run idf (build heuristic)
        eps: Optional[float] = None,
    ) -> "TieredPostings":
        """Vectorized build: one lexsort over (term, tier2?, original index)
        yields the stable partition for every run at once."""
        eps = TIER_EPS if eps is None else eps
        P = len(host_impacts)
        T = len(offsets)
        term_of = np.zeros(P, np.int32)
        starts = offsets[lengths > 0]
        if len(starts):
            term_ids = np.nonzero(lengths > 0)[0].astype(np.int32)
            term_of[starts] = term_ids
            # forward-fill term ids across each run (runs are contiguous)
            np.maximum.accumulate(term_of, out=term_of)
        w = np.maximum(np.asarray(weights, np.float64), 1e-12)
        thresh = (eps / w).astype(np.float32)          # impact cut per run
        tier2 = host_impacts <= thresh[term_of]
        t1_lens = np.zeros(T, np.int64)
        if P:
            np.add.at(t1_lens, term_of[~tier2], 1)
        cuts = np.zeros(T, np.float32)
        if tier2.any():
            np.maximum.at(cuts, term_of[tier2], host_impacts[tier2])
        order = np.lexsort((np.arange(P), tier2, term_of))
        return TieredPostings(
            order=order, t1_lens=t1_lens.astype(np.int32), cuts=cuts
        )


def exact_rescore(
    docs: np.ndarray,            # candidate global doc ords [W]
    term_runs: Sequence[tuple[float, np.ndarray, np.ndarray]],
    # per term: (weight, doc-sorted host doc ids, host impacts) — ORIGINAL
    # (untiered) order, possibly several runs per term (segments)
) -> np.ndarray:
    """Exact scores of candidate docs from the full postings (host binary
    search per (term, run)); O(W log P) — microseconds for W ~ 256."""
    scores = np.zeros(len(docs), np.float64)
    for w, ids, imps in term_runs:
        if w == 0.0 or len(ids) == 0:
            continue
        pos = np.searchsorted(ids, docs)
        pos_c = np.minimum(pos, len(ids) - 1)
        hit = ids[pos_c] == docs
        scores += np.where(hit, w * imps[pos_c], 0.0)
    return scores.astype(np.float32)


def certify_window(
    phase1_scores: np.ndarray,   # [W] kernel scores (lower bounds), -inf pad
    exact_scores: np.ndarray,    # [W] exact rescored scores of those docs
    docs: np.ndarray,            # [W] candidate doc ords (tie-break key)
    k: int,
    missing_max: float,
) -> Optional[np.ndarray]:
    """Return the indices (into the window) of the certified exact top-k,
    sorted (score desc, doc asc), or None when the window cannot be
    certified (caller escalates to the full-width dispatch).

    Bound on any doc NOT in the window: its phase-1 score is <= the
    window's last score when the window is full, and its TIER-1 score is 0
    when the window is not full (it matched no tier-1 entry at all — e.g. a
    doc whose every matching entry is tier-2); either way its true score
    adds at most missing_max."""
    valid = phase1_scores > -np.inf
    n_valid = int(valid.sum())
    if n_valid == 0:
        # no tier-1 matches anywhere: exact (empty) only if nothing can hide
        return np.empty(0, np.int64) if missing_max == 0.0 else None
    # exact ordering with the Lucene tie-break (score desc, doc id asc)
    order = np.lexsort((docs[:n_valid], -exact_scores[:n_valid]))
    window_full = n_valid == len(phase1_scores)
    if n_valid < k:
        # fewer candidates than k: unseen tier-2-only docs could fill ranks
        # unless no term has a tier-2 at all
        return order if missing_max == 0.0 else None
    kth_exact = float(exact_scores[:n_valid][order[k - 1]])
    outside_phase1 = float(phase1_scores[n_valid - 1]) if window_full else 0.0
    bound = outside_phase1 + missing_max
    # strict inequality + f32-rounding guard: ties across the boundary (or
    # 1-ulp phase-1 rounding) escalate instead of risking a wrong tie-break
    if kth_exact > bound + 1e-5 * max(1.0, abs(bound)):
        return order[:k]
    return None


class TieredIndex:
    """Impact-tiered postings + the certify-or-escalate search over them.

    Owns ONE device copy of the postings, reordered so every run is
    [tier-1 | tier-2] (both doc-sorted). Used by the serving packed view
    (core/packed_view.py) and the bench model (models/flagship.py).
    """

    def __init__(
        self,
        host_ids: np.ndarray,      # int32/int64 [P] ORIGINAL doc-sorted order
        host_impacts: np.ndarray,  # float32 [P]
        run_offsets: np.ndarray,   # int64 [NR] contiguous ascending runs
        run_lengths: np.ndarray,   # int32 [NR]
        run_weights: np.ndarray,   # float32 [NR] per-run idf (tiering heuristic)
        max_doc: int,
        pad_slack: int,
    ):
        import jax
        import jax.numpy as jnp

        self.max_doc = max_doc
        self.host_ids = np.asarray(host_ids)
        self.host_impacts = np.asarray(host_impacts)
        self.run_offsets = np.asarray(run_offsets, np.int64)
        self.run_lengths = np.asarray(run_lengths, np.int32)
        tiers = TieredPostings.build(
            self.host_impacts, self.run_offsets, self.run_lengths,
            np.asarray(run_weights, np.float32),
        )
        self.t1_lens = tiers.t1_lens
        self.cuts = tiers.cuts
        P = len(self.host_ids)
        p_pad = _pow2(P + pad_slack)
        ids_t = np.zeros(p_pad, np.int32)
        ids_t[:P] = self.host_ids[tiers.order]
        imps_t = np.zeros(p_pad, np.float32)
        imps_t[:P] = self.host_impacts[tiers.order]
        self.doc_ids = jax.device_put(ids_t)
        self.impacts = jax.device_put(imps_t)
        self.use_pallas = _on_tpu()

    @classmethod
    def from_device(
        cls,
        device_ids,                # int32 [P_pad] DEVICE, global ords
        device_impacts,            # float32 [P_pad] DEVICE, live-folded
        run_offsets: np.ndarray,
        run_lengths: np.ndarray,
        max_doc: int,
    ) -> "TieredIndex":
        """Untiered index over DEVICE-resident postings: no host mirror, no
        impact partition, no host->device upload. This is the serving
        default (full-width dispatch): the packed multi-segment view builds
        its global arrays on device from the segments' existing buffers, so
        an NRT refresh never re-ships postings through the host. Phase-1
        (tier-pruned) search is unavailable; callers must pass
        allow_phase1=False (search_batch's prune=False does)."""
        self = cls.__new__(cls)
        self.max_doc = max_doc
        self.host_ids = None
        self.host_impacts = None
        self.run_offsets = np.asarray(run_offsets, np.int64)
        self.run_lengths = np.asarray(run_lengths, np.int32)
        self.t1_lens = self.run_lengths
        self.cuts = np.zeros(len(self.run_lengths), np.float32)
        self.doc_ids = device_ids
        self.impacts = device_impacts
        self.use_pallas = _on_tpu()
        return self

    # -- run helpers ---------------------------------------------------------

    def t1_run(self, r: int) -> tuple[int, int]:
        return int(self.run_offsets[r]), int(self.t1_lens[r])

    def full_runs(self, r: int) -> list[tuple[int, int]]:
        off, l1 = int(self.run_offsets[r]), int(self.t1_lens[r])
        l2 = int(self.run_lengths[r]) - l1
        out = []
        if l1:
            out.append((off, l1))
        if l2:
            out.append((off + l1, l2))
        return out

    def rescore_runs(self, entries) -> list[tuple[float, np.ndarray, np.ndarray]]:
        """(weight, doc-sorted ids, impacts) triples for exact_rescore."""
        out = []
        for w, run_idxs in entries:
            for r in run_idxs:
                off, ln = int(self.run_offsets[r]), int(self.run_lengths[r])
                out.append((w, self.host_ids[off : off + ln],
                            self.host_impacts[off : off + ln]))
        return out

    def missing_max(self, entries) -> float:
        """sum_t w_t * cut_t; a doc lives in ONE segment, so its missing
        tier-2 mass per term is bounded by that term's max run cut."""
        total = 0.0
        for w, run_idxs in entries:
            if run_idxs:
                total += w * float(max(self.cuts[r] for r in run_idxs))
        return total

    # -- search ----------------------------------------------------------------

    def _dispatch(self, rows, n_terms, k: int, require_all: bool,
                  filter_mask=None, additive=None, sort=None, force=(0, 0)):
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
        scores, docs, hits = merge_score_topk(
            self.doc_ids, self.impacts,
            jnp.asarray(offs), jnp.asarray(lens), jnp.asarray(weights),
            jnp.asarray(np.asarray(n_terms, np.int32)),
            run_len=run_len, k=min(k, max(self.max_doc, 1)),
            require_all_terms=require_all,
            use_pallas=self.use_pallas,
            filter_mask=filter_mask,
            additive=additive,
            sort_keys=None if sort is None else sort[0],
            sort_ascending=True if sort is None else bool(sort[1]),
        )
        return jax.device_get((scores, docs, hits)), (run_len, offs.shape[1])

    def search(
        self,
        queries: Sequence[dict],
        k: int,
        shape_log: Optional[dict] = None,
        force_phase1=(0, 0),
        force_full=(0, 0),
        allow_phase1: bool = True,
    ) -> list[tuple[np.ndarray, np.ndarray, int, bool]]:
        """Certify-or-escalate batched search.

        Each query dict: ``entries`` [(weight, [run_idx, ...])] per term,
        ``require_all`` bool, ``n_terms`` int, ``filter`` (device [max_doc]
        bool or None; host filter values are gathered for the rescore).

        Returns per query (scores [k] f32 -inf padded, docs [k] int64,
        total_hits, exact) — ``exact`` False means hits are a lower bound
        (the WAND relation contract)."""
        B = len(queries)
        W = _pow2(max(4 * k, WINDOW_MIN))
        results: list = [None] * B

        # phase 1: tier-1 runs for certifiable disjunctions
        # additive-scored queries skip phase 1: the host rescore/certify
        # math covers postings mass only, not the columnar additive term
        p1_idx = [
            i for i, q in enumerate(queries)
            if allow_phase1 and not q.get("require_all") and q["entries"]
            and q.get("additive") is None and q.get("sort") is None
        ]
        escalate: list[int] = [
            i for i, q in enumerate(queries)
            if q["entries"] and (q.get("require_all") or not allow_phase1
                                 or q.get("additive") is not None
                                 or q.get("sort") is not None)
        ]
        for i, q in enumerate(queries):
            if not q["entries"]:
                results[i] = (
                    np.full(k, -np.inf, np.float32), np.zeros(k, np.int64),
                    0, True,
                )
        if p1_idx:
            groups = _group_by_filter([queries[i] for i in p1_idx], p1_idx)
            for (fmask, addv, _srt), idxs in groups:
                rows = [
                    [
                        (off, ln, w)
                        for w, runs in queries[i]["entries"]
                        for off, ln in [self.t1_run(r) for r in runs]
                        if ln
                    ]
                    for i in idxs
                ]
                (s1, d1, h1), shp = self._dispatch(
                    rows, [1] * len(idxs), W, False, filter_mask=fmask,
                    additive=addv, force=force_phase1,
                )
                if shape_log is not None:
                    prev = shape_log.get("phase1", (0, 0))
                    shape_log["phase1"] = (
                        max(prev[0], shp[0]), max(prev[1], shp[1])
                    )
                for row_i, i in enumerate(idxs):
                    q = queries[i]
                    cand_docs = d1[row_i].astype(np.int64)
                    # no filter correction needed: the kernel gates
                    # contributions, so every doc in the window passed the
                    # filter, and the rescore sums the same (unfiltered)
                    # postings mass the full dispatch would
                    exact = exact_rescore(
                        cand_docs, self.rescore_runs(q["entries"])
                    )
                    mm = self.missing_max(q["entries"])
                    sel = certify_window(s1[row_i], exact, cand_docs, k, mm)
                    if sel is None:
                        escalate.append(i)
                        continue
                    out_s = np.full(k, -np.inf, np.float32)
                    out_d = np.zeros(k, np.int64)
                    out_s[: len(sel)] = exact[sel]
                    out_d[: len(sel)] = cand_docs[sel]
                    # mm == 0: every term is fully tier-1, so this WAS the
                    # full dispatch — the hit count is exact, not a bound
                    results[i] = (out_s, out_d, int(h1[row_i]), mm == 0.0)

        # phase 2: full-width dispatch for MUST queries + failed certifications
        if escalate:
            groups = _group_by_filter([queries[i] for i in escalate], escalate)
            for (fmask, addv, srt), idxs in groups:
                rows = [
                    [
                        (off, ln, w)
                        for w, runs in queries[i]["entries"]
                        for r in runs
                        for off, ln in self.full_runs(r)
                    ]
                    for i in idxs
                ]
                n_terms = [queries[i]["n_terms"] for i in idxs]
                req = any(queries[i].get("require_all") for i in idxs)
                (s2, d2, h2), shp = self._dispatch(
                    rows, n_terms, k, req, filter_mask=fmask, additive=addv,
                    sort=srt, force=force_full,
                )
                if shape_log is not None:
                    prev = shape_log.get("full", (0, 0))
                    shape_log["full"] = (
                        max(prev[0], shp[0]), max(prev[1], shp[1])
                    )
                for row_i, i in enumerate(idxs):
                    kk = s2[row_i].shape[0]
                    out_s = np.full(k, -np.inf, np.float32)
                    out_d = np.zeros(k, np.int64)
                    out_s[: min(k, kk)] = s2[row_i][:k]
                    out_d[: min(k, kk)] = d2[row_i][:k].astype(np.int64)
                    results[i] = (out_s, out_d, int(h2[row_i]), True)
        return results


def _group_by_filter(queries, idxs):
    """Group query indices by (filter, additive, sort) identity so one
    dispatch shares one [D] array set (per-query [B, D] arrays would not
    fit HBM)."""
    groups: dict = {}
    for q, i in zip(queries, idxs):
        f, a, srt = q.get("filter"), q.get("additive"), q.get("sort")
        key = (id(f) if f is not None else None,
               id(a) if a is not None else None,
               (id(srt[0]), bool(srt[1])) if srt is not None else None)
        groups.setdefault(key, ((f, a, srt), []))[1].append(i)
    return list(groups.values())


def _on_tpu() -> bool:
    try:
        import jax

        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pow2(n: int, minimum: int = 1) -> int:
    b = minimum
    while b < n:
        b <<= 1
    return b
