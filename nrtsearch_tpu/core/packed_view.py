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

Work reduction (the Lucene impacts/BlockMaxWAND analogue) is MAXSCORE
pruning (core/maxscore.py): a tiny theta dispatch over the rarest terms
lower-bounds the k-th score, the MaxScore term split drops provably
non-competitive terms from the main dispatch, and a device-side probe
recovers the dropped mass for the candidate window exactly, with a
window-coverage certificate (escalating to the full-width dispatch when it
fails). Pruned counts are lower bounds (relation GREATER_THAN_OR_EQUAL_TO),
the same contract Lucene exposes under WAND.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field as dc_field
from typing import Optional, Sequence

import numpy as np

from nrtsearch_tpu.core.maxscore import _on_tpu
from nrtsearch_tpu.ops.bm25 import lucene_idf

@dataclass(frozen=True)
class QuerySpec:
    """One fast-path text query: analyzed terms against one field.

    ``filter`` is an optional device bool [max_doc] mask (global ords) pushed
    down into the kernel (filtered search without the dense evaluator).
    ``additive`` is an optional device f32 [max_doc] per-doc score added to
    matched docs before top-k (the columnar score mass of a decomposed
    boolean tree's non-text MUST clauses)."""

    field: str
    terms: tuple[str, ...]
    require_all: bool = False
    boost: float = 1.0
    filter: Optional[object] = dc_field(default=None, compare=False, hash=False)
    additive: Optional[object] = dc_field(default=None, compare=False, hash=False)
    # (keys f32 [max_doc] device, ascending): rank matched docs by this
    # doc-value key instead of score (field-sorted search on the fused path)
    sort: Optional[tuple] = dc_field(default=None, compare=False, hash=False)


@dataclass
class FastResult:
    scores: np.ndarray   # [k] f32, -inf padded
    docs: np.ndarray     # [k] global ords
    total_hits: int
    pruned: bool         # tier-1 certified: total_hits is a lower bound




class PackedFieldView:
    """All live segments' postings for one field, packed for fused search."""

    def __init__(self, searcher, field: str):
        from nrtsearch_tpu.core.maxscore import PrunedIndex
        from nrtsearch_tpu.ops.pallas_merge import GATHER_TILE

        self.field = field
        fd = searcher.field_defs[field]
        self.k1 = float(fd.sim_k1)
        self.b = float(fd.sim_b)
        self.avgdl = float(searcher.stats.avgdl(field))
        self.doc_count = int(searcher.stats.doc_count(field))
        self.stats = searcher.stats
        self.max_doc = int(searcher.max_doc)
        self._searcher = searcher
        self._columns: dict[str, dict] = {}

        run_off_parts, run_len_parts = [], []
        # (segment_idx, tfi, run_index_base) for term lookups
        self.seg_entries: list[tuple[int, object, int]] = []
        parts: list[tuple[object, int]] = []   # (segment, global base)
        cursor = 0
        run_base = 0
        for idx, seg in enumerate(searcher.segments):
            tfi = seg.fields.get(field)
            if tfi is None or tfi.postings_len == 0:
                continue
            base = int(searcher.bases[idx])
            parts.append((seg, base))
            run_off_parts.append(np.asarray(tfi.offsets, np.int64) + cursor)
            run_len_parts.append(np.asarray(tfi.lengths, np.int32))
            self.seg_entries.append((idx, tfi, run_base))
            run_base += len(tfi.offsets)
            cursor += tfi.postings_len
        self.total_len = cursor
        if cursor == 0:
            self.index = None
            self.host_impacts = np.empty(0, np.float32)
            return
        run_offs = np.concatenate(run_off_parts)
        run_lens = np.concatenate(run_len_parts)
        # DEVICE-SIDE build: global doc ords and live-folded impacts compute
        # from the segments' existing device buffers — an NRT refresh never
        # re-ships postings through the host (a host re-upload costs ~8
        # bytes/posting, minutes of wall clock at Lucene scale)
        dev_ids, dev_imps = _device_packed(
            self, parts, cursor, 2 * GATHER_TILE
        )
        self.host_impacts = None
        self.index = PrunedIndex(
            dev_ids, dev_imps, run_offs, run_lens, self.max_doc
        )

    # -- term plumbing ---------------------------------------------------------

    def term_entries(
        self, terms: Sequence[str], boost: float = 1.0
    ) -> list[tuple[str, float, list[int]]]:
        """Per term: (term, idf*boost weight, [run_index, ...])."""
        out = []
        for term in terms:
            df = self.stats.doc_freq(self.field, term)
            w = lucene_idf(self.doc_count, df) * boost if df else 0.0
            runs = []
            if w:
                for _, tfi, run_base in self.seg_entries:
                    tid = tfi.terms.get(term)
                    if tid is not None and tfi.lengths[tid]:
                        runs.append(run_base + tid)
            out.append((term, w, runs))
        return out

    # -- bucket-local fused path (round-3 flagship kernel) -----------------------

    _BUCKET_MAX_SLOTS = 16

    def _bucket_state(self):
        """Per-run bucket split offsets for the bucket-local kernel, computed
        ON DEVICE (the packed view keeps no host postings copy): one
        vectorized bisection over all (run, boundary) pairs — the same
        device-split trick as the chunked-timeout path. Cached per view."""
        st = getattr(self, "_bucket_st", None)
        if st is not None:
            return st
        import jax
        import jax.numpy as jnp

        from nrtsearch_tpu.ops.bucket_retrieval import BucketIndex

        bucket_docs = 16384
        bits = bucket_docs.bit_length() - 1
        cap = _pow2(self.max_doc)
        m = max(1, cap // bucket_docs)
        offs = self.index.run_offsets
        lens = self.index.run_lengths
        NR = len(offs)
        bounds = np.zeros((NR, m + 1), np.int32)
        if m > 1 and NR:
            boundaries = np.arange(1, m, dtype=np.int64) * bucket_docs
            rows = [(int(offs[r]), int(lens[r]), 1.0) for r in range(NR)]
            splits = self.index.split_rows(rows, boundaries)
            bounds[:, 1:-1] = splits[:, 1:-1]
        bounds[:, -1] = lens
        st = {
            "bounds": bounds, "bits": bits, "m": m,
            "ub": self.index.run_ub,
        }
        self._bucket_st = st
        return st

    def bucket_search_batch(self, specs: Sequence[QuerySpec], k: int):
        """Plain text queries on the bucket-local kernel
        (ops/bucket_retrieval.py): per-(query, bucket) VMEM-resident
        gather+pack, in-VMEM sort+dedup+mask, int32-key top-k. Scores are
        15-bit quantized on the query's max possible score (finer than
        Lucene's 8-bit norms); docs/hit counts exact over quantized ties.
        Returns None when any spec needs the merge path (filters, sort,
        additive, or more runs than the slot budget)."""
        import os

        import jax
        import jax.numpy as jnp

        from nrtsearch_tpu.ops import bucket_retrieval as br

        if self.total_len == 0:
            return None
        st = self._bucket_state()
        m, bits = st["m"], st["bits"]
        B = len(specs)
        per_q: list = []
        for spec in specs:
            if (spec.filter is not None or spec.additive is not None
                    or spec.sort is not None):
                return None
            entries = self.term_entries(spec.terms, spec.boost)
            if spec.require_all and any(not runs for _, _, runs in entries):
                per_q.append(None)   # dead: a required term matches nothing
                continue
            slots = [
                (r, w)
                for _, w, runs in entries if w
                for r in runs
                if self.index.run_lengths[r]
            ]
            if len(slots) > self._BUCKET_MAX_SLOTS:
                return None
            n_distinct = len(spec.terms) if spec.require_all else 1
            per_q.append((slots, spec.require_all, n_distinct))
        if all(q is None for q in per_q):
            return [
                FastResult(np.full(k, -np.inf, np.float32),
                           np.zeros(k, np.int64), 0, False)
                for _ in range(B)
            ]
        req_all = any(q is not None and q[1] for q in per_q)
        if req_all and not all(q is None or q[1] for q in per_q):
            return None  # mixed AND/OR batch: one static flag per program

        T = max(len(q[0]) for q in per_q if q is not None)
        T = max(T, 1)
        term_offs = np.zeros((B, T), np.int32)
        bounds = np.zeros((B, T, m + 1), np.int32)
        weights = np.zeros((B, T), np.float32)
        n_terms = np.ones(B, np.int32)
        scales = np.ones(B, np.float32)
        run_offsets = self.index.run_offsets
        for qi, q in enumerate(per_q):
            if q is None:
                continue
            slots, _ra, n_distinct = q
            # slot order: heaviest slice first (static DMA caps decay)
            slots = sorted(
                slots, key=lambda rw: -int(self.index.run_lengths[rw[0]])
            )
            # quantization scale: per-TERM ub (a doc hits <= 1 run per term)
            by_w: dict[float, float] = {}
            for r, w in slots:
                by_w[w] = max(by_w.get(w, 0.0), float(st["ub"][r]))
            smax = sum(w * ub for w, ub in by_w.items())
            scale = br.QMAX / smax if smax > 0 else 1.0
            scales[qi] = scale
            n_terms[qi] = n_distinct
            for ti, (r, w) in enumerate(slots):
                term_offs[qi, ti] = int(run_offsets[r])
                bounds[qi, ti] = st["bounds"][r]
                weights[qi, ti] = w * scale

        lens = bounds[:, :, 1:] - bounds[:, :, :-1]
        caps = tuple(
            max(br._DMA_ROWS * 128, -(-int(c) // 1024) * 1024)
            for c in lens.max(axis=(0, 2))
        )
        tile = _pow2(int(lens.sum(axis=1).max()), br._DMA_ROWS * 128)
        interpret = not _on_tpu()
        tk, td, hits = br.bucket_search_topk(
            self.index.doc_ids, self.index.impacts,
            jnp.asarray(term_offs), jnp.asarray(bounds),
            jnp.asarray(weights), jnp.asarray(n_terms),
            T=T, caps=caps, tile=tile, bucket_bits=bits, m=m, k=k,
            require_all=req_all, interpret=interpret,
        )
        scores_np, docs_np = br.decode_topk(
            np.asarray(tk), np.asarray(td), scales
        )
        hits = np.asarray(hits)
        out = []
        for qi, q in enumerate(per_q):
            if q is None:
                out.append(FastResult(
                    np.full(k, -np.inf, np.float32), np.zeros(k, np.int64),
                    0, False,
                ))
                continue
            d = docs_np[qi].astype(np.int64)
            out.append(FastResult(scores_np[qi], d, int(hits[qi]), False))
        return out

    # -- dense-head + merge-tail path (round-4 server default on TPU) -----------

    # H-sweep on v5e (benchmarks/dense_h_sweep.py, BENCH_r04): at 1M docs
    # H=256 -> 807 qps, H=1024 -> 1979 qps, H=2048 -> 1438 qps (HBM-bound),
    # H=4096 OOM. 1024 rows / min_df ~ max_doc/512 is the measured winner.
    _DENSE_MAX_ROWS = 1024
    _DENSE_BYTES_BUDGET = 2048 << 20  # bf16 rows budget per field view

    def _dense_state(self):
        """Lazily build the dense-head index over this view's packed
        postings: head terms (df >= min_df) become bf16 [Hp, D] impact rows
        built ON DEVICE with one flat scatter from the already-resident
        postings buffers (no host postings copy — NRT refresh ships no
        postings through the host). Cached per immutable searcher snapshot.

        Returns None when no term reaches min_df (the merge path is optimal
        there). Reference role: the impact/BlockMaxWAND machinery of
        Lucene's BulkScorer (MyIndexSearcher.java:79) — re-expressed as
        dense MXU rows (ops/dense_head.py docstring)."""
        st = getattr(self, "_dense_st", None)
        if st is not None:
            return st if st != "none" else None
        import threading

        lock = self.__dict__.setdefault("_dense_build_lock", threading.Lock())
        with lock:
            return self._dense_state_locked()

    def _dense_state_locked(self):
        # double-checked under _dense_build_lock: the eager warm thread and
        # the first query race to build the head rows — two concurrent
        # builds double the O(index) HBM cost for nothing
        st = getattr(self, "_dense_st", None)
        if st is not None:
            return st if st != "none" else None
        import jax
        import jax.numpy as jnp

        D = -(-self.max_doc // 128) * 128
        min_df = max(256, self.max_doc // 512)
        # residual rows (Dekker-corrected ~f32-exact head scores) double the
        # per-row HBM cost; NRT_DENSE_RESIDUAL=0 reclaims the capacity for
        # more head rows at the bf16 score contract
        residual = os.environ.get("NRT_DENSE_RESIDUAL", "1") != "0"
        bytes_per_row = (4 if residual else 2) * D
        max_rows = min(
            self._DENSE_MAX_ROWS, self._DENSE_BYTES_BUDGET // bytes_per_row
        )
        # per-TERM total df across segments
        df: dict[str, int] = {}
        for _, tfi, _rb in self.seg_entries:
            for term, tid in tfi.terms.items():
                ln = int(tfi.lengths[tid])
                if ln:
                    df[term] = df.get(term, 0) + ln
        head = sorted(
            (t for t, n in df.items() if n >= min_df),
            key=lambda t: (-df[t], t),
        )[:max_rows]
        if not head or max_rows <= 0:
            self._dense_st = "none"
            return None
        head_pos = {t: i for i, t in enumerate(head)}
        Hp = max(8, -(-len(head) // 8) * 8)
        # flat scatter indices: for every head (term, segment-run), the
        # positions of its postings in the packed device arrays
        gidx_parts, row_parts = [], []
        run_offs = self.index.run_offsets
        run_lens = self.index.run_lengths
        for _, tfi, rb in self.seg_entries:
            for term, row in head_pos.items():
                tid = tfi.terms.get(term)
                if tid is None or not tfi.lengths[tid]:
                    continue
                r = rb + tid
                off, ln = int(run_offs[r]), int(run_lens[r])
                gidx_parts.append(np.arange(off, off + ln, dtype=np.int64))
                row_parts.append(np.full(ln, row, np.int64))
        gidx = np.concatenate(gidx_parts)
        rowid = np.concatenate(row_parts)

        @functools.partial(jax.jit, static_argnames=("res",))
        def build(doc_ids, impacts, gidx, rowid, res):
            # 2D scatter (row, doc) — a flattened row*D+doc index would
            # overflow int32 at Hp*D > 2^31 (e.g. 256 rows x 16M docs)
            ids = doc_ids[gidx]
            imps = impacts[gidx]
            hi = imps.astype(jnp.bfloat16)
            rows = jnp.zeros((Hp, D), jnp.bfloat16)
            rows = rows.at[rowid, ids].set(hi, mode="drop")
            if not res:
                return rows, None
            # Dekker residual: bf16(imp - f32(hi)) — the fused kernel's
            # 3-product correction makes head scores ~f32-exact
            lo = (imps - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            rows_lo = jnp.zeros((Hp, D), jnp.bfloat16)
            rows_lo = rows_lo.at[rowid, ids].set(lo, mode="drop")
            return rows, rows_lo

        rows, rows_lo = build(
            self.index.doc_ids, self.index.impacts,
            jax.device_put(gidx.astype(np.int32)),
            jax.device_put(rowid.astype(np.int32)),
            residual,
        )
        row_max = jnp.max(rows, axis=1).astype(jnp.float32)
        # the largest tail (non-head) df sizes the fixed serving run_len:
        # head selection is capped at max_rows, so tail terms can carry df
        # well above min_df — runs-per-term must stay 1 for the fixed-R
        # shape to hold
        tail_max_df = max(
            (n for t, n in df.items() if t not in head_pos), default=0
        )
        st = {
            "rows": rows, "rows_lo": rows_lo, "row_max": row_max,
            "head_pos": head_pos, "D": D, "tail_max_df": int(tail_max_df),
        }
        self._dense_st = st
        return st

    def dense_search_batch(self, specs: Sequence[QuerySpec], k: int):
        """Text queries on the FUSED dense path (round 5,
        ops/dense_fused.dense_fused_topk): compact-row head matmul, tail
        runs through the narrow bitonic merge in exact f32, slice-gather
        combine — exact docs, scores, and hit counts. Filters, additive
        score columns, doc-value sorts, and all-head-term conjunctions ride
        the same dispatch (specs are grouped by shared [D]-array identity,
        one fused dispatch per group — the per-query arrays would not fit
        HBM as [B, D]). Returns None only when a spec needs the merge path
        (a conjunction with a tail term)."""
        import jax.numpy as jnp

        from nrtsearch_tpu.ops.dense_fused import dense_fused_topk
        from nrtsearch_tpu.ops.dense_head import decode_packed2

        if self.total_len == 0:
            return None
        st = self._dense_state()
        if st is None:
            return None
        head_pos = st["head_pos"]
        D = st["D"]
        B = len(specs)
        run_offs = self.index.run_offsets
        run_lens = self.index.run_lengths

        # partition specs into fused dispatch groups: one shared
        # (filter, additive, sort) array set + one static AND/OR mode each
        groups: dict = {}
        parsed = []
        for qi, spec in enumerate(specs):
            entries = self.term_entries(spec.terms, spec.boost)
            live = [(t, w, runs) for t, w, runs in entries if w and runs]
            dead = spec.require_all and any(
                not runs for _, _, runs in entries
            )
            distinct = len({t for t, _, _ in live})
            is_and = bool(spec.require_all and distinct > 1 and not dead)
            if is_and and any(t not in head_pos for t, _, _ in live):
                return None   # conjunction with a tail term: merge path
            f, a, srt = spec.filter, spec.additive, spec.sort
            key = (
                id(f) if f is not None else None,
                id(a) if a is not None else None,
                (id(srt[0]), bool(srt[1])) if srt is not None else None,
                is_and,
            )
            parsed.append((qi, spec, live, dead, distinct))
            groups.setdefault(key, []).append(qi)

        def _pad_col(x, fill=0):
            x = jnp.asarray(x)
            n = x.shape[0]
            if n == D:
                return x
            return jnp.pad(x, (0, D - n), constant_values=fill)

        empty = FastResult(
            np.full(k, -np.inf, np.float32), np.zeros(k, np.int64), 0, False
        )
        out: list = [empty] * B
        # SERVING SHAPE DISCIPLINE (PERF_E2E_r05 finding): every distinct
        # (B, U, R, run_len) mints a compiled program at tens of seconds
        # each; under diverse traffic the free-shape planner compiled
        # hundreds of programs and e2e throughput collapsed to ~2% of the
        # kernel harness. U is therefore drawn from a 2-value menu with
        # head->tail SPILL (a head term scored through its postings runs is
        # exact — same contract), and run_len from a fixed menu below.
        u_cap = int(os.environ.get("NRT_DENSE_U", "128"))
        for key, idxs in groups.items():
            _fk, _ak, _sk, is_and = key
            items = [parsed[i] for i in idxs]
            live_items = [it for it in items if not it[3]]
            if not live_items:
                continue
            Bg = len(live_items)
            used: dict[int, int] = {}
            per_q: list[list[tuple[int, float]]] = []
            rows_tail: list[list[tuple[int, int, float]]] = []
            n_req = np.ones(Bg, np.int32)
            any_tail = False
            spill_and = False
            for gi, (qi, spec, live, _dead, distinct) in enumerate(
                live_items
            ):
                merged: dict[str, float] = {}
                ent_by_term: dict[str, tuple] = {}
                for term, w, runs in live:
                    merged[term] = merged.get(term, 0.0) + w
                    ent_by_term[term] = runs
                slots: list[tuple[int, float]] = []
                row: list[tuple[int, int, float]] = []
                for term, w in merged.items():
                    r = head_pos.get(term)
                    if r is not None and (r in used or len(used) < u_cap):
                        if r not in used:
                            used[r] = len(used)
                        slots.append((used[r], w))
                    else:
                        if r is not None and is_and:
                            # a spilled term breaks the all-head
                            # conjunction contract for this whole group
                            spill_and = True
                        for run in ent_by_term[term]:
                            ln = int(run_lens[run])
                            if ln:
                                row.append((int(run_offs[run]), ln, w))
                                any_tail = True
                per_q.append(slots)
                rows_tail.append(row)
                if is_and:
                    n_req[gi] = distinct
            if spill_and:
                return None  # merge path serves the conjunction exactly
            has_head = bool(used)
            # two-value U menu: {32, u_cap} — singles and small batches
            # share one program, full batches the other
            lo = min(32, u_cap)
            U = lo if len(used) <= lo else u_cap
            W = np.zeros((Bg, U), np.float32)
            row_idx = np.zeros(U, np.int32)
            for r, slot in used.items():
                row_idx[slot] = r
            for gi, slots in enumerate(per_q):
                for slot, w in slots:
                    W[gi, slot] += w
            if any_tail:
                # ONE fixed tail shape (the rest of the shape discipline):
                # run_len and R are constants, runs chunked and padded to
                # them; a query needing more than R runs falls back to the
                # merge path (rare: tail terms have df < min_df, so a run
                # per term — >R tail terms per query). The padded width
                # R*run_len ~= the natural batch width at bench shapes, so
                # the r3 "4x-padded stream" regression does not reappear.
                # run_len covers one whole tail run for MOST tail terms
                # (clamped at 64k so one enormous tail term cannot inflate
                # everyone's merged width), so runs-per-term stays ~1 and R
                # bounds the TERMS per query; fixed per snapshot -> one
                # compiled shape
                run_len = int(
                    os.environ.get("NRT_DENSE_RL", 0)
                ) or _pow2(min(max(4096, st["tail_max_df"]), 65536))
                R_fix = int(os.environ.get("NRT_DENSE_R", "8"))
                t_offs = np.zeros((Bg, R_fix), np.int32)
                t_lens = np.zeros((Bg, R_fix), np.int32)
                t_w = np.zeros((Bg, R_fix), np.float32)
                for gi, row in enumerate(rows_tail):
                    ri = 0
                    for off, ln, w in row:
                        for start in range(0, ln, run_len):
                            if ri >= R_fix:
                                return None  # merge path
                            t_offs[gi, ri] = off + start
                            t_lens[gi, ri] = min(run_len, ln - start)
                            t_w[gi, ri] = w
                            ri += 1
            else:
                t_offs = np.zeros((Bg, 1), np.int32)
                t_lens = np.zeros((Bg, 1), np.int32)
                t_w = np.zeros((Bg, 1), np.float32)
                run_len = 0
            spec0 = live_items[0][1]
            filt = (
                _pad_col(spec0.filter) if spec0.filter is not None else None
            )
            additive = (
                _pad_col(spec0.additive)
                if spec0.additive is not None else None
            )
            if spec0.sort is not None:
                sort_keys = _pad_col(spec0.sort[0]).astype(jnp.float32)
                sort_ascending = bool(spec0.sort[1])
            else:
                sort_keys, sort_ascending = None, True
            packed = dense_fused_topk(
                st["rows"], st["row_max"],
                self.index.doc_ids, self.index.impacts,
                jnp.asarray(W), jnp.asarray(row_idx), jnp.asarray(n_req),
                jnp.asarray(t_offs), jnp.asarray(t_lens), jnp.asarray(t_w),
                filt, additive, sort_keys, st["rows_lo"],
                k=k, has_head=has_head, has_tail=any_tail, run_len=run_len,
                require_all=is_and, sort_ascending=sort_ascending,
                use_pallas=_on_tpu(),
            )
            scores, docs, hits, exact = decode_packed2(np.asarray(packed), k)
            for gi, (qi, *_rest) in enumerate(live_items):
                out[qi] = FastResult(
                    scores[gi], docs[gi].astype(np.int64), int(hits[gi]),
                    not bool(exact[gi]),
                )
        return out

    # -- doc-space chunked search (timeout inside the fused path) ---------------

    def search_timeout(
        self, spec: QuerySpec, k: int, timeout_sec: float, chunks: int = 8,
        check_every: int = 0,
    ):
        """Fused search as docid-ascending chunk dispatches with a deadline
        check between chunks (core/maxscore.py search_chunked). Returns
        (FastResult, timed_out).

        ``check_every`` honors the reference's timeoutCheckEvery live/request
        setting (search.proto:481 — docs collected between deadline checks):
        the doc-space chunk size becomes ~check_every docs, bounded to
        [1, 64] chunks so tiny values can't explode dispatch count."""
        import time as _time

        if check_every > 0:
            want = -(-int(self.index.max_doc) // max(int(check_every), 1))
            chunks = max(1, min(64, want))

        empty = FastResult(
            np.full(k, -np.inf, np.float32), np.zeros(k, np.int64), 0, False
        )
        if self.total_len == 0:
            return empty, False
        entries = self.term_entries(spec.terms, spec.boost)
        if spec.require_all and any(not runs for _, _, runs in entries):
            return empty, False
        q = {
            "entries": [(w, runs) for _, w, runs in entries if w and runs],
            "require_all": spec.require_all,
            "n_terms": len(spec.terms) if spec.require_all else 1,
            "filter": spec.filter,
            "additive": spec.additive,
            "sort": spec.sort,
        }
        if not q["entries"]:
            return empty, False
        s, d, total, timed_out = self.index.search_chunked(
            q, k, deadline=_time.time() + timeout_sec,
            chunks=min(chunks, max(1, int(self.index.max_doc))),
        )
        return FastResult(s, d, total, False), timed_out

    # -- global doc-value columns (flat in-kernel reductions) -------------------

    def global_column(self, field: str) -> dict:
        """Doc-value column laid out by GLOBAL doc ord, for in-kernel flat
        reductions (facet counts / stats over the fused kernel's match
        stream — VERDICT r2 #3). ORDINAL columns get a union dictionary
        across segments (the reference's global-ordinals role:
        SsdvOrdinalsCache / GlobalOrdinalLookup). Cached per packed view
        (segments are immutable)."""
        cached = self._columns.get(field)
        if cached is not None:
            return cached
        import jax
        import jax.numpy as jnp

        searcher = self._searcher
        max_doc = self.max_doc
        ord_union: list[str] = []
        seen: set[str] = set()
        is_ordinal = False
        for seg in searcher.segments:
            dv = seg.doc_values.get(field)
            if dv is not None and dv.ord_terms is not None:
                is_ordinal = True
                for t in dv.ord_terms:
                    if t not in seen:
                        seen.add(t)
                        ord_union.append(t)
        ord_union.sort()
        gidx = {t: i for i, t in enumerate(ord_union)}

        vals = np.zeros(max_doc, np.float64)
        present = np.zeros(max_doc, bool)
        for idx, seg in enumerate(searcher.segments):
            dv = seg.doc_values.get(field)
            if dv is None:
                continue
            base = int(searcher.bases[idx])
            n = seg.num_docs
            hp = np.asarray(dv.host_present[:n], bool)
            if is_ordinal:
                remap = np.array([gidx[t] for t in (dv.ord_terms or [])],
                                 np.int64)
                hv = np.asarray(dv.host_values[:n]).astype(np.int64)
                if len(remap):
                    safe = np.clip(hv, 0, len(remap) - 1)
                    v = np.where(hp, remap[safe], -1)
                else:
                    v = np.full(n, -1, np.int64)
            else:
                v = np.asarray(dv.host_values[:n]).astype(np.float64)
            vals[base : base + n] = np.where(hp, v, vals[base : base + n])
            present[base : base + n] = hp
        dtype = np.int32 if is_ordinal else np.float32
        out = {
            "values": jax.device_put(jnp.asarray(vals.astype(dtype))),
            "present": jax.device_put(jnp.asarray(present)),
            "ord_terms": ord_union if is_ordinal else None,
        }
        self._columns[field] = out
        return out

    # -- fused batched search -----------------------------------------------------

    def search_batch(
        self,
        specs: Sequence[QuerySpec],
        k: int,
        prune: Optional[bool] = None,
        reduce_cols=(),
        reduce_kinds=(),
    ) -> list[FastResult]:
        """Fused batched search over all segments in one dispatch.

        Path selection (round-4 TPU measurements, BENCH_r04 /
        PERF_CEILING.md): the dense-head + merge-tail path is the fastest
        measured on TPU and the default there; the full-width merge path is
        the exact general fallback (and the CPU default — the dense matmul
        only wins on the MXU). MaxScore (measured 143 qps vs 378 full-width
        on TPU) and the bucket kernel (192 qps) are opt-in via
        NRT_FAST_PATH/NRT_MAXSCORE/NRT_BUCKET. ``prune=None`` reads
        NRT_MAXSCORE (default OFF since round 4); pruned hit counts are
        lower bounds (GREATER_THAN_OR_EQUAL_TO, the Lucene WAND contract)."""
        import os as _os

        path = _os.environ.get("NRT_FAST_PATH", "")
        if not path:
            path = "dense" if _on_tpu() else "merge"
        if prune is None:
            prune = _os.environ.get("NRT_MAXSCORE", "0") == "1"
        if path in ("dense", "fused") and not reduce_kinds:
            res = self.dense_search_batch(specs, k)
            if res is not None:
                return res
        if (path == "bucket" or _os.environ.get("NRT_BUCKET", "0") == "1") \
                and not reduce_kinds:
            res = self.bucket_search_batch(specs, k)
            if res is not None:
                return res
        B = len(specs)
        empty = FastResult(
            np.full(k, -np.inf, np.float32), np.zeros(k, np.int64), 0, False
        )
        if self.total_len == 0:
            if reduce_kinds:
                from nrtsearch_tpu.core.maxscore import _zero_reductions

                return [empty] * B, [_zero_reductions(reduce_kinds)] * B
            return [empty] * B
        queries = []
        dead = [False] * B
        for qi, spec in enumerate(specs):
            entries = self.term_entries(spec.terms, spec.boost)
            if spec.require_all and any(not runs for _, _, runs in entries):
                dead[qi] = True   # a required term matches nothing
                queries.append({"entries": [], "require_all": True,
                                "n_terms": 1, "filter": None})
                continue
            queries.append({
                "entries": [(w, runs) for _, w, runs in entries if w and runs],
                "require_all": spec.require_all,
                "n_terms": len(spec.terms) if spec.require_all else 1,
                "filter": spec.filter,
                "additive": spec.additive,
                "sort": spec.sort,
            })
        # never dispatch empty queries (dead conjunctions, the batcher's
        # pad specs): a zero-run row through the Pallas merge kernel
        # faulted the TPU worker (PERF_E2E_r05 level-8 crash) — and it is
        # wasted width regardless. Dispatch the live subset, scatter back.
        live_idx = [
            qi for qi in range(B)
            if not dead[qi] and queries[qi]["entries"]
        ]
        if not live_idx:
            if reduce_kinds:
                from nrtsearch_tpu.core.maxscore import _zero_reductions

                return [empty] * B, [_zero_reductions(reduce_kinds)] * B
            return [empty] * B
        sub = [queries[qi] for qi in live_idx]
        if reduce_kinds:
            results, reds_sub = self.index.search(
                sub, k, prune=prune,
                reduce_cols=reduce_cols, reduce_kinds=reduce_kinds,
            )
        else:
            results = self.index.search(sub, k, prune=prune)
        out = [empty] * B
        for si, qi in enumerate(live_idx):
            s, d, total, count_exact = results[si]
            out[qi] = FastResult(s, d, total, not count_exact)
        if reduce_kinds:
            from nrtsearch_tpu.core.maxscore import _zero_reductions

            reds = [_zero_reductions(reduce_kinds)] * B
            for si, qi in enumerate(live_idx):
                reds[qi] = reds_sub[si]
            return out, reds
        return out


def _device_packed(view: "PackedFieldView", parts, total_len: int,
                   pad_slack: int):
    """Global (doc_ids, impacts) device arrays from segment device buffers.

    Single segment at base 0: doc_ids is the segment's own buffer (no copy
    at all, provided it carries the gather DMA slack). Otherwise: rebase +
    per-segment impacts + one device concatenate."""
    import jax
    import jax.numpy as jnp

    from nrtsearch_tpu.ops.bm25 import precompute_impacts

    field = view.field
    p_pad = _pow2(total_len + pad_slack)

    def seg_impacts(seg):
        tfi = seg.fields[field]
        return precompute_impacts(
            tfi.doc_ids, tfi.freqs, tfi.doc_lens, seg.live,
            jnp.float32(view.k1), jnp.float32(view.b), jnp.float32(view.avgdl),
        )

    if len(parts) == 1 and parts[0][1] == 0:
        seg = parts[0][0]
        tfi = seg.fields[field]
        n = int(tfi.doc_ids.shape[0])
        if n >= total_len + pad_slack:
            return tfi.doc_ids, seg_impacts(seg)

    id_parts, imp_parts = [], []
    for seg, base in parts:
        tfi = seg.fields[field]
        ln = tfi.postings_len
        id_parts.append(tfi.doc_ids[:ln] + jnp.int32(base))
        imp_parts.append(seg_impacts(seg)[:ln])
    pad = p_pad - total_len
    id_parts.append(jnp.zeros(pad, jnp.int32))
    imp_parts.append(jnp.zeros(pad, jnp.float32))
    return jnp.concatenate(id_parts), jnp.concatenate(imp_parts)


def _pow2(n: int, minimum: int = 1) -> int:
    b = minimum
    while b < n:
        b <<= 1
    return b
