"""Flagship serving program: fully-fused batched BM25 retrieval.

One jit-compiled step = score a batch of queries against a segment and return
the top-k, using the scatter-free bitonic-merge kernel (ops/merge_scoring.py):
contiguous postings-run gathers -> merge -> segmented sum -> top-k, no host
round-trips. This is the program benchmarked in bench.py against the
BASELINE.md target (≥5× QPS/chip vs a CPU replica at p99 < 20 ms) and
compile-checked by __graft_entry__.entry().
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nrtsearch_tpu.ops.bm25 import lucene_idf, precompute_impacts
from nrtsearch_tpu.ops.merge_scoring import merge_score_topk

bm25_search_step = merge_score_topk  # the flagship fused step


@dataclass
class QueryBatch:
    """Host-compiled query term tables for one batch."""

    term_offsets: np.ndarray  # int32 [B, R] (R = power-of-two padded terms)
    term_lengths: np.ndarray  # int32 [B, R]
    term_weights: np.ndarray  # float32 [B, R]
    n_terms: np.ndarray       # int32 [B]
    run_len: int              # padded per-term run length (power of two)


class BatchedBM25:
    """Batched match-query retrieval against one searchable field.

    Host side holds the term dictionary; queries compile to [B, Q] term
    tables. Wraps either a core Segment or raw packed arrays.
    """

    def __init__(
        self,
        *,
        terms: dict[str, int],
        offsets: np.ndarray,
        lengths: np.ndarray,
        doc_ids: jax.Array,
        freqs: jax.Array,
        doc_lens: jax.Array,
        live: jax.Array,
        num_docs_real: int,
        k1: float = 1.2,
        b: float = 0.75,
    ):
        self.terms = terms
        self.offsets = offsets
        self.lengths = lengths
        self.doc_ids = doc_ids
        self.freqs = freqs
        self.doc_lens = doc_lens
        self.live = live
        self.capacity = int(doc_lens.shape[0])
        self.num_docs_real = num_docs_real
        self.k1 = k1
        self.b = b
        lens_sum = float(np.asarray(doc_lens).sum())
        self.avgdl = lens_sum / max(num_docs_real, 1)
        # refresh-time precompute: per-posting impacts with deletions folded in
        self.impacts = precompute_impacts(
            doc_ids, freqs, doc_lens, live,
            jnp.float32(k1), jnp.float32(b), jnp.float32(self.avgdl),
        )

    @classmethod
    def from_segment(cls, segment, field: str) -> "BatchedBM25":
        tfi = segment.fields[field]
        return cls(
            terms=tfi.terms,
            offsets=tfi.offsets,
            lengths=tfi.lengths,
            doc_ids=tfi.doc_ids,
            freqs=tfi.freqs,
            doc_lens=tfi.doc_lens,
            live=segment.live,
            num_docs_real=segment.num_docs,
        )

    def compile_queries(
        self, queries: Sequence[Sequence[str]], max_terms: int = 8
    ) -> QueryBatch:
        """Analyzed query terms -> padded [B, R] run tables (R power of two).

        High-df terms are chunked into fixed-length runs (plan_runs) so the
        merged width tracks the true postings touched, not terms x max df."""
        from nrtsearch_tpu.ops.merge_scoring import plan_runs

        B = len(queries)
        offs = np.zeros((B, max_terms), np.int64)
        lens = np.zeros((B, max_terms), np.int32)
        weights = np.zeros((B, max_terms), np.float32)
        n_terms = np.zeros(B, np.int32)
        for qi, qterms in enumerate(queries):
            n_terms[qi] = min(len(qterms), max_terms)
            for ti, term in enumerate(qterms[:max_terms]):
                tid = self.terms.get(term)
                if tid is None:
                    continue
                offs[qi, ti] = self.offsets[tid]
                lens[qi, ti] = self.lengths[tid]
                weights[qi, ti] = lucene_idf(self.num_docs_real, int(self.lengths[tid]))
        run_offs, run_lens, run_w, run_len = plan_runs(
            offs, lens, weights, max_run=int(self.doc_ids.shape[0])
        )
        return QueryBatch(run_offs, run_lens, run_w, n_terms, run_len)

    def compile_query_batches(
        self, batches: Sequence[Sequence[Sequence[str]]], max_terms: int = 8
    ) -> list[QueryBatch]:
        """Compile several batches with ONE shared (run_len, R) so they all hit
        the same compiled program (steady-state serving)."""
        all_queries = [q for batch in batches for q in batch]
        joint = self.compile_queries(all_queries, max_terms)
        out = []
        i = 0
        for batch in batches:
            n = len(batch)
            out.append(
                QueryBatch(
                    joint.term_offsets[i : i + n],
                    joint.term_lengths[i : i + n],
                    joint.term_weights[i : i + n],
                    joint.n_terms[i : i + n],
                    joint.run_len,
                )
            )
            i += n
        return out

    def compile_queries_bucketed(
        self, queries: Sequence[Sequence[str]], max_terms: int = 8
    ) -> list[tuple[QueryBatch, list[int]]]:
        """Width-class split: one heavy query (true width in (W/2, W]) forces
        the whole batch to the next pow2 width, doubling every light query's
        cost. When separating the heavy tail at least halves the main
        group's width, plan two sub-batches instead (kernel cost is
        B x width, so 31 light @ W/2 + 1 heavy @ W beats 32 @ W by ~2x).
        Returns [(QueryBatch, original query indices)]."""
        full = self.compile_queries(queries, max_terms)
        W = full.run_len * full.term_offsets.shape[1]
        widths = []
        for q in queries:
            qb = self.compile_queries([q], max_terms)
            widths.append(qb.run_len * qb.term_offsets.shape[1])
        light_idx = [i for i, w in enumerate(widths) if w <= W // 2]
        heavy_idx = [i for i, w in enumerate(widths) if w > W // 2]
        if not heavy_idx or not light_idx:
            return [(full, list(range(len(queries))))]
        light = self.compile_queries([queries[i] for i in light_idx], max_terms)
        if light.run_len * light.term_offsets.shape[1] > W // 2:
            return [(full, list(range(len(queries))))]
        heavy = self.compile_queries([queries[i] for i in heavy_idx], max_terms)
        return [(light, light_idx), (heavy, heavy_idx)]

    def search(self, batch: QueryBatch, k: int = 10, require_all_terms: bool = False):
        return bm25_search_step(
            self.doc_ids,
            self.impacts,
            jnp.asarray(batch.term_offsets),
            jnp.asarray(batch.term_lengths),
            jnp.asarray(batch.term_weights),
            jnp.asarray(batch.n_terms),
            run_len=batch.run_len,
            k=k,
            require_all_terms=require_all_terms,
            use_pallas=_on_tpu(),
        )

    def attach_maxscore(self) -> "PrunedIndexHandle":
        """Build the MaxScore pruned-search engine (core/maxscore.py) over
        the already-device-resident packed postings. Zero extra device
        memory: PrunedIndex shares doc_ids/impacts; it only adds per-term
        impact upper bounds (one [P/512] device reduce + host pull).

        This is the TPU analogue of Lucene enabling impacts/BlockMaxWAND on
        its BulkScorer (reference server/search/MyIndexSearcher.java): the
        serving dispatch touches only postings that can still reach the
        top-k, with a certify-or-escalate guarantee of exactness.
        """
        from nrtsearch_tpu.core.maxscore import PrunedIndex

        self.maxscore = PrunedIndex(
            self.doc_ids, self.impacts,
            np.asarray(self.offsets, np.int64),
            np.asarray(self.lengths, np.int32),
            self.num_docs_real,
        )
        return self.maxscore

    def attach_bucket(self, bucket_docs: int = 16384):
        """Build the bucket-local retrieval index (ops/bucket_retrieval.py)
        over the already-device-resident packed postings: per-(term, bucket)
        split offsets — the TPU analogue of Lucene's skip data (reference
        lucene Lucene90SkipReader via MyIndexSearcher's BulkScorer loop).
        Host-side metadata only; postings stay shared with the fused path."""
        from nrtsearch_tpu.ops.bucket_retrieval import BucketIndex

        self.bucket_idx = BucketIndex.build(
            np.asarray(self.doc_ids), np.asarray(self.impacts),
            np.asarray(self.offsets, np.int64),
            np.asarray(self.lengths, np.int32),
            capacity=self.capacity, bucket_docs=bucket_docs,
        )
        self._assert_bucket_padding(self.bucket_idx)
        return self.bucket_idx

    def bucket_entries(self, queries, max_terms: int = 8):
        """Analyzed query term lists -> [(term_id, idf weight)] per query."""
        out = []
        for qterms in queries:
            ents = []
            for term in list(qterms)[:max_terms]:
                tid = self.terms.get(term)
                if tid is None or not self.lengths[tid]:
                    continue
                ents.append(
                    (tid,
                     float(lucene_idf(self.num_docs_real, int(self.lengths[tid]))))
                )
            out.append(ents)
        return out

    def plan_bucket(self, queries, *, max_terms: int = 8,
                    force_caps: tuple = (), force_tile: int = 0):
        from nrtsearch_tpu.ops.bucket_retrieval import plan_bucket_batch

        return plan_bucket_batch(
            self.bucket_idx, self.bucket_entries(queries, max_terms),
            self.offsets, max_terms=max_terms,
            force_caps=force_caps, force_tile=force_tile,
        )

    def serve_bucket_batch(self, plan, k: int):
        """Dispatch one planned batch on the bucket-local kernel. Returns
        device arrays (rank_keys [B,k], doc ids [B,k], hits [B]) — decode
        scores with ops.bucket_retrieval.decode_topk(plan.scales) after
        forcing, so serving can pipeline readback."""
        from nrtsearch_tpu.ops.bucket_retrieval import bucket_search_topk

        idx = self.bucket_idx
        return bucket_search_topk(
            self.doc_ids, self.impacts,
            jnp.asarray(plan.term_offs), jnp.asarray(plan.bounds),
            jnp.asarray(plan.weights), jnp.asarray(plan.n_terms),
            T=plan.term_offs.shape[1], caps=plan.caps, tile=plan.tile,
            bucket_bits=idx.bucket_bits, m=idx.n_buckets, k=k,
            interpret=not _on_tpu(),
        )

    def attach_dense(self, *, max_rows: int = 256, min_df: int | None = None,
                     bucket_docs: int = 32768, residual: bool = False):
        """Build the dense-head + sparse-tail index (ops/dense_head.py):
        head terms become bf16 dense impact rows scored on the MXU; the
        sparse bucket kernel keeps only the genuinely-sparse tail. The TPU
        answer to Lucene's impact-ordered BulkScorer hot loop (reference
        server/search/MyIndexSearcher.java:79). ``residual=True`` also
        builds Dekker residual rows: the fused path's head scores become
        ~f32-exact at 2x the head HBM."""
        from nrtsearch_tpu.ops.dense_head import DenseHeadIndex

        self.dense_idx = DenseHeadIndex.build(
            np.asarray(self.doc_ids), np.asarray(self.impacts),
            np.asarray(self.offsets, np.int64),
            np.asarray(self.lengths, np.int32),
            capacity=self.capacity,
            max_rows=max_rows, min_df=min_df, bucket_docs=bucket_docs,
            residual=residual,
        )
        self._assert_bucket_padding(self.dense_idx.tail)
        return self.dense_idx

    def plan_dense(self, queries, *, max_terms: int = 8,
                   force_caps: tuple = (), force_tile: int = 0):
        from nrtsearch_tpu.ops.dense_head import plan_dense_batch

        return plan_dense_batch(
            self.dense_idx, self.bucket_entries(queries, max_terms),
            self.offsets, max_terms=max_terms,
            force_caps=force_caps, force_tile=force_tile,
        )

    def serve_dense_batch(self, plan, k: int):
        """Dispatch one planned batch on the dense+tail path. Returns the
        packed [B, 2k+1] device array (ops.dense_head.decode_packed)."""
        from nrtsearch_tpu.ops import dense_head

        return dense_head.dispatch(
            self.dense_idx, plan, self.doc_ids, self.impacts, k,
            interpret=not _on_tpu(),
        )

    def plan_dense_merge(self, queries, *, max_terms: int = 8,
                         force_run_len: int = 0):
        from nrtsearch_tpu.ops.dense_head import plan_dense_merge

        return plan_dense_merge(
            self.dense_idx, self.bucket_entries(queries, max_terms),
            self.offsets, self.lengths, max_terms=max_terms,
            force_run_len=force_run_len,
        )

    def serve_dense_merge(self, plan, k: int, *, exact_counts: bool = False):
        """Dispatch one planned batch on the dense-head + merge-tail path
        (ops/dense_head.dense_merge_topk — the round-4 default). Returns the
        packed [B, 2k+2] device array (ops.dense_head.decode_packed2)."""
        from nrtsearch_tpu.ops import dense_head

        return dense_head.dispatch_merge(
            self.dense_idx, plan, self.doc_ids, self.impacts, k,
            exact_counts=exact_counts, use_pallas=_on_tpu(),
        )

    def serve_dense_fused(self, plan, k: int, **kw):
        """Dispatch one planned batch on the round-5 FUSED dense path
        (ops/dense_fused.dense_fused_topk): compact-row head matmul +
        slice-gather combine, exact docs/scores/hits. Returns the packed
        [B, 2k+2] device array (ops.dense_head.decode_packed2)."""
        from nrtsearch_tpu.ops.dense_fused import dispatch_fused

        return dispatch_fused(
            self.dense_idx, plan, self.doc_ids, self.impacts, k,
            use_pallas=_on_tpu(), **kw,
        )

    def _assert_bucket_padding(self, idx):
        """The gather kernel's DMA for a slot can read up to
        cap + _DMA_ROWS*128 past an aligned run start; the postings arrays
        must carry that much slack past the last valid posting."""
        from nrtsearch_tpu.ops.bucket_retrieval import _DMA_ROWS

        valid = int(
            (np.asarray(self.offsets, np.int64)
             + np.asarray(self.lengths, np.int64)).max()
        )
        pad = int(self.doc_ids.shape[0]) - valid
        need = (1 << idx.bucket_bits) + 2 * _DMA_ROWS * 128
        if pad < need:
            raise ValueError(
                f"postings padding {pad} < bucket DMA slack {need}; "
                f"repack with more tail padding"
            )

    def maxscore_queries(self, queries, max_terms: int = 8) -> list[dict]:
        """Analyzed query term lists -> PrunedIndex query dicts."""
        out = []
        for qterms in queries:
            entries = []
            for term in list(qterms)[:max_terms]:
                tid = self.terms.get(term)
                if tid is None or not self.lengths[tid]:
                    continue
                w = lucene_idf(self.num_docs_real, int(self.lengths[tid]))
                entries.append((w, [tid]))
            out.append({"entries": entries, "require_all": False,
                        "n_terms": 1})
        return out

    def serve_maxscore_batch(self, queries, k: int, *, max_terms: int = 8,
                             shape_log: dict = None,
                             force_theta=(0, 0), force_essential=(0, 0),
                             force_full=(0, 0)):
        """One serving batch on the MaxScore path: theta dispatch ->
        split -> essential dispatch -> probe/finish -> certify-or-escalate.
        Shapes can be frozen (force_*) so steady-state batches reuse the
        compiled programs. Returns (scores [B,k], docs [B,k], hits [B],
        n_pruned) — n_pruned counts queries whose results came from the
        pruned path (their hit counts are lower bounds); the rest escalated
        to (or were planned onto) the exact full-width dispatch."""
        tq = self.maxscore_queries(queries, max_terms)
        results = self.maxscore.search(
            tq, k, shape_log=shape_log, force_theta=force_theta,
            force_essential=force_essential, force_full=force_full,
        )
        scores = np.stack([r[0] for r in results])
        docs = np.stack([r[1] for r in results])
        hits = np.asarray([r[2] for r in results], np.int64)
        n_pruned = sum(1 for r in results if not r[3])
        return scores, docs, hits, n_pruned



def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pad_pow2(n: int, minimum: int = 128) -> int:
    b = minimum
    while b < n:
        b <<= 1
    return b


class SyntheticCorpus:
    """Zipf-distributed synthetic corpus for benchmarks and dryruns.

    Generates packed postings directly (no host analysis loop) so large
    corpora build fast: term frequencies follow a Zipf law like natural
    text, doc lengths are lognormal.
    """

    def __init__(
        self,
        num_docs: int,
        vocab_size: int = 50_000,
        avg_doc_len: int = 64,
        seed: int = 0,
    ):
        rng = np.random.default_rng(seed)
        self.num_docs = num_docs
        self.vocab_size = vocab_size
        # doc lengths (unique terms per doc)
        doc_lens = np.maximum(
            rng.lognormal(np.log(avg_doc_len), 0.4, num_docs).astype(np.int64), 4
        )
        total = int(doc_lens.sum())
        # Zipf term draw
        ranks = np.arange(1, vocab_size + 1)
        probs = 1.0 / ranks
        probs /= probs.sum()
        terms = rng.choice(vocab_size, size=total, p=probs).astype(np.int32)
        docs = np.repeat(np.arange(num_docs, dtype=np.int32), doc_lens)
        # collapse duplicates within a doc -> (doc, term) with freq
        key = docs.astype(np.int64) * vocab_size + terms
        uniq, counts = np.unique(key, return_counts=True)
        u_docs = (uniq // vocab_size).astype(np.int32)
        u_terms = (uniq % vocab_size).astype(np.int32)
        # sort by term, then doc (postings layout)
        order = np.lexsort((u_docs, u_terms))
        self.post_docs = u_docs[order]
        self.post_freqs = counts[order].astype(np.float32)
        post_terms = u_terms[order]
        # per-term offset table
        self.term_offsets = np.zeros(vocab_size, np.int64)
        self.term_lengths = np.zeros(vocab_size, np.int32)
        t_uniq, t_start, t_count = np.unique(
            post_terms, return_index=True, return_counts=True
        )
        self.term_offsets[t_uniq] = t_start
        self.term_lengths[t_uniq] = t_count
        self.doc_lens = np.zeros(num_docs, np.float32)
        np.add.at(self.doc_lens, u_docs, counts)
        self.rng = rng

    def to_model(self) -> BatchedBM25:
        from nrtsearch_tpu.ops.pallas_merge import GATHER_TILE

        d_pad = _pad_pow2(self.num_docs)
        # tail padding: the merge gather reads up to 2*GATHER_TILE past a run
        # start; the bucket gather up to bucket_docs (<= 32768) + DMA slack
        p_pad = _pad_pow2(len(self.post_docs) + max(2 * GATHER_TILE, 34816))
        doc_ids = np.zeros(p_pad, np.int32)
        doc_ids[: len(self.post_docs)] = self.post_docs
        freqs = np.zeros(p_pad, np.float32)
        freqs[: len(self.post_freqs)] = self.post_freqs
        lens = np.zeros(d_pad, np.float32)
        lens[: self.num_docs] = self.doc_lens
        live = np.zeros(d_pad, bool)
        live[: self.num_docs] = True
        terms = {str(t): t for t in range(self.vocab_size)}
        model = BatchedBM25(
            terms=terms,
            offsets=self.term_offsets,
            lengths=self.term_lengths,
            doc_ids=jax.device_put(doc_ids),
            freqs=jax.device_put(freqs),
            doc_lens=jax.device_put(lens),
            live=jax.device_put(live),
            num_docs_real=self.num_docs,
        )
        return model

    def sample_queries(self, batch: int, terms_per_query: int = 4) -> list[list[str]]:
        """Queries drawn from the same Zipf distribution (like real workloads)."""
        ranks = np.arange(1, self.vocab_size + 1)
        probs = 1.0 / ranks
        probs /= probs.sum()
        qs = self.rng.choice(self.vocab_size, size=(batch, terms_per_query), p=probs)
        return [[str(t) for t in row] for row in qs]
