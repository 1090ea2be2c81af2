"""Deep-boolean stress at Lucene scale (BASELINE.md config #3 shape).

Builds a synthetic 8.8M-doc segment (Zipf postings like MS MARCO's skew) and
drives the REAL general evaluator (core/searcher.py -> query/compiled.py)
with the filtered/sorted/faceted query shape the reference serves through
its collector stack:

  MUST   match(body, 4 terms)                 -- scored recall
  FILTER range(price) + termInSet(tag, 5)     -- numeric + term filters
  MUST_NOT term(tag)
  MUST   boolean(8 SHOULD range/term clauses) -- the deep sub-tree

measured three ways: scored top-100, doc-values sorted, and with terms
facets + sum collector over the full match set (return_arrays path).

Reports p50/p99 per shape, peak device HBM (when the backend exposes
memory_stats), and the compiled-tree vs eager-evaluator ratio.

Usage:  python benchmarks/stress_deep_boolean.py
Env:    STRESS_NUM_DOCS (default 8_800_000), STRESS_ITERS, STRESS_EAGER=0
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

NUM_DOCS = int(os.environ.get("STRESS_NUM_DOCS", 8_800_000))
VOCAB = int(os.environ.get("STRESS_VOCAB", 200_000))
AVG_LEN = int(os.environ.get("STRESS_AVG_LEN", 32))
ITERS = int(os.environ.get("STRESS_ITERS", 12))
COMPARE_EAGER = os.environ.get("STRESS_EAGER", "1") != "0"
TOP_K = 100
N_TAGS = 100


def log(msg):
    print(f"[stress] {msg}", file=sys.stderr)


def build_searcher(num_docs: int, seed: int = 7):
    """Synthetic Segment assembled directly from packed arrays (building
    8.8M docs through the per-doc ingest path would dominate the run)."""
    import jax
    import jax.numpy as jnp

    from nrtsearch_tpu.core.searcher import Searcher
    from nrtsearch_tpu.core.segment import (
        DocValueColumn, Segment, TextFieldIndex,
    )
    from nrtsearch_tpu.models.flagship import SyntheticCorpus
    from nrtsearch_tpu.ops.pallas_merge import GATHER_TILE
    from nrtsearch_tpu.schema.fields import DocValueKind, create_field_def

    corpus = SyntheticCorpus(num_docs, VOCAB, AVG_LEN, seed=seed)
    capacity = _pow2(num_docs)
    p_pad = _pow2(len(corpus.post_docs) + 2 * GATHER_TILE)

    doc_ids = np.zeros(p_pad, np.int32)
    doc_ids[: len(corpus.post_docs)] = corpus.post_docs
    freqs = np.zeros(p_pad, np.float32)
    freqs[: len(corpus.post_freqs)] = corpus.post_freqs
    dlens = np.zeros(capacity, np.float32)
    dlens[:num_docs] = corpus.doc_lens

    tfi = TextFieldIndex(
        terms={f"t{i}": i for i in range(VOCAB)},
        offsets=corpus.term_offsets,
        lengths=corpus.term_lengths,
        doc_ids=jax.device_put(doc_ids),
        freqs=jax.device_put(freqs),
        doc_lens=jax.device_put(dlens),
        sum_doc_lens=int(corpus.doc_lens.sum()),
        doc_count=num_docs,
        postings_len=len(corpus.post_docs),
        host_doc_ids=corpus.post_docs,
        host_freqs=corpus.post_freqs,
    )

    rng = np.random.default_rng(seed + 1)
    present = np.zeros(capacity, bool)
    present[:num_docs] = True

    def f32_col(vals):
        full = np.zeros(capacity, np.float32)
        full[:num_docs] = vals
        return DocValueColumn(
            kind=DocValueKind.DOUBLE,
            values=jax.device_put(full),
            present=jax.device_put(present),
            host_values=full,
            host_present=present,
        )

    price = f32_col(rng.uniform(0, 1000, num_docs).astype(np.float32))
    ts = f32_col(rng.uniform(0, 1e9, num_docs).astype(np.float32))
    tag_vals = rng.integers(0, N_TAGS, num_docs).astype(np.int32)
    tag_full = np.full(capacity, -1, np.int32)
    tag_full[:num_docs] = tag_vals
    ord_terms = [f"tag_{i}" for i in range(N_TAGS)]
    tag = DocValueColumn(
        kind=DocValueKind.ORDINAL,
        values=jax.device_put(tag_full),
        present=jax.device_put(present),
        host_values=tag_full,
        host_present=present,
        ord_terms=ord_terms,
        ord_index={t: i for i, t in enumerate(ord_terms)},
    )

    live = np.zeros(capacity, bool)
    live[:num_docs] = True
    seg = Segment(
        seg_id="stress_0",
        num_docs=num_docs,
        capacity=capacity,
        fields={"body": tfi},
        doc_values={"price": price, "ts": ts, "tag": tag},
        vectors={},
        stored=[],
        live=jax.device_put(live),
        host_live=live[:num_docs].copy(),
    )
    field_defs = {
        "body": create_field_def("body", {"type": "TEXT", "search": True}),
        "price": create_field_def("price", {"type": "FLOAT", "storeDocValues": True}),
        "ts": create_field_def("ts", {"type": "FLOAT", "storeDocValues": True}),
        "tag": create_field_def("tag", {"type": "ATOM", "storeDocValues": True}),
    }
    return Searcher([seg], field_defs, version=1), corpus


def make_queries(corpus, n_variants: int = 4):
    """Deep boolean trees in the config-#3 shape; term picks mix one frequent
    (rank < 50) and three mid-frequency terms so postings caps stay in one
    pad bucket across variants (steady-state program reuse)."""
    from nrtsearch_tpu.query.plan import parse_query

    rng = np.random.default_rng(99)
    out = []
    for v in range(n_variants):
        terms = [
            f"t{rng.integers(2, 50)}",
            f"t{rng.integers(200, 1000)}",
            f"t{rng.integers(1000, 5000)}",
            f"t{rng.integers(5000, 20000)}",
        ]
        tags = [f"tag_{i}" for i in rng.choice(N_TAGS, 5, replace=False)]
        should = []
        for i in range(8):
            if i % 2 == 0:
                lo = float(rng.uniform(0, 500))
                should.append({"occur": "SHOULD", "query": {"rangeQuery": {
                    "field": "price", "lower": str(lo), "upper": str(lo + 400)}}})
            else:
                should.append({"occur": "SHOULD", "query": {"termQuery": {
                    "field": "tag", "textValue": f"tag_{rng.integers(0, N_TAGS)}"}}})
        q = {"booleanQuery": {"clauses": [
            {"occur": "MUST", "query": {"matchQuery": {
                "field": "body", "query": " ".join(terms)}}},
            {"occur": "FILTER", "query": {"rangeQuery": {
                "field": "price", "lower": "100", "upper": "900"}}},
            {"occur": "FILTER", "query": {"termInSetQuery": {
                "field": "tag", "textTerms": {"terms": tags}}}},
            {"occur": "MUST_NOT", "query": {"termQuery": {
                "field": "tag", "textValue": "tag_7"}}},
            {"occur": "MUST", "query": {"booleanQuery": {"clauses": should}}},
        ]}}
        out.append(parse_query(q))
    return out


def timeit(run, iters):
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        lat.append(time.perf_counter() - t0)
    lat.sort()
    return lat[len(lat) // 2], lat[min(int(len(lat) * 0.99), len(lat) - 1)]


def main():
    import jax

    from nrtsearch_tpu.core.searcher import SortSpec
    from nrtsearch_tpu.search.collectors import (
        SegmentMatches, numeric_stat, terms_counts,
    )

    dev = jax.devices()[0]
    log(f"device: {dev}; building {NUM_DOCS:,}-doc segment")
    t0 = time.perf_counter()
    searcher, corpus = build_searcher(NUM_DOCS)
    log(f"built in {time.perf_counter() - t0:.1f}s "
        f"({len(corpus.post_docs):,} postings)")
    queries = make_queries(corpus)
    state = {"i": 0}

    def next_q():
        q = queries[state["i"] % len(queries)]
        state["i"] += 1
        return q

    def run_scored():
        td = searcher.search(next_q(), TOP_K)
        assert td.hits, "scored query returned no hits"

    def run_sorted():
        td = searcher.search(
            next_q(), TOP_K, sort=SortSpec("ts", reverse=True)
        )
        assert td.hits

    def run_faceted():
        # mirrors the serving handler's round-3 decision for this collector
        # set: facet counts + sum accumulate over the fused kernel's own
        # unique-match stream in the SAME dispatch as recall — no dense [D]
        # match mask is materialized (handlers._kernel_reduce_plan)
        q = next_q()
        spec = searcher.compile_batchable(q, None)
        if spec is None:
            raise RuntimeError("stress query no longer batchable")
        td, (facets, total_price) = searcher.fast_search_reduce(
            spec, TOP_K, [
                {"kind": "ordinal", "field": "tag"},
                {"kind": "sum", "field": "price"},
            ],
        )
        assert facets and total_price > 0

    results = {}
    for name, run in [
        ("scored", run_scored), ("sorted", run_sorted), ("faceted", run_faceted)
    ]:
        log(f"warming {name} (compiling {len(queries)} variants)")
        for _ in range(len(queries)):
            run()
        p50, p99 = timeit(run, ITERS)
        results[f"{name}_p50_ms"] = round(p50 * 1e3, 2)
        results[f"{name}_p99_ms"] = round(p99 * 1e3, 2)
        log(f"{name}: p50 {p50*1e3:.1f} ms  p99 {p99*1e3:.1f} ms")

    stats = dev.memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    if peak:
        results["peak_hbm_gb"] = round(peak / 2**30, 3)
        log(f"peak device memory: {peak / 2**30:.2f} GiB")

    if COMPARE_EAGER:
        log("timing eager evaluator for comparison (3 iters)")
        os.environ["NRT_COMPILED_EVAL"] = "0"
        try:
            run_scored()  # warm
            e50, _ = timeit(run_scored, 3)
            results["eager_scored_p50_ms"] = round(e50 * 1e3, 2)
            results["compiled_speedup"] = round(
                e50 * 1e3 / results["scored_p50_ms"], 2
            )
            log(f"eager p50 {e50*1e3:.1f} ms -> compiled speedup "
                f"{results['compiled_speedup']:.1f}x")
        finally:
            os.environ["NRT_COMPILED_EVAL"] = "1"

    print(json.dumps({
        "metric": "deep_boolean_stress",
        "num_docs": NUM_DOCS,
        "top_k": TOP_K,
        "device": str(dev),
        **results,
    }))


def _pow2(n: int) -> int:
    b = 1
    while b < n:
        b <<= 1
    return b


if __name__ == "__main__":
    main()
