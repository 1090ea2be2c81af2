#!/usr/bin/env python
"""MS MARCO passage BM25 parity + QPS harness (BASELINE config #2).

Requires the dataset locally (this environment has no network egress):
  --collection collection.tsv       (pid \t passage text)
  --queries    queries.dev.tsv      (qid \t query text)
  --qrels      qrels.dev.tsv        (optional, for MRR@10)

Builds the index through the public engine API (host analysis + device
postings), runs BM25 top-k over the dev queries in batches on the flagship
kernel, and reports QPS/p99 plus result overlap against a numpy reference
BM25 (exact by construction; cross-engine parity vs Lucene requires a Lucene
run of the same queries, out of scope offline).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--collection", required=True)
    parser.add_argument("--queries", required=True)
    parser.add_argument("--max-docs", type=int, default=0)
    parser.add_argument("--max-queries", type=int, default=1000)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--top-k", type=int, default=100)
    args = parser.parse_args()

    from nrtsearch_tpu.analysis import get_analyzer
    from nrtsearch_tpu.core.searcher import Searcher
    from nrtsearch_tpu.core.writer import IndexWriter
    from nrtsearch_tpu.models.flagship import BatchedBM25
    from nrtsearch_tpu.schema.fields import create_field_def

    fields = {
        "pid": create_field_def("pid", {"type": "_ID", "store": True}),
        "text": create_field_def("text", {"type": "TEXT", "search": True}),
    }
    writer = IndexWriter(fields, max_buffer_docs=500_000)
    t0 = time.time()
    n = 0
    with open(args.collection) as f:
        for line in f:
            pid, text = line.rstrip("\n").split("\t", 1)
            writer.add_documents([{"pid": pid, "text": text}])
            n += 1
            if args.max_docs and n >= args.max_docs:
                break
    segments = writer.refresh()
    print(f"indexed {n} docs in {time.time()-t0:.0f}s "
          f"({len(segments)} segments)", file=sys.stderr)

    searcher = Searcher(segments, fields, version=1)
    model = BatchedBM25.from_segment(segments[0], "text") if len(segments) == 1 \
        else None

    analyzer = get_analyzer("standard")
    queries = []
    with open(args.queries) as f:
        for line in f:
            qid, text = line.rstrip("\n").split("\t", 1)
            queries.append((qid, analyzer.terms(text)))
            if len(queries) >= args.max_queries:
                break

    lat = []
    results = {}
    if model is not None:
        term_lists = [t for _, t in queries]
        batches = [
            term_lists[i : i + args.batch]
            for i in range(0, len(term_lists), args.batch)
        ]
        compiled = model.compile_query_batches(batches)
        # warm
        model.search(compiled[0], k=args.top_k)
        for (start, qb) in zip(range(0, len(queries), args.batch), compiled):
            ts = time.time()
            scores, docs, hits = model.search(qb, k=args.top_k)
            docs = np.asarray(docs)
            lat.append(time.time() - ts)
            for j in range(docs.shape[0]):
                qid = queries[start + j][0]
                results[qid] = docs[j].tolist()
    # parity: exact numpy BM25 over the same postings for a query sample —
    # top-k doc-set overlap should be 1.0 modulo f32 boundary ties
    parity = None
    if model is not None and results:
        from nrtsearch_tpu.ops.bm25 import lucene_idf

        tfi = segments[0].fields["text"]
        dl_host = np.asarray(tfi.doc_lens)
        dc = model.num_docs_real
        overlaps = []
        sample = queries[: min(16, len(queries))]
        for qid, terms in sample:
            scores = np.zeros(segments[0].capacity, np.float32)
            for t in terms:
                tid = model.terms.get(t)
                if tid is None or not model.lengths[tid]:
                    continue
                off, ln = int(model.offsets[tid]), int(model.lengths[tid])
                ids = tfi.host_doc_ids[off : off + ln]
                tf = tfi.host_freqs[off : off + ln].astype(np.float32)
                w = np.float32(lucene_idf(dc, ln))
                denom = tf + np.float32(model.k1) * (
                    1.0 - model.b + model.b * dl_host[ids] / model.avgdl
                ).astype(np.float32)
                np.add.at(scores, ids, w * tf / denom)
            ref_top = np.argsort(-scores, kind="stable")[: args.top_k]
            ref_top = ref_top[scores[ref_top] > 0]
            got = [d for d in results[qid] if d < len(scores)][: len(ref_top)]
            inter = len(set(got) & set(ref_top.tolist()))
            overlaps.append(inter / max(len(ref_top), 1))
        parity = round(float(np.mean(overlaps)), 4)

    lat.sort()
    total = sum(lat)
    print(json.dumps({
        "docs": n,
        "queries": len(queries),
        "qps": round(len(queries) / total, 1) if total else None,
        "p50_ms": round(lat[len(lat) // 2] / args.batch * 1e3, 2) if lat else None,
        "p99_ms": round(lat[int(len(lat) * 0.99)] * 1e3, 2) if lat else None,
        "parity_topk_overlap": parity,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
