#!/usr/bin/env python
"""MS MARCO passage BM25 parity + QPS harness (BASELINE config #2).

Requires the dataset locally (this environment has no network egress —
docs/msmarco_runbook.md covers acquisition and the Lucene-oracle parity
recipe):
  --collection collection.tsv        (pid \t passage text)
  --queries    queries.dev.small.tsv (qid \t query text)
  --qrels      qrels.dev.small.tsv   (optional, for MRR@10)

Indexes through the public engine API (standard analyzer -> packed device
postings, multi-segment), serves the dev queries through
``Searcher.packed_view("text").search_batch`` — the SAME fast path the gRPC
server dispatches (dense-fused on TPU, full-width merge on CPU) — and
reports QPS / latency, MRR@10, an in-engine exactness sample (top-k overlap
vs a host-numpy BM25 over the same postings), and a TREC-format run file
for cross-engine comparison against the reference server
(tools/compare_runs.py).

Output schema (one JSON line, also written to --json-out):
  {"docs": N, "queries": Q, "qps": float, "p50_ms": float, "p99_ms": float,
   "mrr10": float|null, "parity_topk_overlap": float|null,
   "path": "dense"|"merge", "dense_build_s": float|null}
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
    parser.add_argument("--qrels", default=None)
    parser.add_argument("--max-docs", type=int, default=0)
    parser.add_argument("--max-queries", type=int, default=0)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--top-k", type=int, default=100)
    parser.add_argument("--k1", type=float, default=0.9,
                        help="BM25 k1 (MS MARCO convention 0.9)")
    parser.add_argument("--b", type=float, default=0.4,
                        help="BM25 b (MS MARCO convention 0.4)")
    parser.add_argument("--run-out", default=None,
                        help="TREC run file: qid Q0 pid rank score nrt_tpu")
    parser.add_argument("--json-out", default=None)
    parser.add_argument("--parity-sample", type=int, default=64,
                        help="queries checked against exact host BM25")
    args = parser.parse_args()

    from nrtsearch_tpu.analysis import get_analyzer
    from nrtsearch_tpu.core.packed_view import QuerySpec
    from nrtsearch_tpu.core.searcher import Searcher
    from nrtsearch_tpu.core.writer import IndexWriter
    from nrtsearch_tpu.schema.fields import create_field_def

    fields = {
        "pid": create_field_def("pid", {"type": "_ID", "store": True}),
        "text": create_field_def(
            "text",
            {"type": "TEXT", "search": True,
             "similarity": "BM25",
             "similarityParams": {"k1": args.k1, "b": args.b}},
        ),
    }
    writer = IndexWriter(fields, max_buffer_docs=500_000)
    t0 = time.time()
    n = 0
    buf = []
    with open(args.collection) as f:
        for line in f:
            pid, text = line.rstrip("\n").split("\t", 1)
            buf.append({"pid": pid, "text": text})
            n += 1
            if len(buf) >= 10_000:
                writer.add_documents(buf)
                buf = []
            if args.max_docs and n >= args.max_docs:
                break
    if buf:
        writer.add_documents(buf)
    segments = writer.refresh()
    print(f"indexed {n} docs in {time.time()-t0:.0f}s "
          f"({len(segments)} segments)", file=sys.stderr)

    searcher = Searcher(segments, fields, version=1)
    t0 = time.time()
    searcher.warm(["text"])          # packs postings + dense rows (TPU)
    view = searcher.packed_view("text")
    dense_build_s = round(time.time() - t0, 1)
    path = "dense" if view._dense_state() is not None else "merge"
    print(f"warmed ({path} path) in {dense_build_s}s", file=sys.stderr)

    # global ord -> pid (searcher.bases[i] + local == global ord)
    pid_of = np.empty(view.max_doc, dtype=object)
    for idx, seg in enumerate(searcher.segments):
        base = int(searcher.bases[idx])
        for local in range(seg.num_docs):
            pid_of[base + local] = seg.stored[local].get("pid")

    analyzer = get_analyzer("standard")
    queries = []
    with open(args.queries) as f:
        for line in f:
            qid, text = line.rstrip("\n").split("\t", 1)
            queries.append((qid, tuple(analyzer.terms(text))))
            if args.max_queries and len(queries) >= args.max_queries:
                break

    # warm-compile one batch, then time the rest
    specs_all = [QuerySpec("text", t or ("",)) for _, t in queries]
    view.search_batch(specs_all[: args.batch], args.top_k)

    lat = []
    results: dict[str, list[tuple[float, int]]] = {}
    t_all = time.time()
    for start in range(0, len(queries), args.batch):
        chunk = specs_all[start : start + args.batch]
        ts = time.perf_counter()
        res = view.search_batch(chunk, args.top_k)
        lat.append(time.perf_counter() - ts)
        for j, r in enumerate(res):
            qid = queries[start + j][0]
            keep = r.scores > -np.inf
            results[qid] = list(
                zip(r.scores[keep].tolist(), r.docs[keep].tolist())
            )
    wall = time.time() - t_all

    if args.run_out:
        with open(args.run_out, "w") as f:
            for qid, hits in results.items():
                for rank, (score, doc) in enumerate(hits, 1):
                    f.write(f"{qid} Q0 {pid_of[doc]} {rank} "
                            f"{score:.6f} nrt_tpu\n")

    mrr10 = None
    if args.qrels:
        rel: dict[str, set] = {}
        with open(args.qrels) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 4 and parts[3] != "0":
                    rel.setdefault(parts[0], set()).add(parts[2])
        rr, judged = 0.0, 0
        for qid, hits in results.items():
            if qid not in rel:
                continue
            judged += 1
            for rank, (_s, doc) in enumerate(hits[:10], 1):
                if pid_of[doc] in rel[qid]:
                    rr += 1.0 / rank
                    break
        mrr10 = round(rr / judged, 4) if judged else None

    # in-engine exactness: host-numpy BM25 over the same postings for a
    # query sample; top-k doc-set overlap should be ~1.0 (tie permutations
    # at equal f32 score are benign)
    parity = None
    if results and args.parity_sample:
        overlaps = []
        for qid, terms in queries[: args.parity_sample]:
            scores = _host_bm25(searcher, view, terms, args.k1, args.b)
            ref_top = np.argsort(-scores, kind="stable")[: args.top_k]
            ref_top = ref_top[scores[ref_top] > 0]
            got = [d for _s, d in results[qid]][: len(ref_top)]
            inter = len(set(got) & set(ref_top.tolist()))
            overlaps.append(inter / max(len(ref_top), 1))
        parity = round(float(np.mean(overlaps)), 4)

    lat.sort()
    out = {
        "docs": n,
        "queries": len(queries),
        "qps": round(len(queries) / wall, 1) if wall else None,
        "p50_ms": round(lat[len(lat) // 2] / args.batch * 1e3, 2)
        if lat else None,
        "p99_ms": round(lat[min(int(len(lat) * 0.99), len(lat) - 1)] * 1e3, 2)
        if lat else None,
        "mrr10": mrr10,
        "parity_topk_overlap": parity,
        "path": path,
        "dense_build_s": dense_build_s,
    }
    line = json.dumps(out)
    print(line)
    if args.json_out:
        Path(args.json_out).write_text(line + "\n")
    return 0


def _host_bm25(searcher, view, terms, k1, b):
    """Exact host-numpy BM25 over the packed postings (global ords)."""
    from nrtsearch_tpu.ops.bm25 import lucene_idf

    scores = np.zeros(view.max_doc, np.float32)
    # total df per term across segments (IDF is index-wide)
    df = {}
    total_docs = 0
    for idx, seg in enumerate(searcher.segments):
        tfi = seg.fields["text"]
        total_docs += seg.num_docs
        for t in set(terms):
            tid = tfi.terms.get(t)
            if tid is not None and tfi.lengths[tid]:
                df[t] = df.get(t, 0) + int(tfi.lengths[tid])
    avgdl = (
        sum(float(np.sum(np.asarray(seg.fields["text"].doc_lens)
                         [: seg.num_docs]))
            for seg in searcher.segments) / max(total_docs, 1)
    )
    for idx, seg in enumerate(searcher.segments):
        tfi = seg.fields["text"]
        base = int(searcher.bases[idx])
        dl = np.asarray(tfi.doc_lens)
        for t in set(terms):
            tid = tfi.terms.get(t)
            if tid is None or not tfi.lengths[tid]:
                continue
            off, ln = int(tfi.offsets[tid]), int(tfi.lengths[tid])
            ids = tfi.host_doc_ids[off : off + ln]
            tf = tfi.host_freqs[off : off + ln].astype(np.float32)
            w = np.float32(lucene_idf(total_docs, df[t]))
            denom = tf + np.float32(k1) * (
                1.0 - b + b * dl[ids] / np.float32(avgdl)
            ).astype(np.float32)
            np.add.at(scores, base + ids, w * tf / denom)
    return scores


if __name__ == "__main__":
    sys.exit(main())
