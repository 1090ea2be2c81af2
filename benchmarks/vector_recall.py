"""Vector recall@k vs memory harness (BASELINE config #4).

Runs offline on a synthetic clustered corpus, or on SIFT1M when the fvecs
files are present (pass --sift /path/to/sift). Reports, per storage format:

  recall@10 against exact f32 brute force, bytes/vector, QPS.

The reference comparison point is Lucene HNSW (recall < 1.0 at ~4.3 GB for
SIFT1M f32 + graph). Here exact f32 gives recall 1.0 by construction; int8
quantized storage is 4x smaller at near-1.0 recall; IVF trades recall for
sub-linear work.

Usage:
  python benchmarks/vector_recall.py [--docs 100000] [--dims 128]
                                     [--queries 256] [--sift DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_sift(root: str):
    """SIFT1M fvecs (http://corpus-texmex.irisa.fr/ layout)."""
    def fvecs(path):
        raw = np.fromfile(path, dtype=np.int32)
        dim = raw[0]
        return raw.reshape(-1, dim + 1)[:, 1:].view(np.float32)

    base = fvecs(f"{root}/sift_base.fvecs")
    queries = fvecs(f"{root}/sift_query.fvecs")
    return base, queries


def synthetic(docs: int, dims: int, queries: int, seed: int = 0):
    """Clustered Gaussian corpus (kNN structure like real embeddings)."""
    rng = np.random.default_rng(seed)
    n_clusters = max(docs // 1000, 8)
    centers = rng.normal(0, 1.0, (n_clusters, dims)).astype(np.float32)
    assign = rng.integers(0, n_clusters, docs)
    base = centers[assign] + rng.normal(0, 0.35, (docs, dims)).astype(np.float32)
    qassign = rng.integers(0, n_clusters, queries)
    qs = centers[qassign] + rng.normal(0, 0.35, (queries, dims)).astype(np.float32)
    return base.astype(np.float32), qs.astype(np.float32)


def recall_at_k(got_ids: np.ndarray, truth_ids: np.ndarray, k: int) -> float:
    hits = 0
    for g, t in zip(got_ids, truth_ids):
        hits += len(set(g[:k].tolist()) & set(t[:k].tolist()))
    return hits / (len(got_ids) * k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--dims", type=int, default=128)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--sift", default="")
    ap.add_argument("--similarity", default="l2_norm")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nrtsearch_tpu.ops.knn import (
        IVFIndex, knn_search, knn_search_quantized, quantize_int8,
    )

    if args.sift:
        base, queries = load_sift(args.sift)
        queries = queries[: args.queries]
        source = "sift1m"
    else:
        base, queries = synthetic(args.docs, args.dims, args.queries)
        source = "synthetic"
    D, dims = base.shape
    k = args.k
    sim = args.similarity
    print(f"[recall] {source}: {D} docs x {dims} dims, {len(queries)} queries",
          file=sys.stderr)

    sq = jnp.asarray(np.sum(base * base, axis=1).astype(np.float32))
    mask = jnp.ones(D, bool)
    qdev = jnp.asarray(queries)

    results = {}

    # exact f32 (ground truth)
    vec32 = jax.device_put(base)
    t0 = time.perf_counter()
    s32, i32 = knn_search(vec32, sq, mask, qdev, similarity=sim, k=k)
    truth = np.asarray(i32)
    _ = np.asarray(s32[0, 0])
    dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = np.asarray(knn_search(vec32, sq, mask, qdev, similarity=sim, k=k)[0][0, 0])
    dt = time.perf_counter() - t0
    results["float32"] = {
        "recall": 1.0, "bytes_per_vector": dims * 4,
        "qps": round(len(queries) / dt, 1),
    }

    # bfloat16
    vec16 = vec32.astype(jnp.bfloat16)
    _ = np.asarray(knn_search(vec16, sq, mask, qdev, similarity=sim, k=k)[0][0, 0])
    t0 = time.perf_counter()
    s16, i16 = knn_search(vec16, sq, mask, qdev, similarity=sim, k=k)
    _ = np.asarray(s16[0, 0])
    dt = time.perf_counter() - t0
    results["float16"] = {
        "recall": round(recall_at_k(np.asarray(i16), truth, k), 4),
        "bytes_per_vector": dims * 2,
        "qps": round(len(queries) / dt, 1),
    }

    # int8 scalar quantized
    q8, scale = quantize_int8(base)
    v8 = jax.device_put(q8)
    _ = np.asarray(knn_search_quantized(
        v8, jnp.float32(scale), sq, mask, qdev, similarity=sim, k=k)[0][0, 0])
    t0 = time.perf_counter()
    s8, i8 = knn_search_quantized(
        v8, jnp.float32(scale), sq, mask, qdev, similarity=sim, k=k)
    _ = np.asarray(s8[0, 0])
    dt = time.perf_counter() - t0
    results["int8"] = {
        "recall": round(recall_at_k(np.asarray(i8), truth, k), 4),
        "bytes_per_vector": dims * 1,
        "qps": round(len(queries) / dt, 1),
    }

    # IVF sweep (approximate, sub-linear probe work)
    ivf = IVFIndex(base, n_clusters=max(D // 2000, 16), similarity=sim)
    for nprobe in (4, 16):
        t0 = time.perf_counter()
        _, ids = ivf.search(queries, k, nprobe=nprobe)
        dt = time.perf_counter() - t0
        results[f"ivf_nprobe{nprobe}"] = {
            "recall": round(recall_at_k(ids, truth, k), 4),
            "bytes_per_vector": dims * 4,
            "qps": round(len(queries) / dt, 1),
        }

    print(json.dumps({"source": source, "docs": D, "dims": dims,
                      "k": k, "similarity": sim, "formats": results}))


if __name__ == "__main__":
    main()
