"""Sweep the dense-head row count H on real TPU with the full-H matmul.

Round-4 follow-up to benchmarks/row_gather_probe.py: that probe showed the
compact row-gather loses to streaming ALL head rows through the MXU (~24
vs ~650 GB/s), so dense_merge_topk now always runs the full [B, Hp] x
[Hp, D] matmul. The cost of the head is then linear in H; the benefit is
that a bigger head absorbs more postings out of the sparse tail. This
sweep measures the end-to-end threaded qps at several H to pick the
serving default.

All timings force a value fetch (np.asarray) — jax.block_until_ready does
NOT block on the axon tunnel backend.

Usage: python benchmarks/dense_h_sweep.py [H ...]
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

NUM_DOCS = int(os.environ.get("BENCH_NUM_DOCS", 1_000_000))
VOCAB = int(os.environ.get("BENCH_VOCAB", 100_000))
AVG_LEN = int(os.environ.get("BENCH_AVG_LEN", 48))
BATCH = int(os.environ.get("BENCH_BATCH", 32))
TERMS = int(os.environ.get("BENCH_TERMS", 4))
TOP_K = int(os.environ.get("BENCH_TOPK", 100))
ITERS = int(os.environ.get("BENCH_ITERS", 20))
READERS = int(os.environ.get("BENCH_READERS", 16))


def main() -> None:
    hs = [int(a) for a in sys.argv[1:]] or [256, 1024, 2048, 4096]
    from nrtsearch_tpu.models.flagship import SyntheticCorpus
    from nrtsearch_tpu.ops.dense_head import decode_packed2

    print("building corpus", flush=True)
    corpus = SyntheticCorpus(NUM_DOCS, VOCAB, AVG_LEN, seed=42)
    model = corpus.to_model()
    query_sets = [corpus.sample_queries(BATCH, TERMS) for _ in range(8)]

    for H in hs:
        t0 = time.perf_counter()
        model.attach_dense(max_rows=H)
        built = time.perf_counter() - t0
        got = model.dense_idx.n_rows
        plans = [model.plan_dense_merge(qs) for qs in query_sets]
        tail_w = sorted({p.run_offs.shape[1] * p.run_len for p in plans})
        for p in plans:  # warm every shape bucket
            model.serve_dense_merge(p, TOP_K)
        np.asarray(model.serve_dense_merge(plans[0], TOP_K))

        def serve_one(i):
            p = model.plan_dense_merge(query_sets[i % len(query_sets)])
            decode_packed2(
                np.asarray(model.serve_dense_merge(p, TOP_K)), TOP_K
            )

        # sync latency
        lat = []
        for i in range(ITERS):
            t0 = time.perf_counter()
            serve_one(i)
            lat.append(time.perf_counter() - t0)
        lat.sort()
        p50 = lat[len(lat) // 2]

        n_iters = ITERS * 8
        with ThreadPoolExecutor(READERS) as pool:
            t0 = time.perf_counter()
            list(pool.map(serve_one, range(n_iters)))
            total = time.perf_counter() - t0
        qps = BATCH * n_iters / total
        print(
            f"H={got:5d} (asked {H:5d}, built {built:.1f}s) "
            f"tail_widths={tail_w} sync_p50={p50*1e3:.1f}ms "
            f"threaded={qps:.1f} qps ({total/n_iters*1e3:.2f} ms/b eff)",
            flush=True,
        )


if __name__ == "__main__":
    main()
