"""Benchmark: batched BM25 retrieval QPS/chip + p99 latency.

Measures the flagship fused retrieval step (postings gather -> BM25 -> mask ->
top-k, models/flagship.py) on the default accelerator against a synthetic
Zipf corpus, and compares against the same engine running on the CPU host —
the stand-in for the reference's CPU replica (BASELINE.md target: ≥5× QPS/chip
vs a CPU replica at p99 < 20 ms; MS MARCO-scale parity runs land in later
rounds with real datasets).

Prints ONE JSON line:
  {"metric": "bm25_qps_per_chip", "value": <qps>, "unit": "qps",
   "vs_baseline": <tpu_qps / cpu_qps>, ...extras}
"""

from __future__ import annotations

import json
import os
import sys
import time

NUM_DOCS = int(os.environ.get("BENCH_NUM_DOCS", 1_000_000))
VOCAB = int(os.environ.get("BENCH_VOCAB", 100_000))
AVG_LEN = int(os.environ.get("BENCH_AVG_LEN", 48))
BATCH = int(os.environ.get("BENCH_BATCH", 32))
TERMS_PER_QUERY = int(os.environ.get("BENCH_TERMS", 4))
TOP_K = int(os.environ.get("BENCH_TOPK", 100))
ITERS = int(os.environ.get("BENCH_ITERS", 20))
CPU_ITERS = int(os.environ.get("BENCH_CPU_ITERS", 1))


def _timeit(run, iters):
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        lat.append(time.perf_counter() - t0)
    lat.sort()
    total = sum(lat)
    p50 = lat[len(lat) // 2]
    p99 = lat[min(int(len(lat) * 0.99), len(lat) - 1)]
    return total, p50, p99


def main() -> None:
    global T0
    T0 = time.perf_counter()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nrtsearch_tpu.models.flagship import SyntheticCorpus, bm25_search_step

    def log(msg):
        print(f"[bench +{time.perf_counter()-T0:.0f}s] {msg}", file=sys.stderr)

    log("building corpus")
    corpus = SyntheticCorpus(NUM_DOCS, VOCAB, AVG_LEN, seed=42)
    log("corpus built; packing to device")
    model = corpus.to_model()

    # pre-compile a fixed set of query batches (steady-state serving shape),
    # planned jointly so every batch shares one (run_len, R) compiled program
    log("compiling query batches")
    batches = model.compile_query_batches(
        [corpus.sample_queries(BATCH, TERMS_PER_QUERY) for _ in range(8)],
        TERMS_PER_QUERY,
    )
    run_len = batches[0].run_len

    def make_runner(device):
        post_docs = jax.device_put(model.doc_ids, device)
        impacts = jax.device_put(model.impacts, device)
        batch_dev = [
            (
                jax.device_put(jnp.asarray(b.term_offsets), device),
                jax.device_put(jnp.asarray(b.term_lengths), device),
                jax.device_put(jnp.asarray(b.term_weights), device),
                jax.device_put(jnp.asarray(b.n_terms), device),
            )
            for b in batches
        ]
        state = {"i": 0}

        def run():
            offs, lens, weights, n_terms = batch_dev[state["i"] % len(batch_dev)]
            state["i"] += 1
            out = bm25_search_step(
                post_docs, impacts, offs, lens, weights, n_terms,
                run_len=run_len, k=TOP_K, use_pallas=device.platform == "tpu",
            )
            # force real completion: block_until_ready is unreliable through
            # the axon tunnel, so read back one element
            _ = np.asarray(out[0][0, 0])

        return run

    accel = jax.devices()[0]
    run_accel = make_runner(accel)
    log("compiling accel program")
    run_accel()  # compile
    run_accel()
    log("timing accel")
    total, p50, p99 = _timeit(run_accel, ITERS)
    qps = BATCH * ITERS / total
    log(f"accel done: {qps:.1f} qps")

    cpu_qps = None
    try:
        cpu = jax.devices("cpu")[0]
        if cpu != accel:
            run_cpu = make_runner(cpu)
            log("compiling cpu baseline")
            run_cpu()  # compile
            log("timing cpu baseline")
            cpu_total, _, _ = _timeit(run_cpu, CPU_ITERS)
            cpu_qps = BATCH * CPU_ITERS / cpu_total
            log(f"cpu done: {cpu_qps:.2f} qps")
    except Exception as e:  # no cpu backend available
        print(f"cpu baseline unavailable: {e}", file=sys.stderr)

    vs_baseline = (qps / cpu_qps) if cpu_qps else 0.0
    print(
        json.dumps(
            {
                "metric": "bm25_qps_per_chip",
                "value": round(qps, 2),
                "unit": "qps",
                "vs_baseline": round(vs_baseline, 3),
                "p50_ms": round(p50 * 1e3, 3),
                "p99_ms": round(p99 * 1e3, 3),
                "batch": BATCH,
                "top_k": TOP_K,
                "num_docs": NUM_DOCS,
                "cpu_qps": round(cpu_qps, 2) if cpu_qps else None,
                "device": str(accel),
            }
        )
    )


if __name__ == "__main__":
    main()
