#!/usr/bin/env python
"""Hybrid BM25+kNN soak under live NRT indexing, primary + 4 replicas.

BASELINE config #5's shape: one primary streams documents (text + vector
fields) and publishes NRT points while FOUR replica processes serve hybrid
multi-retriever queries (BM25 text retriever RRF-blended with a kNN
retriever) from concurrent client threads. Reports indexing throughput,
per-replica and aggregate hybrid QPS, latency percentiles, and final NRT
freshness (reference equivalent: YelpReviewsTest.java:75 shape, widened to
the 1+4 mixed-workload layout of the docker demo).

Run: python benchmarks/hybrid_soak.py [--docs 8000] [--replicas 4]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import shutil
import signal
import subprocess
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
WORK = Path("/tmp/nrtsearch_tpu_hybrid_soak")
ENV = {**os.environ, "PYTHONPATH": str(REPO), "JAX_PLATFORMS": "cpu"}

WORDS = (
    "great food service terrible slow fast delicious amazing awful friendly "
    "staff pizza burger sushi coffee ambiance loud quiet expensive cheap "
    "recommend avoid fantastic mediocre crispy fresh stale portion"
).split()

DIMS = 16
BASE_PORT = 18400


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=8000)
    parser.add_argument("--batch", type=int, default=400)
    parser.add_argument("--replicas", type=int, default=4)
    parser.add_argument("--clients-per-replica", type=int, default=2)
    args = parser.parse_args()

    sys.path.insert(0, str(REPO))
    from nrtsearch_tpu.client import NrtsearchClient
    from nrtsearch_tpu.gen import pb

    shutil.rmtree(WORK, ignore_errors=True)
    WORK.mkdir(parents=True)
    nodes = [("primary", BASE_PORT, BASE_PORT + 1, "p_index")]
    for i in range(args.replicas):
        nodes.append(
            (f"replica{i}", BASE_PORT + 10 + 2 * i, BASE_PORT + 11 + 2 * i,
             f"r{i}_index")
        )
    procs = []
    try:
        for name, port, rport, idx_dir in nodes:
            cfg = WORK / f"{name}.yaml"
            cfg.write_text(
                f"nodeName: {name}\nport: {port}\nreplicationPort: {rport}\n"
                f"stateDir: {WORK}/state\nindexDir: {WORK}/{idx_dir}\n"
            )
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "nrtsearch_tpu.server", str(cfg)],
                env=ENV, stdout=open(WORK / f"{name}.log", "w"),
                stderr=subprocess.STDOUT,
            ))
        pc = NrtsearchClient(f"localhost:{BASE_PORT}")
        rcs = [
            NrtsearchClient(f"localhost:{BASE_PORT + 10 + 2 * i}")
            for i in range(args.replicas)
        ]
        deadline = time.time() + 60
        for c in [pc] + rcs:
            while True:
                try:
                    c.status()
                    break
                except Exception:
                    if time.time() > deadline:
                        raise
                    time.sleep(0.5)

        pc.create_index("docs")
        pc.register_fields(pb.FieldDefRequest(indexName="docs", field=[
            pb.Field(name="id", type=pb.FieldType._ID, store=True),
            pb.Field(name="text", type=pb.FieldType.TEXT, search=True),
            pb.Field(name="vec", type=pb.FieldType.VECTOR,
                     vectorDimensions=DIMS, vectorSimilarity="cosine"),
        ]))
        pc.start_index(pb.StartIndexRequest(indexName="docs",
                                            mode=pb.Mode.PRIMARY, primaryGen=1))
        for i, rc in enumerate(rcs):
            rc.start_index(pb.StartIndexRequest(
                indexName="docs", mode=pb.Mode.REPLICA,
                primaryAddress=f"localhost:{BASE_PORT + 1}"))

        rng = random.Random(0)

        def doc(i: int):
            r = pb.AddDocumentRequest(indexName="docs")
            r.fields["id"].value.append(str(i))
            r.fields["text"].value.append(
                " ".join(rng.choice(WORDS) for _ in range(rng.randint(10, 40)))
            )
            vec = [round(rng.gauss(0, 1), 4) for _ in range(DIMS)]
            r.fields["vec"].value.append(str(vec))
            return r

        def hybrid_request(qrng):
            req = pb.SearchRequest(indexName="docs", topHits=10,
                                   retrieveFields=["id"])
            rt = req.multiRetriever.retrievers.add()
            rt.name = "text"
            rt.textRetriever.query.matchQuery.field = "text"
            rt.textRetriever.query.matchQuery.query = (
                f"{qrng.choice(WORDS)} {qrng.choice(WORDS)}"
            )
            rv = req.multiRetriever.retrievers.add()
            rv.name = "vector"
            rv.knnRetriever.knnQuery.field = "vec"
            rv.knnRetriever.knnQuery.query_vector.extend(
                [qrng.gauss(0, 1) for _ in range(DIMS)]
            )
            rv.knnRetriever.knnQuery.k = 10
            return req

        # warm: one small batch so replicas have a searchable point
        pc.add_documents(doc(i) for i in range(args.batch))
        pc.refresh("docs")
        indexed = args.batch
        time.sleep(1.0)

        stop = threading.Event()
        lat_lock = threading.Lock()
        lats: list[float] = []
        errors = [0]

        def search_worker(slot: int):
            qrng = random.Random(100 + slot)
            cl = NrtsearchClient(
                f"localhost:{BASE_PORT + 10 + 2 * (slot % args.replicas)}"
            )
            while not stop.is_set():
                ts = time.time()
                try:
                    cl.search(hybrid_request(qrng))
                    with lat_lock:
                        lats.append(time.time() - ts)
                except Exception:
                    errors[0] += 1
            cl.close()

        n_workers = args.replicas * args.clients_per_replica
        workers = [
            threading.Thread(target=search_worker, args=(s,))
            for s in range(n_workers)
        ]
        t0 = time.time()
        for w in workers:
            w.start()

        # per-NRT-point freshness monitor: after every publish, measure when
        # each replica's searcher actually exposes the new doc count
        # (BASELINE config #5: NRT freshness under mixed load; reference
        # equivalent: the YelpReviewsTest soak's implicit visibility check)
        fresh_lock = threading.Lock()
        fresh_targets: list[tuple[int, float]] = []
        fresh_lags: list[float] = []

        def fresh_monitor(ridx: int):
            cl = NrtsearchClient(f"localhost:{BASE_PORT + 10 + 2 * ridx}")
            seen: set[int] = set()
            while not stop.is_set():
                try:
                    nd = cl.stats("docs").numDocs
                except Exception:
                    time.sleep(0.05)
                    continue
                now = time.time()
                with fresh_lock:
                    for target, t_pub in fresh_targets:
                        if target not in seen and nd >= target:
                            seen.add(target)
                            fresh_lags.append(now - t_pub)
                time.sleep(0.02)
            cl.close()

        monitors = [
            threading.Thread(target=fresh_monitor, args=(i,))
            for i in range(args.replicas)
        ]
        for m in monitors:
            m.start()

        while indexed < args.docs:
            pc.add_documents(doc(indexed + i) for i in range(args.batch))
            indexed += args.batch
            pc.refresh("docs")
            with fresh_lock:
                fresh_targets.append((indexed, time.time()))
        index_elapsed = time.time() - t0
        # let searches run a moment against the final corpus
        time.sleep(2.0)
        stop.set()
        for w in workers:
            w.join()
        for m in monitors:
            m.join()
        search_elapsed = time.time() - t0

        fr0 = time.time()
        lag = {}
        for i, rc in enumerate(rcs):
            while rc.stats("docs").numDocs < indexed and time.time() - fr0 < 30:
                time.sleep(0.05)
            lag[f"replica{i}_docs"] = rc.stats("docs").numDocs
        freshness = time.time() - fr0

        lats.sort()
        n = len(lats)
        print(json.dumps({
            "indexed_docs": indexed,
            "indexing_docs_per_sec": round(indexed / index_elapsed, 1),
            "replicas": args.replicas,
            "hybrid_searches": n,
            "hybrid_qps": round(n / search_elapsed, 1),
            "hybrid_p50_ms": round(lats[n // 2] * 1e3, 1) if n else None,
            "hybrid_p99_ms": round(lats[min(int(n * 0.99), n - 1)] * 1e3, 1) if n else None,
            **(lambda fl: {
                "nrt_freshness_points": len(fl),
                "nrt_freshness_p50_sec": round(fl[len(fl) // 2], 3) if fl else None,
                "nrt_freshness_p99_sec": round(
                    fl[min(int(len(fl) * 0.99), len(fl) - 1)], 3
                ) if fl else None,
            })(sorted(fresh_lags)),
            "search_errors": errors[0],
            "nrt_final_freshness_sec": round(freshness, 2),
            **lag,
            "ok": all(v == indexed for k, v in lag.items()) and errors[0] == 0,
        }))
        pc.close()
        for rc in rcs:
            rc.close()
        return 0
    finally:
        for p in procs:
            p.send_signal(signal.SIGTERM)
        for p in procs:
            try:
                p.wait(timeout=5)
            except subprocess.TimeoutExpired:
                p.kill()


if __name__ == "__main__":
    sys.exit(main())
