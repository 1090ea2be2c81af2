#!/usr/bin/env python
"""Soak test: primary + replica processes, live indexing under search load.

Reference equivalent: YelpReviewsTest.java:75 — the only multi-process test in
the reference (primary + replica as OS processes, streamed indexing + search
over a reviews dataset). Synthetic reviews stand in for the dataset; the
shape is the same: index in batches on the primary while searching the
replica, then report indexing throughput, search QPS, and NRT freshness lag.

Run: python benchmarks/soak.py [--docs 20000] [--searches 200]
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
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
WORK = Path("/tmp/nrtsearch_tpu_soak")

ENV = {**os.environ, "PYTHONPATH": str(REPO), "JAX_PLATFORMS": "cpu"}

WORDS = (
    "great food service terrible slow fast delicious amazing awful friendly "
    "staff pizza burger sushi coffee ambiance loud quiet expensive cheap "
    "recommend avoid fantastic mediocre crispy fresh stale portion"
).split()


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=20000)
    parser.add_argument("--searches", type=int, default=200)
    parser.add_argument("--batch", type=int, default=500)
    args = parser.parse_args()

    sys.path.insert(0, str(REPO))
    from nrtsearch_tpu.client import NrtsearchClient
    from nrtsearch_tpu.gen import pb

    shutil.rmtree(WORK, ignore_errors=True)
    WORK.mkdir(parents=True)
    (WORK / "p.yaml").write_text(
        f"nodeName: primary\nport: 18300\nreplicationPort: 18301\n"
        f"stateDir: {WORK}/state\nindexDir: {WORK}/p_index\n"
    )
    (WORK / "r.yaml").write_text(
        f"nodeName: replica\nport: 18302\nreplicationPort: 18303\n"
        f"stateDir: {WORK}/state\nindexDir: {WORK}/r_index\n"
    )
    procs = []
    try:
        for cfg in ("p.yaml", "r.yaml"):
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "nrtsearch_tpu.server", str(WORK / cfg)],
                env=ENV, stdout=open(WORK / f"{cfg}.log", "w"),
                stderr=subprocess.STDOUT,
            ))
        pc = NrtsearchClient("localhost:18300")
        rc = NrtsearchClient("localhost:18302")
        deadline = time.time() + 30
        for c in (pc, rc):
            while True:
                try:
                    c.status()
                    break
                except Exception:
                    if time.time() > deadline:
                        raise
                    time.sleep(0.5)

        pc.create_index("reviews")
        pc.register_fields(pb.FieldDefRequest(indexName="reviews", field=[
            pb.Field(name="review_id", type=pb.FieldType._ID, store=True),
            pb.Field(name="text", type=pb.FieldType.TEXT, search=True, store=True),
            pb.Field(name="stars", type=pb.FieldType.INT, storeDocValues=True),
        ]))
        pc.start_index(pb.StartIndexRequest(indexName="reviews",
                                            mode=pb.Mode.PRIMARY, primaryGen=1))
        rc.start_index(pb.StartIndexRequest(
            indexName="reviews", mode=pb.Mode.REPLICA,
            primaryAddress="localhost:18301"))

        rng = random.Random(0)

        def review(i: int):
            r = pb.AddDocumentRequest(indexName="reviews")
            r.fields["review_id"].value.append(str(i))
            r.fields["text"].value.append(
                " ".join(rng.choice(WORDS) for _ in range(rng.randint(10, 60)))
            )
            r.fields["stars"].value.append(str(rng.randint(1, 5)))
            return r

        # interleave indexing batches with replica searches
        t0 = time.time()
        search_lat = []
        indexed = 0
        searched = 0
        while indexed < args.docs:
            pc.add_documents(review(indexed + i) for i in range(args.batch))
            indexed += args.batch
            pc.refresh("reviews")
            for _ in range(max(args.searches // (args.docs // args.batch), 1)):
                q = pb.SearchRequest(indexName="reviews", topHits=10,
                                     retrieveFields=["review_id", "stars"])
                q.query.matchQuery.field = "text"
                q.query.matchQuery.query = f"{rng.choice(WORDS)} {rng.choice(WORDS)}"
                ts = time.time()
                rc.search(q)
                search_lat.append(time.time() - ts)
                searched += 1
        elapsed = time.time() - t0

        # NRT freshness: how long until the replica sees the final doc count
        fr0 = time.time()
        while rc.stats("reviews").numDocs < indexed and time.time() - fr0 < 30:
            time.sleep(0.05)
        freshness = time.time() - fr0
        replica_docs = rc.stats("reviews").numDocs

        search_lat.sort()
        print(json.dumps({
            "indexed_docs": indexed,
            "indexing_docs_per_sec": round(indexed / elapsed, 1),
            "searches": searched,
            "search_p50_ms": round(search_lat[len(search_lat) // 2] * 1e3, 1),
            "search_p99_ms": round(search_lat[int(len(search_lat) * 0.99)] * 1e3, 1),
            "replica_docs": replica_docs,
            "nrt_final_freshness_sec": round(freshness, 2),
            "ok": replica_docs == indexed,
        }))
        pc.close()
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
