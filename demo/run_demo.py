#!/usr/bin/env python
"""End-to-end demo: 1 primary + 3 replicas, CSV ingest, search on a replica.

Mirrors the reference's docker-compose demo (docker-compose.yaml: primary +
3 replica containers; docs.csv + registerFields/startIndex/search JSONs) as
plain OS processes, driven entirely through the nrtsearch_client CLI.

Run:  python demo/run_demo.py
"""

from __future__ import annotations

import os
import shutil
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEMO = Path(__file__).resolve().parent
WORK = Path("/tmp/nrtsearch_tpu_demo")
N_REPLICAS = 3

ENV = {
    **os.environ,
    "PYTHONPATH": str(REPO),
    # multiple server processes can't share the TPU; the demo runs on CPU
    "JAX_PLATFORMS": "cpu",
}


def cli(*args: str) -> str:
    out = subprocess.run(
        [sys.executable, "-m", "nrtsearch_tpu.cli", *args],
        env=ENV, capture_output=True, text=True, timeout=120,
    )
    if out.returncode != 0:
        raise RuntimeError(f"cli {' '.join(args)} failed:\n{out.stderr}")
    return out.stdout


def wait_ready(port: int, timeout: float = 30.0) -> None:
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            cli("--port", str(port), "status")
            return
        except RuntimeError:
            time.sleep(0.5)
    raise TimeoutError(f"server on {port} not ready")


def main() -> int:
    shutil.rmtree(WORK, ignore_errors=True)
    WORK.mkdir(parents=True)
    procs: list[subprocess.Popen] = []
    try:
        print("== starting primary ==")
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "nrtsearch_tpu.server",
             str(DEMO / "primary_config.yaml")],
            env=ENV, stdout=open(WORK / "primary.log", "w"),
            stderr=subprocess.STDOUT,
        ))
        wait_ready(18200)

        print("== create index + register fields + start primary ==")
        cli("--port", "18200", "createIndex", "--indexName", "testIdx")
        cli("--port", "18200", "registerFields",
            "--fileName", str(DEMO / "registerFields.json"))
        cli("--port", "18200", "startIndex", "--indexName", "testIdx",
            "--mode", "PRIMARY")

        print(f"== starting {N_REPLICAS} replicas ==")
        replica_ports = []
        for i in range(N_REPLICAS):
            port, repl_port = 18210 + i * 2, 18211 + i * 2
            replica_ports.append(port)
            env = {**ENV, "REPLICA_ID": str(i), "REPLICA_PORT": str(port),
                   "REPLICA_REPL_PORT": str(repl_port)}
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "nrtsearch_tpu.server",
                 str(DEMO / "replica_config.yaml")],
                env=env, stdout=open(WORK / f"replica{i}.log", "w"),
                stderr=subprocess.STDOUT,
            ))
        for port in replica_ports:
            wait_ready(port)
        for port in replica_ports:
            cli("--port", str(port), "startIndex", "--indexName", "testIdx",
                "--mode", "REPLICA", "--primaryAddress", "localhost:18201")

        print("== streaming docs.csv to the primary ==")
        cli("--port", "18200", "addDocuments", "--indexName", "testIdx",
            "--fileName", str(DEMO / "docs.csv"), "--fileType", "csv")
        cli("--port", "18200", "refresh", "--indexName", "testIdx")
        cli("--port", "18200", "commit", "--indexName", "testIdx")

        print("== waiting for replication, searching every replica ==")
        time.sleep(1.5)
        ok = True
        for port in replica_ports:
            out = cli("--port", str(port), "search",
                      "--fileName", str(DEMO / "search.json"))
            hit = '"textValue": "first vendor"' in out or "first vendor" in out
            n_docs = cli("--port", str(port), "stats", "--indexName", "testIdx")
            print(f"replica :{port} -> search hit={hit}")
            ok &= hit and '"numDocs": 5' in n_docs
        print("\nDEMO", "PASSED" if ok else "FAILED")
        return 0 if ok else 1
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
