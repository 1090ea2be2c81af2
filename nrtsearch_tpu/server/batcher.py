"""Serving micro-batcher: coalesce concurrent text queries into one dispatch.

The reference parallelizes WITHIN one query (segment slices onto the SEARCH
pool, MyIndexSearcher.java:79); the TPU equivalent of that fan-out is the
packed multi-segment view (core/packed_view.py). The orthogonal TPU win is
batching ACROSS queries: the fused merge-score kernel's cost is dominated by
fixed dispatch + bandwidth that a whole batch shares, so N concurrent gRPC
searches answered by ONE ``fast_search_batch`` dispatch multiply QPS at
near-constant latency (bench.py measures this: batch-32 throughput is ~25x
batch-1).

Mechanics: an eligible search (plain match/term query, no sort/facets/knn —
handlers.search decides) submits its compiled QuerySpec and blocks; a worker
drains the queue, groups by (searcher snapshot, field), pads the group to a
power-of-two batch (bounding jit cache growth), runs one fused dispatch, and
distributes per-query TopDocs. A lone query under light load pays at most
``window_ms`` extra — noise against the device dispatch floor.
"""

from __future__ import annotations

import threading
import time
import weakref
from dataclasses import dataclass, field
from typing import Optional

# live batchers, for test-harness thread cleanup (leaked worker threads
# across hundreds of in-process server fixtures destabilize the process)
_LIVE_BATCHERS: "weakref.WeakSet" = weakref.WeakSet()


@dataclass
class _Pending:
    searcher: object
    spec: object          # core.packed_view.QuerySpec
    k: int
    done: threading.Event = field(default_factory=threading.Event)
    result: object = None
    error: Optional[BaseException] = None


class SearchBatcher:
    def __init__(self, max_batch: int = 64, window_ms: float = 1.0,
                 metrics=None, workers: int = 0):
        import os

        self.max_batch = max(int(max_batch), 1)
        self.window_s = max(float(window_ms), 0.0) / 1000.0
        self.metrics = metrics
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._pending: list[_Pending] = []
        self._stopped = False
        self.batches_formed = 0
        self.queries_batched = 0
        self.batch_size_hist: dict[int, int] = {}
        # multiple dispatch workers: device dispatch round trips through the
        # axon tunnel serialize per thread (~31 ms, profile_dense.py) but
        # overlap across threads — one worker caps serving at
        # batch/(RT+device) regardless of device speed
        if workers <= 0:
            workers = int(os.environ.get("NRT_BATCHER_WORKERS", "8"))
        # continuous-batching cap: while other dispatches are in flight
        # their latency hides the formation wait, so a worker may keep
        # forming up to this long before dispatching a partial batch
        # (PERF_E2E_r05: with a 1 ms window at ~40 ms dispatch latency, 8
        # workers grabbed 1-2 queries each — avg batch 1.75 at 32 clients)
        self.window_max_s = float(
            os.environ.get("NRT_BATCHER_WINDOW_MAX_MS", "25")
        ) / 1000.0
        self._in_flight = 0
        self._threads = [
            threading.Thread(
                target=self._worker, name=f"search-batcher-{i}", daemon=True
            )
            for i in range(max(workers, 1))
        ]
        for t in self._threads:
            t.start()
        _LIVE_BATCHERS.add(self)

    def stats(self) -> dict:
        """Formed-batch counters (avg size = coalescing actually happening)."""
        n = self.batches_formed
        return {
            "batches_formed": n,
            "queries_batched": self.queries_batched,
            "avg_batch_size": round(self.queries_batched / n, 2) if n else 0.0,
            "batch_size_hist": {
                str(k): v for k, v in sorted(self.batch_size_hist.items())
            },
        }

    def stop(self) -> None:
        with self._cv:
            self._stopped = True
            self._cv.notify_all()
        for t in self._threads:
            t.join(timeout=5)

    # -- client side -------------------------------------------------------------

    def search(self, searcher, spec, k: int):
        """Submit one query; blocks until its group's dispatch completes.
        Returns a core.searcher.TopDocs. A stopped batcher degrades to a
        direct unbatched dispatch (never hangs a late caller)."""
        p = _Pending(searcher, spec, k)
        with self._cv:
            if self._stopped:
                p = None
            else:
                self._pending.append(p)
                self._cv.notify()
        if p is None:
            direct = _Pending(searcher, spec, k)
            self._run_group([direct])
            if direct.error is not None:
                raise direct.error
            return direct.result
        p.done.wait()
        if p.error is not None:
            raise p.error
        return p.result

    # -- worker ------------------------------------------------------------------

    def _worker(self) -> None:
        while True:
            with self._cv:
                while not self._pending and not self._stopped:
                    self._cv.wait()
                if self._stopped:
                    for p in self._pending:
                        p.error = RuntimeError("batcher stopped")
                        p.done.set()
                    self._pending.clear()
                    return
            # brief formation window: let concurrent queries pile up
            if self.window_s:
                deadline = time.monotonic() + self.window_s
                while time.monotonic() < deadline:
                    with self._lock:
                        if len(self._pending) >= self.max_batch:
                            break
                    time.sleep(self.window_s / 4)
            # continuous batching: while other dispatches are in flight,
            # keep forming — the in-flight latency hides the wait, and the
            # arrivals they are blocking coalesce into THIS batch. A lone
            # query with nothing in flight dispatches immediately.
            if self.window_max_s:
                deadline = time.monotonic() + self.window_max_s
                while time.monotonic() < deadline:
                    with self._lock:
                        if (
                            len(self._pending) >= self.max_batch
                            or self._in_flight == 0
                            or not self._pending
                        ):
                            break
                    time.sleep(0.0005)
            with self._cv:
                if not self._pending:
                    continue
                head = self._pending[0]
                key = (id(head.searcher), head.spec.field)
                group = [
                    p for p in self._pending
                    if (id(p.searcher), p.spec.field) == key
                ][: self.max_batch]
                for p in group:
                    self._pending.remove(p)
                self._in_flight += 1
            try:
                self._run_group(group)
            finally:
                with self._lock:
                    self._in_flight -= 1

    def _run_group(self, group: list[_Pending]) -> None:
        try:
            searcher = group[0].searcher
            k = _pow2(max(p.k for p in group), 8)
            specs = [p.spec for p in group]
            # pad the batch to a power of two with empty specs so compiled
            # program shapes stay bounded (empty specs plan zero runs)
            from nrtsearch_tpu.core.packed_view import QuerySpec

            # floor of 8 bounds compiled batch shapes to {8,16,32,...}: under
            # concurrency, ragged group sizes otherwise mint one compiled
            # program per pow2 size per width bucket (compile storms at p99)
            b_pad = min(_pow2(len(specs), 8), _pow2(self.max_batch, 1))
            pad_spec = QuerySpec(field=specs[0].field, terms=())
            specs = specs + [pad_spec] * (b_pad - len(specs))
            results = searcher.fast_search_batch(specs, k)
            self.batches_formed += 1
            self.queries_batched += len(group)
            g = len(group)
            self.batch_size_hist[g] = self.batch_size_hist.get(g, 0) + 1
            if self.metrics is not None:
                try:
                    self.metrics.micro_batch_size.observe(len(group))
                except Exception:
                    pass
            for p, td in zip(group, results):
                td.hits = td.hits[: p.k]
                p.result = td
                p.done.set()
        except BaseException as e:  # deliver failures to every waiter
            for p in group:
                if not p.done.is_set():
                    p.error = e
                    p.done.set()


def _pow2(n: int, minimum: int = 1) -> int:
    b = minimum
    while b < n:
        b <<= 1
    return b
