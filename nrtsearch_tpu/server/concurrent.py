"""Named executor pools.

Reference: server/concurrent/ExecutorFactory.java:39 — central registry of
named pools (SEARCH, INDEX, FETCH, GRPC, COMMIT, REMOTE, RETRIEVER, ...) with
bounded queues and rejection counters. Device programs serialize on the chip,
so pools here serve the HOST-side stages: field fetch, highlight, inner hits,
commit uploads, replication copies.
"""

from __future__ import annotations

import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Optional

from nrtsearch_tpu.config import NrtsearchConfig, ThreadPoolConfig

# queued tasks beyond workers * QUEUE_FACTOR run in the caller thread
# (reference: bounded pool queues + CallerRunsPolicy-style backpressure,
# server/concurrent/ExecutorFactory.java; the rejection count is exported
# like the reference's ThreadPoolCollector rejection family)
QUEUE_FACTOR = 16


class TrackedPool:
    """ThreadPoolExecutor with submission/rejection accounting and a bounded
    logical queue: when the backlog exceeds the bound, the task runs in the
    submitting thread (backpressure instead of unbounded memory)."""

    def __init__(self, name: str, max_workers: int):
        self.name = name
        self.max_workers = max_workers
        self._ex = ThreadPoolExecutor(
            max_workers=max_workers, thread_name_prefix=f"nrt-{name.lower()}"
        )
        self.max_queue = max_workers * QUEUE_FACTOR
        self.submitted = 0
        self.rejected = 0

    def submit(self, fn, /, *args, **kwargs) -> Future:
        self.submitted += 1
        if self._ex._work_queue.qsize() >= self.max_queue:
            self.rejected += 1
            f: Future = Future()
            try:
                f.set_result(fn(*args, **kwargs))  # caller-runs
            except BaseException as e:  # noqa: BLE001 - mirror Future contract
                f.set_exception(e)
            return f
        return self._ex.submit(fn, *args, **kwargs)

    def map(self, fn, *iterables):
        return self._ex.map(fn, *iterables)

    @property
    def queue_depth(self) -> int:
        return self._ex._work_queue.qsize()

    def shutdown(self, wait: bool = False) -> None:
        self._ex.shutdown(wait=wait)


class ExecutorFactory:
    _instance: Optional["ExecutorFactory"] = None
    _lock = threading.Lock()

    def __init__(self, config: Optional[ThreadPoolConfig] = None):
        cfg = config or ThreadPoolConfig()
        self._pools: dict[str, TrackedPool] = {}
        self._sizes = {
            "SEARCH": cfg.search_threads,
            "INDEX": cfg.index_threads,
            "FETCH": cfg.fetch_threads,
            "COMMIT": cfg.commit_threads,
            "REMOTE": cfg.remote_threads,
            "RETRIEVER": cfg.retriever_threads,
        }

    def pool(self, name: str) -> TrackedPool:
        if name not in self._pools:
            with self._lock:
                if name not in self._pools:
                    self._pools[name] = TrackedPool(
                        name, self._sizes.get(name, 4)
                    )
        return self._pools[name]

    def stats(self) -> dict[str, dict]:
        """Per-pool counters for the /metrics scrape."""
        return {
            name: {
                "submitted": p.submitted,
                "rejected": p.rejected,
                "queue_depth": p.queue_depth,
                "workers": p.max_workers,
            }
            for name, p in self._pools.items()
        }

    def shutdown(self) -> None:
        for p in self._pools.values():
            p.shutdown(wait=False)

    @classmethod
    def get(cls) -> "ExecutorFactory":
        if cls._instance is None:
            cls._instance = ExecutorFactory()
        return cls._instance

    @classmethod
    def init(cls, config: NrtsearchConfig) -> "ExecutorFactory":
        cls._instance = ExecutorFactory(config.thread_pools)
        return cls._instance
