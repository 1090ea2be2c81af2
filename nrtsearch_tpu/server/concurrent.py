"""Named executor pools.

Reference: server/concurrent/ExecutorFactory.java:39 — central registry of
named pools (SEARCH, INDEX, FETCH, GRPC, COMMIT, REMOTE, RETRIEVER, ...) with
bounded queues and rejection counters. Device programs serialize on the chip,
so pools here serve the HOST-side stages: field fetch, highlight, inner hits,
commit uploads, replication copies.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

from nrtsearch_tpu.config import NrtsearchConfig, ThreadPoolConfig


class ExecutorFactory:
    _instance: Optional["ExecutorFactory"] = None
    _lock = threading.Lock()

    def __init__(self, config: Optional[ThreadPoolConfig] = None):
        cfg = config or ThreadPoolConfig()
        self._pools: dict[str, ThreadPoolExecutor] = {}
        self._sizes = {
            "SEARCH": cfg.search_threads,
            "INDEX": cfg.index_threads,
            "FETCH": cfg.fetch_threads,
            "COMMIT": cfg.commit_threads,
            "REMOTE": cfg.remote_threads,
            "RETRIEVER": cfg.retriever_threads,
        }

    def pool(self, name: str) -> ThreadPoolExecutor:
        if name not in self._pools:
            with self._lock:
                if name not in self._pools:
                    self._pools[name] = ThreadPoolExecutor(
                        max_workers=self._sizes.get(name, 4),
                        thread_name_prefix=f"nrt-{name.lower()}",
                    )
        return self._pools[name]

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
