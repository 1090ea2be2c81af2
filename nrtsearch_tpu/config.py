"""Server configuration: one YAML file with env-var substitution.

Reference equivalent: server/config/NrtsearchConfig.java:41 (YAML parse with
``${VAR}`` substitution at :133) plus its sub-configs (ThreadPoolConfiguration,
IndexStartConfig, ...). Unknown keys are preserved and reachable via ``get``
so plugins can carry their own config blocks.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional

import yaml

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)(?::([^}]*))?\}")


def _substitute_env(value: Any) -> Any:
    if isinstance(value, str):
        def repl(m):
            return os.environ.get(m.group(1), m.group(2) or "")

        return _ENV_RE.sub(repl, value)
    if isinstance(value, dict):
        return {k: _substitute_env(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_substitute_env(v) for v in value]
    return value


def _default_grpc_threads() -> int:
    """gRPC handler pool sizing (reference: ThreadPoolConfiguration's
    available-processors default). Handler threads mostly BLOCK on the
    serving micro-batcher, so the pool must exceed the target formed-batch
    size or batching can never coalesce past the pool width."""
    import os as _os

    return min(64, max(16, 2 * (_os.cpu_count() or 8)))


@dataclass
class ThreadPoolConfig:
    """Named executor pools (reference: ThreadPoolConfiguration.java:29-65)."""

    search_threads: int = 4
    index_threads: int = 4
    fetch_threads: int = 4
    grpc_threads: int = field(default_factory=_default_grpc_threads)
    commit_threads: int = 2
    retriever_threads: int = 4
    remote_threads: int = 4

    @classmethod
    def from_dict(cls, d: dict) -> "ThreadPoolConfig":
        return cls(
            search_threads=int(d.get("search", {}).get("maxThreads", 4)),
            index_threads=int(d.get("index", {}).get("maxThreads", 4)),
            fetch_threads=int(d.get("fetch", {}).get("maxThreads", 4)),
            grpc_threads=int(
                d.get("grpc", {}).get("maxThreads", _default_grpc_threads())
            ),
            commit_threads=int(d.get("commit", {}).get("maxThreads", 2)),
            retriever_threads=int(d.get("retriever", {}).get("maxThreads", 4)),
            remote_threads=int(d.get("remote", {}).get("maxThreads", 4)),
        )


@dataclass
class NrtsearchConfig:
    node_name: str = "main"
    service_name: str = "nrtsearch-tpu"
    host_name: str = "localhost"
    port: int = 8000
    replication_port: int = 8001
    state_dir: str = "state"
    index_dir: str = "index"
    bucket_name: str = ""
    plugins: list[str] = field(default_factory=list)
    plugin_search_path: str = "plugins"
    thread_pools: ThreadPoolConfig = field(default_factory=ThreadPoolConfig)
    publish_jvm_metrics: bool = False
    max_warming_queries: int = 1000
    warming_parallelism: int = 1
    warm_basic_query_only_perc: float = 0.0
    isolated_replica_polling_sec: float = 30.0
    # FileCopyConfig (reference: config/FileCopyConfig.java)
    file_copy_chunk_size: int = 64 * 1024
    acked_copy: bool = False
    ack_every: int = 1000
    max_in_flight: int = 2000
    max_concurrent_copies: int = 0   # 0 = unbounded
    max_copy_mb_per_sec: float = 0.0  # 0 = unlimited
    # serving micro-batching: coalesce concurrent eligible text queries into
    # one fused device dispatch (TPU-first addition; no reference analogue --
    # Lucene parallelizes WITHIN one query, the TPU wins by batching ACROSS)
    micro_batch_enabled: bool = True
    micro_batch_window_ms: float = 1.0
    micro_batch_max: int = 64
    raw: dict = field(default_factory=dict)

    @classmethod
    def load(cls, path: Optional[str | Path] = None) -> "NrtsearchConfig":
        raw: dict = {}
        if path is not None:
            with open(path) as f:
                raw = yaml.safe_load(f) or {}
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> "NrtsearchConfig":
        raw = _substitute_env(raw or {})
        return cls(
            node_name=str(raw.get("nodeName", "main")),
            service_name=str(raw.get("serviceName", "nrtsearch-tpu")),
            host_name=str(raw.get("hostName", "localhost")),
            port=int(raw.get("port", 8000)),
            replication_port=int(raw.get("replicationPort", 8001)),
            state_dir=str(raw.get("stateDir", "state")),
            index_dir=str(raw.get("indexDir", "index")),
            bucket_name=str(raw.get("bucketName", "")),
            plugins=list(raw.get("plugins", [])),
            plugin_search_path=str(raw.get("pluginSearchPath", "plugins")),
            thread_pools=ThreadPoolConfig.from_dict(raw.get("threadPoolConfiguration", {})),
            max_warming_queries=int(raw.get("warmer", {}).get("maxWarmingQueries", 1000)),
            warming_parallelism=int(raw.get("warmer", {}).get("warmingParallelism", 1)),
            warm_basic_query_only_perc=float(
                raw.get("warmer", {}).get("warmBasicQueryOnlyPerc", 0.0)
            ),
            isolated_replica_polling_sec=float(
                raw.get("isolatedReplica", {}).get("pollingIntervalSeconds", 30.0)
            ),
            file_copy_chunk_size=int(
                raw.get("FileCopyConfig", {}).get("chunkSize", 64 * 1024)
            ),
            acked_copy=bool(raw.get("FileCopyConfig", {}).get("ackedCopy", False)),
            ack_every=int(raw.get("FileCopyConfig", {}).get("ackEvery", 1000)),
            max_in_flight=int(
                raw.get("FileCopyConfig", {}).get("maxInFlight", 2000)
            ),
            max_concurrent_copies=int(
                raw.get("FileCopyConfig", {}).get("maxConcurrentCopies", 0)
            ),
            max_copy_mb_per_sec=float(
                raw.get("FileCopyConfig", {}).get("maxCopyMBPerSec", 0.0)
            ),
            micro_batch_enabled=bool(
                raw.get("microBatch", {}).get("enabled", True)
            ),
            micro_batch_window_ms=float(
                raw.get("microBatch", {}).get("windowMs", 1.0)
            ),
            micro_batch_max=int(raw.get("microBatch", {}).get("maxSize", 64)),
            raw=raw,
        )

    def get(self, dotted_key: str, default: Any = None) -> Any:
        """Typed getter over the raw tree: get('a.b.c', default)."""
        node: Any = self.raw
        for part in dotted_key.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node
