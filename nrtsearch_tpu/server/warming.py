"""Warming: sample live search requests, persist them, replay on startup.

Reference: server/warming/ (Warmer.addSearchRequest reservoir sampling at
Warmer.java:96, S3 backup at :108, replay-on-replica-start with parallelism
and warmBasicQueryOnlyPerc). Warming matters doubly on TPU: replay triggers
the XLA compilations for the live query shapes before traffic arrives.
"""

from __future__ import annotations

import json
import logging
import random
import threading
from typing import Optional

from google.protobuf.json_format import MessageToJson, Parse

log = logging.getLogger("nrtsearch_tpu.warming")


class Warmer:
    def __init__(self, index_name: str, max_queries: int = 1000, seed: int = 0):
        self.index_name = index_name
        self.max_queries = max_queries
        self._samples: list[str] = []
        self._seen = 0
        self._lock = threading.Lock()
        self._rng = random.Random(seed)

    def add_search_request(self, request) -> None:
        """Reservoir-sample one live request (Warmer.java:96)."""
        s = MessageToJson(request, indent=None)
        with self._lock:
            self._seen += 1
            if len(self._samples) < self.max_queries:
                self._samples.append(s)
            else:
                j = self._rng.randrange(self._seen)
                if j < self.max_queries:
                    self._samples[j] = s

    def backup(self, remote, service: str, index_id: str) -> int:
        """Persist sampled queries to the object store (backupWarmingQueries)."""
        with self._lock:
            data = "\n".join(self._samples)
        remote.upload_versioned(service, f"{index_id}/warming_queries", data.encode())
        return len(self._samples)

    @staticmethod
    def warm_from_remote(
        remote, service: str, index_id: str, search_fn, parallelism: int = 1,
        basic_only_perc: float = 0.0,
    ) -> int:
        """Replay persisted warming queries (Warmer.warmFromS3 equivalent)."""
        from nrtsearch_tpu.gen import pb

        data = remote.download_current(service, f"{index_id}/warming_queries")
        if not data:
            return 0
        count = 0
        rng = random.Random(0)
        for line in data.decode().splitlines():
            if not line.strip():
                continue
            try:
                req = Parse(line, pb.SearchRequest())
                if basic_only_perc and rng.random() * 100 < basic_only_perc:
                    basic = pb.SearchRequest(
                        indexName=req.indexName, topHits=req.topHits
                    )
                    if req.HasField("query"):
                        basic.query.CopyFrom(req.query)
                    req = basic
                search_fn(req)
                count += 1
            except Exception as e:
                log.warning("warming query failed: %s", e)
        return count
