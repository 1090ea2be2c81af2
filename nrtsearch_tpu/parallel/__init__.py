"""Parallelism: device-mesh sharding of the search engine.

Re-expresses the reference's parallelism inventory (SURVEY.md §2.7) in mesh
terms:

- intra-query segment parallelism + virtual shards (MyIndexSearcher.slices /
  slicesForShards) -> documents sharded over the ``shard`` mesh axis, one XLA
  program with an all_gather top-k merge over ICI;
- read replication (1 primary / N replicas) -> query batch sharded over the
  ``data`` mesh axis (each data-group serves its slice of traffic against a
  full doc replica within its shard groups);
- the reduce step (per-slice collector merge) -> on-device candidate
  all_gather + final top-k, instead of a host-side reduce.
"""

from nrtsearch_tpu.parallel.distributed import (
    DistributedBM25,
    make_search_mesh,
)

__all__ = ["DistributedBM25", "make_search_mesh"]
