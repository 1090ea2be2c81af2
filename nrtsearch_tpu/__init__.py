"""nrtsearch_tpu — a TPU-native search engine with the capabilities of Yelp/nrtsearch.

A from-scratch rebuild of the nrtsearch contract (gRPC API, primary/replica NRT
segment replication, object-store durability) on a JAX/XLA/Pallas query engine:

- Inverted indexes are immutable, block-packed postings arrays resident in HBM,
  scored by fused BM25 + top-k device programs over *batches* of queries
  (reference scores one query per thread slice: MyIndexSearcher.java:79).
- Doc values are columnar device arrays; filters / sorts / facets / aggregation
  collectors are masked XLA reductions.
- Vector search is a partitioned brute-force / IVF MIPS kernel (matmul-shaped,
  MXU-friendly) instead of HNSW graph walking.
- NRT replication ships immutable segment arrays; a replica "searcher swap" is
  an atomic pointer swap onto a new set of device buffers.

Reference layer map: /root/repo/SURVEY.md §1; build plan §7.
"""

from nrtsearch_tpu.version import __version__

__all__ = ["__version__"]
