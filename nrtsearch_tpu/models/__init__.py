"""Models: fused end-to-end device programs for the serving hot paths.

The "flagship model" of this framework is the batched BM25 retrieval step —
the program that replaces the reference's per-query Lucene scoring loop
(SearchHandler.executeSearch -> BulkScorer, SURVEY.md §3.3) with one fused
XLA program per (segment-shape, batch-shape): postings gather -> BM25 ->
live/match masking -> top-k. The distributed variant shards documents and
query batches over a 2D device mesh (parallel/distributed.py).
"""

from nrtsearch_tpu.models.flagship import (
    BatchedBM25,
    QueryBatch,
    SyntheticCorpus,
    bm25_search_step,
)

__all__ = ["BatchedBM25", "QueryBatch", "SyntheticCorpus", "bm25_search_step"]
