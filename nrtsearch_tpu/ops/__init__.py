"""Device ops: the XLA/Pallas compute core of the query engine.

These replace Lucene's postings-decode + BM25 + WAND + top-k inner loops
(the reference's hot loop: per-slice BulkScorer scoring in SearchHandler's
executeSearch, SURVEY.md §3.3) with batched device programs:

- ``bm25``: gather-coalesced term-at-a-time BM25 scoring over a query batch.
- ``masks``: filter-query mask algebra over columnar doc values.
- ``topk``: fused masked top-k selection.
- ``knn``: matmul-shaped brute-force / IVF MIPS vector search.

The first implementation is pure XLA (scatter/gather + top_k); the Pallas
block-max WAND kernel slots in behind the same interfaces.
"""
