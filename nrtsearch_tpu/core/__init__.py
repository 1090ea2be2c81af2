"""Core index structures: immutable segments, the index writer, the searcher.

The Lucene design axiom that maps onto JAX: segments are immutable. A segment
here is a set of immutable device arrays (postings, doc values, vectors) plus
small host-side dictionaries (term tables, stored fields). A "searcher" is an
immutable snapshot of a list of segments; refresh publishes a new snapshot and
replica searcher-swap is a pointer swap (SURVEY.md §7 representation choices).
"""

from nrtsearch_tpu.core.segment import Segment, SegmentBuilder
from nrtsearch_tpu.core.searcher import Searcher
from nrtsearch_tpu.core.writer import IndexWriter

__all__ = ["Segment", "SegmentBuilder", "Searcher", "IndexWriter"]
