"""Query algebra: proto Query tree -> device-executable plan.

Reference equivalent: server/query/QueryNodeMapper.java:99 (proto oneof ->
Lucene Query) plus Lucene's Weight/Scorer machinery. Here a query compiles to
a tree of plan nodes; evaluation against one segment produces a
``(scores [B, D], match [B, D])`` pair on device (query/eval.py).
"""

from nrtsearch_tpu.query.plan import (
    BooleanClause,
    BooleanQueryNode,
    ExistsQueryNode,
    FunctionScoreNode,
    GeoBoundingBoxNode,
    GeoRadiusNode,
    MatchAllNode,
    MatchQueryNode,
    Occur,
    PhraseQueryNode,
    QueryNode,
    RangeQueryNode,
    TermInSetNode,
    TermQueryNode,
    parse_query,
)

__all__ = [
    "BooleanClause",
    "BooleanQueryNode",
    "ExistsQueryNode",
    "FunctionScoreNode",
    "GeoBoundingBoxNode",
    "GeoRadiusNode",
    "MatchAllNode",
    "MatchQueryNode",
    "Occur",
    "PhraseQueryNode",
    "QueryNode",
    "RangeQueryNode",
    "TermInSetNode",
    "TermQueryNode",
    "parse_query",
]
