"""Aggregation collectors and facets.

Reference: server/search/collectors/additional/ (TermsCollectorManager,
FilterCollectorManager, Min/Max/Sum, TopHitsCollector, NestedCollectorManagers
— 20 files, SURVEY.md §2.4) and server/facet/ (SSDV/numeric-range facets).

Collectors run beside recall over the full match set. Evaluation here is
columnar: the query's per-segment (scores, match) arrays drive masked
reductions over doc-value columns. This first implementation reduces on the
host over the segments' host-resident columns (correct and simple); the
device path (bincount/segment-reduce kernels over ordinal columns) slots in
behind the same interface.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Optional

import numpy as np

from nrtsearch_tpu.core.searcher import Searcher
from nrtsearch_tpu.schema.fields import DocValueKind, FieldDef


class SegmentMatches:
    """Per-segment match masks + scores for the current query (host copies)."""

    def __init__(self, searcher: Searcher, masks, scores=None):
        self.searcher = searcher
        self.masks = [np.asarray(m) for m in masks]
        self.scores = [np.asarray(s) for s in scores] if scores is not None else None

    def and_mask(self, other_masks) -> "SegmentMatches":
        return SegmentMatches(
            self.searcher,
            [m & np.asarray(o) for m, o in zip(self.masks, other_masks)],
            self.scores,
        )


def _iter_field_values(seg, field: str):
    """Yields (local_doc_ids, values) covering all values incl. multi-valued."""
    dv = seg.doc_values.get(field)
    if dv is None:
        return None
    if dv.mv_offsets is not None:
        docs = np.repeat(np.arange(seg.num_docs), np.diff(dv.mv_offsets))
        vals = dv.mv_values
        if dv.kind == DocValueKind.ORDINAL:
            return docs, vals, dv.ord_terms
        return docs, vals, None
    present = dv.host_present[: seg.num_docs]
    docs = np.nonzero(present)[0]
    vals = dv.host_values[: seg.num_docs][present]
    if dv.kind == DocValueKind.ORDINAL:
        return docs, vals, dv.ord_terms
    return docs, vals, None


def terms_counts(
    matches: SegmentMatches, field: str
) -> dict[str, int]:
    """Count of each term value among matching docs (TermsCollectorManager)."""
    out: dict[Any, int] = defaultdict(int)
    for seg, mask in zip(matches.searcher.segments, matches.masks):
        it = _iter_field_values(seg, field)
        if it is None:
            continue
        docs, vals, ord_terms = it
        hit = mask[: seg.num_docs][docs]
        if not hit.any():
            continue
        vals = np.asarray(vals)[hit]
        uniq, counts = np.unique(vals, return_counts=True)
        for v, c in zip(uniq, counts):
            key = ord_terms[int(v)] if ord_terms is not None else _fmt_num(v)
            out[key] += int(c)
    return dict(out)


def _fmt_num(v) -> str:
    v = v.item() if hasattr(v, "item") else v
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def numeric_stat(
    matches: SegmentMatches, field: str, op: str,
    script_source: Optional[str] = None,
) -> float:
    """sum/min/max over a doc-value column or script among matching docs."""
    agg: list[float] = []
    for seg, mask in zip(matches.searcher.segments, matches.masks):
        if script_source is not None:
            from nrtsearch_tpu.query.eval import _ScriptDocValues
            from nrtsearch_tpu.script.expr import compile_expression

            vals_full = np.asarray(
                compile_expression(script_source)(
                    _ScriptDocValues(seg), np.zeros(seg.capacity, np.float32)
                )
            )
            m = mask[: seg.num_docs]
            vals = vals_full[: seg.num_docs][m]
        else:
            it = _iter_field_values(seg, field)
            if it is None:
                continue
            docs, vals, ord_terms = it
            hit = mask[: seg.num_docs][docs]
            vals = np.asarray(vals, dtype=np.float64)[hit]
        if len(vals):
            agg.extend(
                [float(vals.sum() if op == "sum" else vals.min() if op == "min" else vals.max())]
            )
    if not agg:
        return 0.0
    if op == "sum":
        return float(np.sum(agg))
    return float(np.min(agg) if op == "min" else np.max(agg))


def hit_count(matches: SegmentMatches) -> int:
    return int(sum(m[: seg.num_docs].sum() for seg, m in
                   zip(matches.searcher.segments, matches.masks)))


def hierarchy_counts(
    matches: SegmentMatches, field: str, path: list[str]
) -> tuple[dict[str, int], int]:
    """Hierarchical facet counts: children one level below ``path`` for
    '/'-separated values (reference: taxonomy facets with
    FacetHierarchyPath; HIERARCHY facet type).

    Returns (child label -> doc count, total docs under path)."""
    prefix = "/".join(path)
    depth = len(path)
    out: dict[str, int] = defaultdict(int)
    total = 0
    for seg, mask in zip(matches.searcher.segments, matches.masks):
        it = _iter_field_values(seg, field)
        if it is None:
            continue
        docs, vals, ord_terms = it
        if ord_terms is None:
            continue
        hit = mask[: seg.num_docs][docs]
        if not hit.any():
            continue
        # per-doc dedupe of child labels (a doc counts once per child)
        seen: dict[int, set] = {}
        for doc, v in zip(docs[hit], np.asarray(vals)[hit]):
            parts = ord_terms[int(v)].split("/")
            if depth and parts[: depth] != path:
                continue
            if len(parts) <= depth:
                continue
            seen.setdefault(int(doc), set()).add(parts[depth])
        for doc, labels in seen.items():
            total += 1
            for label in labels:
                out[label] += 1
    return dict(out), total


def numeric_range_counts(
    matches: SegmentMatches, field: str, ranges: list[dict]
) -> list[tuple[str, int]]:
    """Numeric-range facet counts (reference: NumericRangeType, search.proto)."""
    out = []
    for r in ranges:
        lo = float(r.get("min", -np.inf))
        hi = float(r.get("max", np.inf))
        lo_inc = bool(r.get("minInclusive", True))
        hi_inc = bool(r.get("maxInclusive", False))
        count = 0
        for seg, mask in zip(matches.searcher.segments, matches.masks):
            it = _iter_field_values(seg, field)
            if it is None:
                continue
            docs, vals, _ = it
            vals = np.asarray(vals, dtype=np.float64)
            sel = (vals >= lo if lo_inc else vals > lo) & (
                vals <= hi if hi_inc else vals < hi
            )
            # count matching DOCS (dedupe multi-valued hits per doc)
            hit_docs = np.unique(docs[sel & mask[: seg.num_docs][docs]])
            count += len(hit_docs)
        out.append((r.get("label", ""), count))
    return out
