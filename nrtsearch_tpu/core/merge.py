"""Segment merging: N immutable segments -> one compacted segment.

Equivalent of Lucene's merge machinery (the reference tunes it via
BucketedTieredMergePolicy, server/index/). Merging is a host-side re-pack:
device arrays are read back, deleted docs are compacted out, doc ids remapped,
term dictionaries unioned, and a fresh immutable segment is shipped to device.
Merges are rare and off the query path, so host numpy is the right tool; a
device merge (sorted-run merge via XLA) is a later optimization.
"""

from __future__ import annotations

import itertools
from typing import Optional, Sequence

import numpy as np

from nrtsearch_tpu.core.segment import (
    Segment,
    SegmentBuilder,
    new_seg_id,
)
from nrtsearch_tpu.schema.fields import DocValueKind, FieldDef


def merge_segments(
    segments: Sequence[Segment],
    field_defs: dict[str, FieldDef],
    index_sort: Optional[Sequence[tuple[str, bool, bool]]] = None,
) -> tuple[Segment, dict[str, np.ndarray]]:
    """Merge segments, dropping deleted docs.

    Returns (merged_segment, remap) where ``remap[seg_id][old_local] -> new
    local id or -1`` for deleted docs.

    ``index_sort``: optional list of (field, reverse, missing_last) — the
    merged segment's docs are laid out in this doc-value order (reference:
    IndexSettings.indexSort -> IndexWriterConfig.setIndexSort; Lucene sorts
    at flush and merge). Segments containing nested child docs are never
    sorted (blocks must stay contiguous).
    """
    remap: dict[str, np.ndarray] = {}
    new_local = 0
    for seg in segments:
        m = np.full(seg.num_docs, -1, dtype=np.int64)
        live_ids = np.nonzero(seg.host_live)[0]
        m[live_ids] = np.arange(new_local, new_local + len(live_ids))
        new_local += len(live_ids)
        remap[seg.seg_id] = m

    if index_sort and not any(_has_nested_children(s) for s in segments):
        _apply_index_sort(segments, remap, new_local, index_sort)

    builder = SegmentBuilder(field_defs)
    builder.num_docs = new_local

    # Re-pack through the builder's internal structures so packing logic stays
    # in one place: reconstruct postings/doc-values/stored from host copies.
    for seg in segments:
        m = remap[seg.seg_id]
        for fname, tfi in seg.fields.items():
            post = builder._postings.setdefault(fname, {})
            lens = builder._doc_lens.setdefault(fname, [])
            doc_ids = (
                tfi.host_doc_ids
                if tfi.host_doc_ids is not None
                else np.asarray(tfi.doc_ids)[: tfi.postings_len]
            )
            freqs = (
                tfi.host_freqs
                if tfi.host_freqs is not None
                else np.asarray(tfi.freqs)[: tfi.postings_len]
            )
            inv_terms = [None] * len(tfi.terms)
            for term, tid in tfi.terms.items():
                inv_terms[tid] = term
            for tid, term in enumerate(inv_terms):
                off, ln = int(tfi.offsets[tid]), int(tfi.lengths[tid])
                for e in range(off, off + ln):
                    nd = m[int(doc_ids[e])]
                    if nd < 0:
                        continue
                    if tfi.positions is not None and tfi.position_offsets is not None:
                        pos = tfi.positions[
                            tfi.position_offsets[e] : tfi.position_offsets[e + 1]
                        ].tolist()
                    else:
                        pos = []
                    post.setdefault(term, []).append((int(nd), float(freqs[e]), pos))
            seg_lens = np.asarray(tfi.doc_lens)[: seg.num_docs]
            while len(lens) < new_local:
                lens.append(0)
            for old, new in enumerate(m):
                if new >= 0:
                    lens[int(new)] = int(seg_lens[old])
        for fname, dv in seg.doc_values.items():
            out = builder._dv.setdefault(fname, [])
            if dv.mv_offsets is not None:
                for old in range(seg.num_docs):
                    new = m[old]
                    if new < 0:
                        continue
                    for v in dv.mv_values[dv.mv_offsets[old] : dv.mv_offsets[old + 1]]:
                        val = dv.ord_terms[int(v)] if dv.ord_terms else v.item()
                        out.append((int(new), val))
            else:
                for old in range(seg.num_docs):
                    new = m[old]
                    if new < 0 or not dv.host_present[old]:
                        continue
                    if dv.kind == DocValueKind.ORDINAL:
                        out.append((int(new), dv.ord_terms[int(dv.host_values[old])]))
                    elif dv.kind == DocValueKind.LAT_LON:
                        out.append((int(new), tuple(dv.host_values[old])))
                    elif dv.kind == DocValueKind.POLYGON:
                        # geojson strings ride doc-indexed in ord_terms
                        out.append((int(new), dv.ord_terms[old]))
                    else:
                        out.append((int(new), dv.host_values[old].item()))
        for fname, vc in seg.vectors.items():
            out = builder._vectors.setdefault(fname, [])
            vals = vc.host_float()
            pres = np.asarray(vc.present)
            for old in range(seg.num_docs):
                new = m[old]
                if new >= 0 and pres[old]:
                    out.append((int(new), vals[old]))
        for fname, entries in seg.suggest.items():
            out = builder._suggest.setdefault(fname, [])
            for doc, text, weight, ctxs in entries:
                nd = m[int(doc)]
                if nd >= 0:
                    out.append((int(nd), text, weight, list(ctxs)))
        for old in range(seg.num_docs):
            new = m[old]
            if new >= 0:
                while len(builder._stored) <= new:
                    builder._stored.append({})
                builder._stored[int(new)] = seg.stored[old]

    while len(builder._stored) < new_local:
        builder._stored.append({})

    # order postings within each term by new doc id (merge may interleave)
    for post in builder._postings.values():
        for term in post:
            post[term].sort(key=lambda p: p[0])

    merged = builder.flush(seg_id=new_seg_id("_m"))
    assert merged is not None
    return merged, remap


def _has_nested_children(seg: Segment) -> bool:
    parents = seg.parent_positions()
    return parents is not None and len(parents) != seg.num_docs


def _apply_index_sort(
    segments: Sequence[Segment],
    remap: dict[str, np.ndarray],
    total: int,
    index_sort: Sequence[tuple[str, bool, bool]],
) -> None:
    """Rewrite ``remap`` in place so new local ids follow the index sort.

    Multi-key sort is a chain of stable single-key passes (last key first);
    each pass orders by value with the key's reverse flag, then moves docs
    missing the value to the front/back per missing_last — so missing
    placement is direction-independent, matching SortField missing-value
    semantics."""
    # preliminary id -> (segment, old local)
    origin: list[tuple[Segment, int]] = [None] * total  # type: ignore[list-item]
    for seg in segments:
        m = remap[seg.seg_id]
        for old in np.nonzero(m >= 0)[0]:
            origin[int(m[old])] = (seg, int(old))

    order = list(range(total))
    for field, reverse, missing_last in reversed(list(index_sort)):
        keys: list = [None] * total
        present = np.zeros(total, dtype=bool)
        for i, (seg, old) in enumerate(origin):
            dv = seg.doc_values.get(field)
            if dv is None or not dv.host_present[old]:
                continue
            if dv.kind == DocValueKind.ORDINAL:
                # per-segment ordinals are not comparable across segments
                keys[i] = dv.ord_terms[int(dv.host_values[old])]
            else:
                keys[i] = dv.host_values[old].item()
        present[[i for i in range(total) if keys[i] is not None]] = True
        fallback = "" if any(isinstance(k, str) for k in keys if k is not None) else 0.0
        order.sort(
            key=lambda i: keys[i] if keys[i] is not None else fallback,
            reverse=reverse,
        )
        order.sort(key=lambda i: (0 if present[i] else (1 if missing_last else -1)))
    inv = np.empty(total, dtype=np.int64)
    inv[np.asarray(order, dtype=np.int64)] = np.arange(total)
    for seg in segments:
        m = remap[seg.seg_id]
        live = m >= 0
        m[live] = inv[m[live]]
