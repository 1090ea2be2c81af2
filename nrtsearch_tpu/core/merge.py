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
from typing import Sequence

import numpy as np

from nrtsearch_tpu.core.segment import (
    Segment,
    SegmentBuilder,
    _SEG_COUNTER,
)
from nrtsearch_tpu.schema.fields import DocValueKind, FieldDef


def merge_segments(
    segments: Sequence[Segment], field_defs: dict[str, FieldDef]
) -> tuple[Segment, dict[str, np.ndarray]]:
    """Merge segments, dropping deleted docs.

    Returns (merged_segment, remap) where ``remap[seg_id][old_local] -> new
    local id or -1`` for deleted docs.
    """
    remap: dict[str, np.ndarray] = {}
    new_local = 0
    for seg in segments:
        m = np.full(seg.num_docs, -1, dtype=np.int64)
        live_ids = np.nonzero(seg.host_live)[0]
        m[live_ids] = np.arange(new_local, new_local + len(live_ids))
        new_local += len(live_ids)
        remap[seg.seg_id] = m

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
            vals = np.asarray(vc.values)
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

    merged = builder.flush(seg_id=f"seg_{next(_SEG_COUNTER)}_m")
    assert merged is not None
    return merged, remap
