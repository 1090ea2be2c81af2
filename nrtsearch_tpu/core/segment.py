"""Immutable TPU-resident index segments.

Replaces Lucene's on-disk segment formats (postings, norms, doc values, HNSW —
consumed by the reference as the Lucene library, SURVEY.md §2 native-code note)
with device arrays laid out for batched XLA/Pallas execution:

- **Postings** per searchable field: one flat ``doc_ids``/``freqs`` pair per
  segment with a per-term ``[offset, length]`` table. Doc ids are absolute
  within the segment (u32 deltas + block-max impact metadata come with the
  Pallas WAND kernel). Arrays are padded to power-of-two buckets so jit caches
  stay small as segments grow.
- **Norms**: per-field document length, already round-tripped through the
  Lucene-compatible byte quantization (utils/smallfloat.py) for BM25 parity.
- **Doc values**: one columnar array per field (int32 / float32 / float64 /
  ordinal-int32 with a host dictionary), plus a presence mask.
- **Vectors**: ``[num_docs, dims]`` float32 matrices (MIPS kernels are
  matmul-shaped; see ops/knn.py).
- **Stored fields**: host-side row store (fetch stage is host work).
- **Live docs**: boolean overlay mask; deletes replace the mask (immutability
  as the concurrency strategy, like the reference's ImmutableIndexState).
"""

from __future__ import annotations

import itertools
import uuid
from dataclasses import dataclass, field as dc_field
from typing import Any, Iterable, Optional

import numpy as np

from nrtsearch_tpu.schema.fields import DocValueKind, FieldDef, FieldType
from nrtsearch_tpu.utils.smallfloat import quantize_length

_SEG_COUNTER = itertools.count()
# Per-process random token baked into every segment id. Counters restart at 0
# on process launch; without this a restarted primary would mint a seg id that
# collides with files already on disk / replicas (save_segment skips existing
# base files), silently serving stale segment bytes. Unique-by-construction
# ids replace the reference's FileMetaData length+checksum comparison as the
# first line of defense (point-state file metadata is the second).
_SEG_TOKEN = uuid.uuid4().hex[:8]


def new_seg_id(suffix: str = "") -> str:
    """Globally unique segment id: seg_<process-token>_<n>[suffix]."""
    return f"seg_{_SEG_TOKEN}_{next(_SEG_COUNTER)}{suffix}"


def pad_to_bucket(n: int, minimum: int = 128) -> int:
    """Next power-of-two bucket ≥ n (≥ minimum). Bounds jit recompilation."""
    b = minimum
    while b < n:
        b <<= 1
    return b


def _device_put(x: np.ndarray):
    import jax

    return jax.device_put(x)


# ---------------------------------------------------------------------------
# Per-field structures
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TextFieldIndex:
    """Inverted index for one field within one segment.

    ``terms`` maps term -> term id; ``offsets[tid]``/``lengths[tid]`` locate the
    term's postings run inside ``doc_ids``/``freqs`` (host int32 arrays — they
    are tiny per-query lookups). ``doc_ids``/``freqs``/``positions_*`` live on
    device. ``doc_lens`` is the quantized field length per doc (float32 on
    device, feeds the BM25 length norm).
    """

    terms: dict[str, int]
    offsets: np.ndarray      # host int64 [T]
    lengths: np.ndarray      # host int32 [T]
    doc_ids: Any             # device int32 [P_pad], padding = 0 (masked by caller)
    freqs: Any               # device float32 [P_pad]
    doc_lens: Any            # device float32 [D_pad], quantized lengths
    sum_doc_lens: int        # sum of quantized lengths (for avgdl)
    doc_count: int           # docs that have this field
    postings_len: int        # valid prefix of doc_ids/freqs
    # host-side copies for phrase verification / merging (device arrays stay
    # the scoring source of truth)
    host_doc_ids: Optional[np.ndarray] = None   # int32 [postings_len]
    host_freqs: Optional[np.ndarray] = None     # float32 [postings_len]
    # phrase positions: CSR over postings entries (host-resident; the phrase
    # verify stage runs on candidate docs, not the full corpus)
    positions: Optional[np.ndarray] = None           # int32 flat
    position_offsets: Optional[np.ndarray] = None    # int64 [postings_len + 1]

    def entry_index(self, term: str, doc: int) -> int:
        """Postings entry index of (term, doc), -1 if absent (host lookup)."""
        tid = self.terms.get(term)
        if tid is None or self.host_doc_ids is None:
            return -1
        off, ln = int(self.offsets[tid]), int(self.lengths[tid])
        run = self.host_doc_ids[off : off + ln]
        i = int(np.searchsorted(run, doc))
        if i < ln and run[i] == doc:
            return off + i
        return -1

    def positions_of(self, term: str, doc: int) -> np.ndarray:
        e = self.entry_index(term, doc)
        if e < 0 or self.positions is None:
            return np.empty(0, np.int32)
        return self.positions[self.position_offsets[e] : self.position_offsets[e + 1]]

    def lookup(self, term: str) -> tuple[int, int]:
        """(offset, length) of a term's postings, (0, 0) if absent."""
        tid = self.terms.get(term)
        if tid is None:
            return 0, 0
        return int(self.offsets[tid]), int(self.lengths[tid])

    def doc_freq(self, term: str) -> int:
        tid = self.terms.get(term)
        return 0 if tid is None else int(self.lengths[tid])

    def sorted_terms(self) -> np.ndarray:
        """Lazily-built sorted term vocabulary (unicode numpy array).

        The TPU-side analogue of the reference's prefix acceleration
        (PrefixFieldDef.java:33 materializes prefix terms; Lucene's FST term
        dict walks ranges): a sorted array + binary search turns O(vocab)
        prefix scans into O(log V + matches). Built once per segment field
        on first multi-term query, cached for the segment's lifetime
        (segments are immutable)."""
        cached = getattr(self, "_sorted_terms", None)
        if cached is None:
            cached = np.sort(np.array(list(self.terms), dtype=object))
            object.__setattr__(self, "_sorted_terms", cached)
        return cached

    def terms_with_prefix(self, prefix: str, limit: int) -> list[str]:
        """Up to ``limit`` vocabulary terms starting with ``prefix``, in
        lexicographic order (binary search over sorted_terms)."""
        st = self.sorted_terms()
        if not prefix:
            return list(st[: max(limit, 0)])
        lo = int(np.searchsorted(st, prefix, side="left"))
        out: list[str] = []
        for i in range(lo, len(st)):
            if len(out) >= limit or not st[i].startswith(prefix):
                break
            out.append(st[i])
        return out


@dataclass(frozen=True)
class DocValueColumn:
    """Columnar doc values for one field within one segment.

    Single-valued: ``values`` is [D_pad]; ``present`` is a bool mask.
    Multi-valued: CSR layout — ``mv_offsets`` [D+1] into ``values``.
    ORDINAL columns carry the host-side ordinal dictionary (``ord_terms``).
    """

    kind: DocValueKind
    values: Any                       # device array
    present: Any                      # device bool [D_pad]
    host_values: np.ndarray           # host copy (fetch + host-side collectors)
    host_present: np.ndarray
    ord_terms: Optional[list[str]] = None      # ordinal -> term
    ord_index: Optional[dict[str, int]] = None  # term -> ordinal
    mv_offsets: Optional[np.ndarray] = None     # host int32 [D+1] (multi-valued)
    mv_values: Optional[np.ndarray] = None      # host values (multi-valued)


@dataclass(frozen=True)
class VectorColumn:
    values: Any            # device [D_pad, dims]: f32 | bf16 | int8 (see fmt)
    present: Any           # device bool [D_pad]
    host_norms: np.ndarray  # per-doc L2 norms of the ORIGINAL f32 vectors
    # storage format (reference: VectorFieldDef.java:91-94 quantized formats).
    # int8 stores round(v / scale); sq_norms/host_norms stay exact f32 so
    # l2/cosine keep full-precision normalization.
    fmt: str = "float32"
    scale: float = 1.0     # int8 dequantization scale

    def host_float(self) -> np.ndarray:
        """Dequantized f32 host matrix (fetch / merge paths)."""
        arr = np.asarray(self.values)
        if self.fmt == "int8":
            return arr.astype(np.float32) * self.scale
        return arr.astype(np.float32)

    def device_float(self):
        """Dequantized f32 device matrix (dense eval paths; XLA fuses the
        cast so no f32 copy persists in HBM)."""
        import jax.numpy as jnp

        if self.fmt == "int8":
            return self.values.astype(jnp.float32) * jnp.float32(self.scale)
        return self.values.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Segment
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Segment:
    """One immutable segment: device arrays + host dictionaries."""

    seg_id: str
    num_docs: int
    capacity: int                     # padded doc dimension of device arrays
    fields: dict[str, TextFieldIndex]
    doc_values: dict[str, DocValueColumn]
    vectors: dict[str, VectorColumn]
    stored: list[dict]                # host row store, len == num_docs
    live: Any                         # device bool [capacity]
    host_live: np.ndarray             # host bool [num_docs]
    del_count: int = 0
    del_gen: int = 0                  # bumped per delete batch (Lucene del-gen)
    # CONTEXT_SUGGEST data: field -> list of (doc, text, weight, contexts)
    # (host-side completion structures, reference: ContextSuggestFieldDef)
    suggest: dict = dc_field(default_factory=dict)

    @property
    def live_doc_count(self) -> int:
        return self.num_docs - self.del_count

    def parent_positions(self) -> Optional[np.ndarray]:
        """Sorted local ids of parent (root) docs, None if no nesting info."""
        dv = self.doc_values.get(SegmentBuilder.NESTED_PATH_FIELD)
        if dv is None or not dv.ord_index:
            return None
        root_ord = dv.ord_index.get(SegmentBuilder.ROOT_PATH)
        if root_ord is None:
            return None
        return np.nonzero(dv.host_values[: self.num_docs] == root_ord)[0]

    def with_doc_value_updates(
        self, updates: dict[str, dict[int, Any]]
    ) -> "Segment":
        """Copy-on-write doc-value updates (reference: DocValueUpdatable trait,
        AddDocumentHandler.executeDocValueUpdateRequest:498). Numeric columns
        only. The result carries a NEW seg_id so persistence/replication treat
        it as a fresh immutable segment (column-level update files are a later
        format optimization)."""
        import dataclasses

        new_dv = dict(self.doc_values)
        for field, per_doc in updates.items():
            dv = new_dv.get(field)
            if dv is None or dv.kind not in (DocValueKind.LONG, DocValueKind.DOUBLE):
                raise ValueError(
                    f"field {field!r} is not a numeric doc-values field"
                )
            host = dv.host_values.copy()
            present = dv.host_present.copy()
            for local, value in per_doc.items():
                host[local] = value
                present[local] = True
            new_dv[field] = dataclasses.replace(
                dv,
                values=SegmentBuilder._numeric_device_array(host),
                present=_device_put(present),
                host_values=host,
                host_present=present,
            )
        return dataclasses.replace(
            self, doc_values=new_dv, seg_id=new_seg_id("_dv")
        )

    def with_deletes(self, deleted_local_ids: np.ndarray) -> "Segment":
        """Return a new segment with additional docs marked deleted.

        Deleting a parent also deletes its nested children (Lucene block-join
        delete semantics: blocks live and die together)."""
        deleted_local_ids = np.asarray(deleted_local_ids, dtype=np.int64)
        parents = self.parent_positions()
        if parents is not None and len(parents):
            expanded = set(int(d) for d in deleted_local_ids)
            for d in deleted_local_ids:
                idx = int(np.searchsorted(parents, int(d)))
                if idx < len(parents) and parents[idx] == d:
                    start = int(parents[idx - 1]) + 1 if idx > 0 else 0
                    expanded.update(range(start, int(d)))
            deleted_local_ids = np.asarray(sorted(expanded), dtype=np.int64)
        host_live = self.host_live.copy()
        host_live[deleted_local_ids] = False
        live = np.zeros(self.capacity, dtype=bool)
        live[: self.num_docs] = host_live
        return Segment(
            seg_id=self.seg_id,
            num_docs=self.num_docs,
            capacity=self.capacity,
            fields=self.fields,
            doc_values=self.doc_values,
            vectors=self.vectors,
            stored=self.stored,
            live=_device_put(live),
            host_live=host_live,
            del_count=int(self.num_docs - host_live.sum()),
            del_gen=self.del_gen + 1,
        )


# ---------------------------------------------------------------------------
# Builder (host side): accumulate parsed documents, flush to a Segment
# ---------------------------------------------------------------------------


class SegmentBuilder:
    """Accumulates analyzed documents in host memory; ``flush()`` packs arrays.

    The reference counterpart is Lucene's in-RAM segment building inside
    IndexWriter.addDocuments (AddDocumentHandler.java:423 drives it). Here the
    host does analysis + postings accumulation; packing produces numpy arrays
    that are transferred once and stay immutable in HBM.
    """

    def __init__(self, field_defs: dict[str, FieldDef]):
        if self.NESTED_PATH_FIELD not in field_defs:
            field_defs = {
                **field_defs,
                self.NESTED_PATH_FIELD: FieldDef(
                    name=self.NESTED_PATH_FIELD,
                    type=FieldType.ATOM,
                    store_doc_values=True,
                ),
            }
        self.field_defs = field_defs
        # non-OBJECT parents fan their source values out to each child
        # field (multi-analysis; reference: IndexableFieldDef child fields
        # parse the same MultiValuedField). Sorted so a parent's fan-out
        # lands before its children's own (prefix order = ancestor order).
        self._copy_children: list[tuple[str, list[str]]] = sorted(
            (name, [f"{name}.{c['name']}" for c in fd.raw["childFields"]])
            for name, fd in field_defs.items()
            if fd.type != FieldType.OBJECT and fd.raw.get("childFields")
        )
        self.num_docs = 0
        # field -> term -> list[(doc, freq)] built as parallel arrays
        # (pure-Python fallback; the native PostingsAccumulator below builds
        # packed arrays directly when the extension is available)
        self._postings: dict[str, dict[str, list]] = {}
        from nrtsearch_tpu.native_ext import get as _get_native

        self._native = _get_native()
        self._acc: dict[str, Any] = {}  # field -> PostingsAccumulator
        self._doc_lens: dict[str, list[int]] = {}
        self._dv: dict[str, list] = {}          # field -> list[(doc, value)]
        self._vectors: dict[str, list] = {}     # field -> list[(doc, np.ndarray)]
        self._suggest: dict[str, list] = {}     # field -> [(doc, text, weight, ctxs)]
        self._stored: list[dict] = []
        self._positions: dict[str, dict] = {}

    # internal field naming for nested documents (reference: _NESTED_PATH in
    # LuceneDocumentBuilder; Lucene block-join ordering: children BEFORE parent)
    NESTED_PATH_FIELD = "_nested_path"
    ROOT_PATH = "_root"

    def add_document(self, doc: dict[str, Any]) -> int:
        """Add one parsed document: field name -> raw value or list of values.

        OBJECT fields with nestedDoc=true expand into child documents indexed
        immediately before the parent (Lucene block ordering), each carrying
        dotted field names (``path.subfield``) and a ``_nested_path`` doc
        value; the parent gets ``_nested_path = _root``.

        Returns the parent's local doc id.
        """
        import json as _json

        nested_children: list[tuple[str, dict]] = []
        flat_doc: dict[str, Any] = {}
        for name, value in doc.items():
            fd = self.field_defs.get(name)
            if (
                fd is not None
                and fd.type == FieldType.OBJECT
                and fd.raw.get("nestedDoc")
            ):
                values = value if isinstance(value, (list, tuple)) else [value]
                for v in values:
                    child = _json.loads(v) if isinstance(v, str) else dict(v)
                    nested_children.append((name, child))
            else:
                flat_doc[name] = value
        for path, child in nested_children:
            child_doc = {f"{path}.{k}": v for k, v in child.items()}
            child_doc[self.NESTED_PATH_FIELD] = path
            self._add_flat(child_doc)
        flat_doc[self.NESTED_PATH_FIELD] = self.ROOT_PATH
        return self._add_flat(flat_doc)

    def _add_flat(self, doc: dict[str, Any]) -> int:
        # multi-analysis fan-out: children of non-OBJECT parents index the
        # parent's values under their own analyzer unless given explicitly
        for parent, children in self._copy_children:
            if parent in doc:
                for c in children:
                    doc.setdefault(c, doc[parent])
        doc_id = self.num_docs
        self.num_docs += 1
        stored_row: dict[str, Any] = {}
        for name, value in doc.items():
            fd = self.field_defs.get(name)
            if fd is None:
                raise KeyError(f"unregistered field: {name!r}")
            values = value if isinstance(value, (list, tuple)) else [value]
            if (
                len(values) > 1
                and not fd.multi_valued
                and fd.type not in (FieldType.LAT_LON, FieldType.VECTOR)
            ):
                raise ValueError(f"field {name!r} is not multiValued")
            if fd.type == FieldType.VECTOR:
                # accept a raw number list (one vector) or a single json string
                vec = fd.parse_vector(
                    values if len(values) > 1 and not isinstance(values[0], str)
                    else values[0]
                )
                self._vectors.setdefault(name, []).append((doc_id, vec))
                if fd.store:
                    stored_row[name] = vec.tolist()
                continue
            if fd.type == FieldType.CONTEXT_SUGGEST:
                import json as _sjson

                for v in values:
                    if isinstance(v, str) and v.lstrip().startswith("{"):
                        d = _sjson.loads(v)
                        entry = (doc_id, str(d.get("value", "")),
                                 float(d.get("weight", 1.0)),
                                 list(d.get("contexts", [])))
                    else:
                        entry = (doc_id, str(v), 1.0, [])
                    self._suggest.setdefault(name, []).append(entry)
                if fd.store:
                    stored_row[name] = list(values)
                continue
            if fd.type == FieldType.LAT_LON:
                lat, lon = float(values[0]), float(values[1])
                self._dv.setdefault(name, []).append((doc_id, (lat, lon)))
                if fd.store:
                    stored_row[name] = [lat, lon]
                continue
            if fd.type == FieldType.POLYGON:
                # one GeoJSON polygon per doc (reference:
                # PolygonfieldDef.parseDocumentField rejects >1 value)
                if len(values) > 1:
                    raise ValueError("polygon length cannot be more than 1.")
                import json as _pjson

                from nrtsearch_tpu.schema.fields import parse_geojson_polygon

                canonical, _rings = parse_geojson_polygon(values[0])
                self._dv.setdefault(name, []).append((doc_id, canonical))
                if fd.store:
                    stored_row[name] = _pjson.loads(canonical)
                continue
            parsed = [fd.parse_doc_value(v) for v in values]
            if fd.search and fd.is_text:
                self._index_text(fd, doc_id, [str(v) for v in parsed])
            if fd.store_doc_values:
                for p in parsed:
                    self._dv.setdefault(name, []).append((doc_id, p))
            if fd.store:
                stored_row[name] = parsed if fd.multi_valued else parsed[0]
        self._stored.append(stored_row)
        return doc_id

    # position gap between values of a multi-valued field (reference:
    # PosIncGapAnalyzerWrapper; Lucene default gap semantics)
    POSITION_GAP = 100

    def _index_text(self, fd: FieldDef, doc_id: int, values: list[str]) -> None:
        name = fd.name
        lens = self._doc_lens.setdefault(name, [])
        while len(lens) < doc_id:
            lens.append(0)
        native_tok = (fd.type == FieldType.TEXT and fd.index_analyzer is None
                      and fd.index_prefixes is None)
        if fd.index_prefixes is not None:
            # materialized prefixes (reference: PrefixFieldDef.java:33):
            # every token ALSO indexes its [min, max]-char prefixes into the
            # hidden companion field at the SAME positions, so in-range
            # prefix queries are single-term lookups (and keep phrase
            # position semantics)
            lo, hi = fd.index_prefixes
            companion = f"{name}._index_prefix"
            pmap: dict[str, list[int]] = {}
            base = 0
            for v in values:
                max_pos = 0
                for tok in fd.index_tokens(v):
                    for plen in range(lo, min(hi, len(tok.text)) + 1):
                        pmap.setdefault(tok.text[:plen], []).append(
                            base + tok.position
                        )
                    max_pos = max(max_pos, tok.position + 1)
                base += max_pos + self.POSITION_GAP
            if pmap:
                if self._native is not None:
                    acc = self._acc.get(companion)
                    if acc is None:
                        acc = self._acc[companion] = \
                            self._native.PostingsAccumulator()
                    acc.add_terms(doc_id, pmap)
                else:
                    post = self._postings.setdefault(companion, {})
                    for term, plist in pmap.items():
                        post.setdefault(term, []).append(
                            (doc_id, len(plist), plist)
                        )
                clens = self._doc_lens.setdefault(companion, [])
                while len(clens) < doc_id:
                    clens.append(0)
                clens.append(sum(len(p) for p in pmap.values()))
        if self._native is not None:
            # native batch accumulation: postings build term-major packed
            # arrays in C++ (no per-token PyObjects, no dict-of-lists) —
            # custom analyzers and non-ASCII text still analyze in Python
            # but feed the same accumulator via add_terms
            acc = self._acc.get(name)
            if acc is None:
                acc = self._acc[name] = self._native.PostingsAccumulator()
            total = 0
            base = 0
            for v in values:
                cnt = acc.add_text(doc_id, v, base) if native_tok else -1
                if cnt >= 0:
                    total += cnt
                    base += cnt + self.POSITION_GAP
                    continue
                positions: dict[str, list[int]] = {}
                max_pos = 0
                for tok in fd.index_tokens(v):
                    positions.setdefault(tok.text, []).append(base + tok.position)
                    max_pos = max(max_pos, tok.position + 1)
                    total += 1
                acc.add_terms(doc_id, positions)
                base += max_pos + self.POSITION_GAP
            lens.append(total)
            return
        post = self._postings.setdefault(name, {})
        positions_all: dict[str, list[int]] = {}
        total = 0
        base = 0
        for v in values:
            max_pos = 0
            for tok in fd.index_tokens(v):
                positions_all.setdefault(tok.text, []).append(base + tok.position)
                max_pos = max(max_pos, tok.position + 1)
                total += 1
            base += max_pos + self.POSITION_GAP
        for term, plist in positions_all.items():
            post.setdefault(term, []).append((doc_id, len(plist), plist))
        lens.append(total)

    def flush(self, seg_id: Optional[str] = None) -> Optional[Segment]:
        if self.num_docs == 0:
            return None
        seg_id = seg_id or new_seg_id()
        capacity = pad_to_bucket(self.num_docs)
        fields = {
            name: self._pack_text_field(name, post, capacity)
            for name, post in self._postings.items()
        }
        for name, acc in self._acc.items():
            fields[name] = self._pack_text_field_native(name, acc, capacity)
        doc_values = {
            name: self._pack_doc_values(self.field_defs[name], vals, capacity)
            for name, vals in self._dv.items()
        }
        vectors = {
            name: self._pack_vectors(self.field_defs[name], vals, capacity)
            for name, vals in self._vectors.items()
        }
        host_live = np.ones(self.num_docs, dtype=bool)
        live = np.zeros(capacity, dtype=bool)
        live[: self.num_docs] = True
        return Segment(
            suggest={k: list(v) for k, v in self._suggest.items()},
            seg_id=seg_id,
            num_docs=self.num_docs,
            capacity=capacity,
            fields=fields,
            doc_values=doc_values,
            vectors=vectors,
            stored=self._stored,
            live=_device_put(live),
            host_live=host_live,
        )

    # -- packing --------------------------------------------------------------

    def _pack_text_field(
        self, field_name: str, post: dict[str, list], capacity: int
    ) -> TextFieldIndex:
        terms = {}
        offsets = np.zeros(len(post), dtype=np.int64)
        lengths = np.zeros(len(post), dtype=np.int32)
        total = sum(len(p) for p in post.values())
        # 8k slack so Pallas DMA gathers never clamp (GATHER_TILE contract)
        p_pad = pad_to_bucket(total + 16384)
        doc_ids = np.zeros(p_pad, dtype=np.int32)
        freqs = np.zeros(p_pad, dtype=np.float32)
        pos_offsets = np.zeros(total + 1, dtype=np.int64)
        pos_lists: list = []
        cursor = 0
        # stable term order (insertion) — postings within a term are already
        # in ascending doc id order because docs are added in order
        for tid, (term, plist) in enumerate(post.items()):
            terms[term] = tid
            offsets[tid] = cursor
            lengths[tid] = len(plist)
            for i, (doc, freq, positions) in enumerate(plist):
                doc_ids[cursor + i] = doc
                freqs[cursor + i] = freq
                pos_lists.append(positions)
                pos_offsets[cursor + i + 1] = pos_offsets[cursor + i] + len(positions)
            cursor += len(plist)
        flat_positions = (
            np.concatenate([np.asarray(p, np.int32) for p in pos_lists])
            if pos_lists
            else np.empty(0, np.int32)
        ).astype(np.int32)
        lens_list = self._doc_lens.get(field_name, [])
        lens = np.zeros(capacity, dtype=np.int64)
        lens[: len(lens_list)] = lens_list
        qlens = quantize_length(lens).astype(np.float32)
        doc_count = int(np.count_nonzero(lens[: self.num_docs]))
        return TextFieldIndex(
            terms=terms,
            offsets=offsets,
            lengths=lengths,
            doc_ids=_device_put(doc_ids),
            freqs=_device_put(freqs),
            doc_lens=_device_put(qlens),
            sum_doc_lens=int(quantize_length(lens[: self.num_docs]).sum()),
            doc_count=doc_count,
            postings_len=total,
            host_doc_ids=doc_ids[:total].copy(),
            host_freqs=freqs[:total].copy(),
            positions=flat_positions,
            position_offsets=pos_offsets,
        )

    def _pack_text_field_native(
        self, field_name: str, acc, capacity: int
    ) -> TextFieldIndex:
        """Wrap the native accumulator's packed arrays (same layout as
        _pack_text_field; pos_offsets is just cumsum(freqs) because every
        token occurrence contributes exactly one position)."""
        names, offs_b, lens_b, docs_b, freqs_b, pos_b = acc.finish()
        offsets = np.frombuffer(offs_b, np.int64)
        lengths = np.frombuffer(lens_b, np.int32)
        host_docs = np.frombuffer(docs_b, np.int32).copy()
        host_freqs_i = np.frombuffer(freqs_b, np.int32)
        flat_positions = np.frombuffer(pos_b, np.int32).copy()
        total = len(host_docs)
        # 8k slack so Pallas DMA gathers never clamp (GATHER_TILE contract)
        p_pad = pad_to_bucket(total + 16384)
        doc_ids = np.zeros(p_pad, dtype=np.int32)
        doc_ids[:total] = host_docs
        freqs = np.zeros(p_pad, dtype=np.float32)
        freqs[:total] = host_freqs_i
        pos_offsets = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(host_freqs_i, out=pos_offsets[1:])
        lens_list = self._doc_lens.get(field_name, [])
        lens = np.zeros(capacity, dtype=np.int64)
        lens[: len(lens_list)] = lens_list
        qlens = quantize_length(lens).astype(np.float32)
        doc_count = int(np.count_nonzero(lens[: self.num_docs]))
        return TextFieldIndex(
            terms={t: i for i, t in enumerate(names)},
            offsets=offsets,
            lengths=lengths,
            doc_ids=_device_put(doc_ids),
            freqs=_device_put(freqs),
            doc_lens=_device_put(qlens),
            sum_doc_lens=int(quantize_length(lens[: self.num_docs]).sum()),
            doc_count=doc_count,
            postings_len=total,
            host_doc_ids=host_docs,
            host_freqs=freqs[:total].copy(),
            positions=flat_positions,
            position_offsets=pos_offsets,
        )

    def _pack_doc_values(self, fd: FieldDef, vals: list, capacity: int) -> DocValueColumn:
        kind = fd.doc_value_kind
        present = np.zeros(capacity, dtype=bool)
        if kind == DocValueKind.LAT_LON:
            arr = np.zeros((capacity, 2), dtype=np.float64)
            for doc, (lat, lon) in vals:
                arr[doc] = (lat, lon)
                present[doc] = True
            return DocValueColumn(
                kind=kind,
                values=_device_put(arr.astype(np.float32)),
                present=_device_put(present),
                host_values=arr,
                host_present=present.copy(),
            )
        if kind == DocValueKind.POLYGON:
            return self._pack_polygons(vals, capacity, present)
        if kind == DocValueKind.ORDINAL:
            ord_index: dict[str, int] = {}
            # assign ordinals in sorted term order (Lucene SortedDocValues
            # semantics: ordinals are sort-consistent) — needs two passes
            uniq = sorted({str(v) for _, v in vals})
            ord_index = {t: i for i, t in enumerate(uniq)}
            if fd.multi_valued:
                per_doc: dict[int, list[int]] = {}
                for doc, v in vals:
                    per_doc.setdefault(doc, []).append(ord_index[str(v)])
                mv_offsets = np.zeros(self.num_docs + 1, dtype=np.int32)
                mv_vals = []
                for d in range(self.num_docs):
                    ords = sorted(per_doc.get(d, []))
                    mv_vals.extend(ords)
                    mv_offsets[d + 1] = len(mv_vals)
                    present[d] = bool(ords)
                first = np.full(capacity, -1, dtype=np.int32)
                for d in range(self.num_docs):
                    if mv_offsets[d + 1] > mv_offsets[d]:
                        first[d] = mv_vals[mv_offsets[d]]
                host_vals = first.copy()
                return DocValueColumn(
                    kind=kind,
                    values=_device_put(first),
                    present=_device_put(present),
                    host_values=host_vals,
                    host_present=present.copy(),
                    ord_terms=uniq,
                    ord_index=ord_index,
                    mv_offsets=mv_offsets,
                    mv_values=np.asarray(mv_vals, dtype=np.int32),
                )
            arr = np.full(capacity, -1, dtype=np.int32)
            for doc, v in vals:
                arr[doc] = ord_index[str(v)]
                present[doc] = True
            return DocValueColumn(
                kind=kind,
                values=_device_put(arr),
                present=_device_put(present),
                host_values=arr.copy(),
                host_present=present.copy(),
                ord_terms=uniq,
                ord_index=ord_index,
            )
        # numeric kinds
        if kind == DocValueKind.LONG:
            host = np.zeros(capacity, dtype=np.int64)
        else:
            host = np.zeros(capacity, dtype=np.float64)
        if fd.multi_valued:
            per_doc: dict[int, list] = {}
            for doc, v in vals:
                per_doc.setdefault(doc, []).append(v)
            mv_offsets = np.zeros(self.num_docs + 1, dtype=np.int32)
            mv_vals: list = []
            for d in range(self.num_docs):
                vs = sorted(per_doc.get(d, []))
                mv_vals.extend(vs)
                mv_offsets[d + 1] = len(mv_vals)
                if vs:
                    host[d] = vs[0]
                    present[d] = True
            dev = self._numeric_device_array(host)
            return DocValueColumn(
                kind=kind,
                values=dev,
                present=_device_put(present),
                host_values=host,
                host_present=present.copy(),
                mv_offsets=mv_offsets,
                mv_values=np.asarray(mv_vals, dtype=host.dtype),
            )
        for doc, v in vals:
            host[doc] = v
            present[doc] = True
        return DocValueColumn(
            kind=kind,
            values=self._numeric_device_array(host),
            present=_device_put(present),
            host_values=host,
            host_present=present.copy(),
        )

    @staticmethod
    def _numeric_device_array(host: np.ndarray):
        """Device representation of a numeric column.

        int64/float64 columns whose values fit float32 exactly go down as
        float32 (fast path); otherwise they are shipped as float64 under an
        x64 scope (TPU executes f64 slowly but doc-value filter/sort ops are
        tiny and memory-bound; the Pallas path will read i64 as 2×i32).
        """
        import jax

        if host.dtype == np.int64:
            f32 = host.astype(np.float32)
            if np.array_equal(f32.astype(np.int64), host):
                return jax.device_put(f32)
        elif host.dtype == np.float64:
            f32 = host.astype(np.float32)
            if np.array_equal(f32.astype(np.float64), host):
                return jax.device_put(f32)
        import jax

        with jax.enable_x64():
            return jax.device_put(host.astype(np.float64))

    def _pack_polygons(
        self, vals: list, capacity: int, present: np.ndarray
    ) -> DocValueColumn:
        """POLYGON column: [capacity, V_pad, 2] float32 of ring-closed,
        NaN-separated vertices (outer ring, then holes). The NaN separators
        make ray-cast edge tests between rings and in the padding contribute
        nothing, so point-containment is one vectorized parity count over the
        whole column (ops/masks.doc_polygons_contain_point). Raw GeoJSON
        strings ride doc-indexed in ord_terms for fetch.

        Reference counterpart: field/PolygonfieldDef.java indexes
        LatLonShape triangles; the TPU re-expression keeps the raw rings —
        containment is data-parallel over docs, no BKD tree needed."""
        from nrtsearch_tpu.schema.fields import parse_geojson_polygon

        per_doc: dict[int, tuple[str, list]] = {}
        for doc, geojson in vals:
            per_doc[doc] = (geojson, parse_geojson_polygon(geojson)[1])

        def _flat(rings):
            pts: list[tuple[float, float]] = []
            for ring in rings:
                pts.extend(ring)
                if ring[0] != ring[-1]:
                    pts.append(ring[0])  # close the ring
                pts.append((np.nan, np.nan))  # separator: no cross-ring edge
            return pts

        flats = {d: _flat(rings) for d, (_, rings) in per_doc.items()}
        v_max = max((len(p) for p in flats.values()), default=1)
        v_pad = pad_to_bucket(v_max, minimum=8)
        arr = np.full((capacity, v_pad, 2), np.nan, dtype=np.float32)
        geojsons = [""] * self.num_docs
        for d, pts in flats.items():
            arr[d, : len(pts)] = np.asarray(pts, dtype=np.float32)
            present[d] = True
            geojsons[d] = per_doc[d][0]
        return DocValueColumn(
            kind=DocValueKind.POLYGON,
            values=_device_put(arr),
            present=_device_put(present),
            host_values=arr,
            host_present=present.copy(),
            ord_terms=geojsons,
        )

    def _pack_vectors(self, fd: FieldDef, vals: list, capacity: int) -> VectorColumn:
        mat = np.zeros((capacity, fd.dims), dtype=np.float32)
        present = np.zeros(capacity, dtype=bool)
        for doc, vec in vals:
            mat[doc] = vec
            present[doc] = True
        norms = np.linalg.norm(mat, axis=1)
        fmt = getattr(fd, "vector_format", "float32")
        if fmt == "int8":
            from nrtsearch_tpu.ops.knn import quantize_int8

            q, scale = quantize_int8(mat)
            dev = _device_put(q)
        elif fmt == "float16":
            import jax.numpy as jnp

            dev = _device_put(mat.astype(np.float32)).astype(jnp.bfloat16)
            scale = 1.0
        else:
            dev = _device_put(mat)
            scale = 1.0
        return VectorColumn(
            values=dev,
            present=_device_put(present),
            host_norms=norms.astype(np.float32),
            fmt=fmt,
            scale=scale,
        )
