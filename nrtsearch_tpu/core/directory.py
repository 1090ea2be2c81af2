"""Segment persistence: the on-disk index format.

Replaces Lucene's codec/directory layer (the reference selects
MMapDirectory/NIOFS via DirectoryFactory, server/index/DirectoryFactory.java).
A committed index directory contains:

- ``segments_<gen>.json``: the commit manifest (segment ids + doc counts +
  field schema hash + version), the ``segments_N`` analogue;
- ``<seg_id>.arrays.npz``: all packed numeric arrays of one segment
  (postings, doc values, vectors, live mask);
- ``<seg_id>.meta.msgpack``: host dictionaries (term tables, ordinal
  dictionaries, stored rows).

Files are immutable once written (same contract as Lucene segment files), so
NRT replication ships them byte-identical and a replica can mmap-load and
device_put without any rebuild.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
from pathlib import Path
from typing import Optional

import msgpack
import numpy as np

from nrtsearch_tpu.core.segment import (
    DocValueColumn,
    Segment,
    TextFieldIndex,
    VectorColumn,
    _device_put,
)
from nrtsearch_tpu.schema.fields import DocValueKind


def segment_file_names(seg_id: str, del_gen: int = 0) -> list[str]:
    """Immutable base files + the per-delete-generation live mask file.

    Lucene analogue: segment core files plus the _N.liv del-gen file — deletes
    never rewrite segment data, they publish a new small live-mask file.
    """
    return [
        f"{seg_id}.arrays.npz",
        f"{seg_id}.meta.msgpack",
        f"{seg_id}.live.{del_gen}.npy",
    ]


# (path, size, mtime_ns) -> (length, crc32). Segment files are immutable, so
# metadata computed once per file stays valid; the stat key invalidates the
# entry if a file is ever replaced in place.
_FILE_META_CACHE: dict[tuple, tuple[int, int]] = {}


def file_metadata(directory: str | Path, name: str) -> tuple[int, int]:
    """(length, crc32) of one index file — the FileMetaData analogue the
    reference carries in CopyState (luceneserver.proto:1211) so receivers can
    detect name-reuse/truncation instead of trusting file names."""
    import zlib

    path = Path(directory) / name
    st = path.stat()
    key = (str(path), st.st_size, st.st_mtime_ns)
    hit = _FILE_META_CACHE.get(key)
    if hit is not None:
        return hit
    crc = 0
    with open(path, "rb") as f:
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                break
            crc = zlib.crc32(chunk, crc)
    meta = (st.st_size, crc)
    _FILE_META_CACHE[key] = meta
    return meta


def save_segment(seg: Segment, directory: str | Path) -> list[str]:
    """Write one segment's files; returns the file names written.

    Base files (.arrays.npz / .meta.msgpack) are immutable — skipped when
    already present. The live mask goes to a per-del-gen file.
    """
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    live_name = f"{seg.seg_id}.live.{seg.del_gen}.npy"
    live_path = directory / live_name
    if not live_path.exists():
        with open(live_path, "wb") as f:
            np.save(f, np.asarray(seg.live))
    npz_path = directory / f"{seg.seg_id}.arrays.npz"
    if npz_path.exists():
        return segment_file_names(seg.seg_id, seg.del_gen)
    arrays: dict[str, np.ndarray] = {}
    meta: dict = {
        "seg_id": seg.seg_id,
        "num_docs": seg.num_docs,
        "capacity": seg.capacity,
        "stored": seg.stored,
        "suggest": {k: [[d, t, w, c] for d, t, w, c in v]
                     for k, v in seg.suggest.items()},
        "fields": {},
        "doc_values": {},
        "vectors": {},
    }
    for name, tfi in seg.fields.items():
        key = f"f.{name}"
        arrays[f"{key}.doc_ids"] = np.asarray(tfi.doc_ids)
        arrays[f"{key}.freqs"] = np.asarray(tfi.freqs)
        arrays[f"{key}.doc_lens"] = np.asarray(tfi.doc_lens)
        arrays[f"{key}.offsets"] = tfi.offsets
        arrays[f"{key}.lengths"] = tfi.lengths
        if tfi.positions is not None:
            arrays[f"{key}.positions"] = tfi.positions
            arrays[f"{key}.position_offsets"] = tfi.position_offsets
        inv = [None] * len(tfi.terms)
        for t, tid in tfi.terms.items():
            inv[tid] = t
        meta["fields"][name] = {
            "terms": inv,
            "sum_doc_lens": tfi.sum_doc_lens,
            "doc_count": tfi.doc_count,
            "postings_len": tfi.postings_len,
            "has_positions": tfi.positions is not None,
        }
    for name, dv in seg.doc_values.items():
        key = f"dv.{name}"
        arrays[f"{key}.values"] = dv.host_values
        arrays[f"{key}.present"] = dv.host_present
        if dv.mv_offsets is not None:
            arrays[f"{key}.mv_offsets"] = dv.mv_offsets
            arrays[f"{key}.mv_values"] = dv.mv_values
        meta["doc_values"][name] = {
            "kind": dv.kind.value,
            "ord_terms": dv.ord_terms,
            "multi": dv.mv_offsets is not None,
        }
    for name, vc in seg.vectors.items():
        key = f"v.{name}"
        vals = np.asarray(vc.values)
        if vals.dtype not in (np.float32, np.int8):
            vals = vals.astype(np.float32)  # bfloat16 serializes as f32
        arrays[f"{key}.values"] = vals
        arrays[f"{key}.present"] = np.asarray(vc.present)
        arrays[f"{key}.norms"] = vc.host_norms
        meta["vectors"][name] = {"fmt": vc.fmt, "scale": vc.scale}

    with open(npz_path, "wb") as f:
        np.savez(f, **arrays)
    with open(directory / f"{seg.seg_id}.meta.msgpack", "wb") as f:
        f.write(msgpack.packb(meta, use_bin_type=True))
    return segment_file_names(seg.seg_id, seg.del_gen)


def load_segment(seg_id: str, directory: str | Path, del_gen: int = 0) -> Segment:
    directory = Path(directory)
    with open(directory / f"{seg_id}.meta.msgpack", "rb") as f:
        meta = msgpack.unpackb(f.read(), raw=False, strict_map_key=False)
    arrays = np.load(directory / f"{seg_id}.arrays.npz", allow_pickle=False)

    fields = {}
    for name, fm in meta["fields"].items():
        key = f"f.{name}"
        terms = {t: i for i, t in enumerate(fm["terms"])}
        pl = fm["postings_len"]
        host_doc_ids = arrays[f"{key}.doc_ids"][:pl].copy()
        host_freqs = arrays[f"{key}.freqs"][:pl].copy()
        fields[name] = TextFieldIndex(
            terms=terms,
            offsets=arrays[f"{key}.offsets"],
            lengths=arrays[f"{key}.lengths"],
            doc_ids=_device_put(arrays[f"{key}.doc_ids"]),
            freqs=_device_put(arrays[f"{key}.freqs"]),
            doc_lens=_device_put(arrays[f"{key}.doc_lens"]),
            sum_doc_lens=fm["sum_doc_lens"],
            doc_count=fm["doc_count"],
            postings_len=pl,
            host_doc_ids=host_doc_ids,
            host_freqs=host_freqs,
            positions=arrays[f"{key}.positions"]
            if fm.get("has_positions")
            else None,
            position_offsets=arrays[f"{key}.position_offsets"]
            if fm.get("has_positions")
            else None,
        )
    doc_values = {}
    for name, dm in meta["doc_values"].items():
        key = f"dv.{name}"
        host_values = arrays[f"{key}.values"]
        host_present = arrays[f"{key}.present"]
        from nrtsearch_tpu.core.segment import SegmentBuilder

        kind = DocValueKind(dm["kind"])
        if kind in (DocValueKind.LONG, DocValueKind.DOUBLE):
            dev = SegmentBuilder._numeric_device_array(host_values)
        elif kind == DocValueKind.LAT_LON:
            dev = _device_put(host_values.astype(np.float32))
        else:
            dev = _device_put(host_values)
        ord_terms = dm.get("ord_terms")
        doc_values[name] = DocValueColumn(
            kind=kind,
            values=dev,
            present=_device_put(host_present),
            host_values=host_values,
            host_present=host_present,
            ord_terms=ord_terms,
            ord_index={t: i for i, t in enumerate(ord_terms)} if ord_terms else None,
            mv_offsets=arrays[f"{key}.mv_offsets"] if dm["multi"] else None,
            mv_values=arrays[f"{key}.mv_values"] if dm["multi"] else None,
        )
    vectors = {}
    for name, vm in meta["vectors"].items():
        key = f"v.{name}"
        fmt = (vm or {}).get("fmt", "float32")
        vals = _device_put(arrays[f"{key}.values"])
        if fmt == "float16":
            import jax.numpy as jnp

            vals = vals.astype(jnp.bfloat16)
        vectors[name] = VectorColumn(
            values=vals,
            present=_device_put(arrays[f"{key}.present"]),
            host_norms=arrays[f"{key}.norms"],
            fmt=fmt,
            scale=float((vm or {}).get("scale", 1.0)),
        )
    live_full = np.load(directory / f"{seg_id}.live.{del_gen}.npy")
    host_live = live_full[: meta["num_docs"]].copy()
    return Segment(
        seg_id=meta["seg_id"],
        num_docs=meta["num_docs"],
        capacity=meta["capacity"],
        fields=fields,
        doc_values=doc_values,
        vectors=vectors,
        stored=meta["stored"],
        suggest={k: [(d, t, w, c) for d, t, w, c in v]
                 for k, v in meta.get("suggest", {}).items()},
        live=_device_put(live_full),
        host_live=host_live,
        del_count=int(meta["num_docs"] - host_live.sum()),
        del_gen=del_gen,
    )


class CommitManifest:
    """segments_<gen> equivalent: the durable commit point.

    ``segments`` is a list of [seg_id, del_gen] pairs, like Lucene's
    SegmentInfos tracking per-segment del gens.
    """

    def __init__(
        self, gen: int, version: int, segments: list[tuple[str, int]],
        primary_gen: int = 0,
    ):
        self.gen = gen
        self.version = version
        self.segments = [(s, int(d)) for s, d in segments]
        self.primary_gen = primary_gen

    @property
    def seg_ids(self) -> list[str]:
        return [s for s, _ in self.segments]

    def to_json(self) -> str:
        return json.dumps(
            {
                "gen": self.gen,
                "version": self.version,
                "segments": [[s, d] for s, d in self.segments],
                "primaryGen": self.primary_gen,
            }
        )

    @classmethod
    def from_json(cls, s: str | bytes) -> "CommitManifest":
        d = json.loads(s)
        return cls(d["gen"], d["version"], d["segments"], d.get("primaryGen", 0))

    def file_name(self) -> str:
        return f"segments_{self.gen}.json"


def commit_segments(
    segments: list[Segment], directory: str | Path, gen: int, version: int,
    primary_gen: int = 0,
) -> CommitManifest:
    """Write all segment files (skipping ones already on disk) + manifest."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    for seg in segments:
        save_segment(seg, directory)  # no-op for already-persisted files
    manifest = CommitManifest(
        gen, version, [(s.seg_id, s.del_gen) for s in segments], primary_gen
    )
    tmp = directory / (manifest.file_name() + ".tmp")
    tmp.write_text(manifest.to_json())
    os.replace(tmp, directory / manifest.file_name())
    return manifest


def latest_commit(directory: str | Path) -> Optional[CommitManifest]:
    directory = Path(directory)
    if not directory.exists():
        return None
    best = None
    for p in directory.glob("segments_*.json"):
        try:
            gen = int(p.stem.split("_")[1])
        except (IndexError, ValueError):
            continue
        if best is None or gen > best[0]:
            best = (gen, p)
    if best is None:
        return None
    return CommitManifest.from_json(best[1].read_text())


def open_commit(directory: str | Path) -> tuple[Optional[CommitManifest], list[Segment]]:
    manifest = latest_commit(directory)
    if manifest is None:
        return None, []
    return manifest, [
        load_segment(sid, directory, del_gen) for sid, del_gen in manifest.segments
    ]
