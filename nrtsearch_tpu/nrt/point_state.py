"""NRT point state: the durable manifest of one searchable point.

Reference: server/nrt/state/NrtPointState.java:33-41 (files metadata,
version/gen, serialized SegmentInfos, primaryGen, primaryId). Here the
SegmentInfos analogue is the (seg_id, del_gen) list; files are the
packed-array files from core/directory.py (immutable base files plus the
small per-del-gen live mask, like Lucene's .liv files).

``file_meta`` carries per-file (length, crc32) like the reference's
NrtFileMetaData, so a receiver can detect stale bytes under a reused name or
a truncated copy instead of trusting file names alone.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Optional

from nrtsearch_tpu.core.directory import segment_file_names


@dataclass
class NrtPointState:
    version: int                 # searcher version at this point
    gen: int                     # commit gen
    primary_gen: int             # primary incarnation counter
    primary_id: str              # ephemeral primary instance id
    segments: list[tuple[str, int]]  # (seg_id, del_gen)
    files: list[str] = field(default_factory=list)
    # file name -> (length, crc32); empty for points written before this
    # field existed (verification is skipped for those files)
    file_meta: dict[str, tuple[int, int]] = field(default_factory=dict)

    def __post_init__(self):
        self.segments = [(s, int(d)) for s, d in self.segments]
        if not self.files:
            self.files = [
                f for sid, dgen in self.segments for f in segment_file_names(sid, dgen)
            ]
        self.file_meta = {
            n: (int(length), int(crc)) for n, (length, crc) in self.file_meta.items()
        }

    @property
    def seg_ids(self) -> list[str]:
        return [s for s, _ in self.segments]

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "gen": self.gen,
                "primaryGen": self.primary_gen,
                "primaryId": self.primary_id,
                "segments": [[s, d] for s, d in self.segments],
                "files": self.files,
                "fileMeta": {n: [l, c] for n, (l, c) in self.file_meta.items()},
            }
        )

    @classmethod
    def from_json(cls, s: str | bytes) -> "NrtPointState":
        d = json.loads(s)
        return cls(
            version=d["version"],
            gen=d["gen"],
            primary_gen=d.get("primaryGen", 0),
            primary_id=d.get("primaryId", ""),
            segments=[(s, dg) for s, dg in d["segments"]],
            files=d.get("files", []),
            file_meta={n: (l, c) for n, (l, c) in d.get("fileMeta", {}).items()},
        )

    @staticmethod
    def resource(index_id: str) -> str:
        return f"{index_id}/point_state"
