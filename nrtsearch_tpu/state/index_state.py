"""Per-index durable state: settings, live settings, field schema.

Reference: server/index/ImmutableIndexState.java (immutable snapshot,
copy-on-write updates versioned by gen) + IndexStateInfo proto. Stored as
JSON through a StateBackend.
"""

from __future__ import annotations

import copy
import json
from dataclasses import dataclass, field
from typing import Any, Optional

from nrtsearch_tpu.schema.fields import FieldDef, create_field_def

# defaults mirror the reference's live-settings defaults
# (ImmutableIndexState.java:118-120 and luceneserver.proto:1441-1483)
DEFAULT_LIVE_SETTINGS: dict[str, Any] = {
    "maxRefreshSec": 1.0,
    "minRefreshSec": 0.05,
    "addDocumentsMaxBufferLen": 100,
    "sliceMaxDocs": 250_000,
    "sliceMaxSegments": 5,
    "virtualShards": 1,
    "defaultSearchTimeoutSec": 0,
    "defaultTerminateAfter": 0,
    "segmentsPerTier": 10,
    "maxMergedSegmentMB": 0,
    "maxSearcherAgeSec": 60.0,
    "indexRamBufferSizeMB": 16,
}

DEFAULT_SETTINGS: dict[str, Any] = {
    "directory": "TPUArrayDirectory",
    "concurrentMergeSchedulerMaxThreadCount": 1,
    "concurrentMergeSchedulerMaxMergeCount": 2,
    "mergeFactor": 10,
}


@dataclass(frozen=True)
class IndexStateInfo:
    """Immutable snapshot of one index's durable state."""

    index_name: str
    index_id: str
    gen: int = 1
    committed: bool = False
    started_mode: Optional[str] = None  # persisted start mode for warm boot
    settings: dict = field(default_factory=lambda: dict(DEFAULT_SETTINGS))
    live_settings: dict = field(default_factory=lambda: dict(DEFAULT_LIVE_SETTINGS))
    fields: dict = field(default_factory=dict)  # name -> raw Field spec dict

    def with_fields(self, new_fields: dict[str, dict]) -> "IndexStateInfo":
        merged = dict(self.fields)
        for name, spec in new_fields.items():
            if name in merged:
                raise ValueError(f"field {name!r} already registered")
            merged[name] = spec
        return self._bump(fields=merged)

    def with_live_settings(self, updates: dict) -> "IndexStateInfo":
        ls = dict(self.live_settings)
        ls.update({k: v for k, v in updates.items() if v is not None})
        return self._bump(live_settings=ls)

    def with_settings(self, updates: dict) -> "IndexStateInfo":
        s = dict(self.settings)
        s.update({k: v for k, v in updates.items() if v is not None})
        return self._bump(settings=s)

    def with_mode(self, mode: Optional[str]) -> "IndexStateInfo":
        return self._bump(started_mode=mode)

    def _bump(self, **kw) -> "IndexStateInfo":
        data = {
            "index_name": self.index_name,
            "index_id": self.index_id,
            "gen": self.gen + 1,
            "committed": self.committed,
            "started_mode": self.started_mode,
            "settings": copy.deepcopy(self.settings),
            "live_settings": copy.deepcopy(self.live_settings),
            "fields": copy.deepcopy(self.fields),
        }
        data.update(kw)
        return IndexStateInfo(**data)

    def field_defs(self) -> dict[str, FieldDef]:
        """Flatten the schema to dotted field defs, recursing childFields.

        Child fields register for EVERY parent type (reference:
        FieldDefCreator builds children of any IndexableFieldDef;
        MatchAndTermQueryBehaviorWithTokenizationTest registers a TEXT
        parent with a keyword-tokenized TEXT child). OBJECT children get
        their values from the object's keys (core/segment.py nested-doc
        expansion); non-OBJECT children are indexed from the SAME source
        values as their parent under the child's own analyzer/flags
        (the multi-analysis pattern — SegmentBuilder fans the values out)."""
        defs: dict[str, FieldDef] = {}

        def register(name: str, spec: dict) -> None:
            defs[name] = create_field_def(name, spec)
            for child in spec.get("childFields") or []:
                register(f"{name}.{child['name']}", child)

        for name, spec in self.fields.items():
            register(name, spec)
        return defs

    # -- serialization ---------------------------------------------------------

    def to_json(self) -> str:
        return json.dumps(
            {
                "indexName": self.index_name,
                "indexId": self.index_id,
                "gen": self.gen,
                "committed": self.committed,
                "startedMode": self.started_mode,
                "settings": self.settings,
                "liveSettings": self.live_settings,
                "fields": self.fields,
            },
            indent=1,
        )

    @classmethod
    def from_json(cls, s: str | bytes) -> "IndexStateInfo":
        d = json.loads(s)
        return cls(
            index_name=d["indexName"],
            index_id=d["indexId"],
            gen=d.get("gen", 1),
            committed=d.get("committed", False),
            started_mode=d.get("startedMode"),
            settings=d.get("settings", dict(DEFAULT_SETTINGS)),
            live_settings=d.get("liveSettings", dict(DEFAULT_LIVE_SETTINGS)),
            fields=d.get("fields", {}),
        )
