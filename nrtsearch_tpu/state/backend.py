"""Durable state backends.

Reference: server/state/backend/StateBackend.java with LocalStateBackend and
RemoteStateBackend. State is small JSON (global registry + per-index state);
the object-store backend routes through remote.RemoteBackend so the same
_current-pointer versioning applies (S3Backend.java:94).
"""

from __future__ import annotations

import abc
from pathlib import Path
from typing import Optional


class StateBackend(abc.ABC):
    @abc.abstractmethod
    def load_global_state(self) -> Optional[str]: ...

    @abc.abstractmethod
    def store_global_state(self, data: str) -> None: ...

    @abc.abstractmethod
    def load_index_state(self, index_id: str) -> Optional[str]: ...

    @abc.abstractmethod
    def store_index_state(self, index_id: str, data: str) -> None: ...


class LocalStateBackend(StateBackend):
    """Filesystem state (reference: LocalStateBackend)."""

    def __init__(self, state_dir: str | Path):
        self.state_dir = Path(state_dir)
        self.state_dir.mkdir(parents=True, exist_ok=True)

    def load_global_state(self) -> Optional[str]:
        p = self.state_dir / "global_state.json"
        return p.read_text() if p.exists() else None

    def store_global_state(self, data: str) -> None:
        tmp = self.state_dir / "global_state.json.tmp"
        tmp.write_text(data)
        tmp.replace(self.state_dir / "global_state.json")

    def load_index_state(self, index_id: str) -> Optional[str]:
        p = self.state_dir / f"index_{index_id}.json"
        return p.read_text() if p.exists() else None

    def store_index_state(self, index_id: str, data: str) -> None:
        tmp = self.state_dir / f"index_{index_id}.json.tmp"
        tmp.write_text(data)
        tmp.replace(self.state_dir / f"index_{index_id}.json")


class RemoteStateBackend(StateBackend):
    """Object-store state backend (reference: RemoteStateBackend + S3Backend).

    Wraps a remote.RemoteBackend; every store uploads a new versioned blob and
    moves the _current pointer.
    """

    def __init__(self, remote, service_name: str):
        self.remote = remote
        self.service = service_name

    def load_global_state(self) -> Optional[str]:
        data = self.remote.download_current(self.service, "global_state")
        return data.decode() if data is not None else None

    def store_global_state(self, data: str) -> None:
        self.remote.upload_versioned(self.service, "global_state", data.encode())

    def load_index_state(self, index_id: str) -> Optional[str]:
        data = self.remote.download_current(self.service, f"index_state/{index_id}")
        return data.decode() if data is not None else None

    def store_index_state(self, index_id: str, data: str) -> None:
        self.remote.upload_versioned(
            self.service, f"index_state/{index_id}", data.encode()
        )
