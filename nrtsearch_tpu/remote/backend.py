"""RemoteBackend: versioned blobs with a _current pointer + index file store.

Key layout mirrors the reference's S3 layout concepts (S3Backend.java:94):

    <service>/<resource>/_version/<n>        versioned blob data
    <service>/<resource>/_current            pointer file: latest version n
    <service>/<index_id>/data/<file>         immutable index files
    <service>/<index_id>/point_state/...     NRT point states (versioned)
"""

from __future__ import annotations

import abc
import shutil
import threading
from pathlib import Path
from typing import Optional


class RemoteBackend(abc.ABC):
    """Abstract blob store (reference: RemoteBackend.java:27)."""

    # -- versioned small blobs (state, point state, warming queries) ----------

    @abc.abstractmethod
    def upload_versioned(self, service: str, resource: str, data: bytes) -> int: ...

    @abc.abstractmethod
    def download_current(self, service: str, resource: str) -> Optional[bytes]: ...

    @abc.abstractmethod
    def current_version(self, service: str, resource: str) -> Optional[int]: ...

    # -- immutable index data files -------------------------------------------

    @abc.abstractmethod
    def upload_index_files(
        self, service: str, index_id: str, src_dir: str | Path, file_names: list[str]
    ) -> None: ...

    @abc.abstractmethod
    def download_index_files(
        self, service: str, index_id: str, dst_dir: str | Path, file_names: list[str]
    ) -> None: ...

    @abc.abstractmethod
    def index_file_exists(self, service: str, index_id: str, file_name: str) -> bool: ...

    @abc.abstractmethod
    def delete_index_files(
        self, service: str, index_id: str, file_names: list[str]
    ) -> None: ...

    # -- listing (ops tooling: nrt_utils works over ANY backend) --------------

    @abc.abstractmethod
    def list_resources(self, service: str, prefix: str = "") -> list[str]:
        """Resource names (those with a _current pointer) under a prefix."""
        ...

    @abc.abstractmethod
    def list_index_files(self, service: str, index_id: str) -> list[str]:
        """Names of all stored index data files."""
        ...

    @abc.abstractmethod
    def list_resource_versions(self, service: str, resource: str) -> list[int]:
        """All stored versions of one resource, ascending."""
        ...

    def index_file_mtime(
        self, service: str, index_id: str, file_name: str
    ) -> Optional[float]:
        """Store-side upload time (epoch seconds) of a data file, or None
        when unknown/missing. Used by nrt_utils cleanupData's grace period
        (reference: cleanup/CleanupDataCommand --gracePeriod, which protects
        files a live primary uploaded before its point-state publish)."""
        return None


class LocalFileBackend(RemoteBackend):
    """Filesystem-backed object store double (reference tests: S3Mock with a
    file backend, AmazonS3Provider.java:92)."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._lock = threading.Lock()

    def _res_dir(self, service: str, resource: str) -> Path:
        return self.root / service / resource

    def upload_versioned(self, service: str, resource: str, data: bytes) -> int:
        with self._lock:
            d = self._res_dir(service, resource) / "_version"
            d.mkdir(parents=True, exist_ok=True)
            cur = self.current_version(service, resource)
            version = 0 if cur is None else cur + 1
            (d / str(version)).write_bytes(data)
            pointer = self._res_dir(service, resource) / "_current"
            tmp = pointer.with_suffix(".tmp")
            tmp.write_text(str(version))
            tmp.replace(pointer)
            return version

    def download_current(self, service: str, resource: str) -> Optional[bytes]:
        v = self.current_version(service, resource)
        if v is None:
            return None
        return (self._res_dir(service, resource) / "_version" / str(v)).read_bytes()

    def current_version(self, service: str, resource: str) -> Optional[int]:
        pointer = self._res_dir(service, resource) / "_current"
        if not pointer.exists():
            return None
        return int(pointer.read_text().strip())

    def _data_dir(self, service: str, index_id: str) -> Path:
        return self.root / service / index_id / "data"

    def upload_index_files(
        self, service: str, index_id: str, src_dir: str | Path, file_names: list[str]
    ) -> None:
        dst = self._data_dir(service, index_id)
        dst.mkdir(parents=True, exist_ok=True)
        for name in file_names:
            # segment files are immutable except live-mask rewrites on delete,
            # so overwriting is always safe
            shutil.copy2(Path(src_dir) / name, dst / name)

    def download_index_files(
        self, service: str, index_id: str, dst_dir: str | Path, file_names: list[str]
    ) -> None:
        src = self._data_dir(service, index_id)
        Path(dst_dir).mkdir(parents=True, exist_ok=True)
        for name in file_names:
            shutil.copy2(src / name, Path(dst_dir) / name)

    def index_file_exists(self, service: str, index_id: str, file_name: str) -> bool:
        return (self._data_dir(service, index_id) / file_name).exists()

    def delete_index_files(
        self, service: str, index_id: str, file_names: list[str]
    ) -> None:
        for name in file_names:
            p = self._data_dir(service, index_id) / name
            if p.exists():
                p.unlink()

    def list_resources(self, service: str, prefix: str = "") -> list[str]:
        base = self.root / service
        if not base.exists():
            return []
        out = []
        for cur in base.rglob("_current"):
            res = str(cur.parent.relative_to(base))
            if res.startswith(prefix):
                out.append(res)
        return sorted(out)

    def list_index_files(self, service: str, index_id: str) -> list[str]:
        d = self._data_dir(service, index_id)
        if not d.exists():
            return []
        return sorted(p.name for p in d.iterdir() if p.is_file())

    def index_file_mtime(
        self, service: str, index_id: str, file_name: str
    ) -> Optional[float]:
        p = self._data_dir(service, index_id) / file_name
        try:
            return p.stat().st_mtime
        except OSError:
            return None

    def list_resource_versions(self, service: str, resource: str) -> list[int]:
        d = self._res_dir(service, resource) / "_version"
        if not d.exists():
            return []
        return sorted(int(p.name) for p in d.iterdir() if p.name.isdigit())
