"""nrt_utils: object-store-side ops tooling.

Reference: tools/nrt_utils (picocli: snapshot/restore/list/cleanup of S3 index
data, remote state get/put — NrtUtilsCommand.java:58). These commands operate
purely against the object store (no server running), like the reference.

Usage: python -m nrtsearch_tpu.nrt_utils --root /path/to/store <command> ...
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from nrtsearch_tpu.nrt.point_state import NrtPointState
from nrtsearch_tpu.remote.backend import LocalFileBackend


def _load_point(remote, service: str, index_id: str) -> NrtPointState:
    data = remote.download_current(service, NrtPointState.resource(index_id))
    if data is None:
        raise SystemExit(f"no point state for {index_id}")
    return NrtPointState.from_json(data)


def cmd_snapshot(remote, args) -> None:
    """Pin the current point under snapshots/<timestamp> (S3-side snapshot)."""
    point = _load_point(remote, args.serviceName, args.indexId)
    ts = args.snapshotId or str(int(time.time()))
    remote.upload_versioned(
        args.serviceName, f"{args.indexId}/snapshots/{ts}", point.to_json().encode()
    )
    print(json.dumps({"snapshotId": ts, "version": point.version,
                      "files": len(point.files)}))


def cmd_restore(remote, args) -> None:
    """Make a snapshot the current point (a starting replica/primary picks it up)."""
    data = remote.download_current(
        args.serviceName, f"{args.indexId}/snapshots/{args.snapshotId}"
    )
    if data is None:
        raise SystemExit(f"no snapshot {args.snapshotId}")
    point = NrtPointState.from_json(data)
    missing = [
        f for f in point.files
        if not remote.index_file_exists(args.serviceName, args.indexId, f)
    ]
    if missing:
        raise SystemExit(f"snapshot incomplete; missing files: {missing}")
    remote.upload_versioned(
        args.serviceName, NrtPointState.resource(args.indexId), data
    )
    print(json.dumps({"restored": args.snapshotId, "version": point.version}))


def cmd_list_snapshots(remote, args) -> None:
    root = remote.root / args.serviceName / args.indexId / "snapshots"
    out = []
    if root.exists():
        for d in sorted(root.iterdir()):
            v = remote.current_version(args.serviceName,
                                       f"{args.indexId}/snapshots/{d.name}")
            if v is not None:
                data = remote.download_current(
                    args.serviceName, f"{args.indexId}/snapshots/{d.name}"
                )
                point = NrtPointState.from_json(data)
                out.append({"snapshotId": d.name, "version": point.version,
                            "gen": point.gen})
    print(json.dumps(out, indent=1))


def cmd_current_state(remote, args) -> None:
    point = _load_point(remote, args.serviceName, args.indexId)
    print(point.to_json())


def cmd_cleanup(remote, args) -> None:
    """Delete data files not referenced by the current point or any snapshot
    (reference: cleanup of orphaned S3 index data)."""
    keep: set[str] = set()
    try:
        keep.update(_load_point(remote, args.serviceName, args.indexId).files)
    except SystemExit:
        pass
    snap_root = remote.root / args.serviceName / args.indexId / "snapshots"
    if snap_root.exists():
        for d in snap_root.iterdir():
            data = remote.download_current(
                args.serviceName, f"{args.indexId}/snapshots/{d.name}"
            )
            if data:
                keep.update(NrtPointState.from_json(data).files)
    data_dir = remote.root / args.serviceName / args.indexId / "data"
    removed = []
    if data_dir.exists():
        for p in data_dir.iterdir():
            if p.name not in keep:
                if args.dryRun:
                    removed.append(p.name)
                else:
                    p.unlink()
                    removed.append(p.name)
    print(json.dumps({"removed": removed, "dryRun": bool(args.dryRun)}))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="nrt_utils")
    p.add_argument("--root", required=True, help="object store root directory")
    sub = p.add_subparsers(dest="command", required=True)

    def add(name, fn, *extra):
        sp = sub.add_parser(name)
        sp.set_defaults(fn=fn)
        sp.add_argument("--serviceName", required=True)
        sp.add_argument("--indexId", required=True)
        for flag, kw in extra:
            sp.add_argument(flag, **kw)

    add("snapshot", cmd_snapshot, ("--snapshotId", {"default": ""}))
    add("restore", cmd_restore, ("--snapshotId", {"required": True}))
    add("listSnapshots", cmd_list_snapshots)
    add("currentState", cmd_current_state)
    add("cleanup", cmd_cleanup, ("--dryRun", {"action": "store_true"}))

    args = p.parse_args(argv)
    remote = LocalFileBackend(args.root)
    try:
        args.fn(remote, args)
    except SystemExit:
        raise
    except Exception as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
