"""NRT replication gRPC service: primary<->replica segment shipping.

Reference: ReplicationServer service (luceneserver.proto:361-404) + its
handlers (SURVEY.md §2.6): a replica registers with the primary
(addReplicas); on every refresh the primary notifies registered replicas
(newNRTPoint); the replica pulls the point manifest (recvCopyState) and
streams missing files (recvRawFile), then hot-swaps its searcher. Send
failures prune dead replicas (NRTPrimaryNode.java:233-252 semantics); a new
primary incarnation is detected via primaryGen/primaryId in the point state.

Both roles host the same service; RPC legality depends on the index's mode.
"""

from __future__ import annotations

import logging
import threading
from concurrent import futures
from pathlib import Path
from typing import Optional

import grpc

from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.nrt.point_state import NrtPointState
from nrtsearch_tpu.server.index_runtime import IndexRuntime

log = logging.getLogger("nrtsearch_tpu.replication")

_SERVICE = "luceneserver.ReplicationServer"
CHUNK_SIZE = 256 * 1024



def _crc_i32(crc: int) -> int:
    """CRC32 footer rides the int32 seqNum of the final chunk; reinterpret
    the unsigned value as signed so it fits the wire type."""
    return crc - 0x100000000 if crc >= 0x80000000 else crc

class ReplicationClient:
    """Client to a node's ReplicationServer (ReplicationServerClient equiv)."""

    def __init__(self, target: str, compression: Optional[str] = None):
        self.target = target
        self.channel = grpc.insecure_channel(
            target,
            options=[("grpc.max_receive_message_length", 1024 * 1024 * 1024)],
            compression={
                "gzip": grpc.Compression.Gzip,
                "deflate": grpc.Compression.Deflate,
            }.get(str(compression or "").lower()),
        )

    def close(self) -> None:
        self.channel.close()

    def _u(self, name, req_t, resp_t):
        return self.channel.unary_unary(
            f"/{_SERVICE}/{name}",
            request_serializer=req_t.SerializeToString,
            response_deserializer=resp_t.FromString,
        )

    def add_replicas(self, index_name: str, index_id: str, host: str, port: int,
                     replica_id: int = 0) -> pb.AddReplicaResponse:
        return self._u("addReplicas", pb.AddReplicaRequest, pb.AddReplicaResponse)(
            pb.AddReplicaRequest(
                replicaId=replica_id, indexName=index_name, hostName=host,
                port=port, indexId=index_id,
            )
        )

    def new_nrt_point(self, index_name: str, index_id: str, version: int,
                      primary_gen: int) -> pb.TransferStatus:
        return self._u("newNRTPoint", pb.NewNRTPoint, pb.TransferStatus)(
            pb.NewNRTPoint(
                indexName=index_name, version=version, primaryGen=primary_gen,
                indexId=index_id,
            )
        )

    def recv_copy_state(self, index_name: str, replica_id: int = 0) -> pb.CopyState:
        return self._u("recvCopyState", pb.CopyStateRequest, pb.CopyState)(
            pb.CopyStateRequest(indexName=index_name, replicaId=replica_id)
        )

    def recv_raw_file(self, index_name: str, file_name: str, fp_start: int = 0):
        call = self.channel.unary_stream(
            f"/{_SERVICE}/recvRawFile",
            request_serializer=pb.FileInfo.SerializeToString,
            response_deserializer=pb.RawFileChunk.FromString,
        )
        return call(pb.FileInfo(fileName=file_name, fpStart=fp_start,
                                indexName=index_name))

    def recv_raw_file_v2(self, index_name: str, file_name: str,
                         ack_every: int = 1000, fp_start: int = 0):
        """Acked file copy (reference: recvRawFileV2 + FileCopyConfig): yields
        chunks while sending an ack upstream every ``ack_every`` chunks so the
        sender's unacked in-flight window stays bounded."""
        import queue

        acks: "queue.Queue[Optional[int]]" = queue.Queue()

        def requests():
            yield pb.FileInfo(
                fileName=file_name, fpStart=fp_start, indexName=index_name,
                ackEvery=ack_every,
            )
            while True:
                a = acks.get()
                if a is None:
                    return
                yield pb.FileInfo(
                    fileName=file_name, indexName=index_name, ackSeqNum=a
                )

        call = self.channel.stream_stream(
            f"/{_SERVICE}/recvRawFileV2",
            request_serializer=pb.FileInfo.SerializeToString,
            response_deserializer=pb.RawFileChunk.FromString,
        )
        resp = call(requests())
        try:
            n = 0
            for chunk in resp:
                if not chunk.ack:
                    n += 1
                    if n % ack_every == 0:
                        acks.put(n)
                yield chunk
        finally:
            acks.put(None)

    def copy_files(self, index_name: str, index_id: str, primary_gen: int,
                   file_names: list[str], timeout: Optional[float] = None):
        """Merge pre-copy push: ask a replica to warm files ahead of the NRT
        point (reference: ReplicationServerClient.copyFiles). Returns the
        TransferStatus stream; drain it to completion."""
        call = self.channel.unary_stream(
            f"/{_SERVICE}/copyFiles",
            request_serializer=pb.CopyFiles.SerializeToString,
            response_deserializer=pb.TransferStatus.FromString,
        )
        fmd = pb.FilesMetadata(numFiles=len(file_names))
        for name in file_names:
            fmd.fileMetadata.add(fileName=name)
        return call(
            pb.CopyFiles(
                indexName=index_name, indexId=index_id,
                primaryGen=primary_gen, filesMetadata=fmd,
            ),
            timeout=timeout,
        )

    def send_raw_file(self, index_name: str, file_name: str,
                      path) -> pb.TransferStatus:
        """Push one local file to the peer (sendRawFile reverse stream),
        ending with the CRC32 footer chunk the receiver verifies."""
        import zlib

        def chunks():
            crc = 0
            seq = 0
            first = True
            with open(path, "rb") as f:
                while True:
                    data = f.read(CHUNK_SIZE)
                    if not data:
                        break
                    seq += 1
                    crc = zlib.crc32(data, crc)
                    kw = {}
                    if first:
                        kw = {"fileName": file_name, "indexName": index_name}
                        first = False
                    yield pb.RawFileChunk(content=data, seqNum=seq, **kw)
            if first:  # empty file: still send the name
                yield pb.RawFileChunk(
                    content=b"", seqNum=0, fileName=file_name,
                    indexName=index_name,
                )
            yield pb.RawFileChunk(content=b"", seqNum=_crc_i32(crc), ack=True)

        call = self.channel.stream_unary(
            f"/{_SERVICE}/sendRawFile",
            request_serializer=pb.RawFileChunk.SerializeToString,
            response_deserializer=pb.TransferStatus.FromString,
        )
        return call(chunks())

    def write_nrt_point(self, index_name: str) -> pb.SearcherVersion:
        return self._u("writeNRTPoint", pb.IndexName, pb.SearcherVersion)(
            pb.IndexName(indexName=index_name)
        )

    def replica_current_searching_version(self, index_name: str) -> pb.SearcherVersion:
        return self._u(
            "getCurrentSearcherVersion", pb.IndexName, pb.SearcherVersion
        )(pb.IndexName(indexName=index_name))

    def get_nodes_info(self, index_name: str) -> pb.GetNodesResponse:
        return self._u("getConnectedNodes", pb.GetNodesRequest, pb.GetNodesResponse)(
            pb.GetNodesRequest(indexName=index_name)
        )


class _ReplicaConnection:
    def __init__(self, host: str, port: int, replica_id: int,
                 compression: Optional[str] = None):
        self.host = host
        self.port = port
        self.replica_id = replica_id
        self.client = ReplicationClient(f"{host}:{port}", compression=compression)

    @property
    def key(self) -> tuple:
        return (self.host, self.port)


class ReplicationService:
    """The ReplicationServer service implementation for one node."""

    def __init__(self, global_state):
        self.gs = global_state
        # index name -> {(host, port): _ReplicaConnection}   (primary role)
        self.replicas: dict[str, dict[tuple, _ReplicaConnection]] = {}
        self._lock = threading.Lock()
        self._primary_clients: dict[str, ReplicationClient] = {}  # replica role
        self._warmed_files: dict[str, set] = {}  # merge pre-copy bookkeeping
        # copy bandwidth scheduling (reference: NrtCopyThread /
        # ProportionalCopyThread bandwidth allocation): bound concurrent
        # outbound file copies and pace bytes to maxCopyMBPerSec
        cfg = getattr(global_state, "config", None)
        max_copies = int(getattr(cfg, "max_concurrent_copies", 0) or 0)
        self._copy_slots = (
            threading.BoundedSemaphore(max_copies) if max_copies > 0 else None
        )
        self._copy_mb_per_sec = float(getattr(cfg, "max_copy_mb_per_sec", 0) or 0)
        self._compression = (
            cfg.get("compressionType", None) if cfg is not None else None
        )

    def _paced(self, chunks):
        """Token-bucket pacing of an outbound chunk stream, gated on a
        concurrency slot when maxConcurrentCopies is set."""
        import time as _time

        if self._copy_slots is not None:
            self._copy_slots.acquire()
        try:
            start = _time.monotonic()
            sent = 0
            rate = self._copy_mb_per_sec * 1024 * 1024
            for chunk in chunks:
                yield chunk
                if rate > 0:
                    sent += len(chunk.content)
                    ahead = sent / rate - (_time.monotonic() - start)
                    if ahead > 0:
                        _time.sleep(ahead)
        finally:
            if self._copy_slots is not None:
                self._copy_slots.release()

    # -- primary-side RPCs --------------------------------------------------------

    def addReplicas(self, req: pb.AddReplicaRequest, context) -> pb.AddReplicaResponse:
        rt = self.gs.get_runtime(req.indexName)
        if rt.mode != "PRIMARY":
            context.abort(
                grpc.StatusCode.FAILED_PRECONDITION,
                f"index {req.indexName!r} is not a primary",
            )
        self._check_index_id(rt, req.indexId, context)
        conn = _ReplicaConnection(
            req.hostName, req.port, req.replicaId,
            compression=self._compression,
        )
        with self._lock:
            self.replicas.setdefault(req.indexName, {})[conn.key] = conn
        log.info("replica registered: %s:%s for %s", req.hostName, req.port,
                 req.indexName)
        return pb.AddReplicaResponse(ok="ok")

    def recvCopyState(self, req: pb.CopyStateRequest, context) -> pb.CopyState:
        rt = self.gs.get_runtime(req.indexName)
        self._check_index_id(rt, req.indexId, context)
        point = rt.current_point()
        # infoBytes carries the serialized point manifest (the reference puts
        # serialized SegmentInfos here: NrtPointState.java:33-41); per-file
        # length/checksum ride FilesMetadata like NrtFileMetaData.
        manifest = point.to_json().encode()
        fmd = pb.FilesMetadata(numFiles=len(point.files))
        for name in point.files:
            length, crc = point.file_meta.get(name, (0, 0))
            fmd.fileMetadata.add(fileName=name, len=length, checksum=crc)
        return pb.CopyState(
            gen=point.gen,
            version=point.version,
            primaryGen=point.primary_gen,
            infoBytesLength=len(manifest),
            infoBytes=manifest,
            filesMetadata=fmd,
        )

    def recvRawFile(self, req: pb.FileInfo, context):
        yield from self._paced(self._recv_raw_file_impl(req, context))

    def _recv_raw_file_impl(self, req: pb.FileInfo, context):
        """Stream one file in chunks, ending with a checksum footer chunk
        (ack=True, seqNum=CRC32) that the receiver verifies — the reference's
        CopyOneFile footer-checksum mechanism."""
        import zlib

        rt = self.gs.get_runtime(req.indexName)
        path = Path(rt.index_dir) / req.fileName
        if not path.exists():
            context.abort(grpc.StatusCode.NOT_FOUND, f"no file {req.fileName!r}")
        seq = 0
        crc = 0
        with open(path, "rb") as f:
            if req.fpStart:
                f.seek(req.fpStart)
            while True:
                chunk = f.read(CHUNK_SIZE)
                if not chunk:
                    break
                seq += 1
                crc = zlib.crc32(chunk, crc)
                yield pb.RawFileChunk(content=chunk, seqNum=seq)
        # trailing checksum footer (ack=True marks it)
        yield pb.RawFileChunk(content=b"", seqNum=_crc_i32(crc), ack=True)

    def recvRawFileV2(self, request_iterator, context):
        yield from self._paced(self._recv_raw_file_v2_impl(request_iterator, context))

    def _recv_raw_file_v2_impl(self, request_iterator, context):
        """Acked raw-file stream (reference: recvRawFileV2 + the ackedCopy
        FileCopyConfig): the sender stops when more than max_in_flight
        unacked chunks are outstanding, resuming as acks arrive. The stream
        ends with the same checksum footer chunk as recvRawFile."""
        import zlib

        req = next(request_iterator)
        rt = self.gs.get_runtime(req.indexName)
        cfg = getattr(self.gs, "config", None)
        # the window must exceed the RECEIVER's ack interval or the copy
        # deadlocks (sender waits for an ack the client will never send).
        # The receiver declares its cadence in the initial FileInfo.ackEvery;
        # fall back to this node's config only for old clients that omit it.
        receiver_ack_every = int(
            req.ackEvery or getattr(cfg, "ack_every", 1000) or 1000
        )
        max_in_flight = max(
            int(getattr(cfg, "max_in_flight", 2000) or 2000),
            receiver_ack_every + 1,
        )
        path = Path(rt.index_dir) / req.fileName
        if not path.exists():
            context.abort(grpc.StatusCode.NOT_FOUND, f"no file {req.fileName!r}")
        seq = 0
        crc = 0
        last_ack = 0
        with open(path, "rb") as f:
            if req.fpStart:
                f.seek(req.fpStart)
            while True:
                chunk = f.read(CHUNK_SIZE)
                if not chunk:
                    break
                seq += 1
                crc = zlib.crc32(chunk, crc)
                while seq - last_ack > max_in_flight:
                    ack = next(request_iterator, None)
                    if ack is None:
                        return  # receiver went away
                    last_ack = max(last_ack, ack.ackSeqNum)
                yield pb.RawFileChunk(content=chunk, seqNum=seq)
        yield pb.RawFileChunk(content=b"", seqNum=_crc_i32(crc), ack=True)

    def copyFiles(self, req: pb.CopyFiles, context):
        """Replica-side merge pre-copy: fetch the named files from the primary
        before the NRT point referencing them arrives (reference:
        CopyFilesHandler + NRTReplicaNode.launchPreCopyFiles)."""
        rt = self.gs.get_runtime(req.indexName)
        if rt.mode != "REPLICA":
            context.abort(
                grpc.StatusCode.FAILED_PRECONDITION,
                f"index {req.indexName!r} is not a replica",
            )
        self._check_index_id(rt, req.indexId, context)
        client = self._primary_clients.get(req.indexName)
        if client is None:
            yield pb.TransferStatus(
                Code=pb.TransferStatusCode.Failed, Message="no primary connection"
            )
            return
        yield pb.TransferStatus(Code=pb.TransferStatusCode.Ongoing)
        missing = [
            f.fileName for f in req.filesMetadata.fileMetadata
            if not (Path(rt.index_dir) / f.fileName).exists()
        ]
        try:
            self._fetch_files(rt, client, req.indexName, missing)
            yield pb.TransferStatus(Code=pb.TransferStatusCode.Done)
        except Exception as e:
            log.warning("merge precopy failed: %s", e)
            yield pb.TransferStatus(
                Code=pb.TransferStatusCode.Failed, Message=str(e)
            )

    def sendRawFile(self, request_iterator, context) -> pb.TransferStatus:
        """Reverse push: the sender streams a file's chunks to this node
        (reference: SendRawFileHandler, luceneserver.proto:371 — which writes
        to a temp file; here the first chunk's fileName/indexName route the
        bytes into the index dir, verified by the trailing CRC footer)."""
        import tempfile
        import zlib

        first = next(request_iterator, None)
        if first is None:
            return pb.TransferStatus(
                Code=pb.TransferStatusCode.Failed, Message="empty stream"
            )
        dest = None
        if first.fileName and first.indexName:
            try:
                rt = self.gs.get_runtime(first.indexName)
                dest = Path(rt.index_dir) / first.fileName
            except KeyError:
                return pb.TransferStatus(
                    Code=pb.TransferStatusCode.Failed,
                    Message=f"unknown index {first.indexName!r}",
                )
        crc = 0
        footer = None
        if dest is not None:
            # unique tmp per stream: a merge pre-copy and a point-driven copy
            # of the SAME file may run concurrently; sharing one .tmp name
            # makes the loser's atomic rename fail on a vanished source
            tmp = dest.with_suffix(
                dest.suffix + f".{threading.get_ident():x}.tmp"
            )
        else:
            fd, tmp_name = tempfile.mkstemp(suffix=".tmp")
            import os as _os

            _os.close(fd)
            tmp = Path(tmp_name)
        try:
            import itertools

            chunks = (
                itertools.chain([first], request_iterator)
                if (first.content or first.ack)
                else request_iterator
            )
            with open(tmp, "wb") as f:
                for chunk in chunks:
                    if chunk.ack:
                        footer = chunk.seqNum & 0xFFFFFFFF
                        continue
                    crc = zlib.crc32(chunk.content, crc)
                    f.write(chunk.content)
            if footer is not None and footer != crc:
                tmp.unlink(missing_ok=True)
                return pb.TransferStatus(
                    Code=pb.TransferStatusCode.Failed,
                    Message=f"checksum mismatch: {crc} != {footer}",
                )
            if dest is not None:
                tmp.replace(dest)
            return pb.TransferStatus(Code=pb.TransferStatusCode.Done, Message="ok")
        except Exception as e:
            tmp.unlink(missing_ok=True)
            return pb.TransferStatus(
                Code=pb.TransferStatusCode.Failed, Message=str(e)
            )

    def writeNRTPoint(self, req: pb.IndexName, context) -> pb.SearcherVersion:
        rt = self.gs.get_runtime(req.indexName)
        before = rt.searcher.version
        rt.refresh()
        return pb.SearcherVersion(
            version=rt.searcher.version, didRefresh=rt.searcher.version != before
        )

    def getNodesInfo(self, req: pb.GetNodesRequest, context) -> pb.GetNodesResponse:
        resp = pb.GetNodesResponse()
        for conn in self.replicas.get(req.indexName, {}).values():
            n = resp.nodes.add()
            n.hostname = conn.host
            n.port = conn.port
        return resp

    # -- replica-side RPCs ----------------------------------------------------------

    def newNRTPoint(self, req: pb.NewNRTPoint, context) -> pb.TransferStatus:
        rt = self.gs.get_runtime(req.indexName)
        if rt.mode != "REPLICA":
            context.abort(
                grpc.StatusCode.FAILED_PRECONDITION,
                f"index {req.indexName!r} is not a replica",
            )
        self._check_index_id(rt, req.indexId, context)
        client = self._primary_clients.get(req.indexName)
        if client is None:
            return pb.TransferStatus(
                Code=pb.TransferStatusCode.Failed, Message="no primary connection"
            )
        try:
            self.sync_from_primary(req.indexName, rt, client)
            return pb.TransferStatus(Code=pb.TransferStatusCode.Done)
        except Exception as e:
            log.warning("nrt copy failed: %s", e)
            return pb.TransferStatus(
                Code=pb.TransferStatusCode.Failed, Message=str(e)
            )

    def replicaCurrentSearchingVersion(
        self, req: pb.IndexName, context
    ) -> pb.SearcherVersion:
        rt = self.gs.get_runtime(req.indexName)
        return pb.SearcherVersion(version=rt.searcher.version)

    def _check_index_id(self, rt: IndexRuntime, index_id: str, context) -> None:
        if index_id and index_id != rt.state_info.index_id:
            context.abort(
                grpc.StatusCode.FAILED_PRECONDITION,
                f"index id mismatch: {index_id!r} != {rt.state_info.index_id!r}",
            )

    # -- copy job (replica pulls from primary; SimpleCopyJob equivalent) -------------

    def sync_from_primary(self, index_name: str, rt: IndexRuntime,
                          client: ReplicationClient) -> bool:
        state = client.recv_copy_state(index_name)
        point = NrtPointState.from_json(state.infoBytes)
        return rt.install_point(
            point,
            file_fetcher=lambda files: self._fetch_files(
                rt, client, index_name, files
            ),
        )

    def _fetch_files(self, rt: IndexRuntime, client: ReplicationClient,
                     index_name: str, files: list[str]) -> None:
        """Copy files from the primary with footer checksum verification;
        uses the acked (flow-controlled) stream when FileCopyConfig.ackedCopy
        is on."""
        import zlib

        cfg = getattr(self.gs, "config", None)
        acked = bool(getattr(cfg, "acked_copy", False))
        ack_every = int(getattr(cfg, "ack_every", 1000) or 1000)
        for name in files:
            # unique tmp per fetch (concurrent pre-copy/point copies of the
            # same file must not share a tmp name — see recvRawFileV2)
            tmp = Path(rt.index_dir) / (
                name + f".{threading.get_ident():x}.tmp"
            )
            crc = 0
            footer = None
            stream = (
                client.recv_raw_file_v2(index_name, name, ack_every=ack_every)
                if acked
                else client.recv_raw_file(index_name, name)
            )
            with open(tmp, "wb") as f:
                for chunk in stream:
                    if chunk.ack:  # checksum footer
                        footer = chunk.seqNum & 0xFFFFFFFF
                        continue
                    crc = zlib.crc32(chunk.content, crc)
                    f.write(chunk.content)
            if footer is None:
                # a clean stream end without the checksum footer means the
                # sender bailed early (e.g. receiver presumed gone) — never
                # install a possibly-truncated file
                tmp.unlink(missing_ok=True)
                raise IOError(f"copy of {name!r} ended without checksum footer")
            if footer != crc:
                tmp.unlink(missing_ok=True)
                raise IOError(
                    f"checksum mismatch copying {name!r}: {crc} != {footer}"
                )
            tmp.replace(Path(rt.index_dir) / name)

    # -- primary-side publish hook -----------------------------------------------------

    def notify_replicas(self, index_name: str, point: NrtPointState) -> None:
        """Called on primary refresh; prunes replicas that fail (UNAVAILABLE)."""
        rt = self.gs.runtimes.get(index_name)
        with self._lock:
            conns = list(self.replicas.get(index_name, {}).values())
        # merge pre-copy (reference: NRTPrimaryNode.preCopyMergedSegmentFiles):
        # push newly-merged segment files to replicas BEFORE publishing the
        # point so the version switch doesn't stall on large file copies
        warmed = self._warmed_files.setdefault(index_name, set())
        warm = [f for f in point.files if "_m." in f and f not in warmed]
        for conn in conns:
            try:
                if warm and rt is not None:
                    for status in conn.client.copy_files(
                        index_name, rt.state_info.index_id,
                        point.primary_gen, warm, timeout=60,
                    ):
                        if status.Code == pb.TransferStatusCode.Failed:
                            log.warning(
                                "merge precopy to %s:%s failed: %s",
                                conn.host, conn.port, status.Message,
                            )
                            break
            except grpc.RpcError as e:
                log.warning("merge precopy to %s:%s error: %s",
                            conn.host, conn.port, e.code())
        warmed.update(warm)
        for conn in conns:
            try:
                conn.client.new_nrt_point(
                    index_name,
                    rt.state_info.index_id if rt else "",
                    point.version,
                    point.primary_gen,
                )
            except grpc.RpcError as e:
                code = e.code()
                if code in (
                    grpc.StatusCode.UNAVAILABLE,
                    grpc.StatusCode.FAILED_PRECONDITION,
                ):
                    log.warning("pruning dead replica %s:%s (%s)",
                                conn.host, conn.port, code)
                    with self._lock:
                        self.replicas.get(index_name, {}).pop(conn.key, None)
                    conn.client.close()

    # -- replica bootstrap ---------------------------------------------------------------

    def connect_to_primary(self, index_name: str, rt: IndexRuntime,
                           primary_address: str, my_host: str, my_port: int,
                           replica_id: int = 0) -> None:
        """Register with the primary and do the initial sync
        (NRTReplicaNode.syncFromCurrentPrimary equivalent).

        ``primary_address`` may be ``file:/path/to/primary.json`` — a
        discovery file holding {"host": ..., "port": ...} that is polled for
        primary failover (reference: PrimaryFileNameResolver, polling every
        10s; FileChangedTask reconnects on change)."""
        if primary_address.startswith("file:"):
            path = Path(primary_address[len("file:"):])
            self._watch_primary_file(index_name, rt, path, my_host, my_port,
                                     replica_id)
            return
        old = self._primary_clients.pop(index_name, None)
        if old is not None:
            old.close()
        client = ReplicationClient(primary_address, compression=self._compression)
        self._primary_clients[index_name] = client
        client.add_replicas(
            index_name, rt.state_info.index_id, my_host, my_port, replica_id
        )
        self.sync_from_primary(index_name, rt, client)

    def _watch_primary_file(self, index_name: str, rt: IndexRuntime, path: Path,
                            my_host: str, my_port: int, replica_id: int,
                            interval: float = 2.0) -> None:
        import json

        state = {"last": None}

        def read_addr():
            try:
                d = json.loads(path.read_text())
                if isinstance(d, list):
                    d = d[0]
                return f"{d['host']}:{d['port']}"
            except Exception:
                return None

        def connect_if_changed():
            addr = read_addr()
            if addr and addr != state["last"]:
                try:
                    self.connect_to_primary(
                        index_name, rt, addr, my_host, my_port, replica_id
                    )
                    state["last"] = addr
                    log.info("replica connected to primary %s (discovery file)", addr)
                except Exception as e:
                    log.warning("primary connect failed: %s", e)

        connect_if_changed()

        def poll():
            while not rt._stopped.is_set():
                rt._stopped.wait(interval)
                connect_if_changed()

        threading.Thread(target=poll, daemon=True).start()


def make_replication_service(service: ReplicationService) -> grpc.GenericRpcHandler:
    def unary(fn, req_t, resp_t):
        def call(request, context):
            try:
                return fn(request, context)
            except KeyError as e:
                context.abort(grpc.StatusCode.NOT_FOUND, str(e))
            except RuntimeError as e:
                context.abort(grpc.StatusCode.FAILED_PRECONDITION, str(e))

        return grpc.unary_unary_rpc_method_handler(
            call, request_deserializer=req_t.FromString,
            response_serializer=resp_t.SerializeToString,
        )

    handlers = {
        "addReplicas": unary(service.addReplicas, pb.AddReplicaRequest,
                             pb.AddReplicaResponse),
        "newNRTPoint": unary(service.newNRTPoint, pb.NewNRTPoint,
                             pb.TransferStatus),
        "recvCopyState": unary(service.recvCopyState, pb.CopyStateRequest,
                               pb.CopyState),
        "writeNRTPoint": unary(service.writeNRTPoint, pb.IndexName,
                               pb.SearcherVersion),
        "getCurrentSearcherVersion": unary(
            service.replicaCurrentSearchingVersion, pb.IndexName, pb.SearcherVersion
        ),
        "getConnectedNodes": unary(service.getNodesInfo, pb.GetNodesRequest,
                              pb.GetNodesResponse),
        "recvRawFile": grpc.unary_stream_rpc_method_handler(
            service.recvRawFile,
            request_deserializer=pb.FileInfo.FromString,
            response_serializer=pb.RawFileChunk.SerializeToString,
        ),
        "recvRawFileV2": grpc.stream_stream_rpc_method_handler(
            service.recvRawFileV2,
            request_deserializer=pb.FileInfo.FromString,
            response_serializer=pb.RawFileChunk.SerializeToString,
        ),
        "copyFiles": grpc.unary_stream_rpc_method_handler(
            service.copyFiles,
            request_deserializer=pb.CopyFiles.FromString,
            response_serializer=pb.TransferStatus.SerializeToString,
        ),
        "sendRawFile": grpc.stream_unary_rpc_method_handler(
            service.sendRawFile,
            request_deserializer=pb.RawFileChunk.FromString,
            response_serializer=pb.TransferStatus.SerializeToString,
        ),
    }
    return grpc.method_handlers_generic_handler(_SERVICE, handlers)
