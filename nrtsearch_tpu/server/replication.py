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

_SERVICE = "nrtsearch_tpu.ReplicationServer"
CHUNK_SIZE = 256 * 1024


class ReplicationClient:
    """Client to a node's ReplicationServer (ReplicationServerClient equiv)."""

    def __init__(self, target: str):
        self.target = target
        self.channel = grpc.insecure_channel(
            target,
            options=[("grpc.max_receive_message_length", 1024 * 1024 * 1024)],
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
        return self._u("newNRTPoint", pb.NewNRTPointRequest, pb.TransferStatus)(
            pb.NewNRTPointRequest(
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

    def write_nrt_point(self, index_name: str) -> pb.SearcherVersion:
        return self._u("writeNRTPoint", pb.IndexName, pb.SearcherVersion)(
            pb.IndexName(indexName=index_name)
        )

    def replica_current_searching_version(self, index_name: str) -> pb.SearcherVersion:
        return self._u(
            "replicaCurrentSearchingVersion", pb.IndexName, pb.SearcherVersion
        )(pb.IndexName(indexName=index_name))

    def get_nodes_info(self, index_name: str) -> pb.GetNodesResponse:
        return self._u("getNodesInfo", pb.GetNodesRequest, pb.GetNodesResponse)(
            pb.GetNodesRequest(indexName=index_name)
        )


class _ReplicaConnection:
    def __init__(self, host: str, port: int, replica_id: int):
        self.host = host
        self.port = port
        self.replica_id = replica_id
        self.client = ReplicationClient(f"{host}:{port}")

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

    # -- primary-side RPCs --------------------------------------------------------

    def addReplicas(self, req: pb.AddReplicaRequest, context) -> pb.AddReplicaResponse:
        rt = self.gs.get_runtime(req.indexName)
        if rt.mode != "PRIMARY":
            context.abort(
                grpc.StatusCode.FAILED_PRECONDITION,
                f"index {req.indexName!r} is not a primary",
            )
        self._check_index_id(rt, req.indexId, context)
        conn = _ReplicaConnection(req.hostName, req.port, req.replicaId)
        with self._lock:
            self.replicas.setdefault(req.indexName, {})[conn.key] = conn
        log.info("replica registered: %s:%s for %s", req.hostName, req.port,
                 req.indexName)
        return pb.AddReplicaResponse(ok="ok")

    def recvCopyState(self, req: pb.CopyStateRequest, context) -> pb.CopyState:
        rt = self.gs.get_runtime(req.indexName)
        point = rt.current_point()
        return pb.CopyState(
            gen=point.gen,
            version=point.version,
            primaryGen=point.primary_gen,
            manifest=point.to_json().encode(),
            files=point.files,
        )

    def recvRawFile(self, req: pb.FileInfo, context):
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
        yield pb.RawFileChunk(content=b"", seqNum=crc, ack=True)

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

    def newNRTPoint(self, req: pb.NewNRTPointRequest, context) -> pb.TransferStatus:
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
                code=pb.TransferStatusCode.FAILED, message="no primary connection"
            )
        try:
            self.sync_from_primary(req.indexName, rt, client)
            return pb.TransferStatus(code=pb.TransferStatusCode.DONE)
        except Exception as e:
            log.warning("nrt copy failed: %s", e)
            return pb.TransferStatus(
                code=pb.TransferStatusCode.FAILED, message=str(e)
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
        point = NrtPointState.from_json(state.manifest)

        def fetch(files: list[str]) -> None:
            import zlib

            for name in files:
                tmp = Path(rt.index_dir) / (name + ".tmp")
                crc = 0
                footer = None
                with open(tmp, "wb") as f:
                    for chunk in client.recv_raw_file(index_name, name):
                        if chunk.ack:  # checksum footer
                            footer = chunk.seqNum
                            continue
                        crc = zlib.crc32(chunk.content, crc)
                        f.write(chunk.content)
                if footer is not None and footer != crc:
                    tmp.unlink(missing_ok=True)
                    raise IOError(
                        f"checksum mismatch copying {name!r}: {crc} != {footer}"
                    )
                tmp.replace(Path(rt.index_dir) / name)

        return rt.install_point(point, file_fetcher=fetch)

    # -- primary-side publish hook -----------------------------------------------------

    def notify_replicas(self, index_name: str, point: NrtPointState) -> None:
        """Called on primary refresh; prunes replicas that fail (UNAVAILABLE)."""
        rt = self.gs.runtimes.get(index_name)
        with self._lock:
            conns = list(self.replicas.get(index_name, {}).values())
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
        client = ReplicationClient(primary_address)
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
        "newNRTPoint": unary(service.newNRTPoint, pb.NewNRTPointRequest,
                             pb.TransferStatus),
        "recvCopyState": unary(service.recvCopyState, pb.CopyStateRequest,
                               pb.CopyState),
        "writeNRTPoint": unary(service.writeNRTPoint, pb.IndexName,
                               pb.SearcherVersion),
        "replicaCurrentSearchingVersion": unary(
            service.replicaCurrentSearchingVersion, pb.IndexName, pb.SearcherVersion
        ),
        "getNodesInfo": unary(service.getNodesInfo, pb.GetNodesRequest,
                              pb.GetNodesResponse),
        "recvRawFile": grpc.unary_stream_rpc_method_handler(
            service.recvRawFile,
            request_deserializer=pb.FileInfo.FromString,
            response_serializer=pb.RawFileChunk.SerializeToString,
        ),
    }
    return grpc.method_handlers_generic_handler(_SERVICE, handlers)
