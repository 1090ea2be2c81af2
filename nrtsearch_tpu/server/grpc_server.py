"""gRPC front-end: exposes the Handlers over the LuceneServer service.

Reference: server/grpc/NrtsearchServer.java:160 (server bootstrap) and the
LuceneServerImpl per-RPC delegates (:490-731). Implemented with grpc generic
method handlers (no protoc grpc plugin in this environment); method routing,
error -> status mapping, and the streaming ingest live here.
"""

from __future__ import annotations

import logging
from concurrent import futures
from typing import Callable, Optional

import grpc

from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.handlers import Handlers
from nrtsearch_tpu.state.backend import LocalStateBackend
from nrtsearch_tpu.state.global_state import GlobalState

log = logging.getLogger("nrtsearch_tpu.server")

_STATUS_MAP = {
    KeyError: grpc.StatusCode.NOT_FOUND,
    FileExistsError: grpc.StatusCode.ALREADY_EXISTS,
    FileNotFoundError: grpc.StatusCode.NOT_FOUND,
    ValueError: grpc.StatusCode.INVALID_ARGUMENT,
    PermissionError: grpc.StatusCode.FAILED_PRECONDITION,
    RuntimeError: grpc.StatusCode.FAILED_PRECONDITION,
    NotImplementedError: grpc.StatusCode.UNIMPLEMENTED,
}


def _check_deadline(context) -> None:
    """DeadlineUtils.checkDeadline equivalent (DeadlineUtils.java:48)."""
    remaining = context.time_remaining()
    if remaining is not None and remaining <= 0:
        context.abort(grpc.StatusCode.DEADLINE_EXCEEDED, "deadline exceeded")


def _wrap_unary(fn: Callable, metrics=None):
    import time as _time

    def call(request, context):
        t0 = _time.perf_counter()
        try:
            _check_deadline(context)
            resp = fn(request)
            if metrics is not None:
                metrics.observe_rpc(fn.__name__, _time.perf_counter() - t0)
            return resp
        except Exception as e:  # map to gRPC status like Handler.java:83
            code = _STATUS_MAP.get(type(e), grpc.StatusCode.INTERNAL)
            if metrics is not None:
                metrics.observe_rpc(fn.__name__, _time.perf_counter() - t0, code.name)
            log.warning("rpc %s failed: %s", fn.__name__, e)
            context.abort(code, f"{type(e).__name__}: {e}")

    return call


def _wrap_stream_unary(fn: Callable, metrics=None):
    import time as _time

    def call(request_iterator, context):
        t0 = _time.perf_counter()
        try:
            _check_deadline(context)
            resp = fn(request_iterator)
            if metrics is not None:
                metrics.observe_rpc(fn.__name__, _time.perf_counter() - t0)
            return resp
        except Exception as e:
            code = _STATUS_MAP.get(type(e), grpc.StatusCode.INTERNAL)
            if metrics is not None:
                metrics.observe_rpc(fn.__name__, _time.perf_counter() - t0, code.name)
            log.warning("rpc %s failed: %s", fn.__name__, e)
            context.abort(code, f"{type(e).__name__}: {e}")

    return call


# RPC name -> (request type, response type, kind)
from google.protobuf import any_pb2

_LUCENE_RPCS = {
    "createIndex": (pb.CreateIndexRequest, pb.CreateIndexResponse, "unary"),
    "deleteIndex": (pb.DeleteIndexRequest, pb.DeleteIndexResponse, "unary"),
    "liveSettings": (pb.LiveSettingsRequest, pb.LiveSettingsResponse, "unary"),
    "liveSettingsV2": (pb.LiveSettingsV2Request, pb.LiveSettingsV2Response, "unary"),
    "settings": (pb.SettingsRequest, pb.SettingsResponse, "unary"),
    "settingsV2": (pb.SettingsV2Request, pb.SettingsV2Response, "unary"),
    "registerFields": (pb.FieldDefRequest, pb.FieldDefResponse, "unary"),
    "updateFields": (pb.FieldDefRequest, pb.FieldDefResponse, "unary"),
    "startIndex": (pb.StartIndexRequest, pb.StartIndexResponse, "unary"),
    "startIndexV2": (pb.StartIndexV2Request, pb.StartIndexResponse, "unary"),
    "stopIndex": (pb.StopIndexRequest, pb.DummyResponse, "unary"),
    "reloadState": (pb.ReloadStateRequest, pb.ReloadStateResponse, "unary"),
    "searchV2": (pb.SearchRequest, any_pb2.Any, "unary"),
    "nodeInfo": (pb.NodeInfoRequest, pb.NodeInfoResponse, "unary"),
    "globalState": (pb.GlobalStateRequest, pb.GlobalStateResponse, "unary"),
    "state": (pb.StateRequest, pb.StateResponse, "unary"),
    "indexState": (pb.IndexStateRequest, pb.IndexStateResponse, "unary"),
    "forceMergeDeletes": (
        pb.ForceMergeDeletesRequest, pb.ForceMergeDeletesResponse, "unary",
    ),
    "addDocuments": (pb.AddDocumentRequest, pb.AddDocumentResponse, "stream_unary"),
    "refresh": (pb.RefreshRequest, pb.RefreshResponse, "unary"),
    "commit": (pb.CommitRequest, pb.CommitResponse, "unary"),
    "delete": (pb.AddDocumentRequest, pb.AddDocumentResponse, "unary"),
    "deleteByQuery": (pb.DeleteByQueryRequest, pb.AddDocumentResponse, "unary"),
    "deleteAll": (pb.DeleteAllDocumentsRequest, pb.DeleteAllDocumentsResponse, "unary"),
    "search": (pb.SearchRequest, pb.SearchResponse, "unary"),
    "stats": (pb.StatsRequest, pb.StatsResponse, "unary"),
    "indices": (pb.IndicesRequest, pb.IndicesResponse, "unary"),
    "status": (pb.HealthCheckRequest, pb.HealthCheckResponse, "unary"),
    "ready": (pb.ReadyCheckRequest, pb.HealthCheckResponse, "unary"),
    "forceMerge": (pb.ForceMergeRequest, pb.ForceMergeResponse, "unary"),
    "metrics": (pb.Empty, pb.HttpBody, "unary"),
    "custom": (pb.CustomRequest, pb.CustomResponse, "unary"),
    "createSnapshot": (pb.CreateSnapshotRequest, pb.CreateSnapshotResponse, "unary"),
    "releaseSnapshot": (pb.ReleaseSnapshotRequest, pb.ReleaseSnapshotResponse, "unary"),
    "getAllSnapshotIndexGen": (
        pb.GetAllSnapshotGenRequest, pb.GetAllSnapshotGenResponse, "unary",
    ),
    "backupWarmingQueries": (
        pb.BackupWarmingQueriesRequest, pb.BackupWarmingQueriesResponse, "unary",
    ),
}


def make_lucene_service(handlers: Handlers, metrics=None) -> grpc.GenericRpcHandler:
    method_handlers = {}
    for name, (req_t, resp_t, kind) in _LUCENE_RPCS.items():
        fn = getattr(handlers, name, None)
        if fn is None:
            continue
        if kind == "unary":
            method_handlers[name] = grpc.unary_unary_rpc_method_handler(
                _wrap_unary(fn, metrics),
                request_deserializer=req_t.FromString,
                response_serializer=resp_t.SerializeToString,
            )
        elif kind == "stream_unary":
            method_handlers[name] = grpc.stream_unary_rpc_method_handler(
                _wrap_stream_unary(fn, metrics),
                request_deserializer=req_t.FromString,
                response_serializer=resp_t.SerializeToString,
            )
    # `delete` takes a single AddDocumentRequest in the reference; expose both
    delete_one = lambda req: handlers.delete([req])  # noqa: E731
    delete_one.__name__ = "delete"
    method_handlers["delete"] = grpc.unary_unary_rpc_method_handler(
        _wrap_unary(delete_one, metrics),
        request_deserializer=pb.AddDocumentRequest.FromString,
        response_serializer=pb.AddDocumentResponse.SerializeToString,
    )
    return grpc.method_handlers_generic_handler(
        "luceneserver.LuceneServer", method_handlers
    )


class NrtsearchServer:
    """Server bootstrap (NrtsearchServer.java:160 equivalent)."""

    def __init__(self, config: Optional[NrtsearchConfig] = None,
                 global_state: Optional[GlobalState] = None):
        self.config = config or NrtsearchConfig()
        self._init_compile_cache(self.config)
        if global_state is None:
            remote = self._make_remote_backend(self.config)
            if remote is not None and str(
                self.config.raw.get("stateConfig", {}).get("backendType", "LOCAL")
            ).upper() == "REMOTE":
                from nrtsearch_tpu.state.backend import RemoteStateBackend

                backend = RemoteStateBackend(remote, self.config.service_name)
            else:
                backend = LocalStateBackend(self.config.state_dir)
            global_state = GlobalState(self.config, backend, remote=remote)
        self.global_state = global_state
        from nrtsearch_tpu.server.monitoring import Metrics
        from nrtsearch_tpu.server.plugins import PluginRegistry, load_plugins

        self.metrics = Metrics(global_state)
        self.plugins = PluginRegistry()
        load_plugins(self.config.plugins, self.plugins,
                     remote=getattr(global_state, "remote", None),
                     service=self.config.service_name)
        for ingestor in self.plugins.ingestors:
            ingestor.initialize(global_state)
        self.handlers = Handlers(global_state, self.metrics, self.plugins)
        self.server: Optional[grpc.Server] = None
        self.port: Optional[int] = None
        self.replication_server: Optional[grpc.Server] = None
        self.replication_port: Optional[int] = None
        from nrtsearch_tpu.server.replication import ReplicationService

        self.replication_service = ReplicationService(global_state)
        global_state.on_nrt_point = self.replication_service.notify_replicas
        global_state.connect_replica = self._connect_replica

    @staticmethod
    def _init_compile_cache(config: NrtsearchConfig) -> None:
        """Persistent XLA compilation cache: serving dispatch shapes are
        quantized (pow2 batch, run_len, R) but the first request at each new
        shape pays a multi-second jit compile; persisting compiled programs
        across restarts turns that into a one-time cost per deployment
        (config key compileCacheDir, default <stateDir>/xla_cache; empty
        string disables)."""
        import os

        cache_dir = config.raw.get(
            "compileCacheDir",
            os.path.join(config.state_dir, "xla_cache"),
        )
        if not cache_dir:
            return
        try:
            import jax

            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", str(cache_dir))
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        except Exception:  # cache is an optimization, never fatal
            log.warning("compilation cache unavailable", exc_info=True)

    @staticmethod
    def _make_remote_backend(config: NrtsearchConfig):
        """Build the object-store backend from config: bucketName selects the
        real S3 client (remote/s3.py, SigV4 over http.client — boto3 is not
        available here); a ``remoteRoot`` path selects the filesystem double.
        Returns None when no remote storage is configured (pure-local node)."""
        if config.bucket_name:
            from nrtsearch_tpu.remote.s3 import S3Backend

            return S3Backend.from_config(config)
        remote_root = config.raw.get("remoteRoot", "")
        if remote_root:
            from nrtsearch_tpu.remote.backend import LocalFileBackend

            return LocalFileBackend(remote_root)
        return None

    def _connect_replica(self, index_name, rt, primary_address) -> None:
        self.replication_service.connect_to_primary(
            index_name, rt, primary_address,
            self.config.host_name, self.replication_port or 0,
        )

    def start(self, port: Optional[int] = None) -> int:
        self.server = grpc.server(
            futures.ThreadPoolExecutor(
                max_workers=self.config.thread_pools.grpc_threads
            ),
            options=[
                ("grpc.max_send_message_length", 1024 * 1024 * 1024),
                ("grpc.max_receive_message_length", 1024 * 1024 * 1024),
            ],
        )
        self.server.add_generic_rpc_handlers(
            [make_lucene_service(self.handlers, self.metrics)]
        )
        bind_port = port if port is not None else self.config.port
        self.port = self.server.add_insecure_port(f"[::]:{bind_port}")

        # replication server starts before the main server, like the reference
        # (NrtsearchServer.start:171-196)
        from nrtsearch_tpu.server.replication import make_replication_service

        # raw-chunk compression (reference: LZ4/gzip stub options,
        # NrtsearchServer.java:225-226; python grpc exposes gzip/deflate)
        compression = {
            "gzip": grpc.Compression.Gzip,
            "deflate": grpc.Compression.Deflate,
        }.get(str(self.config.get("compressionType", "")).lower())
        self.replication_server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=4),
            options=[("grpc.max_send_message_length", 1024 * 1024 * 1024)],
            compression=compression,
        )
        self.replication_server.add_generic_rpc_handlers(
            [make_replication_service(self.replication_service)]
        )
        self.replication_port = self.replication_server.add_insecure_port(
            f"[::]:{self.config.replication_port if port is None else 0}"
        )
        self.replication_server.start()

        self.global_state.warm_boot()
        for ingestor in self.plugins.ingestors:
            ingestor.start()
        self.server.start()
        log.info(
            "LuceneServer on %s, ReplicationServer on %s",
            self.port, self.replication_port,
        )
        return self.port

    def stop(self, grace: float = 2.0) -> None:
        for ingestor in self.plugins.ingestors:
            try:
                ingestor.stop()
            except Exception:
                pass
        if self.server is not None:
            self.server.stop(grace)
        if self.replication_server is not None:
            self.replication_server.stop(grace)
        self.global_state.close()

    def wait(self) -> None:
        if self.server is not None:
            self.server.wait_for_termination()


def main(argv: Optional[list[str]] = None) -> None:
    import argparse
    import os

    parser = argparse.ArgumentParser(description="nrtsearch_tpu server")
    parser.add_argument("config", nargs="?", help="YAML config file")
    parser.add_argument("--port", type=int, default=None)
    args = parser.parse_args(argv)

    # honor JAX_PLATFORMS=cpu exactly: TPU plugins may prepend themselves to
    # jax_platforms, and only one process can own the chip anyway
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    logging.basicConfig(level=logging.INFO)
    config = NrtsearchConfig.load(args.config)
    server = NrtsearchServer(config)
    server.start(args.port)
    server.wait()


if __name__ == "__main__":
    main()
