"""Python client for the LuceneServer service.

Reference: clientlib (Java client stubs) + tools/cli. Built on grpc generic
multicallables since the grpc codegen plugin is unavailable; method signatures
mirror the RPC names.
"""

from __future__ import annotations

from typing import Iterable, Optional

import grpc

from nrtsearch_tpu.gen import pb

_SERVICE = "luceneserver.LuceneServer"


class NrtsearchClient:
    def __init__(self, target: str = "localhost:8000",
                 channel: Optional[grpc.Channel] = None):
        self.channel = channel or grpc.insecure_channel(
            target,
            options=[
                ("grpc.max_send_message_length", 1024 * 1024 * 1024),
                ("grpc.max_receive_message_length", 1024 * 1024 * 1024),
            ],
        )
        self._unary = {}
        self._stream = {}

    def close(self) -> None:
        self.channel.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _u(self, name: str, req_t, resp_t):
        if name not in self._unary:
            self._unary[name] = self.channel.unary_unary(
                f"/{_SERVICE}/{name}",
                request_serializer=req_t.SerializeToString,
                response_deserializer=resp_t.FromString,
            )
        return self._unary[name]

    def _s(self, name: str, req_t, resp_t):
        if name not in self._stream:
            self._stream[name] = self.channel.stream_unary(
                f"/{_SERVICE}/{name}",
                request_serializer=req_t.SerializeToString,
                response_deserializer=resp_t.FromString,
            )
        return self._stream[name]

    # -- API -----------------------------------------------------------------

    def create_index(self, index_name: str) -> pb.CreateIndexResponse:
        return self._u("createIndex", pb.CreateIndexRequest, pb.CreateIndexResponse)(
            pb.CreateIndexRequest(indexName=index_name)
        )

    def delete_index(self, index_name: str) -> pb.DeleteIndexResponse:
        return self._u("deleteIndex", pb.DeleteIndexRequest, pb.DeleteIndexResponse)(
            pb.DeleteIndexRequest(indexName=index_name)
        )

    def register_fields(self, request: pb.FieldDefRequest) -> pb.FieldDefResponse:
        return self._u("registerFields", pb.FieldDefRequest, pb.FieldDefResponse)(request)

    def start_index(self, request: pb.StartIndexRequest) -> pb.StartIndexResponse:
        return self._u("startIndex", pb.StartIndexRequest, pb.StartIndexResponse)(request)

    def stop_index(self, index_name: str) -> pb.DummyResponse:
        return self._u("stopIndex", pb.StopIndexRequest, pb.DummyResponse)(
            pb.StopIndexRequest(indexName=index_name)
        )

    def add_documents(
        self, requests: Iterable[pb.AddDocumentRequest]
    ) -> pb.AddDocumentResponse:
        return self._s("addDocuments", pb.AddDocumentRequest, pb.AddDocumentResponse)(
            iter(requests)
        )

    def refresh(self, index_name: str) -> pb.RefreshResponse:
        return self._u("refresh", pb.RefreshRequest, pb.RefreshResponse)(
            pb.RefreshRequest(indexName=index_name)
        )

    def commit(self, index_name: str) -> pb.CommitResponse:
        return self._u("commit", pb.CommitRequest, pb.CommitResponse)(
            pb.CommitRequest(indexName=index_name)
        )

    def search(self, request: pb.SearchRequest) -> pb.SearchResponse:
        return self._u("search", pb.SearchRequest, pb.SearchResponse)(request)

    def search_v2(self, request: pb.SearchRequest) -> pb.SearchResponse:
        """searchV2: response arrives packed as protobuf Any; unpacked here."""
        from google.protobuf import any_pb2

        any_resp = self._u("searchV2", pb.SearchRequest, any_pb2.Any)(request)
        out = pb.SearchResponse()
        any_resp.Unpack(out)
        return out

    def update_fields(self, request: pb.FieldDefRequest) -> pb.FieldDefResponse:
        return self._u("updateFields", pb.FieldDefRequest, pb.FieldDefResponse)(request)

    def live_settings(self, request: pb.LiveSettingsRequest) -> pb.LiveSettingsResponse:
        return self._u(
            "liveSettings", pb.LiveSettingsRequest, pb.LiveSettingsResponse
        )(request)

    def settings(self, request: pb.SettingsRequest) -> pb.SettingsResponse:
        return self._u("settings", pb.SettingsRequest, pb.SettingsResponse)(request)

    def start_index_v2(self, index_name: str) -> pb.StartIndexResponse:
        return self._u("startIndexV2", pb.StartIndexV2Request, pb.StartIndexResponse)(
            pb.StartIndexV2Request(indexName=index_name)
        )

    def reload_state(self) -> pb.ReloadStateResponse:
        return self._u("reloadState", pb.ReloadStateRequest, pb.ReloadStateResponse)(
            pb.ReloadStateRequest()
        )

    def node_info(self) -> pb.NodeInfoResponse:
        return self._u("nodeInfo", pb.NodeInfoRequest, pb.NodeInfoResponse)(
            pb.NodeInfoRequest()
        )

    def global_state(self) -> pb.GlobalStateResponse:
        return self._u("globalState", pb.GlobalStateRequest, pb.GlobalStateResponse)(
            pb.GlobalStateRequest()
        )

    def state(self, index_name: str) -> pb.StateResponse:
        return self._u("state", pb.StateRequest, pb.StateResponse)(
            pb.StateRequest(indexName=index_name)
        )

    def index_state(self, index_name: str) -> pb.IndexStateResponse:
        return self._u("indexState", pb.IndexStateRequest, pb.IndexStateResponse)(
            pb.IndexStateRequest(index_name=index_name)
        )

    def force_merge_deletes(
        self, index_name: str, do_wait: bool = True
    ) -> pb.ForceMergeDeletesResponse:
        return self._u(
            "forceMergeDeletes", pb.ForceMergeDeletesRequest,
            pb.ForceMergeDeletesResponse,
        )(pb.ForceMergeDeletesRequest(indexName=index_name, doWait=do_wait))

    def delete_by_query(self, request: pb.DeleteByQueryRequest) -> pb.AddDocumentResponse:
        return self._u("deleteByQuery", pb.DeleteByQueryRequest, pb.AddDocumentResponse)(
            request
        )

    def delete_all(self, index_name: str) -> pb.DeleteAllDocumentsResponse:
        return self._u(
            "deleteAll", pb.DeleteAllDocumentsRequest, pb.DeleteAllDocumentsResponse
        )(pb.DeleteAllDocumentsRequest(indexName=index_name))

    def delete(self, request: pb.AddDocumentRequest) -> pb.AddDocumentResponse:
        return self._u("delete", pb.AddDocumentRequest, pb.AddDocumentResponse)(request)

    def stats(self, index_name: str) -> pb.StatsResponse:
        return self._u("stats", pb.StatsRequest, pb.StatsResponse)(
            pb.StatsRequest(indexName=index_name)
        )

    def indices(self) -> pb.IndicesResponse:
        return self._u("indices", pb.IndicesRequest, pb.IndicesResponse)(
            pb.IndicesRequest()
        )

    def status(self) -> pb.HealthCheckResponse:
        return self._u("status", pb.HealthCheckRequest, pb.HealthCheckResponse)(
            pb.HealthCheckRequest(check=True)
        )

    def ready(self, index_names: str = "") -> pb.HealthCheckResponse:
        return self._u("ready", pb.ReadyCheckRequest, pb.HealthCheckResponse)(
            pb.ReadyCheckRequest(indexNames=index_names)
        )

    def force_merge(self, index_name: str, max_segments: int = 1) -> pb.ForceMergeResponse:
        return self._u("forceMerge", pb.ForceMergeRequest, pb.ForceMergeResponse)(
            pb.ForceMergeRequest(indexName=index_name, maxNumSegments=max_segments)
        )

    def live_settings_v2(self, request: pb.LiveSettingsV2Request) -> pb.LiveSettingsV2Response:
        return self._u(
            "liveSettingsV2", pb.LiveSettingsV2Request, pb.LiveSettingsV2Response
        )(request)

    def settings_v2(self, request: pb.SettingsV2Request) -> pb.SettingsV2Response:
        return self._u("settingsV2", pb.SettingsV2Request, pb.SettingsV2Response)(request)

    def metrics(self) -> "pb.HttpBody":
        return self._u("metrics", pb.Empty, pb.HttpBody)(pb.Empty())

    def custom(self, request: pb.CustomRequest) -> pb.CustomResponse:
        return self._u("custom", pb.CustomRequest, pb.CustomResponse)(request)

    def create_snapshot(self, index_name: str) -> pb.CreateSnapshotResponse:
        return self._u(
            "createSnapshot", pb.CreateSnapshotRequest, pb.CreateSnapshotResponse
        )(pb.CreateSnapshotRequest(indexName=index_name))

    def release_snapshot(self, index_name: str, index_gen: int) -> pb.ReleaseSnapshotResponse:
        req = pb.ReleaseSnapshotRequest(indexName=index_name)
        req.snapshotId.indexGen = index_gen
        return self._u(
            "releaseSnapshot", pb.ReleaseSnapshotRequest, pb.ReleaseSnapshotResponse
        )(req)

    def get_all_snapshot_gens(self, index_name: str) -> pb.GetAllSnapshotGenResponse:
        return self._u(
            "getAllSnapshotIndexGen", pb.GetAllSnapshotGenRequest,
            pb.GetAllSnapshotGenResponse,
        )(pb.GetAllSnapshotGenRequest(indexName=index_name))

    def backup_warming_queries(self, index_name: str) -> pb.BackupWarmingQueriesResponse:
        return self._u(
            "backupWarmingQueries", pb.BackupWarmingQueriesRequest,
            pb.BackupWarmingQueriesResponse,
        )(pb.BackupWarmingQueriesRequest(index=index_name))
