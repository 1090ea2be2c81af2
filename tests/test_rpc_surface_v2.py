"""The 12 round-2 RPCs driven over real gRPC (reference parity:
luceneserver.proto:27-404 — updateFields, settings/liveSettings V1,
startIndexV2, reloadState, searchV2, nodeInfo, globalState, state,
indexState, forceMergeDeletes, sendRawFile)."""

import json

import pytest

from nrtsearch_tpu.client import NrtsearchClient
from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.grpc_server import NrtsearchServer


@pytest.fixture()
def server(tmp_path):
    config = NrtsearchConfig.from_dict({
        "stateDir": str(tmp_path / "state"),
        "indexDir": str(tmp_path / "index"),
        "indexStartConfig": {"mode": "STANDALONE"},
    })
    srv = NrtsearchServer(config)
    port = srv.start(0)
    client = NrtsearchClient(f"localhost:{port}")
    yield srv, client, config
    client.close()
    srv.stop()


FIELDS = [
    pb.Field(name="doc_id", type=pb.FieldType._ID, store=True, storeDocValues=True),
    pb.Field(name="body", type=pb.FieldType.TEXT, search=True, store=True),
]


def _add(client, name, doc_id, body, extra=None):
    req = pb.AddDocumentRequest(indexName=name)
    req.fields["doc_id"].value.append(doc_id)
    req.fields["body"].value.append(body)
    for k, v in (extra or {}).items():
        req.fields[k].value.append(v)
    client.add_documents(iter([req]))


def test_v1_settings_and_live_settings(server):
    _, client, _ = server
    client.create_index("idx")
    client.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    # V1 settings on a stopped index
    resp = client.settings(pb.SettingsRequest(
        indexName="idx", concurrentMergeSchedulerMaxThreadCount=4))
    assert json.loads(resp.response)["concurrentMergeSchedulerMaxThreadCount"] == 4
    client.start_index(pb.StartIndexRequest(indexName="idx"))
    # V1 live settings on a running index; zero fields stay unchanged
    resp = client.live_settings(pb.LiveSettingsRequest(
        indexName="idx", maxRefreshSec=7.5, defaultTerminateAfter=100))
    ls = json.loads(resp.response)
    assert ls["maxRefreshSec"] == 7.5
    assert ls["defaultTerminateAfter"] == 100
    # settings on a RUNNING index must fail
    import grpc

    with pytest.raises(grpc.RpcError):
        client.settings(pb.SettingsRequest(indexName="idx", directory="MMap"))


def test_update_fields_schema_evolution(server):
    _, client, _ = server
    client.create_index("idx")
    client.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    client.start_index(pb.StartIndexRequest(indexName="idx"))
    _add(client, "idx", "1", "original doc")
    client.refresh("idx")

    # add a new field to the live index, then index + search against it
    client.update_fields(pb.FieldDefRequest(indexName="idx", field=[
        pb.Field(name="tag", type=pb.FieldType.ATOM, search=True, store=True),
    ]))
    _add(client, "idx", "2", "tagged doc", {"tag": "hot"})
    client.refresh("idx")
    req = pb.SearchRequest(indexName="idx", topHits=5)
    req.retrieveFields.append("doc_id")
    req.query.termQuery.field = "tag"
    req.query.termQuery.textValue = "hot"
    r = client.search(req)
    assert r.totalHits.value == 1
    assert r.hits[0].fields["doc_id"].fieldValue[0].textValue == "2"
    # old docs still searchable
    req2 = pb.SearchRequest(indexName="idx", topHits=5)
    req2.query.matchQuery.field = "body"
    req2.query.matchQuery.query = "original"
    assert client.search(req2).totalHits.value == 1

    # redefining an existing field is an error
    import grpc

    with pytest.raises(grpc.RpcError):
        client.update_fields(pb.FieldDefRequest(indexName="idx", field=[
            pb.Field(name="body", type=pb.FieldType.ATOM),
        ]))


def test_start_index_v2_uses_config(server):
    _, client, _ = server
    client.create_index("idx")
    client.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    resp = client.start_index_v2("idx")
    assert resp.numDocs == 0
    _add(client, "idx", "1", "hello world")
    client.refresh("idx")
    assert client.stats("idx").numDocs == 1


def test_search_v2_any_packing(server):
    _, client, _ = server
    client.create_index("idx")
    client.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    client.start_index(pb.StartIndexRequest(indexName="idx"))
    _add(client, "idx", "1", "alpha beta gamma")
    client.refresh("idx")
    req = pb.SearchRequest(indexName="idx", topHits=5)
    req.query.matchQuery.field = "body"
    req.query.matchQuery.query = "beta"
    r = client.search_v2(req)
    assert r.totalHits.value == 1


def test_state_introspection_rpcs(server):
    srv, client, config = server
    client.create_index("idx")
    client.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    client.start_index(pb.StartIndexRequest(indexName="idx"))

    info = client.node_info()
    assert info.node_name == config.node_name
    assert info.version
    assert len(info.ephemeral_id) == 32

    gstate = client.global_state()
    assert "idx" in gstate.global_state.indices
    assert gstate.global_state.indices["idx"].started

    st = client.state("idx")
    parsed = json.loads(st.response)
    assert parsed["indexName"] == "idx"

    ist = client.index_state("idx")
    assert ist.index_state.indexName == "idx"
    assert "doc_id" in dict(ist.index_state.fields)

    client.reload_state()  # must not disturb the running index
    assert client.stats("idx").numDocs == 0


def test_force_merge_deletes(server):
    _, client, _ = server
    client.create_index("idx")
    client.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    client.start_index(pb.StartIndexRequest(indexName="idx"))
    for i in range(6):
        _add(client, "idx", str(i), f"doc number {i}")
    client.refresh("idx")
    # delete two docs -> segment has deletes
    req = pb.AddDocumentRequest(indexName="idx")
    req.fields["doc_id"].value.append("0")
    client.delete(req)
    req = pb.AddDocumentRequest(indexName="idx")
    req.fields["doc_id"].value.append("1")
    client.delete(req)
    client.refresh("idx")
    stats = client.stats("idx")
    assert stats.numDocs == 4
    resp = client.force_merge_deletes("idx", do_wait=True)
    assert resp.status == pb.ForceMergeDeletesResponse.Status.FORCE_MERGE_DELETES_COMPLETED
    stats = client.stats("idx")
    assert stats.numDocs == 4
    assert stats.maxDoc == 4  # deletes physically expunged


def test_send_raw_file(server, tmp_path):
    srv, client, _ = server
    client.create_index("idx")
    client.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    client.start_index(pb.StartIndexRequest(indexName="idx"))

    from nrtsearch_tpu.server.replication import ReplicationClient

    payload = b"x" * 300_000 + b"tail"
    src = tmp_path / "payload.bin"
    src.write_bytes(payload)
    rc = ReplicationClient(f"localhost:{srv.replication_port}")
    try:
        status = rc.send_raw_file("idx", "pushed.bin", src)
        assert status.Code == pb.TransferStatusCode.Done
        rt = srv.global_state.get_runtime("idx")
        assert (rt.index_dir / "pushed.bin").read_bytes() == payload
    finally:
        rc.close()
