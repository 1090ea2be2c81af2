"""RemoteBackend contract suite: the SAME assertions run against the local
filesystem double and the real S3 client (against the in-process fake S3 —
the reference's S3Mock pattern, AmazonS3Provider.java:92). Plus an
isolated-replica NRT replication scenario over the S3 backend."""

import pytest

from nrtsearch_tpu.remote.backend import LocalFileBackend
from nrtsearch_tpu.remote.fake_s3 import FakeS3Server
from nrtsearch_tpu.remote.s3 import S3Backend
from nrtsearch_tpu.remote.s3_client import S3Client


@pytest.fixture(scope="module")
def fake_s3():
    server = FakeS3Server()
    endpoint = server.start()
    yield endpoint
    server.stop()


@pytest.fixture(params=["local", "s3"])
def backend(request, tmp_path, fake_s3):
    if request.param == "local":
        return LocalFileBackend(tmp_path / "remote")
    return S3Backend(S3Client(
        bucket="test-bucket", endpoint=fake_s3,
        access_key="k", secret_key="s",
    ))


def test_versioned_blob_roundtrip(backend):
    assert backend.current_version("svc", "res") is None
    assert backend.download_current("svc", "res") is None
    v0 = backend.upload_versioned("svc", "res", b"alpha")
    assert v0 == 0
    assert backend.download_current("svc", "res") == b"alpha"
    v1 = backend.upload_versioned("svc", "res", b"beta")
    assert v1 == 1
    assert backend.current_version("svc", "res") == 1
    assert backend.download_current("svc", "res") == b"beta"
    # other resources are independent
    backend.upload_versioned("svc", "other", b"x")
    assert backend.download_current("svc", "res") == b"beta"


def test_index_files_roundtrip(backend, tmp_path):
    src = tmp_path / "src"
    src.mkdir(exist_ok=True)
    (src / "seg.arrays.npz").write_bytes(b"\x00\x01" * 5000)
    (src / "seg.meta").write_bytes(b"meta")
    backend.upload_index_files("svc", "idx-1", src, ["seg.arrays.npz", "seg.meta"])
    assert backend.index_file_exists("svc", "idx-1", "seg.arrays.npz")
    assert not backend.index_file_exists("svc", "idx-1", "missing")
    dst = tmp_path / "dst"
    backend.download_index_files(
        "svc", "idx-1", dst, ["seg.arrays.npz", "seg.meta"]
    )
    assert (dst / "seg.arrays.npz").read_bytes() == b"\x00\x01" * 5000
    assert (dst / "seg.meta").read_bytes() == b"meta"
    backend.delete_index_files("svc", "idx-1", ["seg.meta"])
    assert not backend.index_file_exists("svc", "idx-1", "seg.meta")
    assert backend.index_file_exists("svc", "idx-1", "seg.arrays.npz")


def test_download_missing_file_raises(backend, tmp_path):
    with pytest.raises(FileNotFoundError):
        backend.download_index_files("svc", "idx-1", tmp_path / "d2", ["nope"])


def test_multipart_upload_path(fake_s3, tmp_path, monkeypatch):
    """Files above the multipart threshold upload via initiate/part/complete."""
    import nrtsearch_tpu.remote.s3_client as s3c

    monkeypatch.setattr(s3c, "MULTIPART_THRESHOLD", 1024)
    monkeypatch.setattr(s3c, "PART_SIZE", 512)
    client = S3Client(bucket="mp", endpoint=fake_s3, access_key="k", secret_key="s")
    payload = bytes(range(256)) * 20  # 5120 bytes -> 10 parts
    src = tmp_path / "big.bin"
    src.write_bytes(payload)
    client.put_file("big/key.bin", src)
    assert client.get_object("big/key.bin") == payload


def test_list_objects(fake_s3):
    client = S3Client(bucket="lst", endpoint=fake_s3, access_key="k", secret_key="s")
    client.put_object("a/1", b"1")
    client.put_object("a/2", b"2")
    client.put_object("b/1", b"3")
    assert sorted(client.list_objects("a/")) == ["a/1", "a/2"]
    assert client.list_objects("") == ["a/1", "a/2", "b/1"]


def test_isolated_replica_over_s3(fake_s3, tmp_path):
    """Primary publishes NRT points to S3; an isolated replica (never talks
    to the primary) polls and installs them — the RemoteCopyJobManager flow
    (reference: RemoteCopyJobManager.java:141) against the real S3 client."""
    from nrtsearch_tpu.query.plan import parse_query
    from nrtsearch_tpu.server.index_runtime import IndexRuntime
    from nrtsearch_tpu.state.index_state import IndexStateInfo

    remote = S3Backend(S3Client(
        bucket="nrt", endpoint=fake_s3, access_key="k", secret_key="s",
    ))
    info = IndexStateInfo(index_name="idx", index_id="idx-s3test").with_fields({
        "doc_id": {"type": "_ID", "store": True},
        "body": {"type": "TEXT", "search": True, "store": True},
    })
    primary = IndexRuntime(
        info, tmp_path / "primary", mode="PRIMARY", remote=remote,
        service_name="svc", primary_gen=1,
    )
    primary.start()
    primary.add_documents([
        {"doc_id": "1", "body": "object store replication"},
        {"doc_id": "2", "body": "isolated replicas poll s3"},
    ])
    primary.refresh()

    replica = IndexRuntime(
        info, tmp_path / "replica", mode="REPLICA", remote=remote,
        service_name="svc",
    )
    assert replica.sync_from_remote()
    q = parse_query({"matchQuery": {"field": "body", "query": "replication"}})
    assert replica.searcher.search(q, 10).total_hits == 1

    # incremental point
    primary.add_documents([{"doc_id": "3", "body": "more replication data"}])
    primary.refresh()
    assert replica.sync_from_remote()
    assert replica.searcher.search(q, 10).total_hits == 2
    primary.stop()
    replica.stop()


def test_server_boots_with_s3_backend(fake_s3, tmp_path):
    """Full server configured with bucketName + endpoint: commit uploads to
    S3; a fresh server (new dirs) restores the index from the object store."""
    from nrtsearch_tpu.client import NrtsearchClient
    from nrtsearch_tpu.config import NrtsearchConfig
    from nrtsearch_tpu.gen import pb
    from nrtsearch_tpu.server.grpc_server import NrtsearchServer

    # REMOTE state backend: global + index state live in the object store
    cfg1 = NrtsearchConfig.from_dict({
        "stateDir": str(tmp_path / "s1/state"),
        "indexDir": str(tmp_path / "s1/index"),
        "serviceName": "svc-e2e",
        "bucketName": "e2e-bucket",
        "stateConfig": {"backendType": "REMOTE"},
        "s3": {"endpoint": fake_s3, "accessKey": "k", "secretKey": "s"},
    })
    srv1 = NrtsearchServer(cfg1)
    port1 = srv1.start(0)
    c1 = NrtsearchClient(f"localhost:{port1}")
    try:
        c1.create_index("s3idx")
        c1.register_fields(pb.FieldDefRequest(indexName="s3idx", field=[
            pb.Field(name="doc_id", type=pb.FieldType._ID, store=True),
            pb.Field(name="body", type=pb.FieldType.TEXT, search=True, store=True),
        ]))
        c1.start_index(pb.StartIndexRequest(
            indexName="s3idx", mode=pb.Mode.PRIMARY, primaryGen=1))
        req = pb.AddDocumentRequest(indexName="s3idx")
        req.fields["doc_id"].value.append("1")
        req.fields["body"].value.append("durable search data")
        c1.add_documents(iter([req]))
        c1.refresh("s3idx")
        c1.commit("s3idx")
        index_id = srv1.global_state.get_state("s3idx").index_id
    finally:
        c1.close()
        srv1.stop()

    # brand-new node, empty local dirs, SAME remote state: the schema and
    # index id come from the REMOTE state backend; the data files restore
    # from the object store via startIndex(restore).
    cfg2 = NrtsearchConfig.from_dict({
        "stateDir": str(tmp_path / "s2/state"),
        "indexDir": str(tmp_path / "s2/index"),
        "serviceName": "svc-e2e",
        "bucketName": "e2e-bucket",
        "stateConfig": {"backendType": "REMOTE"},
        "s3": {"endpoint": fake_s3, "accessKey": "k", "secretKey": "s"},
    })
    srv2 = NrtsearchServer(cfg2)
    port2 = srv2.start(0)
    c2 = NrtsearchClient(f"localhost:{port2}")
    try:
        assert srv2.global_state.get_state("s3idx").index_id == index_id
        req = pb.StartIndexRequest(indexName="s3idx", mode=pb.Mode.PRIMARY,
                                   primaryGen=2)
        req.restore.serviceName = "svc-e2e"
        req.restore.resourceName = "s3idx"
        c2.start_index(req)
        sreq = pb.SearchRequest(indexName="s3idx", topHits=5)
        sreq.query.matchQuery.field = "body"
        sreq.query.matchQuery.query = "durable"
        assert c2.search(sreq).totalHits.value == 1
    finally:
        c2.close()
        srv2.stop()
