"""Push-model NRT replication over real gRPC: primary + replica servers in one
process (reference fixture shape: GrpcServer.java multi-node in one JVM).
Replica registers via addReplicas; primary pushes newNRTPoint on refresh;
replica copies files via recvCopyState/recvRawFile and swaps its searcher."""

import time

import pytest

from nrtsearch_tpu.client import NrtsearchClient
from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.grpc_server import NrtsearchServer
from nrtsearch_tpu.server.replication import ReplicationClient

FIELDS = [
    pb.Field(name="doc_id", type=pb.FieldType._ID, store=True),
    pb.Field(name="body", type=pb.FieldType.TEXT, search=True, store=True),
]


def _doc(index, doc_id, body):
    r = pb.AddDocumentRequest(indexName=index)
    r.fields["doc_id"].value.append(doc_id)
    r.fields["body"].value.append(body)
    return r


@pytest.fixture()
def cluster(tmp_path):
    # shared state dir = the reference's shared remote state backend
    state = str(tmp_path / "state")
    primary = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": state, "indexDir": str(tmp_path / "p_index"), "nodeName": "primary"}
    ))
    p_port = primary.start(0)
    p_client = NrtsearchClient(f"localhost:{p_port}")

    p_client.create_index("idx")
    p_client.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    p_client.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.PRIMARY,
                                              primaryGen=1))

    replica = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": state, "indexDir": str(tmp_path / "r_index"), "nodeName": "replica"}
    ))
    r_port = replica.start(0)
    r_client = NrtsearchClient(f"localhost:{r_port}")
    r_client.start_index(pb.StartIndexRequest(
        indexName="idx", mode=pb.Mode.REPLICA,
        primaryAddress=f"localhost:{primary.replication_port}",
    ))
    yield primary, p_client, replica, r_client
    p_client.close()
    r_client.close()
    primary.stop()
    replica.stop()


def _wait_docs(client, n, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if client.stats("idx").numDocs == n:
            return True
        time.sleep(0.05)
    return False


def test_push_replication_end_to_end(cluster):
    primary, p_client, replica, r_client = cluster

    p_client.add_documents([
        _doc("idx", "1", "tpu segment replication works"),
        _doc("idx", "2", "replicas never index documents"),
    ])
    p_client.refresh("idx")  # publishes point + pushes newNRTPoint

    assert _wait_docs(r_client, 2)
    req = pb.SearchRequest(indexName="idx", topHits=10, retrieveFields=["doc_id"])
    req.query.matchQuery.field = "body"
    req.query.matchQuery.query = "replication"
    resp = r_client.search(req)
    assert resp.totalHits.value == 1
    assert resp.hits[0].fields["doc_id"].fieldValue[0].textValue == "1"

    # incremental point
    p_client.add_documents([_doc("idx", "3", "another fresh document")])
    p_client.refresh("idx")
    assert _wait_docs(r_client, 3)

    # delete ships as a del-gen live file
    d = pb.AddDocumentRequest(indexName="idx")
    d.fields["doc_id"].value.append("2")
    p_client.delete(d)
    p_client.refresh("idx")
    assert _wait_docs(r_client, 2)

    # replica rejects writes
    import grpc

    with pytest.raises(grpc.RpcError) as e:
        r_client.add_documents([_doc("idx", "9", "nope")])
    assert e.value.code() == grpc.StatusCode.FAILED_PRECONDITION


def test_replication_service_rpcs(cluster):
    primary, p_client, replica, r_client = cluster
    p_client.add_documents([_doc("idx", "1", "hello world")])

    rc = ReplicationClient(f"localhost:{primary.replication_port}")
    try:
        # writeNRTPoint forces a refresh on the primary
        v = rc.write_nrt_point("idx")
        assert v.didRefresh
        state = rc.recv_copy_state("idx")
        assert state.version == v.version
        files = [fm.fileName for fm in state.filesMetadata.fileMetadata]
        assert len(files) >= 3  # arrays + meta + live per segment
        assert state.filesMetadata.numFiles == len(files)

        # getNodesInfo lists the registered replica
        nodes = rc.get_nodes_info("idx")
        assert len(nodes.nodes) == 1

        # raw file streaming
        chunks = list(rc.recv_raw_file("idx", files[0]))
        assert sum(len(c.content) for c in chunks) > 0
    finally:
        rc.close()

    # replica searching version catches up
    rrc = ReplicationClient(f"localhost:{replica.replication_port}")
    try:
        deadline = time.time() + 5
        while time.time() < deadline:
            rv = rrc.replica_current_searching_version("idx")
            if rv.version >= v.version:
                break
            time.sleep(0.05)
        assert rv.version >= v.version
    finally:
        rrc.close()


def test_dead_replica_pruned(cluster):
    primary, p_client, replica, r_client = cluster
    # kill the replica's replication server; the next publish must prune it
    replica.replication_server.stop(0)
    time.sleep(0.2)
    p_client.add_documents([_doc("idx", "1", "doc after replica death")])
    p_client.refresh("idx")
    svc = primary.replication_service
    deadline = time.time() + 5
    while time.time() < deadline and svc.replicas.get("idx"):
        p_client.add_documents([_doc("idx", "2", "more")])
        p_client.refresh("idx")
        time.sleep(0.1)
    assert not svc.replicas.get("idx")


@pytest.fixture()
def acked_cluster(tmp_path):
    # same cluster shape with acked (flow-controlled) file copy enabled and a
    # tiny chunk window to force ack round-trips
    state = str(tmp_path / "state")
    primary = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": state, "indexDir": str(tmp_path / "p_index"),
         "nodeName": "primary",
         "FileCopyConfig": {"ackedCopy": True, "ackEvery": 2, "maxInFlight": 4}}
    ))
    p_port = primary.start(0)
    p_client = NrtsearchClient(f"localhost:{p_port}")
    p_client.create_index("idx")
    p_client.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    p_client.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.PRIMARY,
                                              primaryGen=1))
    replica = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": state, "indexDir": str(tmp_path / "r_index"),
         "nodeName": "replica",
         "FileCopyConfig": {"ackedCopy": True, "ackEvery": 2, "maxInFlight": 4}}
    ))
    r_port = replica.start(0)
    r_client = NrtsearchClient(f"localhost:{r_port}")
    r_client.start_index(pb.StartIndexRequest(
        indexName="idx", mode=pb.Mode.REPLICA,
        primaryAddress=f"localhost:{primary.replication_port}",
    ))
    yield primary, p_client, replica, r_client
    p_client.close()
    r_client.close()
    primary.stop()
    replica.stop()


def test_acked_copy_replication(acked_cluster):
    primary, p_client, replica, r_client = acked_cluster
    p_client.add_documents(
        [_doc("idx", str(i), f"acked copy doc {i} " + "pad " * 50)
         for i in range(50)]
    )
    p_client.refresh("idx")
    assert _wait_docs(r_client, 50)
    req = pb.SearchRequest(indexName="idx", topHits=10, retrieveFields=["doc_id"])
    req.query.matchQuery.field = "body"
    req.query.matchQuery.query = "acked"
    assert r_client.search(req).totalHits.value == 50


def test_merge_precopy_warms_replicas(cluster):
    primary, p_client, replica, r_client = cluster
    p_rt = primary.handlers.gs.get_runtime("idx")
    p_rt.writer.segments_per_tier = 2
    # several refreshes force tiered merges -> "_m." files in later points
    for i in range(5):
        p_client.add_documents([_doc("idx", str(i), f"warm doc {i}")])
        p_client.refresh("idx")
    assert _wait_docs(r_client, 5)
    svc = primary.replication_service
    warmed = svc._warmed_files.get("idx", set())
    assert any("_m." in f for f in warmed)  # merged files were pre-copied
    # warmed merged files really exist on the replica
    r_rt = replica.handlers.gs.get_runtime("idx")
    from pathlib import Path
    for f in warmed:
        assert (Path(r_rt.index_dir) / f).exists(), f


def test_acked_copy_window_engages(acked_cluster, monkeypatch):
    # shrink chunks so the file spans many chunks and the in-flight window
    # (maxInFlight=4, ackEvery=2) actually throttles the sender
    import nrtsearch_tpu.server.replication as repl

    monkeypatch.setattr(repl, "CHUNK_SIZE", 1024)
    primary, p_client, replica, r_client = acked_cluster
    body = "window " * 400  # ~2.8KB per doc
    p_client.add_documents(
        [_doc("idx", str(i), f"{body} doc {i}") for i in range(60)]
    )
    p_client.refresh("idx")  # segment files span >> maxInFlight chunks
    assert _wait_docs(r_client, 60, timeout=15.0)
    req = pb.SearchRequest(indexName="idx", topHits=5)
    req.query.matchQuery.field = "body"
    req.query.matchQuery.query = "window"
    assert r_client.search(req).totalHits.value == 60


def test_copy_bandwidth_pacing(tmp_path):
    # maxCopyMBPerSec paces the outbound stream: a ~0.5MB copy at 1 MB/s
    # must take >= ~0.3s (conservative vs the 0.5s theoretical floor)
    state = str(tmp_path / "state")
    primary = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": state, "indexDir": str(tmp_path / "p"), "nodeName": "primary",
         "FileCopyConfig": {"maxCopyMBPerSec": 1.0, "maxConcurrentCopies": 2}}
    ))
    p_port = primary.start(0)
    p_client = NrtsearchClient(f"localhost:{p_port}")
    p_client.create_index("idx")
    p_client.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    p_client.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.PRIMARY,
                                              primaryGen=1))
    replica = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": state, "indexDir": str(tmp_path / "r"), "nodeName": "replica"}
    ))
    r_port = replica.start(0)
    r_client = NrtsearchClient(f"localhost:{r_port}")
    r_client.start_index(pb.StartIndexRequest(
        indexName="idx", mode=pb.Mode.REPLICA,
        primaryAddress=f"localhost:{primary.replication_port}",
    ))
    try:
        body = "bandwidth " * 120  # ~1.2KB/doc
        t0 = time.time()
        p_client.add_documents(
            [_doc("idx", str(i), f"{body} {i}") for i in range(400)]
        )
        p_client.refresh("idx")
        assert _wait_docs(r_client, 400, timeout=30.0)
        elapsed = time.time() - t0
        assert elapsed >= 0.3, f"copy not paced: {elapsed:.2f}s"
    finally:
        p_client.close()
        r_client.close()
        primary.stop()
        replica.stop()


def test_compressed_replication(tmp_path):
    # compressionType: gzip on both ends (reference: LZ4/gzip stub options)
    state = str(tmp_path / "state")
    cfg = {"compressionType": "gzip"}
    primary = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": state, "indexDir": str(tmp_path / "p"),
         "nodeName": "primary", **cfg}
    ))
    p_port = primary.start(0)
    p_client = NrtsearchClient(f"localhost:{p_port}")
    p_client.create_index("idx")
    p_client.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    p_client.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.PRIMARY,
                                              primaryGen=1))
    replica = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": state, "indexDir": str(tmp_path / "r"),
         "nodeName": "replica", **cfg}
    ))
    r_port = replica.start(0)
    r_client = NrtsearchClient(f"localhost:{r_port}")
    r_client.start_index(pb.StartIndexRequest(
        indexName="idx", mode=pb.Mode.REPLICA,
        primaryAddress=f"localhost:{primary.replication_port}",
    ))
    try:
        p_client.add_documents(
            [_doc("idx", str(i), "compressed " * 30) for i in range(40)]
        )
        p_client.refresh("idx")
        assert _wait_docs(r_client, 40, timeout=15.0)
    finally:
        p_client.close()
        r_client.close()
        primary.stop()
        replica.stop()
