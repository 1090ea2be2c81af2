"""Kill/restart failure scenarios (reference test shape:
ReplicationFailureScenariosTest.java — graceful and non-graceful restarts,
primary incarnation changes, replica re-sync)."""

import json
import shutil
import time

import pytest

from nrtsearch_tpu.client import NrtsearchClient
from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.remote.backend import LocalFileBackend
from nrtsearch_tpu.server.grpc_server import NrtsearchServer
from nrtsearch_tpu.state.backend import LocalStateBackend
from nrtsearch_tpu.state.global_state import GlobalState

FIELDS = [
    pb.Field(name="id", type=pb.FieldType._ID, store=True),
    pb.Field(name="t", type=pb.FieldType.TEXT, search=True, store=True),
]


def mk(tmp_path, name, remote, state=None, index_dir=None):
    config = NrtsearchConfig.from_dict({
        "stateDir": state or str(tmp_path / f"{name}_state"),
        "indexDir": index_dir or str(tmp_path / f"{name}_index"),
        "nodeName": name,
    })
    gs = GlobalState(config, LocalStateBackend(config.state_dir), remote=remote)
    srv = NrtsearchServer(config, gs)
    port = srv.start(0)
    return srv, NrtsearchClient(f"localhost:{port}")


def add(client, *docs):
    reqs = []
    for i, t in docs:
        r = pb.AddDocumentRequest(indexName="idx")
        r.fields["id"].value.append(i)
        r.fields["t"].value.append(t)
        reqs.append(r)
    client.add_documents(reqs)
    client.refresh("idx")


def wait_docs(client, n, timeout=6.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if client.stats("idx").numDocs == n:
            return True
        time.sleep(0.05)
    return client.stats("idx").numDocs == n


def test_replica_graceful_restart_resyncs(tmp_path):
    remote = LocalFileBackend(tmp_path / "remote")
    shared = str(tmp_path / "shared_state")
    p, pc = mk(tmp_path, "p", remote, state=shared)
    pc.create_index("idx")
    pc.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    pc.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.PRIMARY,
                                        primaryGen=1))
    add(pc, ("1", "first doc"), ("2", "second doc"))
    pc.commit("idx")

    r, rc = mk(tmp_path, "r", remote, state=shared)
    rc.start_index(pb.StartIndexRequest(
        indexName="idx", mode=pb.Mode.REPLICA,
        primaryAddress=f"localhost:{p.replication_port}"))
    assert wait_docs(rc, 2)
    rc.close()
    r.stop()

    # graceful restart: same dirs; warm boot auto-starts REPLICA and resyncs
    add(pc, ("3", "third doc while replica down"))
    r2, rc2 = mk(tmp_path, "r", remote, state=shared,
                 index_dir=str(tmp_path / "r_index"))
    try:
        assert wait_docs(rc2, 3)  # isolated-replica polling catches up
    finally:
        rc2.close()
        r2.stop()
        pc.close()
        p.stop()


def test_replica_non_graceful_restart_full_redownload(tmp_path):
    remote = LocalFileBackend(tmp_path / "remote")
    shared = str(tmp_path / "shared_state")
    p, pc = mk(tmp_path, "p", remote, state=shared)
    pc.create_index("idx")
    pc.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    pc.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.PRIMARY,
                                        primaryGen=1))
    add(pc, ("1", "alpha"), ("2", "beta"), ("3", "gamma"))

    r, rc = mk(tmp_path, "r", remote, state=shared)
    rc.start_index(pb.StartIndexRequest(
        indexName="idx", mode=pb.Mode.REPLICA,
        primaryAddress=f"localhost:{p.replication_port}"))
    assert wait_docs(rc, 3)
    rc.close()
    r.stop()

    # non-graceful: wipe the replica's index dir entirely (restart(true))
    shutil.rmtree(tmp_path / "r_index", ignore_errors=True)
    r2, rc2 = mk(tmp_path, "r", remote, state=shared,
                 index_dir=str(tmp_path / "r_index"))
    try:
        assert wait_docs(rc2, 3)  # full re-download from the object store
        req = pb.SearchRequest(indexName="idx", topHits=10, retrieveFields=["id"])
        req.query.matchQuery.field = "t"
        req.query.matchQuery.query = "beta"
        assert rc2.search(req).totalHits.value == 1
    finally:
        rc2.close()
        r2.stop()
        pc.close()
        p.stop()


def test_primary_id_changes_across_incarnations(tmp_path):
    remote = LocalFileBackend(tmp_path / "remote")
    shared = str(tmp_path / "shared_state")
    p, pc = mk(tmp_path, "p", remote, state=shared)
    pc.create_index("idx")
    pc.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    pc.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.PRIMARY,
                                        primaryGen=1))
    add(pc, ("1", "one"))
    id1 = pc.commit("idx").primaryId
    pc.close()
    p.stop()

    p2, pc2 = mk(tmp_path, "p2", remote, state=shared)
    # node-local started file belongs to node "p"; start explicitly with
    # restore (reference: RestoreIndex on new-primary startIndex)
    start = pb.StartIndexRequest(indexName="idx", mode=pb.Mode.PRIMARY,
                                 primaryGen=2)
    start.restore.serviceName = "nrtsearch-tpu"
    pc2.start_index(start)
    try:
        assert wait_docs(pc2, 1)  # restored from remote on warm start
        id2 = pc2.commit("idx").primaryId
        assert id1 != id2  # ephemeral primaryId detects the new incarnation
    finally:
        pc2.close()
        p2.stop()


def test_replica_rejects_wrong_index_id(tmp_path):
    import grpc

    from nrtsearch_tpu.server.replication import ReplicationClient

    remote = LocalFileBackend(tmp_path / "remote")
    shared = str(tmp_path / "shared_state")
    p, pc = mk(tmp_path, "p", remote, state=shared)
    pc.create_index("idx")
    pc.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    pc.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.PRIMARY))
    rc = ReplicationClient(f"localhost:{p.replication_port}")
    try:
        with pytest.raises(grpc.RpcError) as e:
            rc.add_replicas("idx", "totally-wrong-id", "localhost", 1)
        assert e.value.code() == grpc.StatusCode.FAILED_PRECONDITION
    finally:
        rc.close()
        pc.close()
        p.stop()


def test_primary_restarts_behind_replica(tmp_path):
    """Primary failover (reference: PrimaryRestartTests): the primary dies
    non-gracefully, abandoning its local index dir; a NEW incarnation
    (bumped primaryGen, fresh ephemeral id) restores from the object store —
    which has every published point, since refresh enqueues the upload like
    the reference's NrtDataManager — and the replica re-syncs to the new
    incarnation with indexing converging on both sides."""
    remote = LocalFileBackend(tmp_path / "remote")
    shared = str(tmp_path / "shared_state")
    p, pc = mk(tmp_path, "p", remote, state=shared)
    pc.create_index("idx")
    pc.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    pc.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.PRIMARY,
                                        primaryGen=1))
    add(pc, ("1", "alpha"), ("2", "beta"))
    pc.commit("idx")          # durable: docs 1-2

    r, rc = mk(tmp_path, "r", remote, state=shared)
    rc.start_index(pb.StartIndexRequest(
        indexName="idx", mode=pb.Mode.REPLICA,
        primaryAddress=f"localhost:{p.replication_port}"))
    assert wait_docs(rc, 2)

    # a further point, published but never explicitly committed (refresh
    # uploads it to the object store, matching NrtDataManager semantics)
    add(pc, ("3", "gamma uncommitted"))
    assert wait_docs(rc, 3)

    # primary dies non-gracefully: its index dir is abandoned entirely;
    # only the remote store survives
    pc.close()
    p.stop()

    # new incarnation (fresh node dir) restores the last durable commit
    p2, pc2 = mk(tmp_path, "p2", remote, state=shared)
    start = pb.StartIndexRequest(indexName="idx", mode=pb.Mode.PRIMARY,
                                 primaryGen=2)
    start.restore.serviceName = "nrtsearch-tpu"
    pc2.start_index(start)
    assert wait_docs(pc2, 3)  # refresh-published points are durable

    # re-point the replica at the new incarnation; indexing must converge
    rc.stop_index("idx")
    rc.start_index(pb.StartIndexRequest(
        indexName="idx", mode=pb.Mode.REPLICA,
        primaryAddress=f"localhost:{p2.replication_port}"))
    add(pc2, ("4", "delta after failover"))
    try:
        assert wait_docs(rc, 4, timeout=10.0)
        req = pb.SearchRequest(indexName="idx", topHits=10, retrieveFields=["id"])
        req.query.matchQuery.field = "t"
        req.query.matchQuery.query = "delta"
        assert rc.search(req).totalHits.value == 1
        req.query.matchQuery.query = "gamma"
        assert rc.search(req).totalHits.value == 1
    finally:
        rc.close()
        r.stop()
        pc2.close()
        p2.stop()
