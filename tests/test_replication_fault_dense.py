"""Replication fault matrix with the dense/fused fast path ACTIVE.

VERDICT r4 #9 named this the thinnest surface: every kill/restart scenario
in test_failure_scenarios.py runs on the CPU default (merge) path, so the
dense-head machinery — eager warm at point install, head-row rebuild after
re-sync, bf16/Dekker score contract — was never exercised across node
faults. Reference shape: ReplicationFailureScenariosTest.java (graceful +
non-graceful restarts, primary incarnation change) combined with the dense
path that serves by default on TPU deployments.

Corpus design: a 'common' term with df >= 256 (the dense head's hard
min_df floor, core/packed_view.py:311) so the head actually builds; rare
per-doc terms exercise the sparse tail through the same fused dispatch.
"""

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

pytestmark = pytest.mark.slow

FIELDS = [
    pb.Field(name="id", type=pb.FieldType._ID, store=True),
    pb.Field(name="t", type=pb.FieldType.TEXT, search=True, store=True),
]

N_COMMON = 300  # > min_df floor of 256 -> 'common' becomes a head row


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


def add_corpus(client, start, n, extra=""):
    reqs = []
    for i in range(start, start + n):
        r = pb.AddDocumentRequest(indexName="idx")
        r.fields["id"].value.append(str(i))
        r.fields["t"].value.append(f"common rare{i} {extra}".strip())
        reqs.append(r)
    client.add_documents(reqs)
    client.refresh("idx")


def wait_docs(client, n, timeout=10.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if client.stats("idx").numDocs == n:
            return True
        time.sleep(0.05)
    return client.stats("idx").numDocs == n


def search_common(client, k=10):
    req = pb.SearchRequest(indexName="idx", topHits=k, retrieveFields=["id"])
    req.query.matchQuery.field = "t"
    req.query.matchQuery.query = "common"
    return client.search(req)


def search_rare(client, term):
    """AND of the head term and a sparse-tail term — the conjunction shape
    (all-head is impossible here: rare terms never reach min_df)."""
    req = pb.SearchRequest(indexName="idx", topHits=5, retrieveFields=["id"])
    req.query.matchQuery.field = "t"
    req.query.matchQuery.query = f"common {term}"
    req.query.matchQuery.operator = pb.MatchOperator.MUST
    return client.search(req)


def paths_agree(client):
    """Drive the same queries through merge and fused on the LIVE server;
    docs and hit counts must agree exactly (Dekker head scores ~f32)."""
    import os

    out = {}
    for path in ("merge", "fused"):
        os.environ["NRT_FAST_PATH"] = path
        try:
            r1 = search_common(client)
            r2 = search_rare(client, "rare1")
            out[path] = (
                r1.totalHits.value,
                tuple(h.luceneDocId for h in r1.hits),
                r2.totalHits.value,
                tuple(h.luceneDocId for h in r2.hits),
            )
        finally:
            os.environ.pop("NRT_FAST_PATH", None)
    assert out["merge"][0] == out["fused"][0], out
    assert out["merge"][1] == out["fused"][1], out
    assert out["merge"][2] == out["fused"][2], out
    assert out["merge"][3] == out["fused"][3], out
    return out["merge"]


def test_replica_resync_with_dense_head(tmp_path, monkeypatch):
    """Replica misses NRT points while down, re-syncs, serves fused."""
    monkeypatch.setenv("NRT_FAST_PATH", "fused")
    remote = LocalFileBackend(tmp_path / "remote")
    shared = str(tmp_path / "shared_state")
    p, pc = mk(tmp_path, "p", remote, state=shared)
    pc.create_index("idx")
    pc.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    pc.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.PRIMARY,
                                        primaryGen=1))
    add_corpus(pc, 0, N_COMMON)
    pc.commit("idx")

    r, rc = mk(tmp_path, "r", remote, state=shared)
    rc.start_index(pb.StartIndexRequest(
        indexName="idx", mode=pb.Mode.REPLICA,
        primaryAddress=f"localhost:{p.replication_port}"))
    assert wait_docs(rc, N_COMMON)
    assert search_common(rc).totalHits.value == N_COMMON
    rc.close()
    r.stop()

    # two more waves while the replica is down (missed points)
    add_corpus(pc, N_COMMON, 40)
    pc.commit("idx")
    add_corpus(pc, N_COMMON + 40, 40)
    pc.commit("idx")

    r2, rc2 = mk(tmp_path, "r", remote, state=shared,
                 index_dir=str(tmp_path / "r_index"))
    try:
        assert wait_docs(rc2, N_COMMON + 80)
        hits = search_common(rc2)
        assert hits.totalHits.value == N_COMMON + 80
        assert search_rare(rc2, f"rare{N_COMMON + 79}").totalHits.value >= 1
        paths_agree(rc2)
    finally:
        rc2.close()
        r2.stop()
        pc.close()
        p.stop()


def test_primary_incarnation_change_dense_serving(tmp_path, monkeypatch):
    """Primary dies; a NEW primary (primaryGen+1) restores from the object
    store; the replica follows the new incarnation; fused results stay
    exact (docs + counts) through the failover."""
    monkeypatch.setenv("NRT_FAST_PATH", "fused")
    remote = LocalFileBackend(tmp_path / "remote")
    shared = str(tmp_path / "shared_state")
    p, pc = mk(tmp_path, "p", remote, state=shared)
    pc.create_index("idx")
    pc.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    pc.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.PRIMARY,
                                        primaryGen=1))
    add_corpus(pc, 0, N_COMMON)
    pc.commit("idx")
    pc.close()
    p.stop()  # primary gone

    # new incarnation restores from remote with a higher primaryGen
    p2, pc2 = mk(tmp_path, "p2", remote, state=shared,
                 index_dir=str(tmp_path / "p2_index"))
    pc2.start_index(pb.StartIndexRequest(
        indexName="idx", mode=pb.Mode.PRIMARY, primaryGen=2,
        restore=pb.RestoreIndex(serviceName="", resourceName="idx")))
    assert wait_docs(pc2, N_COMMON)
    add_corpus(pc2, N_COMMON, 30)
    pc2.commit("idx")

    r, rc = mk(tmp_path, "r", remote, state=shared)
    try:
        rc.start_index(pb.StartIndexRequest(
            indexName="idx", mode=pb.Mode.REPLICA,
            primaryAddress=f"localhost:{p2.replication_port}"))
        assert wait_docs(rc, N_COMMON + 30)
        total, docs, *_ = paths_agree(rc)
        assert total == N_COMMON + 30
    finally:
        rc.close()
        r.stop()
        pc2.close()
        p2.stop()


def test_deletes_survive_fault_on_dense_path(tmp_path, monkeypatch):
    """Upserts + deletes cross a replica restart; the dense head (built
    per snapshot over live docs) must mask deleted docs after re-sync."""
    monkeypatch.setenv("NRT_FAST_PATH", "fused")
    remote = LocalFileBackend(tmp_path / "remote")
    shared = str(tmp_path / "shared_state")
    p, pc = mk(tmp_path, "p", remote, state=shared)
    pc.create_index("idx")
    pc.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    pc.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.PRIMARY,
                                        primaryGen=1))
    add_corpus(pc, 0, N_COMMON)
    pc.commit("idx")

    r, rc = mk(tmp_path, "r", remote, state=shared)
    rc.start_index(pb.StartIndexRequest(
        indexName="idx", mode=pb.Mode.REPLICA,
        primaryAddress=f"localhost:{p.replication_port}"))
    assert wait_docs(rc, N_COMMON)
    rc.close()
    r.stop()

    # while the replica is down: delete 10 docs, upsert 5 (same ids)
    for i in range(10):
        dr = pb.AddDocumentRequest(indexName="idx")
        dr.fields["id"].value.append(str(i))
        pc.delete(dr)
    reqs = []
    for i in range(10, 15):
        rq = pb.AddDocumentRequest(indexName="idx")
        rq.fields["id"].value.append(str(i))
        rq.fields["t"].value.append(f"common updated{i}")
        reqs.append(rq)
    pc.add_documents(reqs)
    pc.refresh("idx")
    pc.commit("idx")

    # non-graceful replica restart: wipe its index dir
    shutil.rmtree(tmp_path / "r_index", ignore_errors=True)
    r2, rc2 = mk(tmp_path, "r", remote, state=shared,
                 index_dir=str(tmp_path / "r_index"))
    try:
        assert wait_docs(rc2, N_COMMON - 10)
        assert search_common(rc2).totalHits.value == N_COMMON - 10
        # deleted docs never match; updated docs match their new terms only
        assert search_rare(rc2, "rare3").totalHits.value == 0
        assert search_rare(rc2, "updated12").totalHits.value == 1
        assert search_rare(rc2, "rare12").totalHits.value == 0
        paths_agree(rc2)
    finally:
        rc2.close()
        r2.stop()
        pc.close()
        p.stop()


def test_search_during_copy_fused(tmp_path, monkeypatch):
    """Continuous fused searches on the replica while the primary streams
    new NRT points: every response is from a consistent snapshot (hit
    count matches one of the published point sizes, never a torn state)."""
    monkeypatch.setenv("NRT_FAST_PATH", "fused")
    remote = LocalFileBackend(tmp_path / "remote")
    shared = str(tmp_path / "shared_state")
    p, pc = mk(tmp_path, "p", remote, state=shared)
    pc.create_index("idx")
    pc.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    pc.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.PRIMARY,
                                        primaryGen=1))
    add_corpus(pc, 0, N_COMMON)

    r, rc = mk(tmp_path, "r", remote, state=shared)
    rc.start_index(pb.StartIndexRequest(
        indexName="idx", mode=pb.Mode.REPLICA,
        primaryAddress=f"localhost:{p.replication_port}"))
    assert wait_docs(rc, N_COMMON)

    valid_sizes = {N_COMMON}
    try:
        n = N_COMMON
        for wave in range(4):
            add_corpus(pc, n, 20)
            n += 20
            valid_sizes.add(n)
            deadline = time.time() + 5.0
            while time.time() < deadline:
                got = search_common(rc).totalHits.value
                assert got in valid_sizes, (got, valid_sizes)
                if got == n:
                    break
                time.sleep(0.02)
            assert search_common(rc).totalHits.value in valid_sizes
        assert wait_docs(rc, n)
        paths_agree(rc)
    finally:
        rc.close()
        r.stop()
        pc.close()
        p.stop()
