"""NRT replication: primary publishes points to the object store; replica
installs them and hot-swaps its searcher. Mirrors the reference's replication
test shape (ReplicationServerTest / isolated replicas via S3 polling) with the
LocalFileBackend as the S3Mock analogue."""

import time

import pytest

from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.core.searcher import Searcher
from nrtsearch_tpu.query.plan import parse_query
from nrtsearch_tpu.remote.backend import LocalFileBackend
from nrtsearch_tpu.server.index_runtime import IndexRuntime
from nrtsearch_tpu.state.index_state import IndexStateInfo

FIELD_SPECS = {
    "doc_id": {"type": "_ID", "store": True, "storeDocValues": True},
    "body": {"type": "TEXT", "search": True, "store": True},
    "price": {"type": "INT", "storeDocValues": True},
}


def make_info():
    return IndexStateInfo(index_name="idx", index_id="idx-abc123").with_fields(
        FIELD_SPECS
    )


@pytest.fixture()
def remote(tmp_path):
    return LocalFileBackend(tmp_path / "remote")


def make_primary(tmp_path, remote):
    rt = IndexRuntime(
        make_info(), tmp_path / "primary", mode="PRIMARY", remote=remote,
        service_name="svc", primary_gen=1,
    )
    rt.start()
    return rt


def make_replica(tmp_path, remote, name="replica"):
    rt = IndexRuntime(
        make_info(), tmp_path / name, mode="REPLICA", remote=remote,
        service_name="svc",
    )
    # no background polling in tests: drive sync_from_remote() explicitly
    return rt


DOCS = [
    {"doc_id": "1", "body": "tpu native search engine", "price": "5"},
    {"doc_id": "2", "body": "segment replication over object store", "price": "9"},
    {"doc_id": "3", "body": "replicas never index anything", "price": "7"},
]


def test_primary_publishes_replica_installs(tmp_path, remote):
    primary = make_primary(tmp_path, remote)
    primary.add_documents(DOCS)
    primary.refresh()

    replica = make_replica(tmp_path, remote)
    assert replica.sync_from_remote() is True
    assert replica.searcher.num_docs == 3
    assert replica.searcher.version == primary.searcher.version

    q = parse_query({"matchQuery": {"field": "body", "query": "replication"}})
    td = replica.searcher.search(q, 10)
    assert td.total_hits == 1
    seg = replica.searcher.segments[td.hits[0].segment_idx]
    assert seg.stored[td.hits[0].local_id]["doc_id"] == "2"

    # replica is read-only
    with pytest.raises(PermissionError):
        replica.add_documents(DOCS)

    # no new point -> no-op sync
    assert replica.sync_from_remote() is False
    primary.stop()
    replica.stop()


def test_incremental_points_and_deletes(tmp_path, remote):
    primary = make_primary(tmp_path, remote)
    primary.add_documents(DOCS)
    primary.refresh()
    replica = make_replica(tmp_path, remote)
    replica.sync_from_remote()

    # second point: more docs
    primary.add_documents([{"doc_id": "4", "body": "fresh new segment", "price": "1"}])
    primary.refresh()
    assert replica.sync_from_remote() is True
    assert replica.searcher.num_docs == 4

    # third point: a delete (ships only a new live-mask del-gen file)
    primary.delete_by_id(["1"])
    primary.refresh()
    assert replica.sync_from_remote() is True
    assert replica.searcher.num_docs == 3
    q = parse_query({"termQuery": {"field": "doc_id", "textValue": "1"}})
    assert replica.searcher.search(q, 10).total_hits == 0
    primary.stop()
    replica.stop()


def test_new_primary_restores_from_remote(tmp_path, remote):
    primary = make_primary(tmp_path, remote)
    primary.add_documents(DOCS)
    primary.commit()
    primary.stop()

    # primary dies; a new primary (fresh dir) restores from the object store
    # (reference: RestoreIndex + NrtDataManager.restoreIfNeeded:220)
    new_primary = IndexRuntime(
        make_info(), tmp_path / "primary2", mode="PRIMARY", remote=remote,
        service_name="svc", primary_gen=2,
    )
    new_primary.start(restore=True)
    assert new_primary.searcher.num_docs == 3
    new_primary.add_documents([{"doc_id": "9", "body": "post failover doc", "price": "2"}])
    new_primary.refresh()

    replica = make_replica(tmp_path, remote)
    replica.sync_from_remote()
    assert replica.searcher.num_docs == 4
    q = parse_query({"matchQuery": {"field": "body", "query": "failover"}})
    assert replica.searcher.search(q, 10).total_hits == 1
    new_primary.stop()
    replica.stop()


def test_replica_poll_thread(tmp_path, remote):
    import time

    primary = make_primary(tmp_path, remote)
    replica = IndexRuntime(
        make_info(), tmp_path / "replica_poll", mode="REPLICA", remote=remote,
        service_name="svc",
    )
    replica._start_replica_poll(interval=0.05)
    primary.add_documents(DOCS)
    primary.refresh()
    deadline = time.time() + 5
    while time.time() < deadline and replica.searcher.num_docs != 3:
        time.sleep(0.05)
    assert replica.searcher.num_docs == 3
    primary.stop()
    replica.stop()


def test_point_carries_file_metadata(tmp_path, remote):
    """NrtPointState carries per-file (length, crc32), like the reference's
    NrtFileMetaData in CopyState (luceneserver.proto:1211)."""
    primary = make_primary(tmp_path, remote)
    primary.add_documents(DOCS)
    primary.refresh()
    point = primary.current_point()
    assert point.files and set(point.file_meta) == set(point.files)
    for name, (length, crc) in point.file_meta.items():
        assert length == (tmp_path / "primary" / name).stat().st_size
    # round-trips through JSON
    from nrtsearch_tpu.nrt.point_state import NrtPointState

    again = NrtPointState.from_json(point.to_json())
    assert again.file_meta == point.file_meta
    primary.stop()


def test_stale_file_under_reused_name_is_recopied(tmp_path, remote):
    """A local file whose bytes don't match the point's length+crc must be
    re-fetched, not trusted by name (the round-1 advisor's stale-seg_0
    scenario: counter reuse after a primary restart)."""
    primary = make_primary(tmp_path, remote)
    primary.add_documents(DOCS)
    primary.refresh()
    replica = make_replica(tmp_path, remote)
    replica.start()
    # the primary's point publish can still be in flight under load; a real
    # replica polls (install loop) — poll briefly instead of failing flaky
    deadline = time.time() + 10.0
    while not replica.sync_from_remote():
        assert time.time() < deadline, "primary never published a point"
        time.sleep(0.05)

    # corrupt one replica-side segment file in place (stale-byte stand-in),
    # then force a reinstall of the same point under a new primary gen
    point = primary.current_point()
    victim = next(f for f in point.files if f.endswith(".arrays.npz"))
    path = tmp_path / "replica" / victim
    good = path.read_bytes()
    path.write_bytes(good[: len(good) // 2])  # truncated/stale bytes

    point.primary_gen += 1  # force the replica to accept the point again
    assert replica.install_point(point)
    assert path.read_bytes() == good  # re-downloaded, not trusted
    q = parse_query({"matchQuery": {"field": "body", "query": "replication"}})
    assert replica.searcher.search(q, 5).total_hits == 1
    primary.stop()
    replica.stop()


def test_seg_ids_are_process_unique():
    from nrtsearch_tpu.core.segment import new_seg_id

    a, b = new_seg_id(), new_seg_id()
    assert a != b
    # the per-process random token guards against cross-restart collisions
    token_a = a.split("_")[1]
    assert len(token_a) == 8
