"""nrt_utils, REST gateway, discovery-file failover, hits loggers."""

import json
import time
import urllib.request

import grpc
import pytest

from nrtsearch_tpu.client import NrtsearchClient
from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.remote.backend import LocalFileBackend
from nrtsearch_tpu.server.grpc_server import NrtsearchServer
from nrtsearch_tpu.state.backend import LocalStateBackend
from nrtsearch_tpu.state.global_state import GlobalState


def _mk_server(tmp_path, name="n", remote=None, state=None):
    config = NrtsearchConfig.from_dict({
        "stateDir": state or str(tmp_path / f"{name}_state"),
        "indexDir": str(tmp_path / f"{name}_index"),
        "nodeName": name,
    })
    gs = GlobalState(config, LocalStateBackend(config.state_dir), remote=remote)
    srv = NrtsearchServer(config, gs)
    port = srv.start(0)
    return srv, NrtsearchClient(f"localhost:{port}")


FIELDS = [
    pb.Field(name="id", type=pb.FieldType._ID, store=True),
    pb.Field(name="t", type=pb.FieldType.TEXT, search=True, store=True),
]


def _fill(client, index="idx", n=3):
    client.create_index(index)
    client.register_fields(pb.FieldDefRequest(indexName=index, field=FIELDS))
    client.start_index(pb.StartIndexRequest(indexName=index, mode=pb.Mode.STANDALONE))
    reqs = []
    for i in range(n):
        r = pb.AddDocumentRequest(indexName=index)
        r.fields["id"].value.append(str(i))
        r.fields["t"].value.append(f"sample text {i}")
        reqs.append(r)
    client.add_documents(reqs)
    client.refresh(index)


def test_nrt_utils_snapshot_restore_cleanup(tmp_path, capsys):
    from nrtsearch_tpu.nrt_utils import main as utils_main
    from nrtsearch_tpu.server.index_runtime import IndexRuntime
    from nrtsearch_tpu.state.index_state import IndexStateInfo

    remote = LocalFileBackend(tmp_path / "store")
    info = IndexStateInfo(index_name="i", index_id="i-123").with_fields(
        {"id": {"type": "_ID"}, "t": {"type": "TEXT", "search": True}}
    )
    rt = IndexRuntime(info, tmp_path / "p", mode="PRIMARY", remote=remote,
                      service_name="svc", primary_gen=1)
    rt.start()
    rt.add_documents([{"id": "1", "t": "hello world"}])
    rt.refresh()

    root = str(tmp_path / "store")
    assert utils_main(["--root", root, "snapshot", "--serviceName", "svc",
                       "--indexId", "i-123", "--snapshotId", "snap1"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["snapshotId"] == "snap1"

    # more data -> new point; restore flips _current back to the snapshot
    rt.add_documents([{"id": "2", "t": "more data"}])
    rt.refresh()
    assert utils_main(["--root", root, "listSnapshots", "--serviceName", "svc",
                       "--indexId", "i-123"]) == 0
    snaps = json.loads(capsys.readouterr().out)
    assert len(snaps) == 1
    assert utils_main(["--root", root, "restore", "--serviceName", "svc",
                       "--indexId", "i-123", "--snapshotId", "snap1"]) == 0
    capsys.readouterr()

    replica = IndexRuntime(info, tmp_path / "r", mode="REPLICA", remote=remote,
                           service_name="svc")
    replica.sync_from_remote()
    assert replica.searcher.num_docs == 1  # the snapshot point, not the newer one

    assert utils_main(["--root", root, "cleanup", "--serviceName", "svc",
                       "--indexId", "i-123", "--dryRun"]) == 0
    cleanup = json.loads(capsys.readouterr().out)
    assert cleanup["dryRun"] is True
    rt.stop()
    replica.stop()


def test_rest_gateway(tmp_path):
    from nrtsearch_tpu.server.rest_gateway import RestGateway

    srv, client = _mk_server(tmp_path, "rest")
    _fill(client)
    gw = RestGateway(f"localhost:{srv.port}")
    gw.start()
    try:
        def post(path, body):
            req = urllib.request.Request(
                f"http://localhost:{gw.port}/v1/{path}",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())

        resp = post("search", {
            "indexName": "idx", "topHits": 5, "retrieveFields": ["id"],
            "query": {"matchQuery": {"field": "t", "query": "sample"}},
        })
        assert resp["totalHits"]["value"] == "3"

        with urllib.request.urlopen(f"http://localhost:{gw.port}/v1/status") as r:
            assert json.loads(r.read())["health"] == "Done"

        # REST ingest
        post("addDocuments", [{
            "indexName": "idx",
            "fields": {"id": {"value": ["9"]}, "t": {"value": ["rest ingested doc"]}},
        }])
        post("refresh", {"indexName": "idx"})
        resp2 = post("search", {
            "indexName": "idx", "topHits": 5,
            "query": {"matchQuery": {"field": "t", "query": "ingested"}},
        })
        assert resp2["totalHits"]["value"] == "1"

        # error mapping
        try:
            post("search", {"indexName": "missing"})
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        gw.stop()
        client.close()
        srv.stop()


def test_discovery_file_failover(tmp_path):
    remote = LocalFileBackend(tmp_path / "remote")
    shared_state = str(tmp_path / "shared_state")
    p1, c1 = _mk_server(tmp_path, "p1", remote=remote, state=shared_state)
    _fill(c1, "idx")
    c1.commit("idx")  # uncommitted docs don't survive a stop
    c1.stop_index("idx")
    c1.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.PRIMARY,
                                        primaryGen=1))
    r = pb.AddDocumentRequest(indexName="idx")
    r.fields["id"].value.append("p1doc")
    r.fields["t"].value.append("from primary one")
    c1.add_documents([r])
    c1.refresh("idx")

    # replica discovers the primary via a JSON host file
    disc = tmp_path / "primary.json"
    disc.write_text(json.dumps({"host": "localhost", "port": p1.replication_port}))
    rep, rc = _mk_server(tmp_path, "rep", remote=remote, state=shared_state)
    rc.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.REPLICA,
                                        primaryAddress=f"file:{disc}"))
    deadline = time.time() + 5
    while time.time() < deadline and rc.stats("idx").numDocs != 4:
        time.sleep(0.1)
    assert rc.stats("idx").numDocs == 4

    # failover: new primary takes over, discovery file flips
    p2, c2 = _mk_server(tmp_path, "p2", remote=remote, state=shared_state)
    c2.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.PRIMARY,
                                        primaryGen=2))
    r2 = pb.AddDocumentRequest(indexName="idx")
    r2.fields["id"].value.append("p2doc")
    r2.fields["t"].value.append("from primary two")
    c2.add_documents([r2])
    p1.stop()
    disc.write_text(json.dumps({"host": "localhost", "port": p2.replication_port}))
    c2.refresh("idx")
    deadline = time.time() + 8
    while time.time() < deadline:
        req = pb.SearchRequest(indexName="idx", topHits=10)
        req.query.matchQuery.field = "t"
        req.query.matchQuery.query = "two"
        if rc.search(req).totalHits.value == 1:
            break
        time.sleep(0.2)
        c2.refresh("idx")
    req = pb.SearchRequest(indexName="idx", topHits=10)
    req.query.matchQuery.field = "t"
    req.query.matchQuery.query = "two"
    assert rc.search(req).totalHits.value == 1
    for x in (c1, rc, c2):
        x.close()
    for s in (rep, p2):
        s.stop()


def test_hits_logger(tmp_path):
    srv, client = _mk_server(tmp_path, "hl")
    _fill(client)
    logged = []
    srv.plugins.register_hits_logger("audit", lambda idx, req, hits: logged.append(
        (idx, len(hits))
    ))
    req = pb.SearchRequest(indexName="idx", topHits=2)
    req.query.matchQuery.field = "t"
    req.query.matchQuery.query = "sample"
    client.search(req)
    assert logged == [("idx", 2)]
    client.close()
    srv.stop()


def test_cli_metrics_and_searcher_version(tmp_path, capsys):
    from nrtsearch_tpu.cli import main as cli_main

    srv, client = _mk_server(tmp_path, "cli")
    try:
        _fill(client)
        port = srv.port
        assert cli_main(["--port", str(port), "metrics"]) == 0
        out = capsys.readouterr().out
        assert "# TYPE grpc_server_handled_latency_seconds" in out
        # replica searching version via the replication port
        rc = cli_main([
            "--port", str(port), "currentSearcherVersion",
            "--indexName", "idx",
            "--replicationPort", str(srv.replication_port),
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "version" in out
    finally:
        client.close()
        srv.stop()


def test_remote_plugin_download(tmp_path, capsys):
    """remote:// plugin entries download from the object store and register
    (reference: PluginDownloader)."""
    from nrtsearch_tpu.remote.backend import LocalFileBackend
    from nrtsearch_tpu.server.plugins import PluginRegistry, load_plugins

    remote = LocalFileBackend(tmp_path / "store")
    src = (
        "def register(registry):\n"
        "    registry.rescorers['dl_test'] = lambda *a, **k: None\n"
    )
    remote.upload_versioned("svc", "plugin_dlplug", src.encode())
    reg = PluginRegistry()
    load_plugins(["remote://dlplug"], reg, remote=remote, service="svc")
    assert "dl_test" in reg.rescorers


def test_plugin_script_engine(tmp_path):
    """ScriptPlugin parity: a registered engine handles non-default langs."""
    import numpy as np

    from nrtsearch_tpu.script.expr import compile_expression
    from nrtsearch_tpu.server.plugins import PluginRegistry

    reg = PluginRegistry()
    reg.register_script_engine(
        "const7", lambda src: (lambda dv, score: np.full(4, float(src)))
    )
    fn = compile_expression("7.5", lang="const7")
    assert fn(None, None)[0] == 7.5
    # default lang still the expression compiler
    fn2 = compile_expression("1 + 2")
    assert float(np.asarray(fn2({}, np.zeros(1)))) == 3.0


def test_plugin_collector_and_logging_hits(tmp_path):
    """pluginCollector (reference: CollectorCreator, search.proto
    PluginCollector=2 in the Collectors oneof) + the loggingHits request
    surface (reference: LoggingHits / HitsLoggerFetchTask): the logger
    receives hitsToLog hits even when that exceeds the returned page."""
    from google.protobuf import struct_pb2

    srv, client = _mk_server(tmp_path, "pc")
    _fill(client, n=6)

    def count_and_echo(matches, params):
        from nrtsearch_tpu.search.collectors import hit_count
        return {"matched": float(hit_count(matches)),
                "echo": params.get("tagline", "")}

    srv.plugins.register_collector("counter", count_and_echo)
    logged = []
    srv.plugins.register_hits_logger(
        "audit", lambda idx, req, hits, **kw: logged.append(
            (idx, len(hits), kw.get("params", {}))
        )
    )

    req = pb.SearchRequest(indexName="idx", topHits=2, retrieveFields=["id"])
    req.query.matchQuery.field = "t"
    req.query.matchQuery.query = "sample"
    pc = req.collectors["stats"].pluginCollector
    pc.name = "counter"
    pc.params.update({"tagline": "hi"})
    req.loggingHits.name = "audit"
    req.loggingHits.hitsToLog = 5
    req.loggingHits.params.update({"who": "test"})
    resp = client.search(req)

    # page is 2 hits; the logger saw 5 (hitsToLog widened the fetch window)
    assert len(resp.hits) == 2
    assert logged == [("idx", 5, {"who": "test"})]
    st = struct_pb2.Struct()
    resp.collectorResults["stats"].anyResult.Unpack(st)
    assert st["matched"] == 6.0 and st["echo"] == "hi"

    # unknown plugin collector name fails loudly
    bad = pb.SearchRequest(indexName="idx", topHits=1)
    bad.query.matchAllQuery.SetInParent()
    bad.collectors["x"].pluginCollector.name = "nope"
    with pytest.raises(grpc.RpcError):
        client.search(bad)

    client.close()
    srv.stop()


def test_ingestion_plugin_lifecycle(tmp_path):
    """Ingestor plugin lifecycle: initialize at boot, start after the main
    server is up, documents flow through the normal indexing path, stop on
    shutdown (reference: server/ingestion/Ingestor.java:40 lifecycle)."""
    import threading

    from nrtsearch_tpu.server.plugins import Ingestor

    events = []

    class FeedIngestor(Ingestor):
        def initialize(self, global_state):
            events.append("initialize")
            self.gs = global_state
            self._stop = threading.Event()

        def start(self):
            events.append("start")

            def run():
                # create + fill an index through the SAME handler surface
                from nrtsearch_tpu.gen import pb
                from nrtsearch_tpu.server.handlers import Handlers

                h = Handlers(self.gs)
                h.createIndex(pb.CreateIndexRequest(indexName="feed"))
                freq = pb.FieldDefRequest(indexName="feed")
                for name, t, extra in [
                    ("id", pb.FieldType._ID, {"store": True}),
                    ("t", pb.FieldType.TEXT, {"search": True}),
                ]:
                    f = freq.field.add()
                    f.name = name
                    f.type = t
                    for k, v in extra.items():
                        setattr(f, k, v)
                h.registerFields(freq)
                h.startIndex(pb.StartIndexRequest(indexName="feed"))
                reqs = []
                for i in range(5):
                    r = pb.AddDocumentRequest(indexName="feed")
                    r.fields["id"].value.append(str(i))
                    r.fields["t"].value.append(f"streamed doc {i}")
                    reqs.append(r)
                h.addDocuments(iter(reqs))
                h.refresh(pb.RefreshRequest(indexName="feed"))
                events.append("fed")

            self._t = threading.Thread(target=run)
            self._t.start()

        def stop(self):
            self._t.join(timeout=30)
            events.append("stop")

    srv, client = _mk_server(tmp_path, "ing")
    srv.plugins.ingestors.append(FeedIngestor())
    # lifecycle hooks run at boot normally; drive them on the live server
    srv.plugins.ingestors[0].initialize(srv.global_state)
    srv.plugins.ingestors[0].start()
    srv.plugins.ingestors[0]._t.join(timeout=60)

    req = pb.SearchRequest(indexName="feed", topHits=10, retrieveFields=["id"])
    req.query.matchQuery.field = "t"
    req.query.matchQuery.query = "streamed"
    resp = client.search(req)
    assert resp.totalHits.value == 5
    srv.plugins.ingestors[0].stop()
    assert events == ["initialize", "start", "fed", "stop"]
    client.close()
    srv.stop()
