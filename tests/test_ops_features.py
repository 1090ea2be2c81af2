"""Metrics, snapshots, warming, plugins, custom requests — over real gRPC."""

import pytest

from nrtsearch_tpu.client import NrtsearchClient
from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.remote.backend import LocalFileBackend
from nrtsearch_tpu.server.grpc_server import NrtsearchServer
from nrtsearch_tpu.state.backend import LocalStateBackend
from nrtsearch_tpu.state.global_state import GlobalState


@pytest.fixture()
def server(tmp_path):
    config = NrtsearchConfig.from_dict(
        {"stateDir": str(tmp_path / "state"), "indexDir": str(tmp_path / "index")}
    )
    remote = LocalFileBackend(tmp_path / "remote")
    gs = GlobalState(config, LocalStateBackend(config.state_dir), remote=remote)
    srv = NrtsearchServer(config, gs)
    port = srv.start(0)
    client = NrtsearchClient(f"localhost:{port}")
    client.create_index("idx")
    client.register_fields(pb.FieldDefRequest(indexName="idx", field=[
        pb.Field(name="id", type=pb.FieldType._ID, store=True),
        pb.Field(name="t", type=pb.FieldType.TEXT, search=True, store=True),
    ]))
    client.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.STANDALONE))
    reqs = []
    for i in range(4):
        r = pb.AddDocumentRequest(indexName="idx")
        r.fields["id"].value.append(str(i))
        r.fields["t"].value.append(f"document number {i} about search")
        reqs.append(r)
    client.add_documents(reqs)
    client.refresh("idx")
    yield srv, client, remote
    client.close()
    srv.stop()


def _search(client, text="search"):
    req = pb.SearchRequest(indexName="idx", topHits=10, retrieveFields=["id"])
    req.query.matchQuery.field = "t"
    req.query.matchQuery.query = text
    return client.search(req)


def test_metrics_exposition(server):
    srv, client, _ = server
    _search(client)
    _search(client)
    text = client.metrics().data.decode()
    assert "grpc_server_handled_total" in text
    assert 'method="search"' in text
    assert "nrt_index_num_docs" in text
    assert 'nrt_index_num_docs{index="idx"} 4.0' in text


def test_snapshots(server):
    srv, client, _ = server
    snap = client.create_snapshot("idx")
    gen1 = snap.snapshotId.indexGen
    assert gen1 >= 1
    assert list(client.get_all_snapshot_gens("idx").indexGens) == [gen1]

    # mutate after the snapshot
    r = pb.AddDocumentRequest(indexName="idx")
    r.fields["id"].value.append("99")
    r.fields["t"].value.append("a very new document about search")
    client.add_documents([r])
    client.refresh("idx")
    client.commit("idx")

    # live search sees 5 docs; snapshot search sees 4
    assert _search(client).totalHits.value == 5
    req = pb.SearchRequest(indexName="idx", topHits=10, snapshotGen=gen1)
    req.query.matchQuery.field = "t"
    req.query.matchQuery.query = "search"
    assert client.search(req).totalHits.value == 4

    # reference Searcher oneof: snapshot = "indexGen:taxonomyGen:stateGen"
    # (SearchRequest.snapshot, search.proto) pins the same point in time
    req_ref = pb.SearchRequest(
        indexName="idx", topHits=10, snapshot=f"{gen1}:1:1"
    )
    req_ref.query.matchQuery.field = "t"
    req_ref.query.matchQuery.query = "search"
    assert client.search(req_ref).totalHits.value == 4

    # indexGen pinning is explicitly unsupported: loud error, not silence
    import grpc as _grpc
    import pytest as _pytest

    req_gen = pb.SearchRequest(indexName="idx", topHits=10, indexGen=gen1)
    req_gen.query.matchAllQuery.SetInParent()
    with _pytest.raises(_grpc.RpcError):
        client.search(req_gen)

    assert client.release_snapshot("idx", gen1).success
    assert list(client.get_all_snapshot_gens("idx").indexGens) == []


def test_gc_files(server):
    srv, client, _ = server
    rt = srv.global_state.get_runtime("idx")
    client.commit("idx")
    # create garbage: more segments then merge them away
    for i in range(3):
        r = pb.AddDocumentRequest(indexName="idx")
        r.fields["id"].value.append(f"g{i}")
        r.fields["t"].value.append("garbage maker")
        client.add_documents([r])
        client.refresh("idx")
    client.force_merge("idx", 1)
    client.commit("idx")
    removed = rt.gc_files()
    assert removed, "expected old segment files to be GCed"
    # index still searchable after GC
    assert _search(client).totalHits.value >= 4


def test_warming_backup_and_replay(server):
    srv, client, remote = server
    for i in range(5):
        _search(client, f"number {i}")
    resp = client.backup_warming_queries("idx")
    assert resp.numQueriesBackedUp == 5

    from nrtsearch_tpu.server.warming import Warmer

    rt = srv.global_state.get_runtime("idx")
    replayed = Warmer.warm_from_remote(
        remote, srv.config.service_name, rt.state_info.index_id,
        srv.handlers.search,
    )
    assert replayed == 5


def test_custom_request_plugin(server):
    srv, client, _ = server
    calls = {}

    def handler(path, params):
        calls["path"] = path
        return {"echo": params.get("x", ""), "path": path}

    srv.plugins.register_custom_request_handler("my_plugin", handler)
    resp = client.custom(pb.CustomRequest(id="my_plugin", path="do/thing",
                                          params={"x": "42"}))
    assert resp.response["echo"] == "42"
    assert calls["path"] == "do/thing"

    import grpc

    with pytest.raises(grpc.RpcError) as e:
        client.custom(pb.CustomRequest(id="nope"))
    assert e.value.code() == grpc.StatusCode.NOT_FOUND


def test_expression_geo_and_trig_functions():
    """Lucene-expressions geo/trig surface (reference:
    ExpressionsJavascriptFunctions: haversin family + Math.* bindings)."""
    import numpy as np

    from nrtsearch_tpu.script.expr import compile_expression

    class _DV:
        def __getitem__(self, name):
            vals = {"lat": np.array([37.7749, 0.0]),
                    "lon": np.array([-122.4194, 0.0])}
            return vals[name]

    # SF -> NYC great-circle ~4130 km (Lucene haversin returns km)
    fn = compile_expression("haversin(40.7128, -74.0060, lat, lon)")
    d = np.asarray(fn(_DV(), np.zeros(2)))
    assert abs(d[0] - 4130.0) < 10.0, d
    fn_m = compile_expression("haversinMeters(40.7128, -74.0060, lat, lon)")
    dm = np.asarray(fn_m(_DV(), np.zeros(2)))
    assert abs(dm[0] / 1000.0 - d[0]) < 1e-3

    fn2 = compile_expression("atan2(sin(lat), cos(lat)) + tanh(0)")
    v = np.asarray(fn2(_DV(), np.zeros(2)))
    assert np.isfinite(v).all()
