"""Per-field similarity, TopHits collector, fuzzy match params."""

import pytest

from nrtsearch_tpu.client import NrtsearchClient
from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.grpc_server import NrtsearchServer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sim")
    srv = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": str(tmp / "s"), "indexDir": str(tmp / "i")}
    ))
    port = srv.start(0)
    client = NrtsearchClient(f"localhost:{port}")
    client.create_index("idx")
    bool_field = pb.Field(name="tag", type=pb.FieldType.TEXT, search=True,
                          similarity="boolean")
    client.register_fields(pb.FieldDefRequest(indexName="idx", field=[
        pb.Field(name="id", type=pb.FieldType._ID, store=True),
        pb.Field(name="body", type=pb.FieldType.TEXT, search=True, store=True),
        bool_field,
        pb.Field(name="price", type=pb.FieldType.INT, storeDocValues=True),
    ]))
    client.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.STANDALONE))
    rows = [
        ("0", "short text", "red", "10"),
        ("1", "a much longer body of text with many words here", "red", "30"),
        ("2", "text", "blue", "20"),
    ]
    reqs = []
    for i, b, tag, p in rows:
        r = pb.AddDocumentRequest(indexName="idx")
        r.fields["id"].value.append(i)
        r.fields["body"].value.append(b)
        r.fields["tag"].value.append(tag)
        r.fields["price"].value.append(p)
        reqs.append(r)
    client.add_documents(reqs)
    client.refresh("idx")
    yield client
    client.close()
    srv.stop()


def test_boolean_similarity_ignores_length(server):
    # BM25 would score doc 0 ("red" in short field) same as doc 1 here too
    # since tag fields are equal-length; check constant scores across docs
    req = pb.SearchRequest(indexName="idx", topHits=10, retrieveFields=["id"])
    req.query.matchQuery.field = "tag"
    req.query.matchQuery.query = "red"
    resp = server.search(req)
    assert resp.totalHits.value == 2
    assert resp.hits[0].score == pytest.approx(resp.hits[1].score)

    # body uses BM25: shorter field scores higher for same tf
    req2 = pb.SearchRequest(indexName="idx", topHits=10, retrieveFields=["id"])
    req2.query.matchQuery.field = "body"
    req2.query.matchQuery.query = "text"
    resp2 = server.search(req2)
    ids = [h.fields["id"].fieldValue[0].textValue for h in resp2.hits]
    assert ids[0] == "2"  # shortest doc wins BM25


def test_top_hits_collector(server):
    req = pb.SearchRequest(indexName="idx", topHits=1)
    req.query.matchAllQuery.SetInParent()
    th = req.collectors["top_by_price"].topHitsCollector
    th.topHits = 2
    sf = th.querySort.fields.sortedFields.add()
    sf.fieldName = "price"
    sf.reverse = True
    th.retrieveFields.append("id")
    resp = server.search(req)
    hr = resp.collectorResults["top_by_price"].hitsResult
    assert hr.totalHits.value == 3
    ids = [h.fields["id"].fieldValue[0].textValue for h in hr.hits]
    assert ids == ["1", "2"]  # price 30, 20


def test_match_query_fuzzy_params(server):
    req = pb.SearchRequest(indexName="idx", topHits=10, retrieveFields=["id"])
    req.query.matchQuery.field = "body"
    req.query.matchQuery.query = "texd"  # 1 edit from "text"
    req.query.matchQuery.fuzzyParams.maxEdits = 1
    resp = server.search(req)
    assert resp.totalHits.value == 3
    # without fuzzy: no hits
    req.query.matchQuery.ClearField("fuzzyParams")
    assert server.search(req).totalHits.value == 0


def test_searcher_version_age_pruning(tmp_path):
    """Old pinned searcher versions are pruned by maxSearcherAgeSec
    (reference: SearcherLifetimeManager.PruneByAge)."""
    from nrtsearch_tpu.client import NrtsearchClient
    from nrtsearch_tpu.config import NrtsearchConfig
    from nrtsearch_tpu.server.grpc_server import NrtsearchServer

    srv = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": str(tmp_path / "s"), "indexDir": str(tmp_path / "i")}
    ))
    port = srv.start(0)
    c = NrtsearchClient(f"localhost:{port}")
    try:
        c.create_index("age")
        c.register_fields(pb.FieldDefRequest(indexName="age", field=[
            pb.Field(name="id", type=pb.FieldType._ID, store=True),
            pb.Field(name="body", type=pb.FieldType.TEXT, search=True),
        ]))
        c.start_index(pb.StartIndexRequest(indexName="age", mode=pb.Mode.STANDALONE))
        rt = srv.handlers.gs.get_runtime("age")
        rt.state_info.live_settings["maxSearcherAgeSec"] = 0.05
        for i in range(12):
            r = pb.AddDocumentRequest(indexName="age")
            r.fields["id"].value.append(str(i))
            r.fields["body"].value.append(f"doc {i}")
            c.add_documents([r])
            c.refresh("age")
        import time as _t

        _t.sleep(0.1)
        r = pb.AddDocumentRequest(indexName="age")
        r.fields["id"].value.append("last")
        r.fields["body"].value.append("doc last")
        c.add_documents([r])
        c.refresh("age")
        # everything older than 50ms is pruned; current version survives
        assert len(rt._searchers_by_version) <= 2
        assert rt.searcher.version in rt._searchers_by_version
        # acquire() of a pruned (expired) version errors — the reference
        # never silently serves a different version (SearchHandler.java:765)
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="expired"):
            rt.acquire(1)
        # a future version waits, then errors at the bound instead of
        # silently serving the current searcher
        with _pytest.raises(RuntimeError, match="did not become available"):
            rt.acquire(rt.searcher.version + 100, wait_sec=0.2)
        # the current version resolves to itself
        assert rt.acquire(rt.searcher.version).version == rt.searcher.version
    finally:
        c.close()
        srv.stop()
