"""Doc-values-only updates, schema VIRTUAL fields, query cache."""

import pytest

from nrtsearch_tpu.client import NrtsearchClient
from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.grpc_server import NrtsearchServer


@pytest.fixture()
def server(tmp_path):
    srv = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": str(tmp_path / "s"), "indexDir": str(tmp_path / "i")}
    ))
    port = srv.start(0)
    client = NrtsearchClient(f"localhost:{port}")
    client.create_index("idx")
    virt = pb.Field(name="price_with_tax", type=pb.FieldType.VIRTUAL)
    virt.script.source = "price * 1.2"
    client.register_fields(pb.FieldDefRequest(indexName="idx", field=[
        pb.Field(name="id", type=pb.FieldType._ID, store=True),
        pb.Field(name="t", type=pb.FieldType.TEXT, search=True),
        pb.Field(name="price", type=pb.FieldType.DOUBLE, storeDocValues=True),
        virt,
    ]))
    client.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.STANDALONE))
    reqs = []
    for i, p in [("a", "10"), ("b", "20"), ("c", "30")]:
        r = pb.AddDocumentRequest(indexName="idx")
        r.fields["id"].value.append(i)
        r.fields["t"].value.append(f"doc {i}")
        r.fields["price"].value.append(p)
        reqs.append(r)
    client.add_documents(reqs)
    client.refresh("idx")
    yield client
    client.close()
    srv.stop()


def _search_all(client, retrieve, sort=None, reverse=False):
    req = pb.SearchRequest(indexName="idx", topHits=10, retrieveFields=retrieve)
    req.query.matchAllQuery.SetInParent()
    if sort:
        sf = req.querySort.fields.sortedFields.add()
        sf.fieldName = sort
        sf.reverse = reverse
    return client.search(req)


def test_update_doc_values(server):
    upd = pb.AddDocumentRequest(indexName="idx",
                                requestType=pb.IndexingRequestType.UPDATE_DOC_VALUES)
    upd.fields["id"].value.append("b")
    upd.fields["price"].value.append("99.5")
    server.add_documents([upd])
    server.refresh("idx")
    resp = _search_all(server, ["id", "price"])
    by_id = {h.fields["id"].fieldValue[0].textValue:
             h.fields["price"].fieldValue[0].doubleValue for h in resp.hits}
    assert by_id == {"a": 10.0, "b": 99.5, "c": 30.0}
    # range filter sees the update
    req = pb.SearchRequest(indexName="idx", topHits=10, retrieveFields=["id"])
    req.query.rangeQuery.field = "price"
    req.query.rangeQuery.lower = "50"
    resp2 = server.search(req)
    assert [h.fields["id"].fieldValue[0].textValue for h in resp2.hits] == ["b"]


def test_update_unknown_id_fails(server):
    import grpc

    upd = pb.AddDocumentRequest(indexName="idx",
                                requestType=pb.IndexingRequestType.UPDATE_DOC_VALUES)
    upd.fields["id"].value.append("zzz")
    upd.fields["price"].value.append("1")
    with pytest.raises(grpc.RpcError) as e:
        server.add_documents([upd])
    assert e.value.code() == grpc.StatusCode.NOT_FOUND


def test_virtual_field_retrieve_and_sort(server):
    resp = _search_all(server, ["id", "price_with_tax"], sort="price_with_tax",
                       reverse=True)
    vals = [h.fields["price_with_tax"].fieldValue[0].doubleValue for h in resp.hits]
    assert vals == pytest.approx([36.0, 24.0, 12.0])


def test_query_cache_hits(server, monkeypatch):
    # the filter bitset cache serves the EAGER evaluator; the compiled
    # evaluator (query/compiled.py) fuses filters in-program instead, where
    # jax.jit's program cache plays the NrtQueryCache role
    monkeypatch.setenv("NRT_COMPILED_EVAL", "0")
    from nrtsearch_tpu.search.query_cache import DEFAULT_QUERY_CACHE as qc

    req = pb.SearchRequest(indexName="idx", topHits=10)
    req.query.rangeQuery.field = "price"
    req.query.rangeQuery.lower = "15"
    before = qc.hits
    server.search(req)
    server.search(req)
    assert qc.hits > before
