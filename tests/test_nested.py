"""Nested documents: block indexing, NestedQuery score modes, innerHits,
block deletes — over real gRPC."""

import json

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
    client.create_index("biz")
    partner_children = [
        pb.Field(name="name", type=pb.FieldType.TEXT, search=True, store=True),
        pb.Field(name="years", type=pb.FieldType.INT, storeDocValues=True),
    ]
    client.register_fields(pb.FieldDefRequest(indexName="biz", field=[
        pb.Field(name="biz_id", type=pb.FieldType._ID, store=True),
        pb.Field(name="title", type=pb.FieldType.TEXT, search=True, store=True),
        pb.Field(name="partners", type=pb.FieldType.OBJECT, nestedDoc=True,
                 childFields=partner_children),
    ]))
    client.start_index(pb.StartIndexRequest(indexName="biz", mode=pb.Mode.STANDALONE))

    def doc(biz_id, title, partners):
        r = pb.AddDocumentRequest(indexName="biz")
        r.fields["biz_id"].value.append(biz_id)
        r.fields["title"].value.append(title)
        for p in partners:
            r.fields["partners"].value.append(json.dumps(p))
        return r

    client.add_documents([
        doc("A", "alpha diner", [{"name": "alice smith", "years": "3"},
                                 {"name": "bob jones", "years": "10"}]),
        doc("B", "beta cafe", [{"name": "alice wong", "years": "7"}]),
        doc("C", "gamma bar", [{"name": "carol king", "years": "1"}]),
    ])
    client.refresh("biz")
    yield srv, client
    client.close()
    srv.stop()


def _ids(resp):
    return [h.fields["biz_id"].fieldValue[0].textValue for h in resp.hits]


def test_top_level_search_returns_parents_only(server):
    _, client = server
    req = pb.SearchRequest(indexName="biz", topHits=10, retrieveFields=["biz_id"])
    req.query.matchAllQuery.SetInParent()
    resp = client.search(req)
    assert resp.totalHits.value == 3  # parents only, not the 4 children


def test_nested_query(server):
    _, client = server
    req = pb.SearchRequest(indexName="biz", topHits=10, retrieveFields=["biz_id"])
    nq = req.query.nestedQuery
    nq.path = "partners"
    nq.query.matchQuery.field = "partners.name"
    nq.query.matchQuery.query = "alice"
    resp = client.search(req)
    assert sorted(_ids(resp)) == ["A", "B"]

    # numeric child filter
    req2 = pb.SearchRequest(indexName="biz", topHits=10, retrieveFields=["biz_id"])
    nq2 = req2.query.nestedQuery
    nq2.path = "partners"
    nq2.query.rangeQuery.field = "partners.years"
    nq2.query.rangeQuery.lower = "5"
    resp2 = client.search(req2)
    assert sorted(_ids(resp2)) == ["A", "B"]  # bob 10y, alice wong 7y


def test_nested_score_modes(server):
    _, client = server

    def run(mode):
        req = pb.SearchRequest(indexName="biz", topHits=10, retrieveFields=["biz_id"])
        nq = req.query.nestedQuery
        nq.path = "partners"
        nq.scoreMode = mode
        nq.query.matchQuery.field = "partners.name"
        nq.query.matchQuery.query = "alice bob carol"
        return client.search(req)

    sum_resp = run(pb.NestedQuery.ScoreMode.SUM)
    max_resp = run(pb.NestedQuery.ScoreMode.MAX)
    none_resp = run(pb.NestedQuery.ScoreMode.NONE)
    # biz A has two matching children: SUM score > MAX score
    a_sum = {h.fields["biz_id"].fieldValue[0].textValue: h.score for h in sum_resp.hits}
    a_max = {h.fields["biz_id"].fieldValue[0].textValue: h.score for h in max_resp.hits}
    assert a_sum["A"] > a_max["A"]
    assert all(h.score == 1.0 for h in none_resp.hits)


def test_inner_hits(server):
    _, client = server
    req = pb.SearchRequest(indexName="biz", topHits=10, retrieveFields=["biz_id"])
    nq = req.query.nestedQuery
    nq.path = "partners"
    nq.query.matchQuery.field = "partners.name"
    nq.query.matchQuery.query = "alice"
    ih = req.inner_hits["matched_partners"]
    ih.query_nested_path = "partners"
    ih.inner_query.matchQuery.field = "partners.name"
    ih.inner_query.matchQuery.query = "alice"
    ih.top_hits = 5
    ih.retrieve_fields.append("partners.name")
    ih.retrieve_fields.append("partners.years")
    resp = client.search(req)
    by_id = {h.fields["biz_id"].fieldValue[0].textValue: h for h in resp.hits}
    inner_a = by_id["A"].innerHits["matched_partners"]
    assert inner_a.totalHits.value == 1
    assert inner_a.hits[0].fields["partners.name"].fieldValue[0].textValue == "alice smith"
    assert inner_a.hits[0].fields["partners.years"].fieldValue[0].intValue == 3
    inner_b = by_id["B"].innerHits["matched_partners"]
    assert inner_b.hits[0].fields["partners.name"].fieldValue[0].textValue == "alice wong"


def test_block_delete(server):
    _, client = server
    d = pb.AddDocumentRequest(indexName="biz")
    d.fields["biz_id"].value.append("A")
    client.delete(d)
    client.refresh("biz")
    req = pb.SearchRequest(indexName="biz", topHits=10, retrieveFields=["biz_id"])
    nq = req.query.nestedQuery
    nq.path = "partners"
    nq.query.matchQuery.field = "partners.name"
    nq.query.matchQuery.query = "alice bob"
    resp = client.search(req)
    # A's block (incl. children alice smith / bob jones) is gone
    assert _ids(resp) == ["B"]
    assert client.stats("biz").numDocs >= 1
