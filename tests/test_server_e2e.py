"""End-to-end server tests over real gRPC (reference test shape:
ServerTestCase.java — full server, in-process channels, tiny indices)."""

import json

import pytest

from nrtsearch_tpu.client import NrtsearchClient
from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.grpc_server import NrtsearchServer


@pytest.fixture()
def server(tmp_path):
    config = NrtsearchConfig.from_dict(
        {"stateDir": str(tmp_path / "state"), "indexDir": str(tmp_path / "index")}
    )
    srv = NrtsearchServer(config)
    port = srv.start(0)
    client = NrtsearchClient(f"localhost:{port}")
    yield srv, client, config
    client.close()
    srv.stop()


FIELDS = [
    pb.Field(name="doc_id", type=pb.FieldType._ID, store=True, storeDocValues=True),
    pb.Field(name="title", type=pb.FieldType.TEXT, search=True, store=True),
    pb.Field(name="body", type=pb.FieldType.TEXT, search=True, store=True),
    pb.Field(name="price", type=pb.FieldType.INT, storeDocValues=True, sort=True),
    pb.Field(
        name="category", type=pb.FieldType.ATOM, storeDocValues=True, multiValued=True
    ),
]

DOCS = [
    ("1", "fast fox", "the quick brown fox jumps over the lazy dog", "10", ["animal"]),
    ("2", "sleepy cat", "a quick brown cat sleeps all day long", "20", ["animal", "pet"]),
    ("3", "green turtle", "the slow green turtle walks home", "30", ["animal"]),
    ("4", "tpu guide", "python programming on tensor processing units", "40", ["tech"]),
    ("5", "kernels", "fast matrix kernels for search on tpu", "50", ["tech"]),
]


def _doc_request(index_name, doc_id, title, body, price, cats):
    req = pb.AddDocumentRequest(indexName=index_name)
    req.fields["doc_id"].value.append(doc_id)
    req.fields["title"].value.append(title)
    req.fields["body"].value.append(body)
    req.fields["price"].value.append(price)
    for c in cats:
        req.fields["category"].value.append(c)
    return req


def _setup_index(client, name="test_idx"):
    client.create_index(name)
    client.register_fields(pb.FieldDefRequest(indexName=name, field=FIELDS))
    client.start_index(pb.StartIndexRequest(indexName=name, mode=pb.Mode.STANDALONE))
    client.add_documents(_doc_request(name, *d) for d in DOCS)
    client.refresh(name)


def test_full_lifecycle(server):
    _, client, _ = server
    _setup_index(client)

    # status / ready / indices / stats
    assert client.status().health == pb.TransferStatusCode.Done
    assert client.ready().health == pb.TransferStatusCode.Done
    stats = client.stats("test_idx")
    assert stats.numDocs == 5
    assert client.indices().indicesResponse[0].indexName == "test_idx"

    # search: match query with retrieve fields
    req = pb.SearchRequest(
        indexName="test_idx", topHits=10,
        retrieveFields=["doc_id", "title", "price"],
    )
    req.query.matchQuery.field = "body"
    req.query.matchQuery.query = "quick brown"
    resp = client.search(req)
    assert resp.totalHits.value == 2
    got_ids = {h.fields["doc_id"].fieldValue[0].textValue for h in resp.hits}
    assert got_ids == {"1", "2"}
    assert resp.hits[0].score > 0
    assert resp.hits[0].fields["price"].fieldValue[0].intValue in (10, 20)

    # sort by price desc
    req2 = pb.SearchRequest(
        indexName="test_idx", topHits=3, retrieveFields=["doc_id"],
    )
    req2.query.matchAllQuery.SetInParent()
    sf = req2.querySort.fields.sortedFields.add()
    sf.fieldName = "price"
    sf.reverse = True
    resp2 = client.search(req2)
    ids = [h.fields["doc_id"].fieldValue[0].textValue for h in resp2.hits]
    assert ids == ["5", "4", "3"]
    assert resp2.totalHits.value == 5

    # pagination
    req2.startHit = 1
    req2.topHits = 2
    resp3 = client.search(req2)
    assert [h.fields["doc_id"].fieldValue[0].textValue for h in resp3.hits] == ["4"]


def test_facets_and_collectors(server):
    _, client, _ = server
    _setup_index(client)

    req = pb.SearchRequest(indexName="test_idx", topHits=1)
    req.query.matchAllQuery.SetInParent()
    facet = req.facets.add()
    facet.dim = "category"
    facet.topN = 10
    req.collectors["price_sum"].sum.field = "price"
    req.collectors["by_cat"].terms.field = "category"
    req.collectors["by_cat"].terms.size = 2
    req.collectors["count"].hitCount.SetInParent()
    resp = client.search(req)

    fr = resp.facetResult[0]
    counts = {lv.label: lv.value for lv in fr.labelValues}
    assert counts == {"animal": 3, "tech": 2, "pet": 1}

    assert resp.collectorResults["price_sum"].doubleResult.value == 150.0
    buckets = resp.collectorResults["by_cat"].bucketResult
    assert buckets.buckets[0].key == "animal" and buckets.buckets[0].count == 3
    assert buckets.totalBuckets == 3
    assert resp.collectorResults["count"].hitCountResult.value == 5


def test_filter_collector_and_range_facet(server):
    _, client, _ = server
    _setup_index(client)
    req = pb.SearchRequest(indexName="test_idx", topHits=1)
    req.query.matchAllQuery.SetInParent()
    req.collectors["cheap"].filter.query.rangeQuery.field = "price"
    req.collectors["cheap"].filter.query.rangeQuery.upper = "25"
    facet = req.facets.add()
    facet.dim = "price"
    facet.name = "price_ranges"
    r1 = facet.numericRange.add()
    r1.label = "low"
    r1.min = 0
    r1.max = 25
    r1.minInclusive = True
    r1.maxInclusive = True
    r2 = facet.numericRange.add()
    r2.label = "high"
    r2.min = 26
    r2.max = 1000
    r2.minInclusive = True
    r2.maxInclusive = True
    resp = client.search(req)
    assert resp.collectorResults["cheap"].filterResult.docCount == 2
    ranges = {lv.label: lv.value for lv in resp.facetResult[0].labelValues}
    assert ranges == {"low": 2, "high": 3}


def test_delete_and_update(server):
    _, client, _ = server
    _setup_index(client)

    # delete by id
    del_req = pb.AddDocumentRequest(indexName="test_idx")
    del_req.fields["doc_id"].value.append("2")
    client.delete(del_req)
    client.refresh("test_idx")
    assert client.stats("test_idx").numDocs == 4

    # upsert doc 1
    client.add_documents(
        [_doc_request("test_idx", "1", "new title", "totally different text now", "99", [])]
    )
    client.refresh("test_idx")
    assert client.stats("test_idx").numDocs == 4
    req = pb.SearchRequest(indexName="test_idx", topHits=10, retrieveFields=["doc_id"])
    req.query.matchQuery.field = "body"
    req.query.matchQuery.query = "quick"
    resp = client.search(req)
    assert resp.totalHits.value == 0  # docs 1,2 both gone from "quick"

    # deleteByQuery
    dbq = pb.DeleteByQueryRequest(indexName="test_idx")
    q = dbq.query.add()
    q.rangeQuery.field = "price"
    q.rangeQuery.lower = "40"
    client.delete_by_query(dbq)
    client.refresh("test_idx")
    assert client.stats("test_idx").numDocs == 1  # only doc 3 remains

    # deleteAll
    client.delete_all("test_idx")
    assert client.stats("test_idx").numDocs == 0


def test_commit_and_warm_boot(server, tmp_path):
    srv, client, config = server
    _setup_index(client)
    client.commit("test_idx")
    client.close()
    srv.stop()

    # new server over the same dirs: warm boot restores started index + data
    srv2 = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": config.state_dir, "indexDir": config.index_dir}
    ))
    port2 = srv2.start(0)
    client2 = NrtsearchClient(f"localhost:{port2}")
    try:
        stats = client2.stats("test_idx")
        assert stats.numDocs == 5
        req = pb.SearchRequest(indexName="test_idx", topHits=10, retrieveFields=["doc_id"])
        req.query.termQuery.field = "title"
        req.query.termQuery.textValue = "turtle"
        resp = client2.search(req)
        assert resp.hits[0].fields["doc_id"].fieldValue[0].textValue == "3"
    finally:
        client2.close()
        srv2.stop()


def test_error_mapping(server):
    import grpc

    _, client, _ = server
    with pytest.raises(grpc.RpcError) as e:
        client.search(pb.SearchRequest(indexName="nope"))
    assert e.value.code() == grpc.StatusCode.NOT_FOUND

    client.create_index("dup")
    with pytest.raises(grpc.RpcError) as e:
        client.create_index("dup")
    assert e.value.code() == grpc.StatusCode.ALREADY_EXISTS

    with pytest.raises(grpc.RpcError) as e:
        client.stats("dup")  # exists but not started
    assert e.value.code() == grpc.StatusCode.FAILED_PRECONDITION


def test_live_settings(server):
    _, client, _ = server
    client.create_index("ls_idx")
    req = pb.LiveSettingsV2Request(indexName="ls_idx")
    req.liveSettings.addDocumentsMaxBufferLen.value = 7
    resp = client.live_settings_v2(req)
    assert resp.liveSettings.addDocumentsMaxBufferLen.value == 7
    # get without set
    resp2 = client.live_settings_v2(pb.LiveSettingsV2Request(indexName="ls_idx"))
    assert resp2.liveSettings.addDocumentsMaxBufferLen.value == 7
