"""Rescorers, multi-retriever blending, highlighting, virtual fields,
searchAfter — over real gRPC."""

import pytest

from nrtsearch_tpu.client import NrtsearchClient
from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.grpc_server import NrtsearchServer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("srv")
    srv = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": str(tmp / "state"), "indexDir": str(tmp / "index")}
    ))
    port = srv.start(0)
    client = NrtsearchClient(f"localhost:{port}")
    client.create_index("idx")
    client.register_fields(pb.FieldDefRequest(indexName="idx", field=[
        pb.Field(name="doc_id", type=pb.FieldType._ID, store=True),
        pb.Field(name="body", type=pb.FieldType.TEXT, search=True, store=True),
        pb.Field(name="boostv", type=pb.FieldType.FLOAT, storeDocValues=True),
        pb.Field(name="vec", type=pb.FieldType.VECTOR, vectorDimensions=2,
                 vectorSimilarity="l2_norm"),
    ]))
    client.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.STANDALONE))
    data = [
        ("0", "alpha quick brown fox jumps over the lazy dog near the river bank "
              "while the quick rabbit watches from afar in the quiet forest", "1.0", [1, 0]),
        ("1", "beta quick silver cat", "5.0", [0, 1]),
        ("2", "gamma quick golden dog", "2.0", [0.8, 0.2]),
        ("3", "delta slow turtle", "10.0", [0.5, 0.5]),
    ]
    reqs = []
    for i, b, bv, v in data:
        r = pb.AddDocumentRequest(indexName="idx")
        r.fields["doc_id"].value.append(i)
        r.fields["body"].value.append(b)
        r.fields["boostv"].value.append(bv)
        r.fields["vec"].value.append(str([float(x) for x in v]))
        reqs.append(r)
    client.add_documents(reqs)
    client.refresh("idx")
    yield client
    client.close()
    srv.stop()


def _ids(resp):
    return [h.fields["doc_id"].fieldValue[0].textValue for h in resp.hits]


def test_query_rescorer(server):
    req = pb.SearchRequest(indexName="idx", topHits=10, retrieveFields=["doc_id"])
    req.query.matchQuery.field = "body"
    req.query.matchQuery.query = "quick"
    r = req.rescorers.add()
    r.windowSize = 10
    r.queryRescorer.rescoreQuery.termQuery.field = "body"
    r.queryRescorer.rescoreQuery.termQuery.textValue = "cat"
    r.queryRescorer.queryWeight = 0.0
    r.queryRescorer.rescoreQueryWeight = 10.0
    resp = server.search(req)
    assert _ids(resp)[0] == "1"  # only doc 1 has "cat"
    assert resp.hits[0].score > resp.hits[1].score


def test_script_rescorer(server):
    req = pb.SearchRequest(indexName="idx", topHits=10, retrieveFields=["doc_id"])
    req.query.matchQuery.field = "body"
    req.query.matchQuery.query = "quick"
    r = req.rescorers.add()
    r.scriptRescorer.script.source = "boostv"
    resp = server.search(req)
    # rescored purely by boostv: doc1 (5.0) > doc2 (2.0) > doc0 (1.0)
    assert _ids(resp) == ["1", "2", "0"]
    assert resp.hits[0].score == pytest.approx(5.0)


def test_multi_retriever_rrf(server):
    req = pb.SearchRequest(indexName="idx", topHits=4, retrieveFields=["doc_id"])
    rt = req.multiRetriever.retrievers.add()
    rt.name = "text"
    rt.textRetriever.query.matchQuery.field = "body"
    rt.textRetriever.query.matchQuery.query = "quick"
    rv = req.multiRetriever.retrievers.add()
    rv.name = "vector"
    rv.knnRetriever.knnQuery.field = "vec"
    rv.knnRetriever.knnQuery.query_vector.extend([1.0, 0.0])
    rv.knnRetriever.knnQuery.k = 2
    resp = server.search(req)
    ids = _ids(resp)
    assert ids[0] in ("0", "2")  # docs in both retrievers win RRF
    assert set(ids) >= {"0", "2"}

    # weighted score blending
    req.multiRetriever.blender.weightedScoreOrder.scoreMode = (
        pb.WeightedScoreOrderBlender.ScoreMode.MAX
    )
    resp2 = server.search(req)
    assert len(resp2.hits) > 0


def test_highlight(server):
    req = pb.SearchRequest(indexName="idx", topHits=4, retrieveFields=["doc_id"])
    req.query.matchQuery.field = "body"
    req.query.matchQuery.query = "quick fox"
    req.highlight.fields.append("body")
    req.highlight.settings.fragment_size.value = 40
    resp = server.search(req)
    h0 = resp.hits[0]
    frags = list(h0.highlights["body"].fragments)
    assert frags, "expected highlight fragments"
    assert "<em>quick</em>" in frags[0] or "<em>fox</em>" in frags[0]

    # custom tags
    req.highlight.settings.pre_tags.append("[")
    req.highlight.settings.post_tags.append("]")
    resp2 = server.search(req)
    frags2 = list(resp2.hits[0].highlights["body"].fragments)
    assert any("[quick]" in f or "[fox]" in f for f in frags2)


def test_virtual_fields(server):
    req = pb.SearchRequest(indexName="idx", topHits=4,
                           retrieveFields=["doc_id", "double_boost"])
    req.query.matchAllQuery.SetInParent()
    vf = req.virtualFields.add()
    vf.name = "double_boost"
    vf.script.source = "boostv * 2"
    resp = server.search(req)
    by_id = {
        h.fields["doc_id"].fieldValue[0].textValue:
            h.fields["double_boost"].fieldValue[0].doubleValue
        for h in resp.hits
    }
    assert by_id == {"0": 2.0, "1": 10.0, "2": 4.0, "3": 20.0}


def test_search_after(server):
    req = pb.SearchRequest(indexName="idx", topHits=2, retrieveFields=["doc_id"])
    req.query.matchQuery.field = "body"
    req.query.matchQuery.query = "quick"
    page1 = server.search(req)
    assert len(page1.hits) == 2
    req2 = pb.SearchRequest(indexName="idx", topHits=2, retrieveFields=["doc_id"])
    req2.query.matchQuery.field = "body"
    req2.query.matchQuery.query = "quick"
    req2.searchAfter.lastDocId = page1.searchState.lastDocId
    req2.searchAfter.lastScore = page1.searchState.lastScore
    req2.searchAfter.lastHitIndex = page1.searchState.lastHitInfo.lastHitIndex
    page2 = server.search(req2)
    assert set(_ids(page1)).isdisjoint(set(_ids(page2)))
    assert len(_ids(page2)) == 1  # 3 quick docs total
