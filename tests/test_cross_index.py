"""CrossIndexQuery: join against a secondary index (reference:
QueryNodeMapper.getCrossIndexQuery -> Lucene JoinUtil.createJoinQuery)."""

import grpc
import pytest
from google.protobuf.json_format import ParseDict

from nrtsearch_tpu.client import NrtsearchClient
from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.grpc_server import NrtsearchServer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("join")
    srv = NrtsearchServer(
        NrtsearchConfig.from_dict(
            {"stateDir": str(tmp / "s"), "indexDir": str(tmp / "i")}
        )
    )
    port = srv.start(0)
    c = NrtsearchClient(f"localhost:{port}")
    # products index (primary side of the join)
    c.create_index("products")
    c.register_fields(pb.FieldDefRequest(indexName="products", field=[
        pb.Field(name="id", type=pb.FieldType._ID, store=True),
        pb.Field(name="brand", type=pb.FieldType.ATOM, storeDocValues=True),
        pb.Field(name="name", type=pb.FieldType.TEXT, search=True),
    ]))
    c.start_index(pb.StartIndexRequest(indexName="products", mode=pb.Mode.STANDALONE))
    for i, brand, name in [
        ("p1", "acme", "anvil deluxe"),
        ("p2", "acme", "rocket skates"),
        ("p3", "globex", "hover board"),
        ("p4", "initech", "red stapler"),
    ]:
        r = pb.AddDocumentRequest(indexName="products")
        r.fields["id"].value.append(i)
        r.fields["brand"].value.append(brand)
        r.fields["name"].value.append(name)
        c.add_documents([r])
    c.refresh("products")
    # brands index (secondary side)
    c.create_index("brands")
    c.register_fields(pb.FieldDefRequest(indexName="brands", field=[
        pb.Field(name="id", type=pb.FieldType._ID, store=True),
        pb.Field(name="brand", type=pb.FieldType.ATOM, storeDocValues=True),
        pb.Field(name="about", type=pb.FieldType.TEXT, search=True),
    ]))
    c.start_index(pb.StartIndexRequest(indexName="brands", mode=pb.Mode.STANDALONE))
    for i, brand, about in [
        ("b1", "acme", "cartoon supplier of dangerous goods"),
        ("b2", "globex", "evil megacorp with dangerous plans"),
        ("b3", "initech", "boring software company"),
    ]:
        r = pb.AddDocumentRequest(indexName="brands")
        r.fields["id"].value.append(i)
        r.fields["brand"].value.append(brand)
        r.fields["about"].value.append(about)
        c.add_documents([r])
    c.refresh("brands")
    yield c
    c.close()
    srv.stop()


def _fill_join(x, text):
    # camelCase JSON names work under both the legacy and the wire-compat
    # (reference snake_case declared names) schemas
    ParseDict(
        {
            "index": "brands",
            "primaryField": "brand",
            "secondaryField": "brand",
            "query": {"matchQuery": {"field": "about", "query": text}},
        },
        x,
    )


def _join_request(text, score_mode=None):
    req = pb.SearchRequest(indexName="products", topHits=10, retrieveFields=["id"])
    x = req.query.crossIndexQuery
    _fill_join(x, text)
    if score_mode is not None:
        ParseDict({"scoreMode": score_mode}, x)
    return req


def _ids(resp):
    return sorted(h.fields["id"].fieldValue[0].textValue for h in resp.hits)


def test_cross_index_join(server):
    # brands matching "dangerous": acme, globex -> their products
    resp = server.search(_join_request("dangerous"))
    assert _ids(resp) == ["p1", "p2", "p3"]
    # default score mode: constant 1.0
    assert all(h.score == pytest.approx(1.0) for h in resp.hits)


def test_cross_index_join_score_max(server):
    resp = server.search(
        _join_request("dangerous", pb.CrossIndexQuery.JOIN_SCORE_MAX)
    )
    assert _ids(resp) == ["p1", "p2", "p3"]
    got = {h.fields["id"].fieldValue[0].textValue: h.score for h in resp.hits}
    # products of the same brand share the brand's aggregated score
    assert got["p1"] == pytest.approx(got["p2"])
    assert all(s > 0 for s in got.values())


def test_cross_index_join_no_matches(server):
    resp = server.search(_join_request("nonexistent-term"))
    assert resp.totalHits.value == 0


def test_cross_index_inside_boolean(server):
    req = pb.SearchRequest(indexName="products", topHits=10, retrieveFields=["id"])
    bq = req.query.booleanQuery
    c1 = bq.clauses.add()
    c1.occur = pb.BooleanClause.MUST
    c1.query.matchQuery.field = "name"
    c1.query.matchQuery.query = "anvil skates board"
    c2 = bq.clauses.add()
    c2.occur = pb.BooleanClause.FILTER
    _fill_join(c2.query.crossIndexQuery, "cartoon")
    resp = server.search(req)
    assert _ids(resp) == ["p1", "p2"]  # only acme products


def test_cross_index_unknown_index_errors(server):
    req = _join_request("dangerous")
    req.query.crossIndexQuery.index = "nope"
    with pytest.raises(grpc.RpcError):
        server.search(req)


def test_cross_index_inside_rescorer(server):
    # recall all products, rescore by a join against brands matching
    # "dangerous" (acme, globex): their products get boosted above initech's
    req = pb.SearchRequest(indexName="products", topHits=10, retrieveFields=["id"])
    req.query.matchAllQuery.SetInParent()
    rs = req.rescorers.add()
    rs.windowSize = 10
    _fill_join(rs.queryRescorer.rescoreQuery.crossIndexQuery, "dangerous")
    rs.queryRescorer.queryWeight = 1.0
    rs.queryRescorer.rescoreQueryWeight = 5.0
    resp = server.search(req)
    got = {h.fields["id"].fieldValue[0].textValue: h.score for h in resp.hits}
    assert set(got) == {"p1", "p2", "p3", "p4"}
    # joined products (acme/globex) outrank the unjoined initech product
    assert min(got["p1"], got["p2"], got["p3"]) > got["p4"]
