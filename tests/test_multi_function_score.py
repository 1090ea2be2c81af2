"""MultiFunctionScoreQuery: weighted filter functions, geo decay scoring,
score/boost modes, min-score filtering — over real gRPC.

Reference behavior: query/multifunction/MultiFunctionScoreQuery.java
(computeFunctionScore, computeFinalScore, MinScoreWrapper),
GeoPointDecayFilterFunction.java and the Linear/Exponential/Guassian
DecayFunction computeScore/computeScale pairs."""

import math

import pytest

from nrtsearch_tpu.client import NrtsearchClient
from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.grpc_server import NrtsearchServer

ORIGIN = (37.7749, -122.4194)  # san francisco
DOCS = [
    # (id, text, (lat, lon), price)
    ("0", "coffee shop downtown", (37.7750, -122.4180), 2.0),
    ("1", "coffee roastery mission", (37.7599, -122.4148), 5.0),
    ("2", "coffee stand oakland", (37.8044, -122.2712), 3.0),
    ("3", "coffee bar san jose", (37.3382, -121.8863), 10.0),
]

R_EARTH = 6371008.7714


def _haversine_m(a, b):
    lat1, lon1, lat2, lon2 = map(math.radians, (a[0], a[1], b[0], b[1]))
    h = (
        math.sin((lat2 - lat1) / 2) ** 2
        + math.cos(lat1) * math.cos(lat2) * math.sin((lon2 - lon1) / 2) ** 2
    )
    return 2 * R_EARTH * math.asin(math.sqrt(h))


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mfs")
    srv = NrtsearchServer(
        NrtsearchConfig.from_dict(
            {"stateDir": str(tmp / "state"), "indexDir": str(tmp / "index")}
        )
    )
    port = srv.start(0)
    client = NrtsearchClient(f"localhost:{port}")
    client.create_index("idx")
    client.register_fields(
        pb.FieldDefRequest(
            indexName="idx",
            field=[
                pb.Field(name="doc_id", type=pb.FieldType._ID, store=True),
                pb.Field(name="body", type=pb.FieldType.TEXT, search=True),
                pb.Field(name="loc", type=pb.FieldType.LAT_LON, storeDocValues=True),
                pb.Field(name="price", type=pb.FieldType.FLOAT, storeDocValues=True),
            ],
        )
    )
    client.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.STANDALONE))
    reqs = []
    for i, body, (lat, lon), price in DOCS:
        r = pb.AddDocumentRequest(indexName="idx")
        r.fields["doc_id"].value.append(i)
        r.fields["body"].value.append(body)
        r.fields["loc"].value.extend([str(lat), str(lon)])
        r.fields["price"].value.append(str(price))
        reqs.append(r)
    client.add_documents(reqs)
    client.refresh("idx")
    yield client
    client.close()
    srv.stop()


def _base_request(**kwargs):
    req = pb.SearchRequest(indexName="idx", topHits=10, retrieveFields=["doc_id"], **kwargs)
    return req


def _ids(resp):
    return [h.fields["doc_id"].fieldValue[0].textValue for h in resp.hits]


def _scores(resp):
    return {
        h.fields["doc_id"].fieldValue[0].textValue: h.score for h in resp.hits
    }


def _decay_query(decay_type, scale, offset="", decay=0.5, boost_mode=None):
    req = _base_request()
    m = req.query.multiFunctionScoreQuery
    m.query.matchAllQuery.SetInParent()
    f = m.functions.add()
    f.decayFunction.fieldName = "loc"
    f.decayFunction.decayType = decay_type
    f.decayFunction.geoPoint.latitude = ORIGIN[0]
    f.decayFunction.geoPoint.longitude = ORIGIN[1]
    f.decayFunction.scale = scale
    if offset:
        f.decayFunction.offset = offset
    f.decayFunction.decay = decay
    if boost_mode is not None:
        m.boost_mode = boost_mode
    return req


def test_gaussian_decay_exact(server):
    # matchAll scores 1.0; boost mode multiply -> hit score == decay value
    resp = server.search(
        _decay_query(pb.MultiFunctionScoreQuery.DECAY_TYPE_GUASSIAN, "5 km")
    )
    got = _scores(resp)
    scale = -(5000.0**2) / (2.0 * math.log(0.5))
    for i, _, pt, _ in DOCS:
        d = _haversine_m(ORIGIN, pt)
        expect = math.exp(-(d**2) / (2.0 * scale))
        assert got[i] == pytest.approx(expect, rel=2e-3), i
    # nearer docs decay less
    assert _ids(resp) == ["0", "1", "2", "3"]


def test_linear_decay_with_offset(server):
    resp = server.search(
        _decay_query(
            pb.MultiFunctionScoreQuery.DECAY_TYPE_LINEAR, "10 km", offset="1 km"
        )
    )
    got = _scores(resp)
    scale = 10000.0 / (1.0 - 0.5)
    for i, _, pt, _ in DOCS:
        d = max(_haversine_m(ORIGIN, pt) - 1000.0, 0.0)
        expect = max((scale - d) / scale, 0.0)
        assert got[i] == pytest.approx(expect, rel=2e-3, abs=1e-6), i
    # doc 0 is within the offset -> full score 1.0
    assert got["0"] == pytest.approx(1.0)
    # doc 3 (~50 km away) is beyond scale' -> clamped to 0
    assert got["3"] == pytest.approx(0.0, abs=1e-6)


def test_exponential_decay_exact(server):
    resp = server.search(
        _decay_query(pb.MultiFunctionScoreQuery.DECAY_TYPE_EXPONENTIAL, "2 mi")
    )
    got = _scores(resp)
    scale = math.log(0.5) / (2 * 1609.344)
    for i, _, pt, _ in DOCS:
        d = _haversine_m(ORIGIN, pt)
        expect = math.exp(scale * d)
        assert got[i] == pytest.approx(expect, rel=2e-3), i


def test_score_mode_sum_with_filters_and_weights(server):
    req = _base_request()
    m = req.query.multiFunctionScoreQuery
    m.query.matchAllQuery.SetInParent()
    m.score_mode = pb.MultiFunctionScoreQuery.SCORE_MODE_SUM
    # function 1: price script, gated on body containing "mission"
    f1 = m.functions.add()
    f1.script.source = "price"
    f1.weight = 2.0
    f1.filter.matchQuery.field = "body"
    f1.filter.matchQuery.query = "mission"
    # function 2: constant weight function, no filter
    f2 = m.functions.add()
    f2.weight = 0.5
    got = _scores(server.search(req))
    # doc 1 matches the filter: 2*5.0 + 0.5 = 10.5; others: 0.5
    assert got["1"] == pytest.approx(10.5)
    for i in ("0", "2", "3"):
        assert got[i] == pytest.approx(0.5)


def test_score_mode_sum_no_function_matches(server):
    # all functions filtered out -> function score 1.0 (reference semantics)
    req = _base_request()
    m = req.query.multiFunctionScoreQuery
    m.query.matchAllQuery.SetInParent()
    m.score_mode = pb.MultiFunctionScoreQuery.SCORE_MODE_SUM
    m.boost_mode = pb.MultiFunctionScoreQuery.BOOST_MODE_SUM
    f = m.functions.add()
    f.script.source = "price"
    f.filter.matchQuery.field = "body"
    f.filter.matchQuery.query = "zzz-no-match"
    got = _scores(server.search(req))
    for i in ("0", "1", "2", "3"):
        assert got[i] == pytest.approx(2.0)  # 1.0 (inner) + 1.0 (no match)


def test_score_mode_multiply_skips_unmatched(server):
    req = _base_request()
    m = req.query.multiFunctionScoreQuery
    m.query.matchAllQuery.SetInParent()
    f1 = m.functions.add()
    f1.script.source = "price"
    f2 = m.functions.add()
    f2.script.source = "price"
    f2.filter.matchQuery.field = "body"
    f2.filter.matchQuery.query = "oakland"
    got = _scores(server.search(req))
    assert got["2"] == pytest.approx(9.0)   # 3.0 * 3.0
    assert got["1"] == pytest.approx(5.0)   # unmatched filter -> factor 1
    assert got["3"] == pytest.approx(10.0)


def test_boost_mode_replace_and_min_score(server):
    req = _base_request()
    m = req.query.multiFunctionScoreQuery
    m.query.matchQuery.field = "body"
    m.query.matchQuery.query = "coffee"
    m.boost_mode = pb.MultiFunctionScoreQuery.BOOST_MODE_REPLACE
    m.min_score = 3.0
    f = m.functions.add()
    f.script.source = "price"
    resp = server.search(req)
    got = _scores(resp)
    # scores replaced by price; docs below minScore (price < 3.0) are dropped
    assert set(got) == {"1", "2", "3"}
    assert got["3"] == pytest.approx(10.0)
    assert got["2"] == pytest.approx(3.0)  # == minScore, included by default

    m.min_excluded = True
    got = _scores(server.search(req))
    assert set(got) == {"1", "3"}  # 3.0 now excluded


def test_decay_on_non_latlon_field_errors(server):
    import grpc

    req = _decay_query(pb.MultiFunctionScoreQuery.DECAY_TYPE_GUASSIAN, "5 km")
    req.query.multiFunctionScoreQuery.functions[0].decayFunction.fieldName = "price"
    with pytest.raises(grpc.RpcError):
        server.search(req)


def test_decay_rate_out_of_range_errors(server):
    import grpc

    req = _decay_query(pb.MultiFunctionScoreQuery.DECAY_TYPE_GUASSIAN, "5 km", decay=1.0)
    with pytest.raises(grpc.RpcError) as ei:
        server.search(req)
    assert "decay rate" in ei.value.details()
