"""POLYGON field type + geoPointQuery (polygon contains point) and
geoPolygonQuery (LAT_LON point within polygons, with holes) — over real gRPC.

Reference behavior: field/PolygonfieldDef.java (GeoJSON parse, one polygon
per doc, struct stored value, getGeoPointQuery point containment) and
field/LatLonFieldDef.getGeoPolygonQuery (points within polygons)."""

import json

import grpc
import pytest

from nrtsearch_tpu.client import NrtsearchClient
from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.grpc_server import NrtsearchServer


def _geojson(outer, holes=()):
    """Rings as (lat, lon) tuples -> GeoJSON dict ([lon, lat] order)."""
    return json.dumps(
        {
            "type": "Polygon",
            "coordinates": [
                [[lon, lat] for lat, lon in ring] for ring in (outer, *holes)
            ],
        }
    )

# axis-aligned unit squares (closed rings), easy to reason about
SQUARE_A = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)]
HOLE_A = [(4.0, 4.0), (4.0, 6.0), (6.0, 6.0), (6.0, 4.0), (4.0, 4.0)]
SQUARE_B = [(20.0, 20.0), (20.0, 30.0), (30.0, 30.0), (30.0, 20.0), (20.0, 20.0)]


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("poly")
    srv = NrtsearchServer(
        NrtsearchConfig.from_dict(
            {"stateDir": str(tmp / "state"), "indexDir": str(tmp / "index")}
        )
    )
    port = srv.start(0)
    client = NrtsearchClient(f"localhost:{port}")
    client.create_index("geo")
    client.register_fields(
        pb.FieldDefRequest(
            indexName="geo",
            field=[
                pb.Field(name="doc_id", type=pb.FieldType._ID, store=True),
                pb.Field(name="area", type=pb.FieldType.POLYGON,
                         storeDocValues=True, store=True),
                pb.Field(name="pt", type=pb.FieldType.LAT_LON,
                         storeDocValues=True),
            ],
        )
    )
    client.start_index(pb.StartIndexRequest(indexName="geo", mode=pb.Mode.STANDALONE))
    docs = [
        ("holed", _geojson(SQUARE_A, holes=[HOLE_A]), (1.0, 1.0)),
        ("north", _geojson(SQUARE_B), (25.0, 25.0)),
        ("point_only", None, (5.0, 5.0)),
    ]
    reqs = []
    for i, poly, (lat, lon) in docs:
        r = pb.AddDocumentRequest(indexName="geo")
        r.fields["doc_id"].value.append(i)
        if poly is not None:
            r.fields["area"].value.append(poly)
        r.fields["pt"].value.extend([str(lat), str(lon)])
        reqs.append(r)
    client.add_documents(reqs)
    client.refresh("geo")
    yield client
    client.close()
    srv.stop()


def _ids(resp):
    return sorted(
        h.fields["doc_id"].fieldValue[0].textValue for h in resp.hits
    )


def _point_query(lat, lon):
    req = pb.SearchRequest(indexName="geo", topHits=10, retrieveFields=["doc_id"])
    req.query.geoPointQuery.field = "area"
    req.query.geoPointQuery.point.latitude = lat
    req.query.geoPointQuery.point.longitude = lon
    return req


def _polygon_query(*polygons):
    req = pb.SearchRequest(indexName="geo", topHits=10, retrieveFields=["doc_id"])
    req.query.geoPolygonQuery.field = "pt"
    for outer, holes in polygons:
        p = req.query.geoPolygonQuery.polygons.add()
        for lat, lon in outer:
            pt = p.points.add()
            pt.latitude, pt.longitude = lat, lon
        for ring in holes:
            h = p.holes.add()
            for lat, lon in ring:
                pt = h.points.add()
                pt.latitude, pt.longitude = lat, lon
    return req


def test_polygon_contains_point(server):
    assert _ids(server.search(_point_query(2.0, 2.0))) == ["holed"]
    assert _ids(server.search(_point_query(25.0, 25.0))) == ["north"]
    assert _ids(server.search(_point_query(-5.0, -5.0))) == []


def test_polygon_hole_excludes_point(server):
    # (5, 5) is inside SQUARE_A's outer ring but inside its hole
    assert _ids(server.search(_point_query(5.0, 5.0))) == []
    # just outside the hole, still inside the square
    assert _ids(server.search(_point_query(3.0, 5.0))) == ["holed"]


def test_geo_polygon_query_points_in_polygon(server):
    # triangle around (5, 5) only
    tri = [(4.0, 4.0), (4.0, 7.0), (7.0, 5.0)]
    assert _ids(server.search(_polygon_query((tri, ())))) == ["point_only"]


def test_geo_polygon_query_with_hole_and_multiple(server):
    # SQUARE_A with its hole: (1,1) inside, (5,5) in the hole -> excluded
    assert _ids(server.search(_polygon_query((SQUARE_A, [HOLE_A])))) == ["holed"]
    # two polygons OR together
    assert _ids(
        server.search(_polygon_query((SQUARE_A, [HOLE_A]), (SQUARE_B, ())))
    ) == ["holed", "north"]


def test_polygon_retrieve_struct(server):
    req = pb.SearchRequest(
        indexName="geo", topHits=10, retrieveFields=["doc_id", "area"]
    )
    req.query.geoPointQuery.field = "area"
    req.query.geoPointQuery.point.latitude = 25.0
    req.query.geoPointQuery.point.longitude = 25.0
    resp = server.search(req)
    assert len(resp.hits) == 1
    struct = resp.hits[0].fields["area"].fieldValue[0].structValue
    assert struct["type"] == "Polygon"
    ring = struct["coordinates"][0]
    assert list(ring[0]) == [20.0, 20.0]  # [lon, lat]


def test_polygon_survives_commit_reload(server):
    server.commit("geo")
    server.stop_index("geo")
    server.start_index(
        pb.StartIndexRequest(indexName="geo", mode=pb.Mode.STANDALONE)
    )
    assert _ids(server.search(_point_query(2.0, 2.0))) == ["holed"]
    assert _ids(server.search(_point_query(5.0, 5.0))) == []  # hole intact


def test_invalid_geojson_rejected(server):
    r = pb.AddDocumentRequest(indexName="geo")
    r.fields["doc_id"].value.append("bad")
    r.fields["area"].value.append('{"type": "LineString", "coordinates": []}')
    with pytest.raises(grpc.RpcError) as ei:
        server.add_documents([r])
    assert "geojson" in ei.value.details().lower()


def test_multipolygon_rejected(server):
    mp = json.dumps(
        {
            "type": "MultiPolygon",
            "coordinates": [
                [[[0, 0], [1, 0], [0, 1], [0, 0]]],
                [[[5, 5], [6, 5], [5, 6], [5, 5]]],
            ],
        }
    )
    r = pb.AddDocumentRequest(indexName="geo")
    r.fields["doc_id"].value.append("bad2")
    r.fields["area"].value.append(mp)
    with pytest.raises(grpc.RpcError) as ei:
        server.add_documents([r])
    assert "Multipolygon" in ei.value.details()


def test_geo_point_query_on_latlon_field_errors(server):
    req = _point_query(5.0, 5.0)
    req.query.geoPointQuery.field = "pt"
    with pytest.raises(grpc.RpcError):
        server.search(req)


def test_non_json_polygon_rejected(server):
    r = pb.AddDocumentRequest(indexName="geo")
    r.fields["doc_id"].value.append("bad3")
    r.fields["area"].value.append("not json at all")
    with pytest.raises(grpc.RpcError) as ei:
        server.add_documents([r])
    assert "Invalid geojson" in ei.value.details()
