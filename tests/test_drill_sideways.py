"""Drill-sideways facets: a dimension's own filter is excluded from its
counts (reference: DrillSidewaysImpl)."""

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
    c = NrtsearchClient(f"localhost:{port}")
    c.create_index("shop")
    c.register_fields(pb.FieldDefRequest(indexName="shop", field=[
        pb.Field(name="id", type=pb.FieldType._ID, store=True),
        pb.Field(name="name", type=pb.FieldType.TEXT, search=True),
        pb.Field(name="color", type=pb.FieldType.ATOM, storeDocValues=True),
        pb.Field(name="size", type=pb.FieldType.ATOM, storeDocValues=True),
    ]))
    c.start_index(pb.StartIndexRequest(indexName="shop", mode=pb.Mode.STANDALONE))
    rows = [
        ("0", "shirt", "red", "S"),
        ("1", "shirt", "red", "M"),
        ("2", "shirt", "blue", "M"),
        ("3", "shirt", "green", "L"),
        ("4", "pants", "red", "M"),
    ]
    reqs = []
    for i, n, col, sz in rows:
        r = pb.AddDocumentRequest(indexName="shop")
        r.fields["id"].value.append(i)
        r.fields["name"].value.append(n)
        r.fields["color"].value.append(col)
        r.fields["size"].value.append(sz)
        reqs.append(r)
    c.add_documents(reqs)
    c.refresh("shop")
    yield c
    c.close()
    srv.stop()


def test_drill_sideways(server):
    # drill down: shirts filtered to color=red; color facet must count ALL
    # shirt colors (sideways), size facet only red shirts (normal drill-down)
    req = pb.SearchRequest(indexName="shop", topHits=10, retrieveFields=["id"])
    bq = req.query.booleanQuery
    c1 = bq.clauses.add()
    c1.occur = pb.BooleanClause.MUST
    c1.query.matchQuery.field = "name"
    c1.query.matchQuery.query = "shirt"
    c2 = bq.clauses.add()
    c2.occur = pb.BooleanClause.FILTER
    c2.query.termQuery.field = "color"
    c2.query.termQuery.textValue = "red"
    f_color = req.facets.add()
    f_color.dim = "color"
    f_color.topN = 10
    f_size = req.facets.add()
    f_size.dim = "size"
    f_size.topN = 10
    resp = server.search(req)

    assert resp.totalHits.value == 2  # red shirts only
    by_dim = {fr.dim: {lv.label: lv.value for lv in fr.labelValues}
              for fr in resp.facetResult}
    # sideways: all shirt colors visible despite the color filter
    assert by_dim["color"] == {"red": 2, "blue": 1, "green": 1}
    # size facet honors the color filter
    assert by_dim["size"] == {"S": 1, "M": 1}


def test_hierarchy_facet(tmp_path):
    srv = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": str(tmp_path / "hs"), "indexDir": str(tmp_path / "hi")}
    ))
    port = srv.start(0)
    c = NrtsearchClient(f"localhost:{port}")
    try:
        c.create_index("cat")
        c.register_fields(pb.FieldDefRequest(indexName="cat", field=[
            pb.Field(name="id", type=pb.FieldType._ID, store=True),
            pb.Field(name="path", type=pb.FieldType.ATOM, storeDocValues=True,
                     multiValued=True),
        ]))
        c.start_index(pb.StartIndexRequest(indexName="cat", mode=pb.Mode.STANDALONE))
        rows = [
            ("0", ["clothing/shirts/tees"]),
            ("1", ["clothing/shirts/polos", "clothing/pants"]),
            ("2", ["clothing/pants"]),
            ("3", ["electronics/phones"]),
        ]
        reqs = []
        for i, paths in rows:
            r = pb.AddDocumentRequest(indexName="cat")
            r.fields["id"].value.append(i)
            for p in paths:
                r.fields["path"].value.append(p)
            reqs.append(r)
        c.add_documents(reqs)
        c.refresh("cat")

        req = pb.SearchRequest(indexName="cat", topHits=1)
        req.query.matchAllQuery.SetInParent()
        f = req.facets.add()
        f.dim = "path"
        f.paths.append("clothing")
        resp = c.search(req)
        fr = resp.facetResult[0]
        counts = {lv.label: lv.value for lv in fr.labelValues}
        assert counts == {"shirts": 2, "pants": 2}
        assert fr.value == 3  # docs under clothing/

        # one level deeper
        req2 = pb.SearchRequest(indexName="cat", topHits=1)
        req2.query.matchAllQuery.SetInParent()
        f2 = req2.facets.add()
        f2.dim = "path"
        f2.paths.extend(["clothing", "shirts"])
        resp2 = c.search(req2)
        counts2 = {lv.label: lv.value for lv in resp2.facetResult[0].labelValues}
        assert counts2 == {"tees": 1, "polos": 1}
    finally:
        c.close()
        srv.stop()


def test_sampled_facet_top_docs(server):
    # sampleTopDocs: counts over the top-N ranked docs only (reference:
    # facet/FacetTopDocs.java). topHits=10 retrieves all 4 shirts; the
    # sample is capped at 2 docs.
    req = pb.SearchRequest(indexName="shop", topHits=10, retrieveFields=["id"])
    req.query.matchQuery.field = "name"
    req.query.matchQuery.query = "shirt"
    f = req.facets.add()
    f.dim = "color"
    f.sampleTopDocs = 2
    resp = server.search(req)
    fr = resp.facetResult[0]
    assert fr.value == 2  # sampled docs, not the full 4-shirt match set
    assert sum(lv.value for lv in fr.labelValues) == 2
    # sample larger than the hit window: falls back to all ranked hits
    req.facets[0].sampleTopDocs = 100
    fr = server.search(req).facetResult[0]
    assert fr.value == 4
    got = {lv.label: lv.value for lv in fr.labelValues}
    assert got == {"red": 2, "blue": 1, "green": 1}


def test_sampled_facet_requires_doc_values(server):
    import grpc

    req = pb.SearchRequest(indexName="shop", topHits=10)
    req.query.matchQuery.field = "name"
    req.query.matchQuery.query = "shirt"
    f = req.facets.add()
    f.dim = "name"  # TEXT without storeDocValues
    f.sampleTopDocs = 2
    with pytest.raises(grpc.RpcError) as ei:
        server.search(req)
    assert "doc values" in ei.value.details()
