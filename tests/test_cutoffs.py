"""timeout / terminateAfter cutoff semantics (reference: SearchCutoffWrapper,
TerminateAfterWrapper)."""

import pytest

from nrtsearch_tpu.core.searcher import Searcher
from nrtsearch_tpu.core.writer import IndexWriter
from nrtsearch_tpu.query.plan import parse_query
from nrtsearch_tpu.schema.fields import create_field_def

FIELDS = {
    "id": create_field_def("id", {"type": "_ID", "store": True}),
    "t": create_field_def("t", {"type": "TEXT", "search": True}),
}


def build_multi_segment(n_segs=4, docs_per_seg=5):
    w = IndexWriter(FIELDS, merge_factor=100)
    n = 0
    for s in range(n_segs):
        w.add_documents([
            {"id": str(n + i), "t": f"common word doc {n + i}"}
            for i in range(docs_per_seg)
        ])
        w.refresh()
        n += docs_per_seg
    return Searcher(w.segments, FIELDS, version=1)


def test_terminate_after_stops_early():
    s = build_multi_segment()
    q = parse_query({"matchQuery": {"field": "t", "query": "common"}})
    td = s.search(q, 100)
    assert td.total_hits == 20 and td.relation == "EQUAL_TO"
    td2 = s.search(q, 100, terminate_after=5)
    assert td2.terminated_early
    assert td2.relation == "GREATER_THAN_OR_EQUAL_TO"
    assert 5 <= td2.total_hits < 20


def test_timeout_flag():
    s = build_multi_segment()
    q = parse_query({"matchQuery": {"field": "t", "query": "common"}})
    # timeout so small that segment 2+ is skipped
    td = s.search(q, 100, timeout_sec=1e-9)
    assert td.hit_timeout
    assert td.relation == "GREATER_THAN_OR_EQUAL_TO"
    assert td.total_hits >= 5  # first segment always completes


def test_over_grpc(tmp_path):
    from nrtsearch_tpu.client import NrtsearchClient
    from nrtsearch_tpu.config import NrtsearchConfig
    from nrtsearch_tpu.gen import pb
    from nrtsearch_tpu.server.grpc_server import NrtsearchServer

    srv = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": str(tmp_path / "s"), "indexDir": str(tmp_path / "i")}
    ))
    port = srv.start(0)
    c = NrtsearchClient(f"localhost:{port}")
    try:
        c.create_index("idx")
        c.register_fields(pb.FieldDefRequest(indexName="idx", field=[
            pb.Field(name="id", type=pb.FieldType._ID, store=True),
            pb.Field(name="t", type=pb.FieldType.TEXT, search=True),
        ]))
        c.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.STANDALONE))
        for batch in range(3):
            reqs = []
            for i in range(4):
                r = pb.AddDocumentRequest(indexName="idx")
                r.fields["id"].value.append(f"{batch}-{i}")
                r.fields["t"].value.append("shared term")
                reqs.append(r)
            c.add_documents(reqs)
            c.refresh("idx")
        req = pb.SearchRequest(indexName="idx", topHits=100, terminateAfter=3)
        req.query.matchQuery.field = "t"
        req.query.matchQuery.query = "shared"
        resp = c.search(req)
        assert resp.terminatedEarly
        assert resp.totalHits.relation == pb.TotalHits.Relation.GREATER_THAN_OR_EQUAL_TO
    finally:
        c.close()
        srv.stop()


def test_terminate_after_within_segment():
    """Within-segment exactness: a SINGLE-segment index terminates once the
    budget is hit (round-1 cut only at segment boundaries), collecting the
    first N matches in docid order."""
    w = IndexWriter(FIELDS, merge_factor=100)
    w.add_documents([{"id": str(i), "t": "term filler"} for i in range(50)])
    s = Searcher(w.refresh(), FIELDS, version=1)
    assert len(s.segments) == 1
    q = parse_query({"matchQuery": {"field": "t", "query": "term"}})
    td = s.search(q, 100, terminate_after=7)
    assert td.terminated_early
    assert td.relation == "GREATER_THAN_OR_EQUAL_TO"
    assert td.total_hits == 7
    # collected docs are the FIRST 7 in docid order (uniform scores)
    assert sorted(h.global_ord for h in td.hits) == list(range(7))
    # budget larger than matches: no termination
    td2 = s.search(q, 100, terminate_after=500)
    assert not td2.terminated_early
    assert td2.total_hits == 50
