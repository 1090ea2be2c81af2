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
    # the first work unit (a doc-space chunk on the fused path) always
    # completes: partial results, never empty
    assert td.total_hits >= 1


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


def test_chunked_timeout_full_parity():
    """Doc-space chunked dispatch with a generous deadline returns exactly
    the single-dispatch fused result (scores, docs, hit counts) — chunking
    must not change semantics, only add cutoff points."""
    import random

    from nrtsearch_tpu.core.searcher import Searcher, SortSpec
    from nrtsearch_tpu.core.writer import IndexWriter
    from nrtsearch_tpu.query.plan import parse_query
    from nrtsearch_tpu.schema.fields import create_field_def

    fields = {
        "id": create_field_def("id", {"type": "_ID"}),
        "t": create_field_def("t", {"type": "TEXT", "search": True}),
        "price": create_field_def(
            "price", {"type": "INT", "storeDocValues": True, "sort": True}
        ),
    }
    rng = random.Random(3)
    words = [f"w{i}" for i in range(20)]
    w = IndexWriter(fields)
    w.add_documents([
        {"id": str(i), "t": " ".join(rng.choices(words, k=6)),
         "price": (i * 17) % 331}
        for i in range(400)
    ])
    w.refresh()
    s = Searcher(w.segments, fields, version=1)

    for qd, sort in [
        ({"matchQuery": {"field": "t", "query": "w1 w4 w9"}}, None),
        ({"matchQuery": {"field": "t", "query": "w2 w5"}},
         SortSpec(field="price", reverse=False)),
        ({"booleanQuery": {"clauses": [
            {"occur": "MUST", "query": {"matchQuery": {
                "field": "t", "query": "w3"}}},
            {"occur": "FILTER", "query": {"rangeQuery": {
                "field": "price", "upper": "200"}}}]}}, None),
    ]:
        node = parse_query(qd)
        want = s.search(node, 10, sort=sort)
        got = s.search(node, 10, sort=sort, timeout_sec=30.0)
        assert not got.hit_timeout
        assert got.total_hits == want.total_hits, qd
        # rank-for-rank score parity; doc identity up to f32 score ties
        # (per-chunk padding perturbs summation order at the ulp level)
        import pytest as _pytest

        got_pairs = [(h.score if sort is None else h.sort_key, h.global_ord)
                     for h in got.hits]
        want_pairs = [(h.score if sort is None else h.sort_key, h.global_ord)
                      for h in want.hits]
        import os as _os

        _rel = 1e-3 if _os.environ.get("NRT_BUCKET") == "1" else 1e-5
        for (gs, gd), (ws, wd) in zip(got_pairs, want_pairs):
            assert gs == _pytest.approx(ws, rel=_rel, abs=1e-4), qd
        got_by_score = {}
        want_by_score = {}
        for sc, d in got_pairs:
            got_by_score.setdefault(round(float(sc), 4), set()).add(d)
        for sc, d in want_pairs:
            want_by_score.setdefault(round(float(sc), 4), set()).add(d)
        for sc, want_docs in want_by_score.items():
            gd = got_by_score.get(sc, set())
            # equal except possibly at the k-boundary tie group
            assert gd <= want_docs or want_docs <= gd, (qd, sc)


def test_chunked_timeout_cuts_off():
    """An already-expired deadline stops after the FIRST chunk: partial
    docid-prefix results, hit_timeout set, count relation lower-bound —
    even though the index is a SINGLE segment (the round-2 gap: one fused
    program could never cut off)."""
    import random

    from nrtsearch_tpu.core.searcher import Searcher
    from nrtsearch_tpu.core.writer import IndexWriter
    from nrtsearch_tpu.query.plan import parse_query
    from nrtsearch_tpu.schema.fields import create_field_def

    fields = {
        "id": create_field_def("id", {"type": "_ID"}),
        "t": create_field_def("t", {"type": "TEXT", "search": True}),
    }
    rng = random.Random(4)
    w = IndexWriter(fields)
    w.add_documents([
        {"id": str(i), "t": "common " + rng.choice("x y z".split())}
        for i in range(600)
    ])
    w.refresh()
    s = Searcher(w.segments, fields, version=1)
    assert len(s.segments) == 1

    node = parse_query({"matchQuery": {"field": "t", "query": "common"}})
    full = s.search(node, 10)
    assert full.total_hits == 600

    got = s.search(node, 10, timeout_sec=-1.0)  # pre-expired deadline
    assert got.hit_timeout
    assert got.relation == "GREATER_THAN_OR_EQUAL_TO"
    assert 0 < got.total_hits < 600  # first chunk only: a docid prefix
