"""In-kernel flat reductions: facet counts / stats accumulate over the fused
kernel's unique-match stream, never materializing a dense [D] match mask
(VERDICT r2 #3 — the reference counts during the same doc walk that scores,
DrillSidewaysImpl). Parity oracle: the arrays-path collectors over the same
query, plus a pure-python recount."""

import numpy as np
import pytest

from nrtsearch_tpu.core.searcher import Searcher, SortSpec
from nrtsearch_tpu.core.writer import IndexWriter
from nrtsearch_tpu.query.plan import parse_query
from nrtsearch_tpu.schema.fields import create_field_def

FIELDS = {
    "id": create_field_def("id", {"type": "_ID", "storeDocValues": True}),
    "t": create_field_def("t", {"type": "TEXT", "search": True}),
    "tag": create_field_def("tag", {"type": "ATOM", "storeDocValues": True}),
    "price": create_field_def(
        "price", {"type": "INT", "storeDocValues": True, "sort": True}
    ),
}

TAGS = ["a", "b", "c", "d", "e"]


@pytest.fixture(scope="module")
def setup():
    import random

    rng = random.Random(5)
    words = [f"w{i}" for i in range(30)]
    docs = []
    w = IndexWriter(FIELDS, merge_factor=100)
    n = 0
    for _seg in range(3):
        batch = []
        for _ in range(90):
            d = {
                "id": str(n),
                "t": " ".join(rng.choices(words, k=6)),
                "tag": rng.choice(TAGS),
                "price": (n * 11) % 499,
            }
            batch.append(d)
            docs.append(d)
            n += 1
        w.add_documents(batch)
        w.refresh()
    searcher = Searcher(w.segments, FIELDS, version=1)
    return searcher, docs


def _oracle(docs, matched_ids):
    counts: dict = {}
    s = 0.0
    mn, mx = np.inf, -np.inf
    for d in docs:
        if int(d["id"]) in matched_ids:
            counts[d["tag"]] = counts.get(d["tag"], 0) + 1
            p = float(d["price"])
            s += p
            mn, mx = min(mn, p), max(mx, p)
    return counts, s, mn, mx


PLAN = [
    {"kind": "ordinal", "field": "tag"},
    {"kind": "sum", "field": "price"},
    {"kind": "min", "field": "price"},
    {"kind": "max", "field": "price"},
    {"kind": "count", "field": None},
]


@pytest.mark.parametrize("qdict", [
    {"matchQuery": {"field": "t", "query": "w0 w3 w7"}},
    {"matchQuery": {"field": "t", "query": "w1 w2", "operator": "MUST"}},
    {"booleanQuery": {"clauses": [
        {"occur": "MUST", "query": {"matchQuery": {"field": "t",
                                                   "query": "w5 w9"}}},
        {"occur": "FILTER", "query": {"rangeQuery": {"field": "price",
                                                     "upper": "250"}}},
    ]}},
])
def test_reduce_matches_oracle(setup, qdict):
    searcher, docs = setup
    node = parse_query(qdict)
    spec = searcher.compile_batchable(node, None)
    assert spec is not None
    td, (tag_counts, psum, pmin, pmax, n) = searcher.fast_search_reduce(
        spec, 10, PLAN
    )

    # the full match set from the reference path (independent evaluator)
    ref_td = searcher.search(node, 10)
    assert td.total_hits == ref_td.total_hits
    _, arrays = searcher.search(node, 10, return_arrays=True,
                                arrays_score_free=True)
    matched_ids = set()
    for seg_idx, (_, m) in enumerate(arrays):
        mm = np.asarray(m)[: searcher.segments[seg_idx].num_docs]
        for loc in np.nonzero(mm)[0]:
            matched_ids.add(int(searcher.bases[seg_idx]) + int(loc))

    want_counts, want_sum, want_min, want_max = _oracle(
        docs, {int(docs_id) for docs_id in matched_ids}
    )
    assert n == len(matched_ids) == td.total_hits
    assert tag_counts == want_counts
    assert psum == pytest.approx(want_sum, rel=1e-5)
    assert pmin == pytest.approx(want_min)
    assert pmax == pytest.approx(want_max)


def test_reduce_with_sort(setup):
    searcher, docs = setup
    node = parse_query({"matchQuery": {"field": "t", "query": "w0 w4"}})
    sort = SortSpec(field="price", reverse=False)
    spec = searcher.compile_batchable(node, sort)
    assert spec is not None
    td, (tag_counts, n) = searcher.fast_search_reduce(
        spec, 5, [{"kind": "ordinal", "field": "tag"},
                  {"kind": "count", "field": None}]
    )
    ref = searcher.search(node, 5, sort=sort)
    assert [h.global_ord for h in td.hits] == [h.global_ord for h in ref.hits]
    assert n == ref.total_hits
    assert sum(tag_counts.values()) == ref.total_hits


def test_reduce_non_ordinal_field_errors(setup):
    searcher, _ = setup
    node = parse_query({"matchQuery": {"field": "t", "query": "w0"}})
    spec = searcher.compile_batchable(node, None)
    with pytest.raises(ValueError):
        searcher.fast_search_reduce(
            spec, 5, [{"kind": "ordinal", "field": "price"}]
        )


def test_multivalued_and_mixed_shapes_fall_back(tmp_path):
    """Kernel-reduce eligibility: multi-valued facet fields and MIXED facet
    shapes (one plain + one sampled) must route the WHOLE request through
    the arrays path — results stay correct either way."""
    from google.protobuf.json_format import ParseDict

    from nrtsearch_tpu.client import NrtsearchClient
    from nrtsearch_tpu.config import NrtsearchConfig
    from nrtsearch_tpu.gen import pb
    from nrtsearch_tpu.server.grpc_server import NrtsearchServer

    srv = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": str(tmp_path / "s"), "indexDir": str(tmp_path / "i")}
    ))
    port = srv.start(0)
    c = NrtsearchClient(f"localhost:{port}")
    c.create_index("mv")
    c.register_fields(ParseDict({"indexName": "mv", "field": [
        {"name": "id", "type": "_ID", "store": True},
        {"name": "t", "type": "TEXT", "search": True},
        {"name": "tags", "type": "ATOM", "storeDocValues": True,
         "multiValued": True},
        {"name": "color", "type": "ATOM", "storeDocValues": True},
    ]}, pb.FieldDefRequest()))
    c.start_index(pb.StartIndexRequest(indexName="mv", mode=pb.Mode.STANDALONE))
    rows = [("0", ["a", "b"], "red"), ("1", ["b"], "blue"),
            ("2", ["a", "c"], "red"), ("3", ["c"], "green")]
    for i, tags, color in rows:
        r = pb.AddDocumentRequest(indexName="mv")
        r.fields["id"].value.append(i)
        r.fields["t"].value.append("common text")
        for t in tags:
            r.fields["tags"].value.append(t)
        r.fields["color"].value.append(color)
        c.add_documents([r])
    c.refresh("mv")

    # multi-valued facet: arrays path, per-doc multi-label counting
    req = ParseDict({"indexName": "mv", "topHits": 4,
        "query": {"matchQuery": {"field": "t", "query": "common"}},
        "facets": [{"dim": "tags", "topN": 10, "name": "tags"}]},
        pb.SearchRequest())
    resp = c.search(req)
    got = {lv.label: lv.value for lv in resp.facetResult[0].labelValues}
    assert got == {"a": 2, "b": 2, "c": 2}, got

    # mixed shapes: plain (kernel-eligible alone) + sampled (never) — whole
    # request must stay consistent on the arrays path
    req2 = ParseDict({"indexName": "mv", "topHits": 4,
        "query": {"matchQuery": {"field": "t", "query": "common"}},
        "facets": [
            {"dim": "color", "topN": 10, "name": "colors"},
            {"dim": "color", "topN": 10, "sampleTopDocs": 2,
             "name": "sampled"},
        ]}, pb.SearchRequest())
    resp2 = c.search(req2)
    by_name = {fr.name: {lv.label: lv.value for lv in fr.labelValues}
               for fr in resp2.facetResult}
    assert by_name["colors"] == {"red": 2, "blue": 1, "green": 1}
    assert sum(by_name["sampled"].values()) == 2  # top-2 ranked docs only
    c.close()
    srv.stop()
