"""Multi-field sort: lexicographic semantics, ties, missing values,
docid/score components, searchAfter-with-sort cursors.

Reference: SortParser consumes repeated SortType
(server/search/sort/SortParser.java:39, search.proto:1066-1081); special
field names "docid" and "score" (SortParser.java:43-44); missingLast applies
before reverse (search.proto:1074 comment).
"""

import numpy as np
import pytest

from nrtsearch_tpu.core.searcher import Searcher, SortComponent, SortSpec
from nrtsearch_tpu.core.writer import IndexWriter
from nrtsearch_tpu.query.plan import parse_query
from nrtsearch_tpu.schema.fields import create_field_def

FIELDS = {
    "doc_id": create_field_def("doc_id", {"type": "_ID", "storeDocValues": True}),
    "body": create_field_def("body", {"type": "TEXT", "search": True}),
    "grp": create_field_def("grp", {"type": "INT", "storeDocValues": True}),
    "price": create_field_def("price", {"type": "FLOAT", "storeDocValues": True}),
    "rank": create_field_def("rank", {"type": "INT", "storeDocValues": True}),
}

# grp has heavy ties so the secondary key decides; price missing on doc 6
DOCS = [
    {"doc_id": "1", "body": "alpha common", "grp": "2", "price": "5.0", "rank": "7"},
    {"doc_id": "2", "body": "alpha common", "grp": "1", "price": "9.0", "rank": "3"},
    {"doc_id": "3", "body": "alpha common", "grp": "2", "price": "1.0", "rank": "5"},
    {"doc_id": "4", "body": "alpha common", "grp": "1", "price": "9.0", "rank": "1"},
    {"doc_id": "5", "body": "alpha common", "grp": "2", "price": "5.0", "rank": "2"},
    {"doc_id": "6", "body": "alpha common", "grp": "1", "rank": "9"},
    {"doc_id": "7", "body": "alpha rare", "grp": "3", "price": "2.0", "rank": "4"},
]


def build(docs=DOCS, merge_factor=10):
    w = IndexWriter(FIELDS, merge_factor=merge_factor)
    w.add_documents(docs)
    return Searcher(w.refresh(), FIELDS, version=1)


def spec(*comps):
    cs = [SortComponent(*c) if isinstance(c, tuple) else c for c in comps]
    return SortSpec(cs[0].field, cs[0].reverse, cs[0].missing_last,
                    rest=tuple(cs[1:]))


def ords(td):
    return [h.global_ord for h in td.hits]


QUERY = parse_query({"matchQuery": {"field": "body", "query": "alpha"}})


def ref_order(keyfn, docs=DOCS):
    rows = sorted(range(len(docs)), key=keyfn)
    return rows


def test_two_key_sort_asc_asc():
    s = build()
    td = s.search(QUERY, 10, sort=spec(("grp", False, False), ("price", False, False)))
    # grp asc, then price asc; missing price (doc 6) sorts FIRST (missing_last=False)
    expect = ref_order(lambda i: (int(DOCS[i]["grp"]),
                                  float(DOCS[i].get("price", -np.inf)), i))
    assert ords(td) == expect


def test_two_key_primary_desc_secondary_asc():
    s = build()
    td = s.search(QUERY, 10, sort=spec(("grp", True, False), ("rank", False, False)))
    expect = ref_order(lambda i: (-int(DOCS[i]["grp"]), int(DOCS[i]["rank"]), i))
    assert ords(td) == expect


def test_tie_break_by_docid():
    s = build()
    # grp alone: ties inside groups break by doc id ascending
    td = s.search(QUERY, 10, sort=spec(("grp", False, False), ("price", False, True)))
    # within grp, price asc with missing LAST (doc 6 at the end of grp 1)
    expect = ref_order(lambda i: (int(DOCS[i]["grp"]),
                                  float(DOCS[i].get("price", np.inf)), i))
    assert ords(td) == expect


def test_missing_last_before_reverse():
    s = build()
    # price desc with missing_last=True: missing goes last in NATURAL order,
    # reverse then flips it to the FRONT (reference contract)
    td = s.search(QUERY, 10, sort=spec(("price", True, True)))
    expect = ref_order(lambda i: (-float(DOCS[i].get("price", np.inf)), i))
    assert ords(td) == expect


def test_three_keys():
    s = build()
    td = s.search(
        QUERY, 10,
        sort=spec(("grp", False, False), ("price", True, False), ("rank", False, False)),
    )
    expect = ref_order(
        lambda i: (int(DOCS[i]["grp"]),
                   -float(DOCS[i].get("price", -np.inf)),
                   int(DOCS[i]["rank"]), i)
    )
    assert ords(td) == expect


def test_docid_component():
    s = build()
    td = s.search(QUERY, 10, sort=spec(("grp", False, False), ("docid", False, False)))
    expect = ref_order(lambda i: (int(DOCS[i]["grp"]), i))
    assert ords(td) == expect
    td = s.search(QUERY, 10, sort=spec(("docid", True, False)))
    assert ords(td) == list(range(len(DOCS)))[::-1]


def test_score_component():
    s = build()
    # primary grp asc, secondary score: within a group, better-matching docs
    # first ("rare" only matches doc 7 -> its score differs)
    td = s.search(QUERY, 10, sort=spec(("grp", False, False), ("score", False, False)))
    assert ords(td)[:1] != []  # runs the score-in-sort path without error
    # score as PRIMARY: natural order is score DESC (SortParser.java:66-70)
    td_score = s.search(QUERY, 10, sort=spec(("score", False, False), ("docid", False, False)))
    td_rel = s.search(QUERY, 10)
    assert ords(td_score) == [h.global_ord for h in td_rel.hits]


def test_multi_segment_merge():
    w = IndexWriter(FIELDS, merge_factor=100)
    w.add_documents(DOCS[:3])
    w.refresh()
    w.add_documents(DOCS[3:])
    s = Searcher(w.refresh(), FIELDS, version=2)
    assert len(s.segments) >= 2
    td = s.search(QUERY, 10, sort=spec(("grp", False, False), ("price", False, False)))
    expect = ref_order(lambda i: (int(DOCS[i]["grp"]),
                                  float(DOCS[i].get("price", -np.inf)), i))
    assert ords(td) == expect


def test_single_field_missing_default_first():
    s = build()
    td = s.search(QUERY, 10, sort=spec(("price", False, False), ("docid", False, False)))
    expect = ref_order(lambda i: (float(DOCS[i].get("price", -np.inf)), i))
    assert ords(td) == expect


# ---- server-level: sortedFields list + searchAfter cursor --------------------


@pytest.fixture()
def handlers(tmp_path):
    from nrtsearch_tpu.config import NrtsearchConfig
    from nrtsearch_tpu.gen import pb
    from nrtsearch_tpu.server.handlers import Handlers
    from nrtsearch_tpu.state.backend import LocalStateBackend
    from nrtsearch_tpu.state.global_state import GlobalState

    cfg = NrtsearchConfig.from_dict({
        "stateDir": str(tmp_path / "state"), "indexDir": str(tmp_path / "index"),
    })
    gs = GlobalState(cfg, LocalStateBackend(cfg.state_dir))
    h = Handlers(gs)
    h.createIndex(pb.CreateIndexRequest(indexName="idx"))
    from google.protobuf import json_format

    freq = json_format.ParseDict(
        {"indexName": "idx", "field": [
            {"name": "id", "type": "_ID", "store": True},
            {"name": "body", "type": "TEXT", "search": True},
            {"name": "grp", "type": "INT", "storeDocValues": True},
            {"name": "price", "type": "FLOAT", "storeDocValues": True},
        ]}, pb.FieldDefRequest(),
    )
    h.registerFields(freq)
    h.startIndex(pb.StartIndexRequest(indexName="idx"))
    docs = [
        ("1", "2", "5.0"), ("2", "1", "9.0"), ("3", "2", "1.0"),
        ("4", "1", "9.0"), ("5", "2", "5.0"), ("6", "1", None),
    ]
    reqs = []
    for did, grp, price in docs:
        r = pb.AddDocumentRequest(indexName="idx")
        r.fields["id"].value.append(did)
        r.fields["body"].value.append("x common")
        r.fields["grp"].value.append(grp)
        if price is not None:
            r.fields["price"].value.append(price)
        reqs.append(r)
    h.addDocuments(iter(reqs))
    h.refresh(pb.RefreshRequest(indexName="idx"))
    return h


def _sorted_req(pb, top, comps, after=None):
    sreq = pb.SearchRequest(indexName="idx", topHits=top)
    sreq.retrieveFields.append("id")
    sreq.query.matchQuery.field = "body"
    sreq.query.matchQuery.query = "common"
    for name, rev in comps:
        sf = sreq.querySort.fields.sortedFields.add()
        sf.fieldName = name
        sf.reverse = rev
    if after is not None:
        sreq.searchAfter.lastDocId = after.lastDocId
        sreq.searchAfter.lastHitIndex = after.lastHitInfo.lastHitIndex
        for v in after.lastFieldValues:
            sreq.searchAfter.lastFieldValues.append(v)
    return sreq


def _ids(resp):
    return [h.fields["id"].fieldValue[0].textValue for h in resp.hits]


def test_handler_multi_sort_and_search_after(handlers):
    from nrtsearch_tpu.gen import pb

    resp = handlers.search(_sorted_req(pb, 3, [("grp", False), ("price", True)]))
    # grp asc then price desc; missing price sorts first in natural asc ->
    # LAST under price desc within grp 1
    assert _ids(resp) == ["2", "4", "6"], _ids(resp)
    assert set(resp.hits[0].sortedFields.keys()) == {"grp", "price"}

    # page 2 strictly after the cursor
    resp2 = handlers.search(
        _sorted_req(pb, 3, [("grp", False), ("price", True)],
                    after=resp.searchState)
    )
    assert _ids(resp2) == ["1", "5", "3"], _ids(resp2)


def test_handler_unsupported_sort_field_fails_loudly(handlers):
    from nrtsearch_tpu.gen import pb

    bad = _sorted_req(pb, 3, [("body", False)])
    with pytest.raises(ValueError):
        handlers.search(bad)
    bad2 = _sorted_req(pb, 3, [("nope", False)])
    with pytest.raises(ValueError):
        handlers.search(bad2)


@pytest.fixture()
def tie_handlers(tmp_path):
    """120 docs over 4 grp values x 5 prices: heavy ties at every sort
    level, 3 segments, 7 deleted docs (reference test model:
    SortedDocsPaginationTest-style exhaustive page walks)."""
    from google.protobuf import json_format

    from nrtsearch_tpu.config import NrtsearchConfig
    from nrtsearch_tpu.gen import pb
    from nrtsearch_tpu.server.handlers import Handlers
    from nrtsearch_tpu.state.backend import LocalStateBackend
    from nrtsearch_tpu.state.global_state import GlobalState

    cfg = NrtsearchConfig.from_dict({
        "stateDir": str(tmp_path / "state"),
        "indexDir": str(tmp_path / "index"),
    })
    gs = GlobalState(cfg, LocalStateBackend(cfg.state_dir))
    h = Handlers(gs)
    h.createIndex(pb.CreateIndexRequest(indexName="idx"))
    freq = json_format.ParseDict(
        {"indexName": "idx", "field": [
            {"name": "id", "type": "_ID", "store": True},
            {"name": "body", "type": "TEXT", "search": True},
            {"name": "grp", "type": "INT", "storeDocValues": True},
            {"name": "price", "type": "FLOAT", "storeDocValues": True},
        ]}, pb.FieldDefRequest(),
    )
    h.registerFields(freq)
    h.startIndex(pb.StartIndexRequest(indexName="idx"))
    rows = []
    for i in range(120):
        rows.append((str(i), i % 4, float((i // 4) % 5)))
    for lo in (0, 40, 80):
        reqs = []
        for did, grp, price in rows[lo:lo + 40]:
            r = pb.AddDocumentRequest(indexName="idx")
            r.fields["id"].value.append(did)
            r.fields["body"].value.append("common word")
            r.fields["grp"].value.append(str(grp))
            r.fields["price"].value.append(str(price))
            reqs.append(r)
        h.addDocuments(iter(reqs))
        h.refresh(pb.RefreshRequest(indexName="idx"))
    deleted = {"7", "23", "41", "59", "77", "95", "113"}
    for did in deleted:
        r = pb.AddDocumentRequest(indexName="idx")
        r.fields["id"].value.append(did)
        h.delete(iter([r]))
    h.refresh(pb.RefreshRequest(indexName="idx"))
    live = [r for r in rows if r[0] not in deleted]
    return h, live


def test_deep_pagination_ties_no_skip_no_dup(tie_handlers):
    """Walk EVERY page of a tie-heavy two-key sort via searchAfter: union of
    pages == full live doc set, no duplicates, order consistent with the
    sort (grp asc, price desc, docid-order tie-break)."""
    from nrtsearch_tpu.gen import pb

    h, live = tie_handlers
    seen: list[str] = []
    after = None
    pages = 0
    while True:
        resp = h.search(_sorted_req(pb, 9, [("grp", False), ("price", True)],
                                    after=after))
        ids = _ids(resp)
        if not ids:
            break
        seen.extend(ids)
        after = resp.searchState
        pages += 1
        assert pages < 30, "pagination did not terminate"
    assert len(seen) == len(set(seen)), "duplicate docs across pages"
    assert set(seen) == {r[0] for r in live}, "missing or phantom docs"

    # global order check: keys must be non-strictly ordered page to page
    by_id = {r[0]: r for r in live}
    keys = [(by_id[i][1], -by_id[i][2]) for i in seen]
    assert keys == sorted(keys), "sort order violated across pages"


def test_deep_pagination_single_key_desc(tie_handlers):
    from nrtsearch_tpu.gen import pb

    h, live = tie_handlers
    seen: list[str] = []
    after = None
    while True:
        resp = h.search(_sorted_req(pb, 7, [("price", True)], after=after))
        ids = _ids(resp)
        if not ids:
            break
        seen.extend(ids)
        after = resp.searchState
        assert len(seen) <= 150
    assert len(seen) == len(set(seen)) == len(live)
    by_id = {r[0]: r for r in live}
    prices = [by_id[i][2] for i in seen]
    assert prices == sorted(prices, reverse=True)
