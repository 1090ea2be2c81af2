"""Randomized property matrix: queries x deletes x updates x multi-segment
x sort x paging x facets, validated against a pure-python oracle.

Complements tests/test_collector_matrix.py (a fixed 12-doc table): here a
seeded RNG builds a ~360-doc index across 6 refresh batches (6 segments),
deletes ~10% of ids spread across ALL segments, and re-adds (updates) a
further slice so update-as-delete+add paths are exercised. Every assertion
recomputes the expectation from the live-doc table, so a merge/deletes/
collector interaction bug in any segment fails a concrete cell.

Reference test model: the randomized matrices of ServerTestCase subclasses
(reference src/test/java/com/yelp/nrtsearch/server/search/ and
collectors/), which drive the same doc table through many query shapes.
"""

import random

import pytest
from google.protobuf.json_format import ParseDict

from nrtsearch_tpu.client import NrtsearchClient
from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.grpc_server import NrtsearchServer

VOCAB = ["alpha", "beta", "gamma", "delta", "edge", "fox", "grid",
         "hub", "ion", "jet", "kelp", "lime"]
COLORS = ["red", "blue", "green", "amber", "teal"]
N_DOCS = 360
N_BATCHES = 6


def _build_table(seed=1234):
    rng = random.Random(seed)
    docs = {}
    for i in range(N_DOCS):
        did = str(i)
        docs[did] = {
            "id": did,
            "body": [rng.choice(VOCAB)
                     for _ in range(rng.randint(2, 6))],
            "color": rng.choice(COLORS),
            "price": rng.randint(0, 500),
        }
    deleted = set(rng.sample(sorted(docs), 36))
    updated = rng.sample([d for d in sorted(docs) if d not in deleted], 24)
    updates = {
        did: {
            "id": did,
            "body": [rng.choice(VOCAB) for _ in range(rng.randint(2, 6))],
            "color": rng.choice(COLORS),
            "price": rng.randint(0, 500),
        }
        for did in updated
    }
    return docs, deleted, updates


DOCS, DELETED, UPDATES = _build_table()
LIVE = {
    did: UPDATES.get(did, d)
    for did, d in DOCS.items() if did not in DELETED
}


def _add_req(doc):
    r = pb.AddDocumentRequest(indexName="pmx")
    r.fields["id"].value.append(doc["id"])
    r.fields["body"].value.append(" ".join(doc["body"]))
    r.fields["color"].value.append(doc["color"])
    r.fields["price"].value.append(str(doc["price"]))
    return r


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pmx")
    srv = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": str(tmp / "s"), "indexDir": str(tmp / "i")}
    ))
    port = srv.start(0)
    c = NrtsearchClient(f"localhost:{port}")
    c.create_index("pmx")
    c.register_fields(pb.FieldDefRequest(indexName="pmx", field=[
        pb.Field(name="id", type=pb.FieldType._ID, store=True,
                 storeDocValues=True),
        pb.Field(name="body", type=pb.FieldType.TEXT, search=True),
        pb.Field(name="color", type=pb.FieldType.ATOM, storeDocValues=True,
                 search=True),
        pb.Field(name="price", type=pb.FieldType.INT, storeDocValues=True,
                 sort=True),
    ]))
    c.start_index(pb.StartIndexRequest(indexName="pmx",
                                       mode=pb.Mode.STANDALONE))
    per = N_DOCS // N_BATCHES
    ids = sorted(DOCS, key=int)
    for b in range(N_BATCHES):
        batch = ids[b * per:(b + 1) * per]
        c.add_documents([_add_req(DOCS[d]) for d in batch])
        c.refresh("pmx")          # one segment per batch
    # deletes hit docs in every segment
    for did in sorted(DELETED, key=int):
        r = pb.AddDocumentRequest(indexName="pmx")
        r.fields["id"].value.append(did)
        c.delete(r)
    # updates re-add under the same _ID (delete+add semantics)
    c.add_documents([_add_req(u) for u in UPDATES.values()])
    c.refresh("pmx")
    yield c
    c.close()
    srv.stop()


# Lucene docid order: original insertion order, except updated docs are
# delete+re-add and take NEW docids at the end (tie-breaks sort by this,
# not by the id string)
_DOC_SEQ = {did: i for i, did in enumerate(sorted(DOCS, key=int))}
for _i, _did in enumerate(UPDATES):
    _DOC_SEQ[_did] = N_DOCS + _i


def _seq(d):
    return _DOC_SEQ[d["id"]]


def _oracle(terms=(), must=(), must_not=(), price_range=None):
    # Lucene BooleanQuery membership: SHOULD clauses gate matching ONLY
    # when no MUST/FILTER clause exists (minimumNumberShouldMatch=0
    # otherwise — filter-only matches are hits, SHOULD just scores)
    has_required = bool(must) or price_range is not None
    out = []
    for d in LIVE.values():
        body = d["body"]
        if terms and not has_required and not any(t in body for t in terms):
            continue
        if any(t not in body for t in must):
            continue
        if any(t in body for t in must_not):
            continue
        if price_range is not None:
            lo, hi = price_range
            if not (lo <= d["price"] <= hi):
                continue
        out.append(d)
    return out


def _query(terms=(), must=(), must_not=(), price_range=None):
    clauses = []
    if terms:
        clauses.append({"occur": "SHOULD", "query": {"matchQuery": {
            "field": "body", "query": " ".join(terms)}}})
    for t in must:
        clauses.append({"occur": "MUST", "query": {"termQuery": {
            "field": "body", "textValue": t}}})
    for t in must_not:
        clauses.append({"occur": "MUST_NOT", "query": {"termQuery": {
            "field": "body", "textValue": t}}})
    if price_range is not None:
        lo, hi = price_range
        clauses.append({"occur": "FILTER", "query": {"rangeQuery": {
            "field": "price", "lower": str(lo), "upper": str(hi)}}})
    return {"booleanQuery": {"clauses": clauses}}


def _search(server, query, *, top=N_DOCS, sort=None, after=None,
            collectors=None, start_hit=0):
    req = {
        "indexName": "pmx", "topHits": top, "retrieveFields": ["id"],
        "query": query, "startHit": start_hit,
    }
    if sort:
        req["querySort"] = {"fields": {"sortedFields": sort}}
    if collectors:
        req["collectors"] = collectors
    r = ParseDict(req, pb.SearchRequest())
    if after is not None:
        # cursor from the previous page's last hit (LastHitInfo shape,
        # test_multi_sort.py:209 pattern)
        r.searchAfter.lastDocId = after.lastDocId
        r.searchAfter.lastHitIndex = after.lastHitInfo.lastHitIndex
        for v in after.lastFieldValues:
            r.searchAfter.lastFieldValues.append(v)
    return server.search(r)


def _rand_specs(n, seed):
    rng = random.Random(seed)
    specs = []
    for _ in range(n):
        spec = {}
        kind = rng.randrange(4)
        if kind == 0:
            spec["terms"] = tuple(rng.sample(VOCAB, rng.randint(1, 3)))
        elif kind == 1:
            spec["must"] = tuple(rng.sample(VOCAB, rng.randint(1, 2)))
        elif kind == 2:
            spec["terms"] = tuple(rng.sample(VOCAB, 2))
            spec["must_not"] = (rng.choice(VOCAB),)
        else:
            spec["terms"] = tuple(rng.sample(VOCAB, 2))
            lo = rng.randint(0, 300)
            spec["price_range"] = (lo, lo + rng.randint(50, 200))
        specs.append(spec)
    return specs


@pytest.mark.parametrize("spec", _rand_specs(10, seed=7),
                         ids=lambda s: "+".join(
                             f"{k}={v}" for k, v in sorted(s.items())))
def test_hit_sets_and_counts(server, spec):
    """Exact hit-set equality + totalHits for random boolean shapes."""
    resp = _search(server, _query(**spec))
    got = {h.fields["id"].fieldValue[0].textValue for h in resp.hits}
    want = {d["id"] for d in _oracle(**spec)}
    assert got == want, spec
    assert resp.totalHits.value == len(want), spec
    assert not (got & DELETED)


@pytest.mark.parametrize("desc", [False, True])
def test_sorted_order_exact(server, desc):
    """price sort (both directions): exact order incl. docid tie-break."""
    spec = {"terms": ("alpha", "fox")}
    resp = _search(server, _query(**spec), sort=[
        {"fieldName": "price", "reverse": desc}])
    got = [h.fields["id"].fieldValue[0].textValue for h in resp.hits]
    want = sorted(
        _oracle(**spec),
        key=lambda d: ((-d["price"] if desc else d["price"]), _seq(d)),
    )
    assert got == [d["id"] for d in want]


def test_search_after_paging_covers_everything(server):
    """searchAfter pages (size 7) concatenate to the full sorted list."""
    spec = {"terms": ("beta", "grid", "kelp")}
    want = sorted(_oracle(**spec), key=lambda d: (d["price"], _seq(d)))
    sort = [{"fieldName": "price"}]
    got, after = [], None
    for _ in range(200):
        resp = _search(server, _query(**spec), top=7, sort=sort, after=after)
        page = [h.fields["id"].fieldValue[0].textValue for h in resp.hits]
        if not page:
            break
        got.extend(page)
        after = resp.searchState   # SearchState cursor (search.proto:733)
    assert got == [d["id"] for d in want]


def test_start_hit_offset_paging(server):
    """startHit offset paging equals python slicing of the sorted list."""
    spec = {"terms": ("delta", "ion")}
    want = [d["id"] for d in sorted(
        _oracle(**spec), key=lambda d: (d["price"], _seq(d)))]
    sort = [{"fieldName": "price"}]
    for start in (0, 5, 17, len(want) - 1, len(want) + 3):
        resp = _search(server, _query(**spec), top=start + 6, sort=sort,
                       start_hit=start)
        got = [h.fields["id"].fieldValue[0].textValue for h in resp.hits]
        assert got == want[start:start + 6], start


@pytest.mark.parametrize("spec", _rand_specs(6, seed=21),
                         ids=lambda s: "+".join(sorted(s)))
def test_collectors_against_oracle(server, spec):
    """terms facet + stats collectors recomputed from the live table."""
    docs = _oracle(**spec)
    resp = _search(server, _query(**spec), collectors={
        "byColor": {"terms": {"field": "color", "size": 10}},
        "pmax": {"max": {"field": "price"}},
        "pmin": {"min": {"field": "price"}},
        "psum": {"sum": {"field": "price"}},
        "n": {"hitCount": {}},
    })
    cr = resp.collectorResults
    want_colors = {}
    for d in docs:
        want_colors[d["color"]] = want_colors.get(d["color"], 0) + 1
    got_colors = {b.key: int(b.count)
                  for b in cr["byColor"].bucketResult.buckets}
    assert got_colors == want_colors, spec
    assert cr["n"].hitCountResult.value == len(docs)
    if docs:
        prices = [d["price"] for d in docs]
        assert cr["pmax"].doubleResult.value == pytest.approx(max(prices))
        assert cr["pmin"].doubleResult.value == pytest.approx(min(prices))
        assert cr["psum"].doubleResult.value == pytest.approx(sum(prices))


def test_updates_supersede_originals(server):
    """Updated docs surface with NEW field values, never the old ones."""
    # pick an updated doc whose color changed
    changed = [did for did in UPDATES
               if UPDATES[did]["color"] != DOCS[did]["color"]]
    assert changed, "seed produced no color-changing update"
    for did in changed[:5]:
        new = UPDATES[did]
        resp = _search(server, {"termQuery": {
            "field": "color", "textValue": new["color"]}})
        ids = {h.fields["id"].fieldValue[0].textValue for h in resp.hits}
        assert did in ids, (did, new["color"])
        old_color = DOCS[did]["color"]
        resp2 = _search(server, {"termQuery": {
            "field": "color", "textValue": old_color}})
        ids2 = {h.fields["id"].fieldValue[0].textValue for h in resp2.hits}
        assert did not in ids2, (did, old_color)


def test_match_all_totals(server):
    resp = _search(server, {"matchAllQuery": {}})
    assert resp.totalHits.value == len(LIVE)
    got = {h.fields["id"].fieldValue[0].textValue for h in resp.hits}
    assert got == set(LIVE)
