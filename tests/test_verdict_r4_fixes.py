"""Round-4 correctness fixes (VERDICT r3 weak #5/#6/#7).

- pinned-version acquire: wait-for-future-version succeeds when the version
  arrives (read-your-writes, reference SearchHandler.getSearcherAndTaxonomy
  SearchHandler.java:765); expired versions error instead of silently
  serving the current searcher.
- topHitsCollector honors EVERY querySort key (reference
  TopHitsCollectorManager), not just the first.
- timeoutCheckEvery is honored as the doc-space chunk granularity of the
  chunked timeout path (reference SearchCutoffWrapper / search.proto:481).
"""

import threading
import time

import pytest
from google.protobuf.json_format import ParseDict

from nrtsearch_tpu.client import NrtsearchClient
from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.grpc_server import NrtsearchServer

# (id, body, tier, price): tier has ties so the second key decides
DOCS = [
    ("0", "quick fox", 1, 30),
    ("1", "quick dog", 2, 10),
    ("2", "quick bird", 1, 10),
    ("3", "quick cat", 2, 40),
    ("4", "quick mouse", 1, 20),
    ("5", "quick wolf", 2, 20),
]


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("r4fix")
    srv = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": str(tmp / "s"), "indexDir": str(tmp / "i")}
    ))
    port = srv.start(0)
    c = NrtsearchClient(f"localhost:{port}")
    c.create_index("r4")
    c.register_fields(pb.FieldDefRequest(indexName="r4", field=[
        pb.Field(name="id", type=pb.FieldType._ID, store=True,
                 storeDocValues=True),
        pb.Field(name="body", type=pb.FieldType.TEXT, search=True),
        pb.Field(name="tier", type=pb.FieldType.INT, storeDocValues=True,
                 sort=True),
        pb.Field(name="price", type=pb.FieldType.INT, storeDocValues=True,
                 sort=True),
    ]))
    c.start_index(pb.StartIndexRequest(indexName="r4", mode=pb.Mode.STANDALONE))
    reqs = []
    for i, body, tier, price in DOCS:
        r = pb.AddDocumentRequest(indexName="r4")
        r.fields["id"].value.append(i)
        r.fields["body"].value.append(body)
        r.fields["tier"].value.append(str(tier))
        r.fields["price"].value.append(str(price))
        reqs.append(r)
    c.add_documents(reqs)
    c.refresh("r4")
    yield srv, c
    c.close()
    srv.stop()


def _search(c, **kw):
    base = {"indexName": "r4", "topHits": 10, "retrieveFields": ["id"],
            "query": {"matchQuery": {"field": "body", "query": "quick"}}}
    base.update(kw)
    return c.search(ParseDict(base, pb.SearchRequest()))


def test_top_hits_collector_multi_key_sort(server):
    _, c = server
    resp = _search(c, collectors={"ranked": {"topHitsCollector": {
        "topHits": 6, "retrieveFields": ["id"],
        "querySort": {"fields": {"sortedFields": [
            {"fieldName": "tier"},
            {"fieldName": "price", "reverse": True},
        ]}},
    }}})
    hits = resp.collectorResults["ranked"].hitsResult.hits
    got = [h.fields["id"].fieldValue[0].textValue for h in hits]
    want = [d[0] for d in sorted(DOCS, key=lambda d: (d[2], -d[3]))]
    assert got == want, (got, want)


def test_top_hits_collector_single_key_still_works(server):
    _, c = server
    resp = _search(c, collectors={"cheap": {"topHitsCollector": {
        "topHits": 3, "retrieveFields": ["id"],
        "querySort": {"fields": {"sortedFields": [{"fieldName": "price"}]}},
    }}})
    hits = resp.collectorResults["cheap"].hitsResult.hits
    got = [h.fields["id"].fieldValue[0].textValue for h in hits]
    # price ascending, docid-ascending tie-break: 10(1) vs 10(2) -> 1, 2
    want = [d[0] for d in sorted(DOCS, key=lambda d: (d[3], int(d[0])))][:3]
    assert got == want, (got, want)


def test_acquire_waits_for_future_version(server):
    srv, c = server
    rt = srv.handlers.gs.get_runtime("r4")
    start_version = rt.searcher.version
    want = start_version + 1

    def refresh_later():
        time.sleep(0.3)
        r = pb.AddDocumentRequest(indexName="r4")
        r.fields["id"].value.append("late")
        r.fields["body"].value.append("quick late")
        r.fields["tier"].value.append("9")
        r.fields["price"].value.append("999")
        c.add_documents([r])
        c.refresh("r4")

    t = threading.Thread(target=refresh_later)
    t.start()
    try:
        got = rt.acquire(want, wait_sec=5.0)
        assert got.version >= want
    finally:
        t.join()
    # and through the public API: a pinned future version that never
    # arrives maps to an error, not a silent stale answer
    import grpc

    with pytest.raises(grpc.RpcError) as e:
        c.search(ParseDict({
            "indexName": "r4", "topHits": 1, "version": want + 1000,
            "query": {"matchQuery": {"field": "body", "query": "quick"}},
        }, pb.SearchRequest()))
    assert e.value.code() == grpc.StatusCode.FAILED_PRECONDITION


def test_acquire_expired_version_errors(server):
    srv, _ = server
    rt = srv.handlers.gs.get_runtime("r4")
    # force-prune an old version then ask for it
    versions = sorted(rt._searchers_by_version)
    if len(versions) > 1:
        old = versions[0]
        del rt._searchers_by_version[old]
    else:
        old = versions[0] - 1 if versions[0] > 0 else -1
    with pytest.raises(RuntimeError, match="expired"):
        rt.acquire(old)


def test_timeout_check_every_sets_chunk_granularity(server, monkeypatch):
    srv, c = server
    rt = srv.handlers.gs.get_runtime("r4")
    searcher = rt.acquire()
    pv = searcher.packed_view("body")
    seen: dict = {}
    orig = type(pv.index).search_chunked

    def spy(self, q, k, deadline, chunks=8):
        seen["chunks"] = chunks
        return orig(self, q, k, deadline, chunks=chunks)

    monkeypatch.setattr(type(pv.index), "search_chunked", spy)
    max_doc = int(pv.index.max_doc)

    # check every ~1/3 of the doc space -> 3 chunks
    every = -(-max_doc // 3)
    r1 = _search(c, timeoutSec=30.0, timeoutCheckEvery=every)
    assert seen.pop("chunks") == 3
    # tiny check interval clamps to 64 chunks (bounded dispatch count)
    r2 = _search(c, timeoutSec=30.0, timeoutCheckEvery=1)
    assert seen.pop("chunks") <= 64
    # results identical to the unchunked path
    r0 = _search(c, timeoutSec=30.0)
    ids = lambda r: [h.fields["id"].fieldValue[0].textValue for h in r.hits]
    assert ids(r1) == ids(r2) == ids(r0)
    # liveSettings default applies when the request doesn't set it
    rt.state_info.live_settings["defaultSearchTimeoutCheckEvery"] = max_doc
    _search(c, timeoutSec=30.0)
    assert seen.pop("chunks") == 1
    rt.state_info.live_settings.pop("defaultSearchTimeoutCheckEvery")
