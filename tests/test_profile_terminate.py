"""ProfileResult, Diagnostics, terminateAfter, and searchAfter pagination.

Previously untested response surfaces (VERDICT r4 #9 thin areas):
- profile=true -> ProfileResult with parsedQuery + collector/segment stats
  (reference: SearchStatsWrapper, search.proto:1403-1467)
- Diagnostics always returned (search.proto:1119-1215)
- terminateAfter caps collection and sets terminatedEarly
  (reference: TerminateAfterWrapper, search.proto:483)
- searchAfter walks the full corpus across segments + deletes with no
  duplicates or gaps (reference: SearchHandler searchAfter state)
"""

import pytest
from google.protobuf.json_format import ParseDict

from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.handlers import Handlers
from nrtsearch_tpu.state.backend import LocalStateBackend
from nrtsearch_tpu.state.global_state import GlobalState

N_DOCS = 60
DELETED = {"7", "23", "41"}


@pytest.fixture(scope="module")
def handlers(tmp_path_factory):
    work = tmp_path_factory.mktemp("proft")
    cfg = NrtsearchConfig.from_dict({
        "stateDir": str(work / "state"), "indexDir": str(work / "index"),
    })
    gs = GlobalState(cfg, LocalStateBackend(cfg.state_dir))
    h = Handlers(gs)
    h.createIndex(pb.CreateIndexRequest(indexName="idx"))
    h.registerFields(ParseDict({
        "indexName": "idx",
        "field": [
            {"name": "id", "type": "_ID", "store": True},
            {"name": "t", "type": "TEXT", "search": True},
            {"name": "rank", "type": "INT", "storeDocValues": True,
             "sort": True},
        ],
    }, pb.FieldDefRequest()))
    h.startIndex(pb.StartIndexRequest(indexName="idx",
                                      mode=pb.Mode.STANDALONE))
    # three segments of 20 docs
    for base in range(0, N_DOCS, 20):
        reqs = []
        for i in range(base, base + 20):
            r = pb.AddDocumentRequest(indexName="idx")
            r.fields["id"].value.append(str(i))
            r.fields["t"].value.append("common payload")
            r.fields["rank"].value.append(str(i))
            reqs.append(r)
        h.addDocuments(iter(reqs))
        h.refresh(pb.RefreshRequest(indexName="idx"))
    for did in DELETED:
        r = pb.AddDocumentRequest(indexName="idx")
        r.fields["id"].value.append(did)
        h.delete(iter([r]))
    h.refresh(pb.RefreshRequest(indexName="idx"))
    return h


def q(**kw):
    req = pb.SearchRequest(indexName="idx", topHits=10, **kw)
    req.query.matchQuery.field = "t"
    req.query.matchQuery.query = "common"
    return req


LIVE = N_DOCS - len(DELETED)


def test_profile_result_populated(handlers):
    resp = handlers.search(q(profile=True))
    pr = resp.profileResult
    assert "common" in pr.parsedQuery or "Match" in pr.parsedQuery
    assert len(pr.searchStats.collectorStats) == 1
    cs = pr.searchStats.collectorStats[0]
    assert cs.totalCollectedCount == len(resp.hits)
    # one entry per segment, numDocs reflects the deletes mask
    segs = cs.segmentStats
    assert len(segs) >= 1
    assert sum(s.maxDoc for s in segs) == N_DOCS
    assert sum(s.numDocs for s in segs) == LIVE


def test_profile_absent_without_flag(handlers):
    resp = handlers.search(q())
    assert not resp.HasField("profileResult")


def test_diagnostics_always_returned(handlers):
    resp = handlers.search(q())
    assert resp.diagnostics.parsedQuery
    assert resp.diagnostics.firstPassSearchTimeMs >= 0.0


def test_terminate_after_caps_and_flags(handlers):
    resp = handlers.search(q(terminateAfter=5))
    assert resp.terminatedEarly
    assert resp.totalHits.value <= LIVE
    assert resp.totalHits.value >= 5
    full = handlers.search(q())
    assert not full.terminatedEarly
    assert full.totalHits.value == LIVE


def test_terminate_after_live_setting_default(handlers):
    """liveSettings.defaultTerminateAfter applies when the request leaves
    terminateAfter unset; an explicit request value overrides it."""
    h = handlers
    h.liveSettingsV2(ParseDict({
        "indexName": "idx",
        "liveSettings": {"defaultTerminateAfter": 5},
    }, pb.LiveSettingsV2Request()))
    try:
        resp = h.search(q())
        assert resp.terminatedEarly
        resp2 = h.search(q(terminateAfter=10_000))
        assert not resp2.terminatedEarly
        assert resp2.totalHits.value == LIVE
    finally:
        h.liveSettingsV2(ParseDict({
            "indexName": "idx",
            "liveSettings": {"defaultTerminateAfter": 0},
        }, pb.LiveSettingsV2Request()))


def test_search_after_full_walk_no_dups(handlers):
    """Deep pagination via searchAfter over a score-uniform corpus: every
    live doc surfaces exactly once, in (score desc, docid asc) order."""
    seen = []
    last_info = None
    while True:
        req = q()
        req.topHits = 7
        req.retrieveFields.append("id")
        if last_info is not None:
            req.searchAfter.lastDocId = last_info[0]
            req.searchAfter.lastScore = last_info[1]
            req.searchAfter.lastHitIndex = last_info[2]
        resp = handlers.search(req)
        if not resp.hits:
            break
        for h_ in resp.hits:
            seen.append(h_.fields["id"].fieldValue[0].textValue)
        last_info = (
            resp.searchState.lastDocId,
            resp.searchState.lastScore,
            resp.searchState.lastHitInfo.lastHitIndex,
        )
        if len(seen) > N_DOCS + 10:
            pytest.fail("searchAfter did not terminate")
    assert len(seen) == LIVE
    assert len(set(seen)) == LIVE
    assert set(seen) == {str(i) for i in range(N_DOCS)} - DELETED


def test_search_after_sorted_walk(handlers):
    """searchAfter with a doc-values sort: strictly descending rank order
    across pages, deletes excluded."""
    seen = []
    last = None
    for _ in range(30):
        req = pb.SearchRequest(indexName="idx", topHits=9)
        req.retrieveFields.append("id")
        req.query.matchQuery.field = "t"
        req.query.matchQuery.query = "common"
        s = req.querySort.fields.sortedFields.add()
        s.fieldName = "rank"
        s.reverse = True
        if last is not None:
            req.searchAfter.lastDocId = last[0]
            req.searchAfter.lastHitIndex = last[2]
            for v in last[3]:
                req.searchAfter.lastFieldValues.append(v)
            req.searchAfter.lastScore = last[1]
        resp = handlers.search(req)
        if not resp.hits:
            break
        for h_ in resp.hits:
            seen.append(int(h_.fields["id"].fieldValue[0].textValue))
        last = (
            resp.searchState.lastDocId,
            resp.searchState.lastScore,
            resp.searchState.lastHitInfo.lastHitIndex,
            list(resp.searchState.lastFieldValues),
        )
    assert seen == sorted(
        (i for i in range(N_DOCS) if str(i) not in DELETED), reverse=True
    )
