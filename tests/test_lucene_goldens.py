"""Golden suites whose EXPECTATIONS originate from the reference's own test
artifacts, not this repo's reasoning (VERDICT r3 #7).

Sources (all values transcribed verbatim from reference assertions, which
were generated against real Lucene):

- Corpus: /root/reference/src/test/resources/addDocs.csv (2 docs, the
  reference's canonical functional corpus), schema from
  registerFieldsVirtual.json / registerFieldsBasic.json.
- BM25 scores 0.516 / 0.0828 for query "vendor_name:first vendor":
  NrtsearchServerTest.checkIndexVirtualFields
  (/root/reference/src/test/java/com/yelp/nrtsearch/server/grpc/
  NrtsearchServerTest.java:1454-1463). Independently derivable:
  idf(first)=ln 2 * tf-norm 2/(2+1.2) + idf(vendor)=ln 1.2 * 1/(1+1.2)
  = 0.4332 + 0.0829 = 0.516; doc 2 matches only 'vendor' = 0.0828.
- Virtual field values 236.02 / 448.04 (float_field*2 + long_field*3) and
  _score*3: same method, lines 1449-1476.
- Function-score 14.0 / 6.0 (script "sqrt(4) * count"):
  QueryTest.testSearchFunctionScoreQuery / ...NoInnerQuery
  (/root/reference/src/test/java/com/yelp/nrtsearch/server/grpc/
  QueryTest.java:290-356).
- Weighted-RRF blender math (1/61, 1/62, 1/63, 2/61, 1/11, boost 2/61):
  WeightedRrfBlenderOperationTest
  (/root/reference/src/test/java/com/yelp/nrtsearch/server/search/
  multiretriever/blender/operation/WeightedRrfBlenderOperationTest.java).
"""

import pytest
from google.protobuf import json_format

from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.handlers import Handlers
from nrtsearch_tpu.state.backend import LocalStateBackend
from nrtsearch_tpu.state.global_state import GlobalState

# addDocs.csv, transcribed: multiValued cells split on ';' exactly as the
# reference CSV loader does (NrtsearchServerTest / AddDocumentsCommand).
ADD_DOCS = [
    {
        "docid": ["1"],
        "doc_id": ["1"],
        "vendor_name": ["first vendor", "first again"],
        "count": ["3"],
        "long_field": ["12"],
        "float_field": ["100.01"],
        "description": ["FIRST food"],
    },
    {
        "docid": ["2"],
        "doc_id": ["2"],
        "vendor_name": ["second vendor", "second again"],
        "count": ["7"],
        "long_field": ["16"],
        "float_field": ["200.02"],
        "description": ["SECOND gas"],
    },
]

FIELDS = [
    {"name": "docid", "type": "_ID", "store": True},
    {"name": "doc_id", "type": "ATOM", "search": True, "storeDocValues": True},
    {"name": "vendor_name", "type": "TEXT", "search": True, "store": True,
     "multiValued": True, "storeDocValues": True},
    {"name": "count", "type": "INT", "storeDocValues": True},
    {"name": "long_field", "type": "LONG", "storeDocValues": True},
    {"name": "float_field", "type": "FLOAT", "storeDocValues": True},
    {"name": "description", "type": "TEXT", "search": True, "store": True},
    {"name": "virtual_field", "type": "VIRTUAL",
     "script": {"lang": "js", "source": "float_field*2.0+long_field*3.0"}},
    {"name": "virtual_field_w_score", "type": "VIRTUAL",
     "script": {"lang": "js", "source": "_score*3.0"}},
]


@pytest.fixture(scope="module")
def handlers(tmp_path_factory):
    work = tmp_path_factory.mktemp("lucene_golden")
    cfg = NrtsearchConfig.from_dict({
        "stateDir": str(work / "state"), "indexDir": str(work / "index"),
    })
    gs = GlobalState(cfg, LocalStateBackend(cfg.state_dir))
    h = Handlers(gs)
    h.createIndex(pb.CreateIndexRequest(indexName="idx"))
    h.registerFields(json_format.ParseDict(
        {"indexName": "idx", "field": FIELDS}, pb.FieldDefRequest()
    ))
    h.startIndex(pb.StartIndexRequest(indexName="idx"))
    reqs = []
    for doc in ADD_DOCS:
        r = pb.AddDocumentRequest(indexName="idx")
        for fname, values in doc.items():
            r.fields[fname].value.extend(values)
        reqs.append(r)
    h.addDocuments(iter(reqs))
    h.refresh(pb.RefreshRequest(indexName="idx"))
    return h


def _search(h, request_dict, retrieve=("doc_id",)):
    req = json_format.ParseDict(
        {"indexName": "idx", "topHits": 10,
         "retrieveFields": list(retrieve), **request_dict},
        pb.SearchRequest(),
    )
    return h.search(req)


def _doc_id(hit):
    return hit.fields["doc_id"].fieldValue[0].textValue


def test_bm25_scores_match_lucene(handlers):
    """Reference: NrtsearchServerTest.java:1458,1462 — Lucene-produced BM25
    scores for 'vendor_name:first vendor' over addDocs.csv."""
    resp = _search(handlers, {
        "query": {"matchQuery": {"field": "vendor_name",
                                 "query": "first vendor"}},
    })
    assert resp.totalHits.value == 2
    assert [_doc_id(h) for h in resp.hits] == ["1", "2"]
    assert resp.hits[0].score == pytest.approx(0.516, abs=0.001)
    assert resp.hits[1].score == pytest.approx(0.0828, abs=0.001)


def test_virtual_fields_match_lucene(handlers):
    """Reference: NrtsearchServerTest.java:1449-1476 — index virtual fields
    evaluated over the same hits (expression + _score binding)."""
    resp = _search(
        handlers,
        {"query": {"matchQuery": {"field": "vendor_name",
                                  "query": "first vendor"}}},
        retrieve=("doc_id", "virtual_field", "virtual_field_w_score"),
    )
    by_id = {_doc_id(h): h for h in resp.hits}
    v1 = by_id["1"].fields["virtual_field"].fieldValue[0].doubleValue
    v2 = by_id["2"].fields["virtual_field"].fieldValue[0].doubleValue
    assert v1 == pytest.approx(236.02, abs=0.001)
    assert v2 == pytest.approx(448.04, abs=0.001)
    ws1 = by_id["1"].fields["virtual_field_w_score"].fieldValue[0].doubleValue
    ws2 = by_id["2"].fields["virtual_field_w_score"].fieldValue[0].doubleValue
    assert ws1 == pytest.approx(3.0 * 0.516, abs=0.003)
    assert ws2 == pytest.approx(3.0 * 0.0828, abs=0.003)


def test_function_score_phrase_match_lucene(handlers):
    """Reference: QueryTest.java:290-322 — functionScoreQuery with script
    'sqrt(4) * count' over phrase 'second again' scores doc 2 at 14.0."""
    resp = _search(handlers, {
        "query": {"functionScoreQuery": {
            "script": {"lang": "js", "source": "sqrt(4) * count"},
            "query": {"phraseQuery": {
                "field": "vendor_name", "slop": 0,
                "terms": ["second", "again"]}},
        }},
    })
    assert resp.totalHits.value == 1
    assert _doc_id(resp.hits[0]) == "2"
    assert resp.hits[0].score == pytest.approx(14.0, abs=1e-6)


def test_function_score_no_inner_query_match_lucene(handlers):
    """Reference: QueryTest.java:324-356 — score-ordered matchAll under the
    same script: doc 2 at 14.0, doc 1 at 6.0."""
    resp = _search(handlers, {
        "query": {"functionScoreQuery": {
            "script": {"lang": "js", "source": "sqrt(4) * count"},
        }},
    })
    assert resp.totalHits.value == 2
    assert [_doc_id(h) for h in resp.hits] == ["2", "1"]
    assert resp.hits[0].score == pytest.approx(14.0, abs=1e-6)
    assert resp.hits[1].score == pytest.approx(6.0, abs=1e-6)


# -- Weighted-RRF blender math (engine level) --------------------------------


def _td(*ords):
    from nrtsearch_tpu.core.searcher import Hit, TopDocs

    return TopDocs([Hit(0, o, o, 1.0) for o in ords], len(ords))


def test_rrf_rank_scores_match_lucene():
    """Reference: WeightedRrfBlenderOperationTest.java:72-76."""
    from nrtsearch_tpu.search.retrievers import blend_rrf

    merged = blend_rrf({"text": _td(10, 20, 30)}, {"text": 1.0},
                       rank_constant=60)
    scores = {h.global_ord: h.score for h in merged}
    assert len(merged) == 3
    assert scores[10] == pytest.approx(1.0 / 61, abs=1e-6)
    assert scores[20] == pytest.approx(1.0 / 62, abs=1e-6)
    assert scores[30] == pytest.approx(1.0 / 63, abs=1e-6)


def test_rrf_duplicate_doc_sums_match_lucene():
    """Reference: WeightedRrfBlenderOperationTest.java:108-114."""
    from nrtsearch_tpu.search.retrievers import blend_rrf

    merged = blend_rrf({"text": _td(5), "knn": _td(5)},
                       {"text": 1.0, "knn": 1.0}, rank_constant=60)
    assert len(merged) == 1
    assert merged[0].global_ord == 5
    assert merged[0].score == pytest.approx(2.0 / 61, abs=1e-6)


def test_rrf_custom_rank_constant_match_lucene():
    """Reference: WeightedRrfBlenderOperationTest.java:131-142."""
    from nrtsearch_tpu.search.retrievers import blend_rrf

    merged = blend_rrf({"text": _td(1)}, {"text": 1.0}, rank_constant=10)
    assert merged[0].score == pytest.approx(1.0 / 11, abs=1e-6)


def test_rrf_boost_scales_match_lucene():
    """Reference: WeightedRrfBlenderOperationTest.java:145-156."""
    from nrtsearch_tpu.search.retrievers import blend_rrf

    merged = blend_rrf({"text": _td(1)}, {"text": 2.0}, rank_constant=60)
    assert merged[0].score == pytest.approx(2.0 / 61, abs=1e-6)


def test_rrf_empty_results_match_lucene():
    """Reference: WeightedRrfBlenderOperationTest.java:159-166."""
    from nrtsearch_tpu.search.retrievers import blend_rrf

    assert blend_rrf({"text": _td()}, {"text": 1.0}) == []
