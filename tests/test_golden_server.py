"""Server-level golden suites: full SearchRequest JSON -> expected response.

The reference drives most functional tests from JSON resources through a
real in-process server (ServerTestCase + src/test/resources/); this driver
does the same: each resource declares proto-JSON fields, documents, and
cases of {SearchRequest -> expected response fragments}, executed through
the real Handlers (the gRPC method bodies)."""

import json
from pathlib import Path

import pytest
from google.protobuf import json_format

from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.handlers import Handlers
from nrtsearch_tpu.state.backend import LocalStateBackend
from nrtsearch_tpu.state.global_state import GlobalState

GOLDEN_DIR = Path(__file__).parent / "resources" / "golden_server"
SUITES = sorted(GOLDEN_DIR.glob("*.json"))

_CACHE: dict = {}


def _suite(path: Path, tmp_root: Path):
    if path not in _CACHE:
        spec = json.loads(path.read_text())
        work = tmp_root / path.stem
        cfg = NrtsearchConfig.from_dict({
            "stateDir": str(work / "state"), "indexDir": str(work / "index"),
        })
        gs = GlobalState(cfg, LocalStateBackend(cfg.state_dir))
        h = Handlers(gs)
        h.createIndex(pb.CreateIndexRequest(indexName="idx"))
        freq = json_format.ParseDict(
            {"indexName": "idx", "field": spec["fields"]}, pb.FieldDefRequest()
        )
        h.registerFields(freq)
        h.startIndex(pb.StartIndexRequest(indexName="idx"))
        reqs = []
        for doc in spec["docs"]:
            r = pb.AddDocumentRequest(indexName="idx")
            for fname, values in doc.items():
                r.fields[fname].value.extend(values)
            reqs.append(r)
        h.addDocuments(iter(reqs))
        h.refresh(pb.RefreshRequest(indexName="idx"))
        _CACHE[path] = (h, spec["cases"])
    return _CACHE[path]


def _cases():
    out = []
    for path in SUITES:
        spec = json.loads(path.read_text())
        for i, case in enumerate(spec["cases"]):
            out.append(pytest.param(
                path, i, id=f"{path.stem}:{case.get('name', i)}"
            ))
    return out


@pytest.fixture(scope="session")
def golden_root(tmp_path_factory):
    return tmp_path_factory.mktemp("golden_server")


@pytest.mark.parametrize("path,case_idx", _cases())
def test_golden_server(path, case_idx, golden_root):
    handlers, cases = _suite(path, golden_root)
    case = cases[case_idx]
    req = json_format.ParseDict(
        {"indexName": "idx", **case["request"]}, pb.SearchRequest()
    )
    resp = handlers.search(req)
    expect = case["expect"]
    if "totalHits" in expect:
        assert resp.totalHits.value == expect["totalHits"], resp.totalHits
    if "ids" in expect:
        got = [h.fields["id"].fieldValue[0].textValue for h in resp.hits]
        assert got == expect["ids"], got
    for fname, want in expect.get("facets", {}).items():
        fr = next(f for f in resp.facetResult if f.name == fname)
        got = {lv.label: lv.value for lv in fr.labelValues}
        for label, count in want.items():
            assert got.get(label) == count, (fname, got)
    for cname, want in expect.get("collectors", {}).items():
        cr = resp.collectorResults[cname]
        assert cr.doubleResult.value == pytest.approx(want), (cname, cr)
    for cname, want in expect.get("collectorTerms", {}).items():
        cr = resp.collectorResults[cname]
        got = {b.key: b.count for b in cr.bucketResult.buckets}
        assert got == want, (cname, got)
    for cname, want in expect.get("collectorCounts", {}).items():
        assert resp.collectorResults[cname].hitCountResult.value == want
    for cname, nested in expect.get("nestedCollectorSum", {}).items():
        cr = resp.collectorResults[cname]
        for nname, want in nested.items():
            nr = cr.filterResult.nestedCollectorResults
            assert nr[nname].doubleResult.value == pytest.approx(
                want
            ), (cname, nname, cr)
    if "idsUnordered" in expect:
        got = sorted(h.fields["id"].fieldValue[0].textValue for h in resp.hits)
        assert got == sorted(expect["idsUnordered"]), got
    if "terminatedEarly" in expect:
        assert resp.terminatedEarly == expect["terminatedEarly"]
    if "relation" in expect:
        assert (pb.TotalHits.Relation.Name(resp.totalHits.relation)
                == expect["relation"])
    for fname, frag in expect.get("highlightContains", {}).items():
        joined = " ".join(
            f for h in resp.hits for f in h.highlights[fname].fragments
        )
        assert frag in joined, joined


def test_server_suites_present():
    assert len(SUITES) >= 1, [p.name for p in SUITES]
