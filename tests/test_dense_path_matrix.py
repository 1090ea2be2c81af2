"""Cross-path parity matrix: merge vs dense vs fused through the public API.

The serving contract (VERDICT r4 #2/#6): whichever fast path
`PackedFieldView.search_batch` picks — full-width merge (exact f32, the
CPU default), dense-head + merge-tail (the TPU default), or the fused
compact-row variant (NRT_FAST_PATH=fused) — the PUBLIC response must
agree: same hit docs, scores within bf16 head-quantization tolerance
(the fused path carries Dekker residual rows, so it is held to a tighter
bound), identical facet/collector counts, identical sort orders, and
delete/update visibility on every path.

Reference role: Lucene serves filtered/sorted/faceted queries through the
same BulkScorer hot loop regardless of which scorer impl wins
(server/search/MyIndexSearcher.java:79, collectors under
server/search/collectors/); path choice must never change the contract.

Corpus: 3 refresh waves (multi-segment), then in-place updates (re-add of
existing _IDs) and deletes, then a final wave — so every path sees live
docs, updated docs (old versions masked), and deleted docs across segment
boundaries.
"""

import numpy as np
import pytest
from google.protobuf.json_format import MessageToDict, ParseDict

from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.handlers import Handlers
from nrtsearch_tpu.state.backend import LocalStateBackend
from nrtsearch_tpu.state.global_state import GlobalState

pytestmark = pytest.mark.slow

PATHS = ("merge", "dense", "fused")
# bf16 impact-row quantization bound for the plain dense path; the fused
# path reconstructs ~f32 head scores via Dekker residual rows.
SCORE_REL = {"merge": 0.0, "dense": 8e-3, "fused": 1e-4}

COLORS = ["red", "green", "blue", "black"]


@pytest.fixture(scope="module")
def handlers(tmp_path_factory):
    work = tmp_path_factory.mktemp("densemx")
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
            {"name": "body", "type": "TEXT", "search": True},
            {"name": "color", "type": "ATOM", "search": True,
             "storeDocValues": True},
            {"name": "price", "type": "INT", "storeDocValues": True,
             "search": True},
        ],
    }, pb.FieldDefRequest()))
    h.startIndex(pb.StartIndexRequest(indexName="idx"))

    import random

    rng = random.Random(71)

    def add_wave(ids):
        reqs = []
        for i in ids:
            words = ["common"] * (1 + rng.randint(0, 2))
            words += [rng.choice(["alpha", "beta", "gamma", "delta"])
                      for _ in range(rng.randint(1, 5))]
            if i % 23 == 0:
                words.append("needle")
            r = pb.AddDocumentRequest(indexName="idx")
            r.fields["id"].value.append(str(i))
            r.fields["body"].value.append(" ".join(words))
            r.fields["color"].value.append(COLORS[i % len(COLORS)])
            r.fields["price"].value.append(str(i % 50))
            reqs.append(r)
        h.addDocuments(iter(reqs))
        h.refresh(pb.RefreshRequest(indexName="idx"))

    add_wave(range(0, 300))
    add_wave(range(300, 600))
    # in-place updates: docs 100-139 get fresh postings in a NEW segment;
    # the old copies must be masked on every path
    add_wave(range(100, 140))
    # deletes spanning the first two segments
    dels = pb.AddDocumentRequest(indexName="idx")
    for i in list(range(0, 600, 13)):
        dels.fields["id"].value.append(str(i))
    h.delete(iter([dels]))
    h.refresh(pb.RefreshRequest(indexName="idx"))
    add_wave(range(600, 700))
    return h


def _search(h, monkeypatch, path, body):
    monkeypatch.setenv("NRT_FAST_PATH", path)
    req = ParseDict({"indexName": "idx", **body}, pb.SearchRequest())
    return h.search(req)


QUERY_SHAPES = {
    "or_head": {"matchQuery": {"field": "body", "query": "common alpha"}},
    "or_mixed": {"matchQuery": {"field": "body", "query": "common needle beta"}},
    "tail_only": {"matchQuery": {"field": "body", "query": "needle"}},
    "conjunction": {"booleanQuery": {"clauses": [
        {"occur": "MUST", "query": {
            "termQuery": {"field": "body", "textValue": "common"}}},
        {"occur": "MUST", "query": {
            "termQuery": {"field": "body", "textValue": "alpha"}}},
    ]}},
    "filtered": {"booleanQuery": {"clauses": [
        {"occur": "MUST", "query": {
            "matchQuery": {"field": "body", "query": "common gamma"}}},
        {"occur": "FILTER", "query": {
            "rangeQuery": {"field": "price", "upper": "25"}}},
    ]}},
}


def _hits(resp):
    return [
        (hit.fields["id"].fieldValue[0].textValue, hit.score)
        for hit in resp.hits
    ]


def _assert_hit_parity(base, other, rel, ctx):
    ids_b = [d for d, _ in base]
    ids_o = [d for d, _ in other]
    if rel == 0.0:
        assert ids_b == ids_o, ctx
    else:
        # bf16 near-ties may swap adjacent docs; the SET must match and
        # every shared doc's score must be within rel
        assert set(ids_b) == set(ids_o), f"{ctx}: {ids_b} vs {ids_o}"
    sb = dict(base)
    for d, s in other:
        b = sb[d]
        assert abs(s - b) <= rel * max(abs(b), 1e-9) + 1e-6, (
            f"{ctx}: score {d} {s} vs {b}"
        )


@pytest.mark.parametrize("qname", sorted(QUERY_SHAPES))
def test_tophits_parity(handlers, monkeypatch, qname):
    body = {"topHits": 15, "retrieveFields": ["id"],
            "query": QUERY_SHAPES[qname]}
    base = _search(handlers, monkeypatch, "merge", body)
    assert base.totalHits.value > 0
    for path in PATHS[1:]:
        resp = _search(handlers, monkeypatch, path, body)
        _assert_hit_parity(
            _hits(base), _hits(resp), SCORE_REL[path], f"{qname}/{path}"
        )
        # totalHits: exact, or an explicitly-flagged lower bound
        if resp.totalHits.relation == pb.TotalHits.Relation.EQUAL_TO:
            assert resp.totalHits.value == base.totalHits.value, qname
        else:
            assert resp.totalHits.value <= base.totalHits.value, qname


@pytest.mark.parametrize("qname", ["or_head", "filtered", "conjunction"])
def test_facet_counts_identical(handlers, monkeypatch, qname):
    body = {
        "topHits": 10, "retrieveFields": ["id"],
        "query": QUERY_SHAPES[qname],
        "facets": [{"name": "bycolor", "dim": "color", "topN": 10}],
    }
    base = _search(handlers, monkeypatch, "merge", body)

    def counts(resp):
        out = {}
        for fr in resp.facetResult:
            for lv in fr.labelValues:
                out[lv.label] = lv.value
        return out

    cb = counts(base)
    assert cb and sum(cb.values()) > 0
    for path in PATHS[1:]:
        resp = _search(handlers, monkeypatch, path, body)
        assert counts(resp) == cb, f"{qname}/{path}"


@pytest.mark.parametrize("qname", ["or_head", "or_mixed", "filtered"])
def test_collector_results_identical(handlers, monkeypatch, qname):
    body = {
        "topHits": 10, "retrieveFields": ["id"],
        "query": QUERY_SHAPES[qname],
        "collectors": {
            "colors": {"terms": {"field": "color", "size": 8}},
            "pricesum": {"sum": {"field": "price"}},
        },
    }
    base = _search(handlers, monkeypatch, "merge", body)

    def summarize(resp):
        out = {}
        for name, cr in resp.collectorResults.items():
            d = MessageToDict(cr)
            out[name] = d
        return out

    sb = summarize(base)
    assert sb
    for path in PATHS[1:]:
        resp = _search(handlers, monkeypatch, path, body)
        so = summarize(resp)
        assert set(so) == set(sb)
        # terms buckets: identical counts; sum: identical to f32 tolerance
        if "colors" in sb:
            assert so["colors"] == sb["colors"], f"{qname}/{path}"
        if "pricesum" in sb:
            b = float(sb["pricesum"]["doubleResult"])
            o = float(so["pricesum"]["doubleResult"])
            assert abs(o - b) <= 1e-3 * max(abs(b), 1.0), f"{qname}/{path}"


@pytest.mark.parametrize("reverse", [False, True])
def test_sorted_parity(handlers, monkeypatch, reverse):
    body = {
        "topHits": 20, "retrieveFields": ["id"],
        "query": QUERY_SHAPES["or_head"],
        "querySort": {"fields": {"sortedFields": [
            {"fieldName": "price", "reverse": reverse},
        ]}},
    }
    base = _search(handlers, monkeypatch, "merge", body)
    ids_base = [d for d, _ in _hits(base)]
    assert len(ids_base) == 20
    for path in PATHS[1:]:
        resp = _search(handlers, monkeypatch, path, body)
        ids = [d for d, _ in _hits(resp)]
        # sort keys are doc values, not scores: order must be EXACT on
        # every path (ties broken by docid on all paths)
        assert ids == ids_base, f"{path}"


def test_update_visibility_every_path(handlers, monkeypatch):
    """Docs 100-139 were re-added after wave 1: exactly one live copy."""
    body = {
        "topHits": 50, "retrieveFields": ["id"],
        "query": {"termQuery": {"field": "body", "textValue": "common"}},
    }
    for path in PATHS:
        resp = _search(handlers, monkeypatch, path, body)
        ids = [d for d, _ in _hits(resp)]
        assert len(ids) == len(set(ids)), f"{path}: duplicate live docs"


def test_delete_visibility_every_path(handlers, monkeypatch):
    """Every 13th id of the first 600 was deleted (and not re-added later
    except ids 600+ which were never deleted)."""
    deleted = {str(i) for i in range(0, 600, 13)}
    body = {
        "topHits": 400, "retrieveFields": ["id"],
        "query": {"matchQuery": {"field": "body",
                                 "query": "common alpha beta gamma delta"}},
    }
    for path in PATHS:
        resp = _search(handlers, monkeypatch, path, body)
        ids = {d for d, _ in _hits(resp)}
        assert not (ids & deleted), f"{path}: deleted docs served"


def test_total_hits_relation_surfaced(handlers, monkeypatch):
    """When a pruned path returns a lower bound it MUST say so (the WAND
    GREATER_THAN_OR_EQUAL_TO contract); exact answers must say EQUAL_TO and
    match the merge path exactly."""
    body = {"topHits": 5, "retrieveFields": ["id"],
            "query": QUERY_SHAPES["or_head"]}
    base = _search(handlers, monkeypatch, "merge", body)
    assert base.totalHits.relation == pb.TotalHits.Relation.EQUAL_TO
    for path in PATHS[1:]:
        resp = _search(handlers, monkeypatch, path, body)
        if resp.totalHits.relation == pb.TotalHits.Relation.EQUAL_TO:
            assert resp.totalHits.value == base.totalHits.value
        else:
            assert (resp.totalHits.relation
                    == pb.TotalHits.Relation.GREATER_THAN_OR_EQUAL_TO)
            assert 0 < resp.totalHits.value <= base.totalHits.value
