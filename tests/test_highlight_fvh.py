"""Positions-driven highlighter parity tests (golden cases mirroring the
reference's HighlightTest shapes: phrase-only highlighting, fragment scoring
order, per-field settings, highlightQuery override)."""

import pytest

from nrtsearch_tpu.query.plan import parse_query
from nrtsearch_tpu.search.highlight import (
    HighlightSettings,
    build_highlight_query,
    highlight_text,
)


def hl(text, qdict, field="body", **settings):
    node = parse_query(qdict)
    hq = build_highlight_query(node, field)
    return highlight_text(text, hq, HighlightSettings(**settings))


def test_phrase_highlights_whole_span_only():
    text = "the quick brown fox jumps while a lazy brown dog sleeps quick"
    frags = hl(text, {"matchPhraseQuery": {"field": "body",
                                           "query": "quick brown"}})
    assert len(frags) == 1
    # the phrase span wraps BOTH words as one unit...
    assert "<em>quick brown</em>" in frags[0]
    # ...and lone 'brown'/'quick' occurrences are NOT highlighted
    assert "<em>brown</em>" not in frags[0]
    assert frags[0].count("<em>") == 1


def test_phrase_requires_consecutive_positions():
    text = "quick red brown things"
    frags = hl(text, {"matchPhraseQuery": {"field": "body",
                                           "query": "quick brown"}})
    assert frags == []  # terms present but not consecutive


def test_fragment_scoring_prefers_distinct_terms():
    # fragment A: alpha four times; fragment B: alpha beta gamma —
    # diversity must outrank repetition (FVH WeightedFragInfo semantics)
    text = (
        "alpha alpha alpha alpha " + "filler " * 40
        + "alpha beta gamma end"
    )
    frags = hl(text, {"matchQuery": {"field": "body",
                                     "query": "alpha beta gamma"}},
               fragment_size=40, max_fragments=1)
    assert "beta" in frags[0] and "gamma" in frags[0]


def test_boost_weights_fragment_order():
    text = "left part has rare word here " + "x " * 60 + "right part has common word"
    q = {"booleanQuery": {"clauses": [
        {"occur": "SHOULD", "query": {"termQuery": {
            "field": "body", "textValue": "common"}}},
        {"occur": "SHOULD", "query": {"termQuery": {
            "field": "body", "textValue": "rare", "boost": 5.0}}},
    ]}}
    frags = hl(text, q, fragment_size=30, max_fragments=2)
    assert "rare" in frags[0]  # boosted term's fragment ranks first


def test_prefix_and_settings():
    text = "searching searches searched elsewhere"
    frags = hl(text, {"prefixQuery": {"field": "body", "prefix": "search"}},
               pre_tag="[", post_tag="]", fragment_size=200)
    assert frags and frags[0].count("[") == 3


def test_e2e_highlight_rpc(tmp_path):
    from nrtsearch_tpu.client import NrtsearchClient
    from nrtsearch_tpu.config import NrtsearchConfig
    from nrtsearch_tpu.gen import pb
    from nrtsearch_tpu.server.grpc_server import NrtsearchServer

    config = NrtsearchConfig.from_dict(
        {"stateDir": str(tmp_path / "s"), "indexDir": str(tmp_path / "i")}
    )
    srv = NrtsearchServer(config)
    port = srv.start(0)
    client = NrtsearchClient(f"localhost:{port}")
    try:
        client.create_index("h")
        client.register_fields(pb.FieldDefRequest(indexName="h", field=[
            pb.Field(name="id", type=pb.FieldType._ID, store=True),
            pb.Field(name="body", type=pb.FieldType.TEXT, search=True,
                     store=True),
        ]))
        client.start_index(pb.StartIndexRequest(indexName="h"))
        req = pb.AddDocumentRequest(indexName="h")
        req.fields["id"].value.append("1")
        req.fields["body"].value.append(
            "the quick brown fox jumps over the lazy dog")
        client.add_documents(iter([req]))
        client.refresh("h")

        sreq = pb.SearchRequest(indexName="h", topHits=5)
        sreq.query.matchPhraseQuery.field = "body"
        sreq.query.matchPhraseQuery.query = "quick brown"
        sreq.highlight.fields.append("body")
        fs = sreq.highlight.field_settings["body"]
        fs.pre_tags.append("<b>")
        fs.post_tags.append("</b>")
        r = client.search(sreq)
        assert r.totalHits.value == 1
        frags = r.hits[0].highlights["body"].fragments
        assert frags and "<b>quick brown</b>" in frags[0]
    finally:
        client.close()
        srv.stop()
