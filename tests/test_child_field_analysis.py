"""Multi-analysis child fields: a non-OBJECT parent fans its source values
out to each childField, which indexes them under its OWN analyzer/flags.

Golden expectations transcribed from the reference's
MatchAndTermQueryBehaviorWithTokenizationTest
(/root/reference/src/test/java/com/yelp/nrtsearch/server/grpc/
MatchAndTermQueryBehaviorWithTokenizationTest.java:30-152): a TEXT parent
analyzed by StandardAnalyzer (tokenize + lowercase) with a TEXT child
`keyword_tokenized` analyzed by keyword tokenizer + lowercase filter —
match/term queries against parent vs child return different doc sets.
"""

import pytest
from google.protobuf import json_format

from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.handlers import Handlers
from nrtsearch_tpu.state.backend import LocalStateBackend
from nrtsearch_tpu.state.global_state import GlobalState

# docs 1..6 with tag values exactly as the reference test's initIndex
TAGS = {1: "a", 2: "A", 3: "A A", 4: "a a", 5: "A a", 6: "a A"}

FIELDS = [
    {"name": "doc_id", "type": "ATOM", "search": True, "storeDocValues": True},
    {
        "name": "tag",
        "type": "TEXT",
        "search": True,
        "storeDocValues": True,
        "childFields": [
            {
                "name": "keyword_tokenized",
                "type": "TEXT",
                "search": True,
                "storeDocValues": True,
                "analyzer": {
                    "custom": {
                        "tokenizer": {"name": "keyword"},
                        "tokenFilters": [{"name": "lowercase"}],
                    }
                },
            }
        ],
    },
]


@pytest.fixture(scope="module")
def handlers(tmp_path_factory):
    work = tmp_path_factory.mktemp("child_analysis")
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
    for doc_id, tag in TAGS.items():
        r = pb.AddDocumentRequest(indexName="idx")
        r.fields["doc_id"].value.append(str(doc_id))
        r.fields["tag"].value.append(tag)
        reqs.append(r)
    h.addDocuments(iter(reqs))
    h.refresh(pb.RefreshRequest(indexName="idx"))
    return h


def _doc_ids(h, query) -> set[str]:
    req = json_format.ParseDict(
        {"indexName": "idx", "topHits": 10,
         "retrieveFields": ["doc_id", "tag"], "query": query},
        pb.SearchRequest(),
    )
    resp = h.search(req)
    return {hit.fields["doc_id"].fieldValue[0].textValue for hit in resp.hits}


def _match(field, text):
    return {"matchQuery": {"field": field, "query": text,
                           "minimumNumberShouldMatch": 1}}


def _term(field, text):
    return {"termQuery": {"field": field, "textValue": text}}


# --- match queries (reference testMatchQuery_*) -----------------------------

@pytest.mark.parametrize("text", ["A", "a"])
def test_match_parent_lowercases_and_tokenizes(handlers, text):
    # StandardAnalyzer parent: every doc contains token 'a'
    assert _doc_ids(handlers, _match("tag", text)) == {"1", "2", "3", "4", "5", "6"}


@pytest.mark.parametrize("text", ["A", "a"])
def test_match_child_keyword_tokenized(handlers, text):
    # keyword tokenizer keeps the whole value as one token; lowercase filter
    # folds case — only docs whose WHOLE tag is 'a'/'A' match
    assert _doc_ids(handlers, _match("tag.keyword_tokenized", text)) == {"1", "2"}


# --- term queries (reference testTermQuery_*) -------------------------------

def test_term_parent_lowercase_token_matches_all(handlers):
    assert _doc_ids(handlers, _term("tag", "a")) == {"1", "2", "3", "4", "5", "6"}


def test_term_parent_uppercase_matches_none(handlers):
    # term query bypasses analysis; the index holds only lowercased tokens
    assert _doc_ids(handlers, _term("tag", "A")) == set()


def test_term_child_lowercase_whole_value(handlers):
    assert _doc_ids(handlers, _term("tag.keyword_tokenized", "a")) == {"1", "2"}


def test_term_child_uppercase_matches_none(handlers):
    assert _doc_ids(handlers, _term("tag.keyword_tokenized", "A")) == set()


# --- explicit child value overrides the fan-out ------------------------------

def test_explicit_child_value_not_overwritten(tmp_path):
    """SegmentBuilder uses setdefault: a document that explicitly supplies the
    dotted child field keeps its own value instead of the parent fan-out."""
    cfg = NrtsearchConfig.from_dict({
        "stateDir": str(tmp_path / "state"), "indexDir": str(tmp_path / "index"),
    })
    gs = GlobalState(cfg, LocalStateBackend(cfg.state_dir))
    h = Handlers(gs)
    h.createIndex(pb.CreateIndexRequest(indexName="idx"))
    h.registerFields(json_format.ParseDict(
        {"indexName": "idx", "field": FIELDS}, pb.FieldDefRequest()
    ))
    h.startIndex(pb.StartIndexRequest(indexName="idx"))
    r = pb.AddDocumentRequest(indexName="idx")
    r.fields["doc_id"].value.append("9")
    r.fields["tag"].value.append("parent words")
    r.fields["tag.keyword_tokenized"].value.append("override")
    h.addDocuments(iter([r]))
    h.refresh(pb.RefreshRequest(indexName="idx"))
    assert _doc_ids(h, _term("tag.keyword_tokenized", "override")) == {"9"}
    assert _doc_ids(h, _term("tag.keyword_tokenized", "parent words")) == set()
    assert _doc_ids(h, _term("tag", "parent")) == {"9"}
