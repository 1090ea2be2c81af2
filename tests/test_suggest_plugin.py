"""CONTEXT_SUGGEST completion queries; plugin loading from config."""

import json

import pytest

from nrtsearch_tpu.client import NrtsearchClient
from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.grpc_server import NrtsearchServer


@pytest.fixture()
def server(tmp_path):
    srv = NrtsearchServer(NrtsearchConfig.from_dict({
        "stateDir": str(tmp_path / "s"),
        "indexDir": str(tmp_path / "i"),
        "plugins": ["examples.example_plugin"],
    }))
    port = srv.start(0)
    client = NrtsearchClient(f"localhost:{port}")
    client.create_index("idx")
    client.register_fields(pb.FieldDefRequest(indexName="idx", field=[
        pb.Field(name="id", type=pb.FieldType._ID, store=True),
        pb.Field(name="sugg", type=pb.FieldType.CONTEXT_SUGGEST, store=True),
    ]))
    client.start_index(pb.StartIndexRequest(indexName="idx", mode=pb.Mode.STANDALONE))
    data = [
        ("0", {"value": "pizza palace", "weight": 10, "contexts": ["sf"]}),
        ("1", {"value": "pizza hut", "weight": 5, "contexts": ["nyc"]}),
        ("2", {"value": "pasta place", "weight": 7, "contexts": ["sf"]}),
    ]
    reqs = []
    for i, s in data:
        r = pb.AddDocumentRequest(indexName="idx")
        r.fields["id"].value.append(i)
        r.fields["sugg"].value.append(json.dumps(s))
        reqs.append(r)
    client.add_documents(reqs)
    client.refresh("idx")
    yield srv, client
    client.close()
    srv.stop()


def test_completion_prefix(server):
    _, client = server
    req = pb.SearchRequest(indexName="idx", topHits=10, retrieveFields=["id"])
    req.query.completionQuery.field = "sugg"
    req.query.completionQuery.text = "pizz"
    resp = client.search(req)
    ids = [h.fields["id"].fieldValue[0].textValue for h in resp.hits]
    assert ids == ["0", "1"]  # ordered by weight 10 > 5
    assert resp.hits[0].score == 10.0


def test_completion_contexts_and_fuzzy(server):
    _, client = server
    req = pb.SearchRequest(indexName="idx", topHits=10, retrieveFields=["id"])
    req.query.completionQuery.field = "sugg"
    req.query.completionQuery.text = "p"
    req.query.completionQuery.contexts.append("sf")
    resp = client.search(req)
    ids = {h.fields["id"].fieldValue[0].textValue for h in resp.hits}
    assert ids == {"0", "2"}

    # fuzzy: one typo in the prefix
    req2 = pb.SearchRequest(indexName="idx", topHits=10, retrieveFields=["id"])
    req2.query.completionQuery.field = "sugg"
    req2.query.completionQuery.text = "puzza"
    req2.query.completionQuery.queryType = pb.CompletionQueryType.FUZZY_QUERY
    resp2 = client.search(req2)
    assert {h.fields["id"].fieldValue[0].textValue for h in resp2.hits} == {"0", "1"}


def test_suggest_survives_commit_and_restart(server, tmp_path):
    srv, client = server
    client.commit("idx")
    client.close()
    srv.stop()
    srv2 = NrtsearchServer(NrtsearchConfig.from_dict({
        "stateDir": srv.config.state_dir, "indexDir": srv.config.index_dir,
    }))
    port2 = srv2.start(0)
    c2 = NrtsearchClient(f"localhost:{port2}")
    try:
        req = pb.SearchRequest(indexName="idx", topHits=10, retrieveFields=["id"])
        req.query.completionQuery.field = "sugg"
        req.query.completionQuery.text = "pasta"
        resp = c2.search(req)
        assert [h.fields["id"].fieldValue[0].textValue for h in resp.hits] == ["2"]
    finally:
        c2.close()
        srv2.stop()


def test_example_plugin_loaded(server):
    srv, client = server
    resp = client.custom(pb.CustomRequest(id="example", path="greet",
                                          params={"name": "tpu"}))
    assert resp.response["hello"] == "tpu"
    # plugin analyzer registered
    from nrtsearch_tpu.analysis import get_analyzer

    assert get_analyzer("example_ws_lower").terms("Hello WORLD") == ["hello", "world"]


def test_completion_weight_ordering_and_multi_context(server):
    """Completion results rank by suggestion WEIGHT descending (reference:
    suggest ranking), multiple contexts OR together, and suggestions
    survive across segments."""
    _, client = server
    # second segment with overlapping prefixes + multi-context entries
    extra = [
        ("3", {"value": "pizza express", "weight": 20,
               "contexts": ["sf", "nyc"]}),
        ("4", {"value": "pizzeria uno", "weight": 1, "contexts": ["chi"]}),
    ]
    reqs = []
    for i, s in extra:
        r = pb.AddDocumentRequest(indexName="idx")
        r.fields["id"].value.append(i)
        r.fields["sugg"].value.append(json.dumps(s))
        reqs.append(r)
    client.add_documents(reqs)
    client.refresh("idx")

    def run(text, ctxs=()):
        req = pb.SearchRequest(indexName="idx", topHits=10,
                               retrieveFields=["id"])
        req.query.completionQuery.field = "sugg"
        req.query.completionQuery.text = text
        for c in ctxs:
            req.query.completionQuery.contexts.append(c)
        resp = client.search(req)
        return [h.fields["id"].fieldValue[0].textValue for h in resp.hits]

    # weight desc: express(20) > palace(10) > hut(5) > pizzeria(1)
    assert run("pizz") == ["3", "0", "1", "4"]
    # contexts OR: sf OR chi
    assert set(run("pizz", ["sf", "chi"])) == {"3", "0", "4"}
    # multi-context entry reachable from either context
    assert "3" in run("pizz", ["nyc"])
