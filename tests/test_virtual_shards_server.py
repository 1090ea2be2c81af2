"""liveSettings.virtualShards served through the real Handlers (VERDICT r3 #5).

The reference bin-packs segments into `virtualShards` balanced groups
(MyIndexSearcher.slicesForShards:117, liveSettings.virtualShards
luceneserver.proto:1458). The TPU re-expression: postings re-partition
round-robin over a (shard, data) device mesh and plain text queries serve
as one SPMD program with an all_gather top-k merge. These tests drive the
PUBLIC server surface (Handlers.search) on the 8-virtual-device CPU rig
and assert exact parity against the single-device path.
"""

import json

import numpy as np
import pytest
from google.protobuf import json_format

from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.handlers import Handlers
from nrtsearch_tpu.state.backend import LocalStateBackend
from nrtsearch_tpu.state.global_state import GlobalState

DOCS = 400


def _mk_server(tmp_path, name):
    work = tmp_path / name
    cfg = NrtsearchConfig.from_dict({
        "stateDir": str(work / "state"), "indexDir": str(work / "index"),
    })
    gs = GlobalState(cfg, LocalStateBackend(cfg.state_dir))
    h = Handlers(gs)
    h.createIndex(pb.CreateIndexRequest(indexName="idx"))
    freq = json_format.ParseDict(
        {
            "indexName": "idx",
            "field": [
                {"name": "id", "type": "_ID", "store": True},
                {"name": "body", "type": "TEXT", "search": True,
                 "storeDocValues": True},
                {"name": "rank", "type": "INT", "storeDocValues": True},
            ],
        },
        pb.FieldDefRequest(),
    )
    h.registerFields(freq)
    h.startIndex(pb.StartIndexRequest(indexName="idx"))
    import random

    rng = random.Random(29)
    reqs = []
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "common", "rare"]
    for i in range(DOCS):
        words = ["common"] * (1 + rng.randint(0, 2))
        words += [rng.choice(vocab[:6]) for _ in range(rng.randint(2, 6))]
        if i % 41 == 0:
            words.append("rare")
        r = pb.AddDocumentRequest(indexName="idx")
        r.fields["id"].value.append(str(i))
        r.fields["body"].value.append(" ".join(words))
        r.fields["rank"].value.append(str(i % 7))
        reqs.append(r)
    h.addDocuments(iter(reqs))
    h.refresh(pb.RefreshRequest(indexName="idx"))
    return h


def _search(h, query_text, top=10):
    req = json_format.ParseDict(
        {
            "indexName": "idx",
            "topHits": top,
            "query": {"matchQuery": {"field": "body", "query": query_text}},
            "retrieveFields": ["id"],
        },
        pb.SearchRequest(),
    )
    return h.search(req)


@pytest.fixture(scope="module")
def servers(tmp_path_factory):
    root = tmp_path_factory.mktemp("vshards")
    base = _mk_server(root, "base")
    sharded = _mk_server(root, "sharded")
    ls = json_format.ParseDict(
        {"indexName": "idx", "virtualShards": 4}, pb.LiveSettingsRequest()
    )
    sharded.liveSettings(ls)
    return base, sharded


def test_live_setting_reaches_searcher(servers):
    base, sharded = servers
    rt = sharded.gs.runtimes["idx"]
    assert rt.searcher.dist_shards == 4
    assert base.gs.runtimes["idx"].searcher.dist_shards == 1


@pytest.mark.parametrize("query", [
    "common alpha", "rare", "beta gamma delta", "epsilon common rare",
    "nosuchterm", "zeta",
])
def test_sharded_search_exact_parity(servers, query):
    base, sharded = servers
    r0 = _search(base, query)
    r1 = _search(sharded, query)
    assert r1.totalHits.value == r0.totalHits.value
    assert len(r1.hits) == len(r0.hits)
    for h0, h1 in zip(r0.hits, r1.hits):
        assert h0.fields["id"].fieldValue[0].textValue == \
            h1.fields["id"].fieldValue[0].textValue
        assert h1.score == pytest.approx(h0.score, rel=2e-5)


def test_sharded_general_path_falls_back(servers):
    """Filtered/sorted queries keep the local path — results must still be
    correct through the same public surface."""
    base, sharded = servers
    req_d = {
        "indexName": "idx",
        "topHits": 10,
        "query": {
            "booleanQuery": {
                "clauses": [
                    {"occur": "MUST",
                     "query": {"matchQuery": {"field": "body",
                                              "query": "common"}}},
                    {"occur": "FILTER",
                     "query": {"rangeQuery": {"field": "rank",
                                              "lower": "2", "upper": "5"}}},
                ]
            }
        },
        "retrieveFields": ["id"],
    }
    r0 = sharded.search(json_format.ParseDict(dict(req_d), pb.SearchRequest()))
    r1 = base.search(json_format.ParseDict(dict(req_d), pb.SearchRequest()))
    assert r0.totalHits.value == r1.totalHits.value
    ids0 = [h.fields["id"].fieldValue[0].textValue for h in r0.hits]
    ids1 = [h.fields["id"].fieldValue[0].textValue for h in r1.hits]
    assert ids0 == ids1


def test_shards_cap_at_device_count(servers):
    _, sharded = servers
    rt = sharded.gs.runtimes["idx"]
    st = rt.searcher._distributed_state("body")
    assert st.mesh.shape["shard"] * st.mesh.shape["data"] <= 8
    assert st.mesh.shape["shard"] >= 2
