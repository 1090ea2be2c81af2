"""Concurrent search + indexing + replication stress over real gRPC.

A live 1-primary + 2-replica in-process cluster under mixed load: one thread
streams document batches (with upserts) and publishes NRT points; searcher
threads hammer every node with scored, filtered, and faceted queries the
whole time. The test asserts zero RPC errors, replica convergence to the
final doc count, and monotonically non-decreasing searcher versions.

Reference shape: ReplicationFailureScenariosTest.java:33 +
YelpReviewsTest.java:75 (the soak: concurrent index/search on live
primary+replica)."""

import threading
import time

import pytest

from nrtsearch_tpu.client import NrtsearchClient
from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.grpc_server import NrtsearchServer

FIELDS = [
    pb.Field(name="doc_id", type=pb.FieldType._ID, store=True, storeDocValues=True),
    pb.Field(name="body", type=pb.FieldType.TEXT, search=True, store=True),
    pb.Field(name="price", type=pb.FieldType.INT, storeDocValues=True, sort=True),
    pb.Field(name="tag", type=pb.FieldType.ATOM, storeDocValues=True),
]

BATCHES = 10
BATCH_SIZE = 20
N_REPLICAS = 2

WORDS = ("quick", "brown", "fox", "lazy", "dog", "turtle", "tensor", "kernel")


def _doc(i: int) -> pb.AddDocumentRequest:
    r = pb.AddDocumentRequest(indexName="idx")
    r.fields["doc_id"].value.append(f"d{i}")
    r.fields["body"].value.append(
        f"{WORDS[i % len(WORDS)]} {WORDS[(i // 3) % len(WORDS)]} number {i}"
    )
    r.fields["price"].value.append(str(i % 100))
    r.fields["tag"].value.append(f"tag_{i % 5}")
    return r


@pytest.fixture()
def cluster(tmp_path):
    state = str(tmp_path / "state")
    primary = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": state, "indexDir": str(tmp_path / "p"), "nodeName": "primary"}
    ))
    p_port = primary.start(0)
    p_client = NrtsearchClient(f"localhost:{p_port}")
    p_client.create_index("idx")
    p_client.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    p_client.start_index(pb.StartIndexRequest(
        indexName="idx", mode=pb.Mode.PRIMARY, primaryGen=1))

    replicas, r_clients = [], []
    for i in range(N_REPLICAS):
        rep = NrtsearchServer(NrtsearchConfig.from_dict(
            {"stateDir": state, "indexDir": str(tmp_path / f"r{i}"),
             "nodeName": f"replica{i}"}
        ))
        rep.start(0)
        rc = NrtsearchClient(f"localhost:{rep.port}")
        rc.start_index(pb.StartIndexRequest(
            indexName="idx", mode=pb.Mode.REPLICA,
            primaryAddress=f"localhost:{primary.replication_port}",
        ))
        replicas.append(rep)
        r_clients.append(rc)
    yield primary, p_client, replicas, r_clients
    for c in [p_client, *r_clients]:
        c.close()
    for s in [primary, *replicas]:
        s.stop()


def test_concurrent_search_index_replicate(cluster):
    primary, p_client, replicas, r_clients = cluster
    errors: list[str] = []
    done = threading.Event()
    versions: dict[int, list[int]] = {i: [] for i in range(len(r_clients))}
    searches_done = [0] * (len(r_clients) + 1)

    def indexer():
        try:
            for b in range(BATCHES):
                docs = [_doc(b * BATCH_SIZE + i) for i in range(BATCH_SIZE)]
                if b >= 2:  # upsert churn: rewrite a few older docs
                    docs.extend(_doc(i) for i in range(3))
                p_client.add_documents(iter(docs))
                p_client.refresh("idx")
                if b % 4 == 3:
                    p_client.commit("idx")
                time.sleep(0.02)
        except Exception as e:  # noqa: BLE001
            errors.append(f"indexer: {e!r}")
        finally:
            done.set()

    def make_queries():
        qs = []
        q1 = pb.SearchRequest(indexName="idx", topHits=5, retrieveFields=["doc_id"])
        q1.query.matchQuery.field = "body"
        q1.query.matchQuery.query = "quick fox"
        qs.append(q1)
        q2 = pb.SearchRequest(indexName="idx", topHits=5)
        c = q2.query.booleanQuery.clauses.add()
        c.occur = pb.BooleanClause.Occur.MUST
        c.query.matchQuery.field = "body"
        c.query.matchQuery.query = "number"
        c2 = q2.query.booleanQuery.clauses.add()
        c2.occur = pb.BooleanClause.Occur.FILTER
        c2.query.rangeQuery.field = "price"
        c2.query.rangeQuery.upper = "50"
        qs.append(q2)
        q3 = pb.SearchRequest(indexName="idx", topHits=3)
        q3.query.termQuery.field = "tag"
        q3.query.termQuery.textValue = "tag_1"
        f = q3.facets.add()
        f.name = "tags"
        f.dim = "tag"
        qs.append(q3)
        return qs

    def searcher(slot: int, client: NrtsearchClient, track_version: bool):
        qs = make_queries()
        i = 0
        try:
            while not done.is_set() or i < 12:
                resp = client.search(qs[i % len(qs)])
                if track_version:
                    versions[slot].append(resp.searchState.searcherVersion)
                searches_done[slot] += 1
                i += 1
                time.sleep(0.005)
        except Exception as e:  # noqa: BLE001
            errors.append(f"searcher[{slot}]: {e!r}")

    # warm the query-shape compiles on every node so the concurrent phase
    # actually overlaps searching with indexing (first jit is seconds on CPU)
    p_client.add_documents(iter([_doc(0)]))
    p_client.refresh("idx")
    for c in [p_client, *r_clients]:
        for q in make_queries():
            c.search(q)

    threads = [threading.Thread(target=indexer)]
    for i, rc in enumerate(r_clients):
        threads.append(threading.Thread(target=searcher, args=(i, rc, True)))
    # the primary serves searches too (mixed-workload isolation check)
    threads.append(
        threading.Thread(target=searcher, args=(len(r_clients), p_client, False))
    )
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=240)
        assert not t.is_alive(), "stress thread hung"

    assert not errors, errors
    assert all(n >= 12 for n in searches_done), searches_done

    # replicas converge to the primary's final doc count
    expected = p_client.stats("idx").numDocs
    assert expected == BATCHES * BATCH_SIZE  # upserts replaced, not added
    deadline = time.time() + 30
    for rc in r_clients:
        while rc.stats("idx").numDocs != expected and time.time() < deadline:
            time.sleep(0.1)
        assert rc.stats("idx").numDocs == expected

    # searcher versions observed by live searches never went backwards
    for vs in versions.values():
        assert all(a <= b for a, b in zip(vs, vs[1:])), "version regressed"

    # and the final index is consistent on every node
    q = pb.SearchRequest(indexName="idx", topHits=1)
    q.query.matchAllQuery.SetInParent()
    totals = {c.search(q).totalHits.value for c in [p_client, *r_clients]}
    assert totals == {expected}


def test_commit_and_gc_during_replica_join(tmp_path):
    """A replica joins MID-STREAM while the primary keeps publishing,
    committing, and GC-ing stale files — the classic copy-vs-commit race
    (reference: ReplicationFailureScenariosTest concurrent commit cases +
    IndexWriter deleter protecting in-copy files). Asserts the join copy
    never errors and the replica converges to the primary's final count."""
    state = str(tmp_path / "state")
    primary = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": state, "indexDir": str(tmp_path / "p"),
         "nodeName": "primary"}
    ))
    p_port = primary.start(0)
    p_client = NrtsearchClient(f"localhost:{p_port}")
    p_client.create_index("idx")
    p_client.register_fields(pb.FieldDefRequest(indexName="idx", field=FIELDS))
    p_client.start_index(pb.StartIndexRequest(
        indexName="idx", mode=pb.Mode.PRIMARY, primaryGen=1))

    errors: list[str] = []
    done = threading.Event()

    def churn():
        # every batch: index + refresh(publish); commit + forceMerge churn
        # rewrites segment files so the GC path runs while copies stream
        try:
            for b in range(14):
                p_client.add_documents(
                    iter([_doc(b * BATCH_SIZE + i) for i in range(BATCH_SIZE)])
                )
                p_client.refresh("idx")
                p_client.commit("idx")
                if b % 3 == 2:
                    p_client.force_merge("idx", 1)
                    p_client.refresh("idx")
                time.sleep(0.01)
        except Exception as e:  # noqa: BLE001
            errors.append(f"churn: {e!r}")
        finally:
            done.set()

    t = threading.Thread(target=churn)
    t.start()
    time.sleep(0.15)  # let several points publish first

    # replica joins mid-churn: its initial full copy races commits + merges
    rep = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": state, "indexDir": str(tmp_path / "r"),
         "nodeName": "replica"}
    ))
    rep.start(0)
    rc = NrtsearchClient(f"localhost:{rep.port}")
    try:
        rc.start_index(pb.StartIndexRequest(
            indexName="idx", mode=pb.Mode.REPLICA,
            primaryAddress=f"localhost:{primary.replication_port}",
        ))
        t.join(timeout=180)
        assert not t.is_alive(), "churn thread hung"
        assert not errors, errors

        expected = p_client.stats("idx").numDocs
        assert expected == 14 * BATCH_SIZE
        deadline = time.time() + 60
        got = -1
        while time.time() < deadline:
            got = rc.stats("idx").numDocs
            if got == expected:
                break
            time.sleep(0.25)
        assert got == expected, f"replica stuck at {got}/{expected}"
    finally:
        rc.close()
        p_client.close()
        rep.stop()
        primary.stop()
