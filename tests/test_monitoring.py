"""Monitoring breadth: the /metrics scrape exposes the reference's collector
families (reference: server/monitoring/, registered NrtsearchServer.java:255-281
— merge scheduler, searcher age, thread pools, proc stats, search timing)."""

import pytest

from nrtsearch_tpu.client import NrtsearchClient
from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.grpc_server import NrtsearchServer


@pytest.fixture()
def server(tmp_path):
    config = NrtsearchConfig.from_dict(
        {"stateDir": str(tmp_path / "state"), "indexDir": str(tmp_path / "index")}
    )
    srv = NrtsearchServer(config)
    port = srv.start(0)
    client = NrtsearchClient(f"localhost:{port}")
    yield srv, client
    client.close()
    srv.stop()


def _index_with_merges(client, name="midx", batches=6):
    client.create_index(name)
    client.register_fields(pb.FieldDefRequest(indexName=name, field=[
        pb.Field(name="id", type=pb.FieldType._ID, storeDocValues=True),
        pb.Field(name="body", type=pb.FieldType.TEXT, search=True),
    ]))
    # tiny segmentsPerTier so a handful of flushes triggers tiered merges
    lsreq = pb.LiveSettingsV2Request(indexName=name)
    lsreq.liveSettings.segmentsPerTier.value = 2
    client.live_settings_v2(lsreq)
    client.start_index(pb.StartIndexRequest(indexName=name, mode=pb.Mode.STANDALONE))
    n = 0
    for b in range(batches):
        reqs = []
        for i in range(4):
            r = pb.AddDocumentRequest(indexName=name)
            r.fields["id"].value.append(f"d{n}")
            r.fields["body"].value.append(f"quick brown doc number {n}")
            reqs.append(r)
            n += 1
        client.add_documents(iter(reqs))
        client.refresh(name)
    return name


def test_metrics_families(server):
    srv, client = server
    name = _index_with_merges(client)

    # a search to populate stage timings + FETCH pool counters
    req = pb.SearchRequest(indexName=name, topHits=10)
    req.retrieveFields.append("id")
    req.query.matchQuery.field = "body"
    req.query.matchQuery.query = "quick"
    resp = client.search(req)
    assert resp.totalHits.value > 0

    text = client.metrics().data.decode()
    # index + searcher-age gauges
    assert f'nrt_index_num_docs{{index="{name}"}}' in text
    assert f'nrt_searcher_age_seconds{{index="{name}"}}' in text
    # merge scheduler activity actually fired (segmentsPerTier=2, 6 flushes)
    merges = [
        line for line in text.splitlines()
        if line.startswith("nrt_index_merges{") and name in line
    ]
    assert merges and float(merges[0].split()[-1]) > 0
    assert "nrt_index_merge_seconds" in text
    assert "nrt_index_merged_docs" in text
    # per-stage search timing histograms
    for stage in ("recall", "fetch", "rescore", "total"):
        assert f'stage="{stage}"' in text
    # pool + proc stats
    assert "nrt_pool_tasks_submitted" in text
    assert "nrt_pool_tasks_rejected" in text
    assert "nrt_pool_queue_depth" in text
    assert "process_resident_memory_bytes" in text
    assert "process_cpu_seconds_total" in text
    # pre-existing families still present
    assert "grpc_server_handled_latency_seconds" in text
    assert "nrt_current_point_version" in text


def test_pool_rejection_caller_runs():
    """Backlogged pools run overflow tasks in the caller thread and count
    the rejection (reference: bounded queue + rejection counter)."""
    import time

    from nrtsearch_tpu.server.concurrent import TrackedPool

    p = TrackedPool("T", 1)
    p.max_queue = 2
    results = []
    futs = [p.submit(lambda: (time.sleep(0.05), results.append("pool"))[1])
            for _ in range(3)]
    # queue is full now: this one must run inline, in THIS thread
    import threading

    caller = threading.get_ident()
    where = {}
    f = p.submit(lambda: where.setdefault("tid", threading.get_ident()))
    f.result()
    assert where["tid"] == caller
    assert p.rejected == 1
    assert p.submitted == 4
    for fu in futs:
        fu.result()
    p.shutdown(wait=True)
