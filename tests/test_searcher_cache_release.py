"""Device-cache lifecycle across refreshes (the e2e ingest OOM fix).

Under streaming ingest the refresh ticker publishes a searcher per second;
each snapshot's packed view + dense-head rows is O(index) HBM. Superseded
snapshots must drop those caches at publish time (not at the 60 s age-out),
warms must serialize latest-wins, and a version-pinned search on a released
snapshot must still answer by rebuilding lazily.

Reference contract being preserved: SearcherLifetimeManager keeps pinned
versions *searchable* (SearchHandler.java:765) — it never promises they keep
their caches warm.
"""

import time

import pytest

from nrtsearch_tpu.server.index_runtime import IndexRuntime
from nrtsearch_tpu.state.index_state import IndexStateInfo
from nrtsearch_tpu.query.plan import parse_query


@pytest.fixture()
def rt(tmp_path):
    info = IndexStateInfo(index_name="t", index_id="t-1").with_fields({
        "id": {"type": "_ID", "store": True},
        "body": {"type": "TEXT", "search": True},
    })
    rt = IndexRuntime(info, tmp_path, mode="STANDALONE")
    rt.start()
    yield rt
    rt.stop()


def _ingest_rounds(rt, rounds=6, per=10):
    for i in range(rounds):
        rt.add_documents([
            {"id": str(i * per + j), "body": f"hello world w{j}"}
            for j in range(per)
        ])
        rt.refresh()


def test_superseded_snapshots_drop_device_caches(rt):
    _ingest_rounds(rt)
    # wait for the (serialized) warm of the current searcher to settle
    t = rt._warm_thread
    if t is not None:
        t.join(timeout=30)
    cur = rt._version
    old = [v for v in sorted(rt._searchers_by_version) if v < cur - 1]
    assert old, "test needs at least one superseded retained version"
    for v in old:
        s = rt._searchers_by_version[v]
        assert not getattr(s, "_packed_views", None), (
            f"superseded searcher v{v} still pins packed device views"
        )
        assert not getattr(s, "_gsort_cache", None)
        assert not getattr(s, "_dist_cache", None)


def test_current_searcher_keeps_warm_caches(rt):
    _ingest_rounds(rt, rounds=2)
    t = rt._warm_thread
    if t is not None:
        t.join(timeout=30)
    views = getattr(rt.searcher, "_packed_views", None)
    assert views and "body" in views, "current searcher should be warm"


def test_pinned_search_on_released_snapshot_rebuilds(rt):
    _ingest_rounds(rt)
    cur = rt._version
    old = [v for v in sorted(rt._searchers_by_version) if v < cur - 1]
    node = parse_query({"matchQuery": {"field": "body", "query": "hello"}})
    s_old = rt.acquire(version=old[0])
    td = s_old.search(node, top_hits=5)
    assert td.total_hits == 10  # first round's docs only


def test_warm_latest_wins_serialized(rt):
    """Rapid refreshes: stale warms exit without building; no thread pileup."""
    _ingest_rounds(rt, rounds=8, per=5)
    t = rt._warm_thread
    if t is not None:
        t.join(timeout=30)
    # after settling, only current (and possibly previous) hold views
    held = [
        v for v, s in rt._searchers_by_version.items()
        if getattr(s, "_packed_views", None)
    ]
    assert all(v >= rt._version - 1 for v in held), held


def test_refresh_ticker_rereads_live_setting(tmp_path):
    """maxRefreshSec is LIVE: raising it mid-ingest stops the auto-refresh
    (bulk-load posture); lowering it resumes. Reference:
    ControlledRealTimeReopenThread reconfigured on liveSettings updates."""
    info = IndexStateInfo(index_name="t2", index_id="t2-1").with_fields({
        "id": {"type": "_ID", "store": True},
        "body": {"type": "TEXT", "search": True},
    }).with_live_settings({"maxRefreshSec": 0.1})
    rt = IndexRuntime(info, tmp_path, mode="STANDALONE")
    rt.start()
    try:
        rt.add_documents([{"id": "1", "body": "hello"}])
        deadline = time.time() + 5.0
        while rt._version == 0 and time.time() < deadline:
            time.sleep(0.05)
        assert rt._version > 0, "ticker at 0.1s should have refreshed"

        rt.state_info = rt.state_info.with_live_settings(
            {"maxRefreshSec": 600.0}
        )
        # let the in-flight short tick drain, then buffer docs: no refresh
        time.sleep(0.3)
        v = rt._version
        rt.add_documents([{"id": "2", "body": "world"}])
        time.sleep(1.0)
        assert rt._version == v, "long maxRefreshSec must stop the ticker"
        assert rt.writer.buffered_docs > 0
    finally:
        rt.stop()


def test_refresh_publishes_flushed_but_unpublished_segments(tmp_path):
    """Ingest whose last add exactly fills the buffer: the flush happens
    inside add_documents, so at refresh() time buffered==0 and the writer's
    segment list is unchanged by the flush call — refresh must STILL
    publish, because the current searcher has never seen those segments
    (1M-doc e2e regression: numDocs=0 after ingesting 1,000,000 docs)."""
    info = IndexStateInfo(index_name="t3", index_id="t3-1").with_fields({
        "id": {"type": "_ID", "store": True},
        "body": {"type": "TEXT", "search": True},
    }).with_live_settings({"maxRefreshSec": 600.0})  # ticker effectively off
    rt = IndexRuntime(info, tmp_path, mode="STANDALONE")
    rt.start()
    try:
        rt.writer.max_buffer_docs = 10
        # 20 docs = exactly 2 buffer fills -> 2 flushes inside add, 0 buffered
        for base in (0, 10):
            rt.add_documents([
                {"id": str(base + j), "body": f"hello w{base + j}"}
                for j in range(10)
            ])
        assert rt.writer.buffered_docs == 0
        rt.refresh()
        assert rt.searcher.num_docs == 20
        node = parse_query({"matchQuery": {"field": "body", "query": "hello"}})
        assert rt.searcher.search(node, top_hits=5).total_hits == 20
        # idempotence: a second refresh with nothing new publishes nothing
        v = rt._version
        rt.refresh()
        assert rt._version == v
    finally:
        rt.stop()
