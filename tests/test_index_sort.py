"""Index sort: docs within flushed/merged segments laid out in doc-value
order (reference: IndexSettings.indexSort -> IndexWriterConfig.setIndexSort,
ImmutableIndexState.validateIndexSort)."""

import grpc
import pytest

from nrtsearch_tpu.client import NrtsearchClient
from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.gen import pb
from nrtsearch_tpu.server.grpc_server import NrtsearchServer


@pytest.fixture()
def server(tmp_path):
    srv = NrtsearchServer(
        NrtsearchConfig.from_dict(
            {"stateDir": str(tmp_path / "s"), "indexDir": str(tmp_path / "i")}
        )
    )
    port = srv.start(0)
    c = NrtsearchClient(f"localhost:{port}")
    yield c, srv
    c.close()
    srv.stop()


FIELDS = [
    pb.Field(name="id", type=pb.FieldType._ID, store=True),
    pb.Field(name="body", type=pb.FieldType.TEXT, search=True),
    pb.Field(name="rank", type=pb.FieldType.LONG, storeDocValues=True),
]


def _setup(c, index_sort_fields):
    c.create_index("s")
    c.register_fields(pb.FieldDefRequest(indexName="s", field=FIELDS))
    req = pb.SettingsV2Request(indexName="s")
    for name, reverse in index_sort_fields:
        st = req.settings.indexSort.sortedFields.add()
        st.fieldName = name
        st.reverse = reverse
    c.settings_v2(req)
    c.start_index(pb.StartIndexRequest(indexName="s", mode=pb.Mode.STANDALONE))


def _add(c, rows):
    reqs = []
    for i, rank in rows:
        r = pb.AddDocumentRequest(indexName="s")
        r.fields["id"].value.append(str(i))
        r.fields["body"].value.append(f"doc {i}")
        if rank is not None:
            r.fields["rank"].value.append(str(rank))
        reqs.append(r)
    c.add_documents(reqs)
    c.refresh("s")


def _segment_order(srv):
    rt = srv.handlers.gs.get_runtime("s")
    out = []
    for seg in rt.writer.segments:
        out.append([seg.stored[d]["id"] for d in range(seg.num_docs)])
    return out


def test_flush_sorts_by_index_sort(server):
    c, srv = server
    _setup(c, [("rank", False)])
    _add(c, [("a", 30), ("b", 10), ("c", 20)])
    assert _segment_order(srv) == [["b", "c", "a"]]


def test_merge_keeps_index_sort(server):
    c, srv = server
    _setup(c, [("rank", True)])  # descending
    _add(c, [("a", 1), ("b", 5)])
    _add(c, [("c", 3), ("d", 9)])
    # force merge keeps the sort across segments
    c.force_merge("s", 1)
    assert _segment_order(srv) == [["d", "b", "c", "a"]]
    # searches still correct after the remap
    req = pb.SearchRequest(indexName="s", topHits=10, retrieveFields=["id"])
    req.query.termQuery.field = "id"
    req.query.termQuery.textValue = "c"
    resp = c.search(req)
    assert [h.fields["id"].fieldValue[0].textValue for h in resp.hits] == ["c"]


def test_missing_values_placement(server):
    c, srv = server
    _setup(c, [("rank", False)])
    _add(c, [("a", 5), ("b", None), ("c", 1)])
    # default missingLast=false: docs without the value sort first
    assert _segment_order(srv) == [["b", "c", "a"]]


def test_index_sort_requires_sortable_field(server):
    c, _ = server
    c.create_index("s")
    c.register_fields(pb.FieldDefRequest(indexName="s", field=FIELDS))
    req = pb.SettingsV2Request(indexName="s")
    st = req.settings.indexSort.sortedFields.add()
    st.fieldName = "body"  # TEXT without doc values
    c.settings_v2(req)
    with pytest.raises(grpc.RpcError) as ei:
        c.start_index(pb.StartIndexRequest(indexName="s", mode=pb.Mode.STANDALONE))
    assert "not index-sortable" in ei.value.details()
