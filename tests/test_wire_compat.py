"""Drop-in wire compatibility proof: stubs generated from the REFERENCE's
published .proto files drive this server end-to-end.

The server (this process) uses nrtsearch_tpu's bindings; the CLIENT runs in
a subprocess whose generated code comes ONLY from
/root/reference/clientlib/src/main/proto/yelp/nrtsearch/*.proto — byte-for-
byte what a stock nrtsearch client sends (the subprocess also keeps the two
descriptor pools apart: our schema carries extension fields >= 1001 under
the same proto file names). Covers index lifecycle, streamed indexing,
search (query tree, sort + searchAfter, collectors, facets, boolean/phrase),
metrics-as-HttpBody, health, commit/delete, and the replication service's
copy-state surface.
"""

import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import pytest

grpc = pytest.importorskip("grpc")

REF_PROTO = Path("/root/reference/clientlib/src/main/proto")
SITE = Path(__import__("google.protobuf", fromlist=["__file__"]).__file__).parents[2]

CLIENT_SCRIPT = r'''
import sys

import grpc
from yelp.nrtsearch import luceneserver_pb2 as ls
from yelp.nrtsearch import search_pb2 as sp

PORT, RPORT = int(sys.argv[1]), int(sys.argv[2])
SERVICE = "luceneserver.LuceneServer"


def unary(channel, name, req, resp_t, service=SERVICE):
    call = channel.unary_unary(
        f"/{service}/{name}",
        request_serializer=lambda m: m.SerializeToString(),
        response_deserializer=resp_t.FromString,
    )
    return call(req)


channel = grpc.insecure_channel(f"localhost:{PORT}")

# ---- lifecycle -------------------------------------------------------------
unary(channel, "createIndex", ls.CreateIndexRequest(indexName="wix"),
      ls.CreateIndexResponse)
freq = ls.FieldDefRequest(indexName="wix")
for name, ftype, extra in [
    ("id", "_ID", {"storeDocValues": True}),
    ("body", "TEXT", {"search": True, "store": True, "storeDocValues": True}),
    ("price", "INT", {"storeDocValues": True, "sort": True}),
    ("color", "ATOM", {"storeDocValues": True, "search": True}),
]:
    f = freq.field.add()
    f.name = name
    f.type = ls.FieldType.Value(ftype)
    for k, v in extra.items():
        setattr(f, k, v)
unary(channel, "registerFields", freq, ls.FieldDefResponse)
unary(channel, "startIndex", ls.StartIndexRequest(indexName="wix"),
      ls.StartIndexResponse)

rows = [
    ("1", "red fish swims", 10, "red"),
    ("2", "blue fish sleeps", 25, "blue"),
    ("3", "red dog barks", 40, "red"),
    ("4", "green bird sings loud", 5, "green"),
    ("5", "red bird red flight", 55, "red"),
]


def docs():
    for i, body, price, color in rows:
        d = ls.AddDocumentRequest(indexName="wix")
        d.fields["id"].value.append(i)
        d.fields["body"].value.append(body)
        d.fields["price"].value.append(str(price))
        d.fields["color"].value.append(color)
        yield d


add = channel.stream_unary(
    f"/{SERVICE}/addDocuments",
    request_serializer=lambda m: m.SerializeToString(),
    response_deserializer=ls.AddDocumentResponse.FromString,
)
add(docs())
unary(channel, "refresh", ls.RefreshRequest(indexName="wix"),
      ls.RefreshResponse)

# ---- term query ------------------------------------------------------------
req = sp.SearchRequest(indexName="wix", topHits=10, retrieveFields=["id"])
req.query.termQuery.field = "body"
req.query.termQuery.textValue = "red"
resp = unary(channel, "search", req, sp.SearchResponse)
assert resp.totalHits.value == 3, resp.totalHits
ids = [h.fields["id"].fieldValue[0].textValue for h in resp.hits]
assert set(ids) == {"1", "3", "5"} and ids[0] == "5", ids

# ---- sort + searchAfter ----------------------------------------------------
req = sp.SearchRequest(indexName="wix", topHits=2, retrieveFields=["id"])
req.query.matchAllQuery.SetInParent()
st = req.querySort.fields.sortedFields.add()
st.fieldName = "price"
st.reverse = True
resp = unary(channel, "search", req, sp.SearchResponse)
ids = [h.fields["id"].fieldValue[0].textValue for h in resp.hits]
assert ids == ["5", "3"], ids
req2 = sp.SearchRequest(indexName="wix", topHits=2, retrieveFields=["id"])
req2.query.matchAllQuery.SetInParent()
st2 = req2.querySort.fields.sortedFields.add()
st2.fieldName = "price"
st2.reverse = True
req2.searchAfter.lastDocId = resp.searchState.lastDocId
req2.searchAfter.lastScore = resp.searchState.lastScore
for v in resp.searchState.lastFieldValues:
    req2.searchAfter.lastFieldValues.append(v)
resp2 = unary(channel, "search", req2, sp.SearchResponse)
ids2 = [h.fields["id"].fieldValue[0].textValue for h in resp2.hits]
assert ids2 == ["2", "1"], ids2

# ---- collectors + facets ---------------------------------------------------
req = sp.SearchRequest(indexName="wix", topHits=1)
req.query.matchAllQuery.SetInParent()
req.collectors["total"].sum.script.source = "price"
req.collectors["cheap"].filter.query.rangeQuery.field = "price"
req.collectors["cheap"].filter.query.rangeQuery.upper = "25"
facet = req.facets.add()
facet.dim = "color"
facet.topN = 10
resp = unary(channel, "search", req, sp.SearchResponse)
assert resp.collectorResults["total"].doubleResult.value == 135.0
assert resp.collectorResults["cheap"].filterResult.docCount == 3
counts = {lv.label: lv.value for lv in resp.facetResult[0].labelValues}
assert counts == {"red": 3, "blue": 1, "green": 1}, counts

# ---- boolean + phrase ------------------------------------------------------
req = sp.SearchRequest(indexName="wix", topHits=10, retrieveFields=["id"])
c1 = req.query.booleanQuery.clauses.add()
c1.occur = sp.BooleanClause.Occur.MUST
c1.query.termQuery.field = "body"
c1.query.termQuery.textValue = "red"
c2 = req.query.booleanQuery.clauses.add()
c2.occur = sp.BooleanClause.Occur.MUST_NOT
c2.query.termQuery.field = "body"
c2.query.termQuery.textValue = "dog"
resp = unary(channel, "search", req, sp.SearchResponse)
got = {h.fields["id"].fieldValue[0].textValue for h in resp.hits}
assert got == {"1", "5"}, got

preq = sp.SearchRequest(indexName="wix", topHits=10, retrieveFields=["id"])
preq.query.phraseQuery.field = "body"
preq.query.phraseQuery.terms.extend(["red", "fish"])
presp = unary(channel, "search", preq, sp.SearchResponse)
pids = {h.fields["id"].fieldValue[0].textValue for h in presp.hits}
assert pids == {"1"}, pids

# ---- metrics (HttpBody) + health -------------------------------------------
from google.api import httpbody_pb2
from google.protobuf import empty_pb2

body = unary(channel, "metrics", empty_pb2.Empty(), httpbody_pb2.HttpBody)
assert b"nrt" in body.data or b"grpc" in body.data
hc = unary(channel, "status", ls.HealthCheckRequest(check=True),
           ls.HealthCheckResponse)
assert hc.health == ls.TransferStatusCode.Done

# ---- stats + replication copy state -----------------------------------------
stt = unary(channel, "stats", ls.StatsRequest(indexName="wix"),
            ls.StatsResponse)
assert stt.numDocs == 5, stt.numDocs
rchan = grpc.insecure_channel(f"localhost:{RPORT}")
cs = unary(rchan, "recvCopyState", ls.CopyStateRequest(indexName="wix"),
           ls.CopyState, service="luceneserver.ReplicationServer")
assert cs.version >= 1
assert cs.filesMetadata.numFiles == len(cs.filesMetadata.fileMetadata) > 0
assert cs.infoBytesLength == len(cs.infoBytes) > 0

# raw file streaming: chunks of the first point file over the wire
fname0 = cs.filesMetadata.fileMetadata[0].fileName
stream = rchan.unary_stream(
    "/luceneserver.ReplicationServer/recvRawFile",
    request_serializer=lambda m: m.SerializeToString(),
    response_deserializer=ls.RawFileChunk.FromString,
)
total = sum(len(c.content) for c in stream(
    ls.FileInfo(fileName=fname0, fpStart=0, indexName="wix")))
assert total == cs.filesMetadata.fileMetadata[0].len, (fname0, total)

# searcher version + connected nodes (the two RPCs renamed in round 2;
# now byte-compatible with the reference's method paths)
sv = unary(rchan, "getCurrentSearcherVersion", ls.IndexName(indexName="wix"),
           ls.SearcherVersion, service="luceneserver.ReplicationServer")
assert sv.version >= 1
gn = unary(rchan, "getConnectedNodes", ls.GetNodesRequest(indexName="wix"),
           ls.GetNodesResponse, service="luceneserver.ReplicationServer")
assert len(gn.nodes) == 0  # standalone: no replicas registered
rchan.close()

# ---- highlight (reference snake_case wrapper Settings) -----------------------
hreq = sp.SearchRequest(indexName="wix", topHits=3, retrieveFields=["id"])
hreq.query.termQuery.field = "body"
hreq.query.termQuery.textValue = "fish"
hreq.highlight.fields.append("body")
hset = hreq.highlight.settings
hset.pre_tags.append("<em>")
hset.post_tags.append("</em>")
hset.fragment_size.value = 30
hresp = unary(channel, "search", hreq, sp.SearchResponse)
frags = list(hresp.hits[0].highlights["body"].fragments)
assert frags and "<em>fish</em>" in frags[0], frags

# ---- rescorer (queryRescorer reorders the window) -----------------------------
rreq = sp.SearchRequest(indexName="wix", topHits=4, retrieveFields=["id"])
rreq.query.termQuery.field = "body"
rreq.query.termQuery.textValue = "red"
rs = rreq.rescorers.add()
rs.windowSize = 4
rs.queryRescorer.rescoreQuery.termQuery.field = "body"
rs.queryRescorer.rescoreQuery.termQuery.textValue = "dog"
rs.queryRescorer.queryWeight = 0.0
rs.queryRescorer.rescoreQueryWeight = 10.0
rresp = unary(channel, "search", rreq, sp.SearchResponse)
rids = [h.fields["id"].fieldValue[0].textValue for h in rresp.hits]
assert rids[0] == "3", rids   # the only red doc with "dog" boosts to top

# ---- liveSettingsV2 (wrapper types over the wire) -----------------------------
lreq = ls.LiveSettingsV2Request(indexName="wix")
lreq.liveSettings.sliceMaxDocs.value = 123
lresp = unary(channel, "liveSettingsV2", lreq, ls.LiveSettingsV2Response)
assert lresp.liveSettings.sliceMaxDocs.value == 123

# ---- delete + commit ---------------------------------------------------------
d = ls.AddDocumentRequest(indexName="wix")
d.fields["id"].value.append("4")
unary(channel, "delete", d, ls.AddDocumentResponse)
unary(channel, "refresh", ls.RefreshRequest(indexName="wix"),
      ls.RefreshResponse)
req = sp.SearchRequest(indexName="wix", topHits=10)
req.query.matchAllQuery.SetInParent()
resp = unary(channel, "search", req, sp.SearchResponse)
assert resp.totalHits.value == 4, resp.totalHits
cr = unary(channel, "commit", ls.CommitRequest(indexName="wix"),
           ls.CommitResponse)
assert cr.gen >= 1
channel.close()
print("WIRE-COMPAT OK")
'''


@pytest.mark.skipif(
    not REF_PROTO.exists() or shutil.which("protoc") is None,
    reason="reference protos or protoc unavailable",
)
def test_reference_stubs_drive_server(tmp_path):
    from nrtsearch_tpu.config import NrtsearchConfig
    from nrtsearch_tpu.server.grpc_server import NrtsearchServer

    # 1. generate client stubs from the REFERENCE protos
    out = tmp_path / "refstubs"
    out.mkdir()
    protos = sorted((REF_PROTO / "yelp/nrtsearch").glob("*.proto"))
    subprocess.run(
        ["protoc", f"-I{REF_PROTO}", f"-I{SITE}", f"--python_out={out}"]
        + [str(p) for p in protos],
        check=True,
    )
    (out / "yelp" / "__init__.py").touch()
    (out / "yelp" / "nrtsearch" / "__init__.py").touch()

    # 2. start our server in-process
    cfg = NrtsearchConfig.from_dict(
        {"stateDir": str(tmp_path / "state"),
         "indexDir": str(tmp_path / "index"),
         "port": 0, "replicationPort": 0}
    )
    srv = NrtsearchServer(cfg)
    srv.start()
    try:
        # 3. drive it from a clean subprocess importing ONLY reference stubs
        script = tmp_path / "client.py"
        script.write_text(CLIENT_SCRIPT)
        with tempfile.TemporaryDirectory() as _:
            proc = subprocess.run(
                [sys.executable, str(script), str(srv.port),
                 str(srv.replication_port)],
                env={"PYTHONPATH": str(out), "PATH": "/usr/bin:/bin"},
                capture_output=True, text=True, timeout=180,
            )
        assert proc.returncode == 0, (proc.stdout, proc.stderr)
        assert "WIRE-COMPAT OK" in proc.stdout
    finally:
        srv.stop()
