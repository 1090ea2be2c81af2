"""Vector search: exact brute-force kNN (recall 1.0 by construction), Lucene
similarity score mappings, filtered kNN, hybrid BM25+kNN, IVF recall."""

import numpy as np
import pytest

from nrtsearch_tpu.core.searcher import Searcher
from nrtsearch_tpu.core.writer import IndexWriter
from nrtsearch_tpu.ops.knn import IVFIndex, knn_search
from nrtsearch_tpu.query.plan import parse_query
from nrtsearch_tpu.schema.fields import create_field_def

DIMS = 16


@pytest.fixture(scope="module")
def vec_index():
    rng = np.random.default_rng(11)
    fields = {
        "doc_id": create_field_def("doc_id", {"type": "_ID", "store": True}),
        "body": create_field_def("body", {"type": "TEXT", "search": True}),
        "vec": create_field_def(
            "vec", {"type": "VECTOR", "vectorDimensions": DIMS,
                    "vectorSimilarity": "l2_norm", "store": False}
        ),
        "price": create_field_def("price", {"type": "INT", "storeDocValues": True}),
    }
    vectors = rng.normal(size=(200, DIMS)).astype(np.float32)
    w = IndexWriter(fields)
    docs = []
    for i, v in enumerate(vectors):
        docs.append(
            {
                "doc_id": str(i),
                "body": f"document number {i} " + ("tpu " if i % 2 == 0 else "cpu "),
                "vec": v.tolist(),
                "price": str(i),
            }
        )
    w.add_documents(docs)
    searcher = Searcher(w.refresh(), fields, version=1)
    return searcher, vectors, fields


def test_exact_knn_matches_numpy(vec_index):
    searcher, vectors, _ = vec_index
    rng = np.random.default_rng(5)
    q = rng.normal(size=DIMS).astype(np.float32)
    td = searcher.knn_search("vec", q, k=10)
    d2 = np.sum((vectors - q) ** 2, axis=1)
    ref_order = np.argsort(d2, kind="stable")[:10]
    got = [h.global_ord for h in td.hits]
    assert got == ref_order.tolist()
    for h in td.hits:
        assert h.score == pytest.approx(1.0 / (1.0 + d2[h.global_ord]), rel=1e-4)


def test_similarity_mappings():
    rng = np.random.default_rng(1)
    import jax.numpy as jnp

    V = rng.normal(size=(64, DIMS)).astype(np.float32)
    q = rng.normal(size=(2, DIMS)).astype(np.float32)
    sq = np.sum(V * V, axis=1).astype(np.float32)
    mask = np.ones(64, bool)
    for sim, ref_fn in [
        ("dot_product", lambda d, c: (1 + d) / 2),
        ("cosine", lambda d, c: (1 + c) / 2),
        ("max_inner_product", lambda d, c: np.where(d >= 0, d + 1, 1 / (1 - d))),
    ]:
        scores, ids = knn_search(
            jnp.asarray(V), jnp.asarray(sq), jnp.asarray(mask), jnp.asarray(q),
            similarity=sim, k=5,
        )
        dots = q @ V.T
        cos = dots / (
            np.linalg.norm(q, axis=1, keepdims=True) * np.linalg.norm(V, axis=1)
        )
        ref = ref_fn(dots, cos)
        for b in range(2):
            order = np.argsort(-ref[b], kind="stable")[:5]
            np.testing.assert_array_equal(np.asarray(ids[b]), order)
            np.testing.assert_allclose(np.asarray(scores[b]), ref[b][order], rtol=1e-4)


def test_filtered_knn(vec_index):
    searcher, vectors, _ = vec_index
    q = vectors[7]  # exact vector of doc 7
    filt = parse_query({"rangeQuery": {"field": "price", "upper": "50"}})
    td = searcher.knn_search("vec", q, k=5, filter_node=filt)
    assert td.hits[0].global_ord == 7
    assert all(h.global_ord <= 50 for h in td.hits)

    # filter that excludes the nearest neighbor
    filt2 = parse_query({"rangeQuery": {"field": "price", "lower": "100"}})
    td2 = searcher.knn_search("vec", q, k=5, filter_node=filt2)
    assert all(h.global_ord >= 100 for h in td2.hits)


def test_knn_total_hits_is_filtered_match_count(vec_index):
    """totalHits reports the true candidate count (reference:
    NrtKnnFloatVectorQuery), not len(hits) <= k * segments."""
    searcher, vectors, _ = vec_index
    q = vectors[7]
    td = searcher.knn_search("vec", q, k=5)
    assert len(td.hits) == 5
    assert td.total_hits == 200  # all docs have vectors
    filt = parse_query({"rangeQuery": {"field": "price", "upper": "50"}})
    td2 = searcher.knn_search("vec", q, k=5, filter_node=filt)
    assert td2.total_hits == 51  # prices 0..50 inclusive


def test_hybrid_search_over_grpc(tmp_path):
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
        client.create_index("hy")
        fields = [
            pb.Field(name="id", type=pb.FieldType._ID, store=True),
            pb.Field(name="text", type=pb.FieldType.TEXT, search=True),
            pb.Field(name="v", type=pb.FieldType.VECTOR, vectorDimensions=4,
                     vectorSimilarity="l2_norm"),
        ]
        client.register_fields(pb.FieldDefRequest(indexName="hy", field=fields))
        client.start_index(pb.StartIndexRequest(indexName="hy", mode=pb.Mode.STANDALONE))
        data = [
            ("0", "alpha tpu", [1, 0, 0, 0]),
            ("1", "beta tpu", [0, 1, 0, 0]),
            ("2", "gamma other", [0.9, 0.1, 0, 0]),
        ]
        reqs = []
        for i, t, v in data:
            r = pb.AddDocumentRequest(indexName="hy")
            r.fields["id"].value.append(i)
            r.fields["text"].value.append(t)
            r.fields["v"].value.append(str(list(map(float, v))))
            reqs.append(r)
        client.add_documents(reqs)
        client.refresh("hy")

        # knn-only
        sreq = pb.SearchRequest(indexName="hy", topHits=2, retrieveFields=["id"])
        knn = sreq.knn.add()
        knn.field = "v"
        knn.query_vector.extend([1.0, 0.0, 0.0, 0.0])
        knn.k = 2
        resp = client.search(sreq)
        ids = [h.fields["id"].fieldValue[0].textValue for h in resp.hits]
        assert ids == ["0", "2"]

        # hybrid: text match boosts doc 1 into results
        sreq2 = pb.SearchRequest(indexName="hy", topHits=3, retrieveFields=["id"])
        sreq2.query.matchQuery.field = "text"
        sreq2.query.matchQuery.query = "tpu"
        knn2 = sreq2.knn.add()
        knn2.field = "v"
        knn2.query_vector.extend([1.0, 0.0, 0.0, 0.0])
        knn2.k = 2
        resp2 = client.search(sreq2)
        ids2 = [h.fields["id"].fieldValue[0].textValue for h in resp2.hits]
        # doc 0: text score + knn 1.0; doc 2: knn ~0.98 only; doc 1: text only
        assert ids2[0] == "0"
        assert set(ids2) == {"0", "1", "2"}
    finally:
        client.close()
        srv.stop()


def test_ivf_recall():
    rng = np.random.default_rng(3)
    vectors = rng.normal(size=(2000, DIMS)).astype(np.float32)
    ivf = IVFIndex(vectors, n_clusters=32, similarity="l2_norm", seed=0)
    queries = rng.normal(size=(8, DIMS)).astype(np.float32)
    scores, ids = ivf.search(queries, k=10, nprobe=8)
    # recall@10 vs exact
    hits = 0
    for b in range(8):
        d2 = np.sum((vectors - queries[b]) ** 2, axis=1)
        exact = set(np.argsort(d2)[:10].tolist())
        hits += len(exact & set(ids[b].tolist()))
    recall = hits / 80
    assert recall >= 0.8, recall


def test_knn_filter_deletes_multisegment_matrix(tmp_path):
    """kNN x (no filter | range filter | term filter) x deletes over a
    3-segment index, validated against a numpy oracle on the same vectors
    (reference: KnnQueryTest filtered/deleted cases; FANOUT pre-filter)."""
    import numpy as np
    from google.protobuf.json_format import ParseDict

    from nrtsearch_tpu.client import NrtsearchClient
    from nrtsearch_tpu.config import NrtsearchConfig
    from nrtsearch_tpu.gen import pb
    from nrtsearch_tpu.server.grpc_server import NrtsearchServer

    rng = np.random.default_rng(9)
    DIMS, N = 12, 90
    vecs = rng.normal(size=(N, DIMS)).astype(np.float32)
    prices = [(i * 13) % 97 for i in range(N)]
    colors = ["red", "blue", "green"]

    srv = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": str(tmp_path / "s"), "indexDir": str(tmp_path / "i")}
    ))
    port = srv.start(0)
    c = NrtsearchClient(f"localhost:{port}")
    c.create_index("kx")
    c.register_fields(ParseDict({"indexName": "kx", "field": [
        {"name": "id", "type": "_ID", "store": True},
        {"name": "vec", "type": "VECTOR", "vectorDimensions": DIMS,
         "vectorSimilarity": "l2_norm"},
        {"name": "price", "type": "INT", "storeDocValues": True},
        {"name": "color", "type": "ATOM", "storeDocValues": True,
         "search": True},
    ]}, pb.FieldDefRequest()))
    c.start_index(pb.StartIndexRequest(indexName="kx", mode=pb.Mode.STANDALONE))
    for lo in (0, 30, 60):
        reqs = []
        for i in range(lo, lo + 30):
            r = pb.AddDocumentRequest(indexName="kx")
            r.fields["id"].value.append(str(i))
            r.fields["vec"].value.append(str([float(x) for x in vecs[i]]))
            r.fields["price"].value.append(str(prices[i]))
            r.fields["color"].value.append(colors[i % 3])
            reqs.append(r)
        c.add_documents(reqs)
        c.refresh("kx")
    deleted = {5, 35, 65, 17}
    for i in deleted:
        r = pb.AddDocumentRequest(indexName="kx")
        r.fields["id"].value.append(str(i))
        c.delete(r)
    c.refresh("kx")

    q = rng.normal(size=DIMS).astype(np.float32)

    def oracle(pred):
        elig = [i for i in range(N) if i not in deleted and pred(i)]
        d = ((vecs[elig] - q) ** 2).sum(axis=1)
        order = np.argsort(d, kind="stable")
        return [str(elig[j]) for j in order[:5]], len(elig)

    cases = {
        "nofilter": (None, lambda i: True),
        "range": ({"rangeQuery": {"field": "price", "upper": "50"}},
                  lambda i: prices[i] <= 50),
        "term": ({"termQuery": {"field": "color", "textValue": "red"}},
                 lambda i: colors[i % 3] == "red"),
    }
    for name, (fq, pred) in cases.items():
        req = ParseDict({"indexName": "kx", "topHits": 5,
                         "retrieveFields": ["id"]}, pb.SearchRequest())
        knn = req.knn.add()
        knn.field = "vec"
        knn.query_vector.extend([float(x) for x in q])
        knn.k = 5
        knn.num_candidates = 50
        if fq is not None:
            ParseDict(fq, knn.filter)
        resp = c.search(req)
        got = [h.fields["id"].fieldValue[0].textValue for h in resp.hits]
        want, n_elig = oracle(pred)
        assert got == want, (name, got, want)
        assert not (set(got) & {str(i) for i in deleted}), name
    c.close()
    srv.stop()
