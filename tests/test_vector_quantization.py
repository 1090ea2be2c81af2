"""int8/float16 vector storage formats (reference: VectorFieldDef.java:91-94
scalar-quantized formats): 4x/2x memory at near-exact recall."""

import numpy as np
import pytest

from nrtsearch_tpu.core.searcher import Searcher
from nrtsearch_tpu.core.writer import IndexWriter
from nrtsearch_tpu.schema.fields import create_field_def

DIMS = 16


def make_fields(fmt):
    return {
        "id": create_field_def("id", {"type": "_ID", "store": True}),
        "v": create_field_def("v", {
            "type": "VECTOR", "vectorDimensions": DIMS,
            "vectorSimilarity": "l2_norm",
            "vectorIndexingOptions": fmt,
        }),
    }


def build(fmt, n=300, seed=3):
    rng = np.random.default_rng(seed)
    fields = make_fields(fmt)
    w = IndexWriter(fields)
    vecs = rng.normal(0, 1, (n, DIMS)).astype(np.float32)
    w.add_documents([
        {"id": str(i), "v": vecs[i].tolist()} for i in range(n)
    ])
    w.refresh()
    return Searcher(w.segments, fields, version=1), vecs


@pytest.mark.parametrize("fmt", ["int8", "float16"])
def test_quantized_recall_matches_exact(fmt):
    s_q, vecs = build(fmt)
    s_f, _ = build("float32")
    rng = np.random.default_rng(9)
    q = vecs[17] + rng.normal(0, 0.05, DIMS).astype(np.float32)
    exact = s_f.knn_search("v", q, 10)
    quant = s_q.knn_search("v", q, 10)
    exact_ids = [h.global_ord for h in exact.hits]
    quant_ids = [h.global_ord for h in quant.hits]
    overlap = len(set(exact_ids) & set(quant_ids))
    assert overlap >= 9, (fmt, exact_ids, quant_ids)
    # scores close to the exact ones
    for hq, he in zip(quant.hits[:5], exact.hits[:5]):
        assert hq.score == pytest.approx(he.score, rel=0.05)


def test_int8_storage_is_int8():
    s, _ = build("int8")
    vc = s.segments[0].vectors["v"]
    assert vc.fmt == "int8"
    assert np.asarray(vc.values).dtype == np.int8
    assert vc.scale > 0


def test_quantized_roundtrip_through_directory(tmp_path):
    from nrtsearch_tpu.core.directory import load_segment, save_segment

    s, vecs = build("int8")
    seg = s.segments[0]
    save_segment(seg, tmp_path)
    seg2 = load_segment(seg.seg_id, tmp_path, seg.del_gen)
    vc2 = seg2.vectors["v"]
    assert vc2.fmt == "int8"
    assert np.asarray(vc2.values).dtype == np.int8
    # dequantized values match the originals to one quantization step,
    # except the few outliers clipped by the quantile scale
    clipped = np.clip(vecs[:10], -127 * vc2.scale, 127 * vc2.scale)
    np.testing.assert_allclose(vc2.host_float()[:10], clipped, atol=vc2.scale)


def test_quantized_fetch_and_exact_query():
    from nrtsearch_tpu.query.plan import parse_query

    s, vecs = build("int8")
    node = parse_query({"exactVectorQuery": {
        "field": "v", "queryFloatVector": vecs[5].tolist()}})
    td = s.search(node, 3)
    assert td.hits[0].global_ord == 5
