"""Device phrase verification (ops/phrase.py) vs the host position loop.

The device kernel must agree with the host `_phrase_freq` for every
candidate doc — exact phrases, sloppy phrases, and prefix-expansion
phrases — across randomized corpora (reference semantics: Lucene
PhraseQuery / MultiPhrasePrefixQuery via QueryNodeMapper.java:171-204).
"""

import numpy as np
import pytest

from nrtsearch_tpu.core.searcher import Searcher
from nrtsearch_tpu.core.writer import IndexWriter
from nrtsearch_tpu.ops import phrase as phrase_ops
from nrtsearch_tpu.query import eval as qeval
from nrtsearch_tpu.query.plan import parse_query
from nrtsearch_tpu.schema.fields import create_field_def

FIELDS = {
    "id": create_field_def("id", {"type": "_ID", "store": True}),
    "t": create_field_def(
        "t", {"type": "TEXT", "search": True}
    ),
}

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


@pytest.fixture(scope="module")
def searcher():
    rng = np.random.default_rng(11)
    w = IndexWriter(FIELDS, merge_factor=100)
    docs = []
    for i in range(400):
        n_words = int(rng.integers(3, 30))
        words = [VOCAB[int(j)] for j in rng.integers(0, len(VOCAB), n_words)]
        docs.append({"id": str(i), "t": " ".join(words)})
    w.add_documents(docs)
    w.refresh()
    return Searcher(w.segments, FIELDS, version=1)


def _host_freqs(tfi, cand_ids, terms, req_offsets, slop):
    out = np.zeros(len(cand_ids), np.int32)
    for i, doc in enumerate(cand_ids):
        plists = [tfi.positions_of(t, int(doc)) for t in terms]
        out[i] = qeval._phrase_freq(plists, req_offsets, slop)
    return out


@pytest.mark.parametrize("slop", [0, 1, 3])
@pytest.mark.parametrize(
    "terms", [("alpha", "beta"), ("beta", "gamma", "alpha"), ("eps", "eps")]
)
def test_device_matches_host_freqs(searcher, terms, slop):
    seg = searcher.segments[0]
    tfi = seg.fields["t"]
    cand_ids = np.arange(seg.num_docs)
    req = list(range(len(terms)))
    res = phrase_ops.run_phrase(tfi, cand_ids, list(terms), req, slop)
    assert res is not None
    freqs_dev = np.asarray(res[0])[: len(cand_ids)]
    freqs_host = _host_freqs(tfi, cand_ids, terms, req, slop)
    np.testing.assert_array_equal(freqs_dev, freqs_host, err_msg=f"{terms} slop={slop}")


@pytest.mark.parametrize("slop", [0, 2])
def test_device_prefix_expansion_matches_host(searcher, slop):
    seg = searcher.segments[0]
    tfi = seg.fields["t"]
    cand_ids = np.arange(seg.num_docs)
    fixed = ["alpha"]
    expansions = [t for t in tfi.terms if t.startswith("e")]  # eps, eta
    assert len(expansions) >= 2
    res = phrase_ops.run_phrase(
        tfi, cand_ids, fixed, [0], slop, expansions=expansions, exp_req=1
    )
    assert res is not None
    freqs_dev = np.asarray(res[0])[: len(cand_ids)]
    # host: union of expansion positions as the final slot
    out = np.zeros(len(cand_ids), np.int32)
    for i, doc in enumerate(cand_ids):
        plists = [tfi.positions_of(t, int(doc)) for t in fixed]
        exp_lists = [tfi.positions_of(t, int(doc)) for t in expansions]
        exp_pos = np.unique(
            np.concatenate(exp_lists) if exp_lists else np.empty(0, np.int32)
        )
        out[i] = qeval._phrase_freq(plists + [exp_pos], [0, 1], slop)
    np.testing.assert_array_equal(freqs_dev, out)


def test_phrase_query_end_to_end_device_vs_host(searcher, monkeypatch):
    """Full query path: device phrase scoring equals the host loop."""
    for q in [
        {"phraseQuery": {"field": "t", "terms": ["alpha", "beta"]}},
        {"phraseQuery": {"field": "t", "terms": ["beta", "gamma"], "slop": 2}},
        {"matchPhrasePrefixQuery": {"field": "t", "query": "alpha be"}},
    ]:
        node = parse_query(q)
        monkeypatch.setenv("NRT_DEVICE_PHRASE", "1")
        dev = searcher.search(node, 20)
        monkeypatch.setenv("NRT_DEVICE_PHRASE", "0")
        host = searcher.search(node, 20)
        assert dev.total_hits == host.total_hits, q
        assert [h.global_ord for h in dev.hits] == [
            h.global_ord for h in host.hits
        ], q
        for hd, hh in zip(dev.hits, host.hits):
            assert hd.score == pytest.approx(hh.score, rel=2e-5)


def test_missing_term_and_empty_candidates(searcher):
    seg = searcher.segments[0]
    tfi = seg.fields["t"]
    res = phrase_ops.run_phrase(
        tfi, np.arange(10), ["alpha", "nosuchterm"], [0, 1], 0
    )
    assert res is not None
    assert np.asarray(res[0]).sum() == 0
    # empty candidate list short-circuits upstream; kernel handles len>=1
    res2 = phrase_ops.run_phrase(tfi, np.asarray([3]), ["alpha", "beta"], [0, 1], 0)
    assert res2 is not None
