"""Native tokenizer extension: parity with the Python analyzer + fallbacks."""

import pytest

from nrtsearch_tpu.native_ext import get as get_native


@pytest.fixture(scope="module")
def native():
    mod = get_native()
    if mod is None:
        pytest.skip("native extension unavailable (no toolchain)")
    return mod


def _python_reference(text, base=0):
    from nrtsearch_tpu.analysis import get_analyzer

    out = {}
    count = 0
    for tok in get_analyzer("standard").analyze(text):
        out.setdefault(tok.text, []).append(base + tok.position)
        count += 1
    return out, count


@pytest.mark.parametrize("text", [
    "The Quick Brown Fox jumps OVER the lazy dog",
    "numbers 123 mixed42tokens and CAPS",
    "punctuation, splits; tokens! (right)?",
    "under_score splits here",
    "",
    "   ",
    "a",
])
def test_parity_with_python_analyzer(native, text):
    res = native.std_term_positions(text, 0)
    assert res is not None
    terms, count = res
    ref_terms, ref_count = _python_reference(text)
    assert count == ref_count
    assert terms == ref_terms


def test_non_ascii_falls_back(native):
    assert native.std_term_positions("héllo wörld", 0) is None


def test_position_base(native):
    terms, count = native.std_term_positions("a b a", 100)
    assert terms == {"a": [100, 102], "b": [101]}
    assert count == 3


def test_indexing_uses_native_and_matches(tmp_path):
    """Same index content whether or not the native path is active."""
    from nrtsearch_tpu.core.searcher import Searcher
    from nrtsearch_tpu.core.writer import IndexWriter
    from nrtsearch_tpu.query.plan import parse_query
    from nrtsearch_tpu.schema.fields import create_field_def
    import nrtsearch_tpu.native_ext as ne

    fields = {
        "id": create_field_def("id", {"type": "_ID", "store": True}),
        "t": create_field_def("t", {"type": "TEXT", "search": True}),
    }
    docs = [
        {"id": "0", "t": "alpha beta gamma alpha"},
        {"id": "1", "t": "beta delta"},
        {"id": "2", "t": "non-ascii héllo text beta"},
    ]

    def build():
        w = IndexWriter(fields)
        w.add_documents(docs)
        return Searcher(w.refresh(), fields, version=1)

    s_native = build()
    # force pure-Python path
    saved_module, saved_tried = ne._module, ne._tried
    ne._module, ne._tried = None, True
    try:
        s_python = build()
    finally:
        ne._module, ne._tried = saved_module, saved_tried

    q = parse_query({"matchQuery": {"field": "t", "query": "beta"}})
    td_n = s_native.search(q, 10)
    td_p = s_python.search(q, 10)
    assert [h.global_ord for h in td_n.hits] == [h.global_ord for h in td_p.hits]
    for hn, hp in zip(td_n.hits, td_p.hits):
        assert hn.score == pytest.approx(hp.score, rel=1e-6)
    # phrase (positions) parity incl. the non-ascii fallback doc
    ph = parse_query({"phraseQuery": {"field": "t", "terms": ["alpha", "beta"]}})
    assert [h.global_ord for h in s_native.search(ph, 10).hits] == \
        [h.global_ord for h in s_python.search(ph, 10).hits]
    ph2 = parse_query({"phraseQuery": {"field": "t", "terms": ["text", "beta"]}})
    assert s_native.search(ph2, 10).total_hits == 1


def test_cpp_python_uax29_agreement():
    """Index-time (C++ fast path) and query-time (python) segmentation must
    agree EXACTLY or phrase positions break — property-tested over random
    ASCII including every mid character class."""
    import random
    import string

    from nrtsearch_tpu import native_ext
    from nrtsearch_tpu.analysis.analyzers import (
        lowercase_filter,
        standard_tokenizer,
    )

    nat = native_ext.get()
    if nat is None:
        import pytest
        pytest.skip("native extension unavailable")
    rng = random.Random(7)
    alphabet = string.ascii_letters + string.digits + "_'.,;:&-@! "
    for _ in range(2000):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        native, n = nat.std_term_positions(text)
        toks = lowercase_filter(standard_tokenizer(text))
        pyd = {}
        for i, t in enumerate(toks):
            pyd.setdefault(t.text, []).append(i)
        assert dict(native) == pyd and n == len(toks), repr(text)
