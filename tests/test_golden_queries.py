"""JSON-resource golden suites: one file per query feature family.

Mirrors the reference's test-resource shape (src/test/resources/search/*.json
driven by parameterized tests): each resource declares a schema, a document
set, and cases of {query JSON -> expected hit ids (+ total)}. Golden files
live in tests/resources/golden/."""

import json
from pathlib import Path

import pytest

from nrtsearch_tpu.core.searcher import Searcher, SortSpec
from nrtsearch_tpu.core.writer import IndexWriter
from nrtsearch_tpu.query.plan import parse_query
from nrtsearch_tpu.schema.fields import create_field_def

GOLDEN_DIR = Path(__file__).parent / "resources" / "golden"
SUITES = sorted(GOLDEN_DIR.glob("*.json"))


def _load(path: Path):
    spec = json.loads(path.read_text())
    fields = {
        name: create_field_def(name, fspec)
        for name, fspec in spec["fields"].items()
    }
    w = IndexWriter(fields, merge_factor=100)
    w.add_documents(spec["docs"])
    searcher = Searcher(w.refresh(), fields, version=1)
    ids = [d["doc_id"] for d in spec["docs"]]
    return searcher, ids, spec["cases"]


_CACHE: dict = {}


def _suite(path: Path):
    if path not in _CACHE:
        _CACHE[path] = _load(path)
    return _CACHE[path]


def _cases():
    out = []
    for path in SUITES:
        spec = json.loads(path.read_text())
        for i, case in enumerate(spec["cases"]):
            out.append(pytest.param(
                path, i, id=f"{path.stem}:{case.get('name', i)}"
            ))
    return out


@pytest.mark.parametrize("path,case_idx", _cases())
def test_golden(path, case_idx):
    searcher, ids, cases = _suite(path)
    case = cases[case_idx]
    q = parse_query(case["query"])
    sort = None
    if "sort" in case:
        sort = SortSpec(case["sort"]["field"], case["sort"].get("reverse", False))
    td = searcher.search(q, top_hits=case.get("topHits", 10), sort=sort)
    got_ids = [ids[h.global_ord] for h in td.hits]
    if case.get("ordered", True):
        assert got_ids == case["expectIds"], got_ids
    else:
        assert sorted(got_ids) == sorted(case["expectIds"]), got_ids
    if "expectTotal" in case:
        assert td.total_hits == case["expectTotal"]


def test_suites_present():
    assert len(SUITES) >= 6, [p.name for p in SUITES]
