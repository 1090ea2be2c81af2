"""Compiled query trees: one fused XLA program per query structure.

The eager evaluator (query/eval.py) dispatches every leaf and every mask
combination as its own device op and materializes a dense ``[D]`` scores +
match pair per clause — O(clauses) dispatches and O(clauses * D) HBM traffic
per segment. That is fine at 1M docs in tests and painful at Lucene scale
(the reference sustains deep boolean trees over 8.8M-doc MS MARCO shards,
QueryNodeMapper.java:171-204 breadth).

This module stages the SAME evaluation as one jitted program: the query tree
is compiled on the host into a ``CNode`` structure (hashable, static) plus a
flat list of device inputs (postings arrays, doc-value columns, boosts,
bounds). ``jax.jit`` keys its cache on (tree structure, input shapes), so a
serving workload's repeated query shapes reuse compiled programs while XLA
fuses the whole tree — mask algebra folds into the scoring scatters and the
final top-k, intermediates never round-trip to HBM, and a 50-clause tree
costs ONE dispatch instead of ~150.

Node kinds with host-side verification stages (phrase, span, nested
block-join, completion, cross-index joins) and exact-f64 / multi-valued
columns evaluate eagerly exactly as before and enter the program as
precomputed (scores, match) inputs, so coverage is total: any tree compiles,
with unsupported subtrees degrading to their round-1 behavior.

Reference contrast: Lucene compiles a query into Weight/Scorer objects that
pull postings doc-at-a-time per segment thread (MyIndexSearcher.java:79);
here the "scorer" is an XLA program scoring the whole segment term-at-a-time.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nrtsearch_tpu.analysis import get_analyzer
from nrtsearch_tpu.core.segment import pad_to_bucket
from nrtsearch_tpu.ops import bm25 as bm25_ops
from nrtsearch_tpu.ops import masks as mask_ops
from nrtsearch_tpu.query import eval as qeval
from nrtsearch_tpu.query import plan as qp
from nrtsearch_tpu.schema.fields import DocValueKind

NEG_INF = float("-inf")


@dataclass(frozen=True)
class CNode:
    """One prepared query node: static semantics + input slot indices.

    ``static`` holds everything that shapes the traced computation (operators,
    score modes, expression strings, postings-cap buckets); every numeric
    parameter (boosts, bounds, weights) is a runtime input so queries that
    differ only in constants share one compiled program.
    """

    kind: str
    static: tuple = ()
    slots: tuple = ()
    children: tuple = ()


class _Prep:
    """Accumulates the flat input list during tree preparation.

    Host-side constants stay NUMPY: jax.jit ships all arguments in the one
    execute call, whereas an eager ``jnp.asarray`` per constant is its own
    host->device transfer (tens of RPC round trips per query through a
    remote-device tunnel). Segment columns are already device-resident and
    pass through untouched."""

    def __init__(self, ctx: qeval.EvalContext):
        self.ctx = ctx
        self.inputs: list[Any] = []

    def slot(self, value) -> int:
        self.inputs.append(value)
        return len(self.inputs) - 1

    def f32(self, value) -> int:
        return self.slot(np.float32(value))

    def i32(self, value) -> int:
        return self.slot(np.int32(value))


# ---------------------------------------------------------------------------
# Preparation (host): query tree -> (CNode, inputs)
# ---------------------------------------------------------------------------


def _host_fallback(node: qp.QueryNode, prep: _Prep) -> CNode:
    """Evaluate a subtree eagerly (round-1 path, incl. the filter cache) and
    feed its (scores, match) arrays into the program as inputs."""
    scores, match = qeval.eval_node(node, prep.ctx)
    return CNode("host", slots=(prep.slot(scores), prep.slot(match)))


def _none() -> CNode:
    return CNode("none")


def _prep_text(
    prep: _Prep,
    field: str,
    terms: list[str],
    term_boosts: list[float],
    operator: str,
    msm: int,
    boost: float,
    scored: bool = True,
) -> CNode:
    """Scored/constant multi-term clause — the traced twin of
    qeval._text_clause (same ops, same order, bit-identical outputs)."""
    ctx = prep.ctx
    seg = ctx.segment
    tfi = seg.fields.get(field)
    if not terms or tfi is None:
        return _none()
    fd = ctx.field_defs.get(field)
    k1 = fd.sim_k1 if fd is not None else ctx.k1
    b = fd.sim_b if fd is not None else ctx.b
    n = len(terms)
    q_pad = _pow2(max(n, 1))
    offs = np.zeros(q_pad, np.int32)
    lens = np.zeros(q_pad, np.int32)
    weights = np.zeros(q_pad, np.float32)
    dc = ctx.stats.doc_count(field)
    for i, (term, tb) in enumerate(zip(terms, term_boosts)):
        off, ln = tfi.lookup(term)
        df = ctx.stats.doc_freq(field, term)
        offs[i], lens[i] = off, ln
        weights[i] = bm25_ops.lucene_idf(dc, df) * tb * boost if df else 0.0
    cap = pad_to_bucket(max(int(lens.sum()), 1))
    need = n if operator == "MUST" else max(1, msm)
    # SHOULD / single-required-term with positive boosts: presence == score>0,
    # the counts scatter is elided (scored=False keeps it: constant clauses
    # may carry zero weights)
    need_counts = not (scored and need <= 1
                       and all(b_ > 0 for b_ in term_boosts) and boost > 0)
    return CNode(
        "text",
        static=(cap, scored, need_counts),
        slots=(
            prep.slot(tfi.doc_ids),
            prep.slot(tfi.freqs),
            prep.slot(tfi.doc_lens),
            prep.slot(offs[None, :]),
            prep.slot(lens[None, :]),
            prep.slot(weights[None, :]),
            prep.f32(k1),
            prep.f32(b),
            prep.f32(ctx.stats.avgdl(field)),
            prep.i32(need),
            prep.f32(boost),
        ),
    )


def _col_dtype(dv) -> np.dtype:
    try:
        return np.dtype(dv.values.dtype.name)
    except TypeError:
        return np.dtype(np.float32)


def _dv_compilable(dv) -> bool:
    """f64 columns keep the eager exact path (enable_x64 contexts don't mix
    with a f32 trace); multi-valued columns verify on host CSR arrays."""
    return dv.mv_offsets is None and dv.values.dtype != jnp.float64


def prepare(node: qp.QueryNode, prep: _Prep) -> CNode:
    ctx = prep.ctx
    seg = ctx.segment
    if isinstance(node, qp.MatchAllNode):
        return CNode(
            "match_all", slots=(prep.f32(node.boost), prep.i32(seg.num_docs))
        )
    if isinstance(node, qp.TermQueryNode):
        fd = ctx.field_defs.get(node.field)
        if fd is None:
            raise KeyError(f"unknown field: {node.field!r}")
        text = fd.normalize_value(node.text) if node.text is not None else None
        if text is not None and fd.is_text and fd.search:
            return _prep_text(
                prep, node.field, [text], [1.0], "MUST", 0, node.boost
            )
        dv = seg.doc_values.get(node.field)
        if dv is None:
            return _none()
        if not _dv_compilable(dv):
            return _host_fallback(node, prep)
        if text is not None and dv.kind == DocValueKind.ORDINAL:
            # ordinal compare stays in the column's (integer) dtype, exactly
            # like the eager _ordinal_match
            ordv = (dv.ord_index or {}).get(text, -2)
            targets = np.asarray([ordv], _col_dtype(dv))
            return CNode(
                "in_set",
                slots=(
                    prep.slot(dv.values),
                    prep.slot(dv.present),
                    prep.slot(targets),
                    prep.f32(node.boost),
                ),
            )
        if node.bool_value is not None:
            target = 1.0 if node.bool_value else 0.0
        elif node.long_value is not None:
            target = float(node.long_value)
        elif node.double_value is not None:
            target = float(node.double_value)
        else:
            return _none()
        return CNode(
            "eq",
            slots=(
                prep.slot(dv.values),
                prep.slot(dv.present),
                prep.f32(target),
                prep.f32(node.boost),
            ),
        )
    if isinstance(node, qp.TermInSetNode):
        fd = ctx.field_defs.get(node.field)
        if fd is None:
            raise KeyError(f"unknown field: {node.field!r}")
        texts = [fd.normalize_value(t) for t in node.texts]
        if texts and fd.is_text and fd.search:
            return _prep_text(
                prep, node.field, texts, [0.0] * len(texts),
                "SHOULD", 0, node.boost, scored=False,
            )
        dv = seg.doc_values.get(node.field)
        if dv is None:
            return _none()
        if not _dv_compilable(dv):
            return _host_fallback(node, prep)
        if texts and dv.kind == DocValueKind.ORDINAL:
            targets = np.asarray(
                [(dv.ord_index or {}).get(t, -2) for t in texts],
                _col_dtype(dv),
            )
        else:
            targets = np.asarray(
                node.long_values or node.double_values, np.float32
            )
        if targets.size == 0:
            return _none()
        t_pad = _pow2(len(targets))
        targets = np.concatenate(
            [targets, np.full(t_pad - len(targets), targets[0], targets.dtype)]
        )
        return CNode(
            "in_set",
            slots=(
                prep.slot(dv.values),
                prep.slot(dv.present),
                prep.slot(targets),
                prep.f32(node.boost),
            ),
        )
    if isinstance(node, qp.MatchQueryNode):
        fd = ctx.field_defs.get(node.field)
        if fd is None:
            raise KeyError(f"unknown field: {node.field!r}")
        analyzer = get_analyzer(node.analyzer) if node.analyzer else None
        terms = analyzer.terms(node.query) if analyzer else fd.query_terms(node.query)
        if node.fuzzy_max_edits > 0:
            tfi = seg.fields.get(node.field)
            if tfi is not None:
                expanded = []
                for t in terms:
                    expanded.extend(
                        qeval._fuzzy_expand(
                            tfi, t, node.fuzzy_max_edits,
                            node.fuzzy_prefix_length, node.fuzzy_max_expansions,
                        )
                    )
                terms = list(dict.fromkeys(expanded))
        return _prep_text(
            prep, node.field, terms, [1.0] * len(terms), node.operator,
            node.minimum_number_should_match, node.boost,
        )
    if isinstance(node, qp.MultiMatchQueryNode):
        return _prep_multi_match(node, prep)
    if isinstance(node, qp.BooleanQueryNode):
        occurs = tuple(c.occur.value for c in node.clauses)
        children = tuple(prepare(c.node, prep) for c in node.clauses)
        return CNode(
            "bool",
            static=(occurs, node.minimum_number_should_match),
            slots=(prep.f32(node.boost), prep.i32(seg.num_docs)),
            children=children,
        )
    if isinstance(node, qp.RangeQueryNode):
        dv = seg.doc_values.get(node.field)
        if dv is None:
            return _none()
        if not _dv_compilable(dv):
            return _host_fallback(node, prep)
        lower = node.lower if node.lower is not None else -np.inf
        upper = node.upper if node.upper is not None else np.inf
        return CNode(
            "range",
            slots=(
                prep.slot(dv.values),
                prep.slot(dv.present),
                prep.f32(lower),
                prep.f32(upper),
                prep.slot(np.bool_(not node.lower_exclusive)),
                prep.slot(np.bool_(not node.upper_exclusive)),
                prep.f32(node.boost),
            ),
        )
    if isinstance(node, qp.ExistsQueryNode):
        if node.field in seg.doc_values:
            arr = seg.doc_values[node.field].present
        elif node.field in seg.fields:
            return CNode(
                "exists_lens",
                slots=(
                    prep.slot(seg.fields[node.field].doc_lens),
                    prep.i32(seg.num_docs),
                    prep.f32(node.boost),
                ),
            )
        elif node.field in seg.vectors:
            arr = seg.vectors[node.field].present
        else:
            return _none()
        return CNode(
            "exists",
            slots=(prep.slot(arr), prep.i32(seg.num_docs), prep.f32(node.boost)),
        )
    if isinstance(node, qp.PrefixQueryNode):
        tfi = seg.fields.get(node.field)
        if tfi is None:
            return _none()
        fd = prep.ctx.field_defs.get(node.field)
        if fd is not None and fd.index_prefixes is not None:
            lo, hi = fd.index_prefixes
            companion = f"{node.field}._index_prefix"
            if lo <= len(node.prefix) <= hi and companion in seg.fields:
                # materialized prefix (PrefixFieldDef): single-term lookup
                return _prep_text(
                    prep, companion, [node.prefix], [0.0], "SHOULD", 0,
                    node.boost, scored=False,
                )
        expanded = tfi.terms_with_prefix(node.prefix, node.max_expansions)
        return _prep_text(
            prep, node.field, expanded, [0.0] * len(expanded), "SHOULD", 0,
            node.boost, scored=False,
        )
    if isinstance(node, qp.FuzzyQueryNode):
        tfi = seg.fields.get(node.field)
        if tfi is None or not node.text:
            return _none()
        expanded = qeval._fuzzy_expand(
            tfi, node.text, node.max_edits, node.prefix_length,
            node.max_expansions,
        )
        return _prep_text(
            prep, node.field, expanded, [0.0] * len(expanded), "SHOULD", 0,
            node.boost, scored=False,
        )
    if isinstance(node, qp.WildcardQueryNode):
        import fnmatch
        import re as _re

        tfi = seg.fields.get(node.field)
        if tfi is None:
            return _none()
        lit = _re.split(r"[*?\[]", node.pattern, 1)[0]
        cands = tfi.terms_with_prefix(lit, len(tfi.terms)) if lit else tfi.terms
        expanded = [
            t for t in cands if fnmatch.fnmatchcase(t, node.pattern)
        ][: node.max_expansions]
        return _prep_text(
            prep, node.field, expanded, [0.0] * len(expanded), "SHOULD", 0,
            node.boost, scored=False,
        )
    if isinstance(node, qp.ConstantScoreNode):
        child = prepare(node.filter or qp.MatchAllNode(), prep)
        return CNode(
            "const_score", slots=(prep.f32(node.boost),), children=(child,)
        )
    if isinstance(node, qp.DisjunctionMaxNode):
        if not node.disjuncts:
            return _none()
        children = tuple(prepare(d, prep) for d in node.disjuncts)
        return CNode(
            "dismax",
            slots=(prep.f32(node.tie_breaker), prep.f32(node.boost)),
            children=children,
        )
    if isinstance(node, qp.MinScoreNode):
        child = prepare(node.query or qp.MatchAllNode(), prep)
        return CNode(
            "min_score",
            slots=(prep.f32(node.min_score), prep.f32(node.boost)),
            children=(child,),
        )
    if isinstance(node, qp.FunctionScoreNode):
        child = prepare(node.query or qp.MatchAllNode(), prep)
        names, col_slots = _prep_script_columns(node.expression, prep)
        return CNode(
            "func_score",
            static=(node.expression, names),
            slots=(prep.f32(node.boost),) + col_slots,
            children=(child,),
        )
    if isinstance(node, qp.FunctionFilterNode):
        names, col_slots = _prep_script_columns(node.expression, prep)
        return CNode(
            "func_filter",
            static=(node.expression, names),
            slots=(prep.f32(node.boost), prep.slot(seg.live)) + col_slots,
        )
    if isinstance(node, qp.MultiFunctionScoreNode):
        return _prep_multi_function(node, prep)
    if isinstance(node, qp.GeoBoundingBoxNode):
        dv = seg.doc_values.get(node.field)
        if dv is None or dv.kind != DocValueKind.LAT_LON:
            return _none()
        return CNode(
            "geo_bbox",
            static=(node.min_lon <= node.max_lon,),
            slots=(
                prep.slot(dv.values),
                prep.slot(dv.present),
                prep.f32(node.min_lat),
                prep.f32(node.max_lat),
                prep.f32(node.min_lon),
                prep.f32(node.max_lon),
                prep.f32(node.boost),
            ),
        )
    if isinstance(node, qp.GeoRadiusNode):
        dv = seg.doc_values.get(node.field)
        if dv is None or dv.kind != DocValueKind.LAT_LON:
            return _none()
        return CNode(
            "geo_radius",
            slots=(
                prep.slot(dv.values),
                prep.slot(dv.present),
                prep.f32(node.lat),
                prep.f32(node.lon),
                prep.f32(node.radius_meters),
                prep.f32(node.boost),
            ),
        )
    if isinstance(node, qp.GeoPolygonNode):
        dv = seg.doc_values.get(node.field)
        if dv is None or dv.kind != DocValueKind.LAT_LON:
            return _none()
        ring_slots = []
        for poly in node.polygons:
            if len(poly.points) < 3:
                continue
            segs = []
            for ring in (poly.points, *poly.holes):
                pts = list(ring)
                if pts[0] != pts[-1]:
                    pts.append(pts[0])
                segs.append(np.asarray(pts, np.float32))
                segs.append(np.full((1, 2), np.nan, np.float32))
            ring_slots.append(prep.slot(np.concatenate(segs, axis=0)))
        if not ring_slots:
            return _none()
        return CNode(
            "geo_rings",
            slots=(
                prep.slot(dv.values),
                prep.slot(dv.present),
                prep.f32(node.boost),
            ) + tuple(ring_slots),
        )
    if isinstance(node, qp.PolygonContainsNode):
        dv = seg.doc_values.get(node.field)
        if dv is None or dv.kind != DocValueKind.POLYGON:
            raise ValueError(
                f"{node.field} should be a POLYGON field for geoPointQuery"
            )
        return CNode(
            "poly_contains",
            slots=(
                prep.slot(dv.values),
                prep.slot(dv.present),
                prep.f32(node.lat),
                prep.f32(node.lon),
                prep.f32(node.boost),
            ),
        )
    if isinstance(node, qp.ExactVectorQueryNode):
        vc = seg.vectors.get(node.field)
        fd = ctx.field_defs.get(node.field)
        if vc is None or fd is None:
            raise ValueError(f"{node.field} is not a VECTOR field")
        dims = int(np.asarray(vc.values).shape[1])
        if len(node.query_vector) != dims:
            raise ValueError(
                f"query vector dimension {len(node.query_vector)} != field dims {dims}"
            )
        q = np.asarray(node.query_vector, np.float32)[None, :]
        return CNode(
            "exact_vector",
            static=(fd.similarity or "l2_norm",),
            slots=(
                prep.slot(q),
                prep.slot(vc.device_float()),
                prep.slot((vc.host_norms**2).astype(np.float32)),
                prep.slot(vc.present),
                prep.slot(seg.live),
                prep.f32(node.boost),
            ),
        )
    # host-verified / host-resident node kinds keep the eager path:
    # phrase, span, nested block-join, completion, resolved joins, fuzzy
    # scoring refinements — anything with data-dependent host loops.
    return _host_fallback(node, prep)


def _prep_script_columns(expression: str, prep: _Prep):
    """Record which doc-value columns an expression touches, slot them."""
    from nrtsearch_tpu.script.expr import compile_expression

    seg = prep.ctx.segment
    fn = compile_expression(expression)
    accessed: list[str] = []

    class _Recorder:
        def __getitem__(self, name: str):
            if name not in accessed:
                accessed.append(name)
            dv = seg.doc_values[name]  # KeyError -> same as eager
            return np.zeros(1, np.float32)

        def __contains__(self, name: str) -> bool:
            return name in seg.doc_values

    fn(_Recorder(), np.zeros(1, np.float32))
    col_slots = []
    for name in accessed:
        dv = seg.doc_values[name]
        col_slots.append(prep.slot(dv.values))
        col_slots.append(prep.slot(dv.present))
    return tuple(accessed), tuple(col_slots)


def _prep_multi_match(node: qp.MultiMatchQueryNode, prep: _Prep) -> CNode:
    ctx = prep.ctx
    boosts = node.field_boosts or (1.0,) * len(node.fields)
    if node.match_type == "PHRASE_PREFIX":
        return _host_fallback(node, prep)
    if node.match_type == "CROSS_FIELDS":
        fd0 = ctx.field_defs.get(node.fields[0])
        if fd0 is None:
            raise KeyError(f"unknown field: {node.fields[0]!r}")
        terms = fd0.query_terms(node.query)
        if not terms:
            return _none()
        children = []
        for t in terms:
            for f, fb in zip(node.fields, boosts):
                children.append(
                    _prep_text(prep, f, [t], [fb], "SHOULD", 0, 1.0)
                )
        need = len(terms) if node.operator == "MUST" else max(
            node.minimum_number_should_match, 1
        )
        return CNode(
            "cross_fields",
            static=(len(terms), len(node.fields)),
            slots=(prep.i32(need), prep.f32(node.boost)),
            children=tuple(children),
        )
    # BEST_FIELDS
    children = []
    for f, fb in zip(node.fields, boosts):
        fd = ctx.field_defs.get(f)
        if fd is None:
            raise KeyError(f"unknown field: {f!r}")
        terms = fd.query_terms(node.query)
        children.append(
            _prep_text(
                prep, f, terms, [fb] * len(terms), node.operator,
                node.minimum_number_should_match, 1.0,
            )
        )
    return CNode(
        "best_fields",
        slots=(prep.f32(node.tie_breaker), prep.f32(node.boost)),
        children=tuple(children),
    )


def _prep_multi_function(node: qp.MultiFunctionScoreNode, prep: _Prep) -> CNode:
    import math

    ctx = prep.ctx
    seg = ctx.segment
    inner = prepare(node.query or qp.MatchAllNode(), prep)
    children = [inner]
    fn_statics = []
    fn_slots = []
    for spec in node.functions:
        if spec.filter is not None:
            children.append(prepare(spec.filter, prep))
            gated = True
        else:
            gated = False
        weight_slot = prep.f32(spec.weight)
        if spec.decay is not None:
            d = spec.decay
            if not (0.0 < d.decay < 1.0):
                raise ValueError(
                    f"decay rate should be between (0, 1) but is {d.decay}"
                )
            dv = seg.doc_values.get(d.field)
            if dv is None or dv.kind != DocValueKind.LAT_LON:
                raise ValueError(
                    f"{d.field} should be a LAT_LON field to apply geoPoint decay"
                )
            kind = d.decay_type.replace("DECAY_TYPE_", "")
            if kind == "LINEAR":
                scale = d.scale / (1.0 - d.decay)
            elif kind == "GUASSIAN":
                scale = -(d.scale**2) / (2.0 * math.log(d.decay))
            elif kind == "EXPONENTIAL":
                scale = math.log(d.decay) / d.scale
            else:
                raise ValueError(f"unsupported decay type: {d.decay_type}")
            fn_statics.append(("decay", kind, gated))
            fn_slots.append(
                (
                    weight_slot,
                    prep.slot(dv.values),
                    prep.slot(dv.present),
                    prep.f32(d.origin[0]),
                    prep.f32(d.origin[1]),
                    prep.f32(d.offset),
                    prep.f32(scale),
                )
            )
        elif spec.script is not None:
            names, col_slots = _prep_script_columns(spec.script, prep)
            fn_statics.append(("script", spec.script, names, gated))
            fn_slots.append((weight_slot,) + col_slots)
        else:
            fn_statics.append(("weight", gated))
            fn_slots.append((weight_slot,))
    return CNode(
        "multi_func",
        static=(
            node.score_mode,
            node.boost_mode,
            node.min_excluded,
            tuple(fn_statics),
            node.min_score > 0.0 or node.min_excluded,  # apply min-score?
        ),
        slots=(
            prep.f32(node.boost),
            prep.f32(node.min_score),
            tuple(tuple(s) for s in fn_slots),
        ),
        children=tuple(children),
    )


# ---------------------------------------------------------------------------
# Traced runner: CNode -> (scores [D], match [D])
# ---------------------------------------------------------------------------


def _run(c: CNode, inp: tuple, D: int):
    if c.kind == "none":
        return jnp.zeros(D, jnp.float32), jnp.zeros(D, bool)
    if c.kind == "host":
        return inp[c.slots[0]], inp[c.slots[1]]
    if c.kind == "match_all":
        boost, num_docs = inp[c.slots[0]], inp[c.slots[1]]
        match = jnp.arange(D) < num_docs
        return jnp.full(D, jnp.float32(1.0)) * boost, match
    if c.kind == "text":
        cap, scored, need_counts = c.static
        s = c.slots
        scores, counts = bm25_ops.score_text_clause_impl(
            inp[s[0]], inp[s[1]], inp[s[2]], inp[s[3]], inp[s[4]], inp[s[5]],
            inp[s[6]], inp[s[7]], inp[s[8]], cap=cap, num_docs=D,
            need_counts=need_counts,
        )
        scores, counts = scores[0], counts[0]
        match = counts >= inp[s[9]]
        if scored:
            return jnp.where(match, scores, 0.0), match
        return jnp.where(match, inp[s[10]], 0.0), match
    if c.kind == "eq":
        values, present, target, boost = (inp[i] for i in c.slots)
        match = mask_ops.eq_mask(values, present, target)
        return jnp.where(match, boost, 0.0), match
    if c.kind == "in_set":
        values, present, targets, boost = (inp[i] for i in c.slots)
        match = mask_ops.in_set_mask(values, present, targets)
        return jnp.where(match, boost, 0.0), match
    if c.kind == "range":
        values, present, lo, hi, lo_inc, hi_inc, boost = (inp[i] for i in c.slots)
        match = mask_ops.range_mask(values, present, lo, hi, lo_inc, hi_inc)
        return jnp.where(match, boost, 0.0), match
    if c.kind == "exists":
        arr, num_docs, boost = (inp[i] for i in c.slots)
        match = arr & (jnp.arange(D) < num_docs)
        return jnp.where(match, boost, 0.0), match
    if c.kind == "exists_lens":
        doc_lens, num_docs, boost = (inp[i] for i in c.slots)
        match = (doc_lens > 0) & (jnp.arange(D) < num_docs)
        return jnp.where(match, boost, 0.0), match
    if c.kind == "bool":
        return _run_bool(c, inp, D)
    if c.kind == "const_score":
        _, match = _run(c.children[0], inp, D)
        boost = inp[c.slots[0]]
        return jnp.where(match, boost, 0.0), match
    if c.kind == "dismax":
        tie, boost = inp[c.slots[0]], inp[c.slots[1]]
        pairs = [_run(ch, inp, D) for ch in c.children]
        best = pairs[0][0]
        total = pairs[0][0]
        match = pairs[0][1]
        for s, m in pairs[1:]:
            best = jnp.maximum(best, s)
            total = total + s
            match = match | m
        scores = best + tie * (total - best)
        return jnp.where(match, scores * boost, 0.0), match
    if c.kind == "min_score":
        min_score, boost = inp[c.slots[0]], inp[c.slots[1]]
        scores, match = _run(c.children[0], inp, D)
        match = match & (scores >= min_score)
        return jnp.where(match, scores * boost, 0.0), match
    if c.kind == "func_score":
        expr, names = c.static
        boost = inp[c.slots[0]]
        scores, match = _run(c.children[0], inp, D)
        vals = _run_script(expr, names, c.slots[1:], inp, scores)
        return jnp.where(match, vals * boost, 0.0), match
    if c.kind == "func_filter":
        expr, names = c.static
        boost, live = inp[c.slots[0]], inp[c.slots[1]]
        vals = _run_script(
            expr, names, c.slots[2:], inp, jnp.zeros(D, jnp.float32)
        )
        match = (vals > 0.0) & live
        return jnp.where(match, vals * boost, 0.0), match
    if c.kind == "multi_func":
        return _run_multi_func(c, inp, D)
    if c.kind == "geo_bbox":
        (no_dateline,) = c.static
        latlon, present, min_lat, max_lat, min_lon, max_lon, boost = (
            inp[i] for i in c.slots
        )
        lat, lon = latlon[:, 0], latlon[:, 1]
        ok = (lat >= min_lat) & (lat <= max_lat)
        if no_dateline:
            ok &= (lon >= min_lon) & (lon <= max_lon)
        else:
            ok &= (lon >= min_lon) | (lon <= max_lon)
        match = ok & present
        return jnp.where(match, boost, 0.0), match
    if c.kind == "geo_radius":
        latlon, present, lat, lon, radius, boost = (inp[i] for i in c.slots)
        dist = mask_ops.haversine_meters(latlon, lat, lon)
        match = (dist <= radius) & present
        return jnp.where(match, boost, 0.0), match
    if c.kind == "geo_rings":
        latlon, present, boost = (inp[i] for i in c.slots[:3])
        match = None
        for ring_slot in c.slots[3:]:
            m = mask_ops.point_in_rings_mask(latlon, present, inp[ring_slot])
            match = m if match is None else (match | m)
        return jnp.where(match, boost, 0.0), match
    if c.kind == "poly_contains":
        verts, present, lat, lon, boost = (inp[i] for i in c.slots)
        match = mask_ops.doc_polygons_contain_point(verts, present, lat, lon)
        return jnp.where(match, boost, 0.0), match
    if c.kind == "exact_vector":
        from nrtsearch_tpu.ops.knn import _scores as knn_scores

        (similarity,) = c.static
        q, vals, sq, present, live, boost = (inp[i] for i in c.slots)
        scores = knn_scores(q, vals, sq, similarity)[0]
        match = present & live
        return jnp.where(match, scores * boost, 0.0), match
    if c.kind == "cross_fields":
        n_terms, n_fields = c.static
        need, boost = inp[c.slots[0]], inp[c.slots[1]]
        term_score = None
        matched_n = None
        for ti in range(n_terms):
            best = None
            any_m = None
            for fi in range(n_fields):
                s, m = _run(c.children[ti * n_fields + fi], inp, D)
                best = s if best is None else jnp.maximum(best, s)
                any_m = m if any_m is None else (any_m | m)
            term_score = best if term_score is None else term_score + best
            mi = any_m.astype(jnp.int32)
            matched_n = mi if matched_n is None else matched_n + mi
        match = matched_n >= need
        return jnp.where(match, term_score * boost, 0.0), match
    if c.kind == "best_fields":
        tie, boost = inp[c.slots[0]], inp[c.slots[1]]
        per_field = [_run(ch, inp, D) for ch in c.children]
        total = sum(s for s, _ in per_field)
        best = per_field[0][0]
        for s, _ in per_field[1:]:
            best = jnp.maximum(best, s)
        scores = best + tie * (total - best)
        match = per_field[0][1]
        for _, m in per_field[1:]:
            match = match | m
        return jnp.where(match, scores * boost, 0.0), match
    raise AssertionError(f"unknown compiled node kind: {c.kind}")


def _run_bool(c: CNode, inp: tuple, D: int):
    occurs, msm = c.static
    boost, num_docs = inp[c.slots[0]], inp[c.slots[1]]
    musts, filters, shoulds, must_nots = [], [], [], []
    for occur, ch in zip(occurs, c.children):
        pair = _run(ch, inp, D)
        {
            "MUST": musts, "FILTER": filters,
            "SHOULD": shoulds, "MUST_NOT": must_nots,
        }[occur].append(pair)
    match = jnp.arange(D) < num_docs  # doc-range mask, as in eager
    for _, m in musts:
        match = match & m
    for _, m in filters:
        match = match & m
    if shoulds:
        should_count = shoulds[0][1].astype(jnp.int32)
        for _, m in shoulds[1:]:
            should_count = should_count + m.astype(jnp.int32)
        if not musts and not filters:
            match = match & (should_count >= max(1, msm))
        elif msm > 0:
            match = match & (should_count >= msm)
    for _, m in must_nots:
        match = match & ~m
    scores = jnp.zeros(D, jnp.float32)
    for s, m in musts + shoulds:
        scores = scores + jnp.where(m, s, 0.0)
    scores = scores * boost
    return jnp.where(match, scores, 0.0), match


def _run_script(expr: str, names: tuple, col_slots: tuple, inp: tuple, score):
    from nrtsearch_tpu.script.expr import compile_expression

    cols = {}
    for i, name in enumerate(names):
        values = inp[col_slots[2 * i]]
        present = inp[col_slots[2 * i + 1]]
        cols[name] = jnp.where(present, values.astype(jnp.float32), 0.0)

    class _Traced:
        def __getitem__(self, name: str):
            return cols[name]

        def __contains__(self, name: str) -> bool:
            return name in cols

    return compile_expression(expr)(_Traced(), score)


def _run_multi_func(c: CNode, inp: tuple, D: int):
    score_mode, boost_mode, min_excluded, fn_statics, apply_min = c.static
    boost = inp[c.slots[0]]
    min_score = inp[c.slots[1]]
    fn_slots = c.slots[2]
    inner_scores, match = _run(c.children[0], inp, D)
    inner_scores = inner_scores * boost
    scores = inner_scores
    if fn_statics:
        gates, vals = [], []
        child_i = 1
        for st, slots in zip(fn_statics, fn_slots):
            gated = st[-1]
            if gated:
                _, gate = _run(c.children[child_i], inp, D)
                child_i += 1
            else:
                gate = jnp.ones_like(match)
            weight = inp[slots[0]]
            if st[0] == "decay":
                kind = st[1]
                latlon, present = inp[slots[1]], inp[slots[2]]
                olat, olon, offset, scale = (inp[i] for i in slots[3:7])
                dist = mask_ops.haversine_meters(latlon, olat, olon)
                delta = jnp.maximum(dist - offset, 0.0)
                if kind == "LINEAR":
                    v = jnp.maximum((scale - delta) / scale, 0.0)
                elif kind == "GUASSIAN":
                    v = jnp.exp(-(delta**2) / (2.0 * scale))
                else:  # EXPONENTIAL
                    v = jnp.exp(scale * delta)
                v = jnp.where(present, v.astype(jnp.float32), 0.0)
            elif st[0] == "script":
                v = _run_script(st[1], st[2], slots[1:], inp, inner_scores)
            else:  # weight-only
                v = jnp.ones_like(inner_scores)
            vals.append(v * weight)
            gates.append(gate)
        if score_mode == "SCORE_MODE_SUM":
            total = functools.reduce(
                jnp.add, (jnp.where(g, v, 0.0) for g, v in zip(gates, vals))
            )
            any_gate = functools.reduce(jnp.logical_or, gates)
            fscore = jnp.where(any_gate, total, 1.0)
        elif score_mode == "SCORE_MODE_MULTIPLY":
            fscore = jnp.ones_like(inner_scores)
            for g, v in zip(gates, vals):
                fscore = fscore * jnp.where(g, v, 1.0)
        else:
            raise ValueError(f"unknown score mode: {score_mode}")
        if boost_mode == "BOOST_MODE_SUM":
            scores = inner_scores + fscore
        elif boost_mode == "BOOST_MODE_REPLACE":
            scores = fscore
        elif boost_mode == "BOOST_MODE_MULTIPLY":
            scores = inner_scores * fscore
        else:
            raise ValueError(f"unknown boost mode: {boost_mode}")
    scores = jnp.where(match, scores, 0.0)
    if apply_min:
        passed = (
            scores > min_score if min_excluded else scores >= min_score
        )
        match = match & passed
        scores = jnp.where(match, scores, 0.0)
    return scores, match


# ---------------------------------------------------------------------------
# Fused execution: tree (+ extra filter) + live mask + top-k in one dispatch
# ---------------------------------------------------------------------------


def _topk_1d(masked, k: int):
    """Exact top-k over one [D] masked array via the hierarchical row-max
    formulation (ops/merge_scoring._hierarchical_topk) — lax.top_k runs far
    off bandwidth at Lucene-scale D."""
    from nrtsearch_tpu.ops.merge_scoring import _hierarchical_topk

    s2, i2 = _hierarchical_topk(masked[None, :], k)
    return s2[0], i2[0]


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _exec(tree: CNode, extra: Optional[CNode], mode: tuple, inputs: tuple):
    live_root = inputs[0]
    D = live_root.shape[0]
    scores, match = _run(tree, inputs, D)
    if extra is not None:
        _, em = _run(extra, inputs, D)
        match = match & em
    match = match & live_root
    if mode[0] == "match":
        return match
    if mode[0] == "arrays":
        return scores, match
    if mode[0] in ("topk", "topk_b"):
        k = mode[1]
        if mode[0] == "topk_b":
            # within-segment terminateAfter: collect only the first ``budget``
            # matches in docid order (reference TerminateAfterWrapper stops
            # mid-collection; the fused analogue is a cumsum-limited mask).
            # Counting continues to recall_cap (terminateAfterMaxRecallCount:
            # "max documents to count beyond terminateAfter"). Both are
            # traced scalars: one program serves every budget.
            budget, recall_cap = inputs[-2], inputs[-1]
            full = jnp.sum(match, dtype=jnp.int32)
            match = match & (jnp.cumsum(match.astype(jnp.int32)) <= budget)
            masked = jnp.where(match, scores, NEG_INF)
            top_s, top_i = _topk_1d(masked, k)
            return top_s, top_i, jnp.minimum(full, recall_cap)
        masked = jnp.where(match, scores, NEG_INF)
        top_s, top_i = _topk_1d(masked, k)
        total = jnp.sum(match, dtype=jnp.int32)
        return top_s, top_i, total
    if mode[0] in ("topk_key", "topk_key_b"):
        k, ascending = mode[1], mode[2]
        if mode[0] == "topk_key_b":
            keys, budget, recall_cap = inputs[-3], inputs[-2], inputs[-1]
            full = jnp.sum(match, dtype=jnp.int32)
            match = match & (jnp.cumsum(match.astype(jnp.int32)) <= budget)
            total = jnp.minimum(full, recall_cap)
        else:
            keys = inputs[-1]
            total = jnp.sum(match, dtype=jnp.int32)
        sortable = -keys if ascending else keys
        sortable = jnp.where(match, sortable, NEG_INF)
        top_keys, top_i = _topk_1d(sortable, k)
        real_keys = -top_keys if ascending else top_keys
        return real_keys, top_i, total
    if mode[0] == "arrays_topk":
        k = mode[1]
        masked = jnp.where(match, scores, NEG_INF)
        top_s, top_i = _topk_1d(masked, k)
        total = jnp.sum(match, dtype=jnp.int32)
        return scores, match, top_s, top_i, total
    raise AssertionError(f"unknown exec mode: {mode}")


class CompiledQuery:
    """One prepared (query, extra-filter, segment) triple, executable in any
    mode. Preparation is host-only (term-dict lookups, constant packing);
    execution is one fused program whose compilation is cached across
    identically-shaped queries by jax.jit."""

    def __init__(self, node, extra_filter, ctx: qeval.EvalContext, live_root):
        prep = _Prep(ctx)
        prep.slot(live_root)            # inputs[0]: live & nested-root mask
        self.tree = prepare(node, prep)
        self.extra = prepare(extra_filter, prep) if extra_filter is not None else None
        self.inputs = prep.inputs

    def top_k(self, k: int, budget: int = 0, recall_cap: int = 0):
        if budget:
            return _exec(
                self.tree, self.extra, ("topk_b", k),
                tuple(self.inputs)
                + (jnp.int32(budget), jnp.int32(max(recall_cap, budget))),
            )
        return _exec(self.tree, self.extra, ("topk", k), tuple(self.inputs))

    def top_k_by_key(self, keys, k: int, ascending: bool, budget: int = 0,
                     recall_cap: int = 0):
        if budget:
            return _exec(
                self.tree, self.extra, ("topk_key_b", k, ascending),
                tuple(self.inputs)
                + (keys, jnp.int32(budget), jnp.int32(max(recall_cap, budget))),
            )
        return _exec(
            self.tree, self.extra, ("topk_key", k, ascending),
            tuple(self.inputs) + (keys,),
        )

    def arrays(self):
        return _exec(self.tree, self.extra, ("arrays",), tuple(self.inputs))

    def arrays_top_k(self, k: int):
        return _exec(
            self.tree, self.extra, ("arrays_topk", k), tuple(self.inputs)
        )

    def match(self):
        return _exec(self.tree, self.extra, ("match",), tuple(self.inputs))


def live_root_mask(seg) -> jax.Array:
    """live AND nested-root mask, cached on the (immutable, frozen) segment."""
    cached = getattr(seg, "_live_root_cache", None)
    if cached is not None:
        return cached
    from nrtsearch_tpu.core.searcher import Searcher

    root = Searcher._root_mask(seg)
    mask = seg.live if root is True else (seg.live & root)
    object.__setattr__(seg, "_live_root_cache", mask)
    return mask


def _pow2(n: int, minimum: int = 1) -> int:
    b = minimum
    while b < n:
        b <<= 1
    return b
