"""Per-segment query evaluation: plan node -> (scores, match) device arrays.

This is the Weight/Scorer layer. Where Lucene walks postings doc-at-a-time
per query (the reference's hot loop, SURVEY.md §3.3), evaluation here is
term-at-a-time over the whole segment: every leaf produces a dense
``scores [D] float32`` and ``match [D] bool`` pair, and boolean composition is
mask algebra that XLA fuses. Scores are already zeroed where a clause does not
match, so boolean summation is a plain masked add.

Leaves dispatch to ops/bm25.py (text scoring) and ops/masks.py (doc-value
filters). BM25 statistics (idf, avgdl) are index-wide, like Lucene's
collection statistics, and are computed on the host at plan time.
"""

from __future__ import annotations

import re
import functools
import math
from dataclasses import dataclass
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from nrtsearch_tpu.analysis import get_analyzer
from nrtsearch_tpu.core.segment import Segment, pad_to_bucket
from nrtsearch_tpu.ops import bm25 as bm25_ops
from nrtsearch_tpu.ops import masks as mask_ops
from nrtsearch_tpu.query import plan as qp
from nrtsearch_tpu.schema.fields import DocValueKind, FieldDef, FieldType

# Lucene BM25Similarity defaults
BM25_K1 = 1.2
BM25_B = 0.75


class CollectionStats:
    """Index-wide term/field statistics (Lucene CollectionStatistics).

    Computed across all segments of a searcher snapshot; deletions are NOT
    subtracted, matching Lucene's behavior.
    """

    def __init__(self, segments: Sequence[Segment]):
        self.segments = list(segments)
        self._field_doc_count: dict[str, int] = {}
        self._field_sum_len: dict[str, int] = {}
        for seg in segments:
            for name, tfi in seg.fields.items():
                self._field_doc_count[name] = self._field_doc_count.get(name, 0) + tfi.doc_count
                self._field_sum_len[name] = self._field_sum_len.get(name, 0) + tfi.sum_doc_lens

    def doc_count(self, field: str) -> int:
        return self._field_doc_count.get(field, 0)

    def avgdl(self, field: str) -> float:
        dc = self.doc_count(field)
        return (self._field_sum_len.get(field, 0) / dc) if dc else 1.0

    def doc_freq(self, field: str, term: str) -> int:
        return sum(
            seg.fields[field].doc_freq(term) for seg in self.segments if field in seg.fields
        )


@dataclass
class EvalContext:
    segment: Segment
    field_defs: dict[str, FieldDef]
    stats: CollectionStats
    k1: float = BM25_K1
    b: float = BM25_B


def eval_node(node: qp.QueryNode, ctx: EvalContext):
    """Evaluate a plan node against one segment -> (scores [D], match [D]).

    Filter-like nodes are cached per (segment, node) — segments are immutable
    so entries never go stale (query_cache.py)."""
    from nrtsearch_tpu.search.query_cache import DEFAULT_QUERY_CACHE as _qc

    if _qc.cacheable(node):
        cached = _qc.get(ctx.segment.seg_id, node)
        if cached is not None:
            return cached
        result = _eval_node_impl(node, ctx)
        _qc.put(ctx.segment.seg_id, node, result)
        return result
    return _eval_node_impl(node, ctx)


def _eval_node_impl(node: qp.QueryNode, ctx: EvalContext):
    D = ctx.segment.capacity
    if isinstance(node, qp.MatchAllNode):
        return (
            jnp.full(D, np.float32(node.boost)),
            _doc_range_mask(ctx),
        )
    if isinstance(node, qp.TermQueryNode):
        return _eval_term(node, ctx)
    if isinstance(node, qp.TermInSetNode):
        return _eval_term_in_set(node, ctx)
    if isinstance(node, qp.MatchQueryNode):
        fd = _field(ctx, node.field)
        analyzer = get_analyzer(node.analyzer) if node.analyzer else None
        terms = analyzer.terms(node.query) if analyzer else fd.query_terms(node.query)
        if node.fuzzy_max_edits > 0:
            tfi = ctx.segment.fields.get(node.field)
            if tfi is not None:
                expanded = []
                for t in terms:
                    expanded.extend(
                        _fuzzy_expand(
                            tfi, t, node.fuzzy_max_edits,
                            node.fuzzy_prefix_length, node.fuzzy_max_expansions,
                        )
                    )
                terms = list(dict.fromkeys(expanded))  # dedupe, keep order
        return _text_clause(
            ctx, node.field, terms, [1.0] * len(terms), node.operator,
            node.minimum_number_should_match, node.boost,
        )
    if isinstance(node, qp.MultiMatchQueryNode):
        return _eval_multi_match(node, ctx)
    if isinstance(node, qp.BooleanQueryNode):
        return _eval_boolean(node, ctx)
    if isinstance(node, qp.RangeQueryNode):
        return _eval_range(node, ctx)
    if isinstance(node, qp.ExistsQueryNode):
        return _eval_exists(node, ctx)
    if isinstance(node, qp.PrefixQueryNode):
        return _eval_prefix(node, ctx)
    if isinstance(node, qp.GeoBoundingBoxNode):
        return _eval_geo_bbox(node, ctx)
    if isinstance(node, qp.GeoRadiusNode):
        return _eval_geo_radius(node, ctx)
    if isinstance(node, (qp.PhraseQueryNode, qp.MatchPhraseQueryNode)):
        return _eval_phrase(node, ctx)
    if isinstance(node, qp.MatchPhrasePrefixQueryNode):
        return _eval_phrase_prefix_impl(
            ctx, node.field, node.query, node.slop, node.analyzer,
            node.max_expansions, node.boost,
        )
    if isinstance(node, qp.FunctionScoreNode):
        return _eval_function_score(node, ctx)
    if isinstance(node, qp.MultiFunctionScoreNode):
        return _eval_multi_function_score(node, ctx)
    if isinstance(node, qp.ConstantScoreNode):
        _, match = eval_node(node.filter or qp.MatchAllNode(), ctx)
        return _const_score(match, node.boost), match
    if isinstance(node, qp.DisjunctionMaxNode):
        return _eval_dismax(node, ctx)
    if isinstance(node, qp.MinScoreNode):
        scores, match = eval_node(node.query or qp.MatchAllNode(), ctx)
        match = match & (scores >= np.float32(node.min_score))
        return jnp.where(match, scores * np.float32(node.boost), 0.0), match
    if isinstance(node, qp.FunctionFilterNode):
        from nrtsearch_tpu.script.expr import compile_expression

        fn = compile_expression(node.expression)
        vals = fn(
            _ScriptDocValues(ctx.segment),
            jnp.zeros(ctx.segment.capacity, jnp.float32),
        )
        match = (vals > 0.0) & ctx.segment.live
        return jnp.where(match, vals * np.float32(node.boost), 0.0), match
    if isinstance(node, qp.ExactVectorQueryNode):
        return _eval_exact_vector(node, ctx)
    if isinstance(node, qp.SpanNearNode):
        return _eval_span_near(node, ctx)
    if isinstance(node, qp.ResolvedJoinNode):
        return _eval_resolved_join(node, ctx)
    if isinstance(node, qp.CrossIndexQueryNode):
        raise ValueError(
            "CrossIndexQuery requires server global state (unresolved node)"
        )
    if isinstance(node, qp.FuzzyQueryNode):
        return _eval_fuzzy(node, ctx)
    if isinstance(node, qp.WildcardQueryNode):
        return _eval_wildcard(node, ctx)
    if isinstance(node, qp.NestedQueryNode):
        return _eval_nested(node, ctx)
    if isinstance(node, qp.CompletionQueryNode):
        return _eval_completion(node, ctx)
    if isinstance(node, qp.GeoPolygonNode):
        return _eval_geo_polygon(node, ctx)
    if isinstance(node, qp.PolygonContainsNode):
        dv = ctx.segment.doc_values.get(node.field)
        if dv is None or dv.kind != DocValueKind.POLYGON:
            raise ValueError(
                f"{node.field} should be a POLYGON field for geoPointQuery"
            )
        match = mask_ops.doc_polygons_contain_point(
            dv.values, dv.present, node.lat, node.lon
        )
        return _const_score(match, node.boost), match
    raise NotImplementedError(f"query node not yet supported: {type(node).__name__}")


# ---------------------------------------------------------------------------
# Leaves
# ---------------------------------------------------------------------------


def _field(ctx: EvalContext, name: str) -> FieldDef:
    fd = ctx.field_defs.get(name)
    if fd is None:
        raise KeyError(f"unknown field: {name!r}")
    return fd


def _doc_range_mask(ctx: EvalContext):
    """True for real (non-padding) docs; deletions are applied by the caller."""
    D = ctx.segment.capacity
    return jnp.arange(D) < ctx.segment.num_docs


def _none(ctx: EvalContext):
    D = ctx.segment.capacity
    return jnp.zeros(D, jnp.float32), jnp.zeros(D, bool)


def _text_clause(
    ctx: EvalContext,
    field: str,
    terms: list[str],
    term_boosts: list[float],
    operator: str,
    msm: int,
    boost: float,
):
    """Scored multi-term clause over one field (match/term queries)."""
    seg = ctx.segment
    tfi = seg.fields.get(field)
    if not terms:
        return _none(ctx)
    if tfi is None:
        return _none(ctx)
    # per-field similarity parameters (SimilarityCreator equivalent)
    fd = ctx.field_defs.get(field)
    k1 = fd.sim_k1 if fd is not None else ctx.k1
    b = fd.sim_b if fd is not None else ctx.b
    offs = np.zeros(len(terms), np.int32)
    lens = np.zeros(len(terms), np.int32)
    weights = np.zeros(len(terms), np.float32)
    dc = ctx.stats.doc_count(field)
    for i, (term, tb) in enumerate(zip(terms, term_boosts)):
        off, ln = tfi.lookup(term)
        df = ctx.stats.doc_freq(field, term)
        offs[i], lens[i] = off, ln
        weights[i] = bm25_ops.lucene_idf(dc, df) * tb * boost if df else 0.0
    cap = pad_to_bucket(max(int(lens.sum()), 1))
    scores, counts = bm25_ops.score_text_clause(
        tfi.doc_ids,
        tfi.freqs,
        tfi.doc_lens,
        jnp.asarray(offs)[None, :],
        jnp.asarray(lens)[None, :],
        jnp.asarray(weights)[None, :],
        jnp.float32(k1),
        jnp.float32(b),
        jnp.float32(ctx.stats.avgdl(field)),
        cap=cap,
        num_docs=seg.capacity,
    )
    scores, counts = scores[0], counts[0]
    if operator == "MUST":
        match = counts == len(terms)
    else:
        match = counts >= max(1, msm)
    return jnp.where(match, scores, 0.0), match


def _eval_term(node: qp.TermQueryNode, ctx: EvalContext):
    fd = _field(ctx, node.field)
    text = fd.normalize_value(node.text) if node.text is not None else None
    if text is not None and fd.is_text and fd.search:
        return _text_clause(ctx, node.field, [text], [1.0], "MUST", 0, node.boost)
    dv = ctx.segment.doc_values.get(node.field)
    if dv is None:
        return _none(ctx)
    if node.bool_value is not None:
        target = 1 if node.bool_value else 0
    elif node.long_value is not None:
        target = node.long_value
    elif node.double_value is not None:
        target = node.double_value
    elif text is not None and dv.kind == DocValueKind.ORDINAL:
        ordv = (dv.ord_index or {}).get(text, -2)
        match = _ordinal_match(dv, np.asarray([ordv], np.int32))
        return _const_score(match, node.boost), match
    else:
        return _none(ctx)
    match = mask_ops.eq_mask(dv.values, dv.present, _dv_scalar(dv, target))
    match = _mv_any(dv, match, lambda arr: arr == target)
    return _const_score(match, node.boost), match


def _eval_term_in_set(node: qp.TermInSetNode, ctx: EvalContext):
    fd = _field(ctx, node.field)
    texts = [fd.normalize_value(t) for t in node.texts]
    if texts and fd.is_text and fd.search:
        # OR over postings of each term, constant score (Lucene TermInSetQuery)
        _, match = _text_clause(
            ctx, node.field, texts, [0.0] * len(texts), "SHOULD", 0, 0.0
        )
        return _const_score(match, node.boost), match
    dv = ctx.segment.doc_values.get(node.field)
    if dv is None:
        return _none(ctx)
    if texts and dv.kind == DocValueKind.ORDINAL:
        ords = np.asarray(
            [(dv.ord_index or {}).get(t, -2) for t in texts], np.int32
        )
        match = _ordinal_match(dv, ords)
        return _const_score(match, node.boost), match
    targets = np.asarray(
        node.long_values or node.double_values, dtype=_np_dtype_of(dv)
    )
    if targets.size == 0:
        return _none(ctx)
    match = mask_ops.in_set_mask(dv.values, dv.present, _dv_array(dv, targets))
    match = _mv_any(dv, match, lambda arr: np.isin(arr, targets))
    return _const_score(match, node.boost), match


def _eval_multi_match(node: qp.MultiMatchQueryNode, ctx: EvalContext):
    """Multi-field match (reference: query/QueryNodeMapper getMultiMatchQuery;
    MatchType semantics from search.proto MultiMatchQuery).

    BEST_FIELDS: dis-max over per-field match queries — best field's score
    plus tieBreakerMultiplier times the rest. PHRASE_PREFIX: dis-max over
    per-field MatchPhrasePrefix. CROSS_FIELDS: term-centric — every term is
    scored against its best field, then summed (MatchCrossFieldsQuery's
    blended-term behavior re-expressed per doc)."""
    boosts = node.field_boosts or (1.0,) * len(node.fields)
    if node.match_type == "CROSS_FIELDS":
        fd0 = _field(ctx, node.fields[0])
        terms = fd0.query_terms(node.query)
        if not terms:
            return _none(ctx)
        term_score = None
        term_match = []
        for t in terms:
            best = None
            any_m = None
            for f, fb in zip(node.fields, boosts):
                s, m = _text_clause(ctx, f, [t], [fb], "SHOULD", 0, 1.0)
                best = s if best is None else jnp.maximum(best, s)
                any_m = m if any_m is None else (any_m | m)
            term_score = best if term_score is None else term_score + best
            term_match.append(any_m)
        matched_n = sum(m.astype(jnp.int32) for m in term_match)
        need = len(terms) if node.operator == "MUST" else max(
            node.minimum_number_should_match, 1
        )
        match = matched_n >= need
        return jnp.where(match, term_score * np.float32(node.boost), 0.0), match

    per_field = []
    for f, fb in zip(node.fields, boosts):
        if node.match_type == "PHRASE_PREFIX":
            per_field.append(
                _eval_phrase_prefix_impl(
                    ctx, f, node.query, node.slop, None,
                    node.max_expansions, fb,
                )
            )
        else:  # BEST_FIELDS
            fd = _field(ctx, f)
            terms = fd.query_terms(node.query)
            per_field.append(
                _text_clause(
                    ctx, f, terms, [fb] * len(terms), node.operator,
                    node.minimum_number_should_match, 1.0,
                )
            )
    total = sum(s for s, _ in per_field)
    best = per_field[0][0]
    for s, _ in per_field[1:]:
        best = jnp.maximum(best, s)
    scores = best + np.float32(node.tie_breaker) * (total - best)
    match = per_field[0][1]
    for _, m in per_field[1:]:
        match = match | m
    return jnp.where(match, scores * np.float32(node.boost), 0.0), match


def _eval_resolved_join(node: qp.ResolvedJoinNode, ctx: EvalContext):
    """Join-value matching with per-value aggregated scores (the to-side of
    Lucene JoinUtil.createJoinQuery; the from-side search already ran in the
    handler). A doc matches if its field value is in the join set; score is
    the value's aggregate (max across a multi-valued doc's matches)."""
    import jax

    dv = ctx.segment.doc_values.get(node.field)
    if dv is None or not node.values:
        return _none(ctx)
    D = ctx.segment.capacity
    n = ctx.segment.num_docs
    scores_host = np.zeros(D, np.float32)
    match_host = np.zeros(D, bool)
    if dv.mv_offsets is not None:
        val_score = {v: float(s) for v, s in zip(node.values, node.value_scores)}
        for d in range(n):
            lo, hi = int(dv.mv_offsets[d]), int(dv.mv_offsets[d + 1])
            best = None
            for raw in dv.mv_values[lo:hi]:
                key = dv.ord_terms[int(raw)] if dv.ord_terms else raw.item()
                s = val_score.get(key)
                if s is not None:
                    best = s if best is None else max(best, s)
            if best is not None:
                match_host[d] = True
                scores_host[d] = best
    elif dv.kind == DocValueKind.ORDINAL:
        per_ord = np.zeros(max(len(dv.ord_terms or []), 1), np.float32)
        has_ord = np.zeros(max(len(dv.ord_terms or []), 1), bool)
        for v, s in zip(node.values, node.value_scores):
            o = (dv.ord_index or {}).get(str(v))
            if o is not None:
                has_ord[o] = True
                per_ord[o] = s
        hv = dv.host_values[:n]
        pres = dv.host_present[:n] & (hv >= 0)
        safe = np.clip(hv, 0, len(has_ord) - 1)
        sel = pres & has_ord[safe]
        match_host[:n] = sel
        scores_host[:n][sel] = per_ord[safe[sel]]
    else:
        try:
            vs = np.asarray(node.values, dtype=dv.host_values.dtype)
        except (TypeError, ValueError):
            return _none(ctx)
        order = np.argsort(vs, kind="stable")
        svals = vs[order]
        sscores = np.asarray(node.value_scores, np.float32)[order]
        hv = dv.host_values[:n]
        idx = np.clip(np.searchsorted(svals, hv), 0, len(svals) - 1)
        sel = dv.host_present[:n] & (svals[idx] == hv)
        match_host[:n] = sel
        scores_host[:n][sel] = sscores[idx[sel]]
    scores_host *= np.float32(node.boost)
    return jax.device_put(scores_host), jax.device_put(match_host)


def _eval_dismax(node: qp.DisjunctionMaxNode, ctx: EvalContext):
    """Lucene DisjunctionMaxQuery: best disjunct + tieBreaker * others
    (non-matching disjuncts score 0, so max/sum over them is safe)."""
    if not node.disjuncts:
        return _none(ctx)
    pairs = [eval_node(d, ctx) for d in node.disjuncts]
    best = pairs[0][0]
    total = pairs[0][0]
    match = pairs[0][1]
    for s, m in pairs[1:]:
        best = jnp.maximum(best, s)
        total = total + s
        match = match | m
    scores = best + np.float32(node.tie_breaker) * (total - best)
    return jnp.where(match, scores * np.float32(node.boost), 0.0), match


def _eval_exact_vector(node: qp.ExactVectorQueryNode, ctx: EvalContext):
    """Exact brute-force vector similarity over the whole segment
    (reference: query/vector/ExactVectorQuery.java; one MXU matmul here)."""
    from nrtsearch_tpu.ops.knn import _scores as knn_scores

    vc = ctx.segment.vectors.get(node.field)
    fd = ctx.field_defs.get(node.field)
    if vc is None or fd is None:
        raise ValueError(f"{node.field} is not a VECTOR field")
    dims = int(np.asarray(vc.values).shape[1])
    if len(node.query_vector) != dims:
        raise ValueError(
            f"query vector dimension {len(node.query_vector)} != field dims {dims}"
        )
    q = jnp.asarray(np.asarray(node.query_vector, np.float32))[None, :]
    vals = vc.device_float()  # dequantized view for int8/float16 formats
    sq = jnp.asarray((vc.host_norms ** 2).astype(np.float32))
    scores = knn_scores(q, vals, sq, fd.similarity or "l2_norm")[0]
    match = vc.present & ctx.segment.live
    return jnp.where(match, scores * np.float32(node.boost), 0.0), match


def _eval_boolean(node: qp.BooleanQueryNode, ctx: EvalContext):
    D = ctx.segment.capacity
    musts, filters, shoulds, must_nots = [], [], [], []
    for clause in node.clauses:
        pair = eval_node(clause.node, ctx)
        {
            qp.Occur.MUST: musts,
            qp.Occur.FILTER: filters,
            qp.Occur.SHOULD: shoulds,
            qp.Occur.MUST_NOT: must_nots,
        }[clause.occur].append(pair)

    match = _doc_range_mask(ctx)
    for _, m in musts:
        match = match & m
    for _, m in filters:
        match = match & m
    if shoulds:
        should_count = shoulds[0][1].astype(jnp.int32)
        for _, m in shoulds[1:]:
            should_count = should_count + m.astype(jnp.int32)
        msm = node.minimum_number_should_match
        if not musts and not filters:
            match = match & (should_count >= max(1, msm))
        elif msm > 0:
            match = match & (should_count >= msm)
    for _, m in must_nots:
        match = match & ~m

    scores = jnp.zeros(D, jnp.float32)
    for s, m in musts + shoulds:
        scores = scores + jnp.where(m, s, 0.0)
    scores = scores * np.float32(node.boost)
    return jnp.where(match, scores, 0.0), match


def _eval_range(node: qp.RangeQueryNode, ctx: EvalContext):
    dv = ctx.segment.doc_values.get(node.field)
    if dv is None:
        return _none(ctx)
    lower = node.lower if node.lower is not None else -np.inf
    upper = node.upper if node.upper is not None else np.inf
    match = mask_ops.range_mask(
        dv.values,
        dv.present,
        _dv_scalar(dv, lower),
        _dv_scalar(dv, upper),
        jnp.asarray(not node.lower_exclusive),
        jnp.asarray(not node.upper_exclusive),
    )

    def host_pred(arr):
        lo = arr > lower if node.lower_exclusive else arr >= lower
        hi = arr < upper if node.upper_exclusive else arr <= upper
        return lo & hi

    match = _mv_any(dv, match, host_pred)
    return _const_score(match, node.boost), match


def _eval_exists(node: qp.ExistsQueryNode, ctx: EvalContext):
    seg = ctx.segment
    if node.field in seg.doc_values:
        match = seg.doc_values[node.field].present
    elif node.field in seg.fields:
        match = seg.fields[node.field].doc_lens > 0
    elif node.field in seg.vectors:
        match = seg.vectors[node.field].present
    else:
        return _none(ctx)
    match = match & _doc_range_mask(ctx)
    return _const_score(match, node.boost), match


def _eval_prefix(node: qp.PrefixQueryNode, ctx: EvalContext):
    tfi = ctx.segment.fields.get(node.field)
    if tfi is None:
        return _none(ctx)
    # materialized prefix companion (reference PrefixFieldDef): a prefix of
    # in-range length is ONE term in the hidden subfield — no expansion
    fd = ctx.field_defs.get(node.field)
    if fd is not None and fd.index_prefixes is not None:
        lo, hi = fd.index_prefixes
        companion = f"{node.field}._index_prefix"
        if lo <= len(node.prefix) <= hi and companion in ctx.segment.fields:
            _, match = _text_clause(
                ctx, companion, [node.prefix], [0.0], "SHOULD", 0, 0.0
            )
            return _const_score(match, node.boost), match
    expanded = tfi.terms_with_prefix(node.prefix, node.max_expansions)
    if not expanded:
        return _none(ctx)
    _, match = _text_clause(
        ctx, node.field, expanded, [0.0] * len(expanded), "SHOULD", 0, 0.0
    )
    return _const_score(match, node.boost), match


def _eval_fuzzy(node: qp.FuzzyQueryNode, ctx: EvalContext):
    """Fuzzy term expansion over the segment term dictionary.

    Expansion uses banded Levenshtein with prefix constraint; matches are
    scored as a constant-score OR over expansions (Lucene's blended-freq
    rewrite is a later refinement)."""
    tfi = ctx.segment.fields.get(node.field)
    if tfi is None or not node.text:
        return _none(ctx)
    expanded = _fuzzy_expand(
        tfi, node.text, node.max_edits, node.prefix_length, node.max_expansions
    )
    if not expanded:
        return _none(ctx)
    _, match = _text_clause(
        ctx, node.field, expanded, [0.0] * len(expanded), "SHOULD", 0, 0.0
    )
    return _const_score(match, node.boost), match


def _eval_wildcard(node: qp.WildcardQueryNode, ctx: EvalContext):
    import fnmatch

    tfi = ctx.segment.fields.get(node.field)
    if tfi is None:
        return _none(ctx)
    # narrow the scan to the pattern's literal prefix range (binary search
    # over the sorted vocabulary), then fnmatch only within it
    lit = re.split(r"[*?\[]", node.pattern, 1)[0]
    if lit:
        cands = tfi.terms_with_prefix(lit, len(tfi.terms))
    else:
        cands = tfi.terms
    expanded = [t for t in cands if fnmatch.fnmatchcase(t, node.pattern)]
    expanded = expanded[: node.max_expansions]
    if not expanded:
        return _none(ctx)
    _, match = _text_clause(
        ctx, node.field, expanded, [0.0] * len(expanded), "SHOULD", 0, 0.0
    )
    return _const_score(match, node.boost), match


def _fuzzy_expand(
    tfi, text: str, max_edits: int, prefix_len: int, max_expansions: int
) -> list[str]:
    prefix = text[:prefix_len]
    # with a prefix constraint, binary-search the sorted vocabulary range
    # instead of scanning all terms (VERDICT r2 missing #5)
    cands = tfi.terms_with_prefix(prefix, len(tfi.terms)) if prefix else tfi.terms
    out = []
    n = len(text)
    for t in cands:
        if len(out) >= max_expansions:
            break
        if abs(len(t) - n) > max_edits:
            continue
        if _levenshtein_at_most(text, t, max_edits):
            out.append(t)
    return out


def _levenshtein_at_most(a: str, b: str, k: int) -> bool:
    """Banded edit distance check (distance <= k)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    big = k + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        # cells outside the |i-j| <= k band are unreachable within k edits
        cur = [big] * (lb + 1)
        lo = max(1, i - k)
        hi = min(lb, i + k)
        if i <= k:
            cur[0] = i
        for j in range(lo, hi + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        if min(cur[lo : hi + 1]) > k:
            return False
        prev = cur
    return prev[lb] <= k


def _eval_completion(node: qp.CompletionQueryNode, ctx: EvalContext):
    """Context-suggest completion: prefix (optionally fuzzy) match over the
    segment's suggestion entries, scored by suggestion weight.

    Reference: ContextSuggestFieldDef + CompletionQuery (prefix/fuzzy) with
    context filtering (MyContextQuery)."""
    seg = ctx.segment
    entries = seg.suggest.get(node.field)
    if not entries or not node.text:
        return _none(ctx)
    want = node.text.lower()
    ctx_set = set(node.contexts)
    scores_host = np.zeros(seg.capacity, np.float32)
    match_host = np.zeros(seg.capacity, bool)
    for doc, text, weight, contexts in entries:
        lt = text.lower()
        if node.fuzzy:
            ok = _levenshtein_at_most(want, lt[: len(want)], 1)
        else:
            ok = lt.startswith(want)
        if not ok:
            continue
        if ctx_set and not (ctx_set & set(contexts)):
            continue
        if weight * node.boost > scores_host[doc]:
            scores_host[doc] = weight * node.boost
        match_host[doc] = True
    import jax

    return jax.device_put(scores_host), jax.device_put(match_host)


def _eval_nested(node: qp.NestedQueryNode, ctx: EvalContext):
    """Block-join: evaluate the child query, aggregate per parent block.

    Reference: NestedQuery (proto) -> Lucene ToParentBlockJoinQuery. Blocks
    are contiguous (children precede their parent), so per-parent aggregation
    is a reduceat over parent boundaries.
    """
    from nrtsearch_tpu.core.segment import SegmentBuilder

    seg = ctx.segment
    dv = seg.doc_values.get(SegmentBuilder.NESTED_PATH_FIELD)
    parents = seg.parent_positions()
    if dv is None or parents is None or len(parents) == 0:
        return _none(ctx)
    path_ord = (dv.ord_index or {}).get(node.path)
    if path_ord is None:
        return _none(ctx)
    child_scores, child_match = eval_node(node.query or qp.MatchAllNode(), ctx)
    cs = np.asarray(child_scores)[: seg.num_docs]
    cm = np.asarray(child_match)[: seg.num_docs]
    on_path = dv.host_values[: seg.num_docs] == path_ord
    cm = cm & on_path & seg.host_live
    cs = np.where(cm, cs, 0.0)

    # per-parent block aggregation: block of parents[i] = (parents[i-1], parents[i])
    starts = np.concatenate([[0], parents[:-1] + 1])
    sums = np.add.reduceat(cs, starts) * (starts < seg.num_docs)
    counts = np.add.reduceat(cm.astype(np.int64), starts)
    # reduceat with empty blocks (start == parent pos) repeats values; fix by
    # zeroing blocks with no matching children
    empty = counts == 0
    sums = np.where(empty, 0.0, sums)
    if node.score_mode == "MAX" or node.score_mode == "MIN":
        op = np.maximum if node.score_mode == "MAX" else np.minimum
        agg = op.reduceat(np.where(cm, cs, -np.inf if node.score_mode == "MAX" else np.inf), starts)
        agg = np.where(empty, 0.0, agg)
    elif node.score_mode == "AVG":
        agg = np.where(empty, 0.0, sums / np.maximum(counts, 1))
    elif node.score_mode == "NONE":
        agg = (~empty).astype(np.float32)
    else:  # SUM
        agg = sums

    scores_host = np.zeros(seg.capacity, np.float32)
    match_host = np.zeros(seg.capacity, bool)
    scores_host[parents] = (agg * node.boost).astype(np.float32)
    match_host[parents] = ~empty
    scores_host = np.where(match_host[: seg.capacity], scores_host, 0.0)
    import jax

    return jax.device_put(scores_host), jax.device_put(match_host)


def _eval_geo_bbox(node: qp.GeoBoundingBoxNode, ctx: EvalContext):
    dv = ctx.segment.doc_values.get(node.field)
    if dv is None or dv.kind != DocValueKind.LAT_LON:
        return _none(ctx)
    match = mask_ops.geo_bounding_box_mask(
        dv.values, dv.present, node.min_lat, node.max_lat, node.min_lon, node.max_lon
    )
    return _const_score(match, node.boost), match


def _eval_geo_radius(node: qp.GeoRadiusNode, ctx: EvalContext):
    dv = ctx.segment.doc_values.get(node.field)
    if dv is None or dv.kind != DocValueKind.LAT_LON:
        return _none(ctx)
    match = mask_ops.geo_radius_mask(
        dv.values, dv.present, node.lat, node.lon, node.radius_meters
    )
    return _const_score(match, node.boost), match


def _eval_geo_polygon(node: qp.GeoPolygonNode, ctx: EvalContext):
    """LAT_LON points within any query polygon (with holes). Each polygon's
    outer ring + holes become one NaN-separated closed-ring edge list; the
    even-odd parity count excludes hole interiors (reference:
    LatLonFieldDef.getGeoPolygonQuery -> LatLonPoint.newPolygonQuery)."""
    dv = ctx.segment.doc_values.get(node.field)
    if dv is None or dv.kind != DocValueKind.LAT_LON:
        return _none(ctx)
    match = None
    for poly in node.polygons:
        if len(poly.points) < 3:
            continue
        segs = []
        for ring in (poly.points, *poly.holes):
            pts = list(ring)
            if pts[0] != pts[-1]:
                pts.append(pts[0])  # close the ring
            segs.append(np.asarray(pts, np.float32))
            segs.append(np.full((1, 2), np.nan, np.float32))  # ring separator
        rings = jnp.asarray(np.concatenate(segs, axis=0))
        m = mask_ops.point_in_rings_mask(dv.values, dv.present, rings)
        match = m if match is None else (match | m)
    if match is None:
        return _none(ctx)
    return _const_score(match, node.boost), match


def _device_phrase_enabled() -> bool:
    """Device phrase verification (ops/phrase.py) is the default; set
    NRT_DEVICE_PHRASE=0 to A/B against the host position loop."""
    import os

    return os.environ.get("NRT_DEVICE_PHRASE", "1") == "1"


def _eval_phrase(node, ctx: EvalContext):
    """Phrase matching: device AND-candidate recall + host position verify.

    Reference: Lucene PhraseQuery via QueryNodeMapper. Stage 1 runs on device
    (docs containing all terms); stage 2 verifies positions on the host over
    the candidate set only and computes the phrase-frequency BM25 score
    (idf = sum of term idfs, tf = phrase freq — Lucene PhraseQuery semantics).
    """
    seg = ctx.segment
    if isinstance(node, qp.MatchPhraseQueryNode):
        fd = _field(ctx, node.field)
        analyzer = fd.search_analyzer or fd.index_analyzer or get_analyzer("standard")
        tokens = analyzer.analyze(node.query)
        if not tokens:
            return _none(ctx)
        base_pos = tokens[0].position
        terms = [t.text for t in tokens]
        req_offsets = [t.position - base_pos for t in tokens]
        slop = node.slop
    else:
        terms = list(node.terms)
        req_offsets = list(range(len(terms)))
        slop = node.slop
    if not terms:
        return _none(ctx)
    tfi = seg.fields.get(node.field)
    if tfi is None or tfi.positions is None:
        return _none(ctx)

    # stage 1: candidate docs containing all terms (device)
    _, cand_mask = _text_clause(
        ctx, node.field, terms, [0.0] * len(terms), "MUST", 0, 0.0
    )
    cand_ids = np.nonzero(np.asarray(cand_mask)[: seg.num_docs])[0]

    # stage 2: position verification + phrase-freq BM25 scoring
    dc = ctx.stats.doc_count(node.field)
    sum_idf = sum(
        bm25_ops.lucene_idf(dc, ctx.stats.doc_freq(node.field, t)) for t in set(terms)
    )
    avgdl = ctx.stats.avgdl(node.field)
    if _device_phrase_enabled() and len(cand_ids):
        from nrtsearch_tpu.ops import phrase as phrase_ops

        res = phrase_ops.run_phrase(
            tfi, cand_ids, terms, req_offsets, slop
        )
        if res is not None:
            freqs_dev, cand_pad = res
            return phrase_ops.phrase_scatter(
                freqs_dev, jnp.asarray(cand_pad), tfi.doc_lens,
                jnp.float32(sum_idf), jnp.float32(node.boost),
                jnp.float32(ctx.k1), jnp.float32(ctx.b), jnp.float32(avgdl),
            )

    doc_lens = np.asarray(tfi.doc_lens)
    scores_host = np.zeros(seg.capacity, np.float32)
    match_host = np.zeros(seg.capacity, bool)
    for doc in cand_ids:
        plists = [tfi.positions_of(t, int(doc)) for t in terms]
        freq = _phrase_freq(plists, req_offsets, slop)
        if freq > 0:
            dl = doc_lens[doc]
            tf_norm = freq / (freq + ctx.k1 * (1 - ctx.b + ctx.b * dl / avgdl))
            scores_host[doc] = node.boost * sum_idf * tf_norm
            match_host[doc] = True
    import jax

    return jax.device_put(scores_host), jax.device_put(match_host)


def _eval_phrase_prefix_impl(
    ctx: EvalContext, field: str, query: str, slop: int,
    analyzer_name, max_expansions: int, boost: float,
):
    """Phrase with prefix-expanded last term (reference:
    query/MatchPhrasePrefixQuery.java -> Lucene MultiPhrasePrefixQuery:
    the last analyzed term expands to up to max_expansions index terms;
    the phrase matches if any expansion completes it). Scored like a phrase
    with the expansion set treated as one term (df = sum of expansion dfs,
    capped at doc count)."""
    seg = ctx.segment
    fd = _field(ctx, field)
    analyzer = (
        get_analyzer(analyzer_name)
        if analyzer_name
        else (fd.search_analyzer or fd.index_analyzer or get_analyzer("standard"))
    )
    tokens = analyzer.analyze(query)
    if not tokens:
        return _none(ctx)
    base_pos = tokens[0].position
    terms = [t.text for t in tokens]
    req_offsets = [t.position - base_pos for t in tokens]
    tfi = seg.fields.get(field)
    if tfi is None or tfi.positions is None:
        return _none(ctx)
    prefix = terms[-1]
    expansions = tfi.terms_with_prefix(prefix, max(max_expansions, 1))
    if not expansions:
        return _none(ctx)
    fixed = terms[:-1]

    # stage 1 (device): docs with all fixed terms AND any expansion
    _, m_exp = _text_clause(
        ctx, field, expansions, [0.0] * len(expansions), "SHOULD", 0, 0.0
    )
    if fixed:
        _, m_fixed = _text_clause(
            ctx, field, fixed, [0.0] * len(fixed), "MUST", 0, 0.0
        )
        cand_mask = m_fixed & m_exp
    else:
        cand_mask = m_exp
    cand_ids = np.nonzero(np.asarray(cand_mask)[: seg.num_docs])[0]

    dc = ctx.stats.doc_count(field)
    df_exp = min(
        sum(ctx.stats.doc_freq(field, t) for t in expansions), max(dc, 1)
    )
    sum_idf = sum(
        bm25_ops.lucene_idf(dc, ctx.stats.doc_freq(field, t)) for t in set(fixed)
    ) + bm25_ops.lucene_idf(dc, df_exp)
    avgdl = ctx.stats.avgdl(field)
    if _device_phrase_enabled() and len(cand_ids) and fixed:
        from nrtsearch_tpu.ops import phrase as phrase_ops

        res = phrase_ops.run_phrase(
            tfi, cand_ids, fixed, req_offsets[:-1], slop,
            expansions=expansions, exp_req=req_offsets[-1],
        )
        if res is not None:
            freqs_dev, cand_pad = res
            return phrase_ops.phrase_scatter(
                freqs_dev, jnp.asarray(cand_pad), tfi.doc_lens,
                jnp.float32(sum_idf), jnp.float32(boost),
                jnp.float32(ctx.k1), jnp.float32(ctx.b), jnp.float32(avgdl),
            )
    doc_lens = np.asarray(tfi.doc_lens)
    scores_host = np.zeros(seg.capacity, np.float32)
    match_host = np.zeros(seg.capacity, bool)
    for doc in cand_ids:
        plists = [tfi.positions_of(t, int(doc)) for t in fixed]
        exp_lists = [tfi.positions_of(t, int(doc)) for t in expansions]
        exp_pos = np.unique(
            np.concatenate(exp_lists) if exp_lists else np.empty(0, np.int32)
        )
        freq = _phrase_freq(plists + [exp_pos], req_offsets, slop)
        if freq > 0:
            dl = doc_lens[doc]
            tf_norm = freq / (freq + ctx.k1 * (1 - ctx.b + ctx.b * dl / avgdl))
            scores_host[doc] = boost * sum_idf * tf_norm
            match_host[doc] = True
    import jax

    return jax.device_put(scores_host), jax.device_put(match_host)


def _span_clause_terms(clause: qp.SpanClause, tfi) -> list[str]:
    """Expand one span clause against the segment's term dictionary."""
    if clause.kind == "term":
        return [clause.text] if clause.text in tfi.terms else []
    if clause.kind == "prefix":
        out = tfi.terms_with_prefix(clause.text, len(tfi.terms))
    elif clause.kind == "wildcard":
        import fnmatch

        lit = re.split(r"[*?\[]", clause.text, 1)[0]
        cands = tfi.terms_with_prefix(lit, len(tfi.terms)) if lit else tfi.terms
        out = [t for t in cands if fnmatch.fnmatchcase(t, clause.text)]
    elif clause.kind == "fuzzy":
        out = _fuzzy_expand(
            tfi, clause.text, clause.max_edits,
            clause.prefix_length, clause.max_expansions,
        )
    elif clause.kind == "regexp":
        # Lucene RegexpQuery anchors the whole term (search.proto:605); the
        # Python-re-compatible subset of Lucene regexp syntax is supported

        try:
            pat = re.compile(clause.text)
        except re.error as e:
            raise ValueError(f"invalid regexp {clause.text!r}: {e}")
        out = [t for t in tfi.terms if pat.fullmatch(t)]
    elif clause.kind == "term_range":
        lo, hi = clause.text, clause.upper

        def in_range(t: str) -> bool:
            if lo and (t < lo or (t == lo and not clause.include_lower)):
                return False
            if hi and (t > hi or (t == hi and not clause.include_upper)):
                return False
            return True

        out = [t for t in tfi.terms if in_range(t)]
    else:
        raise ValueError(f"unknown span clause kind: {clause.kind!r}")
    return out[: clause.max_expansions]


def _span_leaves(clause: qp.SpanClause):
    """All term-bearing leaf clauses under ``clause`` (depth-first)."""
    if clause.kind == "near":
        for c in clause.near.clauses:
            yield from _span_leaves(c)
    else:
        yield clause


_EMPTY_SPANS = np.empty((0, 2), np.int64)


def _near_match_spans(
    lists: list[np.ndarray], slop: int, in_order: bool
) -> np.ndarray:
    """Greedy span-near matching over per-clause span lists ([n, 2] arrays of
    (start, end), sorted by start). A match picks one span per clause with
        (max_end - min_start) - sum(span widths) <= slop,
    non-overlapping in clause order when ``in_order`` (Lucene
    NearSpansOrdered), nearest-by-start greedy selection otherwise
    (NearSpansUnordered's minimal-interval behavior, greedy per first-clause
    span). Returns the matched (min_start, max_end) spans so near groups
    nest as clauses of an enclosing near."""
    n = len(lists)
    if any(len(sp) == 0 for sp in lists):
        return _EMPTY_SPANS
    if n == 1:
        return lists[0]
    starts = [sp[:, 0] for sp in lists]
    out = []
    for s0, e0 in lists[0]:
        min_start, max_end = int(s0), int(e0)
        total_len = int(e0) - int(s0)
        prev_start, prev_end = int(s0), int(e0)
        ok = True
        for sp, st in zip(lists[1:], starts[1:]):
            if in_order:
                i = int(np.searchsorted(st, prev_end))
                if i >= len(sp):
                    ok = False
                    break
                s, e = int(sp[i, 0]), int(sp[i, 1])
            else:
                i = int(np.searchsorted(st, prev_start))
                cands = []
                if i < len(sp):
                    cands.append((int(sp[i, 0]), int(sp[i, 1])))
                if i > 0:
                    cands.append((int(sp[i - 1, 0]), int(sp[i - 1, 1])))
                s, e = min(cands, key=lambda se: abs(se[0] - prev_start))
            min_start = min(min_start, s)
            max_end = max(max_end, e)
            total_len += e - s
            prev_start, prev_end = s, e
            if (max_end - min_start) - total_len > slop:
                ok = False
                break
        if ok and (max_end - min_start) - total_len <= slop:
            out.append((min_start, max_end))
    if not out:
        return _EMPTY_SPANS
    spans = np.array(out, np.int64)
    return spans[np.argsort(spans[:, 0], kind="stable")]


def _span_clause_matches(
    clause: qp.SpanClause, tfi, doc: int, leaf_terms: dict
) -> np.ndarray:
    """Spans of one clause in one doc: unit-width spans at term positions for
    leaves, recursive near-match spans for nested near groups."""
    if clause.kind == "near":
        child = [
            _span_clause_matches(c, tfi, doc, leaf_terms)
            for c in clause.near.clauses
        ]
        return _near_match_spans(child, clause.near.slop, clause.near.in_order)
    pls = [tfi.positions_of(t, doc) for t in leaf_terms[id(clause)]]
    pos = np.unique(np.concatenate(pls)) if pls else np.empty(0, np.int64)
    if len(pos) == 0:
        return _EMPTY_SPANS
    return np.stack([pos, pos + 1], axis=1).astype(np.int64)


def _eval_span_near(node: qp.SpanNearNode, ctx: EvalContext):
    """SpanNearQuery: device AND-candidate recall over per-clause term sets,
    host position verification (reference: QueryNodeMapper span handling ->
    Lucene SpanNearQuery). Scored like a phrase: summed clause idfs with a
    BM25 tf-norm on the span frequency."""
    seg = ctx.segment
    field = node.clauses[0].field
    tfi = seg.fields.get(field)
    if tfi is None or tfi.positions is None:
        return _none(ctx)
    # expand every term-bearing leaf (incl. leaves of nested near groups)
    leaves = [lf for c in node.clauses for lf in _span_leaves(c)]
    leaf_terms = {id(lf): _span_clause_terms(lf, tfi) for lf in leaves}
    if any(not terms for terms in leaf_terms.values()):
        return _none(ctx)

    # stage 1: docs matching some term of EVERY leaf clause (a near match
    # needs all of its clauses, recursively — AND over leaves is exact recall)
    cand_mask = None
    for lf in leaves:
        terms = leaf_terms[id(lf)]
        _, m = _text_clause(ctx, field, terms, [0.0] * len(terms), "SHOULD", 0, 0.0)
        cand_mask = m if cand_mask is None else (cand_mask & m)
    cand_ids = np.nonzero(np.asarray(cand_mask)[: seg.num_docs])[0]

    dc = ctx.stats.doc_count(field)
    sum_idf = 0.0
    for lf in leaves:
        terms = leaf_terms[id(lf)]
        df = min(sum(ctx.stats.doc_freq(field, t) for t in terms), max(dc, 1))
        sum_idf += bm25_ops.lucene_idf(dc, df)
    avgdl = ctx.stats.avgdl(field)
    doc_lens = np.asarray(tfi.doc_lens)
    scores_host = np.zeros(seg.capacity, np.float32)
    match_host = np.zeros(seg.capacity, bool)
    for doc in cand_ids:
        clause_spans = [
            _span_clause_matches(c, tfi, int(doc), leaf_terms)
            for c in node.clauses
        ]
        freq = len(_near_match_spans(clause_spans, node.slop, node.in_order))
        if freq > 0:
            dl = doc_lens[doc]
            tf_norm = freq / (freq + ctx.k1 * (1 - ctx.b + ctx.b * dl / avgdl))
            scores_host[doc] = node.boost * sum_idf * tf_norm
            match_host[doc] = True
    import jax

    return jax.device_put(scores_host), jax.device_put(match_host)


def _phrase_freq(plists: list[np.ndarray], offsets: list[int], slop: int) -> int:
    """Count phrase occurrences.

    Exact (slop=0): base positions p where every term i appears at p+offset_i.
    Sloppy: alignments where the total displacement from the exact layout is
    <= slop (greedy nearest-position approximation of Lucene's sloppy freq).
    """
    if any(len(p) == 0 for p in plists):
        return 0
    base = plists[0] - offsets[0]
    if slop == 0:
        count = 0
        sets = [set(p.tolist()) for p in plists]
        for p in base:
            if all((p + off) in s for off, s in zip(offsets[1:], sets[1:])):
                count += 1
        return count
    count = 0
    for p in base:
        total_move = 0
        ok = True
        for off, plist in zip(offsets[1:], plists[1:]):
            want = p + off
            i = np.searchsorted(plist, want)
            best = np.inf
            if i < len(plist):
                best = abs(int(plist[i]) - want)
            if i > 0:
                best = min(best, abs(int(plist[i - 1]) - want))
            total_move += best
            if total_move > slop:
                ok = False
                break
        if ok:
            count += 1
    return count


def _eval_function_score(node: qp.FunctionScoreNode, ctx: EvalContext):
    from nrtsearch_tpu.script.expr import compile_expression

    scores, match = eval_node(node.query or qp.MatchAllNode(), ctx)
    fn = compile_expression(node.expression)
    new_scores = fn(_ScriptDocValues(ctx.segment), scores)
    new_scores = new_scores * np.float32(node.boost)
    return jnp.where(match, new_scores, 0.0), match


def _decay_value(spec: qp.DecaySpec, ctx: EvalContext):
    """Per-doc decay score from geo distance (reference:
    query/multifunction/GeoPointDecayFilterFunction.java + the
    Linear/Exponential/GuassianDecayFunction computeScore/computeScale
    pair). Docs with no value score 0.0."""
    if not (0.0 < spec.decay < 1.0):
        raise ValueError(
            f"decay rate should be between (0, 1) but is {spec.decay}"
        )
    dv = ctx.segment.doc_values.get(spec.field)
    if dv is None or dv.kind != DocValueKind.LAT_LON:
        raise ValueError(
            f"{spec.field} should be a LAT_LON field to apply geoPoint decay"
        )
    dist = mask_ops.haversine_meters(dv.values, spec.origin[0], spec.origin[1])
    delta = jnp.maximum(dist - np.float32(spec.offset), 0.0)
    kind = spec.decay_type.replace("DECAY_TYPE_", "")
    if kind == "LINEAR":
        scale = spec.scale / (1.0 - spec.decay)
        val = jnp.maximum((scale - delta) / scale, 0.0)
    elif kind == "GUASSIAN":
        scale = -(spec.scale**2) / (2.0 * math.log(spec.decay))
        val = jnp.exp(-(delta**2) / (2.0 * scale))
    elif kind == "EXPONENTIAL":
        scale = math.log(spec.decay) / spec.scale
        val = jnp.exp(scale * delta)
    else:
        raise ValueError(f"unsupported decay type: {spec.decay_type}")
    return jnp.where(dv.present, val.astype(jnp.float32), 0.0)


def _eval_multi_function_score(node: qp.MultiFunctionScoreNode, ctx: EvalContext):
    """MultiFunctionScoreQuery: inner scores combined with weighted filter
    functions (reference: query/multifunction/MultiFunctionScoreQuery.java,
    computeFunctionScore + computeFinalScore + MinScoreWrapper)."""
    from nrtsearch_tpu.script.expr import compile_expression

    inner_scores, match = eval_node(node.query or qp.MatchAllNode(), ctx)
    inner_scores = inner_scores * np.float32(node.boost)
    scores = inner_scores
    if node.functions:
        gates, vals = [], []
        for spec in node.functions:
            if spec.filter is not None:
                _, gate = eval_node(spec.filter, ctx)
            else:
                gate = jnp.ones_like(match)
            if spec.decay is not None:
                v = _decay_value(spec.decay, ctx)
            elif spec.script is not None:
                fn = compile_expression(spec.script)
                v = fn(_ScriptDocValues(ctx.segment), inner_scores)
            else:
                v = jnp.ones_like(inner_scores)  # WeightFilterFunction
            vals.append(v * np.float32(spec.weight))
            gates.append(gate)
        if node.score_mode == "SCORE_MODE_SUM":
            total = functools.reduce(
                jnp.add, (jnp.where(g, v, 0.0) for g, v in zip(gates, vals))
            )
            any_gate = functools.reduce(jnp.logical_or, gates)
            # no function matched -> function score 1.0 (reference semantics)
            fscore = jnp.where(any_gate, total, 1.0)
        elif node.score_mode == "SCORE_MODE_MULTIPLY":
            fscore = jnp.ones_like(inner_scores)
            for g, v in zip(gates, vals):
                fscore = fscore * jnp.where(g, v, 1.0)
        else:
            raise ValueError(f"unknown score mode: {node.score_mode}")
        if node.boost_mode == "BOOST_MODE_SUM":
            scores = inner_scores + fscore
        elif node.boost_mode == "BOOST_MODE_REPLACE":
            scores = fscore
        elif node.boost_mode == "BOOST_MODE_MULTIPLY":
            scores = inner_scores * fscore
        else:
            raise ValueError(f"unknown boost mode: {node.boost_mode}")
    scores = jnp.where(match, scores, 0.0)
    if node.min_score > 0.0 or node.min_excluded:
        passed = (
            scores > np.float32(node.min_score)
            if node.min_excluded
            else scores >= np.float32(node.min_score)
        )
        match = match & passed
        scores = jnp.where(match, scores, 0.0)
    return scores, match


class _ScriptDocValues:
    """Field-name -> dense device column accessor for script expressions."""

    def __init__(self, segment: Segment):
        self._segment = segment

    def __contains__(self, name: str) -> bool:
        return name in self._segment.doc_values

    def __getitem__(self, name: str):
        dv = self._segment.doc_values[name]
        return jnp.where(dv.present, dv.values.astype(jnp.float32), 0.0)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _const_score(match, boost: float):
    return jnp.where(match, np.float32(boost), 0.0)


def _np_dtype_of(dv) -> np.dtype:
    return np.asarray(dv.host_values).dtype


def _dv_scalar(dv, value):
    """Query constant as a device scalar matching the column dtype."""
    dtype = dv.values.dtype
    if dtype == jnp.float64:
        import jax

        with jax.enable_x64():
            return jnp.asarray(np.float64(value))
    return jnp.asarray(np.asarray(value).astype(np.float32))


def _dv_array(dv, values: np.ndarray):
    dtype = dv.values.dtype
    if dtype == jnp.float64:
        import jax

        with jax.enable_x64():
            return jnp.asarray(values.astype(np.float64))
    return jnp.asarray(values.astype(np.float32))


def _ordinal_match(dv, ords: np.ndarray):
    if dv.mv_offsets is not None:
        return _mv_any(dv, None, lambda arr: np.isin(arr, ords))
    return mask_ops.in_set_mask(dv.values, dv.present, jnp.asarray(ords))


def _mv_any(dv, single_match, host_pred):
    """Extend a single-valued match to multi-valued columns.

    Multi-valued matching runs on the host CSR arrays (they are host-resident;
    device CSR segment-reduce is a later optimization) and the resulting doc
    mask is shipped to device.
    """
    if dv.mv_offsets is None:
        return single_match
    hits = host_pred(dv.mv_values)
    num_docs = len(dv.mv_offsets) - 1
    doc_hit = np.zeros(num_docs, dtype=bool)
    # segment-any over CSR
    if hits.any():
        doc_of_entry = np.repeat(
            np.arange(num_docs), np.diff(dv.mv_offsets)
        )
        np.logical_or.at(doc_hit, doc_of_entry[hits], True)
    capacity = dv.host_values.shape[0]
    full = np.zeros(capacity, dtype=bool)
    full[:num_docs] = doc_hit
    import jax

    return jax.device_put(full)
