"""Highlighting: fragment extraction with term match tagging.

Reference: server/highlights/ (NRTFastVectorHighlighter, HighlightSettings,
HighlightFetchTask — 1,185 LoC). Highlighting is pure host fetch-stage work
over stored field text: analyze the stored value, locate query-term matches
by character offsets, pick the best fragments, wrap matches in pre/post tags.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from nrtsearch_tpu.analysis import Analyzer, get_analyzer
from nrtsearch_tpu.query import plan as qp


@dataclass
class HighlightSettings:
    pre_tag: str = "<em>"
    post_tag: str = "</em>"
    fragment_size: int = 100
    max_fragments: int = 5
    score_ordered: bool = True


def query_terms_for_field(node: qp.QueryNode, field_name: str) -> set[str]:
    """Collect the query's terms that target one field (for highlighting)."""
    terms: set[str] = set()

    def walk(n: qp.QueryNode) -> None:
        if isinstance(n, qp.MatchQueryNode) and n.field == field_name:
            terms.update(n.query.lower().split())
        elif isinstance(n, qp.TermQueryNode) and n.field == field_name and n.text:
            terms.add(n.text)
        elif isinstance(n, (qp.PhraseQueryNode,)) and n.field == field_name:
            terms.update(n.terms)
        elif isinstance(n, qp.MatchPhraseQueryNode) and n.field == field_name:
            terms.update(n.query.lower().split())
        elif isinstance(n, qp.PrefixQueryNode) and n.field == field_name:
            terms.add(n.prefix + "*")
        elif isinstance(n, qp.BooleanQueryNode):
            for c in n.clauses:
                if c.occur != qp.Occur.MUST_NOT:
                    walk(c.node)
        elif isinstance(n, qp.FunctionScoreNode) and n.query is not None:
            walk(n.query)
        elif isinstance(n, qp.MultiMatchQueryNode) and field_name in n.fields:
            terms.update(n.query.lower().split())
    walk(node)
    return terms


def highlight_text(
    text: str,
    terms: set[str],
    settings: HighlightSettings,
    analyzer: Optional[Analyzer] = None,
) -> list[str]:
    """Best fragments of ``text`` with matched terms wrapped in tags."""
    if not text or not terms:
        return []
    analyzer = analyzer or get_analyzer("standard")
    tokens = analyzer.analyze(text)
    prefixes = {t[:-1] for t in terms if t.endswith("*")}
    exact = {t for t in terms if not t.endswith("*")}

    matches = [
        (tok.start_offset, tok.end_offset)
        for tok in tokens
        if tok.text in exact or any(tok.text.startswith(p) for p in prefixes)
    ]
    if not matches:
        return []

    # group matches into fragments of ~fragment_size chars
    fragments: list[tuple[int, int, list[tuple[int, int]]]] = []
    for start, end in matches:
        if fragments and start - fragments[-1][0] < settings.fragment_size:
            fs, fe, ms = fragments[-1]
            fragments[-1] = (fs, max(fe, end), ms + [(start, end)])
        else:
            fragments.append((start, end, [(start, end)]))

    if settings.score_ordered:
        fragments.sort(key=lambda f: -len(f[2]))
    fragments = fragments[: settings.max_fragments]

    out = []
    for fs, fe, ms in fragments:
        # expand fragment window around the matches
        half = max((settings.fragment_size - (fe - fs)) // 2, 0)
        lo = max(0, fs - half)
        hi = min(len(text), fe + half)
        # snap to word boundaries
        while lo > 0 and not text[lo - 1].isspace():
            lo -= 1
        while hi < len(text) and not text[hi].isspace():
            hi += 1
        frag = text[lo:hi]
        # insert tags right-to-left so offsets stay valid
        for ms_start, ms_end in sorted(ms, reverse=True):
            s, e = ms_start - lo, ms_end - lo
            if 0 <= s < e <= len(frag):
                frag = frag[:s] + settings.pre_tag + frag[s:e] + settings.post_tag + frag[e:]
        out.append(frag)
    return out
