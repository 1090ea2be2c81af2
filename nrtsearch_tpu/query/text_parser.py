"""Classic query-text parser (Lucene QueryParser syntax subset).

Reference: SearchRequestProcessor.extractQuery (:526) parses
SearchRequest.queryText through Lucene's QueryParser. Supported syntax:

    term                      bare term over the default fields
    field:term                term restricted to a field
    field:"a b c"             phrase
    field:[lo TO hi]          range (numeric), * for open ends
    +term / -term             required / prohibited
    term AND term, OR, NOT    boolean operators (default OR)
    (grouping)                parenthesized subqueries
    term* / te?m              prefix / wildcard
    term^2.5                  boost
    term~ / term~1            fuzzy

Default fields = all searchable text fields of the index (MultiFieldQueryParser
behavior).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from nrtsearch_tpu.query import plan as qp

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<and>AND\b) | (?P<or>OR\b) | (?P<not>NOT\b) |
        (?P<plus>\+) | (?P<minus>-) |
        (?P<phrase>(?:[\w.]+:)?"[^"]*"(?:~\d+)?) |
        (?P<range>(?:[\w.]+:)?\[[^\]]*\]|(?:[\w.]+:)?\{[^}]*\}) |
        (?P<term>[^\s()"]+)
    )""",
    re.VERBOSE,
)


def parse_query_text(
    text: str, default_fields: Sequence[str], default_operator: str = "OR"
) -> qp.QueryNode:
    tokens = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            break
        for name in ("lparen", "rparen", "and", "or", "not", "plus", "minus",
                     "phrase", "range", "term"):
            if m.group(name):
                tokens.append((name, m.group(name)))
                break
        pos = m.end()
    parser = _Parser(tokens, list(default_fields), default_operator)
    node = parser.parse_or()
    return node if node is not None else qp.MatchAllNode()


class _Parser:
    def __init__(self, tokens, default_fields, default_op):
        self.tokens = tokens
        self.i = 0
        self.default_fields = default_fields
        self.default_op = default_op

    def peek(self):
        return self.tokens[self.i] if self.i < len(self.tokens) else (None, None)

    def next(self):
        tok = self.peek()
        self.i += 1
        return tok

    def parse_or(self) -> Optional[qp.QueryNode]:
        clauses: list[qp.BooleanClause] = []
        pending_occur = None
        op_mode = self.default_op
        while True:
            kind, val = self.peek()
            if kind is None or kind == "rparen":
                break
            if kind == "and":
                self.next()
                # retro-promote the previous clause to MUST
                if clauses and clauses[-1].occur == qp.Occur.SHOULD:
                    clauses[-1] = qp.BooleanClause(qp.Occur.MUST, clauses[-1].node)
                pending_occur = qp.Occur.MUST
                continue
            if kind == "or":
                self.next()
                pending_occur = qp.Occur.SHOULD
                continue
            if kind == "not":
                self.next()
                node = self.parse_atom()
                if node is not None:
                    clauses.append(qp.BooleanClause(qp.Occur.MUST_NOT, node))
                pending_occur = None
                continue
            if kind == "plus":
                self.next()
                node = self.parse_atom()
                if node is not None:
                    clauses.append(qp.BooleanClause(qp.Occur.MUST, node))
                pending_occur = None
                continue
            if kind == "minus":
                self.next()
                node = self.parse_atom()
                if node is not None:
                    clauses.append(qp.BooleanClause(qp.Occur.MUST_NOT, node))
                pending_occur = None
                continue
            node = self.parse_atom()
            if node is None:
                break
            occur = pending_occur or (
                qp.Occur.MUST if op_mode == "AND" else qp.Occur.SHOULD
            )
            clauses.append(qp.BooleanClause(occur, node))
            pending_occur = None
        if not clauses:
            return None
        if len(clauses) == 1 and clauses[0].occur in (qp.Occur.SHOULD, qp.Occur.MUST):
            return clauses[0].node
        return qp.BooleanQueryNode(clauses=tuple(clauses))

    def parse_atom(self) -> Optional[qp.QueryNode]:
        kind, val = self.next()
        if kind is None:
            return None
        if kind == "lparen":
            node = self.parse_or()
            k, _ = self.peek()
            if k == "rparen":
                self.next()
            return node
        if kind == "phrase":
            field, rest = self._split_field(val)
            m = re.match(r'"([^"]*)"(?:~(\d+))?', rest)
            body, slop = m.group(1), int(m.group(2) or 0)
            fields = [field] if field else self.default_fields[:1]
            return qp.MatchPhraseQueryNode(field=fields[0], query=body, slop=slop)
        if kind == "range":
            field, rest = self._split_field(val)
            inclusive = rest.startswith("[")
            inner = rest[1:-1]
            parts = re.split(r"\s+TO\s+", inner)
            lo = None if parts[0].strip() in ("*", "") else float(parts[0])
            hi = None if len(parts) < 2 or parts[1].strip() in ("*", "") else float(parts[1])
            return qp.RangeQueryNode(
                field=field or self.default_fields[0], lower=lo, upper=hi,
                lower_exclusive=not inclusive, upper_exclusive=not inclusive,
            )
        # plain term
        field, term = self._split_field(val)
        boost = 1.0
        bm = re.match(r"(.*)\^(\d+(?:\.\d+)?)$", term)
        if bm:
            term, boost = bm.group(1), float(bm.group(2))
        fz = re.match(r"(.*?)~(\d*)$", term)
        if fz:
            base, edits = fz.group(1), int(fz.group(2) or 2)
            return qp.FuzzyQueryNode(
                boost=boost, field=field or self.default_fields[0], text=base,
                max_edits=edits,
            )
        if "*" in term or "?" in term:
            f = field or self.default_fields[0]
            if term.endswith("*") and "*" not in term[:-1] and "?" not in term:
                return qp.PrefixQueryNode(boost=boost, field=f, prefix=term[:-1])
            return qp.WildcardQueryNode(boost=boost, field=f, pattern=term)
        if field:
            return qp.MatchQueryNode(boost=boost, field=field, query=term)
        if len(self.default_fields) == 1:
            return qp.MatchQueryNode(
                boost=boost, field=self.default_fields[0], query=term
            )
        return qp.MultiMatchQueryNode(
            boost=boost, fields=tuple(self.default_fields), query=term,
            field_boosts=tuple(1.0 for _ in self.default_fields),
        )

    @staticmethod
    def _split_field(val: str) -> tuple[Optional[str], str]:
        m = re.match(r"([\w.]+):(.*)$", val, re.DOTALL)
        if m:
            return m.group(1), m.group(2)
        return None, val
