"""Compiler for the javascript-expression subset used by scores and virtual
fields.

Supported grammar (the commonly used core of Lucene's expression language):

    expr     := ternary
    ternary  := or ('?' expr ':' expr)?
    or       := and ('||' and)*
    and      := cmp ('&&' cmp)*
    cmp      := add (('<'|'<='|'>'|'>='|'=='|'!=') add)?
    add      := mul (('+'|'-') mul)*
    mul      := unary (('*'|'/'|'%') unary)*
    unary    := ('-'|'!') unary | atom
    atom     := NUMBER | IDENT | IDENT '(' args ')' | '(' expr ')'

Identifiers resolve to doc-value columns (dense [D] arrays) or ``_score``.
Functions: abs, log, log10, ln, sqrt, pow, min, max, exp, floor, ceil.

The compiled function has signature ``fn(doc_values, score) -> [D] array``
where ``doc_values`` supports ``__getitem__(field_name)``.
"""

from __future__ import annotations

import re
from typing import Callable

import jax.numpy as jnp

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+\.?\d*(?:[eE][+-]?\d+)?)|(?P<ident>[A-Za-z_][A-Za-z0-9_.]*)"
    r"|(?P<op>\|\||&&|<=|>=|==|!=|[-+*/%<>?:!(),]))"
)

def _haversin_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in KILOMETERS (reference: Lucene expressions
    haversin(); ExpressionsJavascriptFunctions haversinKilometers)."""
    r1, g1 = jnp.radians(lat1), jnp.radians(lon1)
    r2, g2 = jnp.radians(lat2), jnp.radians(lon2)
    h = (
        jnp.sin((r2 - r1) / 2) ** 2
        + jnp.cos(r1) * jnp.cos(r2) * jnp.sin((g2 - g1) / 2) ** 2
    )
    return 2 * 6371.0087714 * jnp.arcsin(jnp.sqrt(jnp.clip(h, 0.0, 1.0)))


_FUNCS = {
    "abs": jnp.abs,
    "log": jnp.log,
    "ln": jnp.log,
    "log10": jnp.log10,
    "sqrt": jnp.sqrt,
    "exp": jnp.exp,
    "floor": jnp.floor,
    "ceil": jnp.ceil,
    "pow": jnp.power,
    "min": jnp.minimum,
    "max": jnp.maximum,
    "sin": jnp.sin,
    "cos": jnp.cos,
    "tan": jnp.tan,
    "asin": jnp.arcsin,
    "acos": jnp.arccos,
    "atan": jnp.arctan,
    "atan2": jnp.arctan2,
    "sinh": jnp.sinh,
    "cosh": jnp.cosh,
    "tanh": jnp.tanh,
    # geo (Lucene expressions: haversin is km; haversinMeters for meters)
    "haversin": _haversin_km,
    "haversinKilometers": _haversin_km,
    "haversinMeters": lambda a, b, c, d: _haversin_km(a, b, c, d) * 1000.0,
}


def _tokenize(src: str) -> list[str]:
    tokens = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip() == "":
                break
            raise ValueError(f"bad expression near: {src[pos:pos+20]!r}")
        tokens.append(m.group("num") or m.group("ident") or m.group("op"))
        pos = m.end()
    return tokens


class _Parser:
    def __init__(self, tokens: list[str]):
        self.tokens = tokens
        self.i = 0

    def peek(self):
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def next(self):
        tok = self.peek()
        self.i += 1
        return tok

    def expect(self, tok: str):
        got = self.next()
        if got != tok:
            raise ValueError(f"expected {tok!r}, got {got!r}")

    def parse(self):
        node = self.ternary()
        if self.peek() is not None:
            raise ValueError(f"trailing tokens: {self.tokens[self.i:]}")
        return node

    def ternary(self):
        cond = self.or_()
        if self.peek() == "?":
            self.next()
            a = self.ternary()
            self.expect(":")
            b = self.ternary()
            return ("?", cond, a, b)
        return cond

    def or_(self):
        node = self.and_()
        while self.peek() == "||":
            self.next()
            node = ("||", node, self.and_())
        return node

    def and_(self):
        node = self.cmp()
        while self.peek() == "&&":
            self.next()
            node = ("&&", node, self.cmp())
        return node

    def cmp(self):
        node = self.add()
        if self.peek() in ("<", "<=", ">", ">=", "==", "!="):
            op = self.next()
            node = (op, node, self.add())
        return node

    def add(self):
        node = self.mul()
        while self.peek() in ("+", "-"):
            op = self.next()
            node = (op, node, self.mul())
        return node

    def mul(self):
        node = self.unary()
        while self.peek() in ("*", "/", "%"):
            op = self.next()
            node = (op, node, self.unary())
        return node

    def unary(self):
        if self.peek() == "-":
            self.next()
            return ("neg", self.unary())
        if self.peek() == "!":
            self.next()
            return ("!", self.unary())
        return self.atom()

    def atom(self):
        tok = self.next()
        if tok is None:
            raise ValueError("unexpected end of expression")
        if tok == "(":
            node = self.ternary()
            self.expect(")")
            return node
        if re.fullmatch(r"\d+\.?\d*(?:[eE][+-]?\d+)?", tok):
            return ("num", float(tok))
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.]*", tok):
            if self.peek() == "(":
                self.next()
                args = []
                if self.peek() != ")":
                    args.append(self.ternary())
                    while self.peek() == ",":
                        self.next()
                        args.append(self.ternary())
                self.expect(")")
                return ("call", tok, args)
            return ("var", tok)
        raise ValueError(f"unexpected token: {tok!r}")


_BINOPS = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
    "%": lambda a, b: a % b,
    "<": lambda a, b: (a < b).astype(jnp.float32),
    "<=": lambda a, b: (a <= b).astype(jnp.float32),
    ">": lambda a, b: (a > b).astype(jnp.float32),
    ">=": lambda a, b: (a >= b).astype(jnp.float32),
    "==": lambda a, b: (a == b).astype(jnp.float32),
    "!=": lambda a, b: (a != b).astype(jnp.float32),
    "||": lambda a, b: jnp.maximum((a != 0), (b != 0)).astype(jnp.float32),
    "&&": lambda a, b: ((a != 0) & (b != 0)).astype(jnp.float32),
}


def _eval_ast(node, doc_values, score):
    kind = node[0]
    if kind == "num":
        return node[1]
    if kind == "var":
        name = node[1]
        if name == "_score":
            return score
        return doc_values[name]
    if kind == "neg":
        return -_eval_ast(node[1], doc_values, score)
    if kind == "!":
        v = _eval_ast(node[1], doc_values, score)
        return (v == 0).astype(jnp.float32)
    if kind == "?":
        cond = _eval_ast(node[1], doc_values, score)
        a = _eval_ast(node[2], doc_values, score)
        b = _eval_ast(node[3], doc_values, score)
        return jnp.where(cond != 0, a, b)
    if kind == "call":
        fn = _FUNCS.get(node[1])
        if fn is None:
            raise ValueError(f"unknown function: {node[1]!r}")
        args = [_eval_ast(a, doc_values, score) for a in node[2]]
        return fn(*args)
    if kind in _BINOPS:
        return _BINOPS[kind](
            _eval_ast(node[1], doc_values, score), _eval_ast(node[2], doc_values, score)
        )
    raise ValueError(f"bad AST node: {node!r}")


# plugin script engines: lang -> compile(source) -> fn(doc_values, score)
# (reference: ScriptPlugin engines registered by lang beside the built-in
# js-expression engine, server/script/ScriptService)
SCRIPT_ENGINES: dict[str, Callable[[str], Callable]] = {}


def register_script_engine(lang: str, compile_fn: Callable[[str], Callable]) -> None:
    SCRIPT_ENGINES[lang] = compile_fn


def compile_expression(source: str, lang: str = "") -> Callable:
    """Compile script source -> ``fn(doc_values, score) -> array``.

    The default/"js" lang uses the built-in vectorized expression compiler;
    other langs dispatch to a registered plugin engine."""
    if lang and lang not in ("js", "expression"):
        engine = SCRIPT_ENGINES.get(lang)
        if engine is None:
            raise ValueError(f"unknown script lang {lang!r}")
        return engine(source)
    ast = _Parser(_tokenize(source)).parse()

    def fn(doc_values, score):
        return _eval_ast(ast, doc_values, score)

    return fn
