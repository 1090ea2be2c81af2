"""Analyzer implementations.

Clean-room equivalents of the predefined analyzers the reference exposes
(reference: server/analysis/AnalyzerCreator.java — predefined names like
``standard``, ``classic``, ``keyword``, ``whitespace``, ``simple``, ``stop``,
``english``) plus custom chains from analysis.proto:36-76.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Iterable, Sequence

# ---------------------------------------------------------------------------
# Tokens
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Token:
    """A single analyzed token with its position (for phrase queries)."""

    text: str
    position: int
    start_offset: int = 0
    end_offset: int = 0


# ---------------------------------------------------------------------------
# Tokenizers
# ---------------------------------------------------------------------------

# Unicode-ish word tokenizer: runs of letters/digits (plus apostrophes kept
# inside words are split, matching Lucene StandardTokenizer's basic behavior
# closely enough for scoring; full UAX#29 segmentation is a later refinement).
_STANDARD_RE = re.compile(r"[^\W_]+", re.UNICODE)
_WHITESPACE_RE = re.compile(r"\S+")
_LETTER_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def _regex_tokenize(pattern: re.Pattern, text: str) -> list[Token]:
    out = []
    for pos, m in enumerate(pattern.finditer(text)):
        out.append(Token(m.group(0), pos, m.start(), m.end()))
    return out


def standard_tokenizer(text: str) -> list[Token]:
    return _regex_tokenize(_STANDARD_RE, text)


def whitespace_tokenizer(text: str) -> list[Token]:
    return _regex_tokenize(_WHITESPACE_RE, text)


def letter_tokenizer(text: str) -> list[Token]:
    return _regex_tokenize(_LETTER_RE, text)


def keyword_tokenizer(text: str) -> list[Token]:
    return [Token(text, 0, 0, len(text))] if text else []


TOKENIZERS: dict[str, Callable[[str], list[Token]]] = {
    "standard": standard_tokenizer,
    "classic": standard_tokenizer,
    "whitespace": whitespace_tokenizer,
    "letter": letter_tokenizer,
    "keyword": keyword_tokenizer,
}

# ---------------------------------------------------------------------------
# Token filters
# ---------------------------------------------------------------------------

ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)


def lowercase_filter(tokens: list[Token]) -> list[Token]:
    return [Token(t.text.lower(), t.position, t.start_offset, t.end_offset) for t in tokens]


def make_stop_filter(stopwords: Iterable[str]) -> Callable[[list[Token]], list[Token]]:
    stops = frozenset(stopwords)

    def stop_filter(tokens: list[Token]) -> list[Token]:
        # Positions are preserved (holes where stopwords were), matching
        # Lucene's position-increment behavior for phrase queries.
        return [t for t in tokens if t.text not in stops]

    return stop_filter


def ascii_folding_filter(tokens: list[Token]) -> list[Token]:
    import unicodedata

    def fold(s: str) -> str:
        return "".join(
            c for c in unicodedata.normalize("NFKD", s) if not unicodedata.combining(c)
        )

    return [Token(fold(t.text), t.position, t.start_offset, t.end_offset) for t in tokens]


def make_length_filter(min_len: int, max_len: int) -> Callable[[list[Token]], list[Token]]:
    def length_filter(tokens: list[Token]) -> list[Token]:
        return [t for t in tokens if min_len <= len(t.text) <= max_len]

    return length_filter


def make_synonym_filter(
    synonyms: dict[str, Sequence[str]]
) -> Callable[[list[Token]], list[Token]]:
    """Flat (non-graph) synonym expansion: adds synonyms at the same position.

    Reference equivalent: SynonymV2GraphFilterFactory (server/analysis/).
    """

    def synonym_filter(tokens: list[Token]) -> list[Token]:
        out = []
        for t in tokens:
            out.append(t)
            for syn in synonyms.get(t.text, ()):
                out.append(Token(syn, t.position, t.start_offset, t.end_offset))
        return out

    return synonym_filter


def porter_stem_filter(tokens: list[Token]) -> list[Token]:
    from nrtsearch_tpu.analysis.porter import porter_stem

    return [Token(porter_stem(t.text), t.position, t.start_offset, t.end_offset) for t in tokens]


TOKEN_FILTERS: dict[str, Callable[[list[Token]], list[Token]]] = {
    "lowercase": lowercase_filter,
    "asciifolding": ascii_folding_filter,
    "stop": make_stop_filter(ENGLISH_STOP_WORDS),
    "porterstem": porter_stem_filter,
}

# ---------------------------------------------------------------------------
# Char filters
# ---------------------------------------------------------------------------


def html_strip_char_filter(text: str) -> str:
    return re.sub(r"<[^>]*>", " ", text)


CHAR_FILTERS: dict[str, Callable[[str], str]] = {
    "htmlStrip": html_strip_char_filter,
}

# ---------------------------------------------------------------------------
# Analyzer
# ---------------------------------------------------------------------------


@dataclass
class Analyzer:
    """char filters -> tokenizer -> token filters (analysis.proto:36-76)."""

    name: str
    tokenizer: Callable[[str], list[Token]] = standard_tokenizer
    char_filters: list[Callable[[str], str]] = field(default_factory=list)
    token_filters: list[Callable[[list[Token]], list[Token]]] = field(default_factory=list)

    def analyze(self, text: str) -> list[Token]:
        for cf in self.char_filters:
            text = cf(text)
        tokens = self.tokenizer(text)
        for tf in self.token_filters:
            tokens = tf(tokens)
        return tokens

    def terms(self, text: str) -> list[str]:
        return [t.text for t in self.analyze(text)]


def _predefined() -> dict[str, Analyzer]:
    return {
        "standard": Analyzer("standard", standard_tokenizer, [], [lowercase_filter]),
        "classic": Analyzer("classic", standard_tokenizer, [], [lowercase_filter]),
        "simple": Analyzer("simple", letter_tokenizer, [], [lowercase_filter]),
        "whitespace": Analyzer("whitespace", whitespace_tokenizer, [], []),
        "keyword": Analyzer("keyword", keyword_tokenizer, [], []),
        "stop": Analyzer(
            "stop", letter_tokenizer, [], [lowercase_filter, TOKEN_FILTERS["stop"]]
        ),
        "english": Analyzer(
            "english",
            standard_tokenizer,
            [],
            [lowercase_filter, TOKEN_FILTERS["stop"], porter_stem_filter],
        ),
    }


class AnalyzerRegistry:
    """Name -> Analyzer registry, plugin-extensible.

    Reference equivalent: AnalyzerCreator with AnalysisPlugin extensions.
    """

    def __init__(self) -> None:
        self._analyzers: dict[str, Analyzer] = _predefined()

    def get(self, name: str) -> Analyzer:
        try:
            return self._analyzers[name]
        except KeyError:
            raise KeyError(
                f"unknown analyzer {name!r}; known: {sorted(self._analyzers)}"
            ) from None

    def register(self, analyzer: Analyzer) -> None:
        self._analyzers[analyzer.name] = analyzer

    def from_custom(self, spec: dict) -> Analyzer:
        """Build a custom analyzer from a proto-shaped dict.

        Shape mirrors analysis.proto CustomAnalyzer: ``{"tokenizer": {"name":
        ...}, "tokenFilters": [{"name": ...}, ...], "charFilters": [...]}``.
        """
        tok_spec = spec.get("tokenizer", {"name": "standard"})
        tokenizer = TOKENIZERS[tok_spec.get("name", "standard")]
        char_filters = [CHAR_FILTERS[cf["name"]] for cf in spec.get("charFilters", [])]
        token_filters = []
        for tf in spec.get("tokenFilters", []):
            name = tf["name"]
            params = tf.get("params", {})
            if name == "stop" and "stopwords" in params:
                token_filters.append(make_stop_filter(params["stopwords"]))
            elif name == "length":
                token_filters.append(
                    make_length_filter(int(params.get("min", 0)), int(params.get("max", 1 << 30)))
                )
            elif name == "synonym":
                token_filters.append(make_synonym_filter(params.get("synonyms", {})))
            else:
                token_filters.append(TOKEN_FILTERS[name])
        return Analyzer(spec.get("name", "custom"), tokenizer, char_filters, token_filters)


_DEFAULT_REGISTRY = AnalyzerRegistry()


def get_analyzer(name: str) -> Analyzer:
    return _DEFAULT_REGISTRY.get(name)


def register_analyzer(analyzer: Analyzer) -> None:
    _DEFAULT_REGISTRY.register(analyzer)
