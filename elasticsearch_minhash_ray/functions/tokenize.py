"""Tokenizers — the analyzer plug-point of the reference, re-expressed.

The reference does not hard-code a tokenizer: the analyzer chain is ES index
configuration with the ``minhash`` filter last (reference README.md:28-42,
MinHashTokenFilterFactory.java:47-49). The documented/tested default is the ES
``standard`` tokenizer (UAX#29 word segmentation, no lowercasing) — mirrored
faithfully by :mod:`.uax29` (Han/Hiragana per-char tokens, Katakana/Hangul
runs, mid-letter/mid-number joins, max_token_length=255), registered here as
``standard``. ``standard_regex`` keeps the previous ASCII-oriented regex
approximation (identical on ASCII, cheaper; NOT reference-faithful on CJK).

Tokenizers are pure functions ``str -> list[str]`` built once (compiled regex)
per actor via :func:`get_tokenizer`; an optional ``shingle(n)`` wrapper mirrors
the stock ES shingle filter commonly placed before ``minhash`` for w-shingling
source code.
"""

from __future__ import annotations

import re
from collections.abc import Callable

Tokenizer = Callable[[str], list[str]]

# ES standard tokenizer approximation: runs of word chars, keeping interior
# dots/apostrophes between letters together (example.com, it's → one token) —
# documented approximation of UAX#29, SURVEY.md §2.2.
_STANDARD_RE = re.compile(r"\w+(?:[.'’]\w+)*", re.UNICODE)
# plain word runs (used by the SQL-comparable text-stats ops: duckdb
# regexp_extract_all(text, '[0-9A-Za-z_]+') must match exactly)
_WORD_RE = re.compile(r"[0-9A-Za-z_]+")
# source-code tokenizer: identifiers, numbers, or single operator/punct chars
_CODE_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|\d+(?:\.\d+)?|[^\sA-Za-z0-9_]")
_WS_RE = re.compile(r"\S+")


def tokenize_standard(text: str) -> list[str]:
    """ES/Lucene ``standard`` tokenizer: UAX#29 word segmentation (see uax29.py)."""
    from .uax29 import tokenize_uax29

    return tokenize_uax29(text)


def tokenize_standard_regex(text: str) -> list[str]:
    return _STANDARD_RE.findall(text)


def tokenize_whitespace(text: str) -> list[str]:
    return _WS_RE.findall(text)


def tokenize_words(text: str) -> list[str]:
    return _WORD_RE.findall(text)


def tokenize_code(text: str) -> list[str]:
    return _CODE_RE.findall(text)


_REGISTRY: dict[str, Tokenizer] = {
    "standard": tokenize_standard,
    "standard_regex": tokenize_standard_regex,
    "whitespace": tokenize_whitespace,
    "words": tokenize_words,
    "code": tokenize_code,
}


def shingle(tokens: list[str], n: int) -> list[str]:
    """w-shingles joined with a single space (ES shingle filter default sep).
    Documents shorter than n tokens yield one shingle of all their tokens."""
    if n <= 1:
        return tokens[:]
    if not tokens:
        return []
    if len(tokens) < n:
        return [" ".join(tokens)]
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


# ---------------------------------------------------------------------------
# analyzer-chain filters (reference README.md:28-42: "You are free to change
# tokenizer/char_filter/filter settings, but the minhash filter needs to be
# added as a last filter") — the common stock ES/Lucene members, applied
# char_filters -> tokenizer -> token filters -> shingle -> minhash.
# ---------------------------------------------------------------------------

# Lucene ENGLISH_STOP_WORDS_SET (EnglishAnalyzer.getDefaultStopSet — public)
_EN_STOP = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)
_HTML_TAG_RE = re.compile(r"<[^>]*>")


def _fold_ascii(text: str) -> str:
    """asciifolding approximation: NFKD-decompose + drop combining marks
    (covers the Latin diacritics Lucene's table handles; documented subset)."""
    import unicodedata

    norm = unicodedata.normalize("NFKD", text)
    return "".join(c for c in norm if not unicodedata.combining(c))


_CHAR_FILTERS: dict[str, Callable[[str], str]] = {
    # Lucene HTMLStripCharFilter approximation: unescape entities, tags → space
    "html_strip": lambda t: _HTML_TAG_RE.sub(" ", __import__("html").unescape(t)),
    "asciifolding": _fold_ascii,
}

_TOKEN_FILTERS: dict[str, Callable[[list[str]], list[str]]] = {
    "lowercase": lambda toks: [t.lower() for t in toks],
    "uppercase": lambda toks: [t.upper() for t in toks],
    "asciifolding": lambda toks: [_fold_ascii(t) for t in toks],
    # ES stop filter: exact (case-sensitive) match, default English set;
    # standard chains place lowercase before stop
    "stop": lambda toks: [t for t in toks if t not in _EN_STOP],
    "trim": lambda toks: [t.strip() for t in toks],
    # Lucene LengthFilter-ish guard used by curation chains
    "length": lambda toks: [t for t in toks if 1 <= len(t) <= 255],
}


def resolve_filters(char_filters=(), filters=()):
    """Validate filter names early (once per actor, not per batch)."""
    try:
        cfs = [_CHAR_FILTERS[n] for n in char_filters]
    except KeyError as e:
        raise ValueError(f"unknown char_filter {e.args[0]!r}; known: {sorted(_CHAR_FILTERS)}") from None
    try:
        tfs = [_TOKEN_FILTERS[n] for n in filters]
    except KeyError as e:
        raise ValueError(f"unknown token filter {e.args[0]!r}; known: {sorted(_TOKEN_FILTERS)}") from None
    return cfs, tfs


def get_tokenizer(name: str, shingle_n: int = 1, char_filters=(), filters=()) -> Tokenizer:
    try:
        base = _REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown tokenizer {name!r}; known: {sorted(_REGISTRY)}") from None
    cfs, tfs = resolve_filters(char_filters, filters)

    def run(text: str) -> list[str]:
        for cf in cfs:
            text = cf(text)
        toks = base(text)
        for tf in tfs:
            toks = tf(toks)
        return shingle(toks, shingle_n) if shingle_n > 1 else toks

    if not cfs and not tfs:
        return base if shingle_n <= 1 else (lambda text: shingle(base(text), shingle_n))
    return run


def get_batch_tokenizer(name: str, shingle_n: int = 1, char_filters=(), filters=()):
    """list[str|None] -> list[list[str]] batch tokenizer (None/empty → []).

    The ``standard`` tokenizer gets the vectorized whole-batch UAX#29 path
    (one codepoint array per batch — the hot-path form for map_batches
    stages); others map the per-doc function. Optional analyzer-chain filters
    run char_filters → tokenize → token filters → shingle (resolved once
    here, i.e. once per actor)."""
    cfs, tfs = resolve_filters(char_filters, filters)
    if name == "standard":
        from .uax29 import tokenize_uax29_many

        base_many = tokenize_uax29_many
    else:
        base = get_tokenizer(name)  # raises on unknown name
        base_many = lambda texts: [base(t) if t else [] for t in texts]  # noqa: E731

    def run_many(texts):
        if cfs:
            texts = [t and _apply_char_filters(t, cfs) for t in texts]
        out = base_many(texts)
        if tfs:
            for tf in tfs:
                out = [tf(toks) for toks in out]
        if shingle_n > 1:
            out = [shingle(toks, shingle_n) for toks in out]
        return out

    if not cfs and not tfs:
        if shingle_n <= 1:
            return base_many
        return lambda texts: [shingle(toks, shingle_n) for toks in base_many(texts)]
    return run_many


def _apply_char_filters(text: str, cfs) -> str:
    for cf in cfs:
        text = cf(text)
    return text
