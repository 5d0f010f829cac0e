"""Text-analysis kernels for training-data curation: token counting, quality
ratios, n-gram language ID, and winnowing-style document fingerprints.

Formulas are chosen to be exactly reproducible in ANSI SQL (DuckDB) so the
driver's oracle can verify them value-for-value:
- ``n_tokens``  = count of ``[0-9A-Za-z_]+`` matches
- ``n_alpha/n_digit/n_upper/n_space`` = counts of the matching char classes
- ratios are float64 divisions of those integer counts (0 when n_chars = 0)
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

TOKEN_RE = r"[0-9A-Za-z_]+"

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was", "with", "are"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "pas", "une", "des", "dans", "pour", "que", "avec"},
    "es": {"el", "la", "los", "las", "y", "es", "no", "una", "del", "para", "que", "con"},
}


def quality_stats_frame(texts: pd.Series) -> pd.DataFrame:
    """Vectorized (pandas C str kernels) per-doc stats; see module docstring
    for the SQL-parity contract."""
    t = texts.fillna("")
    n_chars = t.str.len().astype("int64")
    n_tokens = t.str.count(TOKEN_RE).astype("int64")
    n_alpha = t.str.count(r"[A-Za-z]").astype("int64")
    n_digit = t.str.count(r"[0-9]").astype("int64")
    n_upper = t.str.count(r"[A-Z]").astype("int64")
    n_space = t.str.count(r"[ \t\n\r]").astype("int64")
    n_punct = n_chars - n_alpha - n_digit - n_space
    denom = n_chars.replace(0, 1).astype("float64")
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "n_alpha": n_alpha,
            "n_digit": n_digit,
            "n_punct": n_punct,
            "upper_ratio": n_upper / denom,
            "digit_ratio": n_digit / denom,
            "punct_ratio": n_punct / denom,
            "alpha_ratio": n_alpha / denom,
        }
    )


_word_re = re.compile(TOKEN_RE)


def lang_id_scores(text: str) -> str:
    """Tiny deterministic stopword-voting language ID (heuristic; 'unknown'
    when no stopword list reaches 2 hits). SQL twin: __ray_entry__
    _lang_id_sql (stopword join + windowed argmax, tie → alphabetically
    first language)."""
    toks = [w.lower() for w in _word_re.findall(text or "")]
    if not toks:
        return "unknown"
    best, best_hits = "unknown", 1
    for lang in sorted(_STOPWORDS):
        hits = sum(1 for w in toks if w in _STOPWORDS[lang])
        if hits > best_hits:
            best, best_hits = lang, hits
    return best


_FP_BASE = np.uint64(1099511628211)  # FNV-ish multiplier


def doc_fingerprint(text: str, k: int = 8, w: int = 4) -> int:
    """Winnowing fingerprint (Schleimer/Wilkerson/Aiken MOSS scheme): hash
    every k-char window with a polynomial rolling hash, select the minimum in
    each sliding window of ``w`` consecutive k-gram hashes, XOR-fold the
    selected picks into one int64 >= 0. Deterministic; any local edit perturbs
    the picks around it, so distinct content virtually always gets a distinct
    fingerprint; empty/short docs hash the whole text."""
    if not text:
        return 0
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(data)
    if n <= k:
        h = np.uint64(14695981039346656037)
        with np.errstate(over="ignore"):
            for b in data:
                h = (h ^ b) * _FP_BASE
        return int(h >> np.uint64(1))
    with np.errstate(over="ignore"):
        # rolling polynomial hash of every k-gram, fully vectorized:
        # h(i) = sum_j data[i+j] * BASE^(k-1-j)
        weights = np.empty(k, dtype=np.uint64)
        acc = np.uint64(1)
        for j in range(k - 1, -1, -1):
            weights[j] = acc
            acc = acc * _FP_BASE
        windows = np.lib.stride_tricks.sliding_window_view(data, k)
        hashes = (windows * weights).sum(axis=1, dtype=np.uint64)
        if len(hashes) <= w:
            picks = hashes
        else:
            picks = np.lib.stride_tricks.sliding_window_view(hashes, w).min(axis=1)
        # XOR-fold mixed picks: position-independent combine of the winnowed set
        mixed = (picks ^ (picks >> np.uint64(33))) * _FP_BASE
        return int(np.bitwise_xor.reduce(mixed) >> np.uint64(1))
