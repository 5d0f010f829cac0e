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


def lang_id_batch(texts: pd.Series) -> np.ndarray:
    """Vectorized batch twin of :func:`lang_id_scores` (identical winner
    semantics, pinned by test_lang_id_batch_matches_scalar): lowercase +
    findall run as pandas C kernels, stopword membership is ONE factorize of
    the batch's flat token array + set lookups over DISTINCT tokens only,
    per-doc hit counts come from bincount — no Python loop over rows."""
    from itertools import chain

    t = texts.fillna("").str.lower()
    toks = t.str.findall(TOKEN_RE)
    n_docs = len(toks)
    langs = sorted(_STOPWORDS)
    counts = np.fromiter((len(x) for x in toks), np.int64, n_docs)
    total = int(counts.sum())
    out = np.full(n_docs, "unknown", dtype=object)
    if total == 0:
        return out
    flat = np.fromiter(chain.from_iterable(toks), dtype=object, count=total)
    doc_idx = np.repeat(np.arange(n_docs), counts)
    codes, uniques = pd.factorize(flat, sort=False)
    hits = np.empty((n_docs, len(langs)), np.int64)
    for j, lang in enumerate(langs):
        stop = _STOPWORDS[lang]
        member = np.fromiter((u in stop for u in uniques), bool, len(uniques))
        hits[:, j] = np.bincount(doc_idx[member[codes]], minlength=n_docs)
    best = hits.max(axis=1)
    win = hits.argmax(axis=1)  # first max = alphabetically-first lang
    ok = best >= 2
    out[ok] = np.asarray(langs, dtype=object)[win[ok]]
    return out


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


def _xor_fold_by_doc(values: np.ndarray, doc: np.ndarray, n_docs: int) -> np.ndarray:
    """XOR-aggregate ``values`` by (sorted, nondecreasing) doc index."""
    out = np.zeros(n_docs, np.uint64)
    if len(values):
        starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
        out[doc[starts]] = np.bitwise_xor.reduceat(values, starts)
    return out


# Per-chunk byte budget for the flat fingerprint buffers. The kernel makes
# ~10 full passes over flat uint64 temporaries (~8 bytes per input byte each);
# capping a chunk at 256 KB of input keeps every temporary ~2 MB (L2/L3-hot)
# AND under glibc's mmap threshold, so malloc recycles the buffers between
# chunks. One whole-batch allocation goes to fresh mmap pages every call
# inside a Ray worker — measured 1.44 s cold vs 0.09 s chunked on 5k docs
# (first-touch page faults dominate), vs 0.43 s for the per-doc scalar loop.
_FP_CHUNK_BYTES = 256 << 10


def doc_fingerprint_batch(texts: pd.Series, k: int = 8, w: int = 4) -> np.ndarray:
    """Vectorized batch twin of :func:`doc_fingerprint` — bit-identical output
    (pinned by test_fingerprint_batch_matches_scalar). Concatenated uint8
    buffer per byte-bounded chunk (see _FP_CHUNK_BYTES); k-gram rolling hashes
    via Horner over the flat buffer with doc-boundary masking; winnowing
    minima via one sliding_window_view; XOR-folds via reduceat on the sorted
    doc index. The only per-doc Python work left is the utf-8 encode."""
    vals = texts.fillna("") if isinstance(texts, pd.Series) else [t or "" for t in texts]
    enc = [t.encode("utf-8") for t in vals]
    lens = np.fromiter((len(b) for b in enc), np.int64, len(enc))
    n_docs = len(enc)
    if n_docs == 0:
        return np.zeros(0, np.int64)
    # split on doc boundaries at ~_FP_CHUNK_BYTES of cumulative input
    chunk_id = np.cumsum(lens) // _FP_CHUNK_BYTES
    bounds = np.flatnonzero(np.r_[True, chunk_id[1:] != chunk_id[:-1]])
    bounds = np.r_[bounds, n_docs]
    out = np.empty(n_docs, np.int64)
    for s, e in zip(bounds[:-1], bounds[1:]):
        out[s:e] = _doc_fingerprint_chunk(enc[s:e], lens[s:e], k, w)
    return out


def _doc_fingerprint_chunk(enc: list, lens: np.ndarray, k: int, w: int) -> np.ndarray:
    out = np.zeros(len(enc), np.uint64)
    with np.errstate(over="ignore"):
        # --- short docs (1..k bytes): FNV-fold, vectorized ACROSS docs ---
        short = np.flatnonzero((lens > 0) & (lens <= k))
        if len(short):
            sflat = np.frombuffer(b"".join(enc[i] for i in short), np.uint8).astype(np.uint64)
            slens = lens[short]
            sstart = np.r_[0, np.cumsum(slens)][:-1]
            h = np.full(len(short), np.uint64(14695981039346656037))
            for j in range(int(slens.max())):
                live = slens > j
                h[live] = (h[live] ^ sflat[sstart[live] + j]) * _FP_BASE
            out[short] = h >> np.uint64(1)
        # --- long docs (> k bytes): flat window hashes + winnow + fold ---
        long = np.flatnonzero(lens > k)
        if len(long):
            flat = np.frombuffer(b"".join(enc[i] for i in long), np.uint8).astype(np.uint64)
            counts = lens[long]
            n = len(flat)
            m = n - k + 1
            doc_idx = np.repeat(np.arange(len(long)), counts)
            weights_msb = _FP_BASE  # Horner == sum_j byte[i+j] * BASE^(k-1-j)
            acc = np.zeros(m, np.uint64)
            for j in range(k):
                acc = acc * weights_msb + flat[j : m + j]
            valid = doc_idx[:m] == doc_idx[k - 1 : n]
            flat_h = acc[valid]
            h_doc = doc_idx[:m][valid]
            h_counts = counts - k + 1  # all >= 1 since counts > k
            mh = len(flat_h)
            fold = np.zeros(len(long), np.uint64)
            # docs with few windows (<= w): picks = every window hash
            few = h_counts[h_doc] <= w
            pf = flat_h[few]
            fold ^= _xor_fold_by_doc((pf ^ (pf >> np.uint64(33))) * _FP_BASE, h_doc[few], len(long))
            # docs with > w windows: picks = sliding min of width w
            if mh >= w:
                sw = np.lib.stride_tricks.sliding_window_view(flat_h, w).min(axis=1)
                dw = h_doc[: mh - w + 1]
                ok = (dw == h_doc[w - 1 : mh]) & (h_counts[dw] > w)
                ps = sw[ok]
                fold ^= _xor_fold_by_doc((ps ^ (ps >> np.uint64(33))) * _FP_BASE, dw[ok], len(long))
            out[long] = fold >> np.uint64(1)
    return out.view(np.int64)
