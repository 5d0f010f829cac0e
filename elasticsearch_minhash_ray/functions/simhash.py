"""SimHash (Charikar random-hyperplane sketch, 64-bit) — an alternative
near-dup sketch alongside the reference's MinHash (same token-stream input;
no reference counterpart, mandated by the training-data operator set).

Deterministic: token hash = the same Guava-compatible murmur3 h1 (seed 0)
used by the MinHash kernel, so signatures are stable across runs/machines.
"""

from __future__ import annotations

import numpy as np

from .murmur3 import hash_tokens_many_seeds, seeds_u64

_SEEDS = seeds_u64(0, 1)


def simhash64_docs(token_lists: list[list[str]]) -> np.ndarray:
    """64-bit simhash per doc, returned as uint64 (n_docs,).

    bit j of the signature = 1 iff sum over tokens (with multiplicity) of
    (+1 if bit j of murmur3(token) else -1) is > 0 (ties → 0).
    Empty docs → 0.
    """
    import pandas as pd

    n_docs = len(token_lists)
    out = np.zeros(n_docs, dtype=np.uint64)
    flat: list[str] = []
    bounds = [0]
    for toks in token_lists:
        flat.extend(toks)
        bounds.append(len(flat))
    if not flat:
        return out
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object), sort=False)
    h = hash_tokens_many_seeds(list(uniques), _SEEDS)[:, 0].view(np.uint64)  # (n_distinct,)
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int32)  # (n_distinct, 64)
    for d in range(n_docs):
        lo, hi = bounds[d], bounds[d + 1]
        if lo == hi:
            continue
        s = bits[codes[lo:hi]].sum(axis=0)
        m = hi - lo
        sig_bits = (2 * s > m).astype(np.uint64)
        out[d] = np.uint64((sig_bits << shifts).sum(dtype=np.uint64))
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distance between uint64 simhash arrays (vectorized
    SWAR popcount — same kernel as minhash.compare_pairs)."""
    from .minhash import popcount_u64_inplace

    x = (a ^ b).view(np.uint64)  # fresh temp — safe to destroy in place
    return popcount_u64_inplace(x).astype(np.int64)
