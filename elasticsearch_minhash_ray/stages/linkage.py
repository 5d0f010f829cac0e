"""Blocked record linkage: edit-distance near-match within blocking keys.

The classic entity-resolution / fuzzy-dedup primitive the MinHash family
can't express — MinHash/SimHash measure SET overlap, but "same record,
one typo" needs SEQUENCE distance. Blocking bounds the quadratic: pairs
are only formed within a cheap equality key (brand, domain, repo, length
bucket), the standard record-linkage decomposition.

Shape at scale: ONE exchange on the blocking key co-locates each block,
then per block a triu pair fan-out → length prefilter (|len(a)-len(b)| >
max_dist can never pass — the triangle-inequality bound) → ONE Levenshtein
DP vectorized ACROSS ALL surviving pairs (numpy; strings become fixed-width
UTF-32 codepoint matrices via a zero-copy ``.view(uint32)``, no per-row
Python encode). Cost O(Lmax² ) elementwise vector ops per block regardless
of pair count. A skewed blocking key (one brand = half the table) needs the
same cap/salt treatment as hot LSH buckets (stages/lsh.py bucket_cap); this
operator surfaces block sizes to the caller via the ``max_block_rows``
guard instead of silently going quadratic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..grouping import map_copartitioned


def _levenshtein_pairs(
    a_names: np.ndarray, b_names: np.ndarray
) -> np.ndarray:
    """Exact Levenshtein distance for each (a_names[i], b_names[i]) pair,
    vectorized across pairs: the DP iterates the (Lmax × Lmax) cell grid
    once, each cell an O(n_pairs) numpy op. The sequential left-neighbor
    (insertion) dependency is folded into a min-scan: since insertions cost
    +1 per column, ``cur[j] = min_{k<=j}(cand[k] + (j-k)) =
    j + cummin(cand - j)``."""
    n = len(a_names)
    if n == 0:
        return np.empty(0, np.int64)
    # numpy unicode arrays are fixed-width UTF-32 -> zero-copy codepoint grid
    a = np.asarray(a_names, dtype=np.str_)
    b = np.asarray(b_names, dtype=np.str_)
    la_max = a.dtype.itemsize // 4
    lb_max = b.dtype.itemsize // 4
    am = a.view(np.uint32).reshape(n, la_max) if la_max else np.zeros((n, 0), np.uint32)
    bm = b.view(np.uint32).reshape(n, lb_max) if lb_max else np.zeros((n, 0), np.uint32)
    la = (am != 0).sum(axis=1).astype(np.int64)
    lb = (bm != 0).sum(axis=1).astype(np.int64)
    ar = np.arange(lb_max + 1, dtype=np.int64)
    prev = np.broadcast_to(ar, (n, lb_max + 1)).copy()
    for i in range(1, la_max + 1):
        sub = prev[:, :-1] + (am[:, i - 1, None] != bm)
        cand = np.minimum(sub, prev[:, 1:] + 1)
        c = np.concatenate([np.full((n, 1), i, np.int64), cand], axis=1)
        c = ar + np.minimum.accumulate(c - ar, axis=1)
        np.copyto(prev, c, where=(la >= i)[:, None])  # freeze padded-A rows
    return prev[np.arange(n), lb]


def edit_distance_pairs(
    ds,
    id_col: str,
    name_col: str,
    block_col: str,
    *,
    max_dist: int = 2,
    max_block_rows: int = 100_000,
):
    """All within-block pairs with Levenshtein(name_a, name_b) <= max_dist.
    Returns (a, b, dist) with a < b by id. Null names compare as ''. A block
    larger than ``max_block_rows`` raises rather than going silently
    quadratic — re-block on a finer key (brand+length, domain+path prefix).
    """

    def pair_up(block: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": np.empty(0, np.int64),
                "b": np.empty(0, np.int64),
                "dist": np.empty(0, np.int64),
            }
        )
        if not len(block):
            return empty
        block = block.sort_values([block_col, id_col], kind="stable")
        ids = block[id_col].to_numpy(np.int64)
        names = block[name_col].fillna("").to_numpy()
        lens = block[name_col].fillna("").str.len().to_numpy(np.int64)
        codes = pd.factorize(block[block_col], use_na_sentinel=False)[0]
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        ends = np.r_[starts[1:], len(codes)]
        ai, bi = [], []
        for lo, hi in zip(starts, ends):
            m = hi - lo
            if m < 2:
                continue
            if m > max_block_rows:
                raise ValueError(
                    f"blocking key run of {m} rows exceeds max_block_rows="
                    f"{max_block_rows}; use a finer blocking key"
                )
            iu, ju = np.triu_indices(m, 1)
            ai.append(iu + lo)
            bi.append(ju + lo)
        if not ai:
            return empty
        ai = np.concatenate(ai)
        bi = np.concatenate(bi)
        keep = np.abs(lens[ai] - lens[bi]) <= max_dist  # triangle bound
        ai, bi = ai[keep], bi[keep]
        dist = _levenshtein_pairs(names[ai], names[bi])
        hit = dist <= max_dist
        ai, bi, dist = ai[hit], bi[hit], dist[hit]
        a, b = ids[ai], ids[bi]
        lo_id = np.minimum(a, b)
        hi_id = np.maximum(a, b)
        return pd.DataFrame({"a": lo_id, "b": hi_id, "dist": dist})

    return map_copartitioned(ds, block_col, pair_up, batch_format="pandas")
