"""Blocked record linkage: edit-distance near-match within blocking keys.

The classic entity-resolution / fuzzy-dedup primitive the MinHash family
can't express — MinHash/SimHash measure SET overlap, but "same record,
one typo" needs SEQUENCE distance. Blocking bounds the quadratic: pairs
are only formed within a cheap equality key (brand, domain, repo, length
bucket), the standard record-linkage decomposition.

Shape at scale: ONE exchange on the blocking key co-locates each block.
Per block the DP is quadratic in DISTINCT names, not rows: names factorize,
duplicate names collapse to a single comparison, candidates pass the
length-difference triangle prefilter (|len(a)-len(b)| > max_dist can never
match), and ONE Levenshtein DP runs vectorized ACROSS ALL surviving
distinct-name pairs (strings become fixed-width UTF-32 codepoint matrices
via a zero-copy ``.view(uint32)``, no per-row Python encode; O(Lmax²)
elementwise vector ops regardless of pair count). Matches then expand back
to id pairs with a div/mod cartesian expansion whose cost is proportional
to the OUTPUT, not the candidate space — measured 85 s → 1.5 s at sf0.1
(20k rows, 64 distinct names, 220k result pairs). A skewed blocking key
(one brand = half the table) needs the same cap/salt treatment as hot LSH
buckets (stages/lsh.py bucket_cap); the ``max_block_rows`` guard raises on
oversized distinct-name sets instead of silently going quadratic.
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
    Returns (a, b, dist) with a < b by id; identical names pair at dist 0.
    Null names compare as ''. A block run with more than ``max_block_rows``
    DISTINCT names raises rather than going silently quadratic — re-block
    on a finer key (brand+length, domain+path prefix)."""

    def _expand(gids, su, cu, sv, cv, dists, diag):
        """Vectorized cartesian expansion of matched distinct-name pairs to
        id pairs: pair k contributes cu[k]·cv[k] rows; per-row (i, j) local
        indices derive from the flat offset by div/mod — no Python loop over
        matched pairs. ``diag`` marks same-name (u == u) pairs, which keep
        only i < j (each unordered id pair once)."""
        rep = cu * cv
        total = int(rep.sum())
        if total == 0:
            return (np.empty(0, np.int64),) * 3
        pidx = np.repeat(np.arange(len(rep), dtype=np.int64), rep)
        cum = np.concatenate([[0], np.cumsum(rep)[:-1]])
        off = np.arange(total, dtype=np.int64) - cum[pidx]
        i_loc = off // cv[pidx]
        j_loc = off % cv[pidx]
        a = gids[su[pidx] + i_loc]
        b = gids[sv[pidx] + j_loc]
        d = dists[pidx]
        keep = ~diag[pidx] | (i_loc < j_loc)
        return a[keep], b[keep], d[keep]

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
        all_ids = block[id_col].to_numpy(np.int64)
        name_ser = block[name_col].fillna("")
        codes = pd.factorize(block[block_col], use_na_sentinel=False)[0]
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        ends = np.r_[starts[1:], len(codes)]
        out_a, out_b, out_d = [], [], []
        for lo, hi in zip(starts, ends):
            if hi - lo < 2:
                continue
            # the DP is quadratic in DISTINCT names, not rows: duplicate
            # names collapse to one DP each and expand back afterward
            ncodes, uniq = pd.factorize(name_ser.iloc[lo:hi], use_na_sentinel=False)
            D = len(uniq)
            if D > max_block_rows:
                raise ValueError(
                    f"blocking key run with {D} distinct names exceeds "
                    f"max_block_rows={max_block_rows}; use a finer blocking key"
                )
            order = np.argsort(ncodes, kind="stable")
            gids = all_ids[lo:hi][order]  # ids grouped by name code
            cnts = np.bincount(ncodes, minlength=D).astype(np.int64)
            gstart = np.concatenate([[0], np.cumsum(cnts)[:-1]])
            uniq = np.asarray(uniq, dtype=object)
            ulen = np.fromiter((len(s) for s in uniq), np.int64, D)
            # cross-name candidates: triangle length prefilter, then DP
            iu, ju = np.triu_indices(D, 1)
            pre = np.abs(ulen[iu] - ulen[ju]) <= max_dist
            iu, ju = iu[pre], ju[pre]
            dist = _levenshtein_pairs(uniq[iu], uniq[ju])
            hit = dist <= max_dist
            iu, ju, dist = iu[hit], ju[hit], dist[hit]
            # same-name groups pair at distance 0, no DP needed
            dg = np.flatnonzero(cnts >= 2)
            u = np.concatenate([iu, dg])
            v = np.concatenate([ju, dg])
            d = np.concatenate([dist, np.zeros(len(dg), np.int64)])
            diag = np.concatenate(
                [np.zeros(len(iu), bool), np.ones(len(dg), bool)]
            )
            a, b, dd = _expand(
                gids, gstart[u], cnts[u], gstart[v], cnts[v], d, diag
            )
            out_a.append(a)
            out_b.append(b)
            out_d.append(dd)
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        return pd.DataFrame(
            {
                "a": np.minimum(a, b),
                "b": np.maximum(a, b),
                "dist": np.concatenate(out_d),
            }
        )

    return map_copartitioned(ds, block_col, pair_up, batch_format="pandas")
