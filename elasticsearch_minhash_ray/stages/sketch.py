"""Mergeable sketch operators (approximate distinct counts).

At 100 TB an exact per-group COUNT(DISTINCT x) must exchange every distinct
(group, x) pair; a HyperLogLog sketch exchanges one 2^p-byte register blob
per (group, block) regardless of cardinality — the standard trade when the
answer feeds a heuristic (dedup-rate dashboards, mixture sizing) rather than
an exact contract. Both forms live here:

- :func:`distinct_count_exact` — per-block distinct-pair combiner → ONE
  group-keyed exchange → exact counts (the oracle-checkable form; exchange
  rows ∝ distinct pairs).
- :func:`approx_distinct_hll` — per-(group, block) HLL registers → the same
  exchange carrying blobs → max-merge + bias-corrected estimate (Flajolet et
  al. 2007, with the linear-counting small-range correction). Deterministic:
  the value hash is splitmix64, the merge is an elementwise max.

Standard error ~1.04/sqrt(2^p): p=12 → 1.6% at 4 KB per (group, block).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..grouping import map_copartitioned


def _hash64(v: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hash of an int64/uint64 column (splitmix64
    finalizer — shared constant family with the bloom kernel). String
    columns should be pre-hashed (functions/murmur3) before sketching."""
    x = v.view(np.uint64) if v.dtype == np.int64 else v.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _hll_partial(batch: pd.DataFrame, by: str, value_col: str, p: int) -> pd.DataFrame:
    """Per-(group, block) register blobs: idx = top p hash bits, rho = leading
    zeros of the rest + 1, register = max(rho) — all vectorized."""
    m = 1 << p
    h = _hash64(batch[value_col].to_numpy())
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rho = leading zeros of w (capped at 64-p; the low p bits of w are the
    # zeros shifted in) + 1. Exact binary-search CLZ — float log2 rounds at
    # 53 bits and overcounts for w just below a power of two.
    nbits = 64 - p
    lz = np.zeros(len(w), np.uint8)
    x = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        top_zero = (x >> np.uint64(64 - s)) == 0
        lz[top_zero] += np.uint8(s)
        x[top_zero] <<= np.uint64(s)
    rho = (np.minimum(lz, nbits) + np.uint8(1)).astype(np.uint8)
    g = pd.DataFrame({"g": batch[by].to_numpy(), "i": idx, "r": rho})
    agg = g.groupby(["g", "i"], sort=False)["r"].max().reset_index()
    blobs, groups = [], []
    for grp, sub in agg.groupby("g", sort=False):
        reg = np.zeros(m, np.uint8)
        reg[sub["i"].to_numpy()] = sub["r"].to_numpy()
        groups.append(grp)
        blobs.append(reg.tobytes())
    return pd.DataFrame({by: groups, "hll": blobs})


def _hll_estimate(reg: np.ndarray) -> float:
    m = len(reg)
    alpha = 0.7213 / (1.0 + 1.079 / m)  # standard constant for m >= 128
    e = alpha * m * m / np.sum(np.ldexp(1.0, -reg.astype(np.int64)))
    if e <= 2.5 * m:
        v = int((reg == 0).sum())
        if v:
            e = m * np.log(m / v)  # linear counting
    return float(e)


def approx_distinct_hll(ds, by: str, value_col: str, p: int = 12, out_col: str = "approx_n"):
    """Approximate COUNT(DISTINCT value) GROUP BY `by` via mergeable HLL
    sketches; returns (by, out_col BIGINT estimate). Exchange traffic is one
    2^p-byte blob per (group, block)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({by: np.empty(0, object), "hll": np.empty(0, object)})
        return _hll_partial(batch, by, value_col, p)

    def merge(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return pd.DataFrame({by: np.empty(0, object), out_col: np.empty(0, np.int64)})
        groups, ests = [], []
        for grp, sub in block.groupby(by, sort=False):
            regs = np.stack([np.frombuffer(b, np.uint8) for b in sub["hll"]])
            reg = regs.max(axis=0)
            groups.append(grp)
            ests.append(int(round(_hll_estimate(reg))))
        return pd.DataFrame({by: groups, out_col: np.asarray(ests, np.int64)})

    pre = ds.map_batches(partial, batch_format="pandas")
    return map_copartitioned(pre, by, merge, batch_format="pandas")


def distinct_count_exact(ds, by: str, value_col: str, out_col: str = "n_distinct"):
    """Exact COUNT(DISTINCT value) GROUP BY `by`: per-block distinct-pair
    combiner → one group-keyed exchange → per-block distinct + size."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[[by, value_col]].drop_duplicates()

    def count(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return pd.DataFrame({by: np.empty(0, object), out_col: np.empty(0, np.int64)})
        g = (
            block.drop_duplicates()
            .groupby(by, sort=False)[value_col]
            .size()
            .reset_index(name=out_col)
        )
        g[out_col] = g[out_col].astype(np.int64)
        return g

    pre = ds.map_batches(partial, batch_format="pandas")
    return map_copartitioned(pre, by, count, batch_format="pandas")


def heavy_tokens_exact(
    ds,
    text_col: str = "text",
    phi_num: int = 1,
    phi_den: int = 1000,
    out_count: str = "cnt",
):
    """EXACT frequent-token mining (tokens with global frequency >=
    phi_num/phi_den of all token occurrences) without exchanging the
    vocabulary — the Misra-Gries-style two-pass shape:

    Pass A (combiner): per-block token counts, pruned by the PIGEONHOLE
    guarantee — any token with global share >= phi must have share >= phi in
    at least one block (if f_b < phi*n_b for every block, summing gives
    f < phi*n) — so the per-block survivors (<= phi_den per block) union to
    a complete candidate set. Driver pulls candidates + per-block totals:
    O(blocks * phi_den) rows, never the vocabulary.

    Pass B: broadcast the candidate set; count ONLY candidate tokens per
    block -> one tiny token-keyed exchange -> exact integer threshold
    (cnt * phi_den >= phi_num * n_total; no float comparison).

    Output is exactly SQL's GROUP BY token HAVING count * phi_den >=
    phi_num * total. Compare: the exact top-k form (`token_df_topk`)
    exchanges one row per distinct token per block; this exchanges only
    candidates — the right tool when the vocabulary is huge and phi is the
    contract."""
    import re

    import ray

    word_re = re.compile(r"[0-9A-Za-z_]+")

    def block_counts(batch: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        from collections import Counter

        c: Counter = Counter()
        for t in batch[text_col]:
            c.update(word_re.findall(t or ""))
        toks = np.asarray(list(c.keys()), object)
        cnts = np.fromiter(c.values(), np.int64, len(c))
        return toks, cnts

    def pass_a(batch: pd.DataFrame) -> pd.DataFrame:
        toks, cnts = block_counts(batch)
        n_b = int(cnts.sum())
        keep = cnts * phi_den >= phi_num * n_b
        return pd.DataFrame(
            {
                "token": np.r_[toks[keep], ["\x00__block_total__"]],
                "n_b": np.r_[np.zeros(int(keep.sum()), np.int64), [n_b]],
            }
        )

    # the candidate pull is O(blocks * phi_den) rows by the pigeonhole bound
    # — small by construction, the one intentional driver materialization
    cand_tbl = ds.map_batches(pass_a, batch_format="pandas").to_pandas()
    totals = cand_tbl["token"] == "\x00__block_total__"
    n_total = int(cand_tbl.loc[totals, "n_b"].sum())
    cand = np.unique(cand_tbl.loc[~totals, "token"].to_numpy())
    cand_ref = ray.put(cand)

    def pass_b(batch: pd.DataFrame) -> pd.DataFrame:
        cand_sorted = ray.get(cand_ref)
        toks, cnts = block_counts(batch)
        if not len(toks):
            return pd.DataFrame({"token": np.empty(0, object), out_count: np.empty(0, np.int64)})
        pos = np.searchsorted(cand_sorted, toks)
        pos[pos == len(cand_sorted)] = max(len(cand_sorted) - 1, 0)
        hit = cand_sorted[pos] == toks if len(cand_sorted) else np.zeros(len(toks), bool)
        return pd.DataFrame({"token": toks[hit], out_count: cnts[hit]})

    def final(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return pd.DataFrame({"token": np.empty(0, object), out_count: np.empty(0, np.int64)})
        g = block.groupby("token", as_index=False, sort=False)[out_count].sum()
        g = g[g[out_count] * phi_den >= phi_num * n_total]
        g[out_count] = g[out_count].astype(np.int64)
        return g

    pre = ds.map_batches(pass_b, batch_format="pandas")
    return map_copartitioned(pre, "token", final, batch_format="pandas")


def rolling_distinct(
    ds,
    key_col: str,
    ts_col: str,
    *,
    window_days: int = 7,
    out_col: str = "n_distinct",
):
    """Rolling-window distinct count: for each UTC day d, the number of
    distinct keys with at least one event in [d − window_days + 1, d] —
    the '7-day active users' analytic. COUNT(DISTINCT) over a sliding
    window does NOT decompose into per-day counts (a key active on 3 days
    of a window still counts once), so the operator works on distinct
    (day, key) PAIRS:

      combiner: per-block distinct (day, key) →
      key exchange: global distinct pairs per key block; each of a key's
        active days fans out to the ≤ window_days window-end days it
        contributes to, DEDUPED per key (np.unique over packed
        day×key runs) →
      tiny final reduce: count rows per window-end day.

    Exchange rows ∝ distinct (day, key) pairs (≤ events); fan-out rows ∝
    window_days × pairs before the in-block dedup. Only window-end days
    with ≥ 1 event day in range appear (matching a per-day GROUP BY twin
    over observed days)."""
    import pandas as pd

    DAY_US = 86_400_000_000

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[ts_col]
        tv = (
            t.to_numpy().astype("datetime64[us]").view("int64")
            if np.issubdtype(t.dtype, np.datetime64)
            else t.to_numpy(np.int64)
        )
        day = tv // DAY_US
        df = pd.DataFrame({"k": batch[key_col].to_numpy(np.int64), "d": day})
        return df.drop_duplicates()

    pre = ds.map_batches(pairs, batch_format="pandas")

    _empty = pd.DataFrame(
        {
            "d": np.empty(0, np.int64),
            "n": np.empty(0, np.int64),
            "obs": np.empty(0, np.int64),
        }
    )

    def fan_out(block: pd.DataFrame) -> pd.DataFrame:
        # co-partitioned on k: global (day, key) dedup is local here, and a
        # key's window contributions dedup inside the block
        if not len(block):
            return _empty
        block = block.drop_duplicates()
        k = block["k"].to_numpy(np.int64)
        d = block["d"].to_numpy(np.int64)
        off = np.arange(window_days, dtype=np.int64)
        wd = (d[:, None] + off[None, :]).ravel()  # window-end days covered
        wk = np.repeat(k, window_days)
        # dedup (key, window-end) pairs: pack into one int64 (days are
        # ~2e4 magnitude, keys int64 — pack via two-column drop_duplicates)
        dd = pd.DataFrame({"k": wk, "d": wd}).drop_duplicates()
        g = dd.groupby("d", as_index=False).size().rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        g["obs"] = np.int64(0)
        # marker rows: which days actually have events (the twin reports
        # only observed days, not every covered window-end day)
        mk = pd.DataFrame({"d": np.unique(d)})
        mk["n"] = np.int64(0)
        mk["obs"] = np.int64(1)
        return pd.concat([g[["d", "n", "obs"]], mk], ignore_index=True)

    from ..grouping import map_copartitioned

    partials = map_copartitioned(pre, "k", fan_out, batch_format="pandas")

    def final(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {"day": np.empty(0, object), out_col: np.empty(0, np.int64)}
            )
        g = batch.groupby("d", as_index=False).agg(n=("n", "sum"), obs=("obs", "sum"))
        g = g[g["obs"] > 0]  # only observed-event days (the twin groups by them)
        return pd.DataFrame(
            {
                "day": pd.to_datetime(
                    g["d"].to_numpy(np.int64) * DAY_US, unit="us", utc=True
                ).strftime("%Y-%m-%d"),
                out_col: g["n"].astype(np.int64),
            }
        )

    return partials.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )


# ---------------------------------------------------------------------------
# KLL-style mergeable quantile sketch
# ---------------------------------------------------------------------------

def _kll_compact(levels: list[np.ndarray], k: int, parity: list[int]) -> None:
    """In-place compaction: any level over capacity sorts, keeps every other
    element (alternating start parity per level — deterministic, the
    randomized coin of Karnin/Lang/Liberty 2016 replaced by a counter; the
    proven error bound becomes an empirical one, tested in pytest), and
    promotes the kept half to the next level (double weight)."""
    li = 0
    while li < len(levels):
        if len(levels[li]) > k:
            buf = np.sort(levels[li], kind="stable")
            while li >= len(parity):
                parity.append(0)
            p = parity[li] & 1
            # odd buffers leave ONE element at this level (end alternates
            # with parity) so total weight is conserved EXACTLY — n_rows
            # stays exact, only rank placement is approximate
            if len(buf) & 1:
                rest, leftover = (buf[1:], buf[:1]) if p else (buf[:-1], buf[-1:])
            else:
                rest, leftover = buf, buf[:0]
            keep = rest[p::2]
            parity[li] += 1
            levels[li] = leftover
            if li + 1 == len(levels):
                levels.append(keep)
            else:
                levels[li + 1] = np.concatenate([levels[li + 1], keep])
        li += 1


def _kll_from_values(vals: np.ndarray, k: int) -> list[np.ndarray]:
    levels = [vals.astype(np.int64, copy=False)]
    _kll_compact(levels, k, [])
    return levels


def _kll_serialize(levels: list[np.ndarray]) -> list[tuple[int, bytes]]:
    return [(li, lv.tobytes()) for li, lv in enumerate(levels) if len(lv)]


def approx_quantiles_kll(
    ds,
    col: str,
    by: str,
    *,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    k: int = 200,
):
    """Approximate per-group quantiles of an int column via mergeable
    KLL-style sketches — the sketch twin of :func:`~..text.column_quantiles`
    for when the per-group distinct-value count is NOT exchange-sized (high-
    cardinality doubles, latencies): exchange traffic is O(k·log(n/k)) ints
    per (group, block) regardless of distinct values.

    Level ℓ entries carry weight 2^ℓ; the final rank scan answers quantile q
    with the smallest value whose cumulative weight share ≥ q (the exact
    operator's definition, so the two agree as k → n). Deterministic for a
    fixed input partitioning (counter parity, no RNG); accuracy is empirical
    — the pytest contract pins max rank error at ~1/k scale against the
    exact operator. Null group/value rows drop (combiner convention).
    Output: (by, q, value, n_rows approx as BIGINT)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {by: pd.Series([], dtype=object),
             "level": pd.Series([], dtype=np.int64),
             "buf": pd.Series([], dtype=object),
             "n": pd.Series([], dtype=np.int64)}
        )
        batch = batch[batch[by].notna() & batch[col].notna()]
        if not len(batch):
            return empty
        rows = []
        for grp, sub in batch.groupby(by, sort=False):
            vals = sub[col].to_numpy(np.int64)
            for li, blob in _kll_serialize(_kll_from_values(vals, k)):
                rows.append((grp, li, blob, len(vals)))
        out = pd.DataFrame(rows, columns=[by, "level", "buf", "n"])
        return out.astype({"level": np.int64, "n": np.int64})

    qarr = np.asarray(qs, np.float64)

    def merge(block: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {by: pd.Series([], dtype=object),
             "q": pd.Series([], dtype=np.float64),
             "value": pd.Series([], dtype=np.int64),
             "n_rows": pd.Series([], dtype=np.int64)}
        )
        if not len(block):
            return empty
        frames = []
        for grp, sub in block.groupby(by, sort=False):
            max_lv = int(sub["level"].max())
            levels = [np.empty(0, np.int64) for _ in range(max_lv + 1)]
            for li, g in sub.groupby("level", sort=True):
                levels[int(li)] = np.concatenate(
                    [np.frombuffer(b, np.int64) for b in sorted(g["buf"])]
                )
            _kll_compact(levels, k, [])
            v = np.concatenate([lv for lv in levels if len(lv)])
            w = np.concatenate(
                [np.full(len(lv), 1 << li, np.int64)
                 for li, lv in enumerate(levels) if len(lv)]
            )
            o = np.argsort(v, kind="stable")
            v, w = v[o], w[o]
            cw = np.cumsum(w)
            tot = float(cw[-1])
            idx = np.minimum(
                np.searchsorted(cw / tot, qarr, side="left"), len(v) - 1
            )
            # n_rows = the sketch's total weight — EXACT (odd compactions
            # park their leftover element at the level, conserving weight)
            frames.append(pd.DataFrame(
                {by: grp, "q": qarr, "value": v[idx], "n_rows": int(cw[-1])}
            ))
        return pd.concat(frames, ignore_index=True)

    pre = ds.map_batches(partial, batch_format="pandas")
    return map_copartitioned(pre, by, merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# Misra-Gries heavy-hitter sketch
# ---------------------------------------------------------------------------

def _mg_compress(tokens: np.ndarray, counts: np.ndarray, k: int):
    """Bulk Misra-Gries reduction of exact (token, count) pairs to at most
    ``k`` counters: subtract the (k+1)-largest count from every counter and
    drop the non-positive — the classic decrement step applied in one
    vectorized shot. Returns (tokens, residual counts, err) where ``err``
    (the subtracted offset) bounds each survivor's undercount and each
    dropped token's uncounted mass."""
    if len(tokens) <= k:
        return tokens, counts, 0
    kth = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
    keep = counts > kth
    return tokens[keep], counts[keep] - kth, int(kth)


def approx_heavy_tokens_mg(
    ds,
    text_col: str = "text",
    *,
    k: int = 1000,
    phi_num: int = 1,
    phi_den: int = 1000,
):
    """Approximate frequent-token mining via mergeable Misra-Gries
    summaries — the ONE-pass sketch sibling of :func:`heavy_tokens_exact`
    (which re-reads the corpus for an exact recount): per block, exact
    token counts compress to <= k counters (:func:`_mg_compress`), the
    driver merges the O(blocks·k) summaries by token and compresses once
    more, and every token whose count lower bound + error upper bound
    clears phi·N is emitted.

    Guarantees (the MG classics, pytest-pinned): NO FALSE NEGATIVES —
    count_lo + err_ub >= true count >= count_lo, and the per-level
    subtracted offsets sum to err_ub <= N/k per merge layer — so any token
    with true share >= phi survives; reported counts may undercount by at
    most err_ub and light tokens may false-positive into the candidate
    list (their count_lo stays honest). Choose k >= a few × phi_den.
    Deterministic: ties at the (k+1)-th count keep strictly-greater
    counters only. Output: (token, count_lo, err_ub) sorted by count_lo
    desc then token."""
    import re

    word_re = re.compile(r"[0-9A-Za-z_]+")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"token": pd.Series([], dtype=object),
             "cnt": pd.Series([], dtype=np.int64),
             "err": pd.Series([], dtype=np.int64),
             "n": pd.Series([], dtype=np.int64)}
        )
        toks = batch[text_col].fillna("").str.findall(word_re)
        total = int(toks.str.len().sum())
        if total == 0:
            return empty
        from itertools import chain

        flat = np.fromiter(chain.from_iterable(toks), dtype=object, count=total)
        uniq, cnts = np.unique(flat, return_counts=True)
        t, c, err = _mg_compress(uniq, cnts.astype(np.int64), k)
        # one explicit MARKER row per summary carries the block's offset +
        # total (NUL-prefixed token no real token can collide with — the
        # heavy_tokens_exact block-total trick); counter rows carry zeros.
        # Recovering (err, n) from counter rows would undercount whenever
        # two blocks emit identical pairs.
        return pd.DataFrame(
            {"token": np.r_[t, ["\x00__mg_block__"]],
             "cnt": np.r_[c, [np.int64(0)]],
             "err": np.r_[np.zeros(len(t), np.int64), [np.int64(err)]],
             "n": np.r_[np.zeros(len(t), np.int64), [np.int64(total)]]}
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if not len(parts):
        return pd.DataFrame(
            {"token": pd.Series([], dtype=object),
             "count_lo": pd.Series([], dtype=np.int64),
             "err_ub": pd.Series([], dtype=np.int64)}
        )
    markers = parts["token"] == "\x00__mg_block__"
    err_layer0 = int(parts.loc[markers, "err"].sum())
    n_total = int(parts.loc[markers, "n"].sum())
    merged = (
        parts[~markers]
        .groupby("token", sort=False, as_index=False)["cnt"].sum()
    )
    t2, c2, err2 = _mg_compress(
        merged["token"].to_numpy(object), merged["cnt"].to_numpy(np.int64), k
    )
    err_ub = err_layer0 + err2
    hit = (c2 + err_ub) * phi_den >= phi_num * n_total
    out = pd.DataFrame(
        {"token": t2[hit], "count_lo": c2[hit],
         "err_ub": np.full(int(hit.sum()), err_ub, np.int64)}
    )
    return out.sort_values(
        ["count_lo", "token"], ascending=[False, True]
    ).reset_index(drop=True)
