"""Per-key ordered-window analytics (LAG / rolling frames) — the analytic
functions a curation pipeline uses over event streams (inter-arrival gaps,
smoothed rates) that Ray Data has no native operator for.

Shape: ONE key-hash exchange (``map_copartitioned`` co-locates every row of a
key in one block), then a single in-block lexsort + vectorized shifted-array
arithmetic — never a per-group Python loop, never a global sort. The ordered
window lives entirely inside the partition, so shuffle traffic is one pass of
the projected columns regardless of window size.

Assumes each key's row mass fits a block (same per-key assumption as
``asof_join`` / sessionization — true for per-user event history; a key with
10^9 rows needs range-splitting by order-prefix first).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..grouping import map_copartitioned


def _order_int64(col: pd.Series) -> np.ndarray:
    """Order columns normalize to int64; timestamps pin to epoch-us first so
    nanosecond-coercing pandas/pyarrow combos can't shift frame boundaries
    (the stages/join.py _on_int64 lesson)."""
    if np.issubdtype(col.dtype, np.datetime64):
        return col.to_numpy().astype("datetime64[us]").view("int64")
    return col.to_numpy(np.int64)


def _group_pos(keys: np.ndarray) -> np.ndarray:
    """0-based position within each contiguous equal-key run."""
    n = len(keys)
    idx = np.arange(n, dtype=np.int64)
    new = np.r_[True, keys[1:] != keys[:-1]]
    starts = np.maximum.accumulate(np.where(new, idx, 0))
    return idx - starts


def lag_diff(
    ds,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    *,
    out_col: str = "gap",
    fill: int = -1,
    keep_cols: list[str] | None = None,
):
    """value - LAG(value) OVER (PARTITION BY key ORDER BY order_cols), as
    int64 (timestamps diff in epoch microseconds). The first row of each key
    gets ``fill`` (SQL's NULL, made hash-stable)."""
    keep = keep_cols or []

    def apply(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return pd.DataFrame(
                {
                    **{c: np.empty(0, np.int64) for c in [key_col, *keep]},
                    out_col: np.empty(0, np.int64),
                }
            )
        block = block.sort_values([key_col, *order_cols], kind="stable")
        k = block[key_col].to_numpy()
        v = _order_int64(block[value_col])
        d = np.empty(len(v), np.int64)
        d[0] = fill
        d[1:] = v[1:] - v[:-1]
        d[np.r_[True, k[1:] != k[:-1]]] = fill  # first row per key
        out = {key_col: k}
        for c in keep:
            out[c] = block[c].to_numpy()
        out[out_col] = d
        return pd.DataFrame(out)

    return map_copartitioned(ds, key_col, apply, batch_format="pandas")


def rolling_sum_cents(
    ds,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    *,
    window: int = 3,
    out_col: str = "roll_sum_cents",
    keep_cols: list[str] | None = None,
):
    """SUM(round(value*100)) + COUNT(*) OVER (PARTITION BY key ORDER BY
    order_cols ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW) — the
    BIT-EXACT rolling-frame formulation (int64 cents; the repo-wide standard
    for money-like doubles, see stages/sample.py zscore_by_group). The float
    :func:`rolling_mean` can diverge from a SQL engine by 1 ulp because
    windowed avg there may accumulate via a segment tree; integer sums
    cannot. Overflow bound: |cents| * window must fit int64."""
    keep = keep_cols or []

    def apply(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return pd.DataFrame(
                {
                    **{c: np.empty(0, np.int64) for c in [key_col, *keep]},
                    out_col: np.empty(0, np.int64),
                    "frame_n": np.empty(0, np.int64),
                }
            )
        block = block.sort_values([key_col, *order_cols], kind="stable")
        k = block[key_col].to_numpy()
        v = block[value_col].to_numpy(np.float64)
        # half-away-from-zero, matching SQL round()
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype(np.int64)
        pos = _group_pos(k)
        n = len(c)
        s = np.zeros(n, np.int64)
        for off in range(window):
            sh = np.zeros(n, np.int64)
            sh[off:] = c[: n - off] if off else c
            s += np.where(pos >= off, sh, 0)
        out = {key_col: k}
        for col in keep:
            out[col] = block[col].to_numpy()
        out[out_col] = s
        out["frame_n"] = np.minimum(pos + 1, window).astype(np.int64)
        return pd.DataFrame(out)

    return map_copartitioned(ds, key_col, apply, batch_format="pandas")


def debounce(
    ds,
    key_col: str,
    sub_col: str,
    ts_col: str,
    tiebreak_col: str,
    *,
    gap_us: int,
    keep_cols: list[str] | None = None,
):
    """Burst-collapse dedup over an event stream (the ingestion 'debounce'
    operator): within each (key, sub) stream ordered by (ts, tiebreak), KEEP
    a row iff it is the first of its stream or arrived strictly more than
    ``gap_us`` after the stream's immediately preceding event; drop the rest.
    Retries / double-fires / UI burst-clicks collapse to the burst head.

    Equivalent SQL: ``WHERE pts IS NULL OR ts - pts > gap`` over
    ``LAG(ts) OVER (PARTITION BY key, sub ORDER BY ts, tiebreak)``.

    Shape: ONE exchange on ``key_col`` only (each key's full history
    co-locates in one block; ``sub_col`` streams are separated by the
    in-block lexsort, so the exchange key stays low-skew even when sub
    cardinality is tiny). Exact-duplicate timestamps within a stream diff to
    0 <= gap and are dropped — dedup of exact event replays falls out for
    any gap_us >= 0.
    """
    keep = keep_cols or []
    out_cols = [key_col, sub_col, ts_col, tiebreak_col, *keep]

    def apply(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return block.reindex(columns=out_cols)
        block = block.sort_values(
            [key_col, sub_col, ts_col, tiebreak_col], kind="stable"
        )
        k = block[key_col].to_numpy()
        # factorize the sub stream so adjacent-inequality is an int compare,
        # not a per-element object compare
        s = pd.factorize(block[sub_col], use_na_sentinel=False)[0]
        ts = _order_int64(block[ts_col])
        new_stream = np.r_[True, (k[1:] != k[:-1]) | (s[1:] != s[:-1])]
        fresh = np.r_[True, (ts[1:] - ts[:-1]) > gap_us]
        return block.loc[new_stream | fresh, out_cols].reset_index(drop=True)

    return map_copartitioned(ds, key_col, apply, batch_format="pandas")


def ewma_by_key(
    ds,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    *,
    alpha: float,
    out_col: str = "ewma",
    keep_cols: list[str] | None = None,
):
    """Exponentially weighted moving average per key in event order —
    ``y_t = α·x_t + (1−α)·y_{t−1}`` (adjust=False), the standard smoothed-
    rate signal. The scan is inherently sequential per key, so this is the
    one ordered-key kernel NOT expressed as shifted-array arithmetic: after
    the usual ONE key exchange + in-block lexsort, pandas' grouped
    ``ewm(...).mean()`` runs the recurrence in its Cython kernel — no
    Python per-row work. Rows-only semantics (a SQL twin needs a recursive
    CTE whose float op order differs; the pytest contract pins the kernel
    against an explicit per-row reference loop instead). Output rounds to
    9dp."""
    keep = keep_cols or []

    def apply(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return pd.DataFrame(
                {
                    **{c: np.empty(0, np.int64) for c in [key_col, *keep]},
                    out_col: np.empty(0, np.float64),
                }
            )
        block = block.sort_values([key_col, *order_cols], kind="stable")
        e = (
            block.groupby(key_col, sort=False)[value_col]
            .ewm(alpha=alpha, adjust=False)
            .mean()
            .reset_index(drop=True)
        )
        out = {key_col: block[key_col].to_numpy()}
        for c in keep:
            out[c] = block[c].to_numpy()
        out[out_col] = np.round(e.to_numpy(np.float64), 9)
        return pd.DataFrame(out)

    return map_copartitioned(ds, key_col, apply, batch_format="pandas")


def interval_union(
    ds,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    *,
    dur_us: int,
):
    """Total covered time per key of the UNION of [ts, ts + dur) activity
    intervals — 'how long was each user actually active', where naive
    count·dur double-counts overlapping windows. The gaps-and-islands
    kernel: after ONE key exchange and an in-block lexsort, an island
    starts where the interval's start exceeds the running max end of all
    earlier intervals in its key; covered time = Σ (island max-end −
    island start). Segmented cummax/shift/group reductions are pandas C
    kernels (a pure-numpy segmented cummax would need per-key offsets that
    overflow int64 at epoch-us scale). Output: (key, active_us,
    n_islands)."""
    import pandas as pd

    from ..grouping import map_copartitioned

    def apply(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return pd.DataFrame(
                {key_col: np.empty(0, np.int64),
                 "active_us": np.empty(0, np.int64),
                 "n_islands": np.empty(0, np.int64)}
            )
        block = block.sort_values([key_col, ts_col, tiebreak_col], kind="stable")
        k = pd.Series(block[key_col].to_numpy())
        s = pd.Series(_order_int64(block[ts_col]))
        e = s + dur_us
        prev_max = e.groupby(k).cummax().groupby(k).shift(1)
        new_island = prev_max.isna() | (s > prev_max)
        gid = new_island.cumsum()  # global island id (keys are contiguous)
        g = pd.DataFrame({"k": k, "gid": gid, "s": s, "e": e}).groupby(
            "gid", sort=False
        ).agg(k=("k", "first"), st=("s", "first"), en=("e", "max"))
        out = g.assign(cov=g["en"] - g["st"]).groupby("k", sort=False).agg(
            active_us=("cov", "sum"), n_islands=("cov", "size")
        )
        out = out.reset_index().rename(columns={"k": key_col})
        return out.astype({"active_us": np.int64, "n_islands": np.int64})

    return map_copartitioned(ds, key_col, apply, batch_format="pandas")


def transition_counts(
    ds,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    state_col: str,
):
    """Markov transition counts over per-key ordered event streams: how
    often state A is immediately followed by state B within the same key —
    the behavioral-analytics / next-event-model input. ONE key exchange +
    in-block lexsort (the lag_diff shape) produces per-block (prev, next,
    cnt) partials via factorize + packed-pair bincount; a tiny final
    repartition(1) reduce sums them (output ∝ distinct state pairs, not
    events). First event per key has no predecessor and emits nothing."""
    import pandas as pd

    from ..grouping import map_copartitioned

    def pairs(block: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"prev_state": pd.Series([], dtype=object),
             "next_state": pd.Series([], dtype=object),
             "cnt": pd.Series([], dtype=np.int64)}
        )
        if not len(block):
            return empty
        block = block.sort_values([key_col, ts_col, tiebreak_col], kind="stable")
        k = block[key_col].to_numpy()
        codes, uniq = pd.factorize(block[state_col], use_na_sentinel=False)
        same = k[1:] == k[:-1]
        a, b = codes[:-1][same], codes[1:][same]
        if not len(a):
            return empty
        pair = a.astype(np.int64) * len(uniq) + b
        pu, pc = np.unique(pair, return_counts=True)
        uniq = np.asarray(uniq, dtype=object)
        return pd.DataFrame(
            {"prev_state": uniq[pu // len(uniq)],
             "next_state": uniq[pu % len(uniq)],
             "cnt": pc.astype(np.int64)}
        )

    partials = map_copartitioned(ds, key_col, pairs, batch_format="pandas")

    def reduce(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch
        return batch.groupby(
            ["prev_state", "next_state"], sort=False, as_index=False
        )["cnt"].sum()

    return partials.repartition(1).map_batches(
        reduce, batch_size=None, batch_format="pandas"
    )


def sessionize(
    ds,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    *,
    gap_us: int,
    keep_cols: list[str] | None = None,
    out_col: str = "session_seq",
):
    """Event-level session assignment: every row gets its key's 1-based
    session ordinal, where a new session starts at the key's first event or
    after a gap strictly greater than ``gap_us`` — the clickstream
    enrichment step (:func:`debounce` keeps only burst heads; this labels
    EVERY row so downstream aggregates can group by (key, session)).

    Equivalent SQL: a windowed running sum of the new-session flag,
    ``sum(is_new) OVER (PARTITION BY key ORDER BY ts, tiebreak ROWS
    UNBOUNDED PRECEDING)``. Same one-exchange shape as the other ordered
    per-key kernels here: in-block lexsort, vectorized gap flags, one
    cumsum with per-key rebasing (subtract the running total at each key's
    first row) — no per-group loop."""
    keep = keep_cols or []

    def apply(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return pd.DataFrame(
                {
                    **{c: np.empty(0, np.int64) for c in [key_col, tiebreak_col, *keep]},
                    out_col: np.empty(0, np.int64),
                }
            )
        block = block.sort_values([key_col, ts_col, tiebreak_col], kind="stable")
        k = block[key_col].to_numpy()
        ts = _order_int64(block[ts_col])
        new_key = np.r_[True, k[1:] != k[:-1]]
        is_new = new_key | np.r_[True, (ts[1:] - ts[:-1]) > gap_us]
        run = np.cumsum(is_new.astype(np.int64))
        # rebase so each key's first session is 1: subtract the running
        # total just BEFORE the key's first row
        idx = np.arange(len(k), dtype=np.int64)
        first = np.maximum.accumulate(np.where(new_key, idx, 0))
        seq = run - (run[first] - 1)
        out = {key_col: k, tiebreak_col: block[tiebreak_col].to_numpy()}
        for c in keep:
            out[c] = block[c].to_numpy()
        out[out_col] = seq
        return pd.DataFrame(out)

    return map_copartitioned(ds, key_col, apply, batch_format="pandas")


def rolling_mean(
    ds,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    *,
    window: int = 3,
    out_col: str = "roll_avg",
    ndigits: int = 9,
    keep_cols: list[str] | None = None,
):
    """AVG(value) OVER (PARTITION BY key ORDER BY order_cols ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW), rounded to ``ndigits``. The frame
    sum accumulates OLDEST -> NEWEST; note a SQL engine's windowed avg may
    still differ by 1 ulp (segment-tree accumulation) — measured 0.6% of
    rows vs DuckDB at round-9. For bit-exact cross-engine parity on
    money-like doubles use :func:`rolling_sum_cents`."""
    import pyarrow as pa
    import pyarrow.compute as pc

    keep = keep_cols or []

    def apply(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return pd.DataFrame(
                {
                    **{c: np.empty(0, np.int64) for c in [key_col, *keep]},
                    out_col: np.empty(0, np.float64),
                }
            )
        block = block.sort_values([key_col, *order_cols], kind="stable")
        k = block[key_col].to_numpy()
        v = block[value_col].to_numpy(np.float64)
        pos = _group_pos(k)
        n = len(v)
        # s[i] = ((v[i-w+1] + v[i-w+2]) + ...) + v[i], clipped at the group
        # start — build by adding shifts oldest-first so association matches
        s = np.zeros(n, np.float64)
        for off in range(window - 1, -1, -1):
            sh = np.zeros(n, np.float64)
            if off:
                sh[off:] = v[:-off]
            else:
                sh = v
            live = pos >= off
            s = np.where(live, s + sh, s)
        cnt = np.minimum(pos + 1, window).astype(np.float64)
        avg = pc.round(pa.array(s / cnt), ndigits=ndigits).to_numpy(zero_copy_only=False)
        out = {key_col: k}
        for c in keep:
            out[c] = block[c].to_numpy()
        out[out_col] = avg
        return pd.DataFrame(out)

    return map_copartitioned(ds, key_col, apply, batch_format="pandas")


def funnel_counts(
    ds,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    window_us: int,
):
    """Windowed funnel conversion (the sequence analytic behind
    view→click→purchase reports): a key converts step k iff there EXISTS a
    chain e1 < e2 < ... < ek with the step event types in order and every
    consecutive gap in (0, window_us]. Returns one (step, event_type,
    n_keys) row per step — n_keys monotonically non-increasing.

    Exactness note: greedy earliest-match funnels undercount (a later
    step-1 event can enable a chain the earliest one can't reach). This
    scan keeps ALL completion times per step: T1 = step-1 times,
    Tk = {t ∈ step-k times : ∃ s ∈ T(k-1), 0 < t−s ≤ W} — two
    searchsorted probes per level, exact for EXISTS semantics.

    Shape: the map projects to (key, ts, step_idx) rows and DROPS non-step
    events (the combiner prune — funnel steps are usually a small slice of
    the stream), then ONE key exchange; the per-key level scan is numpy
    searchsorted inside the block (the per-key loop is bounded by keys per
    block; each key's events sort once via the block lexsort). The final
    per-step count is a tiny fan-in reduce."""
    import pandas as pd

    step_idx = {s: i for i, s in enumerate(steps)}
    n_steps = len(steps)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[type_col].isin(step_idx).to_numpy()
        b = batch[m]
        return pd.DataFrame(
            {
                "k": b[key_col].to_numpy(np.int64),
                "t": _order_int64(b[ts_col]),
                "s": b[type_col].map(step_idx).to_numpy(np.int8),
            }
        )

    pro = ds.map_batches(project, batch_format="pandas")

    _empty = pd.DataFrame(
        {"step": np.empty(0, np.int64), "n_partial": np.empty(0, np.int64)}
    )

    def scan(block: pd.DataFrame) -> pd.DataFrame:
        # co-partitioned on k: every event of a key is in this block
        if not len(block):
            return _empty
        block = block.sort_values(["k", "t"], kind="stable")
        kv = block["k"].to_numpy(np.int64)
        tv = block["t"].to_numpy(np.int64)
        sv = block["s"].to_numpy(np.int8)
        starts = np.flatnonzero(np.r_[True, kv[1:] != kv[:-1]])
        ends = np.r_[starts[1:], len(kv)]
        reached = np.zeros(n_steps, np.int64)
        for lo, hi in zip(starts, ends):
            t, s = tv[lo:hi], sv[lo:hi]
            prev = t[s == 0]  # completion times of step 1 (sorted)
            level = 0
            while len(prev):
                reached[level] += 1
                level += 1
                if level >= n_steps:
                    break
                tk = t[s == level]
                hi_i = np.searchsorted(prev, tk, side="left")  # prev <  tk
                lo_i = np.searchsorted(prev, tk - window_us, side="left")
                prev = tk[hi_i > lo_i]  # ∃ prev in [tk−W, tk)
        nz = reached > 0
        return pd.DataFrame(
            {
                "step": np.arange(1, n_steps + 1, dtype=np.int64)[nz],
                "n_partial": reached[nz],
            }
        )

    from ..grouping import map_copartitioned

    partials = map_copartitioned(pro, "k", scan, batch_format="pandas")

    def final(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"step": np.arange(1, n_steps + 1, dtype=np.int64)})
        if len(batch):
            g = batch.groupby("step", as_index=False)["n_partial"].sum()
            out = out.merge(g, on="step", how="left")
            out["n_keys"] = out.pop("n_partial").fillna(0).astype(np.int64)
        else:
            out["n_keys"] = np.zeros(n_steps, np.int64)
        out["event_type"] = [steps[i] for i in range(n_steps)]
        return out[["step", "event_type", "n_keys"]]

    return partials.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )


def cohort_retention(
    ds,
    key_col: str,
    ts_col: str,
    *,
    retain_lo_us: int = 86_400_000_000,       # >= 1 day after first event
    retain_hi_us: int = 8 * 86_400_000_000,   # < 8 days after it
):
    """Cohort retention (the companion report to :func:`funnel_counts`):
    cohort = each key's FIRST event day (UTC); a key is retained iff it has
    any event with ``first + retain_lo_us <= ts < first + retain_hi_us``.
    Returns (cohort_day 'YYYY-MM-DD', n_keys, n_retained) rows.

    Shape: the map projects to (key, epoch_us) only; ONE key exchange; the
    per-block scan takes each key's min timestamp and two searchsorted
    probes for the retention window (events per key sort once via the block
    lexsort); per-cohort partials fan in to a tiny final reduce — exchange
    rows ∝ events, output ∝ distinct days."""
    import pandas as pd

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": batch[key_col].to_numpy(np.int64),
                "t": _order_int64(batch[ts_col]),
            }
        )

    pro = ds.map_batches(project, batch_format="pandas")

    _empty = pd.DataFrame(
        {
            "cohort_day": np.empty(0, object),
            "n_keys": np.empty(0, np.int64),
            "n_retained": np.empty(0, np.int64),
        }
    )

    def scan(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return _empty
        block = block.sort_values(["k", "t"], kind="stable")
        kv = block["k"].to_numpy(np.int64)
        tv = block["t"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, kv[1:] != kv[:-1]])
        ends = np.r_[starts[1:], len(kv)]
        first = tv[starts]  # per-key min ts (sorted within key)
        # retained iff any event in [first+lo, first+hi)
        lo_i = np.array(
            [np.searchsorted(tv[s:e], f + retain_lo_us, side="left")
             for s, e, f in zip(starts, ends, first)]
        )
        hi_i = np.array(
            [np.searchsorted(tv[s:e], f + retain_hi_us, side="left")
             for s, e, f in zip(starts, ends, first)]
        )
        retained = (hi_i > lo_i).astype(np.int64)
        day = pd.to_datetime(first, unit="us", utc=True).strftime("%Y-%m-%d")
        g = (
            pd.DataFrame({"cohort_day": day, "n_keys": 1, "n_retained": retained})
            .groupby("cohort_day", as_index=False)
            .sum()
        )
        return g.astype({"n_keys": np.int64, "n_retained": np.int64})

    from ..grouping import map_copartitioned

    partials = map_copartitioned(pro, "k", scan, batch_format="pandas")

    def final(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return _empty
        g = batch.groupby("cohort_day", as_index=False).sum()
        return g.astype({"n_keys": np.int64, "n_retained": np.int64})

    return partials.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )
