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
