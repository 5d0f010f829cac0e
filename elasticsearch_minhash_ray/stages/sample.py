"""Deterministic row selection & scoring primitives: hash sampling,
domain mixing, grouped top-k ranking, per-group z-score scaling.

The common thread is ORACLE-EXACT determinism — every operator's arithmetic
is chosen so a DuckDB SQL twin reproduces it bit-for-bit (integer hash
buckets, integer mixing rates, explicit tiebreaks, integer-cents stats).

Training-data pipelines sample by a HASH of a stable key, not by RNG state:
the decision for a row never depends on partitioning, ordering, resharding or
resume, so a re-run (or an incremental run over a grown corpus) keeps exactly
the same rows. Knuth multiplicative hash over the key, bucketed 0..99; a row
survives iff its bucket < its stratum's percentage.

The arithmetic is chosen to be exactly reproducible in SQL (DuckDB BIGINT has
no wraparound, so the product must stay < 2^63: key * 2654435761 holds for
keys < ~3.5e9; for wider keys pre-fold with % 2**32 first — both sides the
same way).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_KNUTH = 2654435761  # 2^32 / golden ratio


_KEY_MAX = (2**63 - 1) // _KNUTH  # product must fit SQL BIGINT (no wraparound)


def _hash32(keys: np.ndarray, salt: int, caller: str) -> np.ndarray:
    """``((key + salt) * 2654435761) % 2^32`` with the shared SQL-mirror
    range guard — the single home of the Knuth arithmetic used by
    :func:`hash_bucket` and :func:`hash_sample_n`.

    Keys+salt must be in [0, 2^63/2654435761): numpy's % is floored while
    SQL's follows the dividend sign, so negatives would silently diverge
    from the oracle, and larger keys would wrap in numpy where SQL errors —
    both are rejected rather than mis-sampled. For wider key spaces
    pre-fold with ``% 2**32`` on BOTH sides."""
    k = keys.astype(np.int64) + np.int64(salt)
    if len(k) and (k.min() < 0 or k.max() > _KEY_MAX):
        raise ValueError(
            f"{caller} keys+salt must be in [0, {_KEY_MAX}] to mirror SQL "
            "BIGINT arithmetic exactly; pre-fold wider keys with % 2**32"
        )
    return (k * np.int64(_KNUTH)) % np.int64(4294967296)


def hash_bucket(keys: np.ndarray, salt: int = 0) -> np.ndarray:
    """Bucket 0..99 per key; int64 arithmetic mirrors the SQL expression
    ``((key + salt) * 2654435761) % 4294967296 % 100`` exactly (see
    :func:`_hash32` for the key-domain contract)."""
    return _hash32(keys, salt, "hash_bucket") % np.int64(100)


def hash_sample(
    ds, key_col: str, pct, strata_col: str | None = None, salt: int = 0, default_pct: int = 0
):
    """Keep ~pct% of rows, decided per row by :func:`hash_bucket` of
    ``key_col``. ``pct`` is either a number (uniform) or a dict
    ``{stratum value: pct}`` applied over ``strata_col``; strata not in the
    dict get ``default_pct``. Stateless map_batches filter: streams,
    shuffles nothing, and is stable under resharding/resume."""
    if isinstance(pct, dict) and strata_col is None:
        raise ValueError("per-stratum pct requires strata_col")

    def pick(batch: pa.Table) -> pa.Table:
        col = batch[key_col]
        if col.null_count:
            # SQL NULL arithmetic makes NULL-key rows fail the < comparison —
            # drop them the same way instead of hashing a garbage sentinel
            import pyarrow.compute as pc

            batch = batch.filter(pc.is_valid(col))
        keys = np.asarray(batch[key_col], dtype=np.int64)
        b = hash_bucket(keys, salt)
        if isinstance(pct, dict):
            strata = batch[strata_col].to_pylist()
            limit = np.fromiter((pct.get(s, default_pct) for s in strata), np.int64, len(strata))
        else:
            limit = np.int64(pct)
        return batch.filter(pa.array(b < limit))

    return ds.map_batches(pick, batch_format="pyarrow")


def mix_to_weights(
    ds,
    weights: dict[str, int],
    key_col: str = "doc_id",
    source_col: str = "source",
    salt: int = 0,
):
    """Domain-mixing resampler: subsample each source so the OUTPUT
    composition approximates integer target ``weights``, keeping as much
    data as possible (the binding source — the one that runs out first at
    its target share — keeps 100%).

    The derivation is INTEGER-exact so a SQL twin reproduces it bit-for-bit
    (no float rates): with per-source counts ``c_s`` and weights ``w_s``,

    - binding source b minimizes ``(c_s * 10^6) // w_s`` (ties: source asc);
    - ``pct_s = min(100, (100 * w_s * c_b) // (w_b * c_s))`` — BIGINT-safe
      for counts up to ~10^15;
    - keep a row iff :func:`hash_bucket`(key) < pct_s (deterministic,
      reshard/resume-stable). Sources not in ``weights`` are dropped.

    Dataflow: one combiner-sized count aggregate (rows ∝ sources × blocks),
    pcts derived on the driver (a ≤ |sources| dict in the filter closure),
    then one streaming stateless filter — nothing corpus-sized moves.

    The 100-bucket hash granularity means realized shares deviate from the
    target by up to ~1% of a source; callers needing finer control can scale
    the bucket space (both sides of the oracle the same way).

    NOTE: ``ds`` executes twice — once for the count aggregate, once for
    the filter. Cheap for parquet-read inputs (pruned re-read, the
    line_dedup_global rationale); materialize first when ``ds`` is the
    output of an expensive pipeline."""
    import pandas as pd

    bad = {s: w for s, w in weights.items() if int(w) != w or w <= 0}
    if bad:
        raise ValueError(f"weights must be positive integers, got {bad}")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.groupby(source_col, sort=False, as_index=False).size()
        return out.rename(columns={"size": "cnt"})

    counts = ds.map_batches(partial, batch_format="pandas").groupby(source_col).sum("cnt").to_pandas()
    ccol = "sum(cnt)" if "sum(cnt)" in counts.columns else "cnt"
    c = dict(zip(counts[source_col], counts[ccol].astype(int)))
    present = sorted(s for s in weights if c.get(s, 0) > 0)
    if not present:
        return hash_sample(ds, key_col, {}, strata_col=source_col, salt=salt, default_pct=0)
    b = min(present, key=lambda s: ((c[s] * 10**6) // weights[s], s))
    pct = {
        s: min(100, (100 * weights[s] * c[b]) // (weights[b] * c[s])) for s in present
    }
    return hash_sample(ds, key_col, pct, strata_col=source_col, salt=salt, default_pct=0)


def topk_per_group(ds, by: str, order_col: str, k: int, tiebreak: str | None = None):
    """Top-``k`` rows per group by ``order_col`` desc — the windowed-ranking
    primitive (`row_number() OVER (PARTITION BY by ORDER BY order_col DESC)
    <= k`). One ``by``-keyed exchange (:func:`~..grouping.map_copartitioned`)
    then a vectorized per-block sort + ``groupby.head`` — rows of a group
    are co-located so no global sort of the full table is needed.

    Determinism: ties on ``order_col`` are broken by ``tiebreak`` asc
    (required when ``order_col`` values can repeat within a group — an
    engine-defined pick cannot match an oracle twin).

    Combiner: the same pick runs per INPUT block first — a group's global
    top-k is a subset of the union of its per-block top-k's — so the
    exchange carries ≤ k rows per (group, block), not the full table
    (measured sf0.1, 1M events / 1.5k users: 1.23 s → 0.52 s warm).

    Null ``by`` keys are DROPPED (explicitly — the hash_sample null
    convention; note SQL ``PARTITION BY`` would instead rank NULLs as
    their own group, so filter nulls on the oracle side too when they can
    occur)."""
    import pandas as pd

    order_cols = [by, order_col] + ([tiebreak] if tiebreak else [])
    asc = [True, False] + ([True] if tiebreak else [])

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch[by].notna()]
        if not len(batch):
            return batch
        batch = batch.sort_values(order_cols, ascending=asc, kind="mergesort")
        return batch.groupby(by, sort=False).head(k).reset_index(drop=True)

    from ..grouping import map_copartitioned

    return map_copartitioned(
        ds.map_batches(pick, batch_format="pandas"), by, pick, batch_format="pandas"
    )


def pivot_counts(ds, key_col: str, pivot_col: str, values: list[str]):
    """Long→wide pivot: one row per key with a count column per listed
    ``pivot_col`` value (``n_<value>``) plus ``n_other`` for the rest — the
    per-entity feature vector an activity table feeds to a model.

    ``values`` is EXPLICIT (Spark's ``pivot(col, values)`` one-pass form):
    naming the columns up front keeps the operator single-pass and the
    output schema static; discovering them would cost a distinct-scan
    barrier first. Combiner shape: per block, keys factorize and counts
    accumulate into a dense (keys × values+1) int64 grid via one
    ``np.add.at`` scatter (partial rows ∝ distinct keys per block, never
    events) → one key exchange → per-block column sums. Null pivot values
    count as 'other'; null keys are dropped (the combiner groupby
    convention)."""
    import pandas as pd

    from ..grouping import map_copartitioned

    vmap = {v: i for i, v in enumerate(values)}
    out_cols = [f"n_{v}" for v in values] + ["n_other"]
    m = len(values) + 1

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch[key_col].notna()]
        if not len(batch):
            return pd.DataFrame(
                {key_col: np.empty(0, np.int64),
                 **{c: np.empty(0, np.int64) for c in out_cols}}
            )
        keys, uniq = pd.factorize(batch[key_col], use_na_sentinel=False)
        t = batch[pivot_col].map(vmap).fillna(len(values)).to_numpy(np.int64)
        grid = np.zeros((len(uniq), m), np.int64)
        np.add.at(grid, (keys, t), 1)
        out = {key_col: np.asarray(uniq)}
        for j, c in enumerate(out_cols):
            out[c] = grid[:, j]
        return pd.DataFrame(out)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch
        return batch.groupby(key_col, sort=False, as_index=False)[out_cols].sum()

    return map_copartitioned(
        ds.map_batches(partial, batch_format="pandas"),
        key_col,
        finish,
        batch_format="pandas",
    )


def zscore_by_group(ds, value_col: str, by: str, id_col: str):
    """Per-group z-score normalization (population std) — the standard
    feature-scaling op, engineered for EXACT cross-engine determinism:
    values are first fixed to integer cents (``round(value*100)``), group
    statistics (count, sum, sum-of-squares) are exact BIGINTs, and the
    z-score is derived from those integers with an identical IEEE operation
    order on both engines — no float-summation-order divergence, so the
    oracle matches bit-for-bit, not just to a tolerance.

    Dataflow: combiner-sized stats aggregate (3 ints per group per block) →
    tiny driver dict in the score closure → streaming map. Zero-variance
    groups score 0.0. NOTE: ``ds`` executes twice (stats pass + score
    pass) — cheap for parquet reads, materialize first otherwise.

    Contract limits: rows with a null group key OR null value are DROPPED
    in both passes (the hash_sample null convention; the SQL twin filters
    the same way). Cents rounding is half-AWAY-from-zero to match SQL
    ``round()`` (numpy's default np.round is half-even and would diverge
    on exact sub-cent .5 ties); the floor(|x|+0.5) formulation shares the
    pathological-double caveat of that classic idiom. sumsq stays inside
    BIGINT for |cents| ≤ ~3e4 over ≤ ~1e10 rows (9e8 × 1e10 ≈ int64 max;
    DuckDB promotes to HUGEINT, so overflow here would be a SILENT
    divergence — shard the stats pass or widen cents beyond that)."""
    import pandas as pd

    def cents(v: np.ndarray) -> np.ndarray:
        # half-away-from-zero, matching SQL round()
        return (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype(np.int64)

    def drop_nulls(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch[by].notna() & batch[value_col].notna()]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = drop_nulls(batch)
        c = cents(batch[value_col].to_numpy(np.float64))
        g = pd.DataFrame({by: batch[by], "c": c, "cc": c * c})
        out = g.groupby(by, sort=False).agg(
            n=("c", "size"), s=("c", "sum"), ss=("cc", "sum")
        )
        return out.reset_index()

    # the stats table is pulled to the driver for the broadcast REGARDLESS,
    # so a Ray groupby exchange before the pull is a pure sort-barrier tax
    # (same measured ~1.7 s fixed cost as cume_dist_by_group's histogram);
    # coalesce + second-level combine keeps the pull ∝ groups × 8, never
    # ∝ input blocks
    def second_level(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(by, sort=False, as_index=False)[["n", "s", "ss"]].sum()

    stats = (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(8)
        .map_batches(second_level, batch_format="pandas")
        .to_pandas()
        .groupby(by, as_index=False)[["n", "s", "ss"]]
        .sum()
    )
    cols = {c.replace("sum(", "").rstrip(")"): c for c in stats.columns}
    n_map, s_map, ss_map = {}, {}, {}
    for _, row in stats.iterrows():
        g = row[by]
        n_map[g] = int(row[cols.get("n", "n")])
        s_map[g] = int(row[cols.get("s", "s")])
        ss_map[g] = int(row[cols.get("ss", "ss")])

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        batch = drop_nulls(batch)
        c = cents(batch[value_col].to_numpy(np.float64)).astype(np.float64)
        gb = batch[by]
        n = gb.map(n_map).to_numpy(np.float64)
        s = gb.map(s_map).to_numpy(np.float64)
        ss = gb.map(ss_map).to_numpy(np.float64)
        # operation ORDER mirrors the SQL twin exactly: m = s/n;
        # var = ss/n - m*m; z = (c - m)/sqrt(var)
        m = s / n
        var = ss / n - m * m
        z = np.zeros(len(c), np.float64)
        pos = var > 0
        z[pos] = np.round((c[pos] - m[pos]) / np.sqrt(var[pos]), 9)
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy(np.int64), by: batch[by], "z": z}
        )

    return ds.map_batches(score, batch_format="pandas")


def hash_sample_n(ds, key_col: str, n: int, salt: int = 0):
    """EXACT-size deterministic sample: the ``n`` rows with the smallest
    ``(hash(key), key)`` — the fixed-budget companion to the pct-based
    :func:`hash_sample` ("give me exactly 100k eval docs, reproducibly").
    Membership is stable under resharding/resume and monotone under corpus
    growth only at the margin (a grown corpus can only displace rows near
    the hash boundary).

    Combiner shape: each block keeps its own n smallest (rows ≤ n per
    block) before a tiny sort+limit over ≤ n × blocks rows — the full
    table never sorts. Same SQL-exact Knuth arithmetic as hash_bucket
    (:func:`_hash32`; full 32-bit hash, not the 100-bucket projection);
    ties broken by key asc. Pure-arrow block handling: null keys are
    filtered in pyarrow BEFORE any conversion, so null-bearing int64
    key/payload columns never coerce through pandas float64 (exact above
    2^53 — this repo's doc_key regime)."""

    def local_topn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.is_valid(batch[key_col]))
        if not batch.num_rows:
            return batch.append_column("_hkey", pa.array([], pa.int64()))
        keys = np.asarray(batch[key_col], dtype=np.int64)
        hk = _hash32(keys, salt, "hash_sample_n")
        if batch.num_rows > n:
            idx = np.lexsort((keys, hk))[:n]
            batch = batch.take(pa.array(idx, pa.int64()))
            hk = hk[idx]
        return batch.append_column("_hkey", pa.array(hk, pa.int64()))

    return (
        ds.map_batches(local_topn, batch_format="pyarrow")
        .sort(["_hkey", key_col])
        .limit(n)
        .drop_columns(["_hkey"])
    )


def corr_by_group(
    ds,
    x_col: str,
    y_col: str,
    by: str,
    *,
    x_scale: float = 1.0,
    y_scale: float = 1.0,
    out_col: str = "corr",
):
    """Per-group Pearson correlation, engineered for BIT-exact cross-engine
    parity (the zscore_by_group contract extended to two variables): both
    columns fix to integers (``round(v * scale)``), the six sufficient
    statistics (n, Σx, Σy, Σx², Σy², Σxy) are exact BIGINTs through the
    combiner exchange, and r derives from them with an identical
    IEEE-double operation order on both engines — every float input is
    exact, every op deterministic, so no tolerance needed.

    Overflow bounds (int64): |x_int|²·rows and |x_int·y_int|·rows must stay
    under 2^63 (~9.2e18) — pick scales so the SCALED ints are small (whole
    units, not micro-units); n·Σy² may exceed int64, so the FINAL expression
    runs in doubles, not BIGINTs, on both sides. Zero-variance groups (and
    singletons) emit r = 0.0. Null group/x/y rows drop. Output: (by,
    out_col, n)."""
    import pandas as pd

    from ..grouping import map_copartitioned

    def to_int(v: np.ndarray, scale: float) -> np.ndarray:
        return (np.sign(v) * np.floor(np.abs(v) * scale + 0.5)).astype(np.int64)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[
            batch[by].notna() & batch[x_col].notna() & batch[y_col].notna()
        ]
        x = to_int(batch[x_col].to_numpy(np.float64), x_scale)
        y = to_int(batch[y_col].to_numpy(np.float64), y_scale)
        g = pd.DataFrame(
            {by: batch[by], "x": x, "y": y, "xx": x * x, "yy": y * y, "xy": x * y}
        )
        out = g.groupby(by, sort=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxx=("xx", "sum"), syy=("yy", "sum"), sxy=("xy", "sum"),
        )
        return out.reset_index()

    cols = ["n", "sx", "sy", "sxx", "syy", "sxy"]

    def final(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return pd.DataFrame(
                {by: pd.Series([], dtype=object),
                 out_col: pd.Series([], dtype=np.float64),
                 "n": pd.Series([], dtype=np.int64)}
            )
        m = block.groupby(by, sort=False, as_index=False)[cols].sum()
        # identical op order as the SQL twin: all six ints -> double, then
        # cov = n*sxy - sx*sy; vx = n*sxx - sx*sx; vy = n*syy - sy*sy;
        # r = cov / sqrt(vx * vy)
        n = m["n"].to_numpy(np.float64)
        sx = m["sx"].to_numpy(np.float64)
        sy = m["sy"].to_numpy(np.float64)
        cov = n * m["sxy"].to_numpy(np.float64) - sx * sy
        vx = n * m["sxx"].to_numpy(np.float64) - sx * sx
        vy = n * m["syy"].to_numpy(np.float64) - sy * sy
        denom = np.sqrt(vx * vy)
        r = np.zeros(len(m), np.float64)
        ok = denom > 0
        r[ok] = np.round(cov[ok] / denom[ok], 9)
        return pd.DataFrame(
            {by: m[by], out_col: r, "n": m["n"].to_numpy(np.int64)}
        )

    return map_copartitioned(
        ds.map_batches(partial, batch_format="pandas"), by, final,
        batch_format="pandas",
    )


def value_histogram(ds, by: str, value_col: str, *, bucket_width: float):
    """Per-group equi-width value histogram — the distribution-profiling
    aggregate (value ranges per event type, length bands per source).
    Bucket = floor(value / width) as an exact int64 on both engines;
    combiner: per-block (by, bucket, cnt) partials → ONE by-keyed exchange
    → sum. Null group/value rows drop. Output: (by, bucket, cnt,
    bucket_lo) with bucket_lo = bucket·width for report readability."""
    import pandas as pd

    from ..grouping import map_copartitioned

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch[by].notna() & batch[value_col].notna()]
        b = np.floor(
            batch[value_col].to_numpy(np.float64) / bucket_width
        ).astype(np.int64)
        g = pd.DataFrame({by: batch[by], "bucket": b})
        out = g.groupby([by, "bucket"], sort=False, as_index=False).size()
        return out.rename(columns={"size": "cnt"}).astype({"cnt": np.int64})

    def final(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return pd.DataFrame(
                {by: pd.Series([], dtype=object),
                 "bucket": pd.Series([], dtype=np.int64),
                 "cnt": pd.Series([], dtype=np.int64),
                 "bucket_lo": pd.Series([], dtype=np.float64)}
            )
        out = block.groupby([by, "bucket"], sort=False, as_index=False)["cnt"].sum()
        out["bucket_lo"] = np.round(
            out["bucket"].to_numpy(np.float64) * bucket_width, 9
        )
        return out

    return map_copartitioned(
        ds.map_batches(partial, batch_format="pandas"), by, final,
        batch_format="pandas",
    )


def histogram_drift(
    ds,
    by: str,
    value_col: str,
    split_col: str,
    split_at: int,
    *,
    bucket_width: float,
):
    """Distribution drift per group between two cohorts (rows before /
    after ``split_at`` on int64-comparable ``split_col``): L1 distance
    between the cohorts' equi-width value histograms — the data-quality
    monitor that catches a source silently changing shape. EXACT integer
    form: drift = Σ|c1·N2 − c2·N1| / (N1·N2), one cross-multiplied BIGINT
    sum then a single double divide (no per-bucket float fractions), so the
    SQL twin matches bit-for-bit. Overflow bound: bucket count × cohort
    total must stay under 2^63 — fine to ~3e9 rows per (group, cohort);
    shard the window first beyond that. Groups missing either cohort are
    dropped (drift undefined). Combiner: (by, half, bucket, cnt) partials →
    ONE by-keyed exchange. Output: (by, l1_drift, n_first, n_second)."""
    import pandas as pd

    from ..grouping import map_copartitioned

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch[by].notna() & batch[value_col].notna()]
        s = batch[split_col]
        if np.issubdtype(s.dtype, np.datetime64):
            sv = s.to_numpy().astype("datetime64[us]").view("int64")
        else:
            sv = s.to_numpy(np.int64)
        half = (sv >= split_at).astype(np.int64)
        b = np.floor(
            batch[value_col].to_numpy(np.float64) / bucket_width
        ).astype(np.int64)
        g = pd.DataFrame({by: batch[by], "half": half, "bucket": b})
        out = g.groupby([by, "half", "bucket"], sort=False, as_index=False).size()
        return out.rename(columns={"size": "cnt"}).astype({"cnt": np.int64})

    def final(block: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {by: pd.Series([], dtype=object),
             "l1_drift": pd.Series([], dtype=np.float64),
             "n_first": pd.Series([], dtype=np.int64),
             "n_second": pd.Series([], dtype=np.int64)}
        )
        if not len(block):
            return empty
        m = block.groupby([by, "half", "bucket"], sort=False, as_index=False)[
            "cnt"
        ].sum()
        rows = []
        for g, sub in m.groupby(by, sort=True):
            piv = sub.pivot_table(
                index="bucket", columns="half", values="cnt",
                fill_value=0, aggfunc="sum",
            ).reindex(columns=[0, 1], fill_value=0)
            c1 = piv[0].to_numpy(np.int64)
            c2 = piv[1].to_numpy(np.int64)
            n1, n2 = int(c1.sum()), int(c2.sum())
            if n1 == 0 or n2 == 0:
                continue
            num = int(np.abs(c1 * n2 - c2 * n1).sum())
            rows.append(
                (g, round(float(num) / (float(n1) * n2), 9), n1, n2)
            )
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=[by, "l1_drift", "n_first", "n_second"])

    return map_copartitioned(
        ds.map_batches(partial, batch_format="pandas"), by, final,
        batch_format="pandas",
    )


def mode_by_group(ds, by: str, value_col: str, out_col: str = "mode_value"):
    """Per-group MODE (most frequent value), deterministic: ties break to
    the lexically smallest value — the 'dominant language per source'
    aggregate. Combiner: per-block (by, value, cnt) partials (rows ∝
    distinct pairs) → ONE by-keyed exchange → merge + argmax. Null groups
    and null values drop (the combiner convention). Output: (by, out_col,
    n_value) with n_value the winning count."""
    import pandas as pd

    from ..grouping import map_copartitioned

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch[by].notna() & batch[value_col].notna()]
        out = batch.groupby([by, value_col], sort=False, as_index=False).size()
        return out.rename(columns={"size": "cnt"}).astype({"cnt": np.int64})

    def final(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return pd.DataFrame(
                {by: pd.Series([], dtype=object),
                 out_col: pd.Series([], dtype=object),
                 "n_value": pd.Series([], dtype=np.int64)}
            )
        merged = block.groupby([by, value_col], sort=False, as_index=False)["cnt"].sum()
        merged = merged.sort_values(
            [by, "cnt", value_col], ascending=[True, False, True], kind="mergesort"
        )
        top = merged.groupby(by, sort=False).head(1)
        return pd.DataFrame(
            {by: top[by].to_numpy(), out_col: top[value_col].to_numpy(),
             "n_value": top["cnt"].to_numpy(np.int64)}
        )

    return map_copartitioned(
        ds.map_batches(partial, batch_format="pandas"), by, final,
        batch_format="pandas",
    )


def hash_sample_n_per_group(ds, key_col: str, group_col: str, n: int, salt: int = 0):
    """EXACT-size deterministic sample PER GROUP ("take n docs per
    language"): each group keeps its ``n`` rows with the smallest
    ``(hash(key), key)`` — the stratified companion to the global
    :func:`hash_sample_n`, with the same reshard/resume stability and the
    same SQL-exact Knuth arithmetic. Groups smaller than ``n`` keep
    everything.

    Shape: per-block per-group top-n combiner (rows ≤ n × groups-per-block)
    → ONE group-keyed exchange → per-group head-n — no global sort, no
    LIMIT barrier. Null key/group rows drop (the hash_sample convention)."""
    import pandas as pd

    from ..grouping import map_copartitioned

    def local_topn(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch[key_col].notna() & batch[group_col].notna()]
        if not len(batch):
            return batch.assign(_hkey=np.empty(0, np.int64))
        hk = _hash32(
            batch[key_col].to_numpy(np.int64), salt, "hash_sample_n_per_group"
        )
        df = batch.assign(_hkey=hk).sort_values(
            ["_hkey", key_col], kind="stable"
        )
        return df.groupby(group_col, sort=False).head(n)

    def final(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return block.drop(columns=["_hkey"], errors="ignore")
        block = block.sort_values(["_hkey", key_col], kind="stable")
        return (
            block.groupby(group_col, sort=False)
            .head(n)
            .drop(columns=["_hkey"])
            .reset_index(drop=True)
        )

    return map_copartitioned(
        ds.map_batches(local_topn, batch_format="pandas"),
        group_col,
        final,
        batch_format="pandas",
    )


def leakage_safe_split(
    ids_ds,
    labels_ds,
    *,
    id_col: str = "doc_id",
    label_col: str = "cluster_id",
    train_pct: int = 90,
    salt: int = 0,
    out_col: str = "split",
):
    """Cluster-aware train/validation split: every doc is bucketed by the
    Knuth hash of its near-dup cluster REPRESENTATIVE (the component's min
    doc id; unclustered docs represent themselves), so two near-duplicates
    can NEVER straddle the split — the standard guard against train→eval
    leakage through the duplicate graph (splitting by doc hash alone puts
    ~2·p·(1-p) of dup pairs across the boundary).

    Shape: ONE id-keyed exchange. The label table emits (id, rep) rows and
    the corpus emits (id, id) self-rows; after co-partitioning on id, the
    rep is simply min(candidates) — the component representative is the min
    doc id of a component that contains the doc itself, so the self-row is
    the correct identity fallback and min() needs no join or null logic.
    The split decision is then a stateless map (:func:`hash_bucket` of rep),
    so resharding, resume, or corpus growth never flips a doc whose
    component is unchanged. Returns (id_col, rep, out_col) rows.
    """
    import pandas as pd

    def self_rows(batch: pd.DataFrame) -> pd.DataFrame:
        i = batch[id_col].to_numpy(np.int64)
        return pd.DataFrame({id_col: i, "rep": i})

    def label_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(np.int64),
                "rep": batch[label_col].to_numpy(np.int64),
            }
        )

    u = ids_ds.map_batches(self_rows, batch_format="pandas").union(
        labels_ds.map_batches(label_rows, batch_format="pandas")
    )

    def pick_rep(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return pd.DataFrame(
                {id_col: np.empty(0, np.int64), "rep": np.empty(0, np.int64)}
            )
        return block.groupby(id_col, as_index=False)["rep"].min()

    from ..grouping import map_copartitioned

    reps = map_copartitioned(u, id_col, pick_rep, batch_format="pandas")

    def decide(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {
                    id_col: np.empty(0, np.int64),
                    "rep": np.empty(0, np.int64),
                    out_col: np.empty(0, object),
                }
            )
        b = hash_bucket(batch["rep"].to_numpy(np.int64), salt)
        batch[out_col] = np.where(b < train_pct, "train", "val")
        return batch

    return reps.map_batches(decide, batch_format="pandas")


def weighted_sample_n(
    ds,
    key_col: str,
    weights: dict,
    n: int,
    *,
    strata_col: str = "source",
    default_weight: float = 1.0,
    salt: int = 0,
):
    """Deterministic weighted sample WITHOUT replacement (the
    Efraimidis-Spirakis A-ES scheme, exponential-race formulation): each
    row gets priority = -ln(u) / w with u = (knuth_hash(key)+1) / 2^32 ∈
    (0, 1], w = its stratum's weight; the n smallest (priority, key) rows
    win. Inclusion odds scale with w, the choice is a pure function of the
    key (resharding/resume/corpus growth never flips a surviving row's
    priority), and the arithmetic is SQL-mirrorable: the hash is BIGINT
    Knuth (:func:`_hash32` domain contract), u is an exact power-of-two
    division, and the priority is rounded to 9 dp on both engines — the
    same cross-engine float contract as the avg(-ln) oracle twins.

    Combiner shape = :func:`hash_sample_n`: each block keeps its local n
    smallest before a tiny sort+limit over ≤ n × blocks rows. Returns
    (key_col, strata_col, priority) rows."""
    import pandas as pd

    def local_topn(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {
                    key_col: np.empty(0, np.int64),
                    strata_col: np.empty(0, object),
                    "priority": np.empty(0, np.float64),
                }
            )
        keys = batch[key_col].to_numpy(np.int64)
        h = _hash32(keys, salt, "weighted_sample_n")
        u = (h.astype(np.float64) + 1.0) / 4294967296.0
        w = (
            batch[strata_col]
            .map(weights)
            .fillna(default_weight)
            .to_numpy(np.float64)
        )
        pri = np.round(-np.log(u) / w, 9)
        out = pd.DataFrame(
            {key_col: keys, strata_col: batch[strata_col].to_numpy(), "priority": pri}
        )
        return out.nsmallest(n, ["priority", key_col])

    return (
        ds.map_batches(local_topn, batch_format="pandas")
        .sort(["priority", key_col])
        .limit(n)
    )
