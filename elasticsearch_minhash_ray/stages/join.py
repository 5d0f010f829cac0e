"""Broadcast (map-side) join — the scale pattern for small-side joins.

Instead of a distributed shuffle join, the small side is collapsed to a
key→value Arrow mapping on the driver, ``ray.put`` ONCE, and read inside every
map task (zero re-shipping per batch; Ray dedups the object per node). This is
the right shape whenever one side fits comfortably in worker memory — e.g.
dimension tables, config maps, per-repo metadata at 10^12-file corpus scale.

For big-big joins use co-partitioning by a shared key (the LSH/cluster stages
already demonstrate the hash-partition + map_groups pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def broadcast_lookup(small: pd.DataFrame, key: str, value: str):
    """Build + ray.put an int64-key → value lookup from a small table;
    returns the object ref to read inside map tasks."""
    import ray

    keys = small[key].to_numpy(np.int64)
    vals = small[value].to_numpy()
    order = np.argsort(keys)
    return ray.put((keys[order], vals[order]))


def broadcast_join_column(ds, lookup_ref, fk_col: str, out_col: str, drop_unmatched: bool = True):
    """Dataset ⨝ broadcast lookup: adds ``out_col`` by mapping ``fk_col``
    through the broadcast (sorted-key binary-search, vectorized per batch)."""
    import ray

    def add(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(lookup_ref)
        fk = np.asarray(batch[fk_col], dtype=np.int64)
        # out_col is ALWAYS typed from the lookup values: an all-miss (or
        # empty-lookup) batch must not degrade to a null-typed column and
        # break schema unification against matched batches
        typ = pa.string() if vals.dtype == object else pa.from_numpy_dtype(vals.dtype)
        if len(keys) == 0:
            # empty lookup: every row is unmatched (clamped searchsorted
            # would index keys[-1] of an empty array otherwise)
            if drop_unmatched:
                empty = batch.filter(pa.array(np.zeros(len(fk), dtype=bool)))
                return empty.append_column(out_col, pa.array([], typ))
            return batch.append_column(out_col, pa.array([None] * len(fk), typ))
        pos = np.searchsorted(keys, fk)
        pos_c = np.minimum(pos, len(keys) - 1)
        hit = keys[pos_c] == fk
        out = vals[pos_c]
        if drop_unmatched and not hit.all():
            batch = batch.filter(pa.array(hit))
            out = out[hit]
        elif not hit.all():
            out = np.where(hit, out, None)
        return batch.append_column(out_col, pa.array(out, typ))

    return ds.map_batches(add, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# big-big keyed time joins (AS-OF, RANGE) — shared tagged-union machinery
# ---------------------------------------------------------------------------

_RESERVED = ("_asof_by", "_asof_on", "_asof_side", "_asof_ron")


def _validate_sides(lsch, rsch, by, left_on, right_on):
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    overlap = (set(ltypes) & set(rtypes)) - {by}
    if overlap:
        raise ValueError(f"non-key column name overlap between sides: {sorted(overlap)}")
    bad = (set(ltypes) | set(rtypes)) & set(_RESERVED)
    if bad:
        raise ValueError(f"input columns collide with reserved names: {sorted(bad)}")
    if ltypes[by] != rtypes[by]:
        raise ValueError(f"by-key dtype mismatch: {ltypes[by]} vs {rtypes[by]}")
    lpayload = [c for c in lsch.names if c not in (by, left_on)]
    rpayload = [c for c in rsch.names if c not in (by, right_on)]
    unified = pa.schema(
        [
            pa.field("_asof_by", ltypes[by]),
            pa.field("_asof_on", ltypes[left_on]),
            pa.field("_asof_side", pa.int8()),
            pa.field("_asof_ron", rtypes[right_on]),
            *[pa.field(c, ltypes[c]) for c in lpayload],
            *[pa.field(c, rtypes[c]) for c in rpayload],
        ]
    )
    out_schema = pa.schema(
        [
            pa.field(by, ltypes[by]),
            pa.field(left_on, ltypes[left_on]),
            *[pa.field(c, ltypes[c]) for c in lpayload],
            pa.field(right_on, rtypes[right_on]),
            *[pa.field(c, rtypes[c]) for c in rpayload],
        ]
    )
    return ltypes, rtypes, lpayload, rpayload, unified, out_schema


def _tagged_union(left_ds, right_ds, by, left_on, right_on, unified,
                  keep_left_nulls: bool = False):
    """Tag both sides into ONE explicit unified schema (other side's payload
    typed-null — the established union-join shape) and union them. Null
    by/on rows can never match (SQL semantics) and are dropped here; pass
    ``keep_left_nulls`` for how='left' so the caller can emit them with
    null right columns."""

    def tag(side: int, key: str, on: str):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if side == 1 or not keep_left_nulls:
                batch = batch.filter(
                    pc.and_(pc.is_valid(batch[key]), pc.is_valid(batch[on]))
                )
            n = batch.num_rows
            cols = []
            for f in unified:
                if f.name == "_asof_by":
                    cols.append(batch[key].cast(f.type))
                elif f.name == "_asof_on":
                    cols.append(batch[on].cast(f.type))
                elif f.name == "_asof_side":
                    cols.append(pa.array(np.full(n, side, np.int8), f.type))
                elif f.name == "_asof_ron" and side == 1:
                    cols.append(batch[on].cast(f.type))
                elif f.name in batch.column_names:
                    cols.append(batch[f.name])
                else:
                    cols.append(pa.nulls(n, f.type))
            return pa.Table.from_arrays(cols, schema=unified)

        return fn

    return left_ds.map_batches(tag(0, by, left_on), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1, by, right_on), batch_format="pyarrow")
    )


def _split_sides(block: pa.Table):
    """(left_table, right_table) from a unified block — pure arrow filters,
    no pandas: int64 payloads keep full 64-bit precision (a to_pandas
    round-trip coerces null-bearing int columns to float64, silently
    corrupting values above 2^53 — e.g. this repo's 63-bit doc_key)."""
    import pyarrow.compute as pc

    side = block["_asof_side"]
    return (
        block.filter(pc.equal(side, 0)),
        block.filter(pc.equal(side, 1)),
    )


def _emit_pairs(lhs: pa.Table, rhs: pa.Table, lidx, ridx, out_schema,
                lpayload, rpayload, by, left_on, right_on) -> pa.Table:
    """Gather output rows by POSITION with arrow take (null indices yield
    null rows — typed, exact)."""
    lcols = lhs.select(["_asof_by", "_asof_on", *lpayload]).take(pa.array(lidx, pa.int64()))
    rcols = rhs.select(["_asof_ron", *rpayload]).take(
        pa.array(ridx, pa.int64(), from_pandas=True)
    )
    cols = {
        by: lcols["_asof_by"],
        left_on: lcols["_asof_on"],
        **{c: lcols[c] for c in lpayload},
        right_on: rcols["_asof_ron"],
        **{c: rcols[c] for c in rpayload},
    }
    return pa.Table.from_arrays([cols[f.name] for f in out_schema], schema=out_schema)


def asof_join(
    left_ds,
    right_ds,
    by: str,
    left_on: str,
    right_on: str,
    how: str = "inner",
    left_schema: "pa.Schema | None" = None,
    right_schema: "pa.Schema | None" = None,
    right_tiebreak: str | None = None,
):
    """Distributed AS-OF join (big-big): for each left row, the right row
    with the same ``by`` key and the greatest ``right_on`` <= ``left_on``
    (DuckDB ``ASOF JOIN l ON l.by = r.by AND l.on >= r.on`` semantics) —
    the event-attribution / point-in-time-feature join Ray Data has no
    native operator for.

    Dataflow: tagged union into one explicit schema → a SINGLE by-key
    exchange co-locates every key (:func:`~..grouping.map_copartitioned`)
    → within each block ``pd.merge_asof`` runs over (key, time, POSITION)
    triples only; payload columns are gathered by position with arrow
    ``take`` so null-bearing int64 columns never round-trip through
    float64 (values above 2^53 stay exact). One exchange over left+right
    rows; per-key row mass is the partitioning assumption (skewed hot
    keys would need the LSH stages' salting pattern).

    DETERMINISM: make the right side unique per ``(by, right_on)`` —
    with duplicated timestamps the as-of winner is engine-defined and no
    oracle twin can match. Either pre-dedupe (keep_latest — costs its own
    key exchange) or pass ``right_tiebreak=<right payload column>``: the
    join's OWN exchange already co-locates every key, so the per-block
    merge dedupes the right side in place (max tiebreak per (by, on) —
    keep_latest semantics) and the extra exchange disappears (measured:
    1.7 s -> 1.1 s warm at sf0.1, two chained sort barriers collapse to
    one). The tiebreak column should be unique per (by, on); full-row
    duplicates resolve to the last row in deterministic block order.
    ``how='inner'`` drops left rows with no prior right row (the
    SQL ASOF default); 'left' keeps them with null right columns. Null
    ``by``/``on`` values never match: right rows and, under 'inner', left
    rows are dropped at the tag stage; under 'left' null-key left rows
    pass through with null right columns.

    Pass ``left_schema`` / ``right_schema`` (arrow) when a side is the
    output of an exchange-bearing pipeline: the ``ds.schema()`` fallback
    EXECUTES such a pipeline end-to-end just to learn its schema
    (measured: a keep_latest right side cost a full extra 2.9 s run at
    sf0.1), and the side then re-executes for the join itself."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    lsch = left_schema if left_schema is not None else left_ds.schema()
    rsch = right_schema if right_schema is not None else right_ds.schema()
    _lt, _rt, lpayload, rpayload, unified, out_schema = _validate_sides(
        lsch, rsch, by, left_on, right_on
    )
    if right_tiebreak is not None and right_tiebreak not in rpayload:
        raise ValueError(
            f"right_tiebreak {right_tiebreak!r} is not a right payload column "
            f"(have {rpayload})"
        )
    tagged = _tagged_union(
        left_ds, right_ds, by, left_on, right_on, unified,
        keep_left_nulls=(how == "left"),
    )

    def _dedupe_rhs(rhs: pa.Table) -> pa.Table:
        # keep_latest per (by, on) WITHIN the already-co-located block:
        # stable lexsort by (by, on, tiebreak), the last row of each
        # (by, on) run carries the max tiebreak
        tb = rhs[right_tiebreak].to_numpy(zero_copy_only=False)
        byv = rhs["_asof_by"].to_numpy(zero_copy_only=False)
        onv = rhs["_asof_on"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, onv, byv))
        b_s, o_s = byv[order], onv[order]
        is_last = np.r_[(b_s[1:] != b_s[:-1]) | (o_s[1:] != o_s[:-1]), True]
        if is_last.all():
            return rhs
        return rhs.take(pa.array(np.sort(order[is_last])))

    def join_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        lhs, rhs = _split_sides(block)
        if not lhs.num_rows:
            return out_schema.empty_table()
        if right_tiebreak is not None and rhs.num_rows:
            rhs = _dedupe_rhs(rhs)
        if not rhs.num_rows:
            if how == "inner":
                return out_schema.empty_table()
            lidx = np.arange(lhs.num_rows, dtype=np.int64)
            return _emit_pairs(
                lhs, rhs, lidx, pd.Series([np.nan] * lhs.num_rows), out_schema,
                lpayload, rpayload, by, left_on, right_on,
            )
        lkeys = lhs.select(["_asof_by", "_asof_on"])
        if how == "left":
            import pyarrow.compute as pc

            # filter null-key passthrough rows in ARROW, so the merge-key
            # to_pandas below never sees nulls and never coerces int64
            # keys through float64 (exact above 2^53). Inner mode skipped
            # this: the tag stage already dropped nulls, the mask would
            # be a per-block no-op copy.
            lvalid = pc.and_(
                pc.is_valid(lkeys["_asof_by"]), pc.is_valid(lkeys["_asof_on"])
            )
            lok = np.asarray(lvalid)
            lkeys = lkeys.filter(lvalid)
        else:
            lok = np.ones(lhs.num_rows, dtype=bool)
        lpd = pd.DataFrame(
            {"_asof_by": lkeys["_asof_by"].to_pandas(),
             "_asof_on": lkeys["_asof_on"].to_pandas(),
             "_lpos": np.arange(lhs.num_rows, dtype=np.int64)[lok]}
        ).sort_values("_asof_on", kind="mergesort")
        rpd = pd.DataFrame(
            {"_asof_by": rhs["_asof_by"].to_pandas(),
             "_asof_on": rhs["_asof_on"].to_pandas(),
             "_rpos": np.arange(rhs.num_rows, dtype=np.int64)}
        ).sort_values("_asof_on", kind="mergesort")
        merged = pd.merge_asof(
            lpd, rpd, on="_asof_on", by="_asof_by", direction="backward"
        )
        if how == "inner":
            merged = merged[merged["_rpos"].notna()]
            lidx = merged["_lpos"].to_numpy(np.int64)
            ridx = merged["_rpos"].to_numpy(np.int64)
        else:
            lidx = np.r_[
                merged["_lpos"].to_numpy(np.int64),
                np.arange(lhs.num_rows, dtype=np.int64)[~lok],
            ]
            rpos = merged["_rpos"]
            n_null = int((~lok).sum())
            # guard: concat with an empty entry is deprecated (pandas 2.2
            # FutureWarning on every all-valid block otherwise)
            ridx = (
                pd.concat([rpos, pd.Series([np.nan] * n_null)], ignore_index=True)
                if n_null
                else rpos
            )
        return _emit_pairs(
            lhs, rhs, lidx, ridx, out_schema, lpayload, rpayload, by, left_on, right_on
        )

    from ..grouping import map_copartitioned

    return map_copartitioned(tagged, "_asof_by", join_block, batch_format="pyarrow")


def range_join(
    left_ds,
    right_ds,
    by: str,
    left_on: str,
    right_on: str,
    lower_offset: int,
    upper_offset: int,
    left_schema: "pa.Schema | None" = None,
    right_schema: "pa.Schema | None" = None,
):
    """Distributed RANGE (interval) join: emit one row per (left, right)
    pair with the same ``by`` key and ``left_on + lower_offset <=
    right_on <= left_on + upper_offset`` (offsets in the on-column's
    int64 units — microseconds for timestamp[us]; the offsets must not
    push values past the int64 range: numpy addition wraps silently, so
    keep |on| + |offset| < 2^63 — true for any real timestamp). The
    windowed-attribution join; inner semantics — left rows with no match
    are dropped, null by/on rows never match.

    Same dataflow as :func:`asof_join` (shared tagged-union + one by-key
    exchange); inside each block the right side lexsorts once, per-row
    group bounds come from vectorized searchsorteds, per-group time
    bounds from one searchsorted pair per key, pair expansion is the
    repeat/cumsum multi-range gather, and payload emission is arrow
    ``take`` by position (int64-exact, see asof_join). Scale assumption:
    the OUTPUT pair mass per key fits a block (window × per-key rate
    bounds it; cap upstream for adversarial keys)."""
    if lower_offset > upper_offset:
        raise ValueError("lower_offset must be <= upper_offset")
    lsch = left_schema if left_schema is not None else left_ds.schema()
    rsch = right_schema if right_schema is not None else right_ds.schema()
    ltypes, _rt, lpayload, rpayload, unified, out_schema = _validate_sides(
        lsch, rsch, by, left_on, right_on
    )
    tagged = _tagged_union(left_ds, right_ds, by, left_on, right_on, unified)

    lo_off = np.int64(lower_offset)
    hi_off = np.int64(upper_offset)
    on_np_unit = (
        f"datetime64[{ltypes[left_on].unit}]"
        if pa.types.is_timestamp(ltypes[left_on])
        else None
    )

    def _on_int64(arr: np.ndarray) -> np.ndarray:
        # offsets are in the ARROW on-column's unit; pandas/numpy may hand
        # the column back as datetime64[ns], which would shrink a
        # microsecond window 1000x — normalize before viewing
        if on_np_unit is not None:
            arr = arr.astype(on_np_unit)
        return arr.view(np.int64)

    def join_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        lhs, rhs = _split_sides(block)
        if not lhs.num_rows or not rhs.num_rows:
            return out_schema.empty_table()
        RK = np.asarray(rhs["_asof_by"])
        RT = _on_int64(rhs["_asof_on"].to_numpy())
        order = np.lexsort((RT, RK))
        RK, RT = RK[order], RT[order]
        LK = np.asarray(lhs["_asof_by"])
        LT = _on_int64(lhs["_asof_on"].to_numpy())
        gs = np.searchsorted(RK, LK, "left")
        ge = np.searchsorted(RK, LK, "right")
        lo = np.empty(len(LK), np.int64)
        hi = np.empty(len(LK), np.int64)
        # one searchsorted pair per DISTINCT key (groups, not rows)
        lorder = np.argsort(LK, kind="stable")
        runs = np.r_[0, np.nonzero(LK[lorder][1:] != LK[lorder][:-1])[0] + 1, len(LK)]
        for a, b in zip(runs[:-1], runs[1:]):
            rows = lorder[a:b]
            g0, g1 = gs[rows[0]], ge[rows[0]]
            seg = RT[g0:g1]
            lo[rows] = g0 + np.searchsorted(seg, LT[rows] + lo_off, "left")
            hi[rows] = g0 + np.searchsorted(seg, LT[rows] + hi_off, "right")
        counts = hi - lo
        keep = counts > 0
        if not keep.any():
            return out_schema.empty_table()
        lidx = np.repeat(np.arange(len(LK))[keep], counts[keep])
        starts = np.repeat(lo[keep], counts[keep])
        csum = np.r_[0, np.cumsum(counts[keep])][:-1]
        # positions into the SORTED right view -> original row positions
        sidx = starts + (np.arange(counts[keep].sum()) - np.repeat(csum, counts[keep]))
        ridx = order[sidx]
        return _emit_pairs(
            lhs, rhs, lidx, ridx, out_schema, lpayload, rpayload, by, left_on, right_on
        )

    from ..grouping import map_copartitioned

    return map_copartitioned(tagged, "_asof_by", join_block, batch_format="pyarrow")


def bloom_semi_join(
    big_ds,
    keys_ds,
    big_key: str,
    right_key: str,
    *,
    bits_per_key: int = 12,
    n_keys_hint: int | None = None,
    num_partitions: int = 4,
):
    """EXACT semi-join of a big table against a key set TOO LARGE to
    broadcast exactly but whose BLOOM fits (~1.5 B/key at 12 bits) —
    sideways information passing: the bloom prefilter drops definitively-
    unmatched big-side rows worker-side (no false negatives, so nothing
    true is lost), and only the surviving candidates (matches + bloom FPs)
    enter the exact native semi join. Output identical to a plain semi
    join at ANY false-positive rate (pytest pins equality with a
    deliberately undersized bloom); shuffle traffic ∝ candidates, not the
    big table. Raw keys mix through splitmix64 before the bloom (small
    sequential ints would otherwise set clustered bits)."""
    import numpy as np
    import pandas as pd
    import ray

    from ..stages.sketch import _hash64
    from ..stages.text import bloom_add, bloom_params, bloom_query

    def distinct_keys(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({right_key: batch[right_key].dropna().unique()})

    keys_dd = keys_ds.map_batches(distinct_keys, batch_format="pandas")
    n_keys = n_keys_hint if n_keys_hint is not None else keys_dd.count()
    m_bits, k = bloom_params(max(1, n_keys), bits_per_key)
    nbytes = m_bits // 8

    def partial_bloom(batch: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(nbytes, np.uint8)
        h = _hash64(batch[right_key].to_numpy(np.int64)).view(np.int64)
        bloom_add(bits, h, m_bits, k)
        return pd.DataFrame({"bloom": [bits.tobytes()]})

    bits = np.zeros(nbytes, np.uint8)
    for row in keys_dd.map_batches(partial_bloom, batch_format="pandas").take_all():
        bits |= np.frombuffer(row["bloom"], np.uint8)
    bloom_ref = ray.put(bits)

    def prefilter(batch: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(bloom_ref)
        h = _hash64(batch[big_key].to_numpy(np.int64)).view(np.int64)
        return batch[bloom_query(b, h, m_bits, k)]

    candidates = big_ds.map_batches(prefilter, batch_format="pandas")
    return candidates.join(
        keys_dd,
        join_type="left_semi",
        num_partitions=num_partitions,
        on=(big_key,),
        right_on=(right_key,),
    )
