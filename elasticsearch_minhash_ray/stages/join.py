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


def asof_join(
    left_ds,
    right_ds,
    by: str,
    left_on: str,
    right_on: str,
    how: str = "inner",
    left_schema: "pa.Schema | None" = None,
    right_schema: "pa.Schema | None" = None,
):
    """Distributed AS-OF join (big-big): for each left row, the right row
    with the same ``by`` key and the greatest ``right_on`` <= ``left_on``
    (DuckDB ``ASOF JOIN l ON l.by = r.by AND l.on >= r.on`` semantics) —
    the event-attribution / point-in-time-feature join Ray Data has no
    native operator for.

    Dataflow: both sides are tagged into ONE explicit unified schema
    (other side's payload columns typed-null, the established union-join
    shape of dedup/substring/text), unioned, then a SINGLE by-key exchange
    co-locates every row of a key (:func:`~..grouping.map_copartitioned`);
    within each block the sides split and join via ``pd.merge_asof`` (C
    merge over sorted frames, vectorized ``by`` grouping). One exchange
    over left+right rows — no broadcast, both sides may be corpus-sized;
    per-key row mass is the partitioning assumption (skewed hot keys would
    need the LSH stages' salting pattern).

    DETERMINISM: make the right side unique per ``(by, right_on)`` first
    (e.g. keep the max-id row) — with duplicated timestamps the as-of
    winner is engine-defined and no oracle twin can match. The matched
    right ``right_on`` value is returned as column ``{right_on}`` (copied
    through the merge); ``how='inner'`` drops left rows with no prior
    right row (the SQL ASOF default), ``how='left'`` keeps them with null
    right columns. Null ``by``/``on`` values never match (SQL semantics):
    such right rows and, under 'inner', left rows are dropped at the tag
    stage; under 'left' null-key left rows pass through with null right
    columns.

    Pass ``left_schema`` / ``right_schema`` (arrow) when the side is the
    output of an exchange-bearing pipeline: the ``ds.schema()`` fallback
    EXECUTES such a pipeline end-to-end just to learn its schema (measured:
    a keep_latest right side cost a full extra 2.9 s run at sf0.1 before
    these params existed), and the side then re-executes for the join
    itself."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")

    lsch = left_schema if left_schema is not None else left_ds.schema()
    rsch = right_schema if right_schema is not None else right_ds.schema()
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    overlap = (set(ltypes) & set(rtypes)) - {by}
    if overlap:
        raise ValueError(f"non-key column name overlap between sides: {sorted(overlap)}")
    reserved = {"_asof_by", "_asof_on", "_asof_side", "_asof_ron"}
    bad = (set(ltypes) | set(rtypes)) & reserved
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

    def tag(side: int, key: str, on: str):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # null by/on values can never match (SQL ASOF semantics) and
            # would crash pd.merge_asof; drop them here — except left-side
            # rows under how='left', which must survive to the output with
            # null right columns (handled in join_block)
            if side == 1 or how == "inner":
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

    tagged = left_ds.map_batches(tag(0, by, left_on), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1, by, right_on), batch_format="pyarrow")
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

    def join_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        batch = block.to_pandas()
        side = batch["_asof_side"].to_numpy()
        lhs = batch.loc[side == 0, ["_asof_by", "_asof_on", *lpayload]]
        rhs = batch.loc[side == 1, ["_asof_by", "_asof_on", "_asof_ron", *rpayload]]
        lnull = lhs.iloc[0:0]
        if how == "left":
            ok = lhs["_asof_by"].notna() & lhs["_asof_on"].notna()
            lnull, lhs = lhs[~ok], lhs[ok]
        lhs = lhs.sort_values("_asof_on", kind="mergesort")
        rhs = rhs.sort_values("_asof_on", kind="mergesort")
        out = pd.merge_asof(
            lhs, rhs, on="_asof_on", by="_asof_by", direction="backward"
        )
        if how == "inner":
            out = out[out["_asof_ron"].notna()]
        elif len(lnull):
            # null-key left rows pass through with null right columns
            out = pd.concat([out, lnull], ignore_index=True)
        out = out.rename(columns={"_asof_by": by, "_asof_on": left_on, "_asof_ron": right_on})
        out = out[[f.name for f in out_schema]]
        # null-filled right payloads decay to float/NaT in pandas; restore
        # the declared arrow types (safe: inner has no nulls, left keeps
        # them as proper arrow nulls)
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)

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
    right_on <= left_on + upper_offset`` (offsets in the column's int64
    units — microseconds for timestamp[us]). The windowed-attribution
    join ("orders within 7 days before the event"); inner semantics —
    left rows with no match are dropped, null by/on rows never match.

    Same dataflow as :func:`asof_join` (tagged union → ONE by-key
    exchange); inside each block the right side is lexsorted by
    (key, time) once, per-left-row group bounds come from two vectorized
    searchsorteds, per-group time bounds from one searchsorted pair per
    key, and the pair expansion is the repeat/cumsum multi-range gather —
    no per-row Python. Scale assumption: the OUTPUT pair mass per key
    fits a block (window × per-key rate bounds it; cap upstream for
    adversarial keys)."""
    if lower_offset > upper_offset:
        raise ValueError("lower_offset must be <= upper_offset")
    lsch = left_schema if left_schema is not None else left_ds.schema()
    rsch = right_schema if right_schema is not None else right_ds.schema()
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    overlap = (set(ltypes) & set(rtypes)) - {by}
    if overlap:
        raise ValueError(f"non-key column name overlap between sides: {sorted(overlap)}")
    reserved = {"_asof_by", "_asof_on", "_asof_side", "_asof_ron"}
    bad = (set(ltypes) | set(rtypes)) & reserved
    if bad:
        raise ValueError(f"input columns collide with reserved names: {sorted(bad)}")

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

    def tag(side: int, key: str, on: str):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

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

    tagged = left_ds.map_batches(tag(0, by, left_on), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1, by, right_on), batch_format="pyarrow")
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

    lo_off = np.int64(lower_offset)
    hi_off = np.int64(upper_offset)
    on_np_unit = (
        f"datetime64[{ltypes[left_on].unit}]"
        if pa.types.is_timestamp(ltypes[left_on])
        else None
    )

    def _on_int64(arr: np.ndarray) -> np.ndarray:
        # offsets are in the ARROW on-column's unit; pandas may hand the
        # column back as datetime64[ns] after the exchange, which would
        # shrink a microsecond window 1000x — normalize before viewing
        if on_np_unit is not None:
            arr = arr.astype(on_np_unit)
        return arr.view(np.int64)

    def join_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        batch = block.to_pandas()
        side = batch["_asof_side"].to_numpy()
        lhs = batch.loc[side == 0]
        rhs = batch.loc[side == 1]
        if not len(lhs) or not len(rhs):
            return out_schema.empty_table()
        RK = rhs["_asof_by"].to_numpy()
        RT = _on_int64(rhs["_asof_on"].to_numpy())
        order = np.lexsort((RT, RK))
        RK, RT = RK[order], RT[order]
        rhs = rhs.iloc[order]
        LK = lhs["_asof_by"].to_numpy()
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
        ridx = starts + (np.arange(counts[keep].sum()) - np.repeat(csum, counts[keep]))
        lout = lhs.iloc[lidx][["_asof_by", "_asof_on", *lpayload]].reset_index(drop=True)
        rout = rhs.iloc[ridx][["_asof_ron", *rpayload]].reset_index(drop=True)
        out = pd.concat([lout, rout], axis=1).rename(
            columns={"_asof_by": by, "_asof_on": left_on, "_asof_ron": right_on}
        )
        return pa.Table.from_pandas(
            out[[f.name for f in out_schema]], schema=out_schema, preserve_index=False
        )

    from ..grouping import map_copartitioned

    return map_copartitioned(tagged, "_asof_by", join_block, batch_format="pyarrow")
