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
