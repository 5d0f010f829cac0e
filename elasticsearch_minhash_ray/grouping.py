"""Typed group-map primitive: ``groupby(key).map_groups(fn)`` without
schema-less empty blocks.

Ray's ``GroupedData.map_groups`` sorts by key and maps whole blocks, but its
group-splitting wrapper yields NOTHING for a sorted partition that received
zero rows (more sort partitions than distinct keys), so the map operator
builds an EMPTY, SCHEMA-LESS output block. Downstream that block defeats
block-schema dedup and triggers the streaming executor's
"different schema … PandasBlockSchema(names=[])" warning + slow schema
unification on every union/sort that sees it.

:func:`map_part_groups` performs the exact same plan (sort by key →
map whole blocks → slice per key run → UDF per group) but ALSO invokes the
UDF on empty blocks, so the UDF's own typed-empty return (every stage
callable in this package returns its declared schema for ``num_rows == 0``)
keeps all output blocks uniformly typed.

Contract for ``fn``: a callable ``pa.Table -> pa.Table`` that (a) returns a
constant schema, and (b) handles a zero-row (possibly zero-column) input by
returning its typed empty table WITHOUT touching input columns.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa


def map_part_groups(ds, key: str, fn: Callable[[pa.Table], pa.Table]):
    """``ds.groupby(key).map_groups(fn, batch_format="pyarrow")`` with typed
    empty outputs. ``key`` must be a numeric column (the int32/int64
    partition ids every wide stage here shuffles on)."""

    def apply_groups(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return fn(block)  # fn returns its TYPED empty table
        col = block[key].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, col[1:] != col[:-1]])
        ends = np.r_[starts[1:], len(col)]
        outs = [fn(block.slice(int(s), int(e - s))) for s, e in zip(starts, ends)]
        return pa.concat_tables(outs)

    apply_groups.__name__ = getattr(fn, "__name__", type(fn).__name__)
    # same exchange Ray's map_groups performs: a global sort on the key
    # co-locates each key's rows inside one output block
    return ds.sort(key).map_batches(
        apply_groups, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
