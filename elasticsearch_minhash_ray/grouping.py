"""Typed group-map primitive: ``groupby(key).map_groups(fn)`` without
wrapper-made schema-less empty blocks.

Ray's ``GroupedData.map_groups`` sorts by key and maps whole blocks, but its
group-splitting wrapper yields NOTHING for a sorted partition that received
zero rows (more sort partitions than distinct keys), so the map operator
builds an EMPTY, SCHEMA-LESS output block (the
``PandasBlockSchema(names=[])`` unification warning + slow schema-unify on
every union/sort that sees it).

:func:`map_part_groups` performs the same plan (sort by key → map whole
blocks → slice per key run → UDF per group) via plain ``map_batches``, which
never constructs empty output blocks of its own, so all UDF outputs are
uniformly typed.

Honest limit: the SORT itself also emits schema-less zero-row bundles when
it has more output partitions than distinct keys, and ``map_batches``
forwards those WITHOUT invoking the UDF — no user code can retype them.
They are rare in practice because ``read_parquet_auto`` sizes block counts
to the data (partition keys here are ``hash % num_partitions`` with
``num_partitions`` ≥ block count ⇒ sorted ranges are dense), and harmless
when they do occur; this primitive removes the systematic wrapper-made case,
not the sort-made one.

Contract for ``fn``: a callable ``pa.Table -> pa.Table`` that (a) returns a
constant schema, and (b) defensively handles a zero-row (possibly
zero-column) input by returning its typed empty table WITHOUT touching input
columns.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa


def map_part_groups(ds, key: str, fn: Callable[[pa.Table], pa.Table]):
    """``ds.groupby(key).map_groups(fn, batch_format="pyarrow")`` with typed
    (UDF-produced) outputs only. ``key`` must be a numeric column (the
    int32/int64 partition ids every wide stage here shuffles on)."""

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
