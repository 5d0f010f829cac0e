"""Key-co-location primitives replacing ``groupby(key).map_groups(fn)``.

Ray's ``GroupedData.map_groups`` sorts by key and maps whole blocks, but its
group-splitting wrapper yields NOTHING for a sorted partition that received
zero rows (more sort partitions than distinct keys), so the map operator
builds an EMPTY, SCHEMA-LESS output block (the
``PandasBlockSchema(names=[])`` unification warning + slow schema-unify on
every union/sort that sees it). It also invokes the UDF once per distinct
key — pure overhead when the UDF groups internally, which every wide-stage
callable in this package does (they lexsort / groupby / searchsorted over
the whole batch anyway, because that IS the vectorized formulation).

Two primitives, same exchange (one range-partitioning sort on the key —
verified to never split equal keys across output blocks):

- :func:`map_copartitioned` — whole-block map. The UDF sees each key's rows
  co-located in ONE block but may receive MANY keys per call and must group
  internally. One UDF call per block; the default here.
- :func:`map_part_groups` — per-key-run map for UDFs with true per-group
  semantics (e.g. the checkpoint shard writer: one output file per key).

Honest limit (both): the SORT itself emits schema-less zero-row bundles
when it has more output partitions than distinct keys, and ``map_batches``
forwards those WITHOUT invoking the UDF — no user code can retype them.
They are rare (block counts are data-sized; partition-key spaces are ≥ the
block count) and harmless; these primitives remove the systematic
wrapper-made case, not the sort-made one.
"""

from __future__ import annotations

import warnings
from typing import Callable

import numpy as np
import pyarrow as pa

# The co-location invariant both primitives rest on — Ray's range-partitioning
# sort never splits a run of EQUAL keys across output blocks — is an internal
# behavior, not a documented contract. Verified against these Ray versions
# (tests/test_queries.py oracle suite + the checkpoint duplicate-shard hard
# guard in state/checkpoint.py would both catch a break). Many consumers
# (keep_latest, asof/range joins, tfidf, quantiles, ...) would be SILENTLY
# WRONG if the invariant broke — duplicate keep rows, undercounted sums,
# duplicated join output — so on an unverified Ray the primitives REFUSE to
# run rather than warn: set GRAFT_ALLOW_UNVERIFIED_RAY_SORT=1 to downgrade
# to a one-time warning after validating the invariant on your version
# (the checkpoint duplicate-shard guard and the oracle suite are the
# validation harness).
_VERIFIED_RAY_PREFIXES = ("2.49.",)
_version_checked = False


def _check_ray_version() -> None:
    global _version_checked
    if _version_checked:
        return
    _version_checked = True
    try:
        import ray

        v = ray.__version__
    except Exception:
        return
    if not v.startswith(_VERIFIED_RAY_PREFIXES):
        import os

        msg = (
            f"grouping primitives verified on Ray {_VERIFIED_RAY_PREFIXES}, running "
            f"{v}: the sort equal-keys-one-block invariant may not hold, which "
            "would make co-partitioned aggregations silently wrong (duplicate "
            "keys across blocks). Validate the invariant on this Ray version "
            "(run the oracle test suite) and set GRAFT_ALLOW_UNVERIFIED_RAY_SORT=1 "
            "to proceed."
        )
        if os.environ.get("GRAFT_ALLOW_UNVERIFIED_RAY_SORT"):
            warnings.warn(msg, RuntimeWarning, stacklevel=4)
        else:
            raise RuntimeError(msg)


def map_copartitioned(ds, key: str, fn: Callable, *, batch_format: str = "pyarrow"):
    """``sort(key)`` + whole-block ``map_batches(fn)``: every row of a given
    key lands in exactly one block, so a UDF that groups internally computes
    the same result as ``groupby(key).map_groups(fn)`` with one call per
    BLOCK instead of one per key."""
    _check_ray_version()
    return ds.sort(key).map_batches(
        fn, batch_size=None, batch_format=batch_format, zero_copy_batch=True
    )


def map_part_groups(ds, key: str, fn: Callable[[pa.Table], pa.Table]):
    """``ds.groupby(key).map_groups(fn, batch_format="pyarrow")`` for UDFs
    with per-group semantics. ``key`` must be a numeric column. ``fn`` must
    return a constant schema and defensively handle a zero-row input by
    returning its typed empty table without touching input columns."""

    def apply_groups(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return fn(block)  # fn returns its TYPED empty table
        col = block[key].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, col[1:] != col[:-1]])
        ends = np.r_[starts[1:], len(col)]
        outs = [fn(block.slice(int(s), int(e - s))) for s, e in zip(starts, ends)]
        return pa.concat_tables(outs)

    apply_groups.__name__ = getattr(fn, "__name__", type(fn).__name__)
    _check_ray_version()
    return ds.sort(key).map_batches(
        apply_groups, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
