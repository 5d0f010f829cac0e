"""Checkpoint / lineage for resumable runs (SURVEY.md §4, north_rule).

Layout per checkpointed stage::

    <out_dir>/<stage>/              e.g. signatures/shard=3/
        *.parquet                   stage output
        _lineage.json               written LAST, atomically (tmp+rename) —
                                    its presence with a matching fingerprint
                                    marks the partition complete

A restarted run calls :func:`is_complete` per stage/shard and skips finished
work; fingerprints cover the full pipeline config + the caller-supplied input
identity, so a config change invalidates stale checkpoints instead of
silently reusing them.

Determinism: checkpointed writes sort by a stable key and write a single file
per shard so an interrupted+resumed run is byte-identical to an uninterrupted
one (FIXTURES.md F-RESUME). The shard is the parallel unit — sizing shards
(``num_shards``) keeps single-file writes small while the rest of the
pipeline runs at full width.

Paths use the local filesystem API (os.makedirs / os.replace atomic publish);
on a multi-node cluster point ``out_dir`` at shared storage (NFS) or swap the
writers for pyarrow.fs-based ones — the lineage protocol is unchanged.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict, is_dataclass
from typing import Any


def fingerprint(*parts: Any) -> str:
    def norm(x):
        if is_dataclass(x) and not isinstance(x, type):
            return {"__dc__": type(x).__name__, **asdict(x)}
        return x

    blob = json.dumps([norm(p) for p in parts], sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:24]


def lineage_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, "_lineage.json")


def is_complete(stage_dir: str, fp: str) -> bool:
    try:
        with open(lineage_path(stage_dir)) as f:
            return json.load(f).get("fingerprint") == fp
    except (FileNotFoundError, json.JSONDecodeError):
        return False


def mark_complete(stage_dir: str, fp: str, **meta: Any) -> None:
    os.makedirs(stage_dir, exist_ok=True)
    payload = {"fingerprint": fp, "finished_at": time.time(), **meta}
    tmp = lineage_path(stage_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2)
    os.replace(tmp, lineage_path(stage_dir))  # atomic publish


def read_lineage(stage_dir: str) -> dict | None:
    try:
        with open(lineage_path(stage_dir)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def write_sorted_single_file(table, stage_dir: str, sort_keys: list[str], fp: str, **meta: Any):
    """Deterministic shard write: sort by stable keys, one parquet file,
    then atomically publish the lineage marker."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(stage_dir, exist_ok=True)
    if len(table) and sort_keys:
        table = table.take(pc.sort_indices(table, sort_keys=[(k, "ascending") for k in sort_keys]))
    tmp = os.path.join(stage_dir, "data.parquet.tmp")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(stage_dir, "data.parquet"))
    mark_complete(stage_dir, fp, rows=len(table), **meta)


def write_sorted_shard_remote(ds, stage_dir: str, sort_keys: list[str], fp: str, **meta: Any):
    """Scale-safe variant of :func:`write_sorted_single_file`: the shard's
    blocks are concatenated + sorted + written inside ONE REMOTE TASK (a
    worker holds one shard, never the driver). The shard is the memory unit —
    size ``num_shards`` so a shard fits a worker's heap. Blocks stream
    worker→worker through the object store; the driver only passes refs."""
    import ray

    refs = ds.to_arrow_refs()

    @ray.remote
    def _write(stage_dir, sort_keys, fp, meta, *tables):
        import pyarrow as pa

        tables = [t for t in tables if t.num_columns > 0]
        table = pa.concat_tables(tables) if tables else pa.table({})
        write_sorted_single_file(table, stage_dir, sort_keys, fp, **meta)
        return len(table)

    return ray.get(_write.remote(stage_dir, sort_keys, fp, meta, *refs))
