"""Checkpoint / lineage for resumable runs (SURVEY.md §4, north_rule).

Layout per checkpointed stage::

    <out_dir>/<stage>/              e.g. signatures/shard=3/
        *.parquet                   stage output
        _lineage.json               written LAST, atomically — its presence
                                    with a matching fingerprint marks the
                                    partition complete

A restarted run calls :func:`is_complete` per stage/shard and skips finished
work; fingerprints cover the full pipeline config + the caller-supplied input
identity, so a config change invalidates stale checkpoints instead of
silently reusing them.

Determinism: checkpointed writes sort by a stable key and write a single file
per shard so an interrupted+resumed run is byte-identical to an uninterrupted
one (FIXTURES.md F-RESUME). The shard is the parallel unit — sizing shards
(``num_shards``) keeps single-file writes small while the rest of the
pipeline runs at full width.

Filesystem routing: every path goes through ``pyarrow.fs`` — plain paths use
LocalFileSystem, URIs (``s3://…``, ``hdfs://…``, ``file://…``) resolve via
``FileSystem.from_uri``, so ``ray job submit … --output s3://bucket/run1``
works as README advertises. Publish protocol per FS class:

- local: write ``*.tmp`` then rename (``fs.move`` == atomic ``os.replace``);
- object stores (no atomic rename): data files are written directly under
  their final names and the ``_lineage.json`` marker is written LAST with a
  single PUT (atomic on S3-class stores). Readers only trust a stage dir
  whose lineage fingerprint matches, so a torn run is simply re-done.
"""

from __future__ import annotations

import hashlib
import json
import os
import posixpath
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


# ---------------------------------------------------------------------------
# filesystem routing
# ---------------------------------------------------------------------------


def _fs_for(path: str):
    """(filesystem, fs-internal path, atomic_rename) for a path or URI."""
    from pyarrow import fs as pafs

    if "://" in path:
        f, p = pafs.FileSystem.from_uri(path)
        local = isinstance(f, pafs.LocalFileSystem)
        return f, p, local
    return pafs.LocalFileSystem(), os.path.abspath(path), True


def _join(base: str, *parts: str) -> str:
    # fs-internal paths are always /-separated (posix even on local)
    return posixpath.join(base, *parts)


def lineage_path(stage_dir: str) -> str:
    return _join(stage_dir, "_lineage.json")


def _write_bytes(f, path: str, data: bytes, atomic_rename: bool) -> None:
    """Publish a small file: tmp+rename where rename is atomic, single direct
    write (one PUT) where it is not."""
    if atomic_rename:
        tmp = path + ".tmp"
        with f.open_output_stream(tmp) as out:
            out.write(data)
        f.move(tmp, path)
    else:
        with f.open_output_stream(path) as out:
            out.write(data)


def _write_parquet(f, table, path: str, atomic_rename: bool) -> None:
    import pyarrow.parquet as pq

    if atomic_rename:
        tmp = path + ".tmp"
        pq.write_table(table, tmp, filesystem=f)
        f.move(tmp, path)
    else:
        pq.write_table(table, path, filesystem=f)


def is_complete(stage_dir: str, fp: str) -> bool:
    lin = read_lineage(stage_dir)
    return lin is not None and lin.get("fingerprint") == fp


def mark_complete(stage_dir: str, fp: str, **meta: Any) -> None:
    f, p, atomic = _fs_for(stage_dir)
    f.create_dir(p, recursive=True)
    payload = {"fingerprint": fp, "finished_at": time.time(), **meta}
    _write_bytes(f, _join(p, "_lineage.json"), json.dumps(payload, indent=2).encode(), atomic)


def read_lineage(stage_dir: str) -> dict | None:
    f, p, _ = _fs_for(stage_dir)
    try:
        with f.open_input_stream(_join(p, "_lineage.json")) as s:
            return json.loads(s.read())
    except (FileNotFoundError, OSError, json.JSONDecodeError):
        return None


def write_sorted_single_file(table, stage_dir: str, sort_keys: list[str], fp: str, **meta: Any):
    """Deterministic shard write: sort by stable keys, one parquet file,
    then publish the lineage marker LAST."""
    import pyarrow.compute as pc

    f, p, atomic = _fs_for(stage_dir)
    f.create_dir(p, recursive=True)
    if len(table) and sort_keys:
        table = table.take(pc.sort_indices(table, sort_keys=[(k, "ascending") for k in sort_keys]))
    _write_parquet(f, table, _join(p, "data.parquet"), atomic)
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


def edges_files(stage_dir: str) -> list[str]:
    """Data files of an edges checkpoint, single-file or sharded layout.
    Returned paths are readable by ``read_parquet_auto`` (original URI scheme
    preserved for remote stores)."""
    from pyarrow import fs as pafs

    f, p, _ = _fs_for(stage_dir)
    prefix = ""
    if "://" in stage_dir:
        scheme = stage_dir.split("://", 1)[0]
        if scheme != "file":
            prefix = scheme + "://"

    def ext(fs_path: str) -> str:
        return prefix + fs_path if prefix else fs_path

    single = _join(p, "data.parquet")
    if f.get_file_info(single).type == pafs.FileType.File:
        return [ext(single)]
    if f.get_file_info(p).type != pafs.FileType.Directory:
        return []
    infos = f.get_file_info(pafs.FileSelector(p, recursive=False))
    parts = sorted(
        posixpath.basename(i.path)
        for i in infos
        if i.type == pafs.FileType.Directory and posixpath.basename(i.path).startswith("part=")
    )
    return [ext(_join(p, d, "data.parquet")) for d in parts]


def write_edges_checkpoint(
    edges_ds, stage_dir: str, fp: str, rows_per_shard: int = 5_000_000
) -> tuple[list[str], int]:
    """Deterministic, driver-bounded edges checkpoint.

    Small edge sets (<= rows_per_shard) keep the legacy single
    ``data.parquet``; larger sets write hash-sharded ``part=K/data.parquet``
    files, each concatenated + sorted by (src, dst) inside ONE worker task —
    the driver never holds edge rows, and the output is partitioned so a
    downstream consumer (or a resumed cluster job) streams it. Shard
    assignment is a content hash of (src, dst), so resumed and uninterrupted
    runs produce byte-identical trees regardless of block arrival order.

    Metric rows (src == -1, dst = dropped-pair count) are excluded from the
    data files; their sum lands on the stage lineage as ``dropped_pairs``.
    Returns (data file paths, dropped_pairs).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyarrow import fs as pafs

    f, p, atomic = _fs_for(stage_dir)

    # a prior (differently-fingerprinted) run may have left the OTHER layout
    # behind — a stale data.parquet next to new part=K dirs, or more part=K
    # dirs than this run writes. Clean them first so edges_files() can never
    # mix runs; the lineage marker goes first, so an interrupt mid-clean just
    # re-runs this stage.
    if f.get_file_info(p).type == pafs.FileType.Directory:
        lp = _join(p, "_lineage.json")
        if f.get_file_info(lp).type == pafs.FileType.File:
            f.delete_file(lp)
        single = _join(p, "data.parquet")
        if f.get_file_info(single).type == pafs.FileType.File:
            f.delete_file(single)
        for i in f.get_file_info(pafs.FileSelector(p, recursive=False)):
            if i.type == pafs.FileType.Directory and posixpath.basename(i.path).startswith("part="):
                f.delete_dir(i.path)

    mat = edges_ds.materialize()

    def metrics(batch: pa.Table) -> pa.Table:
        if "src" not in batch.schema.names:  # zero-column empty-group block
            return pa.table({"dropped": pa.array([0], pa.int64()), "rows": pa.array([0], pa.int64())})
        mask = pc.equal(batch["src"], -1)
        d = pc.sum(pc.if_else(mask, batch["dst"], 0)).as_py() or 0
        return pa.table({"dropped": pa.array([int(d)], pa.int64()),
                         "rows": pa.array([batch.num_rows - (pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)], pa.int64())})

    mtbl = mat.map_batches(metrics, batch_format="pyarrow").to_pandas()
    dropped = int(mtbl["dropped"].sum()) if len(mtbl) else 0
    n = int(mtbl["rows"].sum()) if len(mtbl) else 0
    shards = max(1, -(-n // rows_per_shard))

    def plain(batch: pa.Table) -> pa.Table:
        if "src" not in batch.schema.names:  # zero-column empty-group block
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        return batch.filter(pc.not_equal(batch["src"], -1)).select(["src", "dst", "sim"])

    if shards == 1:
        import ray

        refs = mat.map_batches(plain, batch_format="pyarrow").to_arrow_refs()

        @ray.remote
        def _write(stage_dir, fp, dropped, *tables):
            tables = [t for t in tables if t.num_columns > 0]
            table = pa.concat_tables(tables) if tables else pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
            write_sorted_single_file(table, stage_dir, ["src", "dst"], fp, dropped_pairs=dropped)
            return len(table)

        ray.get(_write.remote(stage_dir, fp, dropped, *refs))
        return edges_files(stage_dir), dropped

    _MIX = np.uint64(0x9E3779B97F4A7C15)

    def shard_of(batch: pa.Table) -> pa.Table:
        batch = plain(batch)
        src = np.asarray(batch["src"], dtype=np.int64).view(np.uint64)
        dst = np.asarray(batch["dst"], dtype=np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            k = (((src * _MIX) ^ dst) % np.uint64(shards)).astype(np.int32)
        return batch.append_column("eshard", pa.array(k, pa.int32()))

    def write_shard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int32()), "rows": pa.array([], pa.int64())})
        k = int(batch["eshard"][0].as_py())
        sub = batch.select(["src", "dst", "sim"])
        sub = sub.take(pc.sort_indices(sub, sort_keys=[("src", "ascending"), ("dst", "ascending")]))
        sf, sp, satomic = _fs_for(stage_dir)
        d = _join(sp, f"part={k}")
        sf.create_dir(d, recursive=True)
        _write_parquet(sf, sub, _join(d, "data.parquet"), satomic)
        return pa.table({"shard": pa.array([k], pa.int32()), "rows": pa.array([sub.num_rows], pa.int64())})

    from ..grouping import map_part_groups

    # per-key-run invocation: write_shard has true per-group semantics (one
    # output file per shard), unlike the whole-block wide stages
    written = map_part_groups(
        mat.map_batches(shard_of, batch_format="pyarrow"), "eshard", write_shard
    ).to_pandas()
    # HARD GUARD on the sort invariant map_part_groups rests on (equal keys
    # never split across sort output blocks — verified on ray 2.49.2, see
    # grouping.py): if a Ray upgrade ever splits one eshard across two
    # blocks, write_shard runs twice for that shard and the second atomic
    # write would SILENTLY overwrite the first — fail loudly instead.
    if len(written) and written["shard"].duplicated().any():
        dup = sorted(written.loc[written["shard"].duplicated(), "shard"].unique().tolist())
        raise RuntimeError(
            f"edge shard(s) {dup} written more than once: Ray's sort split an "
            "equal-key run across blocks (grouping.py invariant broken by "
            f"this Ray version) — checkpoint would lose rows"
        )
    # empty shards (no rows hashed to them) get explicit empty files so the
    # tree is a function of content, not of which hashes occurred
    present = set(written["shard"]) if len(written) else set()
    empty = pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())})
    for k in range(shards):
        if k not in present:
            d = _join(p, f"part={k}")
            f.create_dir(d, recursive=True)
            _write_parquet(f, empty, _join(d, "data.parquet"), atomic)
    mark_complete(stage_dir, fp, dropped_pairs=dropped, rows=n, shards=shards)
    return edges_files(stage_dir), dropped
