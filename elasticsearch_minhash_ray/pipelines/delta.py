"""Persistent LSH band index + delta (incremental) near-dup.

The daily-ingest path for a corpus that already has 10^12 indexed files:
re-running :func:`near_dup_pipeline` on old ∪ new re-tokenizes, re-hashes
and — worse — re-SHUFFLES every old band row (~n_bands × 33 B × corpus rows,
i.e. ~264 TB of all-to-all at 10^12 docs) to discover edges that are ≥ 99%
already known. This module splits the work by persisting the banded
signature table once, partitioned by the SAME ``bucket_part`` key the LSH
bucket exchange uses:

    index_dir/
      _lineage.json                 (band-config fingerprint, partitions, runs)
      part=K/base-<run>.parquet     (bucket, doc_key, sig) sorted by bucket
      part=K/delta-<run>.parquet    appended by later deltas

A delta run then:

1. signatures + band rows for the NEW docs only (compute ∝ delta);
2. ONE bucket_part exchange over the new band rows only (shuffle ∝ delta,
   not corpus — the equal-keys-one-block sort invariant co-locates each
   partition's new rows in one task);
3. each partition task reads its ``part=K`` shard of the index (sequential
   pruned parquet read, no shuffle), drops old rows whose bucket has no new
   member (vectorized searchsorted — typically almost all of them), and
   pairs with :class:`~..stages.lsh.BucketPairer` in delta mode: only pairs
   with ≥ 1 new member are emitted/verified, because old-old edges already
   live in the previous run's edge checkpoint;
4. optionally appends its new band rows to the shard (atomic per-(part,
   run) file — task retries overwrite with identical content), so the next
   delta sees today's docs as "old".

Crash consistency: ``_lineage.json`` is the COMMIT POINT. A delta appends
its run record to lineage only after every shard is written, and readers
only treat shard files whose run_id is committed in lineage as "old" —
so a run that crashes mid-write leaves orphaned ``delta-<run>.parquet``
files that are ignored (its docs' edges were never emitted either, keeping
"old rows ⟺ old-old edges already checkpointed" intact). A failed delta is
retried with ANY run_id: retrying with the same run_id atomically
overwrites the orphans; retrying with a new one leaves them as dead bytes
(a warning names them). Single writer at a time is assumed (the lineage
append is last-writer-wins, as is the duplicate-run_id check).

Clusters come from old-edges ∪ new-edges through the same
:func:`cluster_edges` used by the full pipeline. Equivalence to a full run
on old ∪ new is exact for the edge SET when no bucket exceeds
``bucket_cap`` and holds at cluster level in general
(tests/test_delta_index.py).

Scale notes: the per-delta index READ is O(index bytes) spread over P
sequential column-pruned scans — unavoidable without a serving layer, but
it is I/O, not an exchange; rows are filtered to candidate buckets right
after the read. Pick ``LSHConfig.num_partitions`` at build time for the
FULL corpus size (≈ band-table bytes / 32 MB) — it is frozen into the
index layout. Not yet composed with ``n_salts`` (salted skew re-keying),
``verify_mode='jaccard'`` (shingle sets are not stored in the index) or
``collapse_exact``; all three raise.
"""

from __future__ import annotations

import posixpath
from dataclasses import dataclass, replace

import numpy as np
import pyarrow as pa

from ..grouping import map_part_groups
from ..stages.lsh import BandStage, BucketPairer
from ..state.checkpoint import (
    _fs_for,
    _join,
    _write_parquet,
    fingerprint,
    mark_complete,
    read_lineage,
)
from .neardup import (
    PipelineConfig,
    cluster_edges,
    compute_signatures,
    dedupe_edges_ds,
)

_EMPTY_EDGES = pa.table(
    {
        "src": pa.array([], pa.int64()),
        "dst": pa.array([], pa.int64()),
        "sim": pa.array([], pa.float64()),
    }
)

_EMPTY_WRITTEN = pa.table(
    {"shard": pa.array([], pa.int32()), "rows": pa.array([], pa.int64())}
)

_BAND_COLS = ["bucket", "doc_key", "sig"]


def band_index_fingerprint(cfg: PipelineConfig) -> str:
    """What the stored band rows are a function of: the signature config and
    the banding layout. Verify thresholds/caps are pair-time knobs and do
    NOT invalidate an index."""
    return fingerprint(
        cfg.minhash, cfg.lsh.n_bands, cfg.lsh.num_partitions, "band-index-v1"
    )


def _delta_unsupported(cfg: PipelineConfig) -> None:
    if cfg.lsh.n_salts > 1:
        raise NotImplementedError("band index does not compose with n_salts > 1 yet")
    if cfg.lsh.verify_mode != "bbit":
        raise NotImplementedError("band index stores signatures only (verify_mode='bbit')")
    if cfg.collapse_exact:
        raise NotImplementedError("band index does not compose with collapse_exact yet")


class _PartWriter:
    """Per-``bucket_part``-group callable: writes the group's band rows as
    one parquet file (sorted by (bucket, doc_key) so delta readers could
    row-group-prune) under ``part=K/`` and returns a (shard, rows) receipt
    row for the duplicate-shard hard guard."""

    def __init__(self, index_dir: str, file_name: str):
        self.index_dir = index_dir
        self.file_name = file_name

    def __call__(self, block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _EMPTY_WRITTEN
        import pyarrow.compute as pc

        k = int(block["bucket_part"][0].as_py())
        sub = block.select(_BAND_COLS)
        sub = sub.take(
            pc.sort_indices(
                sub, sort_keys=[("bucket", "ascending"), ("doc_key", "ascending")]
            )
        )
        f, p, atomic = _fs_for(self.index_dir)
        d = _join(p, f"part={k}")
        f.create_dir(d, recursive=True)
        _write_parquet(f, sub, _join(d, self.file_name), atomic)
        return pa.table(
            {
                "shard": pa.array([k], pa.int32()),
                "rows": pa.array([sub.num_rows], pa.int64()),
            }
        )


def _guard_unique_shards(written) -> None:
    # same hard guard as write_edges_checkpoint: if Ray's sort ever splits an
    # equal-key run across blocks, a shard file would be written twice and
    # the second atomic write would silently drop the first one's rows
    if len(written) and written["shard"].duplicated().any():
        dup = sorted(written.loc[written["shard"].duplicated(), "shard"].unique().tolist())
        raise RuntimeError(
            f"band-index shard(s) {dup} written more than once: Ray's sort "
            "split an equal-key run across blocks (grouping.py invariant)"
        )


def build_band_index(sig_ds, cfg: PipelineConfig, index_dir: str, run_id: str = "base") -> dict:
    """Signatures → persistent band index at ``index_dir``. One
    ``bucket_part`` exchange (the same one a full run would do), written
    shard-per-partition instead of paired. Returns the lineage dict."""
    _delta_unsupported(cfg)
    fp = band_index_fingerprint(cfg)
    bands = sig_ds.map_batches(
        BandStage(lsh=cfg.lsh, cfg=cfg.minhash),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    written = map_part_groups(
        bands, "bucket_part", _PartWriter(index_dir, f"base-{run_id}.parquet")
    ).to_pandas()
    _guard_unique_shards(written)
    # parts no band row hashed to get explicit empty files: the tree is a
    # function of the config, not of which buckets happened to occur
    f, p, atomic = _fs_for(index_dir)
    present = set(written["shard"]) if len(written) else set()
    empty = pa.table(
        {
            "bucket": pa.array([], pa.int64()),
            "doc_key": pa.array([], pa.int64()),
            "sig": pa.array([], pa.binary()),
        }
    )
    for k in range(cfg.lsh.num_partitions):
        if k not in present:
            d = _join(p, f"part={k}")
            f.create_dir(d, recursive=True)
            _write_parquet(f, empty, _join(d, f"base-{run_id}.parquet"), atomic)
    rows = int(written["rows"].sum()) if len(written) else 0
    mark_complete(
        index_dir,
        fp,
        num_partitions=cfg.lsh.num_partitions,
        rows=rows,
        runs=[{"run_id": run_id, "rows": rows, "file": f"base-{run_id}.parquet"}],
    )
    return read_lineage(index_dir)


class _DeltaPartPairer:
    """Per-``bucket_part``-group callable over the NEW band rows: reads the
    partition's index shard, keeps only old rows in buckets a new doc also
    hit, optionally appends the new rows to the shard, and emits verified
    delta edges (>= 1 new member per pair)."""

    def __init__(
        self,
        index_dir: str,
        lsh,
        width: int,
        run_file: str | None,  # None = don't update the index
        committed: frozenset[str],  # shard file names committed in lineage
    ):
        self.index_dir = index_dir
        self.run_file = run_file
        self.committed = committed
        self._pairer = BucketPairer(lsh, width, delta_col="is_new")

    def _read_old(self, part: int, new_buckets: np.ndarray) -> pa.Table | None:
        import warnings

        import pyarrow.parquet as pq
        from pyarrow import fs as pafs

        f, p, _ = _fs_for(self.index_dir)
        d = _join(p, f"part={part}")
        if f.get_file_info(d).type != pafs.FileType.Directory:
            return None
        tbls = []
        for info in f.get_file_info(pafs.FileSelector(d, recursive=False)):
            name = posixpath.basename(info.path)
            if not name.endswith(".parquet") or name == self.run_file:
                continue  # never read this run's own (possibly retried) file
            if name not in self.committed:
                # orphan from a delta that crashed before its lineage commit:
                # its docs' edges were never emitted, so treating it as "old"
                # would silently lose those edges from every future cluster.
                # Ignore it (retrying with the crashed run's run_id overwrites
                # it; otherwise it is dead bytes).
                warnings.warn(
                    f"band index {self.index_dir} part={part}: ignoring "
                    f"uncommitted shard file {name!r} (crashed delta run?) — "
                    "retry that delta, or remove the file",
                    RuntimeWarning,
                )
                continue
            t = pq.read_table(info.path, columns=_BAND_COLS, filesystem=f)
            if t.num_rows == 0:
                continue
            # drop old rows whose bucket no new doc hit — they can only form
            # old-old pairs, which the delta never emits
            b = np.asarray(t["bucket"], dtype=np.int64)
            pos = np.searchsorted(new_buckets, b)
            hit = (pos < len(new_buckets)) & (
                new_buckets[np.minimum(pos, len(new_buckets) - 1)] == b
            )
            if hit.any():
                tbls.append(t.filter(pa.array(hit)))
        return pa.concat_tables(tbls) if tbls else None

    def __call__(self, block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _EMPTY_EDGES
        import pyarrow.compute as pc

        part = int(block["bucket_part"][0].as_py())
        new = block.select(_BAND_COLS)
        if self.run_file is not None:
            sub = new.take(
                pc.sort_indices(
                    new, sort_keys=[("bucket", "ascending"), ("doc_key", "ascending")]
                )
            )
            f, p, atomic = _fs_for(self.index_dir)
            d = _join(p, f"part={part}")
            f.create_dir(d, recursive=True)
            _write_parquet(f, sub, _join(d, self.run_file), atomic)
        new_buckets = np.unique(np.asarray(new["bucket"], dtype=np.int64))
        old = self._read_old(part, new_buckets)
        ones = pa.array(np.ones(new.num_rows, np.int8), pa.int8())
        combined = new.append_column("is_new", ones)
        if old is not None:
            zeros = pa.array(np.zeros(old.num_rows, np.int8), pa.int8())
            combined = pa.concat_tables([combined, old.append_column("is_new", zeros)])
        return self._pairer(combined)


@dataclass
class DeltaResult:
    signatures: object  # new docs' signature Dataset (materialized)
    new_edges: object  # verified edges with >= 1 new endpoint (materialized)
    edges: object  # old ∪ new edges (lazy) — None when old_edges not given
    clusters: object  # CC over `edges` — None when old_edges not given
    metrics: dict


def near_dup_delta(
    new_corpus_ds,
    index_dir: str,
    cfg: PipelineConfig | None = None,
    *,
    old_edges=None,  # Dataset | parquet path | None
    update_index: bool = True,
    run_id: str = "delta",
) -> DeltaResult:
    """Incremental near-dup of ``new_corpus_ds`` against the band index at
    ``index_dir`` (see module docstring for the dataflow and its cost
    model). ``old_edges`` is the previous run's verified edge set (Dataset
    or parquet path); when given, ``clusters`` is the connected components
    of old ∪ new — the same assignment a full run on old ∪ new produces."""
    import time as _time

    cfg = cfg or PipelineConfig()
    _delta_unsupported(cfg)
    lin = read_lineage(index_dir)
    fp = band_index_fingerprint(cfg)
    if lin is None:
        raise ValueError(f"no band index at {index_dir} (run build_band_index first)")
    if lin.get("fingerprint") != fp:
        raise ValueError(
            "band index config mismatch: index was built with a different "
            f"(minhash, n_bands, num_partitions) — {lin.get('fingerprint')} != {fp}"
        )
    if any(r.get("run_id") == run_id for r in lin.get("runs", [])):
        raise ValueError(f"run_id {run_id!r} already applied to this index")
    _t0 = _time.perf_counter()
    sig_cols = (*cfg.keep_columns, f"minhash_{cfg.minhash.name}")
    sigs = compute_signatures(new_corpus_ds, cfg, keep_columns=sig_cols).materialize()
    if cfg.sig_concurrency is not None:
        import gc as _gc

        _gc.collect()  # release the finished pool's pinned CPUs (see near_dup_pipeline)
    _t_sig = _time.perf_counter()
    bands = sigs.map_batches(
        BandStage(lsh=cfg.lsh, cfg=cfg.minhash),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    run_file = f"delta-{run_id}.parquet" if update_index else None
    # lineage is the commit point: only shard files whose run_id is recorded
    # there are "old". Run records carry their file name; tolerate older
    # lineages (pre-"file") by allowing both prefixes for a committed run_id.
    committed = frozenset(
        r["file"]
        if "file" in r
        else pfx + f"{r['run_id']}.parquet"
        for r in lin.get("runs", [])
        for pfx in (("base-", "delta-") if "file" not in r else ("",))
    )
    raw = map_part_groups(
        bands,
        "bucket_part",
        _DeltaPartPairer(index_dir, cfg.lsh, cfg.minhash.full_width, run_file, committed),
    )
    # materialize = execution barrier: forces the per-part pairing (and the
    # index-append side effects) to run exactly once; edges stay distributed
    deduped = dedupe_edges_ds(raw, cfg.lsh.num_partitions).materialize()
    from .neardup import _edges_metric_filter, _metrics_rows

    new_edges = deduped.map_batches(_edges_metric_filter, batch_format="pyarrow")
    mtbl = deduped.map_batches(_metrics_rows, batch_format="pyarrow").to_pandas()
    dropped = int(mtbl["dropped"].sum()) if len(mtbl) else 0
    _t_edges = _time.perf_counter()
    if update_index:
        lin["runs"].append(
            {"run_id": run_id, "rows": int(bands.count()), "file": run_file}
        )
        lin["rows"] = int(lin.get("rows", 0)) + lin["runs"][-1]["rows"]
        mark_complete(
            index_dir,
            fp,
            num_partitions=lin["num_partitions"],
            rows=lin["rows"],
            runs=lin["runs"],
        )
    edges = clusters = None
    if old_edges is not None:
        if isinstance(old_edges, str):
            from ..sources.corpus import read_parquet_auto

            old_edges = read_parquet_auto(old_edges, columns=["src", "dst", "sim"])
        edges = old_edges.union(new_edges)
        clusters = cluster_edges(edges, cfg)
    metrics = {
        "dropped_pairs": dropped,
        "n_new_edges": new_edges.count(),
        "sig_sec": round(_t_sig - _t0, 3),
        "edges_sec": round(_t_edges - _t_sig, 3),
    }
    return DeltaResult(
        signatures=sigs, new_edges=new_edges, edges=edges, clusters=clusters, metrics=metrics
    )
