"""End-to-end near-duplicate pipeline (the flagship):

    corpus ─▶ prepare(keys) ─▶ SignatureStage (actor pool, zero-copy Arrow)
           ─▶ BandStage (flat-map to band rows) ─▶ groupby(bucket_part)
           ─▶ BucketPairer (capped all-pairs + exact b-bit verify)
           ─▶ groupby(edge_part) dedupe ─▶ edges
           ─▶ connected components ─▶ clusters

Reference parity: the signature column is bit-for-bit the plugin's stored
bytes (MinHashFieldMapper.java:252-295); LSH/verify/cluster are the
target-mandated stages the reference leaves to ES query primitives
(SURVEY.md §2.4).

Streaming: stages are lazy Dataset transforms; nothing materializes the full
corpus. ``content`` is dropped immediately after hashing so every shuffle
moves only keys + 16-byte signatures. Checkpointed mode shards the signature
stage for partition-level resume (state/checkpoint.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..functions.minhash import MinHashConfig
from ..grouping import map_copartitioned, map_part_groups
from ..sources.corpus import prepare_batch, read_parquet_auto
from ..stages.cluster import (
    connected_components_distributed,
    connected_components_driver,
)
from ..stages.lsh import (
    BandStage,
    BucketPairer,
    EdgeDeduper,
    LSHConfig,
    ShingleSetStage,
    add_edge_part,
)
from ..stages.signature import SignatureStage
from ..state import checkpoint as ckpt


@dataclass
class PipelineConfig:
    minhash: MinHashConfig = field(default_factory=MinHashConfig)
    lsh: LSHConfig = field(default_factory=LSHConfig)
    # collapse identical signatures BEFORE banding: band only one
    # representative per distinct signature and attach the other members via
    # sim=1.0 star edges. Cluster assignments are provably identical (members
    # share the rep's signature bit-for-bit, so every band/verify decision is
    # the same) while the band shuffle shrinks by the exact-dup factor — the
    # dominant win on vendored/boilerplate-heavy code corpora. Off by default
    # because it changes the EDGE LIST representation (star instead of
    # clique for exact-dup families).
    collapse_exact: bool = False
    # None = whole-block batches (blocks are already size-bounded by
    # read_parquet_auto; slicing them further only adds python overhead)
    batch_size: int | None = None
    # autoscaling actor pool bounds for the signature stage. None = instance
    # (task) mode: Ray tears an actor pool down when its dataset finishes, so
    # a SHORT one-shot run never amortizes the spin-up (~1 s measured) — the
    # pool pays off on long executions where each actor sees thousands of
    # batches and the cross-batch token cache warms up.
    sig_concurrency: tuple[int, int] | None = (1, 32)
    num_shards: int = 1  # signature checkpoint granularity (resume unit)
    # "hash": shards = hash(doc identity) % num_shards (fixed-input resume).
    # "file": one signature shard PER INPUT PARQUET FILE — shard fingerprints
    # cover only (config, file name, file size), so APPENDING files to the
    # corpus directory reuses every existing signature checkpoint and only
    # hashes the new files (incremental ingest); edges/clusters re-derive.
    shard_by: str = "hash"
    # audit + deterministically remap 63-bit doc_key birthday collisions
    # (sources/corpus.py) between the signature and band stages. Off by
    # default: the audit costs one (doc_key, doc_id) exchange per run, and
    # collisions are a 10^11+-row phenomenon (~5e4 pairs at 10^12 docs) —
    # turn it on for production-scale corpora.
    resolve_key_collisions: bool = False
    distributed_cc: bool = False
    max_driver_edges: int = 50_000_000
    # checkpointed-mode edges layout: <= this many rows -> one deterministic
    # data.parquet; above it -> hash-sharded part=K/ files written worker-side
    # (the driver never holds edge rows either way)
    edges_rows_per_shard: int = 5_000_000
    keep_columns: tuple[str, ...] = ("doc_id", "doc_key", "content_sha256", "repo", "path", "commit", "lang")


@dataclass
class NearDupResult:
    signatures: object  # ray.data.Dataset
    edges: object  # ray.data.Dataset
    clusters: object  # ray.data.Dataset | pa.Table
    metrics: dict


def compute_signatures(corpus_ds, cfg: PipelineConfig, keep_columns: tuple[str, ...] | None = None):
    """corpus Dataset → Dataset with keys, content_sha256 and minhash_<name>.

    Signature compute is a stateful actor pool: seed state built once per
    actor (reference: once-per-index HashFunction[],
    MinHashTokenFilterFactory.java:43). ``keep_columns`` projects the output
    inside the stage (no separate select operator)."""
    prepared = corpus_ds.map_batches(prepare_batch, batch_format="pyarrow")
    if cfg.lsh.verify_mode == "jaccard":
        # exact-Jaccard verification needs the shingle-hash sets; same
        # analyzer settings as the signature so bands and sets agree
        prepared = prepared.map_batches(
            ShingleSetStage(
                tokenizer=cfg.minhash.tokenizer, shingle_n=max(cfg.minhash.shingle, 1)
            ),
            batch_format="pyarrow",
        )
    stage_kw = {"configs": [cfg.minhash], "keep_columns": keep_columns}
    if cfg.sig_concurrency is None:  # instance = task mode (see PipelineConfig)
        return prepared.map_batches(
            SignatureStage(**stage_kw),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            zero_copy_batch=True,
        )
    return prepared.map_batches(
        SignatureStage,
        fn_constructor_kwargs=stage_kw,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.sig_concurrency,
        zero_copy_batch=True,
    )


def build_edges(sig_ds, cfg: PipelineConfig, dedupe: bool = True):
    """signatures → verified edge Dataset (src, dst, sim) + a tiny metrics
    side-channel (rows with src == -1 carry dropped-pair counts from capped
    buckets; split out by :func:`split_edge_metrics`).

    ``dedupe=False`` skips the cross-band pair-dedup shuffle (a full extra
    sort barrier) and leaves ~n_bands-fold duplicate pairs in the output —
    correct input for connected components, and the driver path dedups in
    one vectorized pass on the pulled table instead."""
    width = cfg.minhash.full_width
    # BandStage holds only tiny config state → instance = stateless tasks
    bands = sig_ds.map_batches(
        BandStage(lsh=cfg.lsh, cfg=cfg.minhash),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # Re-block the band table for ITS byte size before the bucket exchange:
    # band rows are ~50x smaller than corpus rows, so inheriting the corpus
    # read's block count hands the sort N tiny blocks -> N^2 intermediate
    # shuffle objects of pure scheduling overhead (a FIXED cost that ruins
    # low-cpu scaling: measured 3.8-7.3 s -> 3.4 s stable on the 600k bench
    # at 8 cpus by coalescing 64 x 3 MB blocks to 16). Only coalesce (never
    # split); needs a cheap row count, so apply when the input is
    # materialized (the flagship path) — parquet-read inputs already get
    # data-sized blocks from read_parquet_auto.
    try:
        from ray.data.dataset import MaterializedDataset as _Mat

        n_rows = sig_ds.count() if isinstance(sig_ds, _Mat) else None  # metadata-only
    except Exception:
        n_rows = None
    if n_rows:
        import ray as _ray

        band_bytes = n_rows * cfg.lsh.n_bands * (24 + width)
        cpus = int(_ray.cluster_resources().get("CPU", 8))
        target = int(max(2 * cpus, band_bytes // (32 << 20)))
        if target < sig_ds.num_blocks():
            bands = bands.repartition(target)
    salted = cfg.lsh.n_salts > 1
    if salted:
        from ..stages.lsh import SaltHotBuckets, hot_buckets

        import ray

        # distributed heavy-hitter count: the driver pulls only the hot set
        # (≤ rows/threshold buckets). Bands are recomputed for the salting
        # pass rather than materialized — the input signatures are already
        # materialized/checkpointed upstream, so the re-derivation is one
        # cheap vectorized map over them instead of storing the n_bands×
        # band table in the object store.
        thresh = cfg.lsh.hot_threshold or 2 * cfg.lsh.bucket_cap
        hot = hot_buckets(bands, thresh, cfg.lsh.num_partitions)
        hot_ref = ray.put(hot)
        bands = bands.map_batches(
            SaltHotBuckets(hot_ref, cfg.lsh.n_salts, cfg.lsh.num_partitions),
            batch_format="pyarrow",
        )
    pairer = BucketPairer(cfg.lsh, width, emit_reps=salted)
    # PER-KEY-RUN pairing, deliberately: BucketPairer could process a whole
    # block (it lexsorts by bucket internally), but one call per block makes
    # the verify scratch grow to the block's FULL pair count — measured 11.3s
    # first-run vs 1.6s (32 tasks × ~20MB first-touch scratch pages) on the
    # sf0.1 flagship. Per-bucket_part runs keep the working set cache-sized
    # and the persistent scratch warm.
    edges = map_part_groups(bands, "bucket_part", pairer)
    if salted:
        edges = _link_salted_reps(edges, cfg, width)
    if not dedupe:
        return edges
    return dedupe_edges_ds(edges, cfg.lsh.num_partitions)


def dedupe_edges_ds(edges, num_partitions: int):
    """Distributed distinct-(src,dst)-keep-max-sim over an edge Dataset (one
    hash-partitioned shuffle; metric rows pass through summed)."""
    deduper = EdgeDeduper()
    return map_copartitioned(
        edges.map_batches(
            lambda b, n=num_partitions: add_edge_part(b, n), batch_format="pyarrow"
        ),
        "edge_part",
        deduper,
    )


def collapse_exact_signatures(sig_ds, cfg: PipelineConfig):
    """(reps, star_edges): one representative (min doc_key) per DISTINCT
    signature + sim=1.0 edges rep→member for the collapsed rows.

    Partition key = first 8 signature bytes (already a uniform hash) % P, so
    identical signatures co-locate without an extra hash pass; per-partition
    grouping is a vectorized sort + boundary scan."""
    from ..stages.signature import sig_matrix

    sig_col = f"minhash_{cfg.minhash.name}"
    width = cfg.minhash.full_width
    P = cfg.lsh.num_partitions

    def add_part(batch: pa.Table) -> pa.Table:
        mat, _lens = sig_matrix(batch[sig_col], width)
        # fixed 8-byte key buffer: configs with full_width < 8 (e.g.
        # num_of_hash=32, bit=1) zero-pad instead of failing the uint64 view
        buf = np.zeros((mat.shape[0], 8), dtype=np.uint8)
        w = min(width, 8)
        buf[:, :w] = mat[:, :w]
        key = buf.view(np.uint64).ravel()
        part = (key % np.uint64(P)).astype(np.int32)
        return batch.append_column("sig_part", pa.array(part, pa.int32()))

    def collapse(batch: pa.Table) -> pa.Table:
        mat, lens = sig_matrix(batch[sig_col], width)
        keys = batch["doc_key"].to_numpy(zero_copy_only=False)
        # group identical signatures: sort by (sig bytes, doc_key)
        order = np.lexsort((keys, lens, *[mat[:, i] for i in range(width - 1, -1, -1)]))
        mat, lens, keys = mat[order], lens[order], keys[order]
        same = (mat[1:] == mat[:-1]).all(axis=1) & (lens[1:] == lens[:-1])
        starts = np.flatnonzero(np.r_[True, ~same])
        group_of = np.cumsum(np.r_[True, ~same]) - 1
        rep_keys = keys[starts]  # min doc_key per group (sorted within group)
        is_rep = np.zeros(len(keys), dtype=bool)
        is_rep[starts] = True
        sig_arr = batch[sig_col]
        if isinstance(sig_arr, pa.ChunkedArray):
            sig_arr = sig_arr.combine_chunks()
        return pa.table(
            {
                "doc_key": pa.array(keys, pa.int64()),
                sig_col: sig_arr.take(pa.array(order)),
                "rep_key": pa.array(rep_keys[group_of], pa.int64()),
                "is_rep": pa.array(is_rep),
            }
        )

    grouped = map_copartitioned(
        sig_ds.map_batches(add_part, batch_format="pyarrow"), "sig_part", collapse
    ).materialize()

    def reps(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(batch["is_rep"]).select(["doc_key", sig_col])

    def stars(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = batch.filter(pc.invert(batch["is_rep"]))
        n = m.num_rows
        return pa.table(
            {
                "src": m["rep_key"].combine_chunks() if isinstance(m["rep_key"], pa.ChunkedArray) else m["rep_key"],
                "dst": m["doc_key"].combine_chunks() if isinstance(m["doc_key"], pa.ChunkedArray) else m["doc_key"],
                "sim": pa.array(np.ones(n), pa.float64()),
            }
        )

    return (
        grouped.map_batches(reps, batch_format="pyarrow"),
        grouped.map_batches(stars, batch_format="pyarrow"),
    )


def _link_salted_reps(mixed, cfg: PipelineConfig, width: int):
    """Second (tiny) pass of the salted-skew path: representative rows
    (src == -3: one per (bucket, salt) group, carrying the unsalted bucket +
    the rep's signature) are re-keyed by the UNSALTED bucket and pairwise
    VERIFIED — true split families reconnect, random collisions do not.
    Returns the plain (src, dst, sim) edge stream: verified edges + metric
    rows from both passes."""
    mixed = mixed.materialize()

    def plain_edges(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.not_equal(batch["src"], -3)).select(["src", "dst", "sim"])

    def rep_rows(batch: pa.Table, n=cfg.lsh.num_partitions) -> pa.Table:
        import pyarrow.compute as pc

        reps = batch.filter(pc.equal(batch["src"], -3))
        bucket = np.asarray(reps["bucket"], dtype=np.int64)
        with np.errstate(over="ignore"):
            part = (bucket.view(np.uint64) % np.uint64(n)).astype(np.int32)
        return pa.table(
            {
                "bucket_part": pa.array(part, pa.int32()),
                "bucket": reps["bucket"].combine_chunks() if isinstance(reps["bucket"], pa.ChunkedArray) else reps["bucket"],
                "doc_key": reps["dst"].combine_chunks() if isinstance(reps["dst"], pa.ChunkedArray) else reps["dst"],
                "sig": reps["sig"].combine_chunks() if isinstance(reps["sig"], pa.ChunkedArray) else reps["sig"],
            }
        )

    plain = mixed.map_batches(plain_edges, batch_format="pyarrow")
    rep_in = mixed.map_batches(rep_rows, batch_format="pyarrow")
    # no hot buckets → no rep rows. Skip the second pass entirely: a Ray
    # sort over an ALL-empty dataset emits schema-less bundles (the UDF is
    # never invoked, so typed-empty returns can't help) and the union then
    # pays the slow schema-unification path. `mixed` is materialized, so
    # this count is a metadata read, and the skip also saves a useless
    # sort + union in the common no-skew case.
    if rep_in.count() == 0:
        return plain
    rep_pairer = BucketPairer(cfg.lsh, width)
    rep_edges = map_part_groups(rep_in, "bucket_part", rep_pairer)
    return plain.union(rep_edges)


def split_edge_metrics(edges_table: pa.Table) -> tuple[pa.Table, int]:
    import pyarrow.compute as pc

    if "src" not in edges_table.schema.names:
        # empty corpus: every group was empty, _collect produced a
        # zero-column table — normalize to the typed empty edge table
        empty = pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
        )
        return empty, 0
    mask = pc.equal(edges_table["src"], -1)
    dropped = int(pc.sum(pc.if_else(mask, edges_table["dst"], 0)).as_py() or 0)
    return edges_table.filter(pc.invert(mask)), dropped


def _edges_metric_filter(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    return batch.filter(pc.not_equal(batch["src"], -1))


def cluster_edges(edges, cfg: PipelineConfig):
    if cfg.distributed_cc:
        return connected_components_distributed(edges, num_partitions=cfg.lsh.num_partitions)
    return connected_components_driver(edges, max_driver_edges=cfg.max_driver_edges)


def near_dup_pipeline(corpus_ds, cfg: PipelineConfig | None = None) -> NearDupResult:
    """In-memory (non-checkpointed) flagship pipeline; returns lazy Datasets
    plus a materialized clusters table (small: nodes-with-edges only)."""
    import time as _time

    cfg = cfg or PipelineConfig()
    if cfg.collapse_exact and cfg.lsh.verify_mode == "jaccard":
        # collapse keeps only (doc_key, signature) per distinct signature;
        # jaccard verify needs per-doc shingle sets, which identical-signature
        # members do NOT necessarily share — the combination is unsound
        raise ValueError("collapse_exact=True supports verify_mode='bbit' only")
    sig_cols = (*cfg.keep_columns, f"minhash_{cfg.minhash.name}")
    if cfg.lsh.verify_mode == "jaccard":
        sig_cols = (*sig_cols, "shingles")
    _t0 = _time.perf_counter()
    # materialize boundary after the actor-pool stage: on small cpu budgets
    # the pinned signature actors otherwise starve the downstream band/sort
    # tasks of cpus and the whole pipeline crawls (measured 119s -> 76s at
    # num_cpus=2, 39s -> 31s at 8, on the 600k-doc bench corpus); the sort
    # shuffle right after would materialize the band rows anyway
    sigs_out = compute_signatures(corpus_ds, cfg, keep_columns=sig_cols).materialize()
    if cfg.sig_concurrency is not None:
        # the finished execution's actor pool lives on in a reference cycle
        # (executor <-> operators), so its pinned CPUs stay RESERVED until a
        # gc pass — measured: available CPUs stuck at 0 indefinitely after
        # materialize(), released instantly by collect(). Without this the
        # whole band/sort/verify phase runs against zombie actors.
        import gc as _gc

        _gc.collect()
    # Re-block the signature table for ITS byte size: signatures are ~50x
    # smaller than content, so inheriting the corpus read's block count hands
    # every downstream exchange N tiny blocks -> N^2 shuffle objects of fixed
    # scheduling overhead (the non-scaling floor of the edges phase). One
    # cheap pass here (size known post-materialize) serves both salted band
    # passes and the collapse path; build_edges' own coalesce then no-ops.
    import ray as _ray

    _cpus = int(_ray.cluster_resources().get("CPU", 8))
    _sig_bytes = sigs_out.size_bytes() or 0
    _target = int(max(2 * _cpus, _sig_bytes // (32 << 20)))
    if _target < sigs_out.num_blocks():
        sigs_out = sigs_out.repartition(_target).materialize()
    if cfg.resolve_key_collisions:
        from ..sources.corpus import resolve_key_collisions as _resolve

        sigs_out = _resolve(sigs_out, num_partitions=cfg.lsh.num_partitions).materialize()
    _t_sig = _time.perf_counter()
    # size the shuffle-key space to the data: the band sort range-partitions
    # into ~num_blocks output ranges, so with fewer distinct partition keys
    # than ~4x that, sampled boundaries land ranges on zero keys (empty,
    # schema-less sort partitions) and hot keys can't spread across workers.
    # Blocks are data-sized (read_parquet_auto), so this scales P with
    # corpus bytes — the config value is the floor, not a cap.
    if 4 * sigs_out.num_blocks() > cfg.lsh.num_partitions:
        import dataclasses as _dc

        cfg = _dc.replace(
            cfg, lsh=_dc.replace(cfg.lsh, num_partitions=int(4 * sigs_out.num_blocks()))
        )
    band_input, star_edges = sigs_out, None
    if cfg.collapse_exact:
        band_input, star_edges = collapse_exact_signatures(sigs_out, cfg)
    use_distributed = cfg.distributed_cc
    raw_ds, raw_count = None, None
    _t_edges = _t_sig  # set properly on each branch below
    if not use_distributed:
        # cheap gate BEFORE anything touches the driver: count the (not yet
        # deduped) candidate edges; above the driver budget, auto-switch to
        # the distributed path instead of erroring (the raw count overstates
        # true edges by ~n_bands, making the switch conservative)
        raw_ds = build_edges(band_input, cfg, dedupe=False).materialize()
        raw_count = raw_ds.count()
        use_distributed = raw_count > cfg.max_driver_edges
        _t_edges = _time.perf_counter()
    if use_distributed:
        # scale path: edges never touch the driver; full distributed dedupe +
        # metrics as an extra (small) aggregation pass
        if raw_ds is not None:
            edges_mat = dedupe_edges_ds(raw_ds, cfg.lsh.num_partitions).materialize()
        else:
            edges_mat = build_edges(band_input, cfg).materialize()
        _t_edges = _time.perf_counter()
        edges = edges_mat.map_batches(_edges_metric_filter, batch_format="pyarrow")
        metrics_tbl = edges_mat.map_batches(
            lambda b: _metrics_rows(b), batch_format="pyarrow"
        ).to_pandas()
        dropped = int(metrics_tbl["dropped"].sum()) if len(metrics_tbl) else 0
        if star_edges is not None:
            edges = edges.union(star_edges)
        clusters = connected_components_distributed(edges, num_partitions=cfg.lsh.num_partitions)
        n_edges = edges.count()
        edge_path = "distributed"
    else:
        # driver CC pulls the edge table anyway — for SMALL candidate sets
        # skip the distributed pair-dedup shuffle (one whole sort barrier)
        # and dedupe on the single pull; when the raw count is near the
        # driver budget, dedupe DISTRIBUTED first so the pull shrinks by
        # ~n_bands (multi-band rediscoveries collapse before shipping)
        import ray.data as rd

        if raw_count > cfg.max_driver_edges // 4:
            edge_path = "driver-pull-prededuped"
            raw = _collect(dedupe_edges_ds(raw_ds, cfg.lsh.num_partitions))
            raw, dropped = split_edge_metrics(raw)
            edges_tbl = raw.select(["src", "dst", "sim"])
        else:
            edge_path = "driver-pull"
            raw = _collect(raw_ds)
            raw, dropped = split_edge_metrics(raw)
            edges_tbl = _dedupe_edges_table(raw)
        if star_edges is not None:
            parts = [t for t in (edges_tbl, _collect(star_edges)) if t.num_columns > 0]
            edges_tbl = pa.concat_tables(parts) if parts else edges_tbl
        clusters = connected_components_driver(edges_tbl, cfg.max_driver_edges)
        n_edges = edges_tbl.num_rows
        edges = rd.from_arrow(edges_tbl)
    metrics = {
        "dropped_pairs": dropped,
        "n_edges": n_edges,
        "edge_path": edge_path,
        # per-stage wall times (observability; bench surfaces these)
        "raw_candidates": raw_count if raw_ds is not None else None,
        "sig_sec": round(_t_sig - _t0, 3),
        "edges_sec": round(_t_edges - _t_sig, 3),
        "cluster_sec": round(_time.perf_counter() - _t_edges, 3),
    }
    return NearDupResult(signatures=sigs_out, edges=edges, clusters=clusters, metrics=metrics)


def _dedupe_edges_table(tbl: pa.Table) -> pa.Table:
    """Vectorized distinct-(src,dst)-keep-max-sim on one (driver-side) table;
    same semantics as the distributed EdgeDeduper."""
    if tbl.num_rows == 0:
        return tbl.select(["src", "dst", "sim"]) if "sim" in tbl.schema.names else tbl
    src = np.asarray(tbl["src"], dtype=np.int64)
    dst = np.asarray(tbl["dst"], dtype=np.int64)
    sim = np.asarray(tbl["sim"], dtype=np.float64)
    order = np.lexsort((-sim, dst, src))
    src, dst, sim = src[order], dst[order], sim[order]
    first = np.r_[True, (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])]
    return pa.table(
        {
            "src": pa.array(src[first], pa.int64()),
            "dst": pa.array(dst[first], pa.int64()),
            "sim": pa.array(sim[first], pa.float64()),
        }
    )


def _metrics_rows(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    mask = pc.equal(batch["src"], -1)
    d = pc.sum(pc.if_else(mask, batch["dst"], 0)).as_py() or 0
    return pa.table({"dropped": pa.array([int(d)], pa.int64())})


# ---------------------------------------------------------------------------
# checkpointed / resumable variant
# ---------------------------------------------------------------------------


def run_checkpointed(
    corpus_path: str,
    out_dir: str,
    cfg: PipelineConfig | None = None,
    input_id: str | None = None,
) -> dict:
    """Resumable flagship run: signatures per shard (skip complete shards on
    restart), then edges, then clusters — each stage published atomically
    with lineage (state/checkpoint.py). Returns the run manifest.

    Determinism: every checkpointed artifact is sorted by a stable key and
    written as one file per shard, so resumed and uninterrupted runs are
    byte-identical (F-RESUME).
    """
    import ray
    import ray.data as rd

    cfg = cfg or PipelineConfig()
    input_id = input_id or corpus_path

    if cfg.shard_by == "file" and os.path.isdir(corpus_path):
        # incremental-ingest layout: one shard per input parquet file; shard
        # fingerprints cover only (analyzer config, file name, file bytes) so
        # appended files leave existing checkpoints valid
        files = sorted(
            os.path.join(corpus_path, f)
            for f in os.listdir(corpus_path)
            if f.endswith(".parquet")
        )
        # verify_mode and keep_columns are part of the shard CONTENT (jaccard
        # persists 'shingles'; keep_columns selects the persisted schema) —
        # omitting either would silently reuse shards with the wrong columns
        sig_base = ckpt.fingerprint(
            cfg.minhash, cfg.lsh.verify_mode, cfg.keep_columns, "sig-v1"
        )
        # per-file fingerprint covers (config, name, size, mtime_ns) so an
        # in-place edit that preserves byte size still invalidates the shard;
        # appended files leave existing shards valid (incremental ingest)
        file_ids = [
            (os.path.basename(f), os.path.getsize(f), int(os.stat(f).st_mtime_ns))
            for f in files
        ]
        shard_specs = [
            (
                os.path.join(
                    out_dir, "signatures", f"file={os.path.splitext(os.path.basename(f))[0]}"
                ),
                ckpt.fingerprint(sig_base, *fid),
                f,
                None,
            )
            for f, fid in zip(files, file_ids)
        ]
        # downstream stages depend on the full input state
        fp = ckpt.fingerprint(cfg.minhash, cfg.lsh, file_ids, "v1")
    else:
        fp = ckpt.fingerprint(cfg.minhash, cfg.lsh, cfg.num_shards, input_id, "v1")
        shard_specs = [
            (os.path.join(out_dir, "signatures", f"shard={i}"), fp, corpus_path, i)
            for i in range(cfg.num_shards)
        ]

    shard_dirs = [s[0] for s in shard_specs]
    for i, (sdir, sfp, src, hash_shard) in enumerate(shard_specs):
        if ckpt.is_complete(sdir, sfp):
            continue
        ds = read_parquet_auto(src)
        if hash_shard is not None and cfg.num_shards > 1:
            ds = ds.map_batches(
                lambda b, i=hash_shard, n=cfg.num_shards: _filter_shard(b, i, n),
                batch_format="pyarrow",
            )
        sigs = compute_signatures(ds, cfg)
        want = (*cfg.keep_columns, f"minhash_{cfg.minhash.name}")
        if cfg.lsh.verify_mode == "jaccard":
            # BandStage/BucketPairer need the shingle sets downstream of the
            # checkpoint — persist them with the signatures
            want = (*want, "shingles")
        cols = [c for c in want if c in sigs.schema().names]
        # shard concatenated + sorted + written inside a remote task — the
        # driver never holds shard data (shard = the worker-memory unit)
        ckpt.write_sorted_shard_remote(
            sigs.map_batches(lambda b, c=tuple(cols): b.select(list(c)), batch_format="pyarrow"),
            sdir,
            ["doc_id"],
            sfp,
            stage="signatures",
            shard=i,
        )
        if cfg.sig_concurrency is not None:
            # release the shard's finished sig actor pool (reference-cycle
            # CPU reservation — see near_dup_pipeline) before the next shard
            import gc as _gc

            _gc.collect()

    if cfg.resolve_key_collisions:
        # the remap is a pure function of doc_ids (resume-deterministic);
        # fold the flag into the downstream fingerprint so toggling it
        # invalidates edges/clusters but never the signature shards
        fp = ckpt.fingerprint(fp, "resolve-key-collisions")

    edges_dir = os.path.join(out_dir, "edges")
    if not ckpt.is_complete(edges_dir, fp):
        sig_ds = read_parquet_auto([os.path.join(d, "data.parquet") for d in shard_dirs])
        if cfg.resolve_key_collisions:
            from ..sources.corpus import resolve_key_collisions as _resolve

            sig_ds = _resolve(sig_ds, num_partitions=cfg.lsh.num_partitions)
        edges_all = build_edges(sig_ds, cfg).map_batches(
            # empty groups surface as zero-column blocks — pass them through,
            # write_edges_checkpoint skips them
            lambda b: b.select(["src", "dst", "sim"]) if b.num_columns else b,
            batch_format="pyarrow",
        )
        # driver-bounded write: single file below edges_rows_per_shard,
        # hash-sharded part=K/ layout above it — never a driver pull
        ckpt.write_edges_checkpoint(edges_all, edges_dir, fp, cfg.edges_rows_per_shard)

    clusters_dir = os.path.join(out_dir, "clusters")
    if not ckpt.is_complete(clusters_dir, fp):
        ed = read_parquet_auto(ckpt.edges_files(edges_dir))
        if cfg.distributed_cc:
            clusters = _collect(cluster_edges(ed, cfg))
        else:
            # streams batches off the checkpoint files; max_driver_edges guard
            clusters = connected_components_driver(ed, cfg.max_driver_edges)
        ckpt.write_sorted_single_file(clusters, clusters_dir, ["doc_key"], fp, stage="clusters")

    return {
        "fingerprint": fp,
        "signatures": [os.path.join(d, "data.parquet") for d in shard_dirs],
        "edges": ckpt.edges_files(edges_dir),
        "clusters": os.path.join(clusters_dir, "data.parquet"),
        "lineage": {
            "edges": ckpt.read_lineage(edges_dir),
            "clusters": ckpt.read_lineage(clusters_dir),
        },
    }


def _collect(ds) -> pa.Table:
    """Materialize a (small) Dataset to one Arrow table, tolerating the empty
    zero-column blocks Ray emits for groups that produced no rows."""
    import ray

    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns > 0]
    return pa.concat_tables(tables) if tables else pa.table({})


def _filter_shard(batch: pa.Table, shard: int, num_shards: int) -> pa.Table:
    """Shard split on the stable doc identity (pre-keys: hash of repo/path@commit)."""
    import hashlib

    import pyarrow.compute as pc

    ident = pc.binary_join_element_wise(
        pc.binary_join_element_wise(batch["repo"], batch["path"], "/"), batch["commit"], "@"
    ).to_pylist()
    keys = np.fromiter(
        (
            int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big") % num_shards
            for s in ident
        ),
        dtype=np.int64,
        count=len(ident),
    )
    return batch.filter(pa.array(keys == shard))


def near_dup_keep(
    signatures,
    clusters,
    *,
    key_col: str = "doc_key",
    columns: tuple[str, ...] = ("doc_id", "doc_key", "content_sha256"),
    num_partitions: int = 64,
    broadcast_limit: int = 2_000_000,
):
    """The near-dup dedup ACTION: the curated corpus after dropping every
    clustered doc except one representative per cluster (``cluster_id`` is
    the cluster's min doc_key, so the representative is the member with
    ``doc_key == cluster_id``; unclustered docs all survive).

    ``signatures``: the pipeline's signature Dataset (or any Dataset carrying
    ``key_col`` + ``columns``). ``clusters``: the pipeline's clusters output
    (Dataset or pa.Table with doc_key/cluster_id). The drop-set is derived
    as a Dataset (never a driver pull) and the cut is
    :func:`~..stages.dedup.anti_join_keys` — a broadcast filter when the
    clustered-doc count is small, a doc_key-partitioned union-join (one
    keyed exchange) when it is not."""
    import ray.data as rd

    from ..stages.dedup import anti_join_keys

    if isinstance(clusters, pa.Table):
        clusters = rd.from_arrow(clusters)

    def dropped(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["doc_key"], dtype=np.int64)
        c = np.asarray(batch["cluster_id"], dtype=np.int64)
        return pa.table({key_col: pa.array(k[k != c], pa.int64())})

    drop_ds = clusters.map_batches(dropped, batch_format="pyarrow")
    cols = list(columns)
    payload = signatures.map_batches(lambda b, c=cols: b.select(c), batch_format="pyarrow")
    return anti_join_keys(
        payload,
        drop_ds,
        key_col=key_col,
        num_partitions=num_partitions,
        broadcast_limit=broadcast_limit,
    )


def _cast_int64(col):
    import pyarrow.compute as pc

    return pc.cast(col, pa.int64())


def near_dup_keep_best(
    signatures,
    clusters,
    scores,
    *,
    score_col: str = "score",
    key_col: str = "doc_key",
    columns: tuple[str, ...] = ("doc_id", "doc_key", "content_sha256"),
    num_partitions: int = 64,
    broadcast_limit: int = 2_000_000,
):
    """:func:`near_dup_keep` with a QUALITY-priority representative: each
    cluster keeps its highest-``score_col`` member (ties → min doc_key)
    instead of the structural min-key member — what a curation pipeline
    actually wants (keep the longest / cleanest / highest-signal copy, drop
    the rest). Reduces to :func:`near_dup_keep` when scores are constant
    (pytest-pinned).

    ``scores`` is its own (key_col, score_col int) Dataset — quality can
    come from any stage (token counts, xent, entropy) without widening the
    signature schema. Scores must be NON-NEGATIVE: docs missing a score row
    compete at 0, so they can never beat a scored member, and a cluster
    whose members all lack scores keeps its min-key member (the tiebreak).

    Dataflow: member rows and (key, score) rows ride ONE tagged-union
    doc_key exchange to attach scores (scores for unclustered docs drop in
    place — no driver pull), then one cluster_id exchange picks the argmax;
    the drop-set derives as a Dataset and the cut is the same auto
    broadcast/union anti-join."""
    import pandas as pd
    import ray.data as rd

    from ..grouping import map_copartitioned
    from ..stages.dedup import anti_join_keys

    if isinstance(clusters, pa.Table):
        clusters = rd.from_arrow(clusters)

    cols = list(columns)
    payload = signatures.map_batches(lambda b, c=cols: b.select(c), batch_format="pyarrow")

    member_rows = clusters.map_batches(
        lambda b: pa.table(
            {key_col: b["doc_key"], "cluster_id": b["cluster_id"],
             "score": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
             "kind": pa.array(np.zeros(b.num_rows, np.int8), pa.int8())}
        ),
        batch_format="pyarrow",
    )
    score_rows = scores.map_batches(
        lambda b: pa.table(
            {key_col: b[key_col],
             "cluster_id": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
             "score": _cast_int64(b[score_col]),
             "kind": pa.array(np.ones(b.num_rows, np.int8), pa.int8())}
        ),
        batch_format="pyarrow",
    )

    def attach(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return pd.DataFrame(
                {"cluster_id": np.empty(0, np.int64),
                 key_col: np.empty(0, np.int64),
                 "score": np.empty(0, np.int64)}
            )
        block = block.sort_values([key_col, "kind"], kind="stable")
        k = block[key_col].to_numpy(np.int64)
        kind = block["kind"].to_numpy(np.int8)
        score = block["score"].to_numpy(np.int64)
        # member row (kind 0) directly precedes its score row (kind 1) when
        # one exists; members with no score row compete at score 0 (they
        # lose ties to any scored member; an all-unscored cluster keeps its
        # min-key member via the tiebreak)
        is_member = kind == 0
        nxt_same = np.r_[k[1:] == k[:-1], False]
        out_score = np.where(nxt_same, np.roll(score, -1), 0)
        return pd.DataFrame(
            {"cluster_id": block["cluster_id"].to_numpy(np.int64)[is_member],
             key_col: k[is_member], "score": out_score[is_member]}
        )

    members = map_copartitioned(
        member_rows.union(score_rows), key_col, attach, batch_format="pandas"
    )

    def pick_drop(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return pd.DataFrame({key_col: np.empty(0, np.int64)})
        # argmax score per cluster, ties -> min key: sort so the winner is
        # first in its run, then drop everything that is not first
        block = block.sort_values(
            ["cluster_id", "score", key_col], ascending=[True, False, True],
            kind="mergesort",
        )
        c = block["cluster_id"].to_numpy(np.int64)
        first = np.r_[True, c[1:] != c[:-1]]
        return pd.DataFrame({key_col: block[key_col].to_numpy(np.int64)[~first]})

    drop_ds = map_copartitioned(members, "cluster_id", pick_drop, batch_format="pandas")
    return anti_join_keys(
        payload, drop_ds, key_col=key_col,
        num_partitions=num_partitions, broadcast_limit=broadcast_limit,
    )
