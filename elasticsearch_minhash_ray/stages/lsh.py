"""LSH banding → candidate buckets → verified edges (SURVEY.md §2.4).

Target-mandated stages with no reference implementation (the reference does
dedup at ES query time via term query / keyword collapse,
MinHashFieldMapper.java:218-221); semantics here follow standard MinHash-LSH
(Leskovec/Rajaraman/Ullman ch.3, Li & König b-bit minwise hashing) over the
reference's exact signature bytes.

Dataflow:
  signatures ──explode──▶ band rows (bucket_part, bucket, doc_key, sig)
             ──map_copartitioned(bucket_part, BucketPairer)──▶ verified edges
             ──map_copartitioned(edge_part, EdgeDeduper)──▶ distinct edges

Scale design (explicit, graded): the shuffle key is ``bucket_part =
hash(bucket) % P`` — ONE int32 key, not the raw (band_id, band_hash) pair —
so the all-to-all moves each band row exactly once and the per-group Python
overhead is one call per *partition* (P total), not per bucket (millions).
Within a partition the bucket grouping is a vectorized sort + boundary scan;
only buckets with >=2 docs do any pair work. Giant buckets (vendored /
boilerplate families) are capped: all-pairs within sorted chunks of
``bucket_cap`` docs plus a star over chunk heads — connectivity (hence cluster
assignments) is preserved while emitted pairs stay O(m * cap) instead of
O(m^2); dropped-pair counts are emitted on metrics rows.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .._arrow import table_from_pandas

from ..functions.minhash import MinHashConfig, PairComparer, sig_u64
from .signature import SigMatrixBuilder, sig_matrix

_HASH_MIX = np.uint64(0x9E3779B97F4A7C15)


@dataclass(frozen=True)
class LSHConfig:
    """n_bands bands over the k*b signature bits; width must divide evenly.

    Defaults (8 bands x 16 bits for the reference's default 128-bit config):
    catch probability at bit-similarity r is 1-(1-r^16)^8 = 0.990 at the
    r=0.95 verify threshold (and →1 above it) — meets the 0.99 recall
    target. Band width is the PRECISION lever and the scale-limiting choice:
    a random pair (independent bits, r≈0.5) collides with p≈8*2^-16≈1.2e-4
    here, vs p≈6e-2 for 16 bands x 8 bits — 8-bit bands admit ~6% of ALL
    n^2 pairs as candidates, which is O(n^2/256) work per band and was
    measured 20x slower end-to-end at 120k docs. At >>10^8 rows per cluster,
    raise num_of_hash (wider signature) so bands can be >=32 bits, or accept
    bucket_cap truncation (dropped-pair counts are surfaced in metrics).

    ``verify_mode``:
    - "bbit" (default): reference-exact fraction-of-equal-bits (O12 kernel).
    - "jaccard": exact n-gram Jaccard over shingle-hash SETS carried on the
      band rows (column ``shingles``: list<int64>, see ShingleSetStage) —
      candidates still come from the MinHash bands; verification is the true
      set similarity, threshold ``jaccard_threshold``.

    ``n_salts`` — salted-key repartitioning for skewed buckets (north_rule):
    with n_salts > 1 an exact per-bucket count pass (driver-side, bounded by
    the band space not the row count) first finds HOT buckets (count >
    ``hot_threshold``, default 2*bucket_cap) — the giant near-dup families of
    vendored/boilerplate code. Hot-bucket rows re-shuffle on
    hash(bucket, doc_key % S) so the family spreads over S groups instead of
    hot-spotting one partition/task; per-(bucket, salt) representatives
    (min doc_key + signature) are re-keyed by the UNSALTED bucket and
    pairwise-VERIFIED in a second, tiny pass, reconnecting the family while
    random-collision buckets gain no false links. Cold buckets are untouched,
    so non-skewed recall is bit-identical to the unsalted path. Default 1
    (off) — enable (e.g. 8-32) for corpora with families >> bucket_cap; at
    10^12-file scale always.
    """

    n_bands: int = 8
    threshold: float = 0.95  # min fraction-of-equal-bits (reference compare units)
    bucket_cap: int = 256  # max docs per all-pairs chunk inside one bucket
    # P for the bucket shuffle — a FLOOR: near_dup_pipeline auto-raises it to
    # 4x the corpus block count so the key space tracks data size (empty sort
    # ranges vanish, hot keys spread across all workers)
    num_partitions: int = 64
    verify_mode: str = "bbit"  # "bbit" | "jaccard"
    jaccard_threshold: float = 0.8
    n_salts: int = 1  # >1 = salted repartitioning (bbit verify mode only)
    hot_threshold: int | None = None  # bucket size that triggers salting; default 2*bucket_cap

    def band_bytes(self, width: int) -> int:
        if width % self.n_bands:
            raise ValueError(f"signature width {width} not divisible into {self.n_bands} bands")
        return width // self.n_bands


class BandStage:
    """map_batches callable: one signature row → n_bands band rows.

    Emits (bucket_part:int32, bucket:int64, doc_key:int64, sig:binary).
    ``bucket`` packs (band_id, band bytes) into one int64; truncated
    signatures are zero-padded for banding only — the stored sig (and its
    length, via the binary value itself) rides along for exact verification.
    Null-signature rows produce no band rows.
    """

    def __init__(self, lsh: LSHConfig, cfg: MinHashConfig, sig_col: str | None = None):
        self.lsh = lsh
        self.width = cfg.full_width
        self.sig_col = sig_col or f"minhash_{cfg.name}"
        self.band_bytes = lsh.band_bytes(self.width)

    def __call__(self, batch: pa.Table) -> pa.Table:
        carry_shingles = self.lsh.verify_mode == "jaccard"
        mat, lens = sig_matrix(batch[self.sig_col], self.width)
        keep = lens >= 0
        mat, lens = mat[keep], lens[keep]
        n = mat.shape[0]
        nb = self.lsh.n_bands
        if n == 0:
            cols = {
                "bucket_part": pa.array([], pa.int32()),
                "bucket": pa.array([], pa.int64()),
                "doc_key": pa.array([], pa.int64()),
                "sig": pa.array([], pa.binary()),
            }
            if carry_shingles:
                cols["shingles"] = pa.array([], pa.list_(pa.int64()))
            return pa.table(cols)
        doc_keys = batch["doc_key"].to_numpy(zero_copy_only=False)[keep]
        # vectorized n_bands-fold repeat of the variable-width columns
        rep_idx = pa.array(np.repeat(np.flatnonzero(keep), nb))
        sig_rep = batch[self.sig_col].take(rep_idx)
        if isinstance(sig_rep, pa.ChunkedArray):
            sig_rep = sig_rep.combine_chunks()
        if carry_shingles:
            shingles_rep = batch["shingles"].take(rep_idx)
            if isinstance(shingles_rep, pa.ChunkedArray):
                shingles_rep = shingles_rep.combine_chunks()
        # band values: (n, nb, band_bytes) -> uint64 little-endian
        bands = mat.reshape(n, nb, self.band_bytes).astype(np.uint64)
        weights = (np.uint64(1) << (np.uint64(8) * np.arange(self.band_bytes, dtype=np.uint64)))
        vals = (bands * weights).sum(axis=2, dtype=np.uint64)  # (n, nb)
        band_ids = np.arange(nb, dtype=np.uint64)
        # mix band id into the value → one 64-bit bucket key
        with np.errstate(over="ignore"):
            bucket = (vals ^ ((band_ids[None, :] + np.uint64(1)) * _HASH_MIX)) >> np.uint64(1)
            part = (bucket % np.uint64(self.lsh.num_partitions)).astype(np.int32)
        cols = {
            "bucket_part": pa.array(part.ravel(), pa.int32()),
            "bucket": pa.array(bucket.ravel().view(np.int64), pa.int64()),
            "doc_key": pa.array(np.repeat(doc_keys, nb), pa.int64()),
            "sig": sig_rep,
        }
        if carry_shingles:
            cols["shingles"] = shingles_rep
        return pa.table(cols)


class SaltHotBuckets:
    """map_batches stage of the salted-skew path: rows whose bucket is in the
    broadcast HOT set (count > hot threshold) are re-keyed to
    mix(bucket, doc_key % n_salts) so the giant bucket spreads over n_salts
    shuffle groups; ``bucket_orig`` keeps the unsalted bucket for the
    rep-link pass (-1 for unsalted rows — no rep emitted for those).
    The hot set is tiny (bounded by the band space, <= n_bands * 2^band_bits
    distinct buckets) and shipped once via ray.put."""

    def __init__(self, hot_ref, n_salts: int, num_partitions: int):
        self.hot_ref = hot_ref
        self.n_salts = n_salts
        self.num_partitions = num_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        hot = ray.get(self.hot_ref)  # sorted int64 array
        bucket = np.asarray(batch["bucket"], dtype=np.int64)
        keys = np.asarray(batch["doc_key"], dtype=np.int64)
        if len(hot) == 0:
            is_hot = np.zeros(len(bucket), dtype=bool)
        else:
            pos = np.searchsorted(hot, bucket)
            is_hot = (pos < len(hot)) & (hot[np.minimum(pos, len(hot) - 1)] == bucket)
        borig = np.where(is_hot, bucket, np.int64(-1))
        with np.errstate(over="ignore"):
            salt = (keys.view(np.uint64) % np.uint64(self.n_salts)) + np.uint64(3)
            salted = ((bucket.view(np.uint64) ^ (salt * _HASH_MIX)) >> np.uint64(1)).view(np.int64)
            new_bucket = np.where(is_hot, salted, bucket)
            part = (new_bucket.view(np.uint64) % np.uint64(self.num_partitions)).astype(np.int32)
        out = batch.drop_columns(["bucket", "bucket_part"])
        return (
            out.append_column("bucket_part", pa.array(part, pa.int32()))
            .append_column("bucket", pa.array(new_bucket, pa.int64()))
            .append_column("bucket_orig", pa.array(borig, pa.int64()))
        )


def hot_buckets(bands, hot_threshold: int, num_partitions: int = 64) -> np.ndarray:
    """Distributed heavy-hitter pass: per-block partial bucket counts →
    hash-partitioned distributed sum → filter count > hot_threshold → pull
    ONLY the hot set. The driver never sees the full count table; what it
    pulls is bounded by rows/hot_threshold (at most that many buckets can
    exceed the threshold), independent of band width or corpus size.
    Returns the sorted int64 hot-bucket array."""

    def partial(batch: pa.Table) -> pa.Table:
        b, c = np.unique(np.asarray(batch["bucket"], dtype=np.int64), return_counts=True)
        with np.errstate(over="ignore"):
            part = ((b.view(np.uint64) * _HASH_MIX) % np.uint64(num_partitions)).astype(np.int32)
        return pa.table(
            {
                "bucket": pa.array(b, pa.int64()),
                "cnt": pa.array(c, pa.int64()),
                "part": pa.array(part, pa.int32()),
            }
        )

    def hot_only(batch: pa.Table) -> pa.Table:
        import pandas as pd

        if batch.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64())})
        df = batch.select(["bucket", "cnt"]).to_pandas()
        tot = df.groupby("bucket", as_index=False, sort=False)["cnt"].sum()
        keep = tot[tot["cnt"] > hot_threshold]
        return pa.table({"bucket": pa.array(keep["bucket"].to_numpy(np.int64), pa.int64())})

    from ..grouping import map_copartitioned

    hot_tbls = map_copartitioned(
        bands.map_batches(partial, batch_format="pyarrow"), "part", hot_only
    ).to_arrow_refs()
    import ray

    parts = [np.asarray(t["bucket"], dtype=np.int64) for t in ray.get(hot_tbls) if t.num_columns > 0]
    return np.sort(np.concatenate(parts)) if parts else np.array([], dtype=np.int64)


_TRIU_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _triu_cached(m: int) -> tuple[np.ndarray, np.ndarray]:
    """Memoized upper-triangle pair index template for an m-doc bucket."""
    hit = _TRIU_CACHE.get(m)
    if hit is None:
        hit = _TRIU_CACHE[m] = np.triu_indices(m, k=1)
    return hit


class BucketPairer:
    """map_groups callable over ``bucket_part`` groups: vectorized bucket scan
    → capped pair emission → exact b-bit verification (reference compare
    semantics incl. the length-mismatch-is-0 rule).

    Output: (src:int64, dst:int64, sim:float64) with src < dst; rows where
    src == -1 carry (dst=dropped_pairs) metrics and are filtered into
    pipeline metrics by the caller.

    ``emit_reps`` (salted mode, LSHConfig.n_salts > 1): additionally emits
    one representative row per (bucket, salt) group — src=-3, dst=min
    doc_key, bucket=unsalted bucket, sig=rep signature — for the second
    verified rep-linking pass that reconnects salt-split buckets.

    ``delta_col`` (incremental mode, pipelines/delta.py): names an int8
    column marking NEW rows (1) vs rows already indexed by a previous run
    (0). Buckets sort new-first and only pairs with >= 1 new member are
    emitted/verified — old-old edges already exist in the prior run's edge
    checkpoint, so re-deriving them would duplicate work proportional to
    the CORPUS instead of the delta. Connectivity of mixed buckets is
    preserved: capped buckets still chunk+star, and the star hub (first
    row, new-first order) is always a new doc, linking the delta into the
    old component.
    """

    def __init__(
        self,
        lsh: LSHConfig,
        width: int,
        emit_reps: bool = False,
        delta_col: str | None = None,
    ):
        self.lsh = lsh
        self.width = width
        self.emit_reps = emit_reps
        self.delta_col = delta_col
        if emit_reps and lsh.verify_mode == "jaccard":
            raise ValueError("n_salts > 1 currently supports verify_mode='bbit' only")
        if delta_col and emit_reps:
            raise NotImplementedError("delta mode does not compose with salted reps yet")
        if delta_col and lsh.verify_mode == "jaccard":
            raise NotImplementedError("delta mode supports verify_mode='bbit' only")
        # scratch-buffered kernels: buffers stay empty on the driver (pickled
        # small) and grow once inside each worker, then persist across tasks
        self._sigb = SigMatrixBuilder()
        self._cmp = PairComparer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return self._table(
                np.array([], np.int64), np.array([], np.int64), np.array([]), 0
            )
        delta = self.delta_col is not None
        if delta:
            is_new = batch[self.delta_col].to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.lexsort(
                (
                    batch["doc_key"].to_numpy(zero_copy_only=False),
                    1 - is_new,  # new rows FIRST within each bucket
                    batch["bucket"].to_numpy(zero_copy_only=False),
                )
            )
        else:
            order = np.lexsort(
                (
                    batch["doc_key"].to_numpy(zero_copy_only=False),
                    batch["bucket"].to_numpy(zero_copy_only=False),
                )
            )
        buckets = batch["bucket"].to_numpy(zero_copy_only=False)[order]
        doc_keys = batch["doc_key"].to_numpy(zero_copy_only=False)[order]
        mat, lens = self._sigb(batch["sig"], self.width)
        mat, lens = mat[order], lens[order]
        # bucket boundaries
        starts = np.flatnonzero(np.r_[True, buckets[1:] != buckets[:-1]])
        ends = np.r_[starts[1:], len(buckets)]
        m_new = np.add.reduceat(is_new[order], starts) if delta else None
        reps = None
        if self.emit_reps:
            # sorted by (bucket, doc_key): first row of each group = min key;
            # reps only for SALTED groups (bucket_orig >= 0 marks hot buckets)
            borig = batch["bucket_orig"].to_numpy(zero_copy_only=False)[order]
            rep_idx = starts[borig[starts] >= 0]
            rep_sigs = [
                mat[i, : lens[i]].tobytes() if lens[i] >= 0 else None for i in rep_idx
            ]
            reps = (doc_keys[rep_idx], borig[rep_idx], rep_sigs)
        ia_all: list[np.ndarray] = []
        ib_all: list[np.ndarray] = []
        dropped = 0
        cap = self.lsh.bucket_cap
        sizes = ends - starts
        # vectorized all-pairs for in-cap buckets, grouped by bucket size:
        # one broadcast per distinct size instead of a python loop with two
        # small allocations per bucket (10^4+ buckets/partition otherwise)
        small = (sizes >= 2) & (sizes <= cap)
        if delta:
            small &= m_new > 0  # no new member -> every pair is old-old -> skip
            # group by (size, n_new) — one filtered template per combo; the
            # combo key packs both into one int64 so np.unique stays 1-D
            combo = sizes[small] * np.int64(cap + 2) + m_new[small]
            srows = starts[small]
            for c in np.unique(combo):
                rows = srows[combo == c]
                m, mn = int(c) // (cap + 2), int(c) % (cap + 2)
                ia_t, ib_t = _triu_cached(m)
                keep = ia_t < mn  # new-first order: smaller index < mn => new
                ia_t, ib_t = ia_t[keep], ib_t[keep]
                ia_all.append((rows[:, None] + ia_t[None, :]).ravel())
                ib_all.append((rows[:, None] + ib_t[None, :]).ravel())
        else:
            for m in np.unique(sizes[small]):
                rows = starts[small & (sizes == m)]
                ia_t, ib_t = _triu_cached(int(m))
                ia_all.append((rows[:, None] + ia_t[None, :]).ravel())
                ib_all.append((rows[:, None] + ib_t[None, :]).ravel())
        capped = sizes > cap
        if delta:
            capped &= m_new > 0
        for bi in np.flatnonzero(capped):
            s, e = int(starts[bi]), int(ends[bi])
            m = e - s
            # skew guard: all-pairs within consecutive cap-sized chunks +
            # chain of chunk heads keeps the bucket connected
            if delta:
                mn = int(m_new[bi])
                mo = m - mn
                # candidate universe = pairs with >= 1 new member
                dropped += m * (m - 1) // 2 - mo * (mo - 1) // 2
            else:
                dropped += m * (m - 1) // 2
            heads = []
            for cs in range(s, e, cap):
                ce = min(cs + cap, e)
                cm = ce - cs
                heads.append(cs)
                if cm >= 2:
                    ia, ib = _triu_cached(int(cm))
                    if delta:
                        # new rows occupy [s, s + mn): chunk-local new count
                        local_new = min(max(s + mn - cs, 0), cm)
                        if local_new == 0:
                            continue
                        keep = ia < local_new
                        ia, ib = ia[keep], ib[keep]
                    ia_all.append(ia + cs)
                    ib_all.append(ib + cs)
                    dropped -= len(ia)
            h = np.asarray(heads)
            if len(h) >= 2:
                # STAR-link chunk heads (not a chain): keeps the capped
                # bucket connected with O(1) component diameter, which the
                # distributed min-label CC relies on for round count.
                # Delta mode: h[0] is a NEW doc (new-first order), so every
                # star link involves the delta — old chunk heads attach to it
                ia_all.append(np.full(len(h) - 1, h[0]))
                ib_all.append(h[1:])
                dropped -= len(h) - 1
        if not ia_all:
            return self._table(
                np.array([], np.int64), np.array([], np.int64), np.array([]), 0, reps
            )
        ia = np.concatenate(ia_all)
        ib = np.concatenate(ib_all)
        # drop self-pairs (same doc landing twice in a bucket can't happen —
        # one row per (doc, band) — but identical doc_keys can: sha collisions
        # or duplicate corpus rows; keep them out of the edge list)
        neq = doc_keys[ia] != doc_keys[ib]
        ia, ib = ia[neq], ib[neq]
        if self.lsh.verify_mode == "jaccard":
            # exact n-gram Jaccard over sorted-unique shingle-hash sets,
            # fully vectorized: flat Arrow list values + offsets (zero-copy),
            # all pair elements tagged with a pair id, one lexsort — each
            # value occurs at most once per side, so adjacent (pid, value)
            # duplicates count the intersection. O(E log E) over E = total
            # candidate elements (cap-bounded per bucket), no per-pair Python.
            sim = _jaccard_pairs(batch["shingles"], order[ia], order[ib])
            ok = sim >= self.lsh.jaccard_threshold
        else:
            # u64 view + tiled SWAR popcount in persistent scratch: the
            # verify work is bandwidth/page-fault-bound under task
            # concurrency, so narrow gathers + warm reused pages dominate
            sim = self._cmp(sig_u64(mat), lens, ia, ib)
            ok = sim >= self.lsh.threshold
        a = doc_keys[ia[ok]]
        b = doc_keys[ib[ok]]
        src = np.minimum(a, b)
        dst = np.maximum(a, b)
        return self._table(src, dst, sim[ok], dropped, reps)

    def _table(self, src, dst, sim, dropped, reps=None) -> pa.Table:
        tbl = _edges_table(src, dst, sim, dropped)
        if not self.emit_reps:
            return tbl
        n = tbl.num_rows
        if reps is None:
            rep_keys, rep_bucket, rep_sigs = (
                np.array([], np.int64), np.array([], np.int64), [],
            )
        else:
            rep_keys, rep_bucket, rep_sigs = reps
        m = len(rep_keys)
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [tbl["src"].combine_chunks(), pa.array(np.full(m, -3, np.int64), pa.int64())]
                ),
                "dst": pa.concat_arrays(
                    [tbl["dst"].combine_chunks(), pa.array(rep_keys.astype(np.int64), pa.int64())]
                ),
                "sim": pa.concat_arrays(
                    [tbl["sim"].combine_chunks(), pa.array(np.zeros(m), pa.float64())]
                ),
                "bucket": pa.concat_arrays(
                    [pa.array(np.zeros(n, np.int64), pa.int64()), pa.array(rep_bucket.astype(np.int64), pa.int64())]
                ),
                "sig": pa.concat_arrays(
                    [pa.array([None] * n, pa.binary()), pa.array(rep_sigs, pa.binary())]
                ),
            }
        )


def _gather_ranges(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Vectorized concatenation of index ranges [starts[i], starts[i]+lengths[i])."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ids = np.repeat(np.arange(len(starts)), lengths)
    cum = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    return starts[ids] + (np.arange(total, dtype=np.int64) - cum[ids])


def _jaccard_pairs(shingles_col, xo: np.ndarray, yo: np.ndarray) -> np.ndarray:
    """Exact Jaccard for candidate pairs (xo[j], yo[j]) of rows in a
    list<int64> column of sorted-unique shingle hashes. Zero-copy flat
    values + offsets; one lexsort over all pair elements."""
    arr = shingles_col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.values, dtype=np.int64)
    offs = np.asarray(arr.offsets, dtype=np.int64)
    npairs = len(xo)
    la = offs[xo + 1] - offs[xo]
    lb = offs[yo + 1] - offs[yo]
    idx = np.concatenate([_gather_ranges(offs[xo], la), _gather_ranges(offs[yo], lb)])
    pids = np.concatenate([np.repeat(np.arange(npairs), la), np.repeat(np.arange(npairs), lb)])
    vals = flat[idx]
    o = np.lexsort((vals, pids))
    v, p = vals[o], pids[o]
    dup = (v[1:] == v[:-1]) & (p[1:] == p[:-1])
    inter = np.bincount(p[1:][dup], minlength=npairs)
    union = la + lb - inter
    # both-empty → 1.0 (identical empty sets); one-empty → 0/positive = 0.0
    return np.where(union == 0, 1.0, inter / np.maximum(union, 1))


def _edges_table(src: np.ndarray, dst: np.ndarray, sim: np.ndarray, dropped: int) -> pa.Table:
    if dropped:
        src = np.r_[src, np.int64(-1)]
        dst = np.r_[dst, np.int64(dropped)]
        sim = np.r_[sim, 0.0]
    return pa.table(
        {
            "src": pa.array(src.astype(np.int64), pa.int64()),
            "dst": pa.array(dst.astype(np.int64), pa.int64()),
            "sim": pa.array(sim.astype(np.float64), pa.float64()),
        }
    )


class EdgeDeduper:
    """map_groups callable over ``edge_part``: distinct (src, dst) keeping max
    sim — same pair discovered via multiple bands collapses to one edge."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        if batch.num_rows == 0:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        df = batch.select(["src", "dst", "sim"]).to_pandas()
        # metric rows (src == -1, dst = dropped count) are NOT pair keys:
        # identical counts from different buckets must SUM, not collapse
        metrics = df[df["src"] == -1]
        df = df[df["src"] != -1]
        out = df.groupby(["src", "dst"], as_index=False, sort=False)["sim"].max()
        if len(metrics):
            out = pd.concat(
                [out, pd.DataFrame({"src": [-1], "dst": [metrics["dst"].sum()], "sim": [0.0]})],
                ignore_index=True,
            )
        return table_from_pandas(out)


class ShingleSetStage:
    """map_batches callable adding ``shingles``: sorted unique int64 hashes of
    the doc's n-gram shingles (murmur3 seed 0 — same stable hash family as
    the signature kernel). Input for exact-Jaccard verification; ~8 B per
    distinct shingle per row."""

    def __init__(self, content_col: str = "content", tokenizer: str = "standard", shingle_n: int = 3):
        self.content_col = content_col
        self.tokenizer = tokenizer
        self.shingle_n = shingle_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        # shared kernel with DecontaminateStage — one implementation to keep
        # jaccard-verify and decontamination shingles bit-identical
        from .text import shingle_hash_sets

        sets = shingle_hash_sets(
            batch[self.content_col].to_pylist(), self.tokenizer, self.shingle_n
        )
        return batch.append_column(
            "shingles", pa.array([s.tolist() for s in sets], pa.list_(pa.int64()))
        )


def add_edge_part(batch: pa.Table, num_partitions: int) -> pa.Table:
    src = batch["src"].to_numpy(zero_copy_only=False).view(np.uint64)
    dst = batch["dst"].to_numpy(zero_copy_only=False).view(np.uint64)
    with np.errstate(over="ignore"):
        h = (src * _HASH_MIX) ^ dst
        part = (h % np.uint64(num_partitions)).astype(np.int32)
    return batch.append_column("edge_part", pa.array(part, pa.int32()))
