"""Embedding similarity operators: brute-force cosine top-k (baseline) and
hyperplane-LSH-bucketed near-dup (scale path).

Scale notes (explicit):
- top-k: the QUERY matrix is tiny → ``ray.put`` once, read inside every task
  (broadcast, no shuffle); per-batch float64 matmul + per-batch top-k
  (combiner), final top-k merge over ``n_blocks * k`` candidate rows only.
- near-dup brute force: O(n^2) — only for oracle-scale inputs; the LSH path
  buckets by random-hyperplane sign bands (same single-int-key partition
  pattern as the MinHash LSH stage) and verifies exact cosine within buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .._arrow import table_from_pandas
from ..grouping import map_copartitioned, map_part_groups

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _normalize(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _stack(batch: pa.Table, col: str) -> np.ndarray:
    """(n, dim) float64 matrix from a list/fixed_size_list column — zero-copy
    flat-buffer reshape when row lengths are constant (the embedding case),
    to_pylist only as the ragged fallback. Also accepts the
    :func:`pack_vectors` fixed_size_binary layout (little-endian float32),
    so packed columns flow through every embedding kernel unchanged."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_fixed_size_binary(t):
        dim = t.byte_width // 4
        flat = np.frombuffer(arr.buffers()[1], dtype="<f4")
        flat = flat[arr.offset * dim : (arr.offset + len(arr)) * dim]
        return flat.reshape(len(arr), dim).astype(np.float64)
    if pa.types.is_fixed_size_list(t):
        vals = np.asarray(arr.values, dtype=np.float64)
        return vals.reshape(len(arr), t.list_size)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        offs = np.asarray(arr.offsets, dtype=np.int64)
        lens = np.diff(offs)
        if len(lens) and (lens == lens[0]).all() and lens[0] > 0:
            vals = np.asarray(arr.values, dtype=np.float64)
            return vals[offs[0] : offs[-1]].reshape(len(arr), int(lens[0]))
    return np.asarray(arr.to_pylist(), dtype=np.float64)


def brute_force_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Top-k cosine neighbours of each query vector over the Dataset.

    Returns a pa.Table (query_id, vec_id, cos_sim) sorted by
    (query_id, -cos_sim, vec_id); ties broken by vec_id for determinism.
    """
    import ray

    qn = _normalize(np.asarray(queries))
    q_ref = ray.put(qn)

    def score(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _normalize(_stack(batch, vec_col))
        ids = np.asarray(batch[id_col], dtype=np.int64)
        sims = m @ q.T  # (rows, nq)
        nq = sims.shape[1]
        kk = min(k, sims.shape[0])
        out_q, out_v, out_s = [], [], []
        for j in range(nq):
            idx = np.argpartition(-sims[:, j], kk - 1)[:kk]
            out_q.append(np.full(kk, query_ids[j], dtype=np.int64))
            out_v.append(ids[idx])
            out_s.append(sims[idx, j])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "cos_sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    cand = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["query_id", "cos_sim", "vec_id"], ascending=[True, False, True])
    top = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    return table_from_pandas(top)


def cosine_near_dup_edges_brute(ds, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding"):
    """All pairs with cosine > threshold — broadcast the (small) normalized
    matrix, each task scores its rows against all. Oracle-scale only."""
    import ray

    full = ds.select_columns([id_col, vec_col]).to_pandas()
    ids_all = full[id_col].to_numpy(np.int64)
    mat_all = _normalize(np.asarray(full[vec_col].tolist(), dtype=np.float64))
    ref = ray.put((ids_all, mat_all))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_a, mat = ray.get(ref)
        my = _normalize(_stack(batch, vec_col))
        my_ids = np.asarray(batch[id_col], dtype=np.int64)
        sims = my @ mat.T
        ii, jj = np.nonzero(sims > threshold)
        a, b = my_ids[ii], ids_a[jj]
        keep = a < b  # emit each unordered pair once
        return pa.table(
            {
                "a_id": pa.array(a[keep], pa.int64()),
                "b_id": pa.array(b[keep], pa.int64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")


def _kmeans_fit(sample: np.ndarray, n_lists: int, n_iters: int = 10, seed: int = 7) -> np.ndarray:
    """Tiny deterministic k-means (numpy, driver-side, on a SAMPLE) producing
    the IVF coarse quantizer. Centroids are L2-normalized so list assignment
    is argmax of dot product."""
    rng = np.random.default_rng(seed)
    sample = _normalize(sample)
    idx = rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)
    cent = sample[idx].copy()
    for _ in range(n_iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    sample_size: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
):
    """IVF approximate top-k: the scale path for ANN.

    1. Fit ``n_lists`` coarse centroids on a driver-side SAMPLE (broadcast via
       ray.put — tiny: n_lists x dim floats) — or pass ``centroids=`` to
       reuse a quantizer fitted elsewhere (e.g.
       :func:`kmeans_fit_distributed` over the FULL dataset, the corpus-
       scale fit whose per-iteration traffic is combiner partials only).
    2. Each query probes its ``n_probe`` nearest lists.
    3. Per batch, rows are scored ONLY against queries probing the row's list
       (a (rows, nq) mask), so compute/shuffle cost drops by ~n_lists/n_probe
       vs brute force; the final merge is the same tiny top-k reduce.
    Recall depends on n_probe/n_lists; exact for n_probe = n_lists.
    """
    import ray

    if centroids is not None:
        cent = _normalize(np.asarray(centroids, dtype=np.float64))
    else:
        sample_tbl = ds.limit(sample_size).to_pandas()
        sample = np.asarray(sample_tbl[vec_col].tolist(), dtype=np.float64)
        cent = _kmeans_fit(sample, n_lists)
    qn = _normalize(np.asarray(queries))
    # lists each query probes: (nq, n_probe)
    probes = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]
    ref = ray.put((cent, qn, probes))

    def score(batch: pa.Table) -> pa.Table:
        cent_, qn_, probes_ = ray.get(ref)
        m = _normalize(_stack(batch, vec_col))
        ids = np.asarray(batch[id_col], dtype=np.int64)
        assign = np.argmax(m @ cent_.T, axis=1)  # (rows,) list id per row
        out_q, out_v, out_s = [], [], []
        for j in range(len(qn_)):
            mask = np.isin(assign, probes_[j])
            if not mask.any():
                continue
            sims = m[mask] @ qn_[j]
            kk = min(k, len(sims))
            idx = np.argpartition(-sims, kk - 1)[:kk]
            out_q.append(np.full(kk, query_ids[j], dtype=np.int64))
            out_v.append(ids[mask][idx])
            out_s.append(sims[idx])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "cos_sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    cand = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["query_id", "cos_sim", "vec_id"], ascending=[True, False, True])
    top = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    return table_from_pandas(top)


def topk_recall(approx: pa.Table, exact: pa.Table) -> "pd.DataFrame":
    """Per-query recall of an approximate top-k table against the exact one:
    |approx ∩ exact| / |exact| over vec_id sets, per query_id. Both inputs
    are (query_id, vec_id, ...) tables as returned by :func:`ivf_topk` /
    :func:`brute_force_topk`. Driver-side by design — nq × k rows."""
    import pandas as pd

    a = approx.select(["query_id", "vec_id"]).to_pandas()
    e = exact.select(["query_id", "vec_id"]).to_pandas()
    hit = a.merge(e, on=["query_id", "vec_id"], how="inner").groupby("query_id").size()
    denom = e.groupby("query_id").size()
    out = pd.DataFrame({"query_id": denom.index.to_numpy(np.int64)})
    out["recall_at_k"] = (
        hit.reindex(denom.index, fill_value=0).to_numpy() / denom.to_numpy()
    ).round(9)
    return out


class HyperplaneLSHStage:
    """map_batches callable: sign-bit sketch of embeddings under ``n_bits``
    seeded random hyperplanes → band buckets (like simhash banding). State
    (the projection matrix) built once per actor.

    By default emits ONLY (bucket_part, bucket, vec_id) band rows — 20
    bytes/row; verification re-attaches vectors in two co-partitioned passes.
    With ``carry_vec=True`` the normalized float64 vector rides each band row
    instead (n_bands× duplication) for in-bucket verification — see
    :func:`cosine_near_dup_edges_lsh` for when each shape wins.

    ``n_probes > 1`` enables MULTI-PROBE LSH (Lv et al., VLDB 2007): besides
    its primary bucket, each vector also probes the buckets reached by
    flipping its per-band LOWEST-|margin| projection bits (the bits most
    likely to differ for a true near neighbor). Recall rises toward more-
    bands levels at n_probes× band-row cost but NO extra projection state
    and no extra verify passes — the scale knob when band-collision
    probability, not verification, limits recall. Probe buckets mix with
    the SAME band salt as primaries, so probes collide with other vectors'
    primary buckets."""

    def __init__(self, dim: int, n_bits: int = 32, n_bands: int = 4, seed: int = 17, id_col: str = "vec_id", vec_col: str = "embedding", num_partitions: int = 64, carry_vec: bool = False, n_probes: int = 1):
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((dim, n_bits))
        self.n_bits = n_bits
        self.n_bands = n_bands
        self.band_bits = n_bits // n_bands
        if not 1 <= n_probes <= self.band_bits:
            raise ValueError("n_probes must be in [1, band_bits]")
        self.n_probes = n_probes
        self.id_col = id_col
        self.vec_col = vec_col
        self.num_partitions = num_partitions
        self.carry_vec = carry_vec
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _stack(batch, self.vec_col)
        ids = np.asarray(batch[self.id_col], dtype=np.int64)
        scores = m @ self.proj  # (n, n_bits)
        bits = scores > 0
        n = len(ids)
        bb = self.band_bits
        words = np.zeros(n, dtype=np.uint64)
        for j in range(self.n_bits):
            words |= bits[:, j].astype(np.uint64) << np.uint64(j)
        bands = np.empty((n, self.n_bands), dtype=np.uint64)
        mask = np.uint64((1 << bb) - 1)
        for b in range(self.n_bands):
            bands[:, b] = (words >> np.uint64(b * bb)) & mask
        band_grids = [bands]
        for p in range(self.n_probes - 1):
            flipped = np.empty_like(bands)
            for b in range(self.n_bands):
                seg = np.abs(scores[:, b * bb : (b + 1) * bb])
                weak = np.argpartition(seg, p, axis=1)[:, p]  # p-th weakest bit
                flipped[:, b] = bands[:, b] ^ (np.uint64(1) << weak.astype(np.uint64))
            band_grids.append(flipped)
        bands_all = np.concatenate(band_grids, axis=1)  # (n, n_bands*n_probes)
        band_idx = np.tile(
            np.arange(self.n_bands, dtype=np.uint64), self.n_probes
        )
        with np.errstate(over="ignore"):
            bucket = (bands_all ^ ((band_idx + np.uint64(1)) * _MIX)) >> np.uint64(1)
            part = (bucket % np.uint64(self.num_partitions)).astype(np.int32)
        rows_per = self.n_bands * self.n_probes
        cols = {
            "bucket_part": pa.array(part.ravel(), pa.int32()),
            "bucket": pa.array(bucket.ravel().view(np.int64), pa.int64()),
            "vec_id": pa.array(np.repeat(ids, rows_per), pa.int64()),
        }
        if self.carry_vec:
            vecs = _normalize(m)[np.repeat(np.arange(n), rows_per)]
            cols["vec"] = pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), pa.float64()), self.dim
            )
        return pa.table(cols)


def _id_part(ids: np.ndarray, num_partitions: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return ((ids.view(np.uint64) * _MIX) % np.uint64(num_partitions)).astype(np.int32)


def cosine_near_dup_edges_lsh(
    ds,
    dim: int,
    threshold: float,
    n_bits: int = 32,
    n_bands: int = 4,
    seed: int = 17,
    num_partitions: int = 64,
    bucket_cap: int = 512,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    strategy: str = "auto",
    n_probes: int = 1,
):
    """Hyperplane-LSH candidates + exact (float64) cosine verify.

    Two shuffle shapes, picked by ``strategy`` (the 100-TB design decision):

    - ``"join"``: the band shuffle moves 20-byte (bucket, vec_id) rows — NOT
      the embedding — candidate pairs are deduped FIRST (16-byte rows), then
      verified by attaching the two vectors in two co-partitioned hash-join
      passes (vectors move exactly twice, regardless of n_bands). Wins when
      bands are SELECTIVE (high-threshold near-dup at scale: candidates ≈
      matches), because shuffle weight ∝ candidates, not dim.
    - ``"inplace"``: the normalized float64 vector rides each band row
      (n_bands× duplication) and buckets verify in place with one matmul —
      no pair shuffle at all. Wins when bands are UNSELECTIVE (low
      threshold / narrow bands): candidate pairs >> vectors, so shipping
      pairs would dominate shipping vectors.
    - ``"auto"``: byte-cost comparison — expected candidate-pair traffic
      (48 B × n_bands × n / 2^band_bits per vector) vs vector duplication
      (8 B × dim × n_bands per vector): inplace iff n / 2^band_bits > dim/6.

    Both strategies truncate buckets over ``bucket_cap`` with a dropped-pair
    METRIC row (a_id == -1, b_id = dropped count) — mirror of the MinHash
    path's no-silent-caps rule; filter with :func:`split_pair_metrics`.

    Recall depends on (n_bits, n_bands) vs threshold — with 4 bands of 8
    bits, a pair at cos θ has band-collision prob (1-θ/π)^8 per band."""
    if strategy == "auto":
        # auto needs the row count AND then feeds the chosen pass — pin the
        # input once so a transformed upstream (e.g. an embedding-compute
        # pipeline) is not executed twice. At extreme scale pass an explicit
        # strategy instead to keep the input fully streaming.
        ds = ds.materialize()
        n = ds.count()
        strategy = "inplace" if n / 2 ** (n_bits // n_bands) > dim / 6 else "join"
    if strategy == "inplace":
        return _lsh_edges_inplace(
            ds, dim, threshold, n_bits, n_bands, seed, num_partitions, bucket_cap, id_col, vec_col, n_probes
        )
    stage = HyperplaneLSHStage(
        dim, n_bits, n_bands, seed, id_col=id_col, vec_col=vec_col, num_partitions=num_partitions,
        n_probes=n_probes,
    )

    def pair(batch: pa.Table) -> pa.Table:
        order = np.lexsort((np.asarray(batch["vec_id"]), np.asarray(batch["bucket"])))
        bucket = np.asarray(batch["bucket"])[order]
        ids = np.asarray(batch["vec_id"])[order]
        starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
        ends = np.r_[starts[1:], len(bucket)]
        out_a, out_b = [], []
        dropped = 0
        for s, e in zip(starts, ends):
            full = e - s
            m = min(full, bucket_cap)
            if full > bucket_cap:
                dropped += full * (full - 1) // 2 - m * (m - 1) // 2
            if m < 2:
                continue
            ii, jj = np.triu_indices(int(m), k=1)
            a, b = ids[s + ii], ids[s + jj]
            neq = a != b
            out_a.append(np.minimum(a[neq], b[neq]))
            out_b.append(np.maximum(a[neq], b[neq]))
        if dropped:
            out_a.append(np.array([-1], np.int64))
            out_b.append(np.array([dropped], np.int64))
        if not out_a:
            return pa.table({"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())})
        return pa.table(
            {
                "a_id": pa.array(np.concatenate(out_a), pa.int64()),
                "b_id": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    def dedupe(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a_id"], dtype=np.int64)
        b = np.asarray(batch["b_id"], dtype=np.int64)
        metric = a == -1  # dropped counts SUM, they are not pair keys
        arr = np.unique(np.stack([a[~metric], b[~metric]], axis=1), axis=0)
        d = int(b[metric].sum())
        if d:
            arr = np.concatenate([arr, np.array([[-1, d]], np.int64)])
        return pa.table({"a_id": pa.array(arr[:, 0]), "b_id": pa.array(arr[:, 1])})

    def add_part(batch: pa.Table, n=num_partitions) -> pa.Table:
        a = np.asarray(batch["a_id"]).view(np.uint64)
        b = np.asarray(batch["b_id"]).view(np.uint64)
        with np.errstate(over="ignore"):
            part = (((a * _MIX) ^ b) % np.uint64(n)).astype(np.int32)
        return batch.append_column("edge_part", pa.array(part, pa.int32()))

    cand = map_copartitioned(
        map_part_groups(
            ds.map_batches(stage, batch_format="pyarrow"), "bucket_part", pair
        ).map_batches(add_part, batch_format="pyarrow"),
        "edge_part",
        dedupe,
    )

    vec_type = pa.list_(pa.float64(), dim)

    def vec_rows(batch: pa.Table, n=num_partitions) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        m = _normalize(_stack(batch, vec_col))
        return pa.table(
            {
                "part": pa.array(_id_part(ids, n), pa.int32()),
                "key": pa.array(ids, pa.int64()),
                "other": pa.array(np.zeros(len(ids), np.int64), pa.int64()),
                "vec": pa.FixedSizeListArray.from_arrays(pa.array(m.ravel(), pa.float64()), dim),
                "is_vec": pa.array(np.ones(len(ids), bool)),
            }
        )

    def cand_rows_a(batch: pa.Table, n=num_partitions) -> pa.Table:
        # join key = a_id (metric rows hash to one group and pass through)
        a = np.asarray(batch["a_id"], dtype=np.int64)
        b = np.asarray(batch["b_id"], dtype=np.int64)
        return pa.table(
            {
                "part": pa.array(_id_part(a, n), pa.int32()),
                "key": pa.array(a, pa.int64()),
                "other": pa.array(b, pa.int64()),
                "vec": pa.array([None] * len(a), vec_type),
                "is_vec": pa.array(np.zeros(len(a), bool)),
            }
        )

    # materialized ONCE: both join passes union these rows — without the
    # barrier the upstream dataset (possibly a whole embedding-compute
    # pipeline) would re-execute for each pass
    vecs = ds.map_batches(vec_rows, batch_format="pyarrow").materialize()

    def attach(batch: pa.Table) -> pa.Table:
        """Co-partitioned hash join: pair rows gain the vector of ``key``;
        metric rows (key == -1) pass through with a null vector."""
        is_vec = np.asarray(batch["is_vec"])
        keys = np.asarray(batch["key"], dtype=np.int64)
        vk = keys[is_vec]
        vorder = np.argsort(vk)
        vk = vk[vorder]
        vmat = _stack(batch.filter(pa.array(is_vec)), "vec")[vorder] if is_vec.any() else np.zeros((0, dim))
        pk = keys[~is_vec]
        po = np.asarray(batch["other"], dtype=np.int64)[~is_vec]
        metric = pk == -1
        pos = np.searchsorted(vk, pk)
        hit = (pos < len(vk)) & (vk[np.minimum(pos, max(len(vk) - 1, 0))] == pk) if len(vk) else np.zeros(len(pk), bool)
        keep = hit | metric
        pk, po, pos = pk[keep], po[keep], pos[keep]
        m2 = metric[keep]
        gathered = np.zeros((len(pk), dim))
        if len(vk):
            gathered[~m2] = vmat[pos[~m2]]
        return pa.table(
            {
                "key": pa.array(pk, pa.int64()),
                "other": pa.array(po, pa.int64()),
                "vec": pa.FixedSizeListArray.from_arrays(pa.array(gathered.ravel(), pa.float64()), dim),
                "is_metric": pa.array(m2),
            }
        )

    joined_a = map_copartitioned(
        cand.map_batches(cand_rows_a, batch_format="pyarrow").union(vecs), "part", attach
    )

    def rekey_b(batch: pa.Table, n=num_partitions) -> pa.Table:
        # second pass: join key = b_id, carried vector = vec_a
        b = np.asarray(batch["other"], dtype=np.int64)
        a = np.asarray(batch["key"], dtype=np.int64)
        m = np.asarray(batch["is_metric"])
        key = np.where(m, a, b)  # metric rows keep key=-1
        return pa.table(
            {
                "part": pa.array(_id_part(key, n), pa.int32()),
                "key": pa.array(key, pa.int64()),
                "other": pa.array(np.where(m, b, a), pa.int64()),
                "vec": batch["vec"].combine_chunks() if isinstance(batch["vec"], pa.ChunkedArray) else batch["vec"],
                "is_vec": pa.array(np.zeros(len(a), bool)),
            }
        )

    def verify(batch: pa.Table) -> pa.Table:
        is_vec = np.asarray(batch["is_vec"])
        keys = np.asarray(batch["key"], dtype=np.int64)
        vk = keys[is_vec]
        vorder = np.argsort(vk)
        vk = vk[vorder]
        vmat = _stack(batch.filter(pa.array(is_vec)), "vec")[vorder] if is_vec.any() else np.zeros((0, dim))
        pk = keys[~is_vec]  # b_id (or -1 metric)
        pa_id = np.asarray(batch["other"], dtype=np.int64)[~is_vec]  # a_id (or dropped count)
        pvec = _stack(batch.filter(pa.array(~is_vec)), "vec") if (~is_vec).any() else np.zeros((0, dim))
        metric = pk == -1
        out_a = [pk[metric] * 0 - 1]  # -1 keys
        out_b = [pa_id[metric]]  # dropped counts
        if len(vk):
            pos = np.searchsorted(vk, pk)
            hit = (pos < len(vk)) & (vk[np.minimum(pos, len(vk) - 1)] == pk) & ~metric
            sims = np.einsum("ij,ij->i", pvec[hit], vmat[pos[hit]])
            ok = sims > threshold
            out_a.append(np.minimum(pa_id[hit][ok], pk[hit][ok]))
            out_b.append(np.maximum(pa_id[hit][ok], pk[hit][ok]))
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        o = np.lexsort((b, a))
        return pa.table({"a_id": pa.array(a[o], pa.int64()), "b_id": pa.array(b[o], pa.int64())})

    return map_copartitioned(
        joined_a.map_batches(rekey_b, batch_format="pyarrow").union(vecs), "part", verify
    )


def _lsh_edges_inplace(
    ds, dim, threshold, n_bits, n_bands, seed, num_partitions, bucket_cap, id_col, vec_col, n_probes=1
):
    """In-bucket verification strategy: normalized float64 vectors ride the
    band rows; each bucket verifies with one matmul; only VERIFIED pairs
    (plus dropped-count metric rows) leave the bucket stage, then one
    dedupe shuffle."""
    stage = HyperplaneLSHStage(
        dim, n_bits, n_bands, seed, id_col=id_col, vec_col=vec_col,
        num_partitions=num_partitions, carry_vec=True, n_probes=n_probes,
    )

    def pair_verify(batch: pa.Table) -> pa.Table:
        order = np.lexsort((np.asarray(batch["vec_id"]), np.asarray(batch["bucket"])))
        bucket = np.asarray(batch["bucket"])[order]
        ids = np.asarray(batch["vec_id"])[order]
        vecs = _stack(batch, "vec")[order]
        starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
        ends = np.r_[starts[1:], len(bucket)]
        out_a, out_b = [], []
        dropped = 0
        for s, e in zip(starts, ends):
            full = e - s
            m = min(full, bucket_cap)
            if full > bucket_cap:
                dropped += full * (full - 1) // 2 - m * (m - 1) // 2
            if m < 2:
                continue
            sub = vecs[s : s + m]
            sims = sub @ sub.T
            ii, jj = np.nonzero(np.triu(sims > threshold, k=1))
            a, b = ids[s + ii], ids[s + jj]
            neq = a != b
            out_a.append(np.minimum(a[neq], b[neq]))
            out_b.append(np.maximum(a[neq], b[neq]))
        if dropped:
            out_a.append(np.array([-1], np.int64))
            out_b.append(np.array([dropped], np.int64))
        if not out_a:
            return pa.table({"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())})
        return pa.table(
            {
                "a_id": pa.array(np.concatenate(out_a), pa.int64()),
                "b_id": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    def dedupe(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a_id"], dtype=np.int64)
        b = np.asarray(batch["b_id"], dtype=np.int64)
        metric = a == -1
        arr = np.unique(np.stack([a[~metric], b[~metric]], axis=1), axis=0)
        d = int(b[metric].sum())
        if d:
            arr = np.concatenate([arr, np.array([[-1, d]], np.int64)])
        return pa.table({"a_id": pa.array(arr[:, 0]), "b_id": pa.array(arr[:, 1])})

    def add_part(batch: pa.Table, n=num_partitions) -> pa.Table:
        a = np.asarray(batch["a_id"]).view(np.uint64)
        b = np.asarray(batch["b_id"]).view(np.uint64)
        with np.errstate(over="ignore"):
            part = (((a * _MIX) ^ b) % np.uint64(n)).astype(np.int32)
        return batch.append_column("edge_part", pa.array(part, pa.int32()))

    return map_copartitioned(
        map_part_groups(
            ds.map_batches(stage, batch_format="pyarrow"), "bucket_part", pair_verify
        ).map_batches(add_part, batch_format="pyarrow"),
        "edge_part",
        dedupe,
    )


def split_pair_metrics(pairs_table: pa.Table) -> tuple[pa.Table, int]:
    """Split (a_id == -1) dropped-pair metric rows out of an edge table."""
    import pyarrow.compute as pc

    mask = pc.equal(pairs_table["a_id"], -1)
    dropped = int(pc.sum(pc.if_else(mask, pairs_table["b_id"], 0)).as_py() or 0)
    return pairs_table.filter(pc.invert(mask)), dropped


# -- distributed spherical k-means + SemDeDup-style semantic dedup -----------


def kmeans_assign(ds, centroids: np.ndarray, id_col: str = "vec_id", vec_col: str = "embedding", out_col: str = "cluster_id"):
    """Assign every vector to its max-cosine centroid (ties -> lowest index).

    Centroids are the SMALL side: ``ray.put`` once (k x dim float64), read
    zero-copy from the object store inside every task — no shuffle; the map
    is one float64 matmul per batch. Output is (id_col, out_col) only, so
    the result is integer-exact (value-hash-stable) regardless of float
    kernel rounding — any sim column would hash-drift between backends.
    ``np.argmax`` returns the FIRST maximum, i.e. the lowest centroid index,
    matching the SQL twin's ``ORDER BY sim DESC, cid ASC`` tie-break.
    """
    import ray

    cn = _normalize(np.asarray(centroids))
    ref = ray.put(cn)

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(ref)
        m = _normalize(_stack(batch, vec_col))
        cid = np.argmax(m @ cent.T, axis=1).astype(np.int64)
        return pa.table({id_col: batch[id_col], out_col: pa.array(cid)})

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_fit_distributed(
    ds,
    k: int,
    n_iters: int = 10,
    seed: int = 7,
    vec_col: str = "embedding",
    init: np.ndarray | None = None,
    sample_limit: int = 8192,
    materialize: bool = False,
):
    """Spherical k-means (Lloyd) fit over the FULL Dataset, distributed.

    Per iteration the only data that moves is the per-block partial
    statistic — at most k rows of (cluster, count, sum-vector, inertia) per
    block — which the driver reduces into new centroids (k x dim float64,
    tiny) and re-broadcasts via ``ray.put``. The input streams through
    ``map_batches`` each iteration; there is no shuffle and no full
    materialization. Empty clusters retain their previous centroid.
    Deterministic: init is a seeded choice from the first ``sample_limit``
    rows (or the caller's ``init``), and the driver reduce sums partials in
    block order.

    ``materialize=True`` pins the (id, vector) projection in the object
    store once so the n_iters passes re-read blocks instead of cold storage
    — the right call when the source is remote parquet; leave False when
    the read is cheap or memory is tight (Ray will spill either way).

    Returns ``(centroids, history)`` where history[i] is the total inertia
    (sum of 1 - cos(x, centroid)) after iteration i — non-increasing up to
    empty-cluster resets, asserted by tests/test_kmeans.py.
    """
    import ray

    if materialize:
        ds = ds.materialize()
    if init is None:
        sample_tbl = ds.limit(sample_limit).to_pandas()
        sample = _normalize(np.asarray(sample_tbl[vec_col].tolist(), dtype=np.float64))
        rng = np.random.default_rng(seed)
        idx = rng.choice(len(sample), size=min(k, len(sample)), replace=False)
        cent = sample[idx].copy()
    else:
        cent = _normalize(np.asarray(init, dtype=np.float64))
    k = len(cent)
    dim = cent.shape[1]
    history: list[float] = []

    for _ in range(n_iters):
        ref = ray.put(cent)

        def partial(batch: pa.Table, _ref=ref, _k=k) -> pa.Table:
            c = ray.get(_ref)
            m = _normalize(_stack(batch, vec_col))
            sims = m @ c.T
            a = np.argmax(sims, axis=1)
            counts = np.bincount(a, minlength=_k)
            sums = np.zeros((_k, m.shape[1]), dtype=np.float64)
            np.add.at(sums, a, m)
            inert = np.bincount(a, weights=1.0 - sims[np.arange(len(a)), a], minlength=_k)
            present = np.flatnonzero(counts)
            return pa.table(
                {
                    "cluster": pa.array(present.astype(np.int64)),
                    "count": pa.array(counts[present].astype(np.int64)),
                    "vsum": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums[present].ravel(), pa.float64()), m.shape[1]
                    ),
                    "inertia": pa.array(inert[present], pa.float64()),
                }
            )

        # partials are tiny (<= k rows per block); pulling them to the driver
        # for the k x dim reduce IS the distributed-kmeans pattern, not a
        # driver-side data pull.
        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        new = cent.copy()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        cl = parts["cluster"].to_numpy()
        np.add.at(counts, cl, parts["count"].to_numpy())
        np.add.at(sums, cl, np.asarray(parts["vsum"].tolist(), dtype=np.float64))
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        cent = _normalize(new)
        history.append(float(parts["inertia"].sum()))
    return cent, history


def semantic_dedup(
    ds,
    centroids: np.ndarray,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk: int = 1024,
    keep_cols: tuple = (),
):
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    partition by k-means cluster, then WITHIN each cluster drop every vector
    that has a lower-id neighbour with cosine >= tau (keep-first-by-id, the
    same canonical cut as the exact-substring keep rule; the existence test
    counts ALL lower-id rows, kept or dropped, so it is order-free and
    SQL-twin-expressible as a plain EXISTS). Returns kept (id_col,
    cluster_id) rows.

    Scale shape: ONE keyed exchange on cluster_id — the k-means partition is
    exactly what makes within-cluster pairwise feasible (clusters are ~n/k
    rows; size k ~ sqrt(n) as in the paper). Per-group compute is a chunked
    (chunk x members) matmul, so score-matrix memory is O(chunk * members),
    never members^2. ``keep_cols`` pass through on kept rows (no re-join).
    """
    assigned = _attach_cluster(ds, centroids, id_col=id_col, vec_col=vec_col)
    out_cols = [id_col, "cluster_id", *keep_cols]

    def keep(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return block.select(out_cols) if set(out_cols) <= set(block.column_names) else pa.table(
                {c: pa.array([], pa.int64()) for c in out_cols}
            )
        cids = block["cluster_id"].to_numpy(zero_copy_only=False)
        ids = block[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_stack(block, vec_col))
        kept_pos: list[np.ndarray] = []
        starts = np.flatnonzero(np.r_[True, cids[1:] != cids[:-1]])
        ends = np.r_[starts[1:], len(cids)]
        for s, e in zip(starts, ends):
            order = np.argsort(ids[s:e], kind="stable")
            sub = m[s:e][order]
            n = int(e - s)
            drop = np.zeros(n, dtype=bool)
            for a in range(1, n, chunk):  # row 0 (lowest id) is always kept
                b = min(a + chunk, n)
                scores = sub[a:b] @ sub[:b].T
                older = np.arange(b)[None, :] < np.arange(a, b)[:, None]
                drop[a:b] = ((scores >= tau) & older).any(axis=1)
            kept_pos.append(np.arange(s, e)[order][~drop])
        pos = np.concatenate(kept_pos) if kept_pos else np.array([], dtype=np.int64)
        return block.select(out_cols).take(pa.array(np.sort(pos)))

    from ..grouping import map_copartitioned

    return map_copartitioned(assigned, "cluster_id", keep)


def _attach_cluster(ds, centroids: np.ndarray, id_col: str, vec_col: str):
    """kmeans_assign that CARRIES the vector column (for within-cluster work)."""
    import ray

    cn = _normalize(np.asarray(centroids))
    ref = ray.put(cn)

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(ref)
        m = _normalize(_stack(batch, vec_col))
        cid = np.argmax(m @ cent.T, axis=1).astype(np.int64)
        return batch.append_column("cluster_id", pa.array(cid))

    return ds.map_batches(assign, batch_format="pyarrow")


def pack_vectors(ds, vec_col: str = "embedding"):
    """Re-encode a list<float> embedding column as fixed_size_binary
    (little-endian float32 rows). Acero — the engine under Ray Data's
    native ``Dataset.join`` — rejects list-typed NON-KEY columns, so a
    vector payload must ride through a hash join in a fixed-width layout.
    Lossless (f32 bits preserved); :func:`_stack` decodes the packed
    layout directly, so every embedding kernel (kmeans_assign,
    semantic_dedup, top-k) consumes packed columns unchanged."""

    def pack(batch: pa.Table) -> pa.Table:
        m = np.ascontiguousarray(_stack(batch, vec_col), dtype="<f4")
        typ = pa.binary(4 * m.shape[1])
        arr = pa.Array.from_buffers(typ, len(m), [None, pa.py_buffer(m.tobytes())])
        idx = batch.schema.get_field_index(vec_col)
        return batch.set_column(idx, vec_col, arr)

    return ds.map_batches(pack, batch_format="pyarrow")


def label_centroids(ds, by: str = "label", vec_col: str = "embedding"):
    """Per-group embedding centroid (component means) — the class-prototype
    aggregate behind nearest-centroid classifiers and per-source embedding
    drift reports. Combiner shape: each block emits ONE (group, sum-vector,
    count) partial (vector rides as float64 bytes, dim x 8 B per group per
    block regardless of rows) -> one group exchange -> sum + divide.

    Output is EXPLODED to (by, i, avg_v) rows — 1-based component index,
    round-9 — because a list column would be silently dropped from the
    driver's value-hash; the exploded form is exactly hashable and matches
    the SQL twin's generate_series indexing. Component sums accumulate
    per-block then across blocks, so float addition ORDER differs from the
    SQL engine's single stream — agreement at round-9 (the unigram_surprisal
    contract)."""
    import pandas as pd

    from ..grouping import map_copartitioned

    def partial(batch: pa.Table) -> pa.Table:
        m = _stack(batch, vec_col)
        lab = np.asarray(batch[by], dtype=np.int64)
        codes, uniq = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(codes), m.shape[1]), np.float64)
        np.add.at(sums, uniq, m)
        cnt = np.bincount(uniq, minlength=len(codes)).astype(np.int64)
        return pa.table(
            {
                by: pa.array(codes, pa.int64()),
                "vsum": pa.array([s.tobytes() for s in sums], pa.binary()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    def final(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return pd.DataFrame(
                {by: np.empty(0, np.int64), "i": np.empty(0, np.int64),
                 "avg_v": np.empty(0, np.float64)}
            )
        outs = []
        for g, sub in block.groupby(by, sort=True):
            vs = np.stack([np.frombuffer(b, np.float64) for b in sub["vsum"]])
            mean = vs.sum(axis=0) / float(sub["cnt"].sum())
            outs.append(pd.DataFrame(
                {by: np.int64(g),
                 "i": np.arange(1, len(mean) + 1, dtype=np.int64),
                 "avg_v": np.round(mean, 9)}
            ))
        return pd.concat(outs, ignore_index=True)

    return map_copartitioned(
        ds.map_batches(partial, batch_format="pyarrow"), by, final,
        batch_format="pandas",
    )
