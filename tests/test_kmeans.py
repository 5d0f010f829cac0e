"""Distributed spherical k-means + SemDeDup: the iterative fit is not
SQL-expressible, so it is pinned by (a) exact equivalence against a
single-process numpy Lloyd reference on identical init, (b) a
non-increasing-inertia contract, (c) determinism across runs, and (d) a
brute-force reference of the SemDeDup keep rule (the SQL twin in
__ray_entry__.py covers the same rule independently at the gate scales)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _embeddings():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], m[order]


def _normalize(m):
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _reference_lloyd(m, cent, n_iters):
    """Single-process spherical Lloyd, same update rule as the distributed fit."""
    m = _normalize(m)
    cent = _normalize(cent.copy())
    hist = []
    for _ in range(n_iters):
        sims = m @ cent.T
        a = np.argmax(sims, axis=1)
        hist.append(float(np.sum(1.0 - sims[np.arange(len(a)), a])))
        for c in range(len(cent)):
            members = m[a == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent, hist


def _ds(ray_session):
    from elasticsearch_minhash_ray.sources.corpus import read_parquet_auto

    return read_parquet_auto(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"], dense=True
    )


def test_fit_matches_single_process_reference(ray_session):
    from elasticsearch_minhash_ray.stages.embed import kmeans_fit_distributed

    ids, m = _embeddings()
    init = m[:8]
    cent, hist = kmeans_fit_distributed(_ds(ray_session), k=8, n_iters=4, init=init)
    ref_cent, ref_hist = _reference_lloyd(m, _normalize(init), n_iters=4)
    # distributed partial sums add in a different order than the reference's
    # member mean -> float64 associativity noise only
    assert np.allclose(cent, ref_cent, atol=1e-12)
    assert np.allclose(hist, ref_hist, atol=1e-9)


def test_fit_inertia_nonincreasing_and_deterministic(ray_session):
    from elasticsearch_minhash_ray.stages.embed import kmeans_fit_distributed

    cent1, hist1 = kmeans_fit_distributed(_ds(ray_session), k=8, n_iters=5, seed=7)
    cent2, hist2 = kmeans_fit_distributed(_ds(ray_session), k=8, n_iters=5, seed=7)
    assert np.array_equal(cent1, cent2)
    assert hist1 == hist2
    assert all(b <= a + 1e-9 for a, b in zip(hist1, hist1[1:]))


def test_assign_matches_reference_argmax(ray_session):
    from elasticsearch_minhash_ray.stages.embed import kmeans_assign

    ids, m = _embeddings()
    cent = m[:8]
    got = kmeans_assign(_ds(ray_session), cent).to_pandas().sort_values("vec_id")
    want = np.argmax(_normalize(m) @ _normalize(cent).T, axis=1)
    assert np.array_equal(got["cluster_id"].to_numpy(), want)


def test_semantic_dedup_matches_bruteforce_rule(ray_session):
    from elasticsearch_minhash_ray.stages.embed import semantic_dedup

    ids, m = _embeddings()
    cent = m[:8]
    tau = 0.35
    mn = _normalize(m)
    assign = np.argmax(mn @ _normalize(cent).T, axis=1)
    sims = mn @ mn.T
    keep = np.ones(len(ids), dtype=bool)
    for i in range(len(ids)):
        earlier = (np.arange(len(ids)) < i) & (assign == assign[i])
        if earlier.any() and (sims[i, earlier] >= tau).any():
            keep[i] = False
    want = set(ids[keep].tolist())

    # chunk=3 forces the chunked matmul path to cross many boundaries
    got = semantic_dedup(_ds(ray_session), cent, tau=tau, chunk=3).to_pandas()
    assert set(got["vec_id"].tolist()) == want
    assert len(got) == int(keep.sum())
    # dropped rows exist (the rule is non-trivial on this table)
    assert len(got) < len(ids)


def test_semantic_dedup_planted_transitive_chain(ray_session):
    """a<b<c where sim(a,b)>=tau, sim(b,c)>=tau but sim(a,c)<tau: the
    keep-first rule keeps a, drops b AND c (c's witness b is itself dropped —
    the EXISTS counts all lower ids, kept or not)."""
    import pyarrow as pa
    import ray.data as rd

    from elasticsearch_minhash_ray.stages.embed import semantic_dedup

    rng = np.random.default_rng(3)
    base = _normalize(rng.normal(size=(1, 16)))[0]
    orth = _normalize(rng.normal(size=(1, 16)))[0]
    orth = _normalize((orth - orth @ base * base)[None, :])[0]
    # angles 0deg, 40deg, 80deg: cos(a,b)=cos(b,c)=0.766, cos(a,c)=0.17
    vecs = [
        base,
        np.cos(np.deg2rad(40)) * base + np.sin(np.deg2rad(40)) * orth,
        np.cos(np.deg2rad(80)) * base + np.sin(np.deg2rad(80)) * orth,
    ]
    t = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array([v.astype(np.float32).tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t)
    got = semantic_dedup(ds, np.stack([base]), tau=0.5).to_pandas()
    assert sorted(got["vec_id"].tolist()) == [1]


def test_pack_vectors_roundtrip_through_kernels(ray_session):
    """fixed_size_binary packing (the Dataset.join payload layout) must be
    bit-lossless and readable by _stack — kmeans_assign over a packed
    column equals assignment over the original list<float> column."""
    import ray.data as rd

    from elasticsearch_minhash_ray.stages.embed import (
        _stack,
        kmeans_assign,
        pack_vectors,
    )

    ids, m = _embeddings()
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ds = rd.from_arrow(t).repartition(3)
    packed = pack_vectors(ds)
    # bit-exact: unpack via _stack equals the float32 source exactly
    pb = packed.take_batch(500, batch_format="pyarrow")
    got = _stack(pb, "embedding")
    src = np.asarray(t["embedding"].to_pylist(), dtype=np.float32).astype(np.float64)
    order = np.argsort(t["vec_id"].to_numpy())
    got_sorted = got[np.argsort(pb["vec_id"].to_numpy())]
    assert np.array_equal(got_sorted, src[order])

    cent = m[:8]
    a = kmeans_assign(packed, cent).to_pandas().sort_values("vec_id")
    b = kmeans_assign(ds, cent).to_pandas().sort_values("vec_id")
    assert np.array_equal(a["cluster_id"].to_numpy(), b["cluster_id"].to_numpy())


def test_ivf_topk_with_distributed_centroids(ray_session):
    """ivf_topk(centroids=) reuses a kmeans_fit_distributed quantizer; with
    n_probe = n_lists the result must equal brute-force top-k exactly
    (probing every list is exhaustive regardless of the quantizer)."""
    from elasticsearch_minhash_ray.stages.embed import (
        brute_force_topk,
        ivf_topk,
        kmeans_fit_distributed,
    )

    ids, m = _embeddings()
    cent, _ = kmeans_fit_distributed(_ds(ray_session), k=8, n_iters=3, seed=7)
    q = m[:3]
    qids = np.array([100, 101, 102], dtype=np.int64)
    exact = brute_force_topk(_ds(ray_session), q, qids, k=5).to_pandas()
    approx = ivf_topk(
        _ds(ray_session), q, qids, k=5, n_lists=8, n_probe=8, centroids=cent
    ).to_pandas()
    cols = ["query_id", "vec_id"]
    a = approx[cols].sort_values(cols).reset_index(drop=True)
    b = exact[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
