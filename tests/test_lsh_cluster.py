"""F-CODE: LSH recall vs brute-force oracle, cluster-assignment match,
skew/salting path equivalence, distributed CC == driver union-find."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from elasticsearch_minhash_ray.functions.minhash import MinHashConfig, MinHasher, compare_many
from elasticsearch_minhash_ray.functions.tokenize import get_tokenizer
from elasticsearch_minhash_ray.pipelines.neardup import (
    LSHConfig,
    PipelineConfig,
    near_dup_pipeline,
)
from elasticsearch_minhash_ray.sources.corpus import prepare_batch
from elasticsearch_minhash_ray.sources.synth import code_corpus
from elasticsearch_minhash_ray.stages.cluster import (
    _UnionFind,
    connected_components_distributed,
    connected_components_driver,
)

CFG = MinHashConfig(num_of_hash=128, bit=1, seed=0, name="sig")
THRESH = 0.95


@pytest.fixture(scope="module")
def corpus():
    t = code_corpus(seed=42)
    return prepare_batch(t)


@pytest.fixture(scope="module")
def oracle(corpus):
    """Brute-force O12 ground truth: all-pairs b-bit compare at CFG ≥ 0.95."""
    tok = get_tokenizer(CFG.tokenizer)
    contents = corpus["content"].to_pylist()
    sigs = MinHasher(CFG).signatures([tok(c) for c in contents])
    keys = corpus["doc_key"].to_numpy(zero_copy_only=False)
    n = len(sigs)
    w = CFG.full_width
    mat = np.zeros((n, w), np.uint8)
    lens = np.zeros(n, np.int64)
    for i, s in enumerate(sigs):
        lens[i] = len(s)
        mat[i, : len(s)] = np.frombuffer(s, np.uint8)
    pairs = set()
    uf = _UnionFind()
    ia, ib = np.triu_indices(n, k=1)
    for lo in range(0, len(ia), 2_000_000):
        sl = slice(lo, lo + 2_000_000)
        sims = compare_many(mat[ia[sl]], mat[ib[sl]], lens[ia[sl]], lens[ib[sl]], w)
        hit = np.flatnonzero(sims >= THRESH)
        for a, b in zip(ia[sl][hit], ib[sl][hit]):
            ka, kb = int(keys[a]), int(keys[b])
            if ka != kb:
                pairs.add((min(ka, kb), max(ka, kb)))
                uf.union(ka, kb)
    comps = {}
    for node in uf.parent:
        comps.setdefault(uf.find(node), set()).add(node)
    return pairs, {frozenset(v) for v in comps.values()}


def _to_df(x):
    import pandas as pd

    return x if isinstance(x, pd.DataFrame) else x.to_pandas()


def _cluster_partition(clusters_tbl):
    df = _to_df(clusters_tbl)
    parts = {}
    for k, c in zip(df["doc_key"], df["cluster_id"]):
        parts.setdefault(c, set()).add(k)
    return {frozenset(v) for v in parts.values()}


def _recall(pairs, clusters_tbl) -> float:
    df = _to_df(clusters_tbl)
    label = dict(zip(df["doc_key"], df["cluster_id"]))
    hit = sum(1 for a, b in pairs if label.get(a) is not None and label.get(a) == label.get(b))
    return hit / max(1, len(pairs))


def test_recall_and_cluster_match(ray_session, corpus, oracle):
    pairs, oracle_parts = oracle
    assert len(pairs) > 1000  # the corpus really contains dup families
    ds = rd.from_arrow(corpus.drop_columns(["doc_id", "doc_key", "content_sha256"]))
    cfg = PipelineConfig(minhash=CFG, lsh=LSHConfig(num_partitions=16), sig_concurrency=(1, 2))
    res = near_dup_pipeline(ds, cfg)
    recall = _recall(pairs, res.clusters)
    assert recall >= 0.99, f"recall {recall}"
    # partition match (pipeline edges are verified at the same threshold, so
    # clusters must equal the oracle components exactly at this corpus size)
    assert _cluster_partition(res.clusters) == oracle_parts
    assert res.metrics["n_edges"] > 0


def test_skew_capped_path_same_clusters(ray_session, corpus, oracle):
    _, oracle_parts = oracle
    ds = rd.from_arrow(corpus.drop_columns(["doc_id", "doc_key", "content_sha256"]))
    # force the giant boilerplate bucket through the cap+star path
    cfg = PipelineConfig(
        minhash=CFG, lsh=LSHConfig(num_partitions=16, bucket_cap=32), sig_concurrency=(1, 2)
    )
    res = near_dup_pipeline(ds, cfg)
    assert res.metrics["dropped_pairs"] > 0  # cap actually triggered
    assert _cluster_partition(res.clusters) == oracle_parts


def test_salted_repartitioning_same_clusters(ray_session, corpus, oracle):
    """n_salts > 1 splits every bucket across salt groups (giant boilerplate
    family included) and reconnects them through verified representative
    links — cluster assignments must equal the unsalted oracle partition."""
    _, oracle_parts = oracle
    ds = rd.from_arrow(corpus.drop_columns(["doc_id", "doc_key", "content_sha256"]))
    cfg = PipelineConfig(
        minhash=CFG,
        lsh=LSHConfig(num_partitions=16, n_salts=8, bucket_cap=32),
        sig_concurrency=(1, 2),
    )
    res = near_dup_pipeline(ds, cfg)
    assert _cluster_partition(res.clusters) == oracle_parts
    # prove the (distributed) hot-bucket detection actually fires on the
    # giant family — the driver pulls only the hot set
    from elasticsearch_minhash_ray.pipelines.neardup import compute_signatures
    from elasticsearch_minhash_ray.stages.lsh import BandStage, hot_buckets

    sigs = compute_signatures(ds, cfg, keep_columns=("doc_key", "minhash_sig"))
    bands = sigs.map_batches(BandStage(lsh=cfg.lsh, cfg=CFG), batch_format="pyarrow")
    hot = hot_buckets(bands, 2 * cfg.lsh.bucket_cap, cfg.lsh.num_partitions)
    assert len(hot) > 0
    assert np.all(np.diff(hot) > 0)  # sorted unique (SaltHotBuckets binary-searches it)


def test_collapse_exact_same_clusters(ray_session, corpus, oracle):
    """collapse_exact bands one rep per distinct signature + sim=1.0 star
    edges — clusters must equal the full path exactly (members share the
    rep's signature bit-for-bit, so every band/verify decision is identical)."""
    _, oracle_parts = oracle
    ds = rd.from_arrow(corpus.drop_columns(["doc_id", "doc_key", "content_sha256"]))
    cfg = PipelineConfig(
        minhash=CFG, lsh=LSHConfig(num_partitions=16), sig_concurrency=(1, 2), collapse_exact=True
    )
    res = near_dup_pipeline(ds, cfg)
    assert _cluster_partition(res.clusters) == oracle_parts


def test_distributed_cc_matches_driver(ray_session):
    rng = np.random.default_rng(3)
    # random graph with known components: 40 blobs + noise edges inside blobs
    edges = []
    for c in range(40):
        nodes = rng.choice(10_000, size=rng.integers(2, 30), replace=False) + c * 10_000
        for v in nodes[1:]:
            edges.append((min(nodes[0], v), max(nodes[0], v)))
        extra = rng.integers(0, len(nodes), size=(10, 2))
        for a, b in extra:
            if nodes[a] != nodes[b]:
                edges.append((min(nodes[a], nodes[b]), max(nodes[a], nodes[b])))
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    drv = connected_components_driver(t)
    dist = connected_components_distributed(rd.from_arrow(t), num_partitions=8)
    a = _cluster_partition(drv)
    b = _cluster_partition(dist.to_pandas())
    assert a == b


def test_distributed_cc_on_real_edges(ray_session, corpus, oracle):
    _, oracle_parts = oracle
    ds = rd.from_arrow(corpus.drop_columns(["doc_id", "doc_key", "content_sha256"]))
    cfg = PipelineConfig(
        minhash=CFG, lsh=LSHConfig(num_partitions=16), sig_concurrency=(1, 2), distributed_cc=True
    )
    res = near_dup_pipeline(ds, cfg)
    assert _cluster_partition(res.clusters.to_pandas()) == oracle_parts


def test_auto_distributed_cc_over_edge_budget(ray_session, corpus, oracle):
    """max_driver_edges below the candidate count must auto-switch to the
    distributed path (no error) and produce identical clusters."""
    _, oracle_parts = oracle
    ds = rd.from_arrow(corpus.drop_columns(["doc_id", "doc_key", "content_sha256"]))
    cfg = PipelineConfig(
        minhash=CFG,
        lsh=LSHConfig(num_partitions=16),
        sig_concurrency=(1, 2),
        max_driver_edges=100,  # way below the real candidate count
    )
    res = near_dup_pipeline(ds, cfg)
    assert _cluster_partition(res.clusters) == oracle_parts


def test_distributed_cc_long_chain(ray_session):
    """A 600-node path graph (diameter 599) must converge via pointer
    jumping in O(log n) rounds — would need 599 rounds (>> max_rounds=30)
    with plain 1-hop propagation."""
    n = 600
    t = pa.table(
        {
            "src": pa.array(list(range(n - 1)), pa.int64()),
            "dst": pa.array(list(range(1, n)), pa.int64()),
        }
    )
    out = connected_components_distributed(
        rd.from_arrow(t), num_partitions=4
    ).to_pandas()
    assert len(out) == n
    assert (out["cluster_id"] == 0).all()


def test_prededuped_driver_pull_same_result(ray_session, corpus, oracle):
    """max_driver_edges // 4 < raw candidate count <= max_driver_edges routes
    through the distributed-dedupe-then-pull path; clusters, edge count and
    dropped-pair metrics must equal the plain single-pull path."""
    _, oracle_parts = oracle
    ds = rd.from_arrow(corpus.drop_columns(["doc_id", "doc_key", "content_sha256"]))
    base = dict(minhash=CFG, lsh=LSHConfig(num_partitions=16), sig_concurrency=(1, 2))
    plain = near_dup_pipeline(ds, PipelineConfig(**base))
    assert plain.metrics["edge_path"] == "driver-pull"
    raw = plain.metrics["raw_candidates"]
    assert raw and raw > plain.metrics["n_edges"]  # multi-band rediscovery real
    # budget = 2 * raw satisfies budget // 4 < raw <= budget → pre-dedupe path
    pre = near_dup_pipeline(ds, PipelineConfig(**base, max_driver_edges=2 * raw))
    assert pre.metrics["edge_path"] == "driver-pull-prededuped"
    assert _cluster_partition(pre.clusters) == _cluster_partition(plain.clusters) == oracle_parts
    assert pre.metrics["n_edges"] == plain.metrics["n_edges"]
    assert pre.metrics["dropped_pairs"] == plain.metrics["dropped_pairs"]


def test_near_dup_keep_strategies_equal(ray_session, corpus):
    """The dedup ACTION: broadcast-filter and union-anti-join strategies of
    near_dup_keep must return the identical kept row set, and that set must
    be exactly (all docs) minus (clustered non-representatives)."""
    import pandas as pd

    from elasticsearch_minhash_ray import near_dup_keep

    ds = rd.from_arrow(corpus.drop_columns(["doc_id", "doc_key", "content_sha256"]))
    cfg = PipelineConfig(minhash=CFG, lsh=LSHConfig(num_partitions=16), sig_concurrency=(1, 2))
    res = near_dup_pipeline(ds, cfg)
    cols = ["doc_id", "doc_key", "content_sha256"]
    kept_b = near_dup_keep(res.signatures, res.clusters).to_pandas()
    kept_j = near_dup_keep(
        res.signatures, res.clusters, broadcast_limit=0, num_partitions=8
    ).to_pandas()
    a = kept_b.sort_values("doc_key").reset_index(drop=True)[cols]
    b = kept_j.sort_values("doc_key").reset_index(drop=True)[cols]
    pd.testing.assert_frame_equal(a, b)
    # semantics vs the cluster table
    cl = _to_df(res.clusters)
    drop = set(cl.loc[cl["doc_key"] != cl["cluster_id"], "doc_key"])
    assert len(drop) > 0  # the corpus has real dup families
    all_keys = set(corpus["doc_key"].to_pylist())
    assert set(a["doc_key"]) == all_keys - drop
