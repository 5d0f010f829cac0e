"""Persistent band index + delta near-dup (pipelines/delta.py): the
incremental path must agree with a full run on old ∪ new — exact edge-set
equality when no bucket hits the cap, cluster-partition equality through
the capped skew path — and the index must be appendable (delta N sees
delta N-1's docs as old)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from elasticsearch_minhash_ray.functions.minhash import MinHashConfig
from elasticsearch_minhash_ray.pipelines.delta import (
    band_index_fingerprint,
    build_band_index,
    near_dup_delta,
)
from elasticsearch_minhash_ray.pipelines.neardup import (
    LSHConfig,
    PipelineConfig,
    compute_signatures,
    near_dup_pipeline,
)
from elasticsearch_minhash_ray.sources.synth import code_corpus

CFG = MinHashConfig(name="sig")


def _cfg(**lsh_kw):
    lsh_kw.setdefault("num_partitions", 8)
    lsh_kw.setdefault("bucket_cap", 1_000_000)  # uncapped → exact edge equality
    return PipelineConfig(
        minhash=CFG, lsh=LSHConfig(**lsh_kw), sig_concurrency=None
    )


def _split(seed=42, frac=0.7, parts=2):
    raw = code_corpus(seed=seed)
    rng = np.random.default_rng(7)
    idx = rng.permutation(raw.num_rows)
    if parts == 2:
        cut = int(raw.num_rows * frac)
        return raw.take(idx[:cut]), raw.take(idx[cut:])
    cuts = np.linspace(0, raw.num_rows, parts + 1).astype(int)
    return tuple(raw.take(idx[cuts[i] : cuts[i + 1]]) for i in range(parts))


def _edge_set(edges):
    df = edges.to_pandas() if not isinstance(edges, pa.Table) else edges.to_pandas()
    return {(int(s), int(d)): float(v) for s, d, v in zip(df["src"], df["dst"], df["sim"])}


def _partition(clusters):
    df = clusters.to_pandas() if not isinstance(clusters, pa.Table) else clusters.to_pandas()
    parts = {}
    for k, c in zip(df["doc_key"], df["cluster_id"]):
        parts.setdefault(c, set()).add(int(k))
    return {frozenset(v) for v in parts.values()}


def _index_for(old_raw, cfg, index_dir):
    sigs = compute_signatures(
        rd.from_arrow(old_raw), cfg, keep_columns=("doc_key", "minhash_sig")
    )
    return build_band_index(sigs, cfg, index_dir)


def test_delta_equals_full_run(ray_session, tmp_path):
    old_raw, new_raw = _split()
    cfg = _cfg()
    full = near_dup_pipeline(rd.from_arrow(code_corpus(seed=42)), cfg)
    old = near_dup_pipeline(rd.from_arrow(old_raw), cfg)

    index_dir = str(tmp_path / "bandindex")
    lin = _index_for(old_raw, cfg, index_dir)
    assert lin["fingerprint"] == band_index_fingerprint(cfg)
    assert lin["num_partitions"] == cfg.lsh.num_partitions

    res = near_dup_delta(
        rd.from_arrow(new_raw), index_dir, cfg, old_edges=old.edges, run_id="d1"
    )
    # exact edge-set equality: full == old ∪ delta (uncapped buckets)
    full_e = _edge_set(full.edges)
    old_e = _edge_set(old.edges)
    new_e = _edge_set(res.new_edges)
    assert set(old_e) & set(new_e) == set()  # delta never re-derives old-old
    assert len(new_e) > 50  # the split actually produced cross edges
    got = {**old_e, **new_e}
    assert set(got) == set(full_e)
    for k in full_e:
        assert got[k] == pytest.approx(full_e[k])
    # cluster partitions equal
    assert _partition(res.clusters) == _partition(full.clusters)


def test_two_deltas_append_index(ray_session, tmp_path):
    p1, p2, p3 = _split(parts=3)
    cfg = _cfg()
    full = near_dup_pipeline(rd.from_arrow(code_corpus(seed=42)), cfg)
    r1 = near_dup_pipeline(rd.from_arrow(p1), cfg)

    index_dir = str(tmp_path / "bandindex")
    _index_for(p1, cfg, index_dir)
    d2 = near_dup_delta(rd.from_arrow(p2), index_dir, cfg, old_edges=r1.edges, run_id="d2")
    # second delta: p2's rows must now be OLD (read back from the index)
    d3 = near_dup_delta(rd.from_arrow(p3), index_dir, cfg, old_edges=d2.edges, run_id="d3")
    assert _partition(d3.clusters) == _partition(full.clusters)
    e_all = {**_edge_set(r1.edges), **_edge_set(d2.new_edges), **_edge_set(d3.new_edges)}
    assert set(e_all) == set(_edge_set(full.edges))
    # replaying a run_id is refused (the index already contains those rows)
    with pytest.raises(ValueError, match="already applied"):
        near_dup_delta(rd.from_arrow(p3), index_dir, cfg, run_id="d3")


def test_delta_capped_buckets_same_clusters(ray_session, tmp_path):
    """Through the chunk+star skew guard (giant boilerplate family forced
    over the cap) the delta's emitted edges differ from the full run's, but
    connectivity — hence cluster assignments — must not."""
    old_raw, new_raw = _split()
    cfg = _cfg(bucket_cap=32, num_partitions=16)
    full = near_dup_pipeline(rd.from_arrow(code_corpus(seed=42)), cfg)
    old = near_dup_pipeline(rd.from_arrow(old_raw), cfg)
    assert full.metrics["dropped_pairs"] > 0  # cap actually triggered

    index_dir = str(tmp_path / "bandindex")
    _index_for(old_raw, cfg, index_dir)
    res = near_dup_delta(
        rd.from_arrow(new_raw), index_dir, cfg, old_edges=old.edges, run_id="d1"
    )
    assert _partition(res.clusters) == _partition(full.clusters)


def test_crashed_delta_orphans_are_ignored(ray_session, tmp_path):
    """Lineage is the commit point: shard files from a delta that died before
    its lineage append must NOT be read as 'old' by a later delta — treating
    them as old would suppress the crashed docs' edges forever (their edges
    were never emitted). Simulated by running a delta and then rolling its
    run record out of _lineage.json, leaving delta-crash.parquet orphans."""
    import json
    import warnings

    p1, p2 = _split()
    cfg = _cfg()
    r1 = near_dup_pipeline(rd.from_arrow(p1), cfg)
    index_dir = str(tmp_path / "bandindex")
    _index_for(p1, cfg, index_dir)

    crashed = near_dup_delta(
        rd.from_arrow(p2), index_dir, cfg, old_edges=r1.edges, run_id="crash"
    )
    expect_new = _edge_set(crashed.new_edges)
    expect_parts = _partition(crashed.clusters)
    # roll back the lineage commit — the shard files stay behind as orphans
    lin_path = tmp_path / "bandindex" / "_lineage.json"
    lin = json.loads(lin_path.read_text())
    lin["runs"] = [r for r in lin["runs"] if r["run_id"] != "crash"]
    lin["rows"] = sum(r["rows"] for r in lin["runs"])
    lin_path.write_text(json.dumps(lin))
    assert list((tmp_path / "bandindex").glob("part=*/delta-crash.parquet"))

    # retry under a NEW run_id: orphans ignored → byte-identical edges/clusters
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # worker-side orphan note
        retry = near_dup_delta(
            rd.from_arrow(p2), index_dir, cfg, old_edges=r1.edges, run_id="d2"
        )
    assert _edge_set(retry.new_edges) == expect_new
    assert _partition(retry.clusters) == expect_parts


def test_delta_config_guards(ray_session, tmp_path):
    old_raw, new_raw = _split()
    cfg = _cfg()
    index_dir = str(tmp_path / "bandindex")
    _index_for(old_raw, cfg, index_dir)
    # a different banding config must be refused
    other = _cfg(n_bands=16)
    with pytest.raises(ValueError, match="config mismatch"):
        near_dup_delta(rd.from_arrow(new_raw), index_dir, other, run_id="x")
    # missing index dir
    with pytest.raises(ValueError, match="no band index"):
        near_dup_delta(rd.from_arrow(new_raw), str(tmp_path / "nope"), cfg, run_id="x")
    # unsupported compositions refuse loudly
    with pytest.raises(NotImplementedError):
        near_dup_delta(rd.from_arrow(new_raw), index_dir, _cfg(n_salts=8), run_id="x")
