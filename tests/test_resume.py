"""F-RESUME: kill after partial signature write → restart skips completed
shards → outputs byte-identical to an uninterrupted run."""

import hashlib
import json
import os

import pyarrow.parquet as pq
import pytest

from elasticsearch_minhash_ray.functions.minhash import MinHashConfig
from elasticsearch_minhash_ray.pipelines import neardup
from elasticsearch_minhash_ray.pipelines.neardup import LSHConfig, PipelineConfig, run_checkpointed
from elasticsearch_minhash_ray.sources.synth import code_corpus, write_corpus

CFG = PipelineConfig(
    minhash=MinHashConfig(name="sig"),
    lsh=LSHConfig(num_partitions=8),
    sig_concurrency=(1, 2),
    num_shards=4,
)


def _file_hash(path):
    return hashlib.sha256(open(path, "rb").read()).hexdigest()


def _tree_hashes(out_dir):
    hashes = {}
    for root, _, files in os.walk(out_dir):
        for f in files:
            if f.endswith(".parquet"):
                rel = os.path.relpath(os.path.join(root, f), out_dir)
                hashes[rel] = _file_hash(os.path.join(root, f))
    return hashes


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("corpus") / "corpus.parquet"
    write_corpus(code_corpus(seed=42).drop_columns(["truth_family"]), str(p))
    return str(p)


def test_interrupt_and_resume_byte_identical(ray_session, corpus_path, tmp_path, monkeypatch):
    clean_dir = str(tmp_path / "clean")
    resumed_dir = str(tmp_path / "resumed")

    # uninterrupted reference run
    manifest = run_checkpointed(corpus_path, clean_dir, CFG)
    clean = _tree_hashes(clean_dir)
    assert len(manifest["signatures"]) == 4
    assert set(clean) == {
        "signatures/shard=0/data.parquet",
        "signatures/shard=1/data.parquet",
        "signatures/shard=2/data.parquet",
        "signatures/shard=3/data.parquet",
        "edges/data.parquet",
        "clusters/data.parquet",
    }

    # interrupted run: die after 2 signature shards
    calls = {"n": 0}
    orig = neardup.compute_signatures

    def dying(ds, cfg):
        if calls["n"] >= 2:
            raise RuntimeError("simulated kill")
        calls["n"] += 1
        return orig(ds, cfg)

    monkeypatch.setattr(neardup, "compute_signatures", dying)
    with pytest.raises(RuntimeError, match="simulated kill"):
        run_checkpointed(corpus_path, resumed_dir, CFG)
    monkeypatch.setattr(neardup, "compute_signatures", orig)

    done = _tree_hashes(resumed_dir)
    assert set(done) == {"signatures/shard=0/data.parquet", "signatures/shard=1/data.parquet"}
    mtimes = {p: os.path.getmtime(os.path.join(resumed_dir, p)) for p in done}

    # resume: completed shards skipped (mtime unchanged), rest computed
    run_checkpointed(corpus_path, resumed_dir, CFG)
    resumed = _tree_hashes(resumed_dir)
    for p, m in mtimes.items():
        assert os.path.getmtime(os.path.join(resumed_dir, p)) == m, f"{p} was recomputed"
    assert resumed == clean  # byte-identical outputs

    # content_sha256 invariant preserved on every surviving signature row
    sig = pq.read_table(os.path.join(resumed_dir, "signatures/shard=0/data.parquet"))
    assert sig["content_sha256"].null_count == 0
    # lineage carries config fingerprint + metrics
    lin = json.load(open(os.path.join(resumed_dir, "edges/_lineage.json")))
    assert lin["fingerprint"] == manifest["fingerprint"]
    assert "dropped_pairs" in lin


def test_config_change_invalidates_checkpoint(ray_session, corpus_path, tmp_path):
    out = str(tmp_path / "out")
    run_checkpointed(corpus_path, out, CFG)
    other = PipelineConfig(
        minhash=MinHashConfig(seed=1000, name="sig"),
        lsh=LSHConfig(num_partitions=8),
        sig_concurrency=(1, 2),
        num_shards=4,
    )
    before = _file_hash(os.path.join(out, "signatures/shard=0/data.parquet"))
    run_checkpointed(corpus_path, out, other)
    after = _file_hash(os.path.join(out, "signatures/shard=0/data.parquet"))
    assert before != after  # stale checkpoint was NOT silently reused


def test_incremental_file_shards(ray_session, tmp_path):
    """shard_by='file': appending a new parquet file to the corpus dir reuses
    every existing signature checkpoint (lineage untouched) and only hashes
    the new file; edges/clusters re-derive over the grown corpus."""
    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    full = code_corpus(seed=42).drop_columns(["truth_family"])
    write_corpus(full.slice(0, 300), str(corpus_dir / "part_a.parquet"))
    write_corpus(full.slice(300, 300), str(corpus_dir / "part_b.parquet"))

    cfg = PipelineConfig(
        minhash=MinHashConfig(name="sig"),
        lsh=LSHConfig(num_partitions=8),
        sig_concurrency=(1, 2),
        shard_by="file",
    )
    out = str(tmp_path / "out")
    m1 = run_checkpointed(str(corpus_dir), out, cfg)
    assert len(m1["signatures"]) == 2
    lineage_before = {
        p: json.load(open(os.path.join(os.path.dirname(p), "_lineage.json")))
        for p in m1["signatures"]
    }

    # append a third file -> rerun
    write_corpus(full.slice(600, 300), str(corpus_dir / "part_c.parquet"))
    m2 = run_checkpointed(str(corpus_dir), out, cfg)
    assert len(m2["signatures"]) == 3
    # the two original shards were NOT recomputed (identical lineage incl. timestamps)
    for p, before in lineage_before.items():
        after = json.load(open(os.path.join(os.path.dirname(p), "_lineage.json")))
        assert after == before, p
    # clusters cover the grown corpus
    n1 = pq.read_table(m1["clusters"]).num_rows
    n2 = pq.read_table(m2["clusters"]).num_rows
    assert n2 >= n1


def test_checkpointed_jaccard_verify_mode(ray_session, corpus_path, tmp_path):
    """verify_mode='jaccard' through the checkpointed path: the persisted
    signature shards must carry the 'shingles' column so the edge stage can
    verify (advisor finding round 1); clusters must equal the in-memory
    pipeline's."""
    import ray.data as rd

    from elasticsearch_minhash_ray.pipelines.neardup import near_dup_pipeline
    from elasticsearch_minhash_ray.sources.corpus import read_parquet_auto

    cfg = PipelineConfig(
        minhash=MinHashConfig(name="sig", shingle=3),
        lsh=LSHConfig(num_partitions=8, verify_mode="jaccard", jaccard_threshold=0.7),
        sig_concurrency=(1, 2),
        num_shards=2,
    )
    out_dir = str(tmp_path / "jac")
    manifest = run_checkpointed(corpus_path, out_dir, cfg)
    # shards persisted the shingle sets
    sig_tbl = pq.read_table(manifest["signatures"][0])
    assert "shingles" in sig_tbl.schema.names
    got = pq.read_table(manifest["clusters"]).to_pandas()
    ref = near_dup_pipeline(read_parquet_auto(corpus_path), cfg).clusters
    ref = ref if hasattr(ref, "to_pandas") else ref
    ref = ref.to_pandas()
    parts = lambda df: {  # noqa: E731
        frozenset(g["doc_key"]) for _, g in df.groupby("cluster_id")
    }
    assert parts(got) == parts(ref)


def test_collapse_exact_jaccard_rejected(ray_session, corpus_path):
    """collapse_exact + jaccard verify is unsound (reps don't carry member
    shingle sets) and must fail fast."""
    import ray.data as rd

    from elasticsearch_minhash_ray.pipelines.neardup import near_dup_pipeline
    from elasticsearch_minhash_ray.sources.corpus import read_parquet_auto

    cfg = PipelineConfig(
        minhash=MinHashConfig(name="sig", shingle=3),
        lsh=LSHConfig(num_partitions=8, verify_mode="jaccard"),
        collapse_exact=True,
    )
    with pytest.raises(ValueError, match="bbit"):
        near_dup_pipeline(read_parquet_auto(corpus_path), cfg)


def test_sharded_edges_checkpoint(ray_session, corpus_path, tmp_path):
    """Above edges_rows_per_shard the edges checkpoint switches to the
    hash-sharded part=K/ layout (driver never holds edge rows): clusters
    must equal the single-file run's, the tree must be byte-deterministic
    across runs, and dropped_pairs must still land on the lineage."""
    import dataclasses

    single = run_checkpointed(corpus_path, str(tmp_path / "single"), CFG)
    cfg = dataclasses.replace(CFG, edges_rows_per_shard=50)  # force sharding
    a = run_checkpointed(corpus_path, str(tmp_path / "a"), cfg)
    b = run_checkpointed(corpus_path, str(tmp_path / "b"), cfg)

    assert len(a["edges"]) > 1 and all("part=" in p for p in a["edges"])
    # deterministic tree
    ha = {os.path.relpath(p, str(tmp_path / "a")): _file_hash(p) for p in a["edges"]}
    hb = {os.path.relpath(p, str(tmp_path / "b")): _file_hash(p) for p in b["edges"]}
    assert ha == hb
    # same edge set as the single-file layout
    import pandas as pd

    def edge_df(paths):
        return (
            pd.concat([pq.read_table(p).to_pandas() for p in paths])
            .sort_values(["src", "dst"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(edge_df(a["edges"]), edge_df(single["edges"]))
    # identical clusters + lineage metrics
    assert _file_hash(a["clusters"]) == _file_hash(single["clusters"])
    lin = json.load(open(str(tmp_path / "a" / "edges" / "_lineage.json")))
    assert "dropped_pairs" in lin and lin["shards"] > 1
    # resume skips the completed sharded stage
    m = os.path.getmtime(a["edges"][0])
    run_checkpointed(corpus_path, str(tmp_path / "a"), cfg)
    assert os.path.getmtime(a["edges"][0]) == m


def test_edges_layout_switch_cleans_stale_files(ray_session, corpus_path, tmp_path):
    """Re-running into the same out_dir with a config whose edges layout
    differs (single-file -> sharded) must remove the stale data.parquet —
    otherwise edges_files() would serve the OLD edge set to the cluster
    stage (round-2 review finding)."""
    import dataclasses

    from elasticsearch_minhash_ray.state import checkpoint as ckpt

    out = str(tmp_path / "switch")
    m1 = run_checkpointed(corpus_path, out, CFG)
    assert [p for p in m1["edges"] if p.endswith("edges/data.parquet")]
    # same fp + different layout preference -> checkpoint correctly REUSED
    same_fp = dataclasses.replace(CFG, edges_rows_per_shard=50)
    assert run_checkpointed(corpus_path, out, same_fp)["edges"] == m1["edges"]
    # changed fp (config change) + sharded layout -> stale single file gone
    cfg2 = dataclasses.replace(
        CFG,
        lsh=dataclasses.replace(CFG.lsh, threshold=0.94),
        edges_rows_per_shard=50,
    )
    m2 = run_checkpointed(corpus_path, out, cfg2)
    files = ckpt.edges_files(os.path.join(out, "edges"))
    assert all("part=" in p for p in files) and len(files) > 1
    assert not os.path.exists(os.path.join(out, "edges", "data.parquet"))
    # the rebuilt sharded edges equal a fresh cfg2 run elsewhere
    fresh = run_checkpointed(corpus_path, str(tmp_path / "fresh"), cfg2)
    assert _file_hash(m2["clusters"]) == _file_hash(fresh["clusters"])
