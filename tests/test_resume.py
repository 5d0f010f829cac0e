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
