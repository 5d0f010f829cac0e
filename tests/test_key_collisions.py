"""63-bit doc_key birthday-collision audit + deterministic resolution
(sources/corpus.py): at 10^12 rows ~5e4 colliding pairs are expected; a
collision silently fuses an unrelated doc into a near-dup cluster (and the
dedup ACTION then drops innocent rows). Planted-collision tests."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from elasticsearch_minhash_ray.functions.minhash import MinHashConfig
from elasticsearch_minhash_ray.pipelines.neardup import (
    LSHConfig,
    PipelineConfig,
    _collect,
    build_edges,
    near_dup_keep,
    split_edge_metrics,
)
from elasticsearch_minhash_ray.sources.corpus import (
    detect_key_collisions,
    prepare_batch,
    resolve_key_collisions,
)
from elasticsearch_minhash_ray.stages.cluster import connected_components_driver
from elasticsearch_minhash_ray.stages.signature import SignatureStage

CFG = MinHashConfig(num_of_hash=128, bit=1, seed=0, name="sig")


def _planted_table():
    """Docs a/b are true near-dups; doc c is unrelated. Plant c's doc_key on
    whichever of a/b is the cluster NON-representative (key != cluster min),
    so an unresolved collision makes the dedup action drop innocent c."""
    base = " ".join(f"tok{i}" for i in range(200))
    contents = [base, base + " tail", "completely different vocabulary " * 30]
    t = prepare_batch(
        pa.table(
            {
                "repo": ["r"] * 3,
                "path": ["a", "b", "c"],
                "commit": ["v0"] * 3,
                "lang": ["txt"] * 3,
                "content": pa.array(contents, pa.string()),
            }
        )
    )
    keys = t["doc_key"].to_pylist()
    victim = 0 if keys[0] > keys[1] else 1
    keys[2] = keys[victim]
    t = t.set_column(
        t.schema.get_field_index("doc_key"), "doc_key", pa.array(keys, pa.int64())
    )
    return t, victim


def _run(ds):
    cfg = PipelineConfig(minhash=CFG, lsh=LSHConfig(num_partitions=4))
    sigs = ds.map_batches(SignatureStage([CFG], content_col="content"), batch_format="pyarrow")
    sigs = sigs.materialize()
    raw, _ = split_edge_metrics(_collect(build_edges(sigs, cfg)))
    clusters = connected_components_driver(raw, cfg.max_driver_edges)
    return sigs, clusters


def test_audit_and_deterministic_remap(ray_session):
    t, victim = _planted_table()
    ds = rd.from_arrow(t)
    aud = detect_key_collisions(ds, num_partitions=4).to_pandas()
    assert set(aud["doc_id"]) == {t["doc_id"][victim].as_py(), t["doc_id"][2].as_py()}
    fixed = resolve_key_collisions(ds, num_partitions=4).to_pandas().sort_values("path")
    assert fixed["doc_key"].nunique() == 3  # separate keys again
    # the min-doc_id holder keeps the original key
    keeper_id = min(t["doc_id"][victim].as_py(), t["doc_id"][2].as_py())
    assert (
        int(fixed.loc[fixed["doc_id"] == keeper_id, "doc_key"].iloc[0])
        == t["doc_key"][victim].as_py()
    )
    # resolution is a pure function of doc_ids: identical on a second run
    fixed2 = resolve_key_collisions(rd.from_arrow(t), num_partitions=4).to_pandas()
    assert list(fixed2.sort_values("path")["doc_key"]) == list(fixed["doc_key"])
    # untouched rows keep their keys
    assert (
        fixed.loc[fixed["path"] == ("b" if victim == 0 else "a"), "doc_key"].iloc[0]
        == t["doc_key"][1 if victim == 0 else 0].as_py()
    )


def test_collision_corrupts_dedup_and_resolution_fixes_it(ray_session):
    t, _victim = _planted_table()
    id2path = dict(zip(t["doc_id"].to_pylist(), t["path"].to_pylist()))
    # UNRESOLVED: c shares the non-representative's key, so the dedup action
    # drops innocent, unrelated c along with it
    sigs_bad, clusters_bad = _run(rd.from_arrow(t))
    kept_bad = near_dup_keep(sigs_bad, clusters_bad).to_pandas()
    assert "c" not in {id2path[d] for d in kept_bad["doc_id"]}
    # RESOLVED: c survives with its own key and sits in NO cluster; exactly
    # one of the true near-dups a/b is kept
    fixed = resolve_key_collisions(rd.from_arrow(t), num_partitions=4).to_pandas()
    fixed_ds = rd.from_arrow(pa.Table.from_pandas(fixed, preserve_index=False))
    sigs_ok, clusters_ok = _run(fixed_ds)
    kept_ok = near_dup_keep(sigs_ok, clusters_ok).to_pandas()
    kept_paths = {id2path[d] for d in kept_ok["doc_id"]}
    assert "c" in kept_paths
    assert len(kept_paths & {"a", "b"}) == 1
    c_key = int(fixed.loc[fixed["path"] == "c", "doc_key"].iloc[0])
    cl = (
        clusters_ok
        if isinstance(clusters_ok, pa.Table)
        else pa.Table.from_pandas(clusters_ok.to_pandas())
    )
    assert c_key not in set(np.asarray(cl["doc_key"]))


def test_checkpointed_resolution_flag(ray_session, tmp_path):
    """run_checkpointed with resolve_key_collisions=True completes, yields
    the same clusters as without on a collision-free corpus, and the flag is
    part of the edges/clusters fingerprint (toggling it re-derives them
    while signature shards stay valid)."""
    import pyarrow.parquet as pq

    from elasticsearch_minhash_ray import run_checkpointed
    from elasticsearch_minhash_ray.sources.synth import code_corpus

    corpus = tmp_path / "corpus.parquet"
    pq.write_table(code_corpus().drop_columns(["truth_family"]).slice(0, 300), str(corpus))
    cfg = lambda **kw: PipelineConfig(  # noqa: E731
        minhash=CFG, lsh=LSHConfig(num_partitions=4), sig_concurrency=(1, 2), **kw
    )
    m0 = run_checkpointed(str(corpus), str(tmp_path / "o0"), cfg())
    m1 = run_checkpointed(str(corpus), str(tmp_path / "o1"), cfg(resolve_key_collisions=True))
    assert m1["fingerprint"] != m0["fingerprint"]
    c0 = pq.read_table(m0["clusters"])
    c1 = pq.read_table(m1["clusters"])
    assert c0.equals(c1)  # no real collisions at this scale -> identical
