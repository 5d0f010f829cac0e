"""Degenerate-corpus end-to-end: the flagship pipeline must survive an empty
corpus, a single doc, and an all-identical corpus (one giant family — the
bucket_cap chunk+star path through every stage)."""

import pyarrow as pa
import pytest

from elasticsearch_minhash_ray.functions.minhash import MinHashConfig
from elasticsearch_minhash_ray.pipelines.neardup import LSHConfig, PipelineConfig, near_dup_pipeline

CFG = PipelineConfig(
    minhash=MinHashConfig(name="sig"),
    lsh=LSHConfig(num_partitions=4),
    sig_concurrency=(1, 2),
)


def _corpus_table(contents):
    n = len(contents)
    return pa.table(
        {
            "repo": pa.array(["r"] * n),
            "path": pa.array([f"f{i}.py" for i in range(n)]),
            "commit": pa.array(["c0"] * n),
            "lang": pa.array(["py"] * n),
            "content": pa.array(contents, pa.string()),
        }
    )


def _rows(x):
    return x.num_rows if hasattr(x, "num_rows") else x.count()


def test_flagship_empty_corpus(ray_session):
    import ray.data as rd

    res = near_dup_pipeline(rd.from_arrow(_corpus_table([])), CFG)
    assert _rows(res.clusters) == 0
    assert res.metrics["n_edges"] == 0
    assert res.signatures.count() == 0


def test_flagship_single_doc(ray_session):
    import ray.data as rd

    res = near_dup_pipeline(rd.from_arrow(_corpus_table(["def f():\n    return 1\n"])), CFG)
    assert res.signatures.count() == 1
    assert res.metrics["n_edges"] == 0
    assert _rows(res.clusters) == 0  # no edges -> no clustered rows


def test_flagship_all_identical_giant_family(ray_session):
    """600 byte-identical docs > bucket_cap=256: every stage sees ONE giant
    bucket; the cap's chunk+star must keep the family fully connected (one
    cluster with all 600 docs) and surface the dropped-pair count."""
    import ray.data as rd

    n = 600
    text = "def dup():\n    return 42  # same in every file\n"
    res = near_dup_pipeline(rd.from_arrow(_corpus_table([text] * n)), CFG)
    cl = res.clusters
    cl = cl.to_pandas() if hasattr(cl, "to_pandas") else cl.to_pandas()
    assert len(cl) == n
    assert cl["cluster_id"].nunique() == 1
    assert res.metrics["dropped_pairs"] > 0  # cap truncated the n^2 blowup
    # truncation must NOT have dropped connectivity: min doc_key labels all
    assert (cl["cluster_id"] == cl["doc_key"].min()).all()


def test_flagship_whitespace_only_docs(ray_session):
    """Token-free docs get the all-0xFF empty-stream signature; identical
    empty signatures band together and verify at sim 1.0 — they form one
    cluster rather than crashing any stage."""
    import ray.data as rd

    res = near_dup_pipeline(rd.from_arrow(_corpus_table(["   \n\t  "] * 5 + ["x = 1"])), CFG)
    cl = res.clusters
    cl = cl.to_pandas()
    assert len(cl) == 5  # the five empty docs cluster; 'x = 1' is a singleton
    assert cl["cluster_id"].nunique() == 1


def test_flagship_empty_corpus_distributed_cc(ray_session):
    """The scale configuration (distributed_cc=True) must survive an empty
    corpus too — round-2 review caught a KeyError in the label checksum."""
    import dataclasses

    import ray.data as rd

    cfg = dataclasses.replace(CFG, distributed_cc=True)
    res = near_dup_pipeline(rd.from_arrow(_corpus_table([])), cfg)
    assert _rows(res.clusters) == 0
    assert res.metrics["n_edges"] == 0
