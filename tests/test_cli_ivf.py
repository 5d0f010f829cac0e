"""CLI entry point (ray job submit surface) + IVF ANN recall tests."""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from elasticsearch_minhash_ray.sources.synth import code_corpus
from elasticsearch_minhash_ray.stages.embed import brute_force_topk, ivf_topk

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_neardup_and_resume(tmp_path):
    """python -m elasticsearch_minhash_ray neardup runs end-to-end in a fresh
    process (its own Ray session) and a second invocation resumes (all stages
    complete -> identical manifest, no recompute)."""
    corpus = tmp_path / "corpus.parquet"
    pq.write_table(code_corpus().drop_columns(["truth_family"]).slice(0, 400), str(corpus))
    out = tmp_path / "out"
    env = dict(os.environ, PYTHONPATH=REPO)
    args = [
        sys.executable, "-m", "elasticsearch_minhash_ray", "neardup",
        "--input", str(corpus), "--output", str(out), "--num-shards", "2",
    ]
    r1 = subprocess.run(args, capture_output=True, text=True, env=env, cwd=str(tmp_path))
    assert r1.returncode == 0, r1.stderr[-2000:]
    m1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert os.path.exists(m1["clusters"])
    clusters1 = pq.read_table(m1["clusters"])
    # resume: everything checkpointed, second run reuses all stages
    r2 = subprocess.run(args, capture_output=True, text=True, env=env, cwd=str(tmp_path))
    assert r2.returncode == 0, r2.stderr[-2000:]
    m2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert m2["fingerprint"] == m1["fingerprint"]
    assert pq.read_table(m2["clusters"]).equals(clusters1)


def test_ivf_topk_recall_vs_brute(ray_session):
    """IVF with n_probe=n_lists is exact; with n_probe=half it keeps high
    recall@10 on clustered data."""
    rng = np.random.default_rng(3)
    # clustered vectors so IVF lists are meaningful
    centers = rng.standard_normal((8, 32))
    vecs = np.repeat(centers, 50, axis=0) + 0.1 * rng.standard_normal((400, 32))
    tbl = {"vec_id": list(range(400)), "embedding": [v.tolist() for v in vecs]}
    ds = rd.from_items([{"vec_id": i, "embedding": tbl["embedding"][i]} for i in range(400)])
    q = vecs[:3]
    qids = np.arange(3, dtype=np.int64)
    exact = brute_force_topk(ds, q, qids, k=10).to_pandas()
    full = ivf_topk(ds, q, qids, k=10, n_lists=8, n_probe=8, sample_size=400).to_pandas()
    assert set(map(tuple, full[["query_id", "vec_id"]].values)) == set(
        map(tuple, exact[["query_id", "vec_id"]].values)
    )
    approx = ivf_topk(ds, q, qids, k=10, n_lists=8, n_probe=4, sample_size=400).to_pandas()
    hits = len(
        set(map(tuple, approx[["query_id", "vec_id"]].values))
        & set(map(tuple, exact[["query_id", "vec_id"]].values))
    )
    assert hits / len(exact) >= 0.9


def test_signature_collapse_groups_exact_dups(ray_session):
    """Docs with identical content collapse to one signature group (reference
    collapse-by-keyword semantic, MinHashFieldMapper.java:218-221)."""
    import __ray_entry__ as e

    res = e.queries()["signature_collapse"]("/root/testdata/sf0.001")
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert (df["n_dups"] >= 1).all()
    # sf0.001 documents has a few exact-dup texts -> at least one group > 1
    assert df["n_dups"].max() >= 2 or len(df) == 5000


def test_cli_clean_lines(tmp_path):
    """python -m elasticsearch_minhash_ray clean --mode lines writes a
    cleaned-text parquet in a fresh process (own Ray session)."""
    import pyarrow as pa

    corpus = tmp_path / "corpus.parquet"
    rows = {
        "repo": ["r"] * 4,
        "path": [f"f{i}.py" for i in range(4)],
        "commit": ["c"] * 4,
        "lang": ["py"] * 4,
        "content": [
            "HEADER LINE\nunique a",
            "HEADER LINE\nunique b",
            "just one doc",
            "HEADER LINE",
        ],
    }
    pq.write_table(pa.table(rows), str(corpus))
    out = tmp_path / "out"
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, "-m", "elasticsearch_minhash_ray", "clean",
         "--mode", "lines", "--input", str(corpus), "--output", str(out),
         "--num-partitions", "4"],
        capture_output=True, text=True, env=env, check=False,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["rows"] == 4
    got = pq.read_table(str(out)).to_pandas()
    assert set(got.columns) == {"doc_id", "n_lines", "n_removed", "cleaned_text"}
    assert sorted(got["cleaned_text"]) == ["", "just one doc", "unique a", "unique b"]


def test_cli_keep(tmp_path):
    """python -m elasticsearch_minhash_ray keep writes the curated corpus
    (one representative per near-dup cluster + all unclustered docs) in a
    fresh process; kept row count < input and > 0."""
    corpus = tmp_path / "corpus.parquet"
    t = code_corpus().drop_columns(["truth_family"]).slice(0, 400)
    pq.write_table(t, str(corpus))
    out = tmp_path / "kept"
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [
            sys.executable, "-m", "elasticsearch_minhash_ray", "keep",
            "--input", str(corpus), "--output", str(out), "--num-partitions", "8",
        ],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert 0 < m["rows"] < 400
    kept = pq.read_table(str(out))
    assert m["rows"] == kept.num_rows
    assert {"doc_id", "doc_key", "content_sha256", "repo", "path"} <= set(kept.schema.names)
    assert kept["doc_key"].to_pandas().is_unique
