"""pyarrow.fs checkpoint routing: file:// URIs resolve via FileSystem.from_uri,
and the non-atomic-rename (object store) publish branch works lineage-last."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from elasticsearch_minhash_ray.state import checkpoint as ckpt


def test_file_uri_roundtrip(tmp_path):
    stage = f"file://{tmp_path}/edges"
    t = pa.table({"src": pa.array([2, 1], pa.int64()), "dst": pa.array([3, 2], pa.int64())})
    ckpt.write_sorted_single_file(t, stage, ["src", "dst"], "fp1", stage="edges")
    # verify on the plain-path view of the same directory
    local = os.path.join(str(tmp_path), "edges")
    assert ckpt.is_complete(stage, "fp1") and ckpt.is_complete(local, "fp1")
    assert not ckpt.is_complete(stage, "other")
    lin = json.load(open(os.path.join(local, "_lineage.json")))
    assert lin["rows"] == 2
    got = pq.read_table(os.path.join(local, "data.parquet"))
    assert got["src"].to_pylist() == [1, 2]  # sorted
    files = ckpt.edges_files(stage)
    assert len(files) == 1 and files[0].endswith("data.parquet")
    assert pq.read_table(files[0].replace("file://", "")).num_rows == 2


def test_non_atomic_publish_branch(tmp_path, monkeypatch):
    """Object-store branch: direct single-shot writes, no .tmp leftovers,
    lineage written last."""
    from pyarrow import fs as pafs

    real = ckpt._fs_for

    def fake(path):
        f, p, _ = real(path)
        return f, p, False  # pretend rename is not atomic (S3-class store)

    monkeypatch.setattr(ckpt, "_fs_for", fake)
    stage = str(tmp_path / "stage")
    t = pa.table({"doc_key": pa.array([5, 4], pa.int64())})
    ckpt.write_sorted_single_file(t, stage, ["doc_key"], "fpX")
    assert ckpt.is_complete(stage, "fpX")
    assert sorted(os.listdir(stage)) == ["_lineage.json", "data.parquet"]  # no tmp files
    assert pq.read_table(os.path.join(stage, "data.parquet"))["doc_key"].to_pylist() == [4, 5]


def test_read_lineage_missing_and_corrupt(tmp_path):
    assert ckpt.read_lineage(str(tmp_path / "nope")) is None
    d = tmp_path / "bad"
    d.mkdir()
    (d / "_lineage.json").write_text("{not json")
    assert ckpt.read_lineage(str(d)) is None
    assert not ckpt.is_complete(str(d), "fp")
