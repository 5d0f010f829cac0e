"""Signature stage on Ray: golden parity, null handling, copy_to fan-out."""

import pyarrow as pa
import pytest

import ray.data as rd

from elasticsearch_minhash_ray.functions.minhash import MinHashConfig, to_base64
from elasticsearch_minhash_ray.pipelines.neardup import PipelineConfig, compute_signatures
from elasticsearch_minhash_ray.sources.synth import golden_corpus
from elasticsearch_minhash_ray.stages.signature import SignatureStage

CFG1 = MinHashConfig(num_of_hash=128, bit=1, seed=0, name="m1")
CFG2 = MinHashConfig(num_of_hash=128, bit=1, seed=1000, name="m2")
CFG3 = MinHashConfig(num_of_hash=32, bit=2, seed=1000, name="m3")


def test_golden_corpus_signatures(ray_session):
    ds = rd.from_arrow(golden_corpus())
    cfg = PipelineConfig(minhash=CFG1, sig_concurrency=(1, 2))
    out = compute_signatures(ds, cfg).to_pandas()
    assert len(out) == 1000
    by_path = out.set_index("path")
    # MinHashPluginTest.java:163-171 fixtures (doc 1, doc 2, doc 101)
    assert to_base64(by_path.loc["doc/1.txt", "minhash_m1"]) == "Uji99jenq7da3aNKTYc8yQ=="
    assert to_base64(by_path.loc["doc/2.txt", "minhash_m1"]) == "AGB9/Yen+yf/lBvJKtMdQA=="
    # doc 1 ≡ doc 101 (same content ⇒ same signature)
    assert by_path.loc["doc/101.txt", "minhash_m1"] == by_path.loc["doc/1.txt", "minhash_m1"]
    # exact-dup collapse: 100 groups of 10 (F-GOLD)
    groups = out.groupby(out["minhash_m1"].map(to_base64)).size()
    assert len(groups) == 100 and (groups == 10).all()
    # invariant column present and content-derived
    assert out["content_sha256"].notna().all()
    assert out["content_sha256"].nunique() == 100


def test_multi_config_fanout_and_encodings():
    # O10 copy_to fan-out: one pass, three signature columns + encodings
    t = pa.table({"content": ["test 1", "test 2"]})
    stage = SignatureStage([CFG1, CFG2, CFG3], drop_content=False, encode="base64")
    out = stage(t)
    assert to_base64(out["minhash_m1"][0].as_py()) == "Uji99jenq7da3aNKTYc8yQ=="
    assert out["minhash_m1_b64"][0].as_py() == "Uji99jenq7da3aNKTYc8yQ=="
    assert to_base64(out["minhash_m2"][0].as_py()) == "fUkN7K0iiMHp1MxiGXnIaw=="
    assert to_base64(out["minhash_m3"][0].as_py()) == "W51pEPuK8tw="
    assert to_base64(out["minhash_m1"][1].as_py()) == "AGB9/Yen+yf/lBvJKtMdQA=="
    assert "content" in out.schema.names


def test_null_handling():
    # MinHashFieldMapper.java:259-269: null → null_value substitute, else skip
    t = pa.table({"content": pa.array([None, "test 1", None], pa.string())})
    plain = SignatureStage([CFG1], drop_content=False)(t)
    assert plain["minhash_m1"][0].as_py() is None
    assert plain["minhash_m1"][2].as_py() is None
    cfg_nv = MinHashConfig(num_of_hash=128, bit=1, seed=0, name="m1", null_value="test 1")
    subst = SignatureStage([cfg_nv], drop_content=False)(t)
    assert subst["minhash_m1"][0].as_py() == subst["minhash_m1"][1].as_py()
    assert to_base64(subst["minhash_m1"][0].as_py()) == "Uji99jenq7da3aNKTYc8yQ=="


def test_empty_and_degenerate_docs():
    # F-EMPTY: "", whitespace, punctuation-only → all-0xFF full width
    t = pa.table({"content": ["", "   ", ".", "test 1"]})
    out = SignatureStage([CFG1], drop_content=False)(t)
    for i in range(3):
        assert out["minhash_m1"][i].as_py() == b"\xff" * 16
    assert out["minhash_m1"][3].as_py() != b"\xff" * 16


def test_bit_string_encoding_matches_packing():
    cfg = MinHashConfig(num_of_hash=128, bit=1, seed=0, name="m4", bit_string=True)
    t = pa.table({"content": ["test 1"]})
    out = SignatureStage([cfg], drop_content=False, encode="auto")(t)
    bits = out["minhash_m4_bits"][0].as_py()
    sig = out["minhash_m4"][0].as_py()
    assert len(bits) == 128
    assert bits[0] == ("1" if sig[0] & 1 else "0")
