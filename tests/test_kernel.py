"""Kernel conformance: golden fixtures + properties (SURVEY.md §5, FIXTURES.md).

No Ray needed here — pure numpy kernel tests.
"""

import base64

import numpy as np
import pytest

from elasticsearch_minhash_ray.functions.minhash import (
    LONG_MAX,
    MinHashConfig,
    MinHasher,
    bbit_jaccard_estimate,
    compare,
    compare_many,
    from_base64,
    to_base64,
    to_bit_string,
)
from elasticsearch_minhash_ray.functions.murmur3 import (
    hash_tokens_many_seeds,
    murmur3_h1_scalar,
    seeds_u64,
)
from elasticsearch_minhash_ray.functions.tokenize import get_tokenizer, shingle

CFG1 = MinHashConfig(num_of_hash=128, bit=1, seed=0)
CFG2 = MinHashConfig(num_of_hash=128, bit=1, seed=1000)
CFG3 = MinHashConfig(num_of_hash=32, bit=2, seed=1000)

# MinHashPluginTest.java:163-171 golden fixtures (FIXTURES.md F-GOLD)
GOLDEN = [
    ("test 1", CFG1, "Uji99jenq7da3aNKTYc8yQ=="),
    ("test 1", CFG2, "fUkN7K0iiMHp1MxiGXnIaw=="),
    ("test 1", CFG3, "W51pEPuK8tw="),
    ("test 2", CFG1, "AGB9/Yen+yf/lBvJKtMdQA=="),
    ("test 2", CFG2, "8ShNb6UVCgPh16yxOd2Lew=="),
    ("test 2", CFG3, "i11gJHsY/zw="),
    # reference README.md:69/90 Getting-Started example (default analyzer) —
    # also pins the standard-tokenizer approximation on real prose with
    # punctuation (trailing '.' dropped, case preserved)
    (
        "Fess is Java based full text search server provided as OSS product.",
        CFG1,
        "KV5rsUfZpcZdVojpG8mHLA==",
    ),
]


@pytest.mark.parametrize("text,cfg,want", GOLDEN)
def test_golden_fixtures(text, cfg, want):
    tok = get_tokenizer(cfg.tokenizer)
    sig = MinHasher(cfg).signatures([tok(text)])[0]
    assert to_base64(sig) == want


def test_vectorized_matches_scalar_spec():
    rng = np.random.default_rng(7)
    toks = ["", "a", "ab", "hello", "test 1", "x" * 7, "y" * 8, "z" * 9,
            "w" * 16, "v" * 17, "日本語テスト", "ünïcödé", "🙂emoji🙃",
            *("tok%d" % i for i in range(50))]
    seeds = seeds_u64(1000, 16)
    H = hash_tokens_many_seeds(toks, seeds)
    for ti in rng.choice(len(toks), 40):
        for si in rng.choice(16, 4):
            want = murmur3_h1_scalar(toks[ti].encode("utf-16-le"), 1000 + int(si))
            assert H[ti, si] == want, (toks[ti], si)


def test_same_content_same_signature():
    # doc 1 ≡ doc 101 in the reference test (same msg content)
    h = MinHasher(CFG1)
    sigs = h.signatures([["test", "1"], ["test", "1"]])
    assert sigs[0] == sigs[1]


def test_token_permutation_and_duplication_invariance():
    h = MinHasher(CFG2)
    base = h.signatures([["alpha", "beta", "gamma"]])[0]
    assert h.signatures([["gamma", "alpha", "beta"]])[0] == base
    assert h.signatures([["alpha", "beta", "beta", "gamma", "alpha"]])[0] == base


def test_empty_doc_all_ones_full_width():
    # F-EMPTY: empty token stream → mins stay LONG_MAX → all bits set
    for cfg in (CFG1, CFG3):
        h = MinHasher(cfg)
        mins = h.min_values_for_docs([[]])
        assert (mins == LONG_MAX).all()
        sig = h.pack(mins)[0]
        assert sig == b"\xff" * cfg.full_width


def test_truncation_fixtures():
    # F-TRUNC: BitSet.toByteArray drops trailing zero bytes
    h = MinHasher(CFG1)
    for toks, want in [
        (["w48", "x48"], "Eeff5vc+sUjUq6OttnOb"),
        (["w170", "x170"], "XQB8EDA6PhlNCUneno3S"),
        (["w214", "x214"], "wYj6FcEjqazGyeiVh1tV"),
    ]:
        sig = h.signatures([toks])[0]
        assert to_base64(sig) == want
        assert len(sig) == 15
        # length-mismatch rule: compare vs a 16-byte signature is 0
        full = h.signatures([["test", "1"]])[0]
        assert len(full) == 16
        assert compare(sig, full) == 0.0
        assert compare(sig, sig) == 1.0


def test_encoders_roundtrip_and_bit_string():
    sig = MinHasher(CFG1).signatures([["test", "1"]])[0]
    assert from_base64(to_base64(sig)) == sig
    bs = to_bit_string(sig)
    assert len(bs) == 128 and set(bs) <= {"0", "1"}
    # LSB-first per byte: first char is bit 0 of byte 0
    assert bs[0] == ("1" if sig[0] & 1 else "0")
    assert bs[8] == ("1" if sig[1] & 1 else "0")


def test_compare_many_matches_scalar():
    h = MinHasher(CFG1)
    docs = [[f"tok{i}", f"tok{i+1}", "shared", "words"] for i in range(6)]
    sigs = h.signatures(docs)
    w = CFG1.full_width
    m = len(sigs)
    pad = np.zeros((m, w), dtype=np.uint8)
    lens = np.zeros(m, dtype=np.int64)
    for i, s in enumerate(sigs):
        pad[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[i] = len(s)
    ia, ib = np.triu_indices(m, k=1)
    sims = compare_many(pad[ia], pad[ib], lens[ia], lens[ib], w)
    for a, b, s in zip(ia, ib, sims):
        assert s == pytest.approx(compare(sigs[a], sigs[b]))


def test_jaccard_estimator():
    assert bbit_jaccard_estimate(1.0, 1) == pytest.approx(1.0)
    assert bbit_jaccard_estimate(0.5, 1) == pytest.approx(0.0)
    assert bbit_jaccard_estimate(0.75, 1) == pytest.approx(0.5)


def test_tokenizers():
    std = get_tokenizer("standard")
    assert std("test 1") == ["test", "1"]
    assert std("visit example.com, it's nice!") == ["visit", "example.com", "it's", "nice"]
    assert get_tokenizer("whitespace")("a  b\tc") == ["a", "b", "c"]
    code = get_tokenizer("code")
    assert code("x = foo(1.5);") == ["x", "=", "foo", "(", "1.5", ")", ";"]
    assert shingle(["a", "b", "c", "d"], 3) == ["a b c", "b c d"]
    assert shingle(["a", "b"], 3) == ["a b"]
    assert shingle([], 3) == []
    sh = get_tokenizer("whitespace", shingle_n=2)
    assert sh("a b c") == ["a b", "b c"]


# ---------------------------------------------------------------------------
# property-based conformance (hypothesis): vectorized kernel == scalar spec
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_token = st.text(
    alphabet=st.characters(codec="utf-16-le", exclude_categories=["Cs"]),
    min_size=0,
    max_size=24,
)


@settings(max_examples=60, deadline=None)
@given(tokens=st.lists(_token, min_size=1, max_size=12), seed=st.integers(-(2**31), 2**31 - 1))
def test_vectorized_murmur3_matches_scalar_spec(tokens, seed):
    """hash_tokens_many_seeds == Guava-semantics scalar reference for
    arbitrary unicode tokens (incl. empty, astral, multi-block lengths)."""
    seeds = seeds_u64(seed, 3)
    H = hash_tokens_many_seeds(tokens, seeds)
    for i, tok in enumerate(tokens):
        data = tok.encode("utf-16-le")
        for j, s in enumerate([seed, seed + 1, seed + 2]):
            assert H[i, j] == murmur3_h1_scalar(data, s), (tok, s)


@settings(max_examples=40, deadline=None)
@given(
    tokens=st.lists(st.text(alphabet="abcdefgh ", min_size=1, max_size=8), min_size=1, max_size=20),
    k=st.sampled_from([8, 32, 128]),
    b=st.sampled_from([1, 2, 4]),
    seed=st.integers(0, 10_000),
)
def test_signature_properties(tokens, k, b, seed):
    """Order/multiplicity invariance + determinism for arbitrary configs."""
    cfg = MinHashConfig(num_of_hash=k, bit=b, seed=seed)
    h = MinHasher(cfg, cache_tokens=0)
    sig = h.signatures([tokens])[0]
    # permutation invariance (min is order-free)
    assert h.signatures([tokens[::-1]])[0] == sig
    # duplicate tokens have no effect
    assert h.signatures([tokens + tokens])[0] == sig
    # cached hasher produces identical output
    h2 = MinHasher(cfg, cache_tokens=1000)
    assert h2.signatures([tokens])[0] == sig
    assert h2.signatures([tokens])[0] == sig  # warm-cache path


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(2, 400),
    width=st.sampled_from([4, 5, 8, 16]),
    seed=st.integers(0, 1000),
)
def test_scratch_kernels_match_plain(n, width, seed):
    """PairComparer / SigMatrixBuilder (worker-persistent scratch buffers)
    are drop-in equal to compare_pairs / sig_matrix for arbitrary widths,
    truncation, nulls and empties — including repeated calls that reuse and
    regrow the buffers."""
    import pyarrow as pa

    from elasticsearch_minhash_ray.functions.minhash import (
        PairComparer,
        compare_pairs,
        sig_u64,
    )
    from elasticsearch_minhash_ray.stages.signature import SigMatrixBuilder, sig_matrix

    rng = np.random.default_rng(seed)
    vals = []
    for _ in range(n):
        r = rng.random()
        if r < 0.08:
            vals.append(None)
        elif r < 0.16:
            vals.append(b"")
        elif r < 0.3:
            vals.append(rng.integers(0, 256, int(rng.integers(1, width))).astype(np.uint8).tobytes())
        else:
            vals.append(rng.integers(0, 256, width).astype(np.uint8).tobytes())
    col = pa.array(vals, pa.binary())
    builder = SigMatrixBuilder()
    comparer = PairComparer(tile=64)  # tiny tile -> exercises tiling
    for arr in (col, col.slice(1)):  # second call reuses buffers, offset view
        m1, l1 = sig_matrix(arr, width)
        m2, l2 = builder(arr, width)
        assert np.array_equal(m1, m2) and np.array_equal(l1, l2)
        mat = np.ascontiguousarray(m2)
        ia, ib = np.triu_indices(len(l2), k=1)
        want = compare_pairs(sig_u64(mat), l2.copy(), ia, ib)
        got = comparer(sig_u64(mat), l2.copy(), ia, ib)
        assert np.array_equal(want, got)


# -- analyzer-chain filters (reference README.md:28-42: any char_filter /
# filter chain may precede the final minhash filter) ------------------------


def test_analyzer_filters_reach_golden():
    """Hand-verified via the golden fixtures: each chain normalizes its input
    to exactly the 'test 1' token stream, so the signature must equal the
    reference's golden base64 for cfg1."""
    from elasticsearch_minhash_ray.functions.minhash import MinHashConfig, MinHasher, to_base64
    from elasticsearch_minhash_ray.functions.tokenize import get_tokenizer

    want = "Uji99jenq7da3aNKTYc8yQ=="
    cases = [
        ("Test 1", (), ("lowercase",)),
        ("<b>test</b> 1", ("html_strip",), ()),
        ("tést 1", ("asciifolding",), ()),   # tést -> test (char filter)
        ("Tést 1", (), ("asciifolding", "lowercase")),  # token filters
        ("the test and 1 of", (), ("stop",)),      # stopwords removed
    ]
    for text, cfs, tfs in cases:
        cfg = MinHashConfig(char_filters=cfs, filters=tfs)
        tok = get_tokenizer(cfg.tokenizer, cfg.shingle, cfg.char_filters, cfg.filters)
        got = to_base64(MinHasher(cfg).signatures([tok(text)])[0])
        assert got == want, (text, cfs, tfs, got)


def test_analyzer_filters_batch_matches_scalar():
    from elasticsearch_minhash_ray.functions.tokenize import get_batch_tokenizer, get_tokenizer

    texts = ["The <I>Quick</i> Fox", "tést &amp; TÜV", "", "the of and"]
    for cfs, tfs in [(("html_strip",), ("lowercase", "stop")),
                     (("asciifolding",), ("uppercase",)),
                     ((), ("trim", "length"))]:
        scalar = get_tokenizer("standard", 1, cfs, tfs)
        many = get_batch_tokenizer("standard", 1, cfs, tfs)
        assert many(texts) == [scalar(t) if t else [] for t in texts]


def test_filters_affect_config_hash_and_validate():
    from elasticsearch_minhash_ray.functions.minhash import MinHashConfig

    base = MinHashConfig()
    assert MinHashConfig(filters=("lowercase",)).config_hash() != base.config_hash()
    assert MinHashConfig(filters=["lowercase"]).filters == ("lowercase",)  # list coerced
    with pytest.raises(ValueError):
        MinHashConfig(filters=("nope",))
    with pytest.raises(ValueError):
        MinHashConfig(char_filters=("nope",))
