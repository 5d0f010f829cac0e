"""UAX#29 standard-tokenizer fidelity (the reference's documented analyzer:
tokenizer "standard" + minhash filter, README.md:32-35 /
MinHashPluginTest.java:80-82). Hand-verified token streams per the UAX#29
spec + Lucene StandardTokenizer typing rules."""

import numpy as np
import pytest

from elasticsearch_minhash_ray.functions.minhash import MinHashConfig, MinHasher, to_base64
from elasticsearch_minhash_ray.functions.tokenize import get_tokenizer
from elasticsearch_minhash_ray.functions.uax29 import tokenize_uax29


def test_table_artifact_matches_builder():
    """The committed _uax29_tables.npz must equal a fresh unicodedata build
    (regenerate with functions/uax29.py:_build_tables + np.savez_compressed
    if this fails after a Unicode data update)."""
    import os

    from elasticsearch_minhash_ray.functions import uax29

    d = np.load(os.path.join(os.path.dirname(uax29.__file__), "_uax29_tables.npz"))
    cls, word = uax29._build_tables()
    assert np.array_equal(d["cls"], cls)
    assert np.array_equal(d["word"], word)


def test_es_docs_example():
    # the canonical example from the public ES standard-tokenizer docs
    assert tokenize_uax29(
        "The 2 QUICK Brown-Foxes jumped over the lazy dog's bone."
    ) == ["The", "2", "QUICK", "Brown", "Foxes", "jumped", "over", "the", "lazy", "dog's", "bone"]


def test_mid_letter_number_joins():
    assert tokenize_uax29("example.com") == ["example.com"]
    assert tokenize_uax29("1,000.5") == ["1,000.5"]
    assert tokenize_uax29("abc:def") == ["abc:def"]  # colon = MidLetter (WB6/7)
    assert tokenize_uax29("c3:p0") == ["c3", "p0"]  # MidLetter needs letters BOTH sides
    assert tokenize_uax29("a..b") == ["a", "b"]  # double mid-punct breaks
    assert tokenize_uax29("foo_bar_9") == ["foo_bar_9"]  # ExtendNumLet joins
    assert tokenize_uax29("x'y") == ["x'y"]
    assert tokenize_uax29("'quoted'") == ["quoted"]  # leading/trailing drop


def test_cjk_per_char_and_runs():
    # Han: one token per ideograph (no word-break property → WB999 everywhere)
    assert tokenize_uax29("你好世界") == ["你", "好", "世", "界"]
    # Hiragana: per char; Katakana: runs (WB13); Hangul: ALetter runs (WB5)
    assert tokenize_uax29("ひらがな") == ["ひ", "ら", "が", "な"]
    assert tokenize_uax29("カタカナ") == ["カタカナ"]
    assert tokenize_uax29("한국어 단어") == ["한국어", "단어"]
    # mixed script boundaries
    assert tokenize_uax29("中文mixed語") == ["中", "文", "mixed", "語"]
    assert tokenize_uax29("漢字とカタカナ") == ["漢", "字", "と", "カタカナ"]


def test_combining_marks_attach():
    # é as e + COMBINING ACUTE (WB4: Extend attaches to the base)
    decomposed = "étude"
    assert tokenize_uax29(decomposed) == [decomposed]
    # bare combining mark at start of text is not a token
    assert tokenize_uax29("́ abc") == ["abc"]


def test_newlines_and_punct():
    assert tokenize_uax29("a\r\nb") == ["a", "b"]
    assert tokenize_uax29("don't\nstop") == ["don't", "stop"]
    assert tokenize_uax29("!!! ??? ...") == []
    assert tokenize_uax29("") == []


def test_max_token_length_split():
    t = "x" * 600
    assert tokenize_uax29(t) == ["x" * 255, "x" * 255, "x" * 90]
    assert tokenize_uax29(t, max_token_length=100) == ["x" * 100] * 6


def test_southeast_asian_runs():
    # Lucene emits complex-context scripts as runs (SOUTHEAST_ASIAN type)
    toks = tokenize_uax29("สวัสดี ครับ")
    assert toks == ["สวัสดี", "ครับ"]


def test_registry_standard_is_uax29():
    std = get_tokenizer("standard")
    assert std("中文 test") == ["中", "文", "test"]
    legacy = get_tokenizer("standard_regex")
    assert legacy("中文 test") == ["中文", "test"]  # the documented approximation


def test_ascii_fast_path_equals_vectorized():
    """The ASCII regex fast path must produce exactly the vectorized UAX#29
    result: fuzz over the full printable-ASCII + control-char space. The
    vectorized path is forced by appending a non-ASCII NBSP sentinel
    (class Other — never joins, never a token)."""
    import random

    from elasticsearch_minhash_ray.functions.uax29 import _segments

    def vectorized(t):
        segs = _segments(t)
        return [t[s:e] for s, e in zip(*[x.tolist() for x in segs])]

    random.seed(7)
    alphabet = "abcZ019_.,;:'\"-+() \t\r\n/\\#!"
    for _ in range(800):
        t = "".join(random.choice(alphabet) for _ in range(random.randint(0, 60)))
        assert tokenize_uax29(t) == vectorized(t), repr(t)
    # targeted join/break cases
    for t in ["a:b", "c3:p0", "1;2", "a;b", "1'2", "a'b", "a.1", "3.14", "x_y.z_w",
              "_.a", "__", "a..b", "don't.stop,now;ok"]:
        assert tokenize_uax29(t) == vectorized(t), repr(t)


def test_mixed_batch_routes_both_paths():
    from elasticsearch_minhash_ray.functions.uax29 import tokenize_uax29_many

    texts = ["pure ascii text", "中文 mixed", None, "", "it's 1,000"]
    assert tokenize_uax29_many(texts) == [tokenize_uax29(t) if t else [] for t in texts]


def test_cjk_signature_matches_handverified_tokens():
    """Reference bit-parity precondition: the signature of CJK content under
    the default config equals the signature of its hand-verified UAX#29
    token stream (MinHash.calculate consumes exactly this stream)."""
    h = MinHasher(MinHashConfig())
    text = "深度学习模型 deep-learning モデル 테스트 2,000"
    hand = ["深", "度", "学", "习", "模", "型", "deep", "learning", "モデル", "테스트", "2,000"]
    tok = get_tokenizer("standard")
    assert tok(text) == hand
    sig_text = h.signatures([tok(text)])[0]
    sig_hand = h.signatures([hand])[0]
    assert to_base64(sig_text) == to_base64(sig_hand)
    # and differs from what the regex approximation would have produced
    sig_legacy = h.signatures([get_tokenizer("standard_regex")(text)])[0]
    assert sig_text != sig_legacy
