"""Exact-substring (repeated-span) dedup tests: planted spans, within-doc
repeats, merge semantics, and degenerate inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from elasticsearch_minhash_ray.stages.substring import (
    GramStage,
    substring_dedup_spans,
    substring_dedup_stats,
)


def _words(rng, n, vocab=5000):
    return " ".join(f"w{rng.integers(vocab)}" for _ in range(n))


def _spans_df(docs, k, **kw):
    ds = rd.from_pandas(pd.DataFrame(docs))
    out = substring_dedup_spans(ds, k=k, num_partitions=8, **kw).to_pandas()
    out = out.reindex(columns=["doc_id", "span_start", "span_end"])
    return out.sort_values(["doc_id", "span_start"]).reset_index(drop=True)


def test_planted_cross_doc_span(ray_session):
    rng = np.random.default_rng(7)
    shared = _words(rng, 30)  # 30-token span planted in docs 1 and 2
    docs = [
        {"doc_id": 1, "text": _words(rng, 40) + " " + shared + " " + _words(rng, 15)},
        {"doc_id": 2, "text": _words(rng, 5) + " " + shared},
        {"doc_id": 3, "text": _words(rng, 60)},  # clean
    ]
    out = _spans_df(docs, k=20)
    # doc 1: span at tokens [40, 70); doc 2: [5, 35); doc 3: nothing
    assert out.to_dict("records") == [
        {"doc_id": 1, "span_start": 40, "span_end": 70},
        {"doc_id": 2, "span_start": 5, "span_end": 35},
    ]


def test_within_doc_repeat_counts(ray_session):
    rng = np.random.default_rng(8)
    rep = _words(rng, 25)
    # the span occurs twice inside ONE doc -> occurrences >= 2 must trigger
    docs = [{"doc_id": 1, "text": rep + " " + _words(rng, 30) + " " + rep}]
    out = _spans_df(docs, k=20)
    assert out.to_dict("records") == [
        {"doc_id": 1, "span_start": 0, "span_end": 25},
        {"doc_id": 1, "span_start": 55, "span_end": 80},
    ]


def test_adjacent_windows_merge(ray_session):
    rng = np.random.default_rng(9)
    shared = _words(rng, 50)  # one long shared run -> ONE merged span, not 31
    docs = [
        {"doc_id": 1, "text": shared},
        {"doc_id": 2, "text": _words(rng, 10) + " " + shared + " " + _words(rng, 10)},
    ]
    out = _spans_df(docs, k=20)
    assert out.to_dict("records") == [
        {"doc_id": 1, "span_start": 0, "span_end": 50},
        {"doc_id": 2, "span_start": 10, "span_end": 60},
    ]


def test_short_and_empty_docs(ray_session):
    docs = [
        {"doc_id": 1, "text": ""},
        {"doc_id": 2, "text": None},
        {"doc_id": 3, "text": "only five words right here"},  # < k tokens
        {"doc_id": 4, "text": "only five words right here"},
    ]
    out = _spans_df(docs, k=20)
    assert len(out) == 0
    ds = rd.from_pandas(pd.DataFrame(docs))
    stats = substring_dedup_stats(ds, k=20, num_partitions=8).to_pandas()
    assert len(stats) == 0


def test_stats_match_spans(ray_session):
    rng = np.random.default_rng(10)
    shared_a, shared_b = _words(rng, 22), _words(rng, 28)
    docs = [
        {"doc_id": 1, "text": shared_a + " " + _words(rng, 30) + " " + shared_b},
        {"doc_id": 2, "text": shared_a},
        {"doc_id": 3, "text": shared_b + " " + _words(rng, 12)},
    ]
    ds = rd.from_pandas(pd.DataFrame(docs))
    spans = substring_dedup_spans(ds, k=20, num_partitions=8).to_pandas()
    stats = (
        substring_dedup_stats(ds, k=20, num_partitions=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    expect = (
        spans.assign(length=spans.span_end - spans.span_start)
        .groupby("doc_id", as_index=False)
        .agg(n_spans=("span_start", "size"), dup_tokens=("length", "sum"))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert stats.astype("int64").equals(expect.astype("int64"))
    assert set(stats.doc_id) == {1, 2, 3}
    assert stats.set_index("doc_id").loc[1, "n_spans"] == 2


def test_gram_stage_rejects_bad_k():
    with pytest.raises(ValueError):
        GramStage(k=1)


def test_gram_stage_boundary_mask():
    """Windows never cross document boundaries: two docs that concatenate
    into a duplicated token stream must NOT produce a gram."""
    stage = GramStage(k=4, num_partitions=8)
    batch = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["a b", "c d a b c d"]}
    )
    out = stage(batch)
    # doc 1 has 2 tokens < k -> nothing; doc 2 has 6 tokens -> 3 windows
    assert out.num_rows == 3
    assert out["doc_id"].to_pylist() == [2, 2, 2]
    assert out["pos"].to_pylist() == [0, 1, 2]


def _clean_df(docs, k, **kw):
    from elasticsearch_minhash_ray.stages.substring import substring_dedup_clean

    ds = rd.from_pandas(pd.DataFrame(docs))
    out = substring_dedup_clean(ds, k=k, num_partitions=8, **kw).to_pandas()
    out = out.reindex(columns=["doc_id", "n_tokens", "n_removed", "cleaned_text"])
    return out.sort_values("doc_id").reset_index(drop=True)


def test_clean_keeps_first_occurrence(ray_session):
    """Keep-first semantics: the canonical (min (doc_id, pos)) copy of a
    duplicated span survives; every other copy is cut."""
    rng = np.random.default_rng(11)
    shared = _words(rng, 25)
    pre2 = _words(rng, 5)
    docs = [
        {"doc_id": 1, "text": shared + " " + _words(rng, 10)},   # canonical copy
        {"doc_id": 2, "text": pre2 + " " + shared},              # cut
        {"doc_id": 3, "text": _words(rng, 30)},                  # untouched
    ]
    out = _clean_df(docs, k=20)
    rows = {r["doc_id"]: r for r in out.to_dict("records")}
    assert rows[1]["n_removed"] == 0 and rows[1]["cleaned_text"] == docs[0]["text"]
    assert rows[2]["n_removed"] == 25 and rows[2]["cleaned_text"] == pre2
    assert rows[3]["n_removed"] == 0 and rows[3]["cleaned_text"] == docs[2]["text"]
    assert list(out["n_tokens"]) == [35, 30, 30]


def test_clean_within_doc_repeat(ray_session):
    """A span repeated inside ONE doc keeps its first occurrence only."""
    rng = np.random.default_rng(12)
    rep, mid = _words(rng, 22), _words(rng, 30)
    docs = [{"doc_id": 5, "text": rep + " " + mid + " " + rep}]
    out = _clean_df(docs, k=20)
    assert out.loc[0, "n_removed"] == 22
    assert out.loc[0, "cleaned_text"] == rep + " " + mid


def test_clean_zero_token_docs_excluded(ray_session):
    docs = [
        {"doc_id": 1, "text": ""},
        {"doc_id": 2, "text": None},
        {"doc_id": 3, "text": "..."},  # punctuation-only -> zero word tokens
        {"doc_id": 4, "text": "some short doc"},
    ]
    out = _clean_df(docs, k=20)
    assert list(out["doc_id"]) == [4]
    assert out.loc[0, "cleaned_text"] == "some short doc"


def test_clean_whitespace_normalized(ray_session):
    """Cleaning is defined over the token stream: output joins kept tokens
    with single spaces regardless of the input's inter-token whitespace."""
    docs = [{"doc_id": 9, "text": "a\n\tb   c"}]
    out = _clean_df(docs, k=20)
    assert out.loc[0, "cleaned_text"] == "a b c"
    assert out.loc[0, "n_tokens"] == 3 and out.loc[0, "n_removed"] == 0


def test_clean_overlapping_spans_from_two_grams(ray_session):
    """A doc fully covered by duplicated windows (no canonical) empties out
    but keeps its row, with n_removed == n_tokens."""
    rng = np.random.default_rng(13)
    shared = _words(rng, 20)
    docs = [
        {"doc_id": 1, "text": shared},  # canonical
        {"doc_id": 2, "text": shared},  # fully duplicated -> emptied
    ]
    out = _clean_df(docs, k=20)
    rows = {r["doc_id"]: r for r in out.to_dict("records")}
    assert rows[1]["cleaned_text"] == shared and rows[1]["n_removed"] == 0
    assert rows[2]["cleaned_text"] == "" and rows[2]["n_removed"] == 20


def test_clean_matches_bruteforce_twin(ray_session):
    """Randomized corpus with planted repeats vs a pure-Python brute-force
    twin of the keep-first semantics (exact k-gram strings, no hashing)."""
    import re

    rng = np.random.default_rng(42)
    k = 5
    frags = [_words(rng, rng.integers(3, 12), vocab=30) for _ in range(6)]
    docs = []
    for d in range(12):
        n_parts = rng.integers(1, 5)
        parts = [frags[rng.integers(len(frags))] for _ in range(n_parts)]
        docs.append({"doc_id": d, "text": " ".join(parts)})

    word_re = re.compile(r"[0-9A-Za-z_]+")
    toks = {d["doc_id"]: word_re.findall(d["text"]) for d in docs}
    # brute force: every k-gram -> occurrence list; canonical = min (doc, pos)
    occ: dict[tuple, list] = {}
    for did in sorted(toks):
        t = toks[did]
        for p in range(len(t) - k + 1):
            occ.setdefault(tuple(t[p : p + k]), []).append((did, p))
    cov = {did: np.zeros(len(t), bool) for did, t in toks.items()}
    for g, places in occ.items():
        if len(places) >= 2:
            for did, p in sorted(places)[1:]:
                cov[did][p : p + k] = True
    expect = {}
    for did, t in toks.items():
        if not t:
            continue
        kept = [w for w, c in zip(t, cov[did]) if not c]
        expect[did] = (len(t), int(cov[did].sum()), " ".join(kept))

    out = _clean_df(docs, k=k)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in out.to_dict("records")
    }
    assert got == expect


def test_clean_partition_invariance(ray_session):
    """Output is independent of num_partitions and input block layout."""
    rng = np.random.default_rng(21)
    shared = _words(rng, 25)
    docs = [{"doc_id": d, "text": (shared + " " if d % 4 == 0 else "") + _words(rng, 20)} for d in range(40)]
    outs = []
    # broadcast_limit=0 forces the union-join path; default broadcasts —
    # both strategies must agree across partition counts and block layouts
    for nparts, nblocks, blimit in ((2, 1, 0), (16, 5, 2_000_000)):
        ds = rd.from_pandas(pd.DataFrame(docs)).repartition(nblocks)
        from elasticsearch_minhash_ray.stages.substring import substring_dedup_clean

        out = (
            substring_dedup_clean(ds, k=20, num_partitions=nparts, broadcast_limit=blimit)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(out[["doc_id", "n_tokens", "n_removed", "cleaned_text"]])
    assert outs[0].equals(outs[1])


def test_verify_mode_equals_default_without_collisions(ray_session):
    """verify=True must be a no-op wherever no 64-bit gram collision occurred
    (i.e. everywhere in practice): identical spans AND identical cleaned text
    on a duplication-heavy corpus."""
    from elasticsearch_minhash_ray.stages.substring import substring_dedup_clean

    rng = np.random.default_rng(11)
    shared = _words(rng, 30)
    docs = [
        {"doc_id": 1, "text": _words(rng, 20) + " " + shared + " " + _words(rng, 10)},
        {"doc_id": 2, "text": shared + " " + _words(rng, 25)},
        {"doc_id": 3, "text": _words(rng, 40)},
        {"doc_id": 4, "text": shared},
    ]
    base = _spans_df(docs, k=10)
    ver = _spans_df(docs, k=10, verify=True)
    pd.testing.assert_frame_equal(base, ver)
    clean_kw = dict(k=10, num_partitions=8)
    c0 = (
        substring_dedup_clean(rd.from_pandas(pd.DataFrame(docs)), **clean_kw)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    c1 = (
        substring_dedup_clean(rd.from_pandas(pd.DataFrame(docs)), verify=True, **clean_kw)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(c0, c1)


def test_verify_survives_planted_gram_collision(monkeypatch):
    """Plant a 64-bit collision (two DIFFERENT tokens forced to the same
    seed-0 hash): the default mode fabricates a duplicated span out of two
    distinct windows; verify=True (independent second fingerprint) does not.
    Kernel-level (no Ray): monkeypatching can't cross worker processes."""
    from elasticsearch_minhash_ray.stages import substring as sub

    real = sub.hash_tokens_many_seeds

    def fake(tokens, seeds):
        H = real(tokens, seeds)
        for i, t in enumerate(tokens):
            if t in ("collidea", "collideb"):
                H[i, 0] = 1234567  # seed-0 collision; seed-1 stays real
        return H

    monkeypatch.setattr(sub, "hash_tokens_many_seeds", fake)
    batch = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "alpha beta collidea gamma delta",
                "alpha beta collideb gamma delta",
            ],
        }
    )
    for verify, expect_false_span in ((False, True), (True, False)):
        g = sub.GramStage(3, num_partitions=1, verify=verify)(batch)
        occ = sub._dup_occurrences(g, 1)
        spans = sub._merge_spans(occ, 3)
        assert (spans.num_rows > 0) == expect_false_span, f"verify={verify}"
