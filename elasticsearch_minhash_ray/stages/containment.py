"""Exact set-containment join (asymmetric near-dup) via an inverted-index
co-occurrence count.

MinHash LSH (stages/lsh.py) targets SYMMETRIC Jaccard: a small doc wholly
contained in a much larger one (a vendored file inside a bundle, a quoted
message inside a thread, boilerplate inside a generated file) sits at tiny
Jaccard yet containment 1.0, and no band ever co-buckets the pair. This
operator computes C(a→b) = |Sa ∩ Sb| / |Sa| EXACTLY for all ordered pairs
with C ≥ t, over the same sorted-unique shingle-hash sets as the
jaccard-verify path (stages/text.py:shingle_hash_sets).

Design — count shared shingles, never ship sets. |Sa∩Sb| is the number of
posting lists containing both docs, so the join is two combiner-shaped
exchanges over fixed-width rows:

  1. postings (sh, id, n): one row per (doc, distinct shingle) — the
     token_df-sized exchange, 24 B/row.
  2. sh-keyed co-partition → per shingle, every ordered pair (a, b), a≠b,
     pre-filtered by the SIZE bound (C(a→b) ≥ t needs |Sb| ≥ t·|Sa|, i.e.
     nb·den ≥ num·na in integers) → per-BLOCK partial (a, b, cnt, na)
     groupby — the combiner, so the second exchange carries distinct pairs
     per block, not raw co-occurrences.
  3. a-keyed co-partition → sum cnt → INTEGER threshold c·den ≥ num·na
     (no float compare) → containment rounded to 9 dp for engine parity.

An earlier draft used prefix filtering (AllPairs/PPJoin — Bayardo et al.,
WWW 2007): post only each probe doc's first |Sa|−ceil(t·|Sa|)+1 shingles,
then verify candidates against attached sets. Measured on this corpus it
LOST to the count design (~17 s vs ~4 s at sf0.1): candidate pairs each
dragged a full shingle list through two sorts and a merge, while the raw
co-occurrence mass Σ_sh df(sh)² was only ~11× the posting count and
collapses inside the map task. Prefix filtering wins only when Σ df²
explodes, i.e. under heavy-tailed shingle frequencies.

100-TB shape: work is Σ df² — quadratic ONLY in per-shingle document
frequency, never in corpus size. A boilerplate shingle shared by 10^6 docs
is the same skew law the LSH stage meets with bucket_cap: cap df at the
read (drop postings of shingles with df > cap, making the count a
LOWER bound that can only MISS pairs sharing nothing but boilerplate —
usually the intended semantics, but it is a semantic change so the cap is
off by default), or fall back to prefix filtering for that hot tail.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..grouping import map_copartitioned
from .lsh import _gather_ranges


def build_shingle_sets(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer: str = "words",
    shingle_n: int = 3,
):
    """(id, n, shingles sorted-unique list<int64>) per doc; empty-set docs
    (no tokens) are excluded — they can neither contain nor be contained."""
    from .text import shingle_hash_sets

    def ex(batch: pa.Table) -> pa.Table:
        sets = shingle_hash_sets(batch[text_col].to_pylist(), tokenizer, shingle_n)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        keep = [i for i, s in enumerate(sets) if len(s)]
        return pa.table(
            {
                "id": pa.array(ids[keep], pa.int64()),
                "n": pa.array([len(sets[i]) for i in keep], pa.int64()),
                "shingles": pa.array(
                    [sets[i].tolist() for i in keep], pa.list_(pa.int64())
                ),
            }
        )

    return ds.map_batches(ex, batch_format="pyarrow")


def _flat(col) -> tuple[np.ndarray, np.ndarray]:
    """(values, offsets) of a list<int64> column, zero-copy where arrow allows."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(arr.values, dtype=np.int64), np.asarray(arr.offsets, dtype=np.int64)


def _cooccurrence_join(
    ds,
    *,
    mode: str,
    text_col: str,
    id_col: str,
    tokenizer: str,
    shingle_n: int,
    thr_num: int,
    thr_den: int,
    out_col: str,
    with_sizes: bool = False,
):
    """Shared inverted-index core (module docstring): postings exchange →
    per-shingle ordered-pair gather with the mode's integer size bound →
    per-block (a, b, cnt) combiner → a-keyed sum + integer threshold.

    mode="containment": ordered pairs a≠b, keep c·den ≥ num·na, value c/na.
    mode="jaccard": unordered pairs a<b (each emitted once), size bound in
    BOTH directions (J ≥ t forces min(na,nb) ≥ t·max(na,nb)), keep
    c·(den+num) ≥ num·(na+nb) — the integer form of c/(na+nb−c) ≥ t —
    value c/(na+nb−c). The jaccard mode is the EXACT all-pairs twin of the
    LSH+verify path (stages/lsh.py): same shingle kernel, no banding, so it
    doubles as a distributed recall witness at scales where the SQL
    all-pairs oracle is unaffordable."""
    assert mode in ("containment", "jaccard")

    def postings(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "sh": pa.array([], pa.int64()),
                    "id": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        flat, offs = _flat(t["shingles"])
        n = np.asarray(t["n"], dtype=np.int64)
        ids = np.asarray(t["id"], dtype=np.int64)
        return pa.table(
            {
                "sh": pa.array(flat, pa.int64()),
                "id": pa.array(np.repeat(ids, n), pa.int64()),
                "n": pa.array(np.repeat(n, n), pa.int64()),
            }
        )

    posts = build_shingle_sets(
        ds, text_col=text_col, id_col=id_col, tokenizer=tokenizer, shingle_n=shingle_n
    ).map_batches(postings, batch_format="pyarrow")

    _part_empty = pd.DataFrame(
        {
            "a": np.empty(0, np.int64),
            "b": np.empty(0, np.int64),
            "cnt": np.empty(0, np.int64),
            "na": np.empty(0, np.int64),
            "nb": np.empty(0, np.int64),
        }
    )

    def co_count(block: pa.Table) -> pd.DataFrame:
        # co-partitioned on sh (sorted): run boundaries delimit each
        # shingle's posting list; ordered pairs are built by repeat/gather
        if block.num_rows == 0:
            return _part_empty
        sh = np.asarray(block["sh"], dtype=np.int64)
        ids = np.asarray(block["id"], dtype=np.int64)
        n = np.asarray(block["n"], dtype=np.int64)
        starts_k = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        g_k = np.diff(np.r_[starts_k, len(sh)])
        g_row = np.repeat(g_k, g_k)  # group size, per row
        s_row = np.repeat(starts_k, g_k)  # group start, per row
        a_idx = np.repeat(np.arange(len(sh), dtype=np.int64), g_row)
        b_idx = _gather_ranges(s_row, g_row)
        a, b = ids[a_idx], ids[b_idx]
        na, nb = n[a_idx], n[b_idx]
        if mode == "containment":
            # size bound: C(a→b) ≥ t needs nb ≥ t·na — integer form
            keep = (a != b) & (nb * thr_den >= thr_num * na)
        else:
            # symmetric: emit each pair once; J ≥ t bounds both directions
            keep = (
                (a < b)
                & (nb * thr_den >= thr_num * na)
                & (na * thr_den >= thr_num * nb)
            )
        part = pd.DataFrame(
            {"a": a[keep], "b": b[keep], "na": na[keep], "nb": nb[keep]}
        )
        # the combiner: one (a, b) row per block, however many shingles hit
        out = part.groupby(["a", "b"], as_index=False, sort=False).agg(
            cnt=("na", "size"), na=("na", "first"), nb=("nb", "first")
        )
        out["cnt"] = out["cnt"].astype(np.int64)
        return out[["a", "b", "cnt", "na", "nb"]]

    partials = map_copartitioned(posts, "sh", co_count, batch_format="pyarrow")

    _edges_empty = pd.DataFrame(
        {
            "a_id": np.empty(0, np.int64),
            "b_id": np.empty(0, np.int64),
            out_col: np.empty(0, np.float64),
            **(
                {"na": np.empty(0, np.int64), "nb": np.empty(0, np.int64)}
                if with_sizes
                else {}
            ),
        }
    )

    def finish(block: pd.DataFrame) -> pd.DataFrame:
        # co-partitioned on a: every partial of a given probe doc is here
        if not len(block):
            return _edges_empty
        g = block.groupby(["a", "b"], as_index=False, sort=False).agg(
            c=("cnt", "sum"), na=("na", "first"), nb=("nb", "first")
        )
        c = g["c"].to_numpy(np.int64)
        na = g["na"].to_numpy(np.int64)
        nb = g["nb"].to_numpy(np.int64)
        if mode == "containment":
            keep = c * thr_den >= thr_num * na  # integer threshold
            denom = na
        else:
            keep = c * (thr_den + thr_num) >= thr_num * (na + nb)
            denom = na + nb - c
        if not keep.any():
            return _edges_empty
        val = pc.round(
            pa.array(c[keep] / denom[keep], pa.float64()), ndigits=9
        ).to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {
                "a_id": g["a"].to_numpy(np.int64)[keep],
                "b_id": g["b"].to_numpy(np.int64)[keep],
                out_col: val,
                **({"na": na[keep], "nb": nb[keep]} if with_sizes else {}),
            }
        )

    return map_copartitioned(partials, "a", finish, batch_format="pandas")


def containment_join(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer: str = "words",
    shingle_n: int = 3,
    thr_num: int = 4,
    thr_den: int = 5,
    out_col: str = "containment",
):
    """All ordered pairs (a, b), a ≠ b, with |Sa∩Sb| / |Sa| ≥
    thr_num/thr_den (module docstring). Returns (a_id, b_id, out_col)."""
    return _cooccurrence_join(
        ds,
        mode="containment",
        text_col=text_col,
        id_col=id_col,
        tokenizer=tokenizer,
        shingle_n=shingle_n,
        thr_num=thr_num,
        thr_den=thr_den,
        out_col=out_col,
    )


def jaccard_join(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer: str = "words",
    shingle_n: int = 3,
    thr_num: int = 4,
    thr_den: int = 5,
    out_col: str = "jaccard",
):
    """All unordered pairs (a < b) with set Jaccard ≥ thr_num/thr_den,
    EXACT and without LSH banding — the all-pairs twin of the
    stages/lsh.py jaccard-verify path on the same shingle kernel. Use it
    as a distributed recall witness for the banded path, or directly when
    Σ df² is affordable. Returns (a_id, b_id, out_col)."""
    return _cooccurrence_join(
        ds,
        mode="jaccard",
        text_col=text_col,
        id_col=id_col,
        tokenizer=tokenizer,
        shingle_n=shingle_n,
        thr_num=thr_num,
        thr_den=thr_den,
        out_col=out_col,
    )


def containment_keep(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer: str = "words",
    shingle_n: int = 3,
    thr_num: int = 4,
    thr_den: int = 5,
):
    """Subsumption-dedup ACTION: drop every doc that is ≥ t contained in a
    STRICTLY LARGER doc (more distinct shingles), or in an equal-size doc
    with a smaller id — the deterministic tiebreak, so a mutually-contained
    equal-size family keeps exactly its min-id member. Returns the kept rows
    of ``ds`` unchanged.

    Each drop is justified by its own witness edge (a, b): the content of a
    is ≥ t present in the kept-or-larger b. Drops are NOT transitive claims
    — a chain a⊂b⊂c drops both a and b with b and c as witnesses; c may not
    contain a directly. That greedy semantics is the standard subsumption
    cut (keep maximal docs).

    Shape: the containment edges (with sizes) reduce to a distinct drop-key
    Dataset inside the edge map; the cut itself is
    :func:`..dedup.anti_join_keys` (broadcast or union-anti-join, auto)."""
    from .dedup import anti_join_keys

    edges = _cooccurrence_join(
        ds,
        mode="containment",
        text_col=text_col,
        id_col=id_col,
        tokenizer=tokenizer,
        shingle_n=shingle_n,
        thr_num=thr_num,
        thr_den=thr_den,
        out_col="containment",
        with_sizes=True,
    )

    def drops(batch: pd.DataFrame) -> pd.DataFrame:
        m = (batch["nb"] > batch["na"]) | (
            (batch["nb"] == batch["na"]) & (batch["b_id"] < batch["a_id"])
        )
        return pd.DataFrame(
            {id_col: batch.loc[m, "a_id"].drop_duplicates().to_numpy(np.int64)}
        )

    drop_ds = edges.map_batches(drops, batch_format="pandas")
    return anti_join_keys(ds, drop_ds, key_col=id_col)


def novelty_scores(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer: str = "words",
    shingle_n: int = 3,
    out_col: str = "novelty",
):
    """Per-doc novelty: the fraction of a doc's distinct shingles that
    appear in NO other doc (global document frequency 1) — the inverse
    signal to the dedup family (a boilerplate page scores ~0, original
    content ~1; rank or gate on it like unigram_surprisal).

    Two keyed exchanges of fixed-width rows on the shared postings shape:
    sh-co-partition counts each shingle's df and emits (id, 1) for the
    df==1 postings (the combiner: one row per unique-shingle occurrence);
    an id-co-partition sums them against the doc's base row (id, 0, n)
    union-injected from the sets table, so a doc with zero unique shingles
    still reports novelty 0.0. Returns (id_col, n_shingles, n_unique,
    out_col[9dp])."""
    sets = build_shingle_sets(
        ds, text_col=text_col, id_col=id_col, tokenizer=tokenizer, shingle_n=shingle_n
    ).materialize()

    def postings(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"sh": pa.array([], pa.int64()), "id": pa.array([], pa.int64())}
            )
        flat, offs = _flat(t["shingles"])
        n = np.asarray(t["n"], dtype=np.int64)
        ids = np.asarray(t["id"], dtype=np.int64)
        return pa.table(
            {
                "sh": pa.array(flat, pa.int64()),
                "id": pa.array(np.repeat(ids, n), pa.int64()),
            }
        )

    posts = sets.map_batches(postings, batch_format="pyarrow")

    _uniq_empty = pd.DataFrame(
        {"id": np.empty(0, np.int64), "u": np.empty(0, np.int64), "n": np.empty(0, np.int64)}
    )

    def unique_marks(block: pa.Table) -> pd.DataFrame:
        # co-partitioned on sh: run boundaries are posting lists
        if block.num_rows == 0:
            return _uniq_empty
        sh = np.asarray(block["sh"], dtype=np.int64)
        ids = np.asarray(block["id"], dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        g = np.diff(np.r_[starts, len(sh)])
        singles = ids[starts[g == 1]]
        out = pd.DataFrame({"id": singles}).groupby("id", as_index=False).size()
        return pd.DataFrame(
            {
                "id": out["id"].to_numpy(np.int64),
                "u": out["size"].to_numpy(np.int64),
                "n": np.zeros(len(out), np.int64),
            }
        )

    marks = map_copartitioned(posts, "sh", unique_marks, batch_format="pyarrow")

    def base_rows(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "id": np.asarray(t["id"], dtype=np.int64),
                "u": np.zeros(t.num_rows, np.int64),
                "n": np.asarray(t["n"], dtype=np.int64),
            }
        )

    u = marks.union(sets.map_batches(base_rows, batch_format="pyarrow"))

    _out_empty = pd.DataFrame(
        {
            id_col: np.empty(0, np.int64),
            "n_shingles": np.empty(0, np.int64),
            "n_unique": np.empty(0, np.int64),
            out_col: np.empty(0, np.float64),
        }
    )

    def finish(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return _out_empty
        g = block.groupby("id", as_index=False).agg(u=("u", "sum"), n=("n", "sum"))
        n = g["n"].to_numpy(np.int64)
        uq = g["u"].to_numpy(np.int64)
        nov = pc.round(
            pa.array(uq / np.maximum(n, 1), pa.float64()), ndigits=9
        ).to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {
                id_col: g["id"].to_numpy(np.int64),
                "n_shingles": n,
                "n_unique": uq,
                out_col: nov,
            }
        )

    return map_copartitioned(u, "id", finish, batch_format="pandas")
