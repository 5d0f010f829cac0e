"""Exact-substring (repeated-span) dedup — the Lee-et-al.-style operator
family ("Deduplicating Training Data Makes Language Models Better", ACL 2022):
find every span of >= k consecutive tokens that occurs >= 2 times anywhere in
the corpus (cross-doc OR repeated within one doc) and report the merged
duplicated spans per document. This is the substring-level complement to the
document-level MinHash/SimHash near-dup pipelines (no reference file to cite:
the ES plugin's scope ends at per-doc signatures; this operator is mandated by
the target's curation brief).

Scale design — the distributed hash alternative to a monolithic suffix array:

1. map_batches: tokenize (``[0-9A-Za-z_]+`` word tokens, SQL-parity with the
   repo's other oracles), murmur3-hash each DISTINCT token once per batch
   (factorize pattern), then combine every k consecutive token hashes with a
   fixed-base polynomial rolling hash (Horner, k strided multiply-adds over
   one flat per-batch buffer; windows crossing doc boundaries masked out) →
   one uint64 gram fingerprint per token position. No Python loop over rows.
2. ONE int32 hash-partition exchange keyed on the gram fingerprint
   (~20 B/row: gram, doc, pos). Per partition (vectorized sort + run-length):
   keep positions whose gram occurs >= 2 times globally — all occurrences of
   a fingerprint land in the same partition, so the count is exact.
3. Second int32 exchange keyed on doc id — per doc: sort positions, merge
   overlapping/adjacent [pos, pos+k) windows into maximal spans (vectorized
   diff > k island detection).

At 100 TB step 2 is the cost: ~20 B per input token crosses the wire — the
price every hash-based substring dedup pays (a distributed suffix array moves
the same order of bytes), and there is no smaller sufficient statistic
because a gram seen once in a block may still be duplicated globally. A
combiner CAN drop nothing but CAN pre-dedupe within-batch duplicate
(gram,doc,pos) rows — those don't exist — so step 1 emits exactly one row per
token position. Step 3 carries only duplicated occurrences (proportional to
corpus duplication, typically orders of magnitude smaller). Fingerprints are
64-bit: at 100 TB (~2e13 tokens) expect a handful of birthday collisions,
each of which can only ADD a false duplicated span (conservative for
curation); ``verify=True`` closes even that window by requiring a match on a
SECOND independent fingerprint (pair odds ~2^-128) at +8 B/token exchange
cost — see :func:`substring_dedup_spans`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .._arrow import table_from_pandas
from ..grouping import map_copartitioned

from ..functions.murmur3 import hash_tokens_many_seeds, seeds_u64
from ..functions.tokenize import get_batch_tokenizer

_POLY_BASE = np.uint64(0x100000001B3)  # FNV-1a prime; any odd 64-bit const works
_MIX = np.uint64(0x9E3779B97F4A7C15)

_OCC_SCHEMA = pa.schema(
    [("gram", pa.int64()), ("doc_id", pa.int64()), ("pos", pa.int64()), ("part", pa.int32())]
)
_DOCPOS_SCHEMA = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64()), ("doc_part", pa.int32())])
_SPAN_SCHEMA = pa.schema([("doc_id", pa.int64()), ("span_start", pa.int64()), ("span_end", pa.int64())])


class GramStage:
    """map_batches callable: docs → one (gram fingerprint, doc_id, pos) row
    per token position (pos is the 0-based word-token index). Stateful setup
    (tokenizer closure, hash seed) happens once per actor."""

    def __init__(self, k: int, text_col: str = "text", id_col: str = "doc_id",
                 tokenizer: str = "words", num_partitions: int = 64,
                 verify: bool = False):
        if k < 2:
            raise ValueError(f"k must be >= 2, got {k}")
        self.k = k
        self.text_col = text_col
        self.id_col = id_col
        self.tok_many = get_batch_tokenizer(tokenizer, 1)
        self.num_partitions = num_partitions
        # verify mode: a SECOND independent fingerprint (seed-1 murmur3
        # through the same Horner) rides each occurrence row (+8 B/token on
        # the wire); dup groups then require BOTH to match — pair collision
        # odds ~2^-128, so a 64-bit gram collision can no longer fabricate a
        # duplicated span (over-removal guard; see substring_dedup_spans)
        self.verify = verify
        self.seed = seeds_u64(0, 2 if verify else 1)
        self._empty = (
            _OCC_SCHEMA.append(pa.field("gram2", pa.int64())).empty_table()
            if verify
            else _OCC_SCHEMA.empty_table()
        )

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        k = self.k
        toks = self.tok_many(list(batch[self.text_col]))
        ids = batch[self.id_col].to_numpy()
        counts = np.fromiter((len(t) for t in toks), np.int64, len(toks))
        flat: list[str] = []
        for t in toks:
            flat.extend(t)
        n = len(flat)
        if n < k:
            return self._empty
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object), sort=False)
        Hall = hash_tokens_many_seeds(list(uniques), self.seed)
        H = Hall[:, 0].view(np.uint64)[codes]
        doc_idx = np.repeat(np.arange(len(toks)), counts)
        doc_starts = np.r_[0, np.cumsum(counts)][:-1]
        m = n - k + 1
        with np.errstate(over="ignore"):
            acc = np.zeros(m, np.uint64)
            for j in range(k):
                acc = acc * _POLY_BASE + H[j : m + j]
        valid = doc_idx[:m] == doc_idx[k - 1 : n]
        if not valid.any():
            return self._empty
        gram = acc[valid]
        d_idx = doc_idx[:m][valid]
        pos = np.flatnonzero(valid) - doc_starts[d_idx]
        with np.errstate(over="ignore"):
            part = ((gram * _MIX) % np.uint64(self.num_partitions)).astype(np.int32)
        cols = {
            "gram": pa.array(gram.view(np.int64), pa.int64()),
            "doc_id": pa.array(ids[d_idx], pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "part": pa.array(part, pa.int32()),
        }
        if self.verify:
            H2 = Hall[:, 1].view(np.uint64)[codes]
            with np.errstate(over="ignore"):
                acc2 = np.zeros(m, np.uint64)
                for j in range(k):
                    acc2 = acc2 * _POLY_BASE + H2[j : m + j]
            cols["gram2"] = pa.array(acc2[valid].view(np.int64), pa.int64())
        return pa.table(cols)


def _dup_occurrences(batch: pa.Table, num_partitions: int, keep_first: bool = False) -> pa.Table:
    """Per gram-partition: keep occurrences of fingerprints with global
    count >= 2; key the survivors for the per-doc exchange.

    ``keep_first=True`` additionally DROPS the canonical occurrence — the
    minimum (doc_id, pos) — of each duplicated fingerprint, so downstream
    span removal keeps exactly one copy of every repeated substring in the
    corpus (the clean-variant semantics); all occurrences of a fingerprint
    land in this partition, so the group minimum is exact."""
    g = np.asarray(batch["gram"])
    if len(g) == 0:
        return _DOCPOS_SCHEMA.empty_table()
    # verify mode (GramStage(verify=True)): a second independent fingerprint
    # rides each row; groups key on the (gram, gram2) 128-bit pair so a
    # 64-bit collision can't fabricate a duplicated span
    g2 = np.asarray(batch["gram2"]) if "gram2" in batch.schema.names else None
    if keep_first:
        keys = (np.asarray(batch["pos"]), np.asarray(batch["doc_id"]), g)
        order = np.lexsort(keys if g2 is None else (*keys[:2], g2, g))
    else:
        order = np.argsort(g, kind="stable") if g2 is None else np.lexsort((g2, g))
    gs = g[order]
    new_group = gs[1:] != gs[:-1]
    if g2 is not None:
        g2s = g2[order]
        new_group = new_group | (g2s[1:] != g2s[:-1])
    starts = np.flatnonzero(np.r_[True, new_group])
    counts = np.diff(np.r_[starts, len(gs)])
    keep_mask = np.repeat(counts >= 2, counts)
    if keep_first:
        first_of_group = np.zeros(len(gs), bool)
        first_of_group[starts] = True
        keep_mask &= ~first_of_group
    keep = order[keep_mask]
    if len(keep) == 0:
        return _DOCPOS_SCHEMA.empty_table()
    doc = np.asarray(batch["doc_id"])[keep]
    pos = np.asarray(batch["pos"])[keep]
    with np.errstate(over="ignore"):
        part = ((doc.view(np.uint64) * _MIX) % np.uint64(num_partitions)).astype(np.int32)
    return pa.table(
        {
            "doc_id": pa.array(doc, pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "doc_part": pa.array(part, pa.int32()),
        }
    )


def _merge_spans(batch: pa.Table, k: int) -> pa.Table:
    """Per doc-partition: merge each doc's duplicated [pos, pos+k) windows
    into maximal half-open spans (vectorized island detection)."""
    doc = np.asarray(batch["doc_id"])
    if len(doc) == 0:
        return _SPAN_SCHEMA.empty_table()
    pos = np.asarray(batch["pos"])
    order = np.lexsort((pos, doc))
    doc, pos = doc[order], pos[order]
    brk = np.r_[True, (doc[1:] != doc[:-1]) | (pos[1:] > pos[:-1] + k)]
    s_idx = np.flatnonzero(brk)
    e_idx = np.r_[s_idx[1:], len(pos)] - 1
    return pa.table(
        {
            "doc_id": pa.array(doc[s_idx], pa.int64()),
            "span_start": pa.array(pos[s_idx], pa.int64()),
            "span_end": pa.array(pos[e_idx] + k, pa.int64()),
        }
    )


def substring_dedup_spans(
    ds,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer: str = "words",
    num_partitions: int = 64,
    verify: bool = False,
):
    """Dataset of documents → Dataset (doc_id, span_start, span_end): the
    maximal merged token spans (0-based, half-open) duplicated >= 2 times
    corpus-wide at granularity k. Docs with no duplicated span emit nothing.

    ``verify=True``: duplicated-ness requires a match on TWO independent
    64-bit fingerprints (2^-128 pair collision odds) instead of one, closing
    the over-removal window a 64-bit gram collision opens (~a handful
    expected at 2e13 tokens). Costs +8 B/token on the gram exchange; output
    equals the default wherever no collision occurred (pytest-pinned)."""
    gram = GramStage(k, text_col, id_col, tokenizer, num_partitions, verify=verify)
    return map_copartitioned(
        map_copartitioned(
            ds.map_batches(gram, batch_format="pandas"),
            "part",
            lambda b: _dup_occurrences(b, num_partitions),
        ),
        "doc_part",
        lambda b: _merge_spans(b, k),
    )


def substring_dedup_stats(
    ds,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer: str = "words",
    num_partitions: int = 64,
    verify: bool = False,
):
    """Per-doc rollup of :func:`substring_dedup_spans`: (doc_id, n_spans,
    dup_tokens). dup_tokens counts token positions covered by >= 1 duplicated
    window — the quantity a curation policy thresholds on (e.g. drop or trim
    docs that are mostly duplicated text)."""
    spans = substring_dedup_spans(ds, k, text_col, id_col, tokenizer, num_partitions, verify)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if df.empty:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "n_spans": pa.array([], pa.int64()),
                 "dup_tokens": pa.array([], pa.int64())}
            )
        df["len"] = df["span_end"] - df["span_start"]
        agg = df.groupby("doc_id", as_index=False, sort=False).agg(
            n_spans=("span_start", "size"), dup_tokens=("len", "sum")
        )
        return table_from_pandas(agg)

    # spans of one doc are already co-partitioned (doc_part exchange), but a
    # map_groups output block is not guaranteed to stay one block through the
    # next stage — re-key tiny rollup rows and sum (combiner → small groupby).
    def add_part(batch: pa.Table) -> pa.Table:
        doc = np.asarray(batch["doc_id"])
        with np.errstate(over="ignore"):
            part = ((doc.view(np.uint64) * _MIX) % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("doc_part", pa.array(part, pa.int32()))

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        agg = df.groupby("doc_id", as_index=False, sort=False).agg(
            n_spans=("n_spans", "sum"), dup_tokens=("dup_tokens", "sum")
        )
        return table_from_pandas(agg[["doc_id", "n_spans", "dup_tokens"]])

    return map_copartitioned(
        spans.map_batches(partial, batch_format="pyarrow").map_batches(
            add_part, batch_format="pyarrow"
        ),
        "doc_part",
        final,
    )


_CLEAN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("n_removed", pa.int64()),
        ("cleaned_text", pa.string()),
    ]
)


class _CleanBlock:
    """Per doc-partition: union-join block of doc rows (text) + span rows →
    cleaned token stream per doc. Cleaning is defined over the word-token
    stream (Lee-et-al. ExactSubstr operates on the tokenized text): output
    text is the KEPT tokens joined by single spaces — deterministic and
    SQL-twin-able, independent of inter-token whitespace."""

    def __init__(self, tokenizer: str = "words"):
        self.tok_many = get_batch_tokenizer(tokenizer, 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _CLEAN_SCHEMA.empty_table()
        is_doc = np.asarray(batch["is_doc"])
        docs = batch.filter(pa.array(is_doc))
        if docs.num_rows == 0:
            return _CLEAN_SCHEMA.empty_table()
        spans = batch.filter(pa.array(~is_doc))
        return self.cut(
            np.asarray(docs["doc_id"], dtype=np.int64),
            docs["text"].to_pylist(),
            np.asarray(spans["doc_id"], dtype=np.int64),
            np.asarray(spans["span_start"], dtype=np.int64),
            np.asarray(spans["span_end"], dtype=np.int64),
        )

    def cut(self, ids, texts, s_doc, s_start, s_end) -> pa.Table:
        toks = self.tok_many(texts)
        counts = np.fromiter((len(t) for t in toks), np.int64, len(toks))
        doc_starts = np.r_[0, np.cumsum(counts)]
        n = int(doc_starts[-1])
        # difference-array coverage over the flat token buffer: +1 at each
        # span start, -1 at each span end, cumsum > 0 = covered
        diff = np.zeros(n + 1, np.int64)
        if len(s_doc):
            order = np.argsort(ids, kind="stable")
            pos_s = np.minimum(np.searchsorted(ids, s_doc, sorter=order), len(ids) - 1)
            d_idx = order[pos_s]
            # spans for docs not in this block can't exist (same doc_part
            # exchange) — guard anyway so a bad partition fails loudly
            if not (ids[d_idx] == s_doc).all():
                raise AssertionError("span row without its doc in the co-partitioned block")
            s0 = doc_starts[d_idx] + s_start
            s1 = doc_starts[d_idx] + np.minimum(s_end, counts[d_idx])
            np.add.at(diff, s0, 1)
            np.add.at(diff, s1, -1)
        covered = np.cumsum(diff[:-1]) > 0
        doc_idx = np.repeat(np.arange(len(toks)), counts)
        flat = np.empty(n, object)
        at = 0
        for t in toks:
            flat[at : at + len(t)] = t
            at += len(t)
        kept = ~covered
        joined = (
            pd.Series(flat[kept])
            .groupby(doc_idx[kept])
            .agg(" ".join)
            .reindex(np.arange(len(toks)), fill_value="")
        )
        n_removed = np.zeros(len(toks), np.int64)
        np.add.at(n_removed, doc_idx[covered], 1)
        nz = counts > 0  # zero-token docs have no row (SQL twin parity)
        return pa.table(
            {
                "doc_id": pa.array(ids[nz], pa.int64()),
                "n_tokens": pa.array(counts[nz], pa.int64()),
                "n_removed": pa.array(n_removed[nz], pa.int64()),
                "cleaned_text": pa.array(joined.to_numpy()[nz], pa.string()),
            }
        )


def substring_dedup_clean(
    ds,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer: str = "words",
    num_partitions: int = 64,
    broadcast_limit: int = 2_000_000,
    verify: bool = False,
):
    """Dataset of documents → (doc_id, n_tokens, n_removed, cleaned_text):
    every duplicated >=k-token window removed EXCEPT its canonical (minimum
    (doc_id, pos)) occurrence. The keep-one guarantee is PER K-GRAM: when
    overlapping grams of one repeated passage have canonical occurrences in
    DIFFERENT docs, the cut can carve into every copy and no intact full
    passage survives anywhere — inherent to gram-granularity ExactSubstr
    semantics (the brute-force twin test encodes the same rule), so do not
    rely on passage-level retention downstream. Docs with zero word tokens
    emit nothing. ``verify=True``: see :func:`substring_dedup_spans`.

    Pipeline: gram fingerprints → gram-partition keep-first dup filter →
    per-doc span merge → union-join (doc rows ∪ span rows, one doc-key
    exchange) → vectorized difference-array cut. The join ships span rows
    (24 B each, proportional to corpus duplication) next to the doc text —
    no driver materialization at any step.

    The corpus Dataset is deliberately consumed TWICE (the gram pass and the
    doc-rows side of the cut join): at the 100 TB end, re-reading pruned
    parquet beats pinning the whole corpus in the object store, and both
    consumers stream independently with backpressure."""
    gram = GramStage(k, text_col, id_col, tokenizer, num_partitions, verify=verify)
    occ = map_copartitioned(
        ds.map_batches(gram, batch_format="pandas"),
        "part",
        lambda b: _dup_occurrences(b, num_partitions, keep_first=True),
    )
    spans = map_copartitioned(occ, "doc_part", lambda b: _merge_spans(b, k))

    def doc_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        with np.errstate(over="ignore"):
            part = ((ids.view(np.uint64) * _MIX) % np.uint64(num_partitions)).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pc.cast(batch[text_col], pa.string()),
                "span_start": pa.array(np.full(len(ids), -1), pa.int64()),
                "span_end": pa.array(np.full(len(ids), -1), pa.int64()),
                "doc_part": pa.array(part, pa.int32()),
                "is_doc": pa.array(np.ones(len(ids), bool)),
            }
        )

    def span_rows(batch: pa.Table) -> pa.Table:
        doc = np.asarray(batch["doc_id"], dtype=np.int64)
        with np.errstate(over="ignore"):
            part = ((doc.view(np.uint64) * _MIX) % np.uint64(num_partitions)).astype(np.int32)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": pa.array([None] * len(doc), pa.string()),
                "span_start": batch["span_start"],
                "span_end": batch["span_end"],
                "doc_part": pa.array(part, pa.int32()),
                "is_doc": pa.array(np.zeros(len(doc), bool)),
            }
        )

    spans = spans.materialize()  # rows ∝ corpus duplication; strategy gate
    # same auto strategy pick as line_dedup_global: a small span set
    # broadcasts once and the cut is a plain map (no union, no second sort);
    # duplication-heavy corpora take the doc-key union-join
    n_spans = spans.count()
    if n_spans <= broadcast_limit:
        import ray as _ray

        if n_spans:
            st = spans.to_pandas()
            s_doc = st["doc_id"].to_numpy(np.int64)
            o = np.argsort(s_doc, kind="stable")
            payload = (
                s_doc[o],
                st["span_start"].to_numpy(np.int64)[o],
                st["span_end"].to_numpy(np.int64)[o],
            )
        else:
            # a zero-row sorted dataset can surface schema-less empty blocks
            e = np.empty(0, np.int64)
            payload = (e, e, e)
        spans_ref = _ray.put(payload)
        cleaner = _CleanBlock(tokenizer)

        def clean_broadcast(batch: pa.Table) -> pa.Table:
            import ray as _ray2

            sd, ss, se = _ray2.get(spans_ref)
            ids = np.asarray(batch[id_col], dtype=np.int64)
            lo = np.searchsorted(sd, ids, "left")
            hi = np.searchsorted(sd, ids, "right")
            m = hi - lo
            total = int(m.sum())
            if total:
                first = np.r_[0, np.cumsum(m)][:-1]
                sel = np.repeat(lo, m) + (np.arange(total) - np.repeat(first, m))
                bd = ids[np.repeat(np.arange(len(ids)), m)]
                b0, b1 = ss[sel], se[sel]
            else:
                bd = b0 = b1 = np.empty(0, np.int64)
            return cleaner.cut(ids, batch[text_col].to_pylist(), bd, b0, b1)

        return ds.map_batches(clean_broadcast, batch_format="pyarrow")
    unioned = ds.map_batches(doc_rows, batch_format="pyarrow").union(
        spans.map_batches(span_rows, batch_format="pyarrow")
    )
    return map_copartitioned(unioned, "doc_part", _CleanBlock(tokenizer))
