"""Text-analysis stages (training-data curation over the ``documents`` table).

All stages are map_batches callables; the stats kernel is pandas/C-vectorized
(functions/text_stats.py documents the SQL-parity contract for the oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.text_stats import doc_fingerprint_batch, lang_id_batch, quality_stats_frame


class TextStatsStage:
    """Adds n_chars/n_tokens/char-class counts + quality ratios."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        stats = quality_stats_frame(batch[self.text_col])
        for c in stats.columns:
            batch[c] = stats[c].to_numpy()
        return batch


class LangIdStage:
    """Adds ``lang_pred`` via the deterministic stopword-voting heuristic."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["lang_pred"] = lang_id_batch(batch[self.text_col])
        return batch


class FingerprintStage:
    """Adds ``fingerprint`` (winnowing-style min rolling hash, int64)."""

    def __init__(self, text_col: str = "text", k: int = 8):
        self.text_col = text_col
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["fingerprint"] = doc_fingerprint_batch(batch[self.text_col], self.k)
        return batch


def quality_filter(batch: pa.Table, min_tokens: int = 5, max_punct_ratio: float = 0.3) -> pa.Table:
    """Vectorized Arrow-side quality gate (example curation filter)."""
    import pyarrow.compute as pc

    ok = pc.and_(
        pc.greater_equal(batch["n_tokens"], min_tokens),
        pc.less_equal(batch["punct_ratio"], max_punct_ratio),
    )
    return batch.filter(ok)


def shingle_hash_sets(texts: list[str | None], tokenizer: str = "words", shingle_n: int = 3):
    """Sorted-unique murmur3 shingle-hash set per doc, as (flat uint64 values,
    bounds) — the shared kernel behind ShingleSetStage (stages/lsh.py) and
    DecontaminateStage. Hashing runs once per distinct shingle in the batch."""
    from ..functions.murmur3 import hash_tokens_many_seeds, seeds_u64
    from ..functions.tokenize import get_batch_tokenizer

    tok_many = get_batch_tokenizer(tokenizer, shingle_n)
    toks = tok_many(texts)
    flat: list[str] = []
    bounds = [0]
    for t in toks:
        flat.extend(t)
        bounds.append(len(flat))
    sets: list[np.ndarray] = []
    if flat:
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object), sort=False)
        H = hash_tokens_many_seeds(list(uniques), seeds_u64(0, 1))[:, 0]
        for d in range(len(toks)):
            lo, hi = bounds[d], bounds[d + 1]
            sets.append(np.unique(H[codes[lo:hi]]) if lo != hi else np.empty(0, np.int64))
    else:
        sets = [np.empty(0, np.int64) for _ in toks]
    return sets


def reference_shingles(texts: list[str | None], tokenizer: str = "words", shingle_n: int = 3) -> np.ndarray:
    """Sorted-unique shingle hashes of a (small) reference/eval corpus — the
    broadcast side of decontamination. Ship via ``ray.put`` once per job."""
    sets = shingle_hash_sets(texts, tokenizer, shingle_n)
    return np.unique(np.concatenate(sets)) if sets else np.empty(0, np.int64)


class DecontaminateStage:
    """map_batches callable scoring train/test contamination: fraction of a
    doc's n-gram shingles that appear in a broadcast reference ('test') set —
    the standard eval-decontamination op for LLM training corpora.

    Scale design: the reference set is small by definition (an eval set) —
    sorted uint64 hashes shipped ONCE via ``ray.put`` and looked up with a
    vectorized searchsorted per batch; the training side streams. Adds
    ``overlap`` (float64, exact fraction) and ``contaminated``
    (overlap >= threshold). Docs with an empty shingle set get overlap 0.0.
    """

    def __init__(
        self,
        ref,
        text_col: str = "text",
        tokenizer: str = "words",
        shingle_n: int = 3,
        threshold: float = 0.5,
    ):
        import ray

        self.ref = ray.get(ref) if not isinstance(ref, np.ndarray) else ref
        self.text_col = text_col
        self.tokenizer = tokenizer
        self.shingle_n = shingle_n
        self.threshold = threshold

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sets = shingle_hash_sets(
            list(batch[self.text_col]), self.tokenizer, self.shingle_n
        )
        ref = self.ref
        lens = np.fromiter((len(s) for s in sets), np.int64, len(sets))
        overlap = np.zeros(len(sets), np.float64)
        nz = lens > 0
        if len(ref) and nz.any():
            # ONE flat searchsorted over the batch's concatenated shingle
            # hashes + per-doc hit sums via reduceat (segments are contiguous
            # because empty docs occupy no space in the flat buffer)
            flat = np.concatenate([s for s in sets if len(s)])
            pos = np.searchsorted(ref, flat)
            pos[pos == len(ref)] = len(ref) - 1
            hit = (ref[pos] == flat).astype(np.int64)
            starts = np.r_[0, np.cumsum(lens)][:-1][nz]
            overlap[nz] = np.add.reduceat(hit, starts) / lens[nz]
        batch["n_shingles"] = lens
        batch["overlap"] = overlap
        batch["contaminated"] = overlap >= self.threshold
        return batch


def token_df_topk(ds, k: int = 200, text_col: str = "text"):
    """Distributed token document-frequency (the IDF table builder): per-batch
    combiner (distinct tokens per doc → partial df counts) → groupby(token)
    sum → total-order top-k (df desc, token asc — deterministic under ties).

    Scale: the exchange carries one row per distinct token per block, not per
    occurrence; the final sort runs over distinct tokens only."""
    import re

    word_re = re.compile(r"[0-9A-Za-z_]+")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # set()+Counter per doc, NOT the factorize+bincount pattern of
        # lang_id_batch: measured on sf0.1 (3 reps, 32 cpus) the flat
        # factorize + lexsort-dedup + bincount rewrite is ~15% SLOWER
        # (best 0.50 s vs 0.43 s) — with ~200-token docs the per-doc set
        # and Counter.update are C-speed and skip materializing/sorting
        # the full token-multiplicity stream. The loop is over DOCS (rows
        # of a wide combiner), not tokens.
        from collections import Counter

        c: Counter = Counter()
        for t in batch[text_col]:
            c.update(set(word_re.findall(t or "")))
        return pd.DataFrame({"token": list(c.keys()), "df": np.fromiter(c.values(), np.int64, len(c))})

    def final(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("token", as_index=False, sort=False)["df"].sum()

    from ..grouping import map_copartitioned

    return (
        map_copartitioned(
            ds.map_batches(partial, batch_format="pandas"), "token", final, batch_format="pandas"
        )
        .sort(["df", "token"], descending=[True, False])
        .limit(k)
    )


def line_dedup_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Intra-document repetition stats — the standard 'repetitive doc'
    curation signal: per doc, the number of lines and of DISTINCT lines
    (empty split segments count, matching SQL string_split semantics).
    Embarrassingly parallel map_batches; no shuffle."""

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        # per-doc split+set, kept over the factorize+lexsort+bincount
        # rewrite: measured on sf0.1 (3 reps) the vectorized version is
        # ~12% slower (best 0.174 s vs 0.154 s) — str.split/set are
        # C-speed per doc and avoid flattening+sorting every line
        n_lines = np.empty(len(batch), np.int64)
        n_unique = np.empty(len(batch), np.int64)
        for i, t in enumerate(batch[text_col]):
            parts = (t or "").split("\n")
            n_lines[i] = len(parts)
            n_unique[i] = len(set(parts))
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "n_lines": n_lines,
                "n_unique_lines": n_unique,
            }
        )

    return ds.map_batches(stats, batch_format="pandas")


_LINE_MIX = np.uint64(0x9E3779B97F4A7C15)


def line_dedup_global(
    ds,
    min_dup: int = 2,
    min_len: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
    broadcast_limit: int = 2_000_000,
):
    """Cross-document line deduplication — the MassiveText/RefinedWeb-style
    boilerplate filter: every line occurring >= ``min_dup`` times CORPUS-WIDE
    (exact string match, 64-bit murmur3 fingerprints — a collision can only
    over-remove, conservative for curation) is removed from EVERY document
    (unlike :func:`substring_dedup_clean`, boilerplate keeps no canonical
    copy). Lines shorter than ``min_len`` chars never participate (an empty
    line duplicates everywhere; removing it would destroy formatting).

    Output per doc: (doc_id, n_lines, n_removed, cleaned_text) with kept
    lines re-joined by newline. Every doc emits a row ('' splits to one
    empty line, matching SQL string_split semantics).

    Scale shape: one ~20 B/line-occurrence int32-key exchange for the global
    count (the same sufficient-statistic bound as substring dedup), then the
    surviving (doc, line_no) rows — proportional to corpus boilerplate —
    union-join back to the docs on one doc-key exchange. No driver pulls.
    The corpus Dataset is deliberately consumed twice (line pass + cut
    join): at 100 TB, re-reading pruned parquet beats materializing the
    corpus in the object store; both consumers stream with backpressure.
    When the surviving hit set is small (<= ``broadcast_limit`` rows, ~32 MB)
    it broadcasts once via ray.put instead and the cut is a plain map —
    no union, no second sort (auto strategy pick, like the embedding-LSH
    join)."""
    import pyarrow as pa

    from ..functions.murmur3 import hash_tokens_many_seeds, seeds_u64
    from ..grouping import map_copartitioned

    seeds = seeds_u64(0, 1)
    occ_schema = pa.schema(
        [("line_hash", pa.int64()), ("doc_id", pa.int64()), ("line_no", pa.int64()), ("part", pa.int32())]
    )
    hit_schema = pa.schema(
        [("doc_id", pa.int64()), ("line_no", pa.int64()), ("doc_part", pa.int32())]
    )
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_lines", pa.int64()),
            ("n_removed", pa.int64()),
            ("cleaned_text", pa.string()),
        ]
    )

    def line_rows(batch: pd.DataFrame) -> pa.Table:
        ids = batch[id_col].to_numpy()
        lines_per_doc = [(t or "").split("\n") for t in batch[text_col]]
        counts = np.fromiter((len(ls) for ls in lines_per_doc), np.int64, len(lines_per_doc))
        flat: list[str] = []
        for ls in lines_per_doc:
            flat.extend(ls)
        lens = np.fromiter((len(s) for s in flat), np.int64, len(flat))
        elig = lens >= min_len
        if not elig.any():
            return occ_schema.empty_table()
        doc_idx = np.repeat(np.arange(len(ids)), counts)
        starts = np.r_[0, np.cumsum(counts)][:-1]
        pos = np.arange(len(flat)) - starts[doc_idx]
        sub = [flat[i] for i in np.flatnonzero(elig)]
        codes, uniques = pd.factorize(np.asarray(sub, dtype=object), sort=False)
        h = hash_tokens_many_seeds(list(uniques), seeds)[:, 0][codes]
        with np.errstate(over="ignore"):
            part = ((h.view(np.uint64) * _LINE_MIX) % np.uint64(num_partitions)).astype(np.int32)
        return pa.table(
            {
                "line_hash": pa.array(h, pa.int64()),
                "doc_id": pa.array(ids[doc_idx[elig]], pa.int64()),
                "line_no": pa.array(pos[elig], pa.int64()),
                "part": pa.array(part, pa.int32()),
            }
        )

    def dup_hits(batch: pa.Table) -> pa.Table:
        h = np.asarray(batch["line_hash"])
        if len(h) == 0:
            return hit_schema.empty_table()
        order = np.argsort(h, kind="stable")
        hs = h[order]
        starts = np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
        counts = np.diff(np.r_[starts, len(hs)])
        keep = order[np.repeat(counts >= min_dup, counts)]
        if len(keep) == 0:
            return hit_schema.empty_table()
        doc = np.asarray(batch["doc_id"])[keep]
        with np.errstate(over="ignore"):
            part = ((doc.view(np.uint64) * _LINE_MIX) % np.uint64(num_partitions)).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "line_no": pa.array(np.asarray(batch["line_no"])[keep], pa.int64()),
                "doc_part": pa.array(part, pa.int32()),
            }
        )

    def doc_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = np.asarray(batch[id_col], dtype=np.int64)
        with np.errstate(over="ignore"):
            part = ((ids.view(np.uint64) * _LINE_MIX) % np.uint64(num_partitions)).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pc.cast(batch[text_col], pa.string()),
                "line_no": pa.array(np.full(len(ids), -1), pa.int64()),
                "doc_part": pa.array(part, pa.int32()),
                "is_doc": pa.array(np.ones(len(ids), bool)),
            }
        )

    def hit_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": pa.array([None] * n, pa.string()),
                "line_no": batch["line_no"],
                "doc_part": batch["doc_part"],
                "is_doc": pa.array(np.zeros(n, bool)),
            }
        )

    def _cut(ids: np.ndarray, texts: list, h_doc: np.ndarray, h_line: np.ndarray) -> pa.Table:
        """Shared cut kernel: docs (ids, texts) + hit (doc, line_no) pairs →
        output rows. Raises if a hit references a doc not present."""
        lines_per_doc = [(t or "").split("\n") for t in texts]
        counts = np.fromiter((len(ls) for ls in lines_per_doc), np.int64, len(lines_per_doc))
        doc_starts = np.r_[0, np.cumsum(counts)]
        n = int(doc_starts[-1])
        removed = np.zeros(n, bool)
        if len(h_doc):
            order = np.argsort(ids, kind="stable")
            pos_s = np.minimum(np.searchsorted(ids, h_doc, sorter=order), len(ids) - 1)
            d_idx = order[pos_s]
            if not (ids[d_idx] == h_doc).all():
                raise AssertionError("line hit without its doc in the block")
            removed[doc_starts[d_idx] + h_line] = True
        doc_idx = np.repeat(np.arange(len(ids)), counts)
        flat = np.empty(n, object)
        at = 0
        for ls in lines_per_doc:
            flat[at : at + len(ls)] = ls
            at += len(ls)
        kept = ~removed
        joined = (
            pd.Series(flat[kept])
            .groupby(doc_idx[kept])
            .agg("\n".join)
            .reindex(np.arange(len(ids)), fill_value="")
        )
        n_removed = np.zeros(len(ids), np.int64)
        np.add.at(n_removed, doc_idx[removed], 1)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_lines": pa.array(counts, pa.int64()),
                "n_removed": pa.array(n_removed, pa.int64()),
                "cleaned_text": pa.array(joined.to_numpy(), pa.string()),
            }
        )

    def clean_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        is_doc = np.asarray(batch["is_doc"])
        docs = batch.filter(pa.array(is_doc))
        if docs.num_rows == 0:
            return out_schema.empty_table()
        hits = batch.filter(pa.array(~is_doc))
        return _cut(
            np.asarray(docs["doc_id"], dtype=np.int64),
            docs["text"].to_pylist(),
            np.asarray(hits["doc_id"], dtype=np.int64),
            np.asarray(hits["line_no"], dtype=np.int64),
        )

    hits = map_copartitioned(
        ds.map_batches(line_rows, batch_format="pandas"), "part", dup_hits
    ).materialize()  # rows ∝ corpus boilerplate; needed to pick the join strategy
    # strategy pick (same auto-gate pattern as the embedding-LSH join): a
    # SMALL hit set broadcasts once via ray.put and the cut becomes a plain
    # map over the docs — skipping the union + second sort exchange; a large
    # one (boilerplate-heavy corpora) takes the doc-key union-join, which
    # never ships more than the hits + one copy of the text
    n_hits = hits.count()
    if n_hits <= broadcast_limit:
        import ray as _ray

        if n_hits:
            ht = hits.select_columns(["doc_id", "line_no"]).to_pandas()
            h_doc = ht["doc_id"].to_numpy(np.int64)
            h_line = ht["line_no"].to_numpy(np.int64)
            o = np.argsort(h_doc, kind="stable")
            payload = (h_doc[o], h_line[o])
        else:
            # a zero-row sorted dataset can surface schema-less empty blocks
            e = np.empty(0, np.int64)
            payload = (e, e)
        hits_ref = _ray.put(payload)

        def clean_broadcast(batch: pa.Table) -> pa.Table:
            import ray as _ray2

            hd, hl = _ray2.get(hits_ref)
            ids = np.asarray(batch[id_col], dtype=np.int64)
            lo = np.searchsorted(hd, ids, "left")
            hi = np.searchsorted(hd, ids, "right")
            m = hi - lo
            total = int(m.sum())
            if total:
                first = np.r_[0, np.cumsum(m)][:-1]
                within = np.arange(total) - np.repeat(first, m)
                sel = np.repeat(lo, m) + within
                bh_doc, bh_line = ids[np.repeat(np.arange(len(ids)), m)], hl[sel]
            else:
                bh_doc = bh_line = np.empty(0, np.int64)
            return _cut(ids, batch[text_col].to_pylist(), bh_doc, bh_line)

        return ds.map_batches(clean_broadcast, batch_format="pyarrow")
    unioned = ds.map_batches(doc_rows, batch_format="pyarrow").union(
        hits.map_batches(hit_rows, batch_format="pyarrow")
    )
    return map_copartitioned(unioned, "doc_part", clean_block)


class PIIScrubStage:
    """Redact PII-shaped spans (emails, IPv4) from text — the standard
    pre-training scrub pass. pandas C regex kernels (str.count/str.replace),
    patterns compiled once per actor.

    SQL-parity contract (oracle-checked): the patterns are RE2-compatible
    (no backrefs/lookaround) and applied as a CHAIN — emails first, then
    IPv4 over the email-scrubbed text; ``n_redactions`` counts each pattern
    at its stage of the chain, exactly like nested
    ``regexp_replace(..., 'g')`` in DuckDB."""

    EMAIL = r"[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\.[A-Za-z0-9-.]+"
    IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self._email = re.compile(self.EMAIL)
        self._ip = re.compile(self.IPV4)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        n_email = s.str.count(self._email)
        s1 = s.str.replace(self._email, "<EMAIL>", regex=True)
        n_ip = s1.str.count(self._ip)
        batch["scrubbed_text"] = s1.str.replace(self._ip, "<IP>", regex=True)
        batch["n_redactions"] = (n_email + n_ip).to_numpy(np.int64)
        return batch


def pack_sequences(ds, budget: int = 2048, num_partitions: int = 8,
                   text_col: str = "text", id_col: str = "doc_id"):
    """Sequence-packing assignment (the training-prep step that concatenates
    docs into fixed token-budget sequences): docs are hash-partitioned
    (``doc_id % num_partitions`` — SQL-twin-able), ordered by doc_id within
    the partition, and assigned ``pack_id = floor(preceding_token_sum /
    budget)`` — i.e. the sequence its FIRST token lands in when the
    partition's docs are concatenated and split every ``budget`` tokens.

    Scale shape: the cumulative sum is inherently sequential ONLY within a
    partition; partitions pack in parallel (one keyed exchange), which is
    how distributed packing is actually run — each worker packs its shard.
    Deterministic: assignment is a pure function of (doc_id order, token
    counts), so resume/reshard-stable. Output: (doc_id, part, n_tokens,
    pack_id)."""
    import re

    from ..grouping import map_copartitioned

    word_re = re.compile(r"[0-9A-Za-z_]+")

    def count_tokens(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(np.int64)
        return pd.DataFrame(
            {
                id_col: ids,
                "part": ids % num_partitions,
                "n_tokens": batch[text_col].fillna("").str.count(word_re).to_numpy(np.int64),
            }
        )

    def assign(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "pack_id": pa.array([], pa.int64()),
                }
            )
        # a co-partitioned block can hold SEVERAL part keys — cumsum per part
        df = block.to_pandas().sort_values(["part", id_col])
        pre = df.groupby("part")["n_tokens"].cumsum() - df["n_tokens"]
        df["pack_id"] = (pre // budget).astype(np.int64)
        return pa.Table.from_pandas(df[[id_col, "part", "n_tokens", "pack_id"]], preserve_index=False)

    return map_copartitioned(
        ds.map_batches(count_tokens, batch_format="pandas"), "part", assign
    )


def oov_rate(ds, vocab_k: int = 200, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc out-of-vocabulary rate against the corpus's own top-``vocab_k``
    token vocabulary — the tokenizer-health / domain-shift signal (a doc
    whose words mostly fall outside the corpus head is noise or from
    another distribution).

    Pass 1: per-block token-count combiner → one token-keyed exchange →
    per-block (count desc, token asc) head-K → driver merge of ≤ K·blocks
    rows (the top-K pigeonhole: any global top-K token is in its block's
    top-K) → broadcast SET via ray.put. Deterministic under count ties
    (token asc on both engines). Pass 2: streaming per-doc membership —
    sorted-vocab searchsorted, one integer divide per doc. Zero-token docs
    emit nothing. Output: (doc_id, n_tokens, n_oov, oov_rate[9dp])."""
    import re
    from itertools import chain

    import ray

    from ..grouping import map_copartitioned

    word_re = re.compile(r"[0-9A-Za-z_]+")

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.findall(word_re)
        total = int(toks.str.len().sum())
        if total == 0:
            return pd.DataFrame(
                {"token": pd.Series([], dtype=object),
                 "cnt": pd.Series([], dtype=np.int64),
                 "tkey": pd.Series([], dtype=np.int64)}
            )
        flat = np.fromiter(chain.from_iterable(toks), dtype=object, count=total)
        uniq, c = np.unique(flat, return_counts=True)
        out = pd.DataFrame({"token": uniq, "cnt": c.astype(np.int64)})
        out["tkey"] = pd.util.hash_array(out["token"].to_numpy(object)).view(np.int64)
        return out

    def head_k(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return block.drop(columns=["tkey"], errors="ignore")
        m = block.groupby("token", sort=False, as_index=False)["cnt"].sum()
        m = m.sort_values(["cnt", "token"], ascending=[False, True], kind="mergesort")
        return m.head(vocab_k)

    cand = map_copartitioned(
        ds.map_batches(counts, batch_format="pandas"), "tkey", head_k,
        batch_format="pandas",
    ).to_pandas()
    cand = cand.sort_values(["cnt", "token"], ascending=[False, True], kind="mergesort")
    vocab = np.sort(cand["token"].head(vocab_k).to_numpy(object).astype(str))
    vocab_ref = ray.put(vocab)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(vocab_ref)
        toks = batch[text_col].fillna("").str.findall(word_re)
        n = toks.str.len().to_numpy(np.int64)
        total = int(n.sum())
        if total == 0:
            return pd.DataFrame(
                {id_col: np.empty(0, np.int64),
                 "n_tokens": np.empty(0, np.int64),
                 "n_oov": np.empty(0, np.int64),
                 "oov_rate": np.empty(0, np.float64)}
            )
        # fixed width W+1 where W = longest vocab token: members are
        # unaffected, and any longer token keeps > W chars so truncation
        # can never fold it ONTO a vocab entry
        w = (v.dtype.itemsize // 4) + 1
        flat = np.fromiter(chain.from_iterable(toks), dtype=f"U{w}", count=total)
        idx = np.searchsorted(v.astype(f"U{w}"), flat)
        inv = (idx < len(v)) & (v[np.minimum(idx, len(v) - 1)] == flat)
        doc_idx = np.repeat(np.arange(len(n), dtype=np.int64), n)
        oov = np.bincount(doc_idx, weights=~inv, minlength=len(n)).astype(np.int64)
        nz = n > 0
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy(np.int64)[nz],
             "n_tokens": n[nz], "n_oov": oov[nz],
             "oov_rate": np.round(oov[nz] / n[nz].astype(np.float64), 9)}
        )

    return ds.map_batches(score, batch_format="pandas")


def unigram_surprisal(ds, text_col: str = "text", id_col: str = "doc_id",
                      vocab_limit: int | None = 1_000_000):
    """Mean unigram surprisal per doc — the cheap 'LM-quality' scoring signal
    (gibberish / boilerplate scores high or low vs the corpus distribution;
    the standard stand-in where a perplexity model isn't available).

    Two passes over the corpus:
    1. corpus-wide token OCCURRENCE counts: per-block combiner (Counter) →
       one token-keyed exchange. With ``vocab_limit`` (the 100-TB shape:
       the head of a Zipf vocabulary carries ~all occurrence mass) the
       top-K selection is DISTRIBUTED — the grouped count table never
       leaves the cluster; ``total`` comes from a scalar aggregate and
       only the K (count desc, token asc — deterministic under ties) head
       rows reach the driver for the ray.put broadcast. Out-of-vocab
       tokens get a count floor of 1; the DEFAULT is a 1M-token head so no
       call path pulls an unbounded vocab unless explicitly asked.
       ``vocab_limit=None`` pulls and broadcasts the FULL vocabulary —
       every doc token is then in-vocab by construction (counted from the
       same corpus), which is the SQL-twin-exact mode; opt in only where
       the vocab fits the driver.
    2. streaming score map: per doc, mean over token occurrences of
       ``-ln(count(token) / total_tokens)``; zero-token docs emit nothing.

    Output: (doc_id, n_tokens, surprisal[9dp])."""
    import re
    from collections import Counter
    from itertools import chain

    import ray

    word_re = re.compile(r"[0-9A-Za-z_]+")

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in batch[text_col]:
            c.update(word_re.findall(t or ""))
        return pd.DataFrame(
            {"token": list(c.keys()), "c": np.fromiter(c.values(), np.int64, len(c))}
        )

    partials = ds.map_batches(partial_counts, batch_format="pandas")
    if vocab_limit is None:
        counts = partials.groupby("token").sum("c").to_pandas()
        col = "sum(c)" if "sum(c)" in counts.columns else "c"
        total = int(counts[col].sum())
        vocab = dict(zip(counts["token"], counts[col].astype(int)))
    else:
        # distributed top-K (token_df_topk shape): grouped counts stay on the
        # cluster; the sort runs over distinct tokens only
        from ..grouping import map_copartitioned

        def final_sum(b: pd.DataFrame) -> pd.DataFrame:
            return b.groupby("token", as_index=False, sort=False)["c"].sum()

        grouped = map_copartitioned(
            partials, "token", final_sum, batch_format="pandas"
        ).materialize()
        total = int(grouped.sum("c"))
        top = (
            grouped.sort(["c", "token"], descending=[True, False])
            .limit(vocab_limit)
            .to_pandas()
        )
        vocab = dict(zip(top["token"], top["c"].astype(int)))
    ref = ray.put((vocab, total))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        voc, tot = ray.get(ref)
        toks = batch[text_col].fillna("").str.findall(word_re)
        n = toks.str.len().to_numpy(np.int64)
        flat_total = int(n.sum())
        ids = batch[id_col].to_numpy(np.int64)
        if flat_total == 0:
            return pd.DataFrame(
                {id_col: ids[:0], "n_tokens": n[:0], "surprisal": np.empty(0, np.float64)}
            )
        flat = np.fromiter(chain.from_iterable(toks), dtype=object, count=flat_total)
        codes, uniques = pd.factorize(flat, sort=False)
        cvals = np.fromiter((voc.get(u, 1) for u in uniques), np.float64, len(uniques))
        per_tok = -np.log(cvals / tot)
        doc_idx = np.repeat(np.arange(len(ids)), n)
        sums = np.bincount(doc_idx, weights=per_tok[codes], minlength=len(ids))
        nz = n > 0
        return pd.DataFrame(
            {
                id_col: ids[nz],
                "n_tokens": n[nz],
                "surprisal": np.round(sums[nz] / n[nz], 9),
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def tfidf_topk(ds, k: int = 5, text_col: str = "text", id_col: str = "doc_id",
               n_docs: int | None = None):
    """Per-doc top-``k`` TF-IDF terms — the standard keyword-extraction /
    doc-representation operator over a curated corpus.

    Fully distributed, no broadcast table (TF-IDF keyword extraction wants
    the RARE tail of the vocabulary, so a top-V vocab broadcast — the
    unigram_surprisal shape — would be wrong here). Dataflow:

    1. per-batch combiner: distinct ``(doc, token, tf)`` rows (each doc lives
       in one input row, so rows are globally unique by construction);
    2. exchange keyed by an int64 token hash (cheaper to sort than the
       string; collisions only co-locate, see tf_rows): df(token) = row
       count of the token within its block (``map_copartitioned`` co-locates
       every row of a token), idf attached in place — no join;
    3. exchange keyed by doc: rank by (rounded score desc, token asc), keep
       the top ``k`` per doc.

    Both exchanges carry the distinct (doc, token) stream (~tens of bytes a
    row), not token occurrences. ``n_docs`` (the N in idf = ln(N/df)) is
    taken from ``ds.count()`` when not given — metadata-only for parquet
    reads. Scores are rounded to 9dp BEFORE ranking so the ordering is
    engine-portable (ties broken by token); output
    (doc_id, token, tf, df, score)."""
    import re

    from ..grouping import map_copartitioned

    word_re = re.compile(r"[0-9A-Za-z_]+")
    if n_docs is None:
        n_docs = ds.count()
    n_docs_f = float(n_docs)

    def tf_rows(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.findall(word_re)
        n = toks.str.len().to_numpy(np.int64)
        flat = np.fromiter(
            (t for lst in toks for t in lst), dtype=object, count=int(n.sum())
        )
        ids = np.repeat(batch[id_col].to_numpy(np.int64), n)
        df = pd.DataFrame({id_col: ids, "token": flat})
        out = df.groupby([id_col, "token"], sort=False, as_index=False).size()
        out = out.rename(columns={"size": "tf"}).astype({"tf": np.int64})
        # exchange key: deterministic 64-bit siphash of the token, NOT the
        # string itself — the range-partition sort only needs every row of a
        # token CO-LOCATED, not token-ordered; fixed 8-byte keys keep range
        # boundaries and comparisons cheap where variable-length strings
        # would not. Measured at sf0.1 (5k docs, warm session) the two are
        # a tie (0.54 s string vs 0.48-0.6 s hashed) — the key choice is for
        # the distinct-token-table scale, not this corpus. A tkey collision
        # merely co-locates two token groups in one block; attach_idf groups
        # by the string internally, so df stays per-token exact.
        out["tkey"] = pd.util.hash_array(out["token"].to_numpy(object)).view(np.int64)
        return out

    def attach_idf(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.drop(columns=["tkey"])
        if not len(batch):
            return batch.assign(df=np.empty(0, np.int64), score=np.empty(0, np.float64))
        dfc = batch.groupby("token", sort=False)["token"].transform("size")
        batch = batch.assign(df=dfc.to_numpy(np.int64))
        batch["score"] = np.round(
            batch["tf"].to_numpy(np.float64) * np.log(n_docs_f / batch["df"].to_numpy(np.float64)),
            9,
        )
        return batch

    def per_doc_topk(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch
        batch = batch.sort_values(
            [id_col, "score", "token"], ascending=[True, False, True], kind="mergesort"
        )
        return batch.groupby(id_col, sort=False).head(k).reset_index(drop=True)

    tf = ds.map_batches(tf_rows, batch_format="pandas")
    with_idf = map_copartitioned(tf, "tkey", attach_idf, batch_format="pandas")
    return map_copartitioned(with_idf, id_col, per_doc_topk, batch_format="pandas")


def profile_columns(ds, columns: list[str]):
    """Schema-quality profile for the named columns: (column, n_rows,
    n_nulls, n_distinct) — the ingest sanity report (a silently-null or
    near-constant column is a broken upstream). Per block the listed
    columns MELT to (column, value-as-string, null flag) distinct-pair
    partials with counts, so ONE column-keyed exchange serves every column
    at once; exchange rows ∝ Σ distinct values per column per block —
    profile exchange-sized columns directly (categoricals, enums, langs)
    and pre-hash unbounded ones (text → sha) before calling."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in columns:
            s = batch[c]
            n_null = int(s.isna().sum())
            vals = s.dropna().astype(str)
            vc = vals.value_counts()
            frames.append(pd.DataFrame(
                {"column": c, "value": vc.index.to_numpy(object),
                 "cnt": vc.to_numpy(np.int64), "nulls": np.int64(0)}
            ))
            frames.append(pd.DataFrame(
                {"column": [c], "value": [None], "cnt": [np.int64(0)],
                 "nulls": [np.int64(n_null)]}
            ))
        return pd.concat(frames, ignore_index=True)

    def final(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return pd.DataFrame(
                {"column": pd.Series([], dtype=object),
                 "n_rows": pd.Series([], dtype=np.int64),
                 "n_nulls": pd.Series([], dtype=np.int64),
                 "n_distinct": pd.Series([], dtype=np.int64)}
            )
        rows = []
        for c, sub in block.groupby("column", sort=True):
            vals = sub[sub["value"].notna()]
            n_nulls = int(sub["nulls"].sum())
            n_vals = int(vals["cnt"].sum())
            rows.append((c, n_vals + n_nulls, n_nulls, vals["value"].nunique()))
        return pd.DataFrame(
            rows, columns=["column", "n_rows", "n_nulls", "n_distinct"]
        ).astype({"n_rows": np.int64, "n_nulls": np.int64, "n_distinct": np.int64})

    from ..grouping import map_copartitioned

    return map_copartitioned(
        ds.map_batches(partial, batch_format="pandas"), "column", final,
        batch_format="pandas",
    )


def chunk_documents(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    width: int = 120,
    stride: int | None = None,
):
    """Document chunking — fixed ``width``-codepoint windows starting every
    ``stride`` codepoints (stride < width ⇒ overlapping RAG-style windows;
    default stride = width ⇒ a partition, the exact inverse of
    :func:`assemble_chunks`). Map-only fan-out; chunk count per doc is
    ``ceil(len/stride)`` with the final window truncated at the text end —
    a window's start must lie inside the text, so empty docs emit nothing.
    Output: (id, pos, chunk) with pos the 0-based window ordinal."""
    stride = width if stride is None else stride
    if stride <= 0 or width <= 0:
        raise ValueError("width and stride must be positive")

    def fan_out(batch: pd.DataFrame) -> pd.DataFrame:
        ids_in = batch[id_col].to_numpy(np.int64)
        texts = batch[text_col].fillna("").to_numpy(object)
        ids, poss, parts = [], [], []
        for i, t in zip(ids_in, texts):
            for k, p in enumerate(range(0, len(t), stride)):
                ids.append(i)
                poss.append(k)
                parts.append(t[p : p + width])
        return pd.DataFrame(
            {id_col: np.asarray(ids, np.int64),
             "pos": np.asarray(poss, np.int64),
             "chunk": pd.Series(parts, dtype=object)}
        )

    return ds.map_batches(fan_out, batch_format="pandas")


def assemble_chunks(
    ds,
    id_col: str = "doc_id",
    pos_col: str = "pos",
    text_col: str = "chunk",
    sep: str = "",
):
    """Ordered per-group string reassembly — SQL's ``string_agg(chunk, sep
    ORDER BY pos)``, the inverse of document chunking: after chunk-level
    processing (embedding, scoring, scrubbing) the pipeline stitches
    documents back together. Ray Data has no ordered-concat aggregate; the
    shape is the usual ONE id-keyed exchange + in-block lexsort, then ONE
    vectorized join per block: chunks group contiguously after the sort, so
    ``np.add.reduceat``-style assembly reduces to a single Python-level
    ''.join per GROUP (strings defeat numpy here; the per-group join is
    C-speed inside str.join). Duplicate (id, pos) pairs raise — silent
    double-concat corrupts documents. Output: (id, n_chunks, text)."""

    def build(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return pd.DataFrame(
                {id_col: np.empty(0, np.int64),
                 "n_chunks": np.empty(0, np.int64),
                 "text": pd.Series([], dtype=object)}
            )
        block = block.sort_values([id_col, pos_col], kind="stable")
        ids = block[id_col].to_numpy(np.int64)
        pos = block[pos_col].to_numpy(np.int64)
        same = ids[1:] == ids[:-1]
        if np.any(same & (pos[1:] == pos[:-1])):
            raise ValueError(
                f"duplicate ({id_col}, {pos_col}) chunk — refusing to "
                "double-concatenate"
            )
        chunks = block[text_col].fillna("").to_numpy(object)
        starts = np.flatnonzero(np.r_[True, ~same])
        ends = np.r_[starts[1:], len(ids)]
        return pd.DataFrame(
            {
                id_col: ids[starts],
                "n_chunks": (ends - starts).astype(np.int64),
                "text": [sep.join(chunks[s:e]) for s, e in zip(starts, ends)],
            }
        )

    from ..grouping import map_copartitioned

    return map_copartitioned(ds, id_col, build, batch_format="pandas")


def char_entropy_values(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(per-row 9dp-rounded char entropy, nonzero-length mask) for a text
    Series — the shared kernel behind :func:`char_entropy` and the
    curation_pipeline_v5 gate. Entropy of zero-length rows is 0.0 with the
    mask False (callers decide drop-vs-keep)."""
    texts = texts.fillna("")
    lens = texts.str.len().to_numpy(np.int64)
    ent = np.zeros(len(lens), np.float64)
    nz = lens > 0
    total = int(lens.sum())
    if total == 0:
        return ent, nz
    blob = "".join(texts.tolist())
    cp = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    uniq, cnts = np.unique(doc_idx * (1 << 21) + cp, return_counts=True)
    s = np.zeros(len(lens), np.float64)
    c = cnts.astype(np.float64)
    np.add.at(s, uniq >> 21, c * np.log(c))
    n = lens[nz].astype(np.float64)
    ent[nz] = np.round(np.log(n) - s[nz] / n, 9)
    return ent, nz


def char_entropy(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document character-distribution Shannon entropy (nats) — the
    cheap gibberish/boilerplate quality signal (keyboard mash and repeated
    padding score low, natural prose ~3-4 nats). Map-only and fully
    vectorized: the batch's texts concatenate into ONE UTF-32 codepoint
    buffer (``str.len`` counts codepoints, so doc offsets align exactly),
    per-(doc, char) counts come from a single ``np.unique`` over
    ``doc_idx·2^21 + codepoint`` packed keys (codepoints < 0x110000 < 2^21),
    and entropy uses the sum-stable form ``ln(n) − Σ c·ln(c)/n``. Empty /
    null docs emit no row (the SQL twin's empty-split filter). Round-9
    output; the Σ term's float addition ORDER differs from a SQL engine's
    group sum, so agreement is at-round-9, same contract as
    unigram_surprisal."""

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        ent, nz = char_entropy_values(batch[text_col])
        ids = batch[id_col].to_numpy(np.int64)
        return pd.DataFrame({id_col: ids[nz], "char_entropy": ent[nz]})

    return ds.map_batches(score, batch_format="pandas")


def bigram_pmi(ds, *, min_count: int = 5, text_col: str = "text"):
    """Collocation mining: pointwise mutual information of adjacent word
    pairs, ``pmi = ln(c_ab·N / (c_a·c_b))`` — the statistic behind
    phrase/term discovery over a corpus.

    Fully distributed, NO vocabulary broadcast and NO shuffle join — the
    tfidf_topk co-location trick applied twice: unigram partial counts and
    bigram partial counts ride the SAME exchange keyed by an int64 token
    hash (h(w) for unigrams, h(w1) for bigrams), so after the exchange
    every block holds all partials of its tokens; c_a totals and merged
    bigram counts attach in-block. A second exchange keyed by h(w2) (the
    merged unigram totals re-emitted alongside) attaches c_b the same way.
    The ``min_count`` prune runs at the FIRST merge, so the second exchange
    carries only surviving bigrams. A key collision merely co-locates two
    token groups; all merges group by the string, staying exact.

    N (total token occurrences) comes from one cheap projected count pass.
    c_ab·N and c_a·c_b are computed in float64 with the same operation
    order as the SQL twin (int64 products would overflow past N ≈ 3e9);
    pmi rounds to 9dp for engine portability. Output:
    (w1, w2, cab, ca, cb, pmi) for every bigram with c_ab >= min_count."""
    import re

    from ..functions.text_stats import TOKEN_RE
    from ..grouping import map_copartitioned

    word_re = re.compile(TOKEN_RE)

    n_total = int(
        ds.map_batches(
            lambda b: pd.DataFrame(
                {"n": [b[text_col].fillna("").str.count(TOKEN_RE).sum()]}
            ),
            batch_format="pandas",
        ).sum("n")
    )
    n_f = float(n_total)

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.findall(word_re)
        counts = toks.str.len().to_numpy(np.int64)
        total = int(counts.sum())
        empty = pd.DataFrame(
            {
                "w1": pd.Series([], dtype=object),
                "w2": pd.Series([], dtype=object),
                "cnt": pd.Series([], dtype=np.int64),
                "kind": pd.Series([], dtype=np.int8),
                "key": pd.Series([], dtype=np.int64),
            }
        )
        if total == 0:
            return empty
        from itertools import chain

        flat = np.fromiter(chain.from_iterable(toks), dtype=object, count=total)
        codes, uniq = pd.factorize(flat, sort=False)
        uniq = np.asarray(uniq, dtype=object)
        ucnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        # bigrams: adjacent positions within the same document
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        same = doc_idx[1:] == doc_idx[:-1]
        a, b = codes[:-1][same], codes[1:][same]
        if len(a):
            pair = a.astype(np.int64) * len(uniq) + b
            pu, pc = np.unique(pair, return_counts=True)
            bw1 = uniq[(pu // len(uniq))]
            bw2 = uniq[(pu % len(uniq))]
        else:
            bw1 = bw2 = np.empty(0, object)
            pc = np.empty(0, np.int64)
        w1 = np.concatenate([uniq, bw1])
        w2 = np.concatenate([np.full(len(uniq), "", object), bw2])
        cnt = np.concatenate([ucnt, pc.astype(np.int64)])
        kind = np.concatenate(
            [np.zeros(len(uniq), np.int8), np.ones(len(bw1), np.int8)]
        )
        key = pd.util.hash_array(w1).view(np.int64)
        return pd.DataFrame({"w1": w1, "w2": w2, "cnt": cnt, "kind": kind, "key": key})

    def merge_attach_ca(batch: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame(
            {
                "w1": pd.Series([], dtype=object),
                "w2": pd.Series([], dtype=object),
                "cnt": pd.Series([], dtype=np.int64),
                "kind": pd.Series([], dtype=np.int8),
                "key": pd.Series([], dtype=np.int64),
                "ca": pd.Series([], dtype=np.int64),
            }
        )
        if not len(batch):
            return out_empty
        uni = batch[batch["kind"] == 0]
        tot = uni.groupby("w1", sort=False, as_index=False)["cnt"].sum()
        big = (
            batch[batch["kind"] == 1]
            .groupby(["w1", "w2"], sort=False, as_index=False)["cnt"]
            .sum()
        )
        big = big[big["cnt"] >= min_count]  # prune BEFORE the second exchange
        ca_map = dict(zip(tot["w1"], tot["cnt"]))
        frames = []
        # merged unigram totals travel on to the h(w2) exchange (kind 0,
        # key stays h(w)); surviving bigrams re-key to h(w2)
        tot_rows = tot.assign(
            w2="", kind=np.int8(0),
            key=pd.util.hash_array(tot["w1"].to_numpy(object)).view(np.int64),
            ca=np.int64(0),
        )
        frames.append(tot_rows[["w1", "w2", "cnt", "kind", "key", "ca"]])
        if len(big):
            big_rows = big.assign(
                kind=np.int8(1),
                key=pd.util.hash_array(big["w2"].to_numpy(object)).view(np.int64),
                ca=big["w1"].map(ca_map).to_numpy(np.int64),
            )
            frames.append(big_rows[["w1", "w2", "cnt", "kind", "key", "ca"]])
        return pd.concat(frames, ignore_index=True)

    def attach_cb_score(batch: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame(
            {
                "w1": pd.Series([], dtype=object),
                "w2": pd.Series([], dtype=object),
                "cab": pd.Series([], dtype=np.int64),
                "ca": pd.Series([], dtype=np.int64),
                "cb": pd.Series([], dtype=np.int64),
                "pmi": pd.Series([], dtype=np.float64),
            }
        )
        if not len(batch):
            return out_empty
        uni = batch[batch["kind"] == 0]
        cb_map = dict(zip(uni["w1"], uni["cnt"]))
        big = batch[batch["kind"] == 1]
        if not len(big):
            return out_empty
        cab = big["cnt"].to_numpy(np.int64)
        ca = big["ca"].to_numpy(np.int64)
        cb = big["w2"].map(cb_map).to_numpy(np.int64)
        # same IEEE operation order as the SQL twin: (cab*N) / (ca*cb), ln
        pmi = np.round(
            np.log((cab.astype(np.float64) * n_f) / (ca.astype(np.float64) * cb)),
            9,
        )
        return pd.DataFrame(
            {"w1": big["w1"].to_numpy(object), "w2": big["w2"].to_numpy(object),
             "cab": cab, "ca": ca, "cb": cb, "pmi": pmi}
        )

    stream = ds.map_batches(partials, batch_format="pandas")
    stage1 = map_copartitioned(stream, "key", merge_attach_ca, batch_format="pandas")
    return map_copartitioned(stage1, "key", attach_cb_score, batch_format="pandas")


def _histogram_partial(by: str, col: str):
    """Per-batch ``(by, value, cnt)`` partial-histogram combiner — the
    shared primitive behind :func:`column_quantiles` and
    :func:`cume_dist_by_group` (rows ∝ distinct values per block, not
    rows; null by/value rows dropped by the groupby)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.groupby([by, col], sort=False, as_index=False).size()
        return out.rename(columns={"size": "cnt"}).astype({"cnt": np.int64})

    return partial


def column_quantiles(ds, col: str = "n_chars", by: str = "lang",
                     qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99)):
    """EXACT distributed quantiles of an integer column, grouped by ``by`` —
    the corpus-profiling report (length percentiles per language/source).

    Combiner shape: per-batch ``(by, value, cnt)`` partial histogram (rows ∝
    distinct values per block, not rows) → one exchange keyed by ``by`` →
    per-group merge + cumsum; quantile q = smallest value whose cumulative
    share ≥ q (== SQL ``min(v) where cume_dist >= q``). Exactness relies on
    the per-group distinct-value count being exchange-sized — true for int
    columns like char/token lengths; unbounded float columns would need a
    fixed-width bucketing pass first (not implemented, documented limit).

    Null ``by``/``col`` rows are DROPPED (combiner groupby; document-side
    twin of the hash_sample null convention — note SQL window functions
    would rank NULLs as their own partition).

    Output: (``by``, q, value, n_rows) — one row per group per quantile."""

    from ..grouping import map_copartitioned

    partial = _histogram_partial(by, col)
    qarr = np.asarray(qs, np.float64)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {by: pd.Series([], dtype=batch[by].dtype), "q": pd.Series([], dtype=np.float64),
                 "value": pd.Series([], dtype=np.int64), "n_rows": pd.Series([], dtype=np.int64)}
            )
        merged = batch.groupby([by, col], sort=True, as_index=False)["cnt"].sum()
        frames = []
        for g, sub in merged.groupby(by, sort=True):
            vals = sub[col].to_numpy(np.int64)  # sorted (groupby sort=True)
            cum = np.cumsum(sub["cnt"].to_numpy(np.int64))
            n = int(cum[-1])
            cd = cum / float(n)
            idx = np.searchsorted(cd, qarr, side="left")
            idx = np.minimum(idx, len(vals) - 1)  # fp slack at q=max(cd)=1.0
            frames.append(pd.DataFrame({by: g, "q": qarr, "value": vals[idx], "n_rows": n}))
        return pd.concat(frames, ignore_index=True)

    return map_copartitioned(
        ds.map_batches(partial, batch_format="pandas"), by, finish, batch_format="pandas"
    )


def winsorize_by_group(
    ds,
    col: str,
    by: str,
    *,
    lo: float = 0.05,
    hi: float = 0.95,
    keep_cols: list[str] | None = None,
    out_col: str | None = None,
):
    """Per-group percentile clipping (winsorization) — the outlier-taming
    normalization a feature pipeline applies before scaling: each row's
    ``col`` is clipped to its group's [q_lo, q_hi] exact quantiles.

    Shape: the :func:`column_quantiles` histogram combiner computes the two
    cut values per group (exchange rows ∝ distinct values, never input
    rows); the resulting (groups × 2) table is DRIVER-TINY by construction,
    so it broadcasts as a plain dict into a streaming map — same
    histogram-broadcast pattern as ``cume_dist_by_group``, no second
    exchange, no join. Rows whose group has no quantile row (null group or
    null value — dropped by the combiner) pass through UNCLIPPED.
    """
    out_col = out_col or f"{col}_w"
    keep = keep_cols or []
    qdf = column_quantiles(ds, col=col, by=by, qs=(lo, hi)).to_pandas()
    lo_lut = dict(zip(qdf.loc[qdf["q"] == lo, by], qdf.loc[qdf["q"] == lo, "value"]))
    hi_lut = dict(zip(qdf.loc[qdf["q"] == hi, by], qdf.loc[qdf["q"] == hi, "value"]))

    def clip(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].to_numpy(np.int64)
        lo_v = batch[by].map(lo_lut).fillna(-(2**62)).to_numpy(np.int64)
        hi_v = batch[by].map(hi_lut).fillna(2**62).to_numpy(np.int64)
        out = batch[[by, *keep]].copy()
        out[out_col] = np.minimum(np.maximum(v, lo_v), hi_v)
        return out

    return ds.map_batches(clip, batch_format="pandas")


def _tokenize_codes(texts: pd.Series):
    """Shared repetition-kernel front end: (token codes int64, per-doc counts,
    doc index per token, vocab size). Returns codes=None for an all-empty
    batch."""
    import re

    from ..functions.text_stats import TOKEN_RE

    word_re = re.compile(TOKEN_RE)
    toks = texts.fillna("").str.findall(word_re)
    counts = toks.str.len().to_numpy(np.int64)
    total = int(counts.sum())
    if total == 0:
        return None, counts, None, 0
    from itertools import chain

    flat = np.fromiter(chain.from_iterable(toks), dtype=object, count=total)
    codes, uniques = pd.factorize(flat, sort=False)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    return codes.astype(np.int64), counts, doc_idx, len(uniques)


def _ngram_dup_counts(codes, doc_idx, n_docs: int, V: int, n: int):
    """(per-doc distinct n-gram count) over the batch-flat token code stream —
    the exact pack-and-densify kernel shared by ngram_repetition and
    repetition_gate. Caller computes per-doc totals as max(tokens-(n-1), 0)."""
    L = len(codes) - (n - 1)
    if L <= 0:
        return np.zeros(n_docs, np.int64)
    grams = codes[:L].copy()
    for k in range(1, n):
        grams = grams * np.int64(V) + codes[k : L + k]
        if k < n - 1:  # keep values < total so the next product fits int64
            grams = np.unique(grams, return_inverse=True)[1]
    same_doc = doc_idx[:L] == doc_idx[n - 1 :]
    gdoc = doc_idx[:L][same_doc]
    grams = grams[same_doc]
    order = np.lexsort((grams, gdoc))
    gdoc_s, grams_s = gdoc[order], grams[order]
    newrun = np.ones(len(gdoc_s), dtype=bool)
    newrun[1:] = (gdoc_s[1:] != gdoc_s[:-1]) | (grams_s[1:] != grams_s[:-1])
    return np.bincount(gdoc_s[newrun], minlength=n_docs).astype(np.int64)


def repetition_gate(ds, max_dup: dict[int, float], text_col: str = "text"):
    """Gopher-style composite repetition FILTER: keep only docs whose
    duplicate-n-gram fraction is <= ``max_dup[n]`` for every configured n
    (the published rule set thresholds 2-4-grams). One tokenize+factorize
    per batch shared across all n; map-only (no exchange); all input columns
    pass through. Docs with < n tokens have fraction 0 for that n (pass)."""
    for n in max_dup:
        if n < 2:
            raise ValueError("repetition_gate needs n >= 2")

    def gate(batch: pd.DataFrame) -> pd.DataFrame:
        codes, counts, doc_idx, V = _tokenize_codes(batch[text_col])
        if codes is None:
            return batch  # no tokens anywhere: every fraction is 0
        keep = np.ones(len(counts), bool)
        for n, thr in max_dup.items():
            totals = np.maximum(counts - (n - 1), 0)
            distinct = _ngram_dup_counts(codes, doc_idx, len(counts), V, n)
            frac = np.zeros(len(counts), np.float64)
            nz = totals > 0
            frac[nz] = 1.0 - distinct[nz] / totals[nz]
            keep &= frac <= thr
        return batch.loc[keep]

    return ds.map_batches(gate, batch_format="pandas")


def ngram_repetition(ds, n: int = 2, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc duplicate-n-gram fraction — the Gopher-style repetition
    signal (`1 - distinct_ngrams / ngrams`) at any n >= 2 (the Gopher rule
    set uses 2-4-grams); high values flag boilerplate / degenerate
    generations. Map-only combiner shape, no exchange.

    Vectorized: one factorize over the batch's flat token stream, then
    n-gram codes built EXACTLY by iterative pack-and-densify — each step
    packs the running prefix code with the next token code into int64
    (prefix <= total tokens after densify and token code < vocab, so the
    product never overflows) and re-densifies via np.unique; doc
    boundaries masked so grams never span docs. Distinct-per-doc via one
    lexsort + unique-run bincount. Docs with < n tokens emit (0, 0, 0.0).
    The count column is named ``n_{n}grams`` (``n_2grams`` at the default).
    """
    if n < 2:
        raise ValueError("ngram_repetition needs n >= 2")
    cnt_col = f"n_{n}grams"

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(np.int64)
        codes, counts, doc_idx, V = _tokenize_codes(batch[text_col])
        ngrams = np.maximum(counts - (n - 1), 0)
        if codes is None or not ngrams.any():
            z = np.zeros(len(ids), np.int64)
            return pd.DataFrame(
                {id_col: ids, cnt_col: ngrams, "n_distinct": z,
                 "dup_frac": np.zeros(len(ids), np.float64)}
            )
        distinct = _ngram_dup_counts(codes, doc_idx, len(ids), V, n)
        frac = np.zeros(len(ids), np.float64)
        nz = ngrams > 0
        frac[nz] = np.round(1.0 - distinct[nz] / ngrams[nz], 9)
        return pd.DataFrame(
            {id_col: ids, cnt_col: ngrams, "n_distinct": distinct, "dup_frac": frac}
        )

    return ds.map_batches(score, batch_format="pandas")


def normalize_text(ds, text_col: str = "text", id_col: str = "doc_id",
                   keep_cols: tuple = ()):
    """Canonical text normalization — the first step of any dedup/tokenize
    chain on web text: NFC unicode normalization → lowercase → collapse
    ASCII whitespace runs ([ \\t\\r\\n\\f\\v]+) to one space → strip. All
    pandas C string kernels; map-only.

    SQL-parity notes (the oracle twin applies the same chain with
    nfc_normalize/lower/regexp_replace/trim): the whitespace class is the
    explicit ASCII set on BOTH sides (Python's \\s and RE2's \\s disagree on
    unicode spaces), and after the collapse only ' ' can lead/trail, so
    Python strip() == SQL trim(). Output: (id, norm_text, n_chars_norm,
    *keep_cols passthrough) — lengths in code points in both engines."""

    def norm(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("")
        t = t.str.normalize("NFC").str.lower()
        t = t.str.replace(r"[ \t\r\n\f\v]+", " ", regex=True).str.strip()
        out = pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(np.int64),
                "norm_text": t.to_numpy(object),
                "n_chars_norm": t.str.len().to_numpy(np.int64),
            }
        )
        for c in keep_cols:
            out[c] = batch[c].to_numpy()
        return out

    return ds.map_batches(norm, batch_format="pandas")


def cume_dist_by_group(ds, col: str = "n_chars", by: str = "lang",
                       id_col: str = "doc_id"):
    """Per-row ``cume_dist() OVER (PARTITION BY by ORDER BY col)`` — the
    windowed analytic (percentile rank of every doc's length within its
    language), distributed WITHOUT a global sort: the same combiner
    histogram as :func:`column_quantiles` (rows ∝ distinct values) is
    pulled once, per-group (sorted values, cumulative counts) arrays are
    broadcast via ``ray.put``, and a streaming map computes each row's
    rank with one vectorized searchsorted per group per batch.

    cume_dist = count(col' <= col) / N — both operands exact ints, so the
    double division is bit-identical to the SQL window function. Exactness
    requires the per-group distinct-value table to be broadcastable (int
    columns; same limit as column_quantiles). Null ``by``/``col`` rows are
    DROPPED in both passes (the combiner groupby excludes them from the
    histogram; scoring them would KeyError — note SQL's window would rank
    NULLs as their own partition, so filter the oracle too when nulls can
    occur)."""
    import ray

    # the per-group LUT below must fit on the driver REGARDLESS (documented
    # int-column limit shared with column_quantiles), so a Ray groupby
    # exchange before the pull only adds a sort barrier (measured 1.9 s
    # fixed cost vs 0.2 s at sf0.1). Instead: coalesce the tiny combiner
    # stream and second-level-combine, so the driver pull reads <= 8 blocks
    # of pre-summed rows (∝ distinct (by, col) pairs × 8, never ∝ input
    # blocks) and the final sum is one pandas groupby over that.
    def second_level(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby([by, col], sort=False, as_index=False)["cnt"].sum()

    hist = (
        ds.map_batches(_histogram_partial(by, col), batch_format="pandas")
        .repartition(8)
        .map_batches(second_level, batch_format="pandas")
        .to_pandas()
        .groupby([by, col], as_index=False)["cnt"]
        .sum()
    )
    ccol = "cnt"
    lut = {}
    for g, sub in hist.groupby(by, sort=False):
        sub = sub.sort_values(col)
        vals = sub[col].to_numpy(np.int64)
        cum = np.cumsum(sub[ccol].to_numpy(np.int64))
        lut[g] = (vals, cum, int(cum[-1]))
    ref = ray.put(lut)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch[by].notna() & batch[col].notna()]
        table = ray.get(ref)
        cd = np.empty(len(batch), np.float64)
        v = batch[col].to_numpy(np.int64)
        # one pass over rows: factorize groups, then one searchsorted per
        # DISTINCT group over just its rows (no per-group full-batch scans)
        codes, uniques = pd.factorize(batch[by].to_numpy(), sort=False)
        order = np.argsort(codes, kind="stable")
        bounds = np.searchsorted(codes[order], np.arange(len(uniques) + 1))
        for gi, g in enumerate(uniques):
            rows = order[bounds[gi]:bounds[gi + 1]]
            vals, cum, n = table[g]
            idx = np.searchsorted(vals, v[rows], "right") - 1
            cd[rows] = cum[idx] / n  # idx >= 0: every value is in the histogram
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy(np.int64), by: batch[by], col: v, "cd": cd}
        )

    return ds.map_batches(score, batch_format="pandas")


# --------------------------------------------------------------------------
# Bloom-prefiltered decontamination
#
# The exact DecontaminateStage broadcasts the full sorted ref-shingle array
# (8 B/shingle). When the reference corpus is large (decontaminating against
# a whole benchmark SUITE, or another training corpus), that broadcast is
# the bottleneck: 1e9 ref shingles = 8 GB shipped to every worker. The Bloom
# variant broadcasts ~bits_per_key/8 bytes per shingle (12 bits -> 1.5 B,
# ~5.3x smaller) and keeps the output EXACT by confirming only the bloom-hit
# shingles of bloom-candidate docs against the (distributed) ref set with a
# shingle-keyed exchange:
#
#   1. bloom = OR of per-block partial blooms over the ref shingle stream
#      (build traffic: one m/8-byte array per ref block, never the shingles)
#   2. map_batches(BloomPrefilterStage): per-doc bloom-hit fraction is an
#      UPPER BOUND on exact overlap (no false negatives), so docs below the
#      threshold are definitively clean and emit nothing; candidate docs
#      emit only their bloom-HIT shingles (misses cannot be in the ref set)
#   3. union(candidate shingles, ref shingles) -> ONE sh-keyed exchange ->
#      exact membership per shingle -> per-doc hit counts -> one doc-keyed
#      exchange -> exact overlap, filter >= threshold
#
# Exchange traffic is proportional to CANDIDATE shingles (threshold-gated,
# FP-inflated by ~2^-k on the clean mass) plus the ref set — not the corpus.
# Output == the exact operator's contaminated set, bit for bit, regardless
# of the bloom's false-positive rate (a too-small bloom only costs traffic).
# --------------------------------------------------------------------------

_BLOOM_MIX = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio constant


def _splitmix_fin(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — diffuses HIGH key bits into the low bits the
    power-of-two mask keeps. Without it, h and h*C agree mod m whenever two
    keys share their low log2(m) bits (multiplication mod 2^s only sees the
    low s bits), collapsing all k probes to the same slots — measured 7.8%
    FP where theory says 0.2%."""
    x = x ^ (x >> np.uint64(30))
    x = x * np.uint64(0xBF58476D1CE4E5B9)
    x = x ^ (x >> np.uint64(27))
    x = x * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _bloom_positions(h: np.ndarray, m_bits: int, k: int) -> list[np.ndarray]:
    """k bit positions per key via double hashing h1 + i*h2 (Kirsch-
    Mitzenmacher) over splitmix64-finalized key halves."""
    h = h.view(np.uint64) if h.dtype == np.int64 else h.astype(np.uint64)
    mask = np.uint64(m_bits - 1)  # m_bits is a power of two
    h1 = _splitmix_fin(h)
    h2 = _splitmix_fin(h ^ _BLOOM_MIX) | np.uint64(1)
    return [(h1 + np.uint64(i) * h2) & mask for i in range(k)]


def bloom_add(bits: np.ndarray, h: np.ndarray, m_bits: int, k: int) -> None:
    """Set the k bits of each key in-place (duplicate-safe ufunc.at)."""
    if not len(h):
        return
    for idx in _bloom_positions(h, m_bits, k):
        np.bitwise_or.at(
            bits,
            (idx >> np.uint64(3)).astype(np.int64),
            np.left_shift(np.uint8(1), (idx & np.uint64(7)).astype(np.uint8)),
        )


def bloom_query(bits: np.ndarray, h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Vectorized membership test: True iff all k bits set (no false
    negatives; false-positive rate ~(1 - e^{-kn/m})^k)."""
    ok = np.ones(len(h), bool)
    for idx in _bloom_positions(h, m_bits, k):
        byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
        ok &= (byte >> (idx & np.uint64(7)).astype(np.uint8)) & np.uint8(1) != 0
    return ok


def bloom_params(n_keys: int, bits_per_key: int = 12) -> tuple[int, int]:
    """(m_bits power-of-two >= n*bits_per_key, optimal k = ln2 * bits/key)."""
    m_bits = 1 << max(10, int(np.ceil(np.log2(max(1, n_keys) * bits_per_key))))
    return m_bits, max(1, int(round(0.6931 * bits_per_key)))


def shingle_stream(ds, text_col: str = "text", tokenizer: str = "words", shingle_n: int = 3):
    """Dataset of per-block-distinct shingle hashes (column ``sh``, int64) —
    the distributed form of :func:`reference_shingles`."""

    def ex(batch: pd.DataFrame) -> pd.DataFrame:
        sets = shingle_hash_sets(list(batch[text_col]), tokenizer, shingle_n)
        nonempty = [s for s in sets if len(s)]
        flat = np.unique(np.concatenate(nonempty)) if nonempty else np.empty(0, np.int64)
        return pd.DataFrame({"sh": flat})

    return ds.map_batches(ex, batch_format="pandas")


def bloom_build(ref_sh_ds, m_bits: int, k: int) -> np.ndarray:
    """OR-reduce per-block partial blooms over a shingle Dataset. The driver
    pull is one m/8-byte row PER BLOCK (never the shingles themselves); at
    very large block counts swap the loop for a tree of pairwise-OR tasks."""
    nbytes = m_bits // 8

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(nbytes, np.uint8)
        bloom_add(bits, t["sh"].to_numpy(zero_copy_only=False), m_bits, k)
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.binary())})

    out = np.zeros(nbytes, np.uint8)
    for row in ref_sh_ds.map_batches(partial, batch_format="pyarrow").take_all():
        out |= np.frombuffer(row["bloom"], np.uint8)
    return out


class BloomPrefilterStage:
    """map_batches callable: drop definitively-clean docs via the broadcast
    bloom; emit candidate docs' bloom-HIT shingles as flat (doc_id, sh,
    n_shingles) rows for the exact-confirmation exchange."""

    def __init__(
        self,
        bloom_ref,
        m_bits: int,
        k: int,
        text_col: str = "text",
        id_col: str = "doc_id",
        tokenizer: str = "words",
        shingle_n: int = 3,
        threshold: float = 0.5,
    ):
        import ray

        self.bits = ray.get(bloom_ref) if not isinstance(bloom_ref, np.ndarray) else bloom_ref
        self.m_bits = m_bits
        self.k = k
        self.text_col = text_col
        self.id_col = id_col
        self.tokenizer = tokenizer
        self.shingle_n = shingle_n
        self.threshold = threshold

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sets = shingle_hash_sets(list(batch[self.text_col]), self.tokenizer, self.shingle_n)
        lens = np.fromiter((len(s) for s in sets), np.int64, len(sets))
        nz = lens > 0
        empty = pd.DataFrame(
            {
                "doc_id": np.empty(0, np.int64),
                "sh": np.empty(0, np.int64),
                "n_shingles": np.empty(0, np.int64),
            }
        )
        if not nz.any():
            return empty
        flat = np.concatenate([s for s in sets if len(s)])
        hit = bloom_query(self.bits, flat, self.m_bits, self.k)
        starts = np.r_[0, np.cumsum(lens)][:-1][nz]
        bloom_hits = np.add.reduceat(hit.astype(np.int64), starts)
        # bloom overlap is an upper bound on exact overlap -> below-threshold
        # docs are PROVABLY clean (bloom has no false negatives)
        cand = np.zeros(len(sets), bool)
        cand[nz] = bloom_hits / lens[nz] >= self.threshold
        if not cand.any():
            return empty
        doc_idx = np.repeat(np.flatnonzero(nz), lens[nz])  # flat row -> doc row
        keep = hit & cand[doc_idx]
        if not keep.any():
            return empty
        ids = batch[self.id_col].to_numpy(np.int64)
        doc_keep = doc_idx[keep]
        return pd.DataFrame(
            {
                "doc_id": ids[doc_keep],
                "sh": flat[keep],
                "n_shingles": lens[doc_keep],
            }
        )


def decontaminate_bloom(
    ds,
    ref_sh_ds,
    *,
    bits_per_key: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer: str = "words",
    shingle_n: int = 3,
    threshold: float = 0.5,
):
    """Exact-output decontamination with a Bloom broadcast: returns the
    (doc_id, overlap) rows whose exact shingle overlap with the reference
    set is >= threshold — identical to filtering :class:`DecontaminateStage`
    output, but the broadcast is bits_per_key/8 bytes per ref shingle and
    the exact ref set participates only in a shingle-keyed exchange."""
    import pyarrow.compute as pc

    import ray

    from ..grouping import map_copartitioned

    # the ref stream is consumed twice (bloom build + exchange); materialize
    # so extraction runs once. Ref shingles are 8 B/row in the object store —
    # distributed, never driver-resident.
    ref_sh = ref_sh_ds.materialize()
    m_bits, k = bloom_params(ref_sh.count(), bits_per_key)
    bloom_ref = ray.put(bloom_build(ref_sh, m_bits, k))
    cand = ds.map_batches(
        BloomPrefilterStage(
            bloom_ref, m_bits, k,
            text_col=text_col, id_col=id_col,
            tokenizer=tokenizer, shingle_n=shingle_n, threshold=threshold,
        ),
        batch_format="pandas",
    )

    def tag_cand(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "sh": t["sh"],
                "n_shingles": t["n_shingles"],
                "is_ref": pa.array(np.zeros(t.num_rows, np.int8)),
            }
        )

    def tag_ref(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "doc_id": pa.array(np.full(n, -1, np.int64)),
                "sh": t["sh"],
                "n_shingles": pa.array(np.zeros(n, np.int64)),
                "is_ref": pa.array(np.ones(n, np.int8)),
            }
        )

    u = cand.map_batches(tag_cand, batch_format="pyarrow").union(
        ref_sh.map_batches(tag_ref, batch_format="pyarrow")
    )

    _partial_empty = pd.DataFrame(
        {
            "doc_id": np.empty(0, np.int64),
            "hits": np.empty(0, np.int64),
            "n_shingles": np.empty(0, np.int64),
        }
    )

    def confirm(block: pd.DataFrame) -> pd.DataFrame:
        # co-partitioned on sh: every row of a given shingle is in this block
        if not len(block):
            return _partial_empty
        is_ref = block["is_ref"].to_numpy() == 1
        c_sh = block.loc[~is_ref, "sh"].to_numpy()
        if not len(c_sh):
            return _partial_empty
        ref = np.unique(block.loc[is_ref, "sh"].to_numpy())
        if len(ref):
            pos = np.searchsorted(ref, c_sh)
            pos[pos == len(ref)] = len(ref) - 1
            hit = (ref[pos] == c_sh).astype(np.int64)
        else:
            hit = np.zeros(len(c_sh), np.int64)
        c = block[~is_ref]
        g = (
            pd.DataFrame(
                {
                    "doc_id": c["doc_id"].to_numpy(),
                    "hit": hit,
                    "n_shingles": c["n_shingles"].to_numpy(),
                }
            )
            .groupby("doc_id", as_index=False)
            .agg(hits=("hit", "sum"), n_shingles=("n_shingles", "first"))
        )
        return g.astype({"doc_id": np.int64, "hits": np.int64, "n_shingles": np.int64})

    partials = map_copartitioned(u, "sh", confirm, batch_format="pandas")

    _final_empty = pd.DataFrame(
        {"doc_id": np.empty(0, np.int64), "overlap": np.empty(0, np.float64)}
    )

    def finish(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return _final_empty
        g = block.groupby("doc_id", as_index=False).agg(
            hits=("hits", "sum"), n_shingles=("n_shingles", "first")
        )
        o = g["hits"].to_numpy(np.float64) / g["n_shingles"].to_numpy(np.float64)
        sel = o >= threshold
        if not sel.any():
            return _final_empty
        # same rounding kernel as the exact operator's oracle finish
        overlap = pc.round(pa.array(o[sel]), ndigits=9).to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(np.int64)[sel], "overlap": overlap}
        )

    return map_copartitioned(partials, "doc_id", finish, batch_format="pandas")


def bigram_crossentropy(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_limit: int | None = 1_000_000,
):
    """Mean bigram cross-entropy per doc under the corpus's own bigram LM —
    the CCNet-style perplexity quality signal without an external model:
    score = avg over the doc's bigrams of ``-ln( C(w1 w2) / Cctx(w1) )``
    where C is the corpus bigram count and Cctx(w1) = w1's count as a left
    context (the sum of its bigram counts). Repetitive/boilerplate text
    scores low, token-salad scores high; rank or gate on it like
    :func:`unigram_surprisal` (which this upgrades: conditional vs marginal
    probabilities separate "rare words" from "implausible sequences").

    Same two-pass shape as :func:`unigram_surprisal`: (1) corpus bigram +
    context counts via per-block Counters → keyed exchanges; with
    ``vocab_limit`` the top-K head of each table is selected DISTRIBUTED
    (count desc, key asc) and broadcast, out-of-head bigrams floor at
    count 1 / contexts at their floor — the 100-TB shape, since Zipf heads
    carry ~all occurrence mass. ``vocab_limit=None`` broadcasts the full
    tables — the SQL-twin-exact mode. (2) streaming score map. Docs with
    fewer than 2 tokens have no bigrams and emit nothing.

    Output: (doc_id, n_bigrams, xent[9dp])."""
    import re
    from collections import Counter
    from itertools import chain

    import ray

    word_re = re.compile(r"[0-9A-Za-z_]+")
    # a space cannot appear inside [0-9A-Za-z_]+ tokens, so "w1 w2" is an
    # unambiguous bigram key. Do NOT use "\x00": pandas' string hash table
    # (factorize/groupby fast path) hashes object strings as C strings, so an
    # embedded NUL terminates the key and silently collapses distinct bigrams
    # sharing a first word (measured: 916 distinct -> 31).
    SEP = " "

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in batch[text_col]:
            w = word_re.findall(t or "")
            c.update(a + SEP + b for a, b in zip(w, w[1:]))
        return pd.DataFrame(
            {"key": list(c.keys()), "c": np.fromiter(c.values(), np.int64, len(c))}
        )

    partials = ds.map_batches(partial_counts, batch_format="pandas")

    def _grouped():
        from ..grouping import map_copartitioned

        def final_sum(b: pd.DataFrame) -> pd.DataFrame:
            return b.groupby("key", as_index=False, sort=False)["c"].sum()

        return map_copartitioned(partials, "key", final_sum, batch_format="pandas")

    if vocab_limit is None:
        counts = partials.groupby("key").sum("c").to_pandas()
        col = "sum(c)" if "sum(c)" in counts.columns else "c"
        bigrams = dict(zip(counts["key"], counts[col].astype(int)))
    else:
        top = (
            _grouped()
            .sort(["c", "key"], descending=[True, False])
            .limit(vocab_limit)
            .to_pandas()
        )
        bigrams = dict(zip(top["key"], top["c"].astype(int)))
    # context counts derive from the (possibly truncated) bigram table so
    # numerator <= denominator always holds (scores stay >= 0)
    ctx: dict = {}
    for k, v in bigrams.items():
        w1 = k.split(SEP, 1)[0]
        ctx[w1] = ctx.get(w1, 0) + v
    ref = ray.put((bigrams, ctx))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        big, cx = ray.get(ref)
        toks = batch[text_col].fillna("").str.findall(word_re)
        nb = np.maximum(toks.str.len().to_numpy(np.int64) - 1, 0)
        ids = batch[id_col].to_numpy(np.int64)
        total = int(nb.sum())
        if total == 0:
            return pd.DataFrame(
                {
                    id_col: ids[:0],
                    "n_bigrams": nb[:0],
                    "xent": np.empty(0, np.float64),
                }
            )
        flat = np.fromiter(
            chain.from_iterable(
                (a + SEP + b for a, b in zip(w, w[1:])) for w in toks
            ),
            dtype=object,
            count=total,
        )
        codes, uniques = pd.factorize(flat, sort=False)
        c2 = np.fromiter((big.get(u, 1) for u in uniques), np.float64, len(uniques))
        c1 = np.fromiter(
            (max(cx.get(u.split(SEP, 1)[0], 1), 1) for u in uniques),
            np.float64,
            len(uniques),
        )
        per = -np.log(c2 / np.maximum(c1, c2))
        doc_idx = np.repeat(np.arange(len(ids)), nb)
        sums = np.bincount(doc_idx, weights=per[codes], minlength=len(ids))
        nz = nb > 0
        return pd.DataFrame(
            {
                id_col: ids[nz],
                "n_bigrams": nb[nz],
                "xent": np.round(sums[nz] / nb[nz], 9),
            }
        )

    return ds.map_batches(score, batch_format="pandas")
