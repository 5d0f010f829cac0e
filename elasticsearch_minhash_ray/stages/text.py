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
