"""Deduplication operators for training-data curation.

All wide steps use the same scale pattern as the LSH stage: ONE int32
hash-partition key (``part = hash(group_key) % P``) + per-partition vectorized
grouping — never a groupby on a high-cardinality string key, never per-group
Python calls.

Operators:
- :func:`exact_dedup_groups` — duplicate groups by content hash
  (hash-partition + per-group min/count; generalizes the reference's
  signature-collapse, MinHashFieldMapper.java:218-221).
- :func:`exact_dedup_keep` — the kept (representative) row keys.
- :func:`keep_latest` — snapshot dedup (newest row per composite key).
- :func:`simhash_near_dup_edges` — SimHash banding (4 x 16-bit bands over the
  64-bit sketch → any pair within Hamming distance 3 shares >= 1 band) +
  exact Hamming verification.
- n-gram Jaccard verification is part of the LSH stage (LSHConfig
  ``verify_mode='jaccard'`` carries shingle-hash sets on band rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .._arrow import table_from_pandas
from ..grouping import map_copartitioned, map_part_groups

from ..functions.simhash import hamming64, simhash64_docs
from ..functions.tokenize import get_batch_tokenizer

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _hash_part_str(values: pd.Series, num_partitions: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(values, index=False).to_numpy().view(np.uint64)
    with np.errstate(over="ignore"):
        return ((h * _MIX) % np.uint64(num_partitions)).astype(np.int32)


def exact_dedup_groups(ds, key_col: str = "content_sha256", id_col: str = "doc_id", num_partitions: int = 64):
    """Dataset → (content_sha256, n_dups, rep_<id_col>) one row per distinct
    content; representative = min id. Pre-aggregates per batch (combiner)
    before the partition shuffle so the exchange carries one row per distinct
    key per block, not one per input row."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, id_col]).to_pandas()
        agg = df.groupby(key_col, as_index=False, sort=False).agg(
            n_dups=(id_col, "size"), rep=(id_col, "min")
        )
        agg["part"] = _hash_part_str(agg[key_col], num_partitions)
        return table_from_pandas(agg)

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        agg = df.groupby(key_col, as_index=False, sort=False).agg(
            n_dups=("n_dups", "sum"), rep=("rep", "min")
        )
        agg = agg.rename(columns={"rep": f"rep_{id_col}"})
        return table_from_pandas(agg[[key_col, "n_dups", f"rep_{id_col}"]])

    return map_copartitioned(
        ds.map_batches(partial, batch_format="pyarrow"), "part", final
    )


def clone_groups(ds, text_col: str = "text", id_col: str = "doc_id", num_partitions: int = 64):
    """Type-2 code-clone detection: documents identical after LITERAL
    normalization — double-quoted strings → ``""``, integer literals → 0,
    ASCII-whitespace runs → one space, strip — group into clone families
    (``n_clones >= 2``); catches copies that differ only in embedded
    constants/config strings, which exact sha dedup misses and MinHash only
    catches when the literal mass is small. Single-quoted strings are NOT
    stripped (prose apostrophes would swallow text between them; pass code
    through a language-aware lexer stage for type-2-full).

    Map-only normalization (pandas C regex kernels; the whitespace class is
    the explicit ASCII set so Python and RE2 agree — see normalize_text),
    per-row sha256 of the normalized text, then the exact_dedup_groups
    combiner exchange. Output: (clone_sha256, n_clones, rep_<id_col>) for
    families of 2+."""
    import hashlib

    import pandas as pd

    def norm_sha(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("")
        t = t.str.replace(r'"[^"]*"', '""', regex=True)
        t = t.str.replace(r"[0-9]+", "0", regex=True)
        t = t.str.replace(r"[ \t\r\n\f\v]+", " ", regex=True).str.strip()
        sha = [hashlib.sha256(s.encode("utf-8")).hexdigest() for s in t]
        return pd.DataFrame(
            {"clone_sha256": sha, id_col: batch[id_col].to_numpy(np.int64)}
        )

    groups = exact_dedup_groups(
        ds.map_batches(norm_sha, batch_format="pandas"),
        key_col="clone_sha256",
        id_col=id_col,
        num_partitions=num_partitions,
    )

    def families(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.greater_equal(batch["n_dups"], 2))
        return pa.table(
            {
                "clone_sha256": batch["clone_sha256"],
                "n_clones": batch["n_dups"],
                f"rep_{id_col}": batch[f"rep_{id_col}"],
            }
        )

    return groups.map_batches(families, batch_format="pyarrow")


def dedup_rate_by_group(ds, key_col: str = "content_sha256", by: str = "source"):
    """Per-group duplication report: (by, n_docs, n_distinct, dup_rate) —
    the dedup-dashboard aggregate that tells you WHERE the duplicate mass
    lives before you spend a full dedup pass on it. Combiner: per-block
    distinct (by, key) pairs with partial counts (exchange rows ∝ distinct
    pairs, never docs) → ONE by-keyed exchange → per-group total + nunique.
    dup_rate = 1 − distinct/docs as a single float64 divide+subtract, the
    same two IEEE ops as the SQL twin."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([by, key_col]).to_pandas()
        agg = df.groupby([by, key_col], sort=False, as_index=False).size()
        agg = agg.rename(columns={"size": "cnt"}).astype({"cnt": np.int64})
        return table_from_pandas(agg)

    def final(block: pa.Table) -> pa.Table:
        df = block.to_pandas()
        if not len(df):
            return table_from_pandas(
                pd.DataFrame(
                    {by: pd.Series([], dtype=object),
                     "n_docs": pd.Series([], dtype=np.int64),
                     "n_distinct": pd.Series([], dtype=np.int64),
                     "dup_rate": pd.Series([], dtype=np.float64)}
                )
            )
        g = df.groupby(by, sort=False).agg(
            n_docs=("cnt", "sum"), n_distinct=(key_col, "nunique")
        ).reset_index()
        g["n_docs"] = g["n_docs"].astype(np.int64)
        g["n_distinct"] = g["n_distinct"].astype(np.int64)
        g["dup_rate"] = np.round(
            1.0 - g["n_distinct"].to_numpy(np.float64) / g["n_docs"].to_numpy(np.float64),
            9,
        )
        return table_from_pandas(g)

    return map_copartitioned(ds.map_batches(partial, batch_format="pyarrow"), by, final)


def exact_dedup_keep(ds, key_col: str = "content_sha256", id_col: str = "doc_id", num_partitions: int = 64):
    """The representative (kept) id per distinct content — the dedup output a
    training pipeline consumes."""
    groups = exact_dedup_groups(ds, key_col, id_col, num_partitions)

    def keep(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch[f"rep_{id_col}"]})

    return groups.map_batches(keep, batch_format="pyarrow")


def keep_latest(
    ds,
    key_cols: list[str],
    order_col: str,
    num_partitions: int = 64,
    tiebreak_col: str | None = None,
):
    """Snapshot dedup: one row per distinct composite key — the row with the
    MAX ``order_col`` ("keep the newest crawl per URL" / "newest commit per
    (repo, path)", the first curation step for any multi-snapshot corpus).

    Same combiner shape as :func:`exact_dedup_groups`: per-block argmax per
    key (≤ one candidate row per distinct key per block, ALL columns riding
    along) → one hash exchange on the composite key → per-partition argmax.
    The exchange therefore moves one candidate row per key per block, never
    the corpus. Determinism: ties on ``order_col`` within a key would be
    block-layout-dependent, so by default ``order_col`` must be unique per
    key (a commit timestamp / monotonically assigned doc_id); asserted
    cheaply in the final reduce and raised as a hard error. At 10^12 rows
    one dirty record aborting a whole run is operationally harsh, so
    ``tiebreak_col`` (when given) breaks (key, order) ties by the MAX of
    that column instead — the result stays deterministic, and only a
    residual tie on (key, order, tiebreak) raises.
    """
    cols = list(key_cols) + [order_col]
    order_cols = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    check_cols = cols + ([tiebreak_col] if tiebreak_col else [])
    tie_msg = (
        f"keep_latest: order_col {order_col!r} is not unique per key"
        + (
            f" even with tiebreak_col {tiebreak_col!r}"
            if tiebreak_col
            else " (pass tiebreak_col= for a deterministic tiebreak)"
        )
    )

    def argmax_rows(df: pd.DataFrame) -> pd.DataFrame:
        if tiebreak_col is None:
            # stable idxmax: max order_col per key, one row each, payload intact
            idx = df.groupby(list(key_cols), sort=False)[order_col].idxmax()
            return df.loc[idx]
        # lexicographic max on (order, tiebreak): stable sort then last-per-key
        return (
            df.sort_values(order_cols, kind="mergesort")
            .groupby(list(key_cols), sort=False)
            .tail(1)
        )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if df.duplicated(subset=check_cols).any():
            raise ValueError(tie_msg)
        out = argmax_rows(df)
        out = out.assign(
            part=_hash_part_str(out[list(key_cols)], num_partitions)
        )
        return table_from_pandas(out)

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop(columns=["part"])
        dup = df.duplicated(subset=check_cols, keep=False)
        if dup.any():  # two candidates tied: non-deterministic
            raise ValueError(tie_msg)
        return table_from_pandas(argmax_rows(df))

    return map_copartitioned(
        ds.map_batches(partial, batch_format="pyarrow"), "part", final
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


class SimHashStage:
    """map_batches callable adding a ``simhash`` uint64 (stored int64) column."""

    def __init__(self, content_col: str = "content", tokenizer: str = "standard", shingle: int = 1):
        self.content_col = content_col
        self.tok_many = get_batch_tokenizer(tokenizer, shingle)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.content_col].to_pylist()
        sigs = simhash64_docs(self.tok_many(texts))
        return batch.append_column("simhash", pa.array(sigs.view(np.int64), pa.int64()))


def simhash_near_dup_edges(
    ds,
    max_hamming: int = 3,
    key_col: str = "doc_key",
    num_partitions: int = 64,
    bucket_cap: int = 256,
):
    """Edges (src, dst, hamming) between docs whose 64-bit simhash differs by
    <= max_hamming bits. Banding: the band count is DERIVED from max_hamming
    — ``n_bands`` disjoint (64/n_bands)-bit bands guarantee (pigeonhole) that
    any pair with Hamming <= n_bands - 1 collides on >= 1 band, so we pick the
    smallest divisor of 64 with n_bands >= max_hamming + 1. Full recall at any
    max_hamming <= 31 (n_bands=32 → 2-bit bands is the practical floor;
    beyond that banding degenerates to all-pairs). Verification is exact.
    Same partition/cap scheme as the MinHash LSH stage."""
    if not 0 <= max_hamming <= 31:
        raise ValueError(f"max_hamming must be in [0, 31], got {max_hamming}")
    n_bands = next(b for b in (1, 2, 4, 8, 16, 32) if b >= max_hamming + 1)
    band_bits = 64 // n_bands
    band_mask = np.uint64((1 << band_bits) - 1)

    def explode(batch: pa.Table) -> pa.Table:
        sig = np.asarray(batch["simhash"], dtype=np.int64).view(np.uint64)
        keys = np.asarray(batch[key_col], dtype=np.int64)
        n = len(sig)
        bands = np.empty((n, n_bands), dtype=np.uint64)
        for b in range(n_bands):
            bands[:, b] = (sig >> np.uint64(band_bits * b)) & band_mask
        with np.errstate(over="ignore"):
            bucket = (bands ^ ((np.arange(n_bands, dtype=np.uint64) + np.uint64(1)) * _MIX)) >> np.uint64(1)
            part = (bucket % np.uint64(num_partitions)).astype(np.int32)
        return pa.table(
            {
                "bucket_part": pa.array(part.ravel(), pa.int32()),
                "bucket": pa.array(bucket.ravel().view(np.int64), pa.int64()),
                "doc_key": pa.array(np.repeat(keys, n_bands), pa.int64()),
                "simhash": pa.array(np.repeat(sig.view(np.int64), n_bands), pa.int64()),
            }
        )

    def pair(batch: pa.Table) -> pa.Table:
        order = np.lexsort(
            (np.asarray(batch["doc_key"]), np.asarray(batch["bucket"]))
        )
        bucket = np.asarray(batch["bucket"])[order]
        keys = np.asarray(batch["doc_key"])[order]
        sig = np.asarray(batch["simhash"])[order].view(np.uint64)
        starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
        ends = np.r_[starts[1:], len(bucket)]
        ia_l, ib_l = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            if m > bucket_cap:
                m = bucket_cap  # cap pathological buckets; star keeps connectivity
                ia, ib = np.triu_indices(m, k=1)
                ia_l.append(ia + s)
                ib_l.append(ib + s)
                rest = np.arange(s + m, e)
                ia_l.append(np.full(len(rest), s))
                ib_l.append(rest)
            else:
                ia, ib = np.triu_indices(m, k=1)
                ia_l.append(ia + s)
                ib_l.append(ib + s)
        if not ia_l:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        ia = np.concatenate(ia_l)
        ib = np.concatenate(ib_l)
        d = hamming64(sig[ia], sig[ib])
        ok = (d <= max_hamming) & (keys[ia] != keys[ib])
        a, b = keys[ia[ok]], keys[ib[ok]]
        return pa.table(
            {
                "src": pa.array(np.minimum(a, b), pa.int64()),
                "dst": pa.array(np.maximum(a, b), pa.int64()),
                "hamming": pa.array(d[ok], pa.int64()),
            }
        )

    def dedupe(batch: pa.Table) -> pa.Table:
        df = batch.select(["src", "dst", "hamming"]).to_pandas()
        out = df.groupby(["src", "dst"], as_index=False, sort=False)["hamming"].min()
        return table_from_pandas(out)

    def add_part(batch: pa.Table, n=num_partitions) -> pa.Table:
        s = np.asarray(batch["src"]).view(np.uint64)
        d = np.asarray(batch["dst"]).view(np.uint64)
        with np.errstate(over="ignore"):
            part = (((s * _MIX) ^ d) % np.uint64(n)).astype(np.int32)
        return batch.append_column("edge_part", pa.array(part, pa.int32()))

    # pair per key run (cache-sized verify working set — see build_edges),
    # dedupe whole-block (pandas groupby, output ~input size)
    return map_copartitioned(
        map_part_groups(
            ds.map_batches(explode, batch_format="pyarrow"), "bucket_part", pair
        ).map_batches(add_part, batch_format="pyarrow"),
        "edge_part",
        dedupe,
    )


# ---------------------------------------------------------------------------
# Anti-join (the dedup ACTION: drop rows whose key is in a drop-set)
# ---------------------------------------------------------------------------


def _hash_part_i64(keys: np.ndarray, num_partitions: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return ((keys.view(np.uint64) * _MIX) % np.uint64(num_partitions)).astype(np.int32)


def anti_join_keys(
    ds,
    drop_keys,
    key_col: str = "doc_key",
    *,
    schema: pa.Schema | None = None,
    num_partitions: int = 64,
    broadcast_limit: int = 2_000_000,
):
    """Rows of ``ds`` whose ``key_col`` (int64) is NOT in ``drop_keys`` — the
    near-dup dedup ACTION (keep one representative, drop the rest).

    ``drop_keys``: a Dataset with a single int64 ``key_col`` column (or an
    int64 numpy array for the pre-pulled case). Strategy auto-pick, same gate
    as substring_dedup_clean / line_dedup_global:

    - ``<= broadcast_limit`` drop keys: ship the SORTED key array once via
      ``ray.put`` and anti-join with a vectorized searchsorted filter — the
      big side streams untouched, zero exchanges.
    - larger (billions of clustered docs at the 10^12-row end): a
      key-partitioned UNION-JOIN — both sides get ``part = hash(key) % P``,
      union, ONE sort exchange co-locating each key's payload rows with its
      (possible) drop row, then a per-block vectorized set-difference filter.
      Drop-side rows are ~12 B each; the payload side moves once, exactly as
      any keyed exchange in this package. ``schema`` (the payload table's
      arrow schema, key column included) is required on this path to build
      the null-padded drop rows so the union is schema-stable.

    Null-key semantics (both strategies): a null ``key_col`` in ``ds`` is
    KEPT — a row without a key was never identified as a duplicate, so the
    dedup action cannot apply to it. Null keys in ``drop_keys`` are ignored
    (they cannot name a row to drop). This mirrors asof_join/range_join's
    explicit drop-nulls-on-the-key contract rather than crashing through a
    float64-NaN conversion.
    """
    import pyarrow.compute as pc
    import ray

    def _valid_keys(col) -> tuple[np.ndarray, np.ndarray]:
        """(int64 keys with nulls filled as 0, bool valid mask)."""
        valid = np.asarray(pc.is_valid(col), dtype=bool)
        k = np.asarray(pc.fill_null(pc.cast(col, pa.int64()), 0), dtype=np.int64)
        return k, valid

    if isinstance(drop_keys, np.ndarray):
        n_drop = len(drop_keys)
        small = np.sort(drop_keys.astype(np.int64)) if n_drop <= broadcast_limit else None
        drop_ds = None
    else:
        drop_ds = drop_keys.materialize()  # strategy gate; drop set << corpus
        n_drop = drop_ds.count()
        small = None
        if n_drop <= broadcast_limit:
            small = (
                np.sort(
                    np.asarray(
                        drop_ds.to_pandas()[key_col].dropna(), dtype=np.int64
                    )
                )
                if n_drop
                else np.empty(0, np.int64)
            )

    if small is not None:
        drop_ref = ray.put(small)

        def keep_broadcast(batch: pa.Table) -> pa.Table:
            drop = ray.get(drop_ref)
            k, valid = _valid_keys(batch[key_col])
            if len(drop):
                pos = np.minimum(np.searchsorted(drop, k), len(drop) - 1)
                mask = drop[pos] != k
            else:
                mask = np.ones(len(k), bool)
            return batch.filter(pa.array(mask | ~valid))

        return ds.map_batches(keep_broadcast, batch_format="pyarrow")

    if drop_ds is None:
        import ray.data as rd

        drop_ds = rd.from_arrow(pa.table({key_col: pa.array(drop_keys, pa.int64())}))
    if schema is None:
        # derive from the dataset (executes at most the first block)
        sch = ds.schema()
        schema = pa.schema([pa.field(n, t) for n, t in zip(sch.names, sch.types)])

    names = list(schema.names)

    def payload_rows(batch: pa.Table) -> pa.Table:
        # null keys hash via the filled value; `cut` keeps them unconditionally
        k, _ = _valid_keys(batch[key_col])
        return (
            batch.select(names)
            .append_column("part", pa.array(_hash_part_i64(k, num_partitions), pa.int32()))
            .append_column("is_drop", pa.array(np.zeros(len(k), bool)))
        )

    def drop_rows(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[key_col]))  # null can't name a row
        k = np.asarray(batch[key_col], dtype=np.int64)
        cols = {}
        for f in schema:
            if f.name == key_col:
                cols[f.name] = pa.array(k, pa.int64())
            else:
                cols[f.name] = pa.nulls(len(k), f.type)
        t = pa.table(cols).select(names)
        return (
            t.append_column("part", pa.array(_hash_part_i64(k, num_partitions), pa.int32()))
            .append_column("is_drop", pa.array(np.ones(len(k), bool)))
        )

    unioned = ds.map_batches(payload_rows, batch_format="pyarrow").union(
        drop_ds.map_batches(drop_rows, batch_format="pyarrow")
    )

    def cut(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {f.name: pa.array([], f.type) for f in schema}
            )
        is_drop = np.asarray(block["is_drop"], dtype=bool)
        k, valid = _valid_keys(block[key_col])
        drop = np.unique(k[is_drop])
        keep = ~is_drop
        if len(drop):
            pos = np.minimum(np.searchsorted(drop, k), len(drop) - 1)
            keep &= (drop[pos] != k) | ~valid
        return block.filter(pa.array(keep)).select(names)

    return map_copartitioned(unioned, "part", cut)


def snapshot_diff(
    old_ds,
    new_ds,
    *,
    key_col: str = "doc_id",
    fp_col: str = "fp",
    out_col: str = "status",
):
    """Diff two corpus snapshots by key + content fingerprint: the
    incremental-ingest analytic (what changed between yesterday's crawl and
    today's?) emitting one (key, status) row per difference — ``added``
    (key only in new), ``removed`` (key only in old), ``changed`` (both,
    fingerprints differ). Unchanged rows emit nothing, so output size is
    the churn, not the corpus.

    Shape: each side projects to (key, fp) rows — the fingerprint is
    caller-provided (content_sha256 in the corpus schema), so content never
    moves — then a tagged union and ONE key-keyed exchange; the per-block
    compare is a vectorized outer merge. Snapshot semantics require unique
    keys per side; a duplicated key raises rather than mis-classifying
    (same contract as :func:`keep_latest`'s non-unique order error).
    """
    _SIDES = ("old", "new")

    def tag(side: int):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    key_col: batch[key_col].to_numpy(np.int64),
                    "fp": batch[fp_col].astype(str).to_numpy(object),
                    "side": np.full(len(batch), side, np.int8),
                }
            )

        return f

    u = old_ds.map_batches(tag(0), batch_format="pandas").union(
        new_ds.map_batches(tag(1), batch_format="pandas")
    )

    _empty = pd.DataFrame(
        {key_col: np.empty(0, np.int64), out_col: np.empty(0, object)}
    )

    def compare(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return _empty
        sides = []
        for s in (0, 1):
            part = block.loc[block["side"] == s, [key_col, "fp"]]
            dup = part[key_col].duplicated()
            if dup.any():
                raise ValueError(
                    f"snapshot_diff: duplicate key {part.loc[dup, key_col].iloc[0]!r} "
                    f"in the {_SIDES[s]} snapshot — snapshots must be unique per key "
                    "(run keep_latest first)"
                )
            sides.append(part)
        m = sides[0].merge(
            sides[1], on=key_col, how="outer", indicator=True, suffixes=("_o", "_n")
        )
        status = np.where(
            m["_merge"].to_numpy() == "right_only",
            "added",
            np.where(m["_merge"].to_numpy() == "left_only", "removed", "changed"),
        )
        diff = (m["_merge"] != "both").to_numpy() | (
            m["fp_o"].to_numpy(object) != m["fp_n"].to_numpy(object)
        )
        out = pd.DataFrame(
            {key_col: m[key_col].to_numpy(np.int64), out_col: status}
        )
        return out[diff].reset_index(drop=True)

    return map_copartitioned(u, key_col, compare, batch_format="pandas")
