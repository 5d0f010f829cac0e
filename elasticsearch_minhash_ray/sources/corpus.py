"""Corpus source: canonical input schema, key derivation, documents-table adapter.

Canonical corpus schema (BASELINE.json ``input_hint``):
    (repo: string, path: string, commit: string, lang: string, content: string)

Derived columns added by :func:`prepare_batch` (FIXTURES.md):
    doc_id         = sha256(repo ‖ "/" ‖ path ‖ "@" ‖ commit) hex   — stable row key
    doc_key        = int64 from first 8 bytes of doc_id (sign-bit cleared) —
                     compact shuffle/cluster key; collision odds ~2^-63 per pair.
                     At the north-rule 10^12 rows the birthday expectation is
                     ~5e4 colliding pairs — :func:`detect_key_collisions` audits
                     them in one keyed exchange and
                     :func:`resolve_key_collisions` deterministically remaps the
                     colliders (PipelineConfig.resolve_key_collisions wires it
                     into the flagship pipeline)
    content_sha256 = sha256(content) hex — the per-row invariant the reference
                     comparison preserves end-to-end (BASELINE.json input_hint)

The reference's analogue of doc identity is the ES ``_id`` routing key
(SURVEY.md §3.1); signature compute is embarrassingly parallel per row, so the
prepare step is a stateless ``map_batches``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def _sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def doc_key_from_id(doc_id_hex: str) -> int:
    """int64 key from the first 16 hex chars, sign bit cleared (>=0 so it
    round-trips through DuckDB BIGINT and parquet int64 without surprises)."""
    return int(doc_id_hex[:16], 16) & 0x7FFFFFFFFFFFFFFF


def prepare_batch(batch: pa.Table) -> pa.Table:
    """Add doc_id / doc_key / content_sha256. Vectorized where Arrow allows;
    the sha256 itself is a per-row C call (hashlib) — O(bytes), unavoidable."""
    ident = pc.binary_join_element_wise(
        pc.binary_join_element_wise(batch["repo"], batch["path"], "/"),
        batch["commit"],
        "@",
    ).to_pylist()
    doc_ids = [_sha256_hex(s.encode("utf-8")) for s in ident]
    doc_keys = np.fromiter((doc_key_from_id(d) for d in doc_ids), dtype=np.int64, count=len(doc_ids))
    content = batch["content"].to_pylist()
    content_sha = [None if c is None else _sha256_hex(c.encode("utf-8")) for c in content]
    return (
        batch.append_column("doc_id", pa.array(doc_ids, pa.string()))
        .append_column("doc_key", pa.array(doc_keys, pa.int64()))
        .append_column("content_sha256", pa.array(content_sha, pa.string()))
    )


def _path_bytes(path: str) -> int:
    import os

    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def auto_num_blocks(total_bytes: int, cpus: int | None = None, dense: bool = False) -> int:
    """Block count sized to the DATA, not a fixed parallelism constant.

    Ray's default parallelism heuristic happily splits a 1.5 MB file into 64
    blocks of ~80 rows; every later sort/groupby then pays O(blocks^2) shuffle
    tasks of pure scheduling overhead. Rules (scale-safe in both directions):
    - blocks never smaller than ~512 KB (kills tiny-block shuffle overhead)
    - blocks never larger than ~64 MB (bounds per-task heap + enables
      streaming/spilling at the 100 TB end)
    - otherwise aim for 2 blocks per CPU for full pipeline parallelism

    ``dense=True`` drops the small-block floor to 64 KB for COMPUTE-dense
    map-only stages (tokenize/shingle/hash text, embedding matmuls): there
    per-row CPU dominates on-disk bytes by orders of magnitude, so a 600 KB
    file is minutes of work that the 512 KB floor would pin to ONE task.
    Shuffle-bound pipelines keep the default floor — tiny blocks are only
    a problem when every block becomes O(blocks) exchange tasks.
    """
    import os

    if cpus is None:
        cpus = os.cpu_count() or 8
    floor = (64 << 10) if dense else (512 << 10)
    min_blocks = max(1, total_bytes // (64 << 20))
    max_blocks = max(1, total_bytes // floor)
    return int(max(min_blocks, min(cpus * 2, max_blocks)))


def _parquet_files(path: str) -> list[str]:
    import os

    if os.path.isfile(path):
        return [path]
    out: list[str] = []
    if os.path.isdir(path):
        for root, _dirs, files in sorted(os.walk(path)):
            out.extend(os.path.join(root, f) for f in sorted(files) if f.endswith(".parquet"))
    return out


# Above this many files, skip the per-footer schema-equality scan and let Ray
# unify schemas itself (driver-side footer reads would serialize a 100k-file
# listing); below it the scan is a handful of metadata-only reads.
_SCHEMA_SCAN_MAX_FILES = 32


def _stripped_schema(paths: list, columns: list[str] | None = None) -> "pa.Schema | None":
    """File schema with key-value metadata removed.

    pandas-written parquet carries a ``b'pandas'`` metadata blob; pyarrow's
    ``Schema.__hash__`` raises on it (dict inside), which makes Ray's
    block-schema dedup fall back with a per-task warning and the slow
    unification path. Passing an explicit metadata-free schema to
    ``read_parquet`` keeps block schemas hashable (and identical across
    files).

    Heterogeneous multi-file dirs (e.g. the shard_by='file' incremental path
    appended to by a different writer: string vs large_string, widened ints)
    must NOT be force-cast to the first file's schema — the schema is only
    returned when every file's (pruned) schema is IDENTICAL; on mismatch, or
    when the dir is too large to scan footers, fall back to Ray's own
    unification. Best-effort: any failure returns None and the reader
    behaves as before."""
    import pyarrow.parquet as pq

    try:
        files = [f for p in paths for f in _parquet_files(p)]
        if not files or len(files) > _SCHEMA_SCAN_MAX_FILES:
            return None
        schema = None
        for f in files:
            s = pq.read_schema(f).remove_metadata()
            if columns is not None:
                # ray prunes blocks to `columns`; the declared schema must match
                s = pa.schema([s.field(c) for c in columns])
            if schema is None:
                schema = s
            elif not schema.equals(s):
                return None  # heterogeneous: let Ray unify
        hash(schema)  # what Ray needs to work
        return schema
    except Exception:
        return None


def read_parquet_auto(path, columns: list[str] | None = None, dense: bool = False, **kwargs):
    """``ray.data.read_parquet`` with column pruning and data-sized blocks.
    ``dense=True`` for compute-dense map-only consumers (see
    :func:`auto_num_blocks`)."""
    import ray.data as rd

    paths = path if isinstance(path, list) else [path]
    total = sum(_path_bytes(p) for p in paths)
    kwargs.setdefault("override_num_blocks", auto_num_blocks(total, dense=dense))
    if "schema" not in kwargs:
        schema = _stripped_schema(paths, columns)
        if schema is not None:
            kwargs["schema"] = schema
    return rd.read_parquet(path, columns=columns, **kwargs)


def read_corpus(path: str, columns: list[str] | None = None, **kwargs):
    """Read a corpus parquet directory/file as a Dataset (column-pruned)."""
    return read_parquet_auto(path, columns=columns or CORPUS_COLUMNS, **kwargs)


def documents_as_corpus(sf_dir: str, **kwargs):
    """Adapt the driver testdata ``documents`` table (doc_id, text, lang,
    source, n_chars) to the canonical corpus schema: repo=source,
    path=str(doc_id), commit='v0', content=text."""
    kwargs.setdefault("dense", True)  # feeds tokenize/hash stages: compute-dense
    ds = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"], **kwargs
    )

    def to_corpus(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["source"],
                "path": pc.cast(t["doc_id"], pa.string()),
                "commit": pa.array(["v0"] * len(t), pa.string()),
                "lang": t["lang"],
                "content": t["text"],
            }
        )

    return ds.map_batches(to_corpus, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# 63-bit doc_key birthday-collision audit + deterministic resolution
# ---------------------------------------------------------------------------

_KEY_MIX = np.uint64(0x9E3779B97F4A7C15)
_KEY_MASK = 0x7FFFFFFFFFFFFFFF


def detect_key_collisions(ds, key_col: str = "doc_key", id_col: str = "doc_id", num_partitions: int = 256):
    """(doc_key, doc_id) rows for every row whose doc_key is shared by more
    than one DISTINCT doc_id — the 63-bit birthday audit. At the north-rule
    10^12 rows the expectation is ~5e4 colliding pairs: invisible at test
    scale but enough to corrupt cluster assignments, so the audit is a
    first-class stage. One hash exchange over per-block-distinct (key, id)
    pairs (a combiner keeps the exchange at one ~80 B row per distinct doc
    per block)."""
    import pandas as pd

    from ..grouping import map_copartitioned

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, id_col]).to_pandas().drop_duplicates()
        k = df[key_col].to_numpy(np.int64)
        with np.errstate(over="ignore"):
            df["part"] = ((k.view(np.uint64) * _KEY_MIX) % np.uint64(num_partitions)).astype(
                np.int32
            )
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates([key_col, id_col])
        if len(df):
            df = df[df.groupby(key_col)[id_col].transform("nunique") > 1]
        return pa.Table.from_pandas(df[[key_col, id_col]], preserve_index=False)

    return map_copartitioned(ds.map_batches(partial, batch_format="pyarrow"), "part", final)


def _fallback_keys(doc_id_hex: str):
    """Deterministic replacement-key sequence for a colliding doc: the next
    three 63-bit slices of the doc's sha256, then salted rehashes — all
    derived from doc_id only, so resolution is stable across runs/shards."""
    for j in (1, 2, 3):
        yield int(doc_id_hex[16 * j : 16 * (j + 1)], 16) & _KEY_MASK
    j = 0
    while True:
        j += 1
        yield int(_sha256_hex(f"{doc_id_hex}:{j}".encode())[:16], 16) & _KEY_MASK


def resolve_key_collisions(ds, key_col: str = "doc_key", id_col: str = "doc_id", num_partitions: int = 256):
    """Return ``ds`` with colliding doc_keys deterministically remapped so
    every distinct doc_id holds a distinct key: per colliding key, the min
    doc_id keeps it; every other doc moves to the first fallback slice of
    its own sha256 not already used by the colliding set.

    Scale shape: detection is one keyed exchange (see
    :func:`detect_key_collisions`); the colliding set is ~1e-7 of rows at
    10^12 docs, so the (doc_id → new_key) map broadcasts once via ray.put
    and the remap is a streaming map_batches. Residual risk — a fallback key
    landing on an existing key OUTSIDE the colliding set — is ~n/2^63 per
    remapped doc (≈5e-3 expected hits corpus-wide at 10^12 rows); re-running
    the audit on the output would catch even that."""
    import ray

    coll = detect_key_collisions(ds, key_col, id_col, num_partitions).to_pandas()
    if coll.empty:
        return ds
    coll = coll.sort_values([key_col, id_col])
    used = set(coll[key_col].astype(int))
    remap: dict[str, int] = {}
    for _key, grp in coll.groupby(key_col):
        for d in list(grp[id_col])[1:]:  # min doc_id keeps the key
            cand = next(c for c in _fallback_keys(d) if c not in used)
            remap[d] = cand
            used.add(cand)
    ckeys = np.sort(coll[key_col].unique().astype(np.int64))
    # sorted parallel arrays instead of a dict: the remap application is then
    # two C searchsorted passes (keys, then the hit rows' ids), no Series.map
    rm_ids = np.array(sorted(remap), dtype=np.str_)
    rm_keys = np.array([remap[i] for i in sorted(remap)], dtype=np.int64)
    ref = ray.put((ckeys, rm_ids, rm_keys))

    def apply(batch: pa.Table) -> pa.Table:
        keys_sorted, ids_sorted, new_keys = ray.get(ref)
        k = np.asarray(batch[key_col], dtype=np.int64)
        pos = np.minimum(np.searchsorted(keys_sorted, k), len(keys_sorted) - 1)
        hit = keys_sorted[pos] == k
        if not hit.any():
            return batch
        idx = np.flatnonzero(hit)  # only colliding-key rows touch the id array
        ids = np.asarray(batch[id_col].take(pa.array(idx)).to_pylist(), dtype=np.str_)
        p2 = np.minimum(np.searchsorted(ids_sorted, ids), len(ids_sorted) - 1)
        moved = ids_sorted[p2] == ids  # keeper rows miss — they keep the key
        k2 = k.copy()
        k2[idx[moved]] = new_keys[p2[moved]]
        return batch.set_column(
            batch.schema.get_field_index(key_col), key_col, pa.array(k2, pa.int64())
        )

    return ds.map_batches(apply, batch_format="pyarrow")
