"""Corpus source: canonical input schema, key derivation, documents-table adapter.

Canonical corpus schema (BASELINE.json ``input_hint``):
    (repo: string, path: string, commit: string, lang: string, content: string)

Derived columns added by :func:`prepare_batch` (FIXTURES.md):
    doc_id         = sha256(repo ‖ "/" ‖ path ‖ "@" ‖ commit) hex   — stable row key
    doc_key        = int64 from first 8 bytes of doc_id (sign-bit cleared) —
                     compact shuffle/cluster key; collision odds ~2^-63 per pair
                     (document-level: at 10^12 rows a 128-bit key would be used;
                     doc_id string is carried everywhere so collisions are
                     detectable and the wide key is available)
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


def _first_parquet_file(path: str) -> str | None:
    import os

    if os.path.isfile(path):
        return path
    if os.path.isdir(path):
        for root, _dirs, files in sorted(os.walk(path)):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    return os.path.join(root, f)
    return None


def _stripped_schema(paths: list, columns: list[str] | None = None) -> "pa.Schema | None":
    """File schema with key-value metadata removed.

    pandas-written parquet carries a ``b'pandas'`` metadata blob; pyarrow's
    ``Schema.__hash__`` raises on it (dict inside), which makes Ray's
    block-schema dedup fall back with a per-task warning and the slow
    unification path. Passing an explicit metadata-free schema to
    ``read_parquet`` keeps block schemas hashable (and identical across
    files). Best-effort: any failure returns None and the reader behaves
    as before."""
    import pyarrow.parquet as pq

    try:
        f = _first_parquet_file(paths[0]) if paths else None
        if f is None:
            return None
        schema = pq.read_schema(f).remove_metadata()
        if columns is not None:
            # ray prunes blocks to `columns`; the declared schema must match
            schema = pa.schema([schema.field(c) for c in columns])
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
