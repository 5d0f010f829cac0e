"""Signature stage — Ray Data analogue of MinHashFieldMapper.parseCreateField
(/root/reference/.../MinHashFieldMapper.java:252-295).

A callable class for ``Dataset.map_batches(SignatureStage(cfgs), ...)``: the
constructor precomputes per-config tokenizers and seed state (the reference's
once-per-index ``HashFunction[]``, MinHashTokenFilterFactory.java:43); each
``__call__`` processes one zero-copy Arrow batch.

Semantics mirrored per config:
- null content → substitute ``null_value`` (MinHashFieldMapper.java:261-262);
  still null → NO signature (null cell; the reference simply skips the field,
  :267-269).
- ``copy_to`` fan-out (MinHashPluginTest.java:108-113): pass N configs — one
  signature column ``minhash_<name>`` per config, computed in a single pass;
  configs sharing a (tokenizer, shingle) pair share the tokenization.
- encodings (MinHashFieldMapper.java:272-278): raw ``binary`` signature always;
  optional base64 / bit-string string columns via ``encode=``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.minhash import MinHasher, MinHashConfig, to_base64, to_bit_string
from ..functions.tokenize import get_batch_tokenizer


class SignatureStage:
    def __init__(
        self,
        configs: list[MinHashConfig] | MinHashConfig,
        content_col: str = "content",
        drop_content: bool = True,
        encode: str | None = None,  # None | "base64" | "bit_string" | "auto"
        keep_columns: tuple[str, ...] | None = None,  # project output in-stage
    ):
        if isinstance(configs, MinHashConfig):
            configs = [configs]
        if len({c.name for c in configs}) != len(configs):
            raise ValueError("each MinHashConfig needs a distinct .name")
        self.configs = configs
        self.content_col = content_col
        self.drop_content = drop_content
        self.encode = encode
        self.keep_columns = keep_columns
        self._hashers = [MinHasher(c) for c in configs]
        # share tokenization across configs with identical analyzer settings
        # (tokenizer + shingle + the full filter chain); batch tokenizers
        # amortize the vectorized UAX#29 passes per BATCH
        self._tok_key = [(c.tokenizer, c.shingle, c.char_filters, c.filters) for c in configs]
        self._tokenizers = {key: get_batch_tokenizer(*key) for key in set(self._tok_key)}

    def __call__(self, batch: pa.Table) -> pa.Table:
        content = batch[self.content_col].to_pylist()
        n = len(content)
        token_cache: dict[tuple, list] = {}
        for cfg, hasher, tkey in zip(self.configs, self._hashers, self._tok_key):
            vals = [c if c is not None else cfg.null_value for c in content]
            valid = [i for i, v in enumerate(vals) if v is not None]
            if tkey not in token_cache:
                # tokenize every row once per analyzer config (None-safe)
                token_cache[tkey] = self._tokenizers[tkey](vals)
            toks = token_cache[tkey]
            sigs = hasher.signatures([toks[i] for i in valid])
            col: list[bytes | None] = [None] * n
            for i, s in zip(valid, sigs):
                col[i] = s
            sig_arr = pa.array(col, pa.binary())
            batch = batch.append_column(f"minhash_{cfg.name}", sig_arr)
            if self.encode == "base64" or (self.encode == "auto" and not cfg.bit_string):
                batch = batch.append_column(
                    f"minhash_{cfg.name}_b64",
                    pa.array([None if s is None else to_base64(s) for s in col], pa.string()),
                )
            elif self.encode == "bit_string" or (self.encode == "auto" and cfg.bit_string):
                batch = batch.append_column(
                    f"minhash_{cfg.name}_bits",
                    pa.array([None if s is None else to_bit_string(s) for s in col], pa.string()),
                )
        if self.keep_columns is not None:
            # project inside the stage — an extra Ray operator for a column
            # select costs a full block copy + scheduling for zero work
            return batch.select([c for c in self.keep_columns if c in batch.schema.names])
        if self.drop_content:
            # content can be MBs/row; drop right after hashing so downstream
            # shuffles move only keys + 16-byte signatures (SURVEY.md §4)
            batch = batch.drop_columns([self.content_col])
        return batch


class SigMatrixBuilder:
    """Scratch-buffered :func:`sig_matrix` for hot per-partition callers
    (BucketPairer). Same output; all large intermediates live in grown
    per-instance buffers so long-lived workers reuse warm pages instead of
    faulting fresh ones every call (see PairComparer's rationale in
    functions/minhash.py). The returned matrix is a VIEW into the scratch —
    valid until the next call; callers copy (e.g. ``mat[order]``) before
    holding on to it."""

    def __init__(self):
        self._cap = 0
        self._width = -1

    def _ensure(self, n: int, width: int) -> None:
        if n > self._cap or width != self._width:
            cap = max(n, self._cap, 1024)
            self._idx = np.empty((cap, width), np.int64)
            self._valid = np.empty((cap, width), bool)
            self._mat = np.empty((cap, width), np.uint8)
            self._lens = np.empty(cap, np.int64)
            self._cap, self._width = cap, width

    def __call__(
        self, sig_col: pa.ChunkedArray | pa.Array, width: int
    ) -> tuple[np.ndarray, np.ndarray]:
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        n = len(sig_col)
        if n == 0:
            return np.zeros((0, width), np.uint8), np.empty(0, np.int64)
        self._ensure(n, width)
        lens = self._lens[:n]
        off0 = sig_col.offset
        buffers = sig_col.buffers()
        offsets = np.frombuffer(buffers[1], dtype=np.int32)[off0 : off0 + n + 1].astype(np.int64)
        data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
        lengths = offsets[1:] - offsets[:-1]
        np.copyto(lens, lengths)
        if sig_col.null_count:
            lens[np.asarray(sig_col.is_null())] = -1
        # gather-with-clamp instead of the triple-index scatter: one (n, width)
        # take from the data buffer + one mask multiply, all in scratch
        idx, valid, mat = self._idx[:n], self._valid[:n], self._mat[:n]
        col = np.arange(width, dtype=np.int64)
        np.add(offsets[:-1, None], col[None, :], out=idx)
        np.less(col[None, :], np.minimum(lengths, width)[:, None], out=valid)
        np.minimum(idx, max(len(data) - 1, 0), out=idx)
        if len(data):
            np.take(data, idx, out=mat)
        else:
            mat.fill(0)
        np.multiply(mat, valid, out=mat)
        return mat, lens


def sig_matrix(sig_col: pa.ChunkedArray | pa.Array, width: int) -> tuple[np.ndarray, np.ndarray]:
    """Zero-pad a (possibly truncated) binary signature column to a fixed-width
    uint8 matrix + stored-length vector — the transient padding used by the
    Hamming kernels (SURVEY.md §2.1 step 5). Null signatures get length -1."""
    if isinstance(sig_col, pa.ChunkedArray):
        sig_col = sig_col.combine_chunks()
    n = len(sig_col)
    mat = np.zeros((n, width), dtype=np.uint8)
    lens = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return mat, lens
    # vectorized over the Arrow binary buffers (no per-row as_py)
    off0 = sig_col.offset
    buffers = sig_col.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int32)[off0 : off0 + n + 1].astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    lengths = offsets[1:] - offsets[:-1]
    valid = np.ones(n, dtype=bool)
    if sig_col.null_count:
        valid = ~np.asarray(sig_col.is_null())
    lens[valid] = lengths[valid]
    lengths = np.where(valid, np.minimum(lengths, width), 0)
    total = int(lengths.sum())
    if total:
        row_idx = np.repeat(np.arange(n), lengths)
        starts = np.repeat(offsets[:-1], lengths)
        col_idx = np.arange(total) - np.repeat(np.cumsum(lengths) - lengths, lengths)
        mat[row_idx, col_idx] = data[starts + col_idx]
    return mat, lens
