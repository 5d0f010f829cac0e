"""Vectorized MurmurHash3 x64_128 (h1 only), Guava-compatible.

Semantics pinned by the reference plugin's golden fixtures
(/root/reference/src/test/java/org/codelibs/elasticsearch/minhash/MinHashPluginTest.java:163-171):
the upstream `org.codelibs:minhash` library hashes each token with Guava's
``Hashing.murmur3_128(seed + i).hashUnencodedChars(token).asLong()``
(invoked via MinHashTokenFilterFactory.java:43 / MinHashFieldMapper.java:271), i.e.

- input bytes are the token's **UTF-16LE** encoding (``hashUnencodedChars``
  feeds java chars little-endian), NOT UTF-8;
- the 32-bit seed is sign-extended into both 64-bit lanes (h1 = h2 = (long) seed);
- ``asLong()`` returns the first 8 digest bytes little-endian = finalized h1,
  interpreted as **signed** int64.

Two entry points:

- :func:`murmur3_h1_scalar` — pure-python reference, used as the spec in tests.
- :func:`hash_tokens_many_seeds` — numpy-vectorized over (tokens x seeds); this
  is the hot kernel, O(distinct_tokens * k) hashes per batch with all arithmetic
  in uint64 numpy arrays (wrapping multiply/add, zero Python per-token work
  inside a length-group).
"""

from __future__ import annotations

import struct

import numpy as np

_MASK = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
_F1 = 0xFF51AFD7ED558CCD
_F2 = 0xC4CEB9FE1A85EC53

_U = np.uint64


def _seed_to_u64(seed: int) -> int:
    """Java int seed sign-extended to a long, as unsigned 64-bit."""
    s = seed & 0xFFFFFFFF
    if s >= 1 << 31:
        s |= 0xFFFFFFFF00000000
    return s


# ---------------------------------------------------------------------------
# scalar spec (kept as the executable specification; tests compare against it)
# ---------------------------------------------------------------------------


def _rotl_s(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix_s(k: int) -> int:
    k ^= k >> 33
    k = (k * _F1) & _MASK
    k ^= k >> 33
    k = (k * _F2) & _MASK
    k ^= k >> 33
    return k


def murmur3_h1_scalar(data: bytes, seed: int) -> int:
    """Finalized h1 of murmur3 x64_128, returned as SIGNED int64 (Guava asLong)."""
    h1 = h2 = _seed_to_u64(seed)
    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<QQ", data, i * 16)
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl_s(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
        h1 = _rotl_s(h1, 27)
        h1 = (h1 + h2) & _MASK
        h1 = (h1 * 5 + 0x52DCE729) & _MASK
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl_s(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
        h2 = _rotl_s(h2, 31)
        h2 = (h2 + h1) & _MASK
        h2 = (h2 * 5 + 0x38495AB5) & _MASK
    tail = data[nblocks * 16 :]
    if tail:
        k1, k2 = struct.unpack("<QQ", tail + b"\0" * (16 - len(tail)))
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl_s(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl_s(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    h1 = _fmix_s(h1)
    h2 = _fmix_s(h2)
    h1 = (h1 + h2) & _MASK
    return h1 - (1 << 64) if h1 >= (1 << 63) else h1


# ---------------------------------------------------------------------------
# vectorized kernel
# ---------------------------------------------------------------------------


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U(r)) | (x >> _U(64 - r))


def _fmix(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> _U(33))
    k = k * _U(_F1)
    k = k ^ (k >> _U(33))
    k = k * _U(_F2)
    k = k ^ (k >> _U(33))
    return k


def _mix_k1(k1: np.ndarray) -> np.ndarray:
    k1 = k1 * _U(_C1)
    k1 = _rotl(k1, 31)
    return k1 * _U(_C2)


def _mix_k2(k2: np.ndarray) -> np.ndarray:
    k2 = k2 * _U(_C2)
    k2 = _rotl(k2, 33)
    return k2 * _U(_C1)


def seeds_u64(base_seed: int, k: int) -> np.ndarray:
    """The k hash-function seeds (base_seed + i, sign-extended), shape (k,)."""
    return np.array([_seed_to_u64(base_seed + i) for i in range(k)], dtype=np.uint64)


def _hash_group(data: np.ndarray, byte_len: int, seeds: np.ndarray) -> np.ndarray:
    """Hash g equal-length byte rows against all seeds.

    data: (g, padded_len) uint8 where padded_len = 16*ceil(byte_len/16) and
    bytes beyond byte_len are zero. Returns (g, k) uint64 finalized h1.
    """
    g = data.shape[0]
    k = seeds.shape[0]
    nblocks = byte_len // 16
    tail = byte_len % 16
    # per-row block words, little-endian uint64 pairs
    words = data.view("<u8").reshape(g, -1)  # (g, padded_len/8)
    h1 = np.broadcast_to(seeds, (g, k)).copy()
    h2 = h1.copy()
    for i in range(nblocks):
        mk1 = _mix_k1(words[:, 2 * i])[:, None]  # (g,1) — seed-independent
        mk2 = _mix_k2(words[:, 2 * i + 1])[:, None]
        h1 ^= mk1
        h1 = _rotl(h1, 27)
        h1 += h2
        h1 = h1 * _U(5) + _U(0x52DCE729)
        h2 ^= mk2
        h2 = _rotl(h2, 31)
        h2 += h1
        h2 = h2 * _U(5) + _U(0x38495AB5)
    if tail:
        # zero-padded tail == Guava's byte-at-a-time tail assembly
        h1 ^= _mix_k1(words[:, 2 * nblocks])[:, None]
        h2 ^= _mix_k2(words[:, 2 * nblocks + 1])[:, None]
    ln = _U(byte_len)
    h1 ^= ln
    h2 ^= ln
    h1 += h2
    h2 += h1
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 += h2
    return h1


def hash_tokens_many_seeds(tokens: list[str] | np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """murmur3_128(seed_j).hashUnencodedChars(token_i).asLong() for all (i, j).

    Returns int64 array of shape (n_tokens, k). Tokens are grouped by UTF-16LE
    byte length so each group is one fully-vectorized pass (no per-token Python
    inside the mixing loop).
    """
    n = len(tokens)
    k = seeds.shape[0]
    out = np.empty((n, k), dtype=np.int64)
    if n == 0:
        return out
    enc = [t.encode("utf-16-le") for t in tokens]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    order = np.argsort(lens, kind="stable")
    with np.errstate(over="ignore"):
        start = 0
        while start < n:
            byte_len = int(lens[order[start]])
            stop = start
            while stop < n and lens[order[stop]] == byte_len:
                stop += 1
            idx = order[start:stop]
            g = stop - start
            padded = 16 * (byte_len // 16 + 1) if byte_len % 16 else max(byte_len, 16)
            buf = np.zeros((g, padded), dtype=np.uint8)
            if byte_len:
                flat = b"".join(enc[i] for i in idx)
                buf[:, :byte_len] = np.frombuffer(flat, dtype=np.uint8).reshape(g, byte_len)
            out[idx] = _hash_group(buf, byte_len, seeds).view(np.int64)
            start = stop
    return out
