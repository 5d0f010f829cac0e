"""b-bit MinHash signature kernel — bit-exact vs codelibs/elasticsearch-minhash.

Spec (verified against all six golden fixtures in the reference test
/root/reference/src/test/java/org/codelibs/elasticsearch/minhash/MinHashPluginTest.java:163-171,
semantics documented in SURVEY.md §2.1):

1. k hash functions: murmur3 x64_128 h1 with seed ``base_seed + i`` over the
   token's UTF-16LE bytes, signed int64 (Guava ``asLong``).
2. Per-document signed min over all tokens, accumulator init Long.MAX_VALUE
   (empty token stream ⇒ all accumulators 0x7FFF...FFFF ⇒ for b<=63 every
   sampled bit is 1 ⇒ full-width all-0xFF signature).
3. b-bit sampling LSB-first: bit position p = i*b + j holds bit j of min i.
4. java.util.BitSet packing: LSB-first within each byte; ``toByteArray()``
   drops trailing all-zero bytes (variable-width signatures — reproduced
   exactly, see MinHashFieldMapper.java:271 + SURVEY.md §2.1 step 5).
5. ``compare``: fraction of equal bits over the full k*b width; **0 when the
   stored byte lengths differ** (upstream ``MinHash.compare`` rule).

Everything here is pure numpy / python — no Ray. The Ray stage wrapping this
lives in ``elasticsearch_minhash_ray.stages.signature``.
"""

from __future__ import annotations

import base64
from dataclasses import dataclass, field

import numpy as np

from .murmur3 import hash_tokens_many_seeds, seeds_u64

LONG_MAX = (1 << 63) - 1


@dataclass(frozen=True)
class MinHashConfig:
    """Mirror of the reference's token-filter parameters
    (MinHashTokenFilterFactory.java:39-43) + mapper parameters
    (MinHashFieldMapper.java:80-93).

    - ``num_of_hash`` (k): number of hash functions, reference default 128.
    - ``bit`` (b): bits sampled per hash, reference default 1.
    - ``seed``: base seed, reference default 0.
    - ``tokenizer``: analyzer stand-in (see functions.tokenize), default
      'standard' (UAX#29-ish approximation of ES standard tokenizer).
    - ``null_value``: substitute for null content (MinHashFieldMapper.java:89-90);
      rows still null after substitution produce no signature.
    - ``bit_string``: store '0'/'1' string instead of base64
      (MinHashFieldMapper.java:92-93, 272-274).
    """

    num_of_hash: int = 128
    bit: int = 1
    seed: int = 0
    tokenizer: str = "standard"
    shingle: int = 1
    null_value: str | None = None
    bit_string: bool = False
    name: str = "minhash"
    # analyzer-chain members around the tokenizer (reference README.md:28-42:
    # any char_filter/filter chain may precede the final minhash filter);
    # applied char_filters -> tokenize -> filters -> shingle
    char_filters: tuple = ()
    filters: tuple = ()

    def __post_init__(self):
        if self.num_of_hash < 1:
            raise ValueError(f"num_of_hash must be >= 1, got {self.num_of_hash}")
        if not 1 <= self.bit <= 63:
            raise ValueError(f"bit must be in [1, 63], got {self.bit}")
        if self.shingle < 1:
            raise ValueError(f"shingle must be >= 1, got {self.shingle}")
        # frozen dataclass: coerce list args to hashable tuples + fail fast
        # on unknown filter names (before any actor ships)
        object.__setattr__(self, "char_filters", tuple(self.char_filters))
        object.__setattr__(self, "filters", tuple(self.filters))
        from .tokenize import resolve_filters

        resolve_filters(self.char_filters, self.filters)

    @property
    def sig_bits(self) -> int:
        return self.num_of_hash * self.bit

    @property
    def full_width(self) -> int:
        return (self.sig_bits + 7) // 8

    def config_hash(self) -> str:
        import hashlib

        key = (
            f"{self.num_of_hash}|{self.bit}|{self.seed}|{self.tokenizer}|{self.shingle}"
            f"|{self.null_value}|{self.bit_string}|{','.join(self.char_filters)}"
            f"|{','.join(self.filters)}"
        )
        return hashlib.sha256(key.encode()).hexdigest()[:16]


@dataclass
class MinHasher:
    """Reusable signature computer: holds the precomputed seed vector — the
    analogue of the reference's once-per-index HashFunction[] array
    (MinHashTokenFilterFactory.java:43). Build once per actor, call per batch.

    ``cache_tokens``: cross-batch token→hash-vector cache (per actor). Code
    corpora reuse a small hot vocabulary across millions of files, so after
    warm-up most distinct tokens per batch skip the murmur3 kernel entirely.
    Memory = cache_tokens × k × 8 B (default 100k × 128 → ~100 MB/actor);
    insertion stops when full (first-seen vocabulary wins). 0 disables.
    """

    cfg: MinHashConfig
    cache_tokens: int = 100_000
    _seeds: np.ndarray = field(init=False, repr=False)
    _cache: dict = field(init=False, repr=False, default_factory=dict)

    def __post_init__(self):
        self._seeds = seeds_u64(self.cfg.seed, self.cfg.num_of_hash)

    def _hash_uniques(self, uniques) -> np.ndarray:
        """(n_distinct, k) hash matrix, consulting the cross-batch cache."""
        if not self.cache_tokens:
            return hash_tokens_many_seeds(list(uniques), self._seeds)
        k = self.cfg.num_of_hash
        H = np.empty((len(uniques), k), dtype=np.int64)
        cache = self._cache
        miss_idx: list[int] = []
        for i, tok in enumerate(uniques):
            row = cache.get(tok)
            if row is None:
                miss_idx.append(i)
            else:
                H[i] = row
        if miss_idx:
            Hm = hash_tokens_many_seeds([uniques[i] for i in miss_idx], self._seeds)
            room = self.cache_tokens - len(cache)
            for j, i in enumerate(miss_idx):
                H[i] = Hm[j]
                if j < room:
                    cache[uniques[i]] = Hm[j]
        return H

    # -- min-value computation ------------------------------------------------

    def min_values_for_docs(self, token_lists: list[list[str]]) -> np.ndarray:
        """Signed per-hash min for each doc. Returns (n_docs, k) int64.

        Cost model: murmur3 runs once per (distinct token in batch, seed) —
        duplicate tokens across and within docs are hashed once into H
        (n_distinct, k). The per-doc min is a SIMD ``min(axis=0)`` over the
        doc's gathered hash rows (np.minimum.reduceat measured ~150x slower);
        transient memory per doc is tokens_in_doc * k * 8 B.
        """
        n_docs = len(token_lists)
        k = self.cfg.num_of_hash
        out = np.full((n_docs, k), LONG_MAX, dtype=np.int64)
        flat: list[str] = []
        bounds = [0]
        for toks in token_lists:
            flat.extend(toks)
            bounds.append(len(flat))
        if not flat:
            return out
        import pandas as pd

        codes, uniques = pd.factorize(np.asarray(flat, dtype=object), sort=False)
        H = self._hash_uniques(uniques)  # (n_distinct, k)
        # one reusable scratch buffer for the per-doc gather: a fresh
        # (tokens, k) allocation per doc costs ~5x the min itself in
        # page-fault churn at batch scale
        max_m = max(b - a for a, b in zip(bounds, bounds[1:]))
        scratch = np.empty((max_m, k), dtype=np.int64) if max_m else None
        for d in range(n_docs):
            lo, hi = bounds[d], bounds[d + 1]
            if lo != hi:
                m = hi - lo
                np.take(H, codes[lo:hi], axis=0, out=scratch[:m])
                scratch[:m].min(axis=0, out=out[d])
        return out

    # -- packing ---------------------------------------------------------------

    def pack(self, min_values: np.ndarray) -> list[bytes]:
        """(n, k) signed mins → per-doc truncated signature bytes (BitSet rules)."""
        n = min_values.shape[0]
        if n == 0:
            return []
        b = self.cfg.bit
        u = min_values.view(np.uint64)
        # (n, k, b) bit matrix, LSB-first sampling then LSB-first byte packing
        shifts = np.arange(b, dtype=np.uint64)
        bits = ((u[:, :, None] >> shifts) & np.uint64(1)).astype(np.uint8)
        bits = bits.reshape(n, self.cfg.sig_bits)
        packed = np.packbits(bits, axis=1, bitorder="little")  # (n, full_width)
        # trailing-zero truncation per row (java BitSet.toByteArray)
        w = packed.shape[1]
        nz = packed != 0
        any_nz = nz.any(axis=1)
        last = np.where(any_nz, w - np.argmax(nz[:, ::-1], axis=1), 0)
        rows = packed.tobytes()
        return [rows[i * w : i * w + int(last[i])] for i in range(n)]

    def signatures(self, token_lists: list[list[str]]) -> list[bytes]:
        return self.pack(self.min_values_for_docs(token_lists))


# -- encoders (MinHashFieldMapper.java:272-278) --------------------------------


def to_base64(sig: bytes) -> str:
    return base64.b64encode(sig).decode("ascii")


def from_base64(s: str) -> bytes:
    return base64.b64decode(s)


def to_bit_string(sig: bytes) -> str:
    """'0'/'1' string, LSB-first per byte — matches MinHash.toBinaryString as
    used for the reference's ``bit_string:true`` fields
    (MinHashFieldMapper.java:272-274)."""
    if not sig:
        return ""
    arr = np.frombuffer(sig, dtype=np.uint8)
    bits = np.unpackbits(arr, bitorder="little")
    return "".join("1" if x else "0" for x in bits)


# -- compare (upstream MinHash.compare; capability per README.md:7-8) ----------


def compare(sig_a: bytes, sig_b: bytes) -> float:
    """Fraction of equal bits; 0.0 if byte lengths differ (reference rule —
    truncated signatures only ever match identically-truncated ones)."""
    if len(sig_a) != len(sig_b):
        return 0.0
    if not sig_a:
        return 1.0
    a = np.frombuffer(sig_a, dtype=np.uint8)
    b = np.frombuffer(sig_b, dtype=np.uint8)
    diff = int(np.unpackbits(a ^ b).sum())
    nbits = len(sig_a) * 8
    return (nbits - diff) / nbits


_M5 = np.uint64(0x5555555555555555)
_M3 = np.uint64(0x3333333333333333)
_M0F = np.uint64(0x0F0F0F0F0F0F0F0F)
_M01 = np.uint64(0x0101010101010101)


def popcount_u64_inplace(x: np.ndarray) -> np.ndarray:
    """SWAR popcount over a uint64 array, destroying ``x``. Chosen over a
    byte-LUT gather: ~2.5x faster single-threaded and far fewer memory
    passes, which is what matters when many verify tasks share one memory
    bus (the LSH verify stage is bandwidth-bound, not compute-bound)."""
    t = x >> np.uint64(1)
    t &= _M5
    x -= t
    t = x & _M3
    x >>= np.uint64(2)
    x &= _M3
    x += t
    t = x >> np.uint64(4)
    x += t
    x &= _M0F
    x *= _M01
    x >>= np.uint64(56)
    return x


def sig_u64(mat: np.ndarray) -> np.ndarray:
    """(n, width) uint8 zero-padded signature matrix → (n, ceil(width/8))
    uint64 view (copying only when width isn't a multiple of 8 or the matrix
    isn't contiguous). The u64 layout makes pair gathers 8x fewer elements
    and feeds :func:`popcount_u64_inplace` directly."""
    n, w = mat.shape
    w8 = -(-w // 8) * 8
    if w8 != w:
        pad = np.zeros((n, w8), dtype=np.uint8)
        pad[:, :w] = mat
        mat = pad
    elif not mat.flags.c_contiguous:
        mat = np.ascontiguousarray(mat)
    return mat.view(np.uint64)


def compare_pairs(
    matu: np.ndarray, lens: np.ndarray, ia: np.ndarray, ib: np.ndarray
) -> np.ndarray:
    """Vectorized compare for candidate pairs (ia[j], ib[j]) of rows of a
    shared signature matrix — the LSH verify hot path. ``matu`` is the
    :func:`sig_u64` view; gathering u64 rows (2 elements at the default
    16-byte width) instead of uint8 rows keeps fancy-indexing cost ~8x down.
    Semantics identical to :func:`compare_many` (length rule, full-width
    bits, zero-pad contributes no diffs)."""
    x = matu[ia] ^ matu[ib]
    diff = popcount_u64_inplace(x).sum(axis=1, dtype=np.int64)
    la = lens[ia].astype(np.int64)
    nbits = la * 8
    sim = np.divide(nbits - diff, nbits, out=np.ones(len(diff), dtype=np.float64), where=nbits > 0)
    return np.where(la == lens[ib], sim, 0.0)


class PairComparer:
    """Tiled :func:`compare_pairs` with per-instance scratch buffers — the LSH
    verify hot loop for long-lived workers.

    Why not the plain function: inside a Ray map_groups task the block
    builder's persistent output allocations interleave with numpy's large
    transient ones, defeating glibc's free-list reuse, so every call faults
    fresh pages (measured on the 600k-doc bench: identical per-partition
    verify work ran ~4x slower inside Ray workers than in a bare
    multiprocessing pool). Preallocated tiles pin the working set to stable,
    warm pages; a worker process reuses one instance across all its tasks
    (Ray caches the deserialized callable)."""

    def __init__(self, tile: int = 1 << 18):
        self.tile = tile
        self._w8 = -1

    def _ensure(self, w8: int) -> None:
        if self._w8 != w8:
            T = self.tile
            self._xa = np.empty((T, w8), np.uint64)
            self._xb = np.empty((T, w8), np.uint64)
            self._t = np.empty((T, w8), np.uint64)
            self._d = np.empty(T, np.int64)
            self._la = np.empty(T, np.int64)
            self._nb = np.empty(T, np.int64)
            self._eq = np.empty(T, bool)
            self._pos = np.empty(T, bool)
            self._w8 = w8

    def __call__(
        self, matu: np.ndarray, lens: np.ndarray, ia: np.ndarray, ib: np.ndarray
    ) -> np.ndarray:
        self._ensure(matu.shape[1])
        n = len(ia)
        sim = np.empty(n, np.float64)
        T = self.tile
        one = np.uint64(1)
        for s in range(0, n, T):
            e = min(s + T, n)
            m = e - s
            xa, xb, t = self._xa[:m], self._xb[:m], self._t[:m]
            np.take(matu, ia[s:e], axis=0, out=xa)
            np.take(matu, ib[s:e], axis=0, out=xb)
            np.bitwise_xor(xa, xb, out=xa)
            # SWAR popcount, fully in scratch
            np.right_shift(xa, one, out=t)
            np.bitwise_and(t, _M5, out=t)
            np.subtract(xa, t, out=xa)
            np.bitwise_and(xa, _M3, out=t)
            np.right_shift(xa, np.uint64(2), out=xa)
            np.bitwise_and(xa, _M3, out=xa)
            np.add(xa, t, out=xa)
            np.right_shift(xa, np.uint64(4), out=t)
            np.add(xa, t, out=xa)
            np.bitwise_and(xa, _M0F, out=xa)
            np.multiply(xa, _M01, out=xa)
            np.right_shift(xa, np.uint64(56), out=xa)
            d = self._d[:m]
            xa.sum(axis=1, dtype=np.int64, out=d)
            la, nb = self._la[:m], self._nb[:m]
            np.take(lens, ia[s:e], out=la)
            np.take(lens, ib[s:e], out=nb)  # nb holds lens_b briefly
            eq = self._eq[:m]
            np.equal(la, nb, out=eq)
            np.multiply(la, 8, out=nb)  # nb = nbits
            np.subtract(nb, d, out=d)  # d = nbits - diff
            pos = self._pos[:m]
            np.greater(nb, 0, out=pos)
            out_sl = sim[s:e]
            out_sl.fill(1.0)  # nbits <= 0 (empty stored sig): defined as 1.0
            np.divide(d, nb, out=out_sl, where=pos)
            np.multiply(out_sl, eq, out=out_sl)  # length-mismatch rule -> 0.0
        return sim


def compare_many(
    sigs_a: np.ndarray, sigs_b: np.ndarray, lens_a: np.ndarray, lens_b: np.ndarray, width: int
) -> np.ndarray:
    """Vectorized compare over m pairs.

    sigs_a/sigs_b: (m, width) uint8, zero-padded to the config's full width.
    lens_a/lens_b: stored (truncated) byte lengths. Pairs with unequal stored
    lengths get similarity 0.0 (reference length rule). Equal-length pairs are
    scored over the full k*b bit width — zero-padding is transient only, as
    decided in SURVEY.md §2.1 step 5.
    """
    x = sig_u64(sigs_a) ^ sig_u64(sigs_b)
    diff = popcount_u64_inplace(x).sum(axis=1, dtype=np.int64)
    # reference compares over the STORED arrays: nbits = stored_len * 8; the
    # zero padding beyond the stored length contributes no diff bits.
    nbits = lens_a.astype(np.int64) * 8
    sim = np.divide(nbits - diff, nbits, out=np.ones(len(diff), dtype=np.float64), where=nbits > 0)
    return np.where(lens_a == lens_b, sim, 0.0)


def bbit_jaccard_estimate(r: float | np.ndarray, b: int) -> float | np.ndarray:
    """Li & König b-bit estimator: Ĵ = (r − 2^−b) / (1 − 2^−b) for uniform
    collision floor 2^−b; clipped at 0."""
    floor = 2.0**-b
    return np.maximum(0.0, (r - floor) / (1.0 - floor))
