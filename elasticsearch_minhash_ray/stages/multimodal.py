"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool map_batches stages.

Decode kernels, in order of realism:
  * ``decoder="builtin"`` — REAL decode of real on-the-wire formats via
    ``functions/codecs.py`` (24-bit BMP images, PCM16 RIFF/WAVE audio, RVID
    length-prefixed BMP-frame video): header parse + vectorized numpy pixel/
    sample reconstruction, then a deterministic signal-downsample feature
    extractor. No external libraries needed.
  * ``decoder=<callable(payload, meta) -> float32[dim]>`` — injection seam
    for codec-equipped environments (PIL/av/torchaudio wrappers).
  * ``decoder="fake"`` — sha-seeded pseudo-features; keeps plumbing testable
    when payloads are not decodable media.
  * ``decoder="real"`` — names the system deps missing from this container
    for formats the builtin codecs don't cover (JPEG/MP4/...).

Conventions:
    media table: (media_id:int64, kind:string, payload:binary, meta:string)
    decode output: features fixed_size_list<float32>[feature_dim] (+ width/
    height for images, n_frames for video sampling)
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

from ..functions import codecs

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("meta", pa.string()),  # JSON metadata (codec, dims, sample rate...)
    ]
)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-features: sha256-seeded uniform floats — a stable
    stand-in for a real encoder so downstream stages are exercised end-to-end."""
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "big")
    return np.random.default_rng(seed).random(dim, dtype=np.float32)


def _resample_1d(sig: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic nearest-index downsample of a 1-D signal to exactly
    ``dim`` floats (pixel-center sampling, same rule as codecs.resize_nearest)."""
    n = sig.shape[0]
    if n == 0:
        return np.zeros(dim, np.float32)
    idx = np.minimum(((np.arange(dim) + 0.5) * n / dim).astype(np.int64), n - 1)
    return sig[idx].astype(np.float32)


def _builtin_features(payload: bytes, kind: str, dim: int) -> np.ndarray:
    """REAL feature extraction over real codecs: decode the payload with
    functions/codecs.py and downsample the normalized signal to ``dim``
    floats. Deterministic, library-free, and faithful to the decoded signal
    (nearest-downsample: any change to a SAMPLED pixel/sample changes the
    features; with dim >= signal length every position is sampled).

      image: BMP -> grayscale (channel mean / 255) raster scan -> resample
      audio: WAV -> channel-mean mono / 32768 -> resample
      video: RVID -> <=4 evenly-sampled frames (ONLY those frames decoded,
             via the container's length prefixes) -> per-frame grayscale
             resample -> mean over sampled frames
    """
    if kind == "image":
        img = codecs.decode_bmp(payload)
        return _resample_1d(img.astype(np.float32).mean(axis=2).ravel() / 255.0, dim)
    if kind == "audio":
        arr, _rate = codecs.decode_wav(payload)
        return _resample_1d(arr.astype(np.float32).mean(axis=1) / 32768.0, dim)
    if kind == "video":
        n_frames = codecs.video_n_frames(payload)
        step = max(1, n_frames // 4)
        indices = list(range(0, n_frames, step))[:4]
        frames = codecs.iter_video_frames(payload, indices)
        per = [
            _resample_1d(f.astype(np.float32).mean(axis=2).ravel() / 255.0, dim)
            for f in frames
        ]
        return (
            np.mean(per, axis=0, dtype=np.float32)
            if per
            else np.zeros(dim, np.float32)
        )
    raise ValueError(f"unknown media kind {kind!r}")


class MediaDecodeStage:
    """Actor-pool stage: decode/extract features from binary payloads.

    Use as ``ds.map_batches(MediaDecodeStage, fn_constructor_kwargs={...},
    concurrency=N, batch_size=B)`` — B small (payloads are large), the
    "model" is loaded once per actor in __init__.
    """

    def __init__(self, feature_dim: int = 64, decoder="fake"):
        """``decoder``: ``"builtin"`` (REAL BMP/WAV/RVID decode via
        functions/codecs.py), ``"fake"`` (deterministic stand-in, default), a
        CALLABLE ``(payload: bytes, meta: dict) -> np.ndarray[feature_dim]``
        for codec-equipped environments (e.g. wrap PIL/av — injected here so
        no stage change is needed), or ``"real"`` which names the missing
        system deps for formats the builtin codecs don't cover."""
        self.feature_dim = feature_dim
        self.decoder = decoder
        if decoder == "real":
            raise NotImplementedError(
                "decode of system-codec formats (JPEG/MP4/...) needs "
                "PIL/torchaudio/av which are not in this container; use "
                "decoder='builtin' for BMP/WAV/RVID payloads, or inject "
                "decoder=<callable(payload, meta)>, or decoder='fake'"
            )
        if decoder not in ("fake", "builtin") and not callable(decoder):
            raise ValueError(
                f"decoder must be 'builtin', 'fake', 'real' or a callable, got {decoder!r}"
            )
        # decoder/'model' state built once per actor (the expensive-load analogue)
        self._dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Per-row loop is inherent here: payloads are variable-size opaque
        # binaries; the vectorization lives INSIDE each decode (numpy
        # frombuffer/reshape over the whole pixel/sample buffer).
        payloads = batch["payload"].to_pylist()
        if callable(self.decoder):
            metas = [json.loads(m or "{}") for m in batch["meta"].to_pylist()]
            rows = [
                np.asarray(self.decoder(p, m), dtype=np.float32)
                for p, m in zip(payloads, metas)
            ]
            bad = next((r.shape for r in rows if r.shape != (self._dim,)), None)
            if bad is not None:
                raise ValueError(f"decoder returned shape {bad}, expected ({self._dim},)")
            feats = np.stack(rows) if rows else np.zeros((0, self._dim), np.float32)
        elif self.decoder == "builtin":
            kinds = batch["kind"].to_pylist()
            feats = (
                np.stack(
                    [
                        _builtin_features(p, k, self._dim)
                        for p, k in zip(payloads, kinds)
                    ]
                )
                if payloads
                else np.zeros((0, self._dim), np.float32)
            )
        else:
            feats = (
                np.stack([_fake_features(p, self._dim) for p in payloads])
                if payloads
                else np.zeros((0, self._dim), np.float32)
            )
        return batch.drop_columns(["payload"]).append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(pa.array(feats.ravel(), pa.float32()), self._dim),
        )


class FrameSampleStage:
    """Video frame sampling plumbing: emits ``n_samples`` (media_id, frame_idx)
    rows per video row based on the ``meta.n_frames`` field — the decode of
    each frame itself is the stubbed part."""

    def __init__(self, n_samples: int = 4):
        self.n_samples = n_samples

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        metas = [json.loads(m or "{}") for m in batch["meta"].to_pylist()]
        out_id, out_idx = [], []
        for mid, meta in zip(ids, metas):
            n_frames = int(meta.get("n_frames", 0))
            if n_frames <= 0:
                continue
            step = max(1, n_frames // self.n_samples)
            for fi in list(range(0, n_frames, step))[: self.n_samples]:
                out_id.append(mid)
                out_idx.append(fi)
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int64()),
            }
        )


class MediaStatsStage:
    """Actor-pool stage: REAL decode (functions/codecs.py) of BMP/WAV/RVID
    payloads into exact integer stats — the oracle-checkable face of the
    multimodal decode path. All outputs are integers computed from the
    reconstructed pixel/sample arrays, so a golden oracle built from the
    PRE-encoding ground-truth arrays pins the whole encode->bytes->decode
    round trip bit-exactly (see __ray_entry__ ``media_stats_golden``).

    Output schema (one row per media row; fields not applicable to a kind
    are 0 so the table stays dense and hashable):
        media_id, kind, width, height, n_frames, n_samples, sample_rate,
        value_sum  (images/video: sum of ALL RGB bytes over ALL frames;
                    audio: sum of |sample| over all channels)
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out = {k: [] for k in ("width", "height", "n_frames", "n_samples", "sample_rate", "value_sum")}
        for kind, payload in zip(kinds, payloads):
            w = h = nf = ns = sr = vs = 0
            if kind == "image":
                img = codecs.decode_bmp(payload)
                h, w, nf = img.shape[0], img.shape[1], 1
                vs = int(img.astype(np.int64).sum())
            elif kind == "audio":
                arr, sr = codecs.decode_wav(payload)
                ns = arr.shape[0]
                vs = int(np.abs(arr.astype(np.int64)).sum())
            elif kind == "video":
                frames = codecs.decode_video(payload)
                nf = len(frames)
                if frames:
                    h, w = frames[0].shape[:2]
                    vs = int(sum(f.astype(np.int64).sum() for f in frames))
            else:
                raise ValueError(f"unknown media kind {kind!r}")
            for key, val in zip(out, (w, h, nf, ns, sr, vs)):
                out[key].append(val)
        cols = {"media_id": pa.array(ids, pa.int64()), "kind": pa.array(kinds, pa.string())}
        cols.update({k: pa.array(v, pa.int64()) for k, v in out.items()})
        return pa.table(cols)


def synth_real_media_specs(n: int = 24, seed: int = 7) -> list[dict]:
    """Deterministic specs for a REAL media corpus: per row, the ground-truth
    numpy arrays (pre-encoding) plus kind/meta. Kept separate from the
    encoded table so oracles can compute expected stats from the arrays
    WITHOUT touching the codecs under test."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    specs = []
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            h, w = int(rng.integers(5, 33)), int(rng.integers(5, 33))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            specs.append({"media_id": i, "kind": kind, "arrays": [img], "meta": {"width": w, "height": h}})
        elif kind == "audio":
            ch = int(rng.integers(1, 3))
            frames = int(rng.integers(200, 2000))
            rate = int(rng.choice([8000, 16000, 44100]))
            samples = rng.integers(-32768, 32768, size=(frames, ch)).astype(np.int16)
            specs.append(
                {
                    "media_id": i,
                    "kind": kind,
                    "arrays": [samples],
                    "meta": {"sample_rate": rate, "channels": ch, "n_samples": frames},
                }
            )
        else:
            nf = int(rng.integers(2, 9))
            h, w = int(rng.integers(5, 17)), int(rng.integers(5, 17))
            frames = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(nf)]
            specs.append(
                {
                    "media_id": i,
                    "kind": kind,
                    "arrays": frames,
                    "meta": {"n_frames": nf, "width": w, "height": h},
                }
            )
    return specs


def synth_real_media_table(n: int = 24, seed: int = 7) -> pa.Table:
    """Deterministic media corpus of REAL payloads (valid BMP / WAV / RVID
    bytes any external tool can open), matching MEDIA_SCHEMA."""
    rows = {"media_id": [], "kind": [], "payload": [], "meta": []}
    for spec in synth_real_media_specs(n, seed):
        kind = spec["kind"]
        if kind == "image":
            payload = codecs.encode_bmp(spec["arrays"][0])
        elif kind == "audio":
            payload = codecs.encode_wav(spec["arrays"][0], spec["meta"]["sample_rate"])
        else:
            payload = codecs.encode_video(spec["arrays"])
        rows["media_id"].append(spec["media_id"])
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["meta"].append(json.dumps(spec["meta"]))
    return pa.table(rows, schema=MEDIA_SCHEMA)


def synth_video_dedup_specs(
    n_base: int = 18, n_dups: int = 6, seed: int = 11
) -> list[dict]:
    """Video near-dup corpus ground truth: ``n_base`` random videos plus
    ``n_dups`` near-duplicate copies of the first ``n_dups`` bases (every
    pixel jittered by at most ±2 — visually identical, cosine ≈ 0.9999
    between gray-downsample features, while distinct random videos sit near
    ~0.90). Dup of base ``i`` gets media_id ``100 + i``; expected dup pairs
    are exactly {(i, 100+i)}."""
    rng = np.random.default_rng(seed)
    specs = []
    for i in range(n_base):
        nf = int(rng.integers(4, 9))
        h, w = int(rng.integers(8, 17)), int(rng.integers(8, 17))
        frames = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(nf)]
        specs.append({"media_id": i, "frames": frames})
    for i in range(n_dups):
        base = specs[i]["frames"]
        jit = [
            np.clip(
                f.astype(np.int16) + rng.integers(-2, 3, size=f.shape), 0, 255
            ).astype(np.uint8)
            for f in base
        ]
        specs.append({"media_id": 100 + i, "frames": jit})
    return specs


def synth_video_dedup_table(
    n_base: int = 18, n_dups: int = 6, seed: int = 11
) -> pa.Table:
    """The synth_video_dedup_specs corpus encoded as REAL RVID payloads."""
    rows = {"media_id": [], "kind": [], "payload": [], "meta": []}
    for spec in synth_video_dedup_specs(n_base, n_dups, seed):
        rows["media_id"].append(spec["media_id"])
        rows["kind"].append("video")
        rows["payload"].append(codecs.encode_video(spec["frames"]))
        h, w = spec["frames"][0].shape[:2]
        rows["meta"].append(
            json.dumps({"n_frames": len(spec["frames"]), "width": w, "height": h})
        )
    return pa.table(rows, schema=MEDIA_SCHEMA)


def synth_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media corpus for tests (binary payloads + metadata)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": list(range(n)),
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [rng.integers(0, 256, size=int(rng.integers(64, 4096)), dtype=np.uint8).tobytes() for _ in range(n)],
        "meta": [json.dumps({"n_frames": int(rng.integers(1, 120))}) for _ in range(n)],
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)
