"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool map_batches stages.

The container has no image/audio codecs, so the actual decode kernels are
STUBBED behind ``decoder="real"`` (raises NotImplementedError with the exact
dependency needed); ``decoder="fake"`` is a deterministic stand-in (sha-seeded
pseudo-pixels) that keeps the Ray-side plumbing — schema, batch sizing, actor
state, output layout — real and testable.

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


class MediaDecodeStage:
    """Actor-pool stage: decode/extract features from binary payloads.

    Use as ``ds.map_batches(MediaDecodeStage, fn_constructor_kwargs={...},
    concurrency=N, batch_size=B)`` — B small (payloads are large), the
    "model" is loaded once per actor in __init__.
    """

    def __init__(self, feature_dim: int = 64, decoder="fake"):
        """``decoder``: ``"fake"`` (deterministic stand-in, default), a
        CALLABLE ``(payload: bytes, meta: dict) -> np.ndarray[feature_dim]``
        for codec-equipped environments (e.g. wrap PIL/av — injected here so
        no stage change is needed), or ``"real"`` which names the missing
        system deps."""
        self.feature_dim = feature_dim
        self.decoder = decoder
        if decoder == "real":
            raise NotImplementedError(
                "real media decode needs PIL/torchaudio/av which are not in "
                "this container; inject decoder=<callable(payload, meta)> "
                "or use decoder='fake'"
            )
        if decoder != "fake" and not callable(decoder):
            raise ValueError(f"decoder must be 'fake', 'real' or a callable, got {decoder!r}")
        # decoder/'model' state built once per actor (the expensive-load analogue)
        self._dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
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
