"""Real media codecs with zero external dependencies: 24-bit BI_RGB BMP
(image), PCM16 RIFF/WAVE (audio), and RVID — a documented length-prefixed
BMP-frame container (video). These are genuine decode kernels (header parse +
vectorized numpy pixel/sample reconstruction), not stand-ins: the bytes on the
wire are valid BMP/WAV files any external tool can open.

They back ``decoder="builtin"`` of ``stages/multimodal.MediaDecodeStage`` so
the multimodal pipeline decodes real payloads end-to-end in this container
(which ships no PIL/av). Formats needing system codecs (JPEG/MP4/...) still
go through the pluggable ``decoder=<callable>`` seam.

Layout notes (the parts a decoder must get right, kept explicit here):
  BMP: 14-byte file header ('BM', size, reserved, pixel offset) + 40-byte
       BITMAPINFOHEADER; 24 bpp, BI_RGB (uncompressed); pixel rows are BGR,
       padded to 4-byte multiples, stored bottom-up unless height < 0
       (top-down). See https://en.wikipedia.org/wiki/BMP_file_format.
  WAV: RIFF/WAVE chunk stream; 'fmt ' (PCM=1, channels, sample rate,
       16 bits/sample) + 'data' (little-endian int16 interleaved frames).
  RVID: b'RVID' + u32le n_frames + n_frames x (u32le length + BMP bytes).
       Our own trivially-seekable container — stands in for a video codec
       while keeping every frame a real decodable image.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- BMP image

_BMP_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, pixel offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER (40 bytes)


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit BI_RGB bottom-up BMP bytes (vectorized:
    one padded row-matrix fill + tobytes, no per-pixel Python)."""
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError(f"expected (H, W, 3) uint8, got {img.shape} {img.dtype}")
    h, w = img.shape[:2]
    row_size = (3 * w + 3) & ~3  # each BGR row padded to a 4-byte multiple
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : 3 * w] = img[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up, RGB->BGR
    pix = rows.tobytes()
    info = _BMP_INFO_HDR.pack(40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    off = _BMP_FILE_HDR.size + _BMP_INFO_HDR.size
    head = _BMP_FILE_HDR.pack(b"BM", off + len(pix), 0, 0, off)
    return head + info + pix


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes -> (H, W, 3) uint8 RGB. Supports the layout this engine's
    media tables carry (24 bpp BI_RGB, BITMAPINFOHEADER), both bottom-up and
    top-down (negative height) row orders, arbitrary row padding."""
    if len(payload) < _BMP_FILE_HDR.size + 4 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, off = _BMP_FILE_HDR.unpack_from(payload, 0)
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    _, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={comp} (need 24/BI_RGB)")
    top_down = h < 0
    h = abs(h)
    row_size = (3 * w + 3) & ~3
    need = off + row_size * h
    if len(payload) < need:
        raise ValueError(f"truncated BMP: {len(payload)} < {need} bytes")
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=off)
    rows = rows.reshape(h, row_size)[:, : 3 * w].reshape(h, w, 3)
    img = rows if top_down else rows[::-1]
    return np.ascontiguousarray(img[:, :, ::-1])  # BGR -> RGB


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize via index gather (pixel-center
    sampling: source index = floor((i + 0.5) * in/out))."""
    h, w = img.shape[:2]
    ri = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    ci = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return img[ri][:, ci]


# ---------------------------------------------------------------- WAV audio


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, channels) int16 PCM -> RIFF/WAVE bytes (stdlib ``wave``
    writer — intentionally a DIFFERENT implementation than decode_wav's
    manual chunk parser, so round-trip tests cross-check both)."""
    import io
    import wave

    samples = np.asarray(samples)
    if samples.dtype != np.int16:
        raise ValueError(f"expected int16 PCM, got {samples.dtype}")
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(int(sample_rate))
        wf.writeframes(np.ascontiguousarray(samples).tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> ((n, channels) int16 array, sample_rate). Manual
    chunk walk (RIFF -> 'fmt ' -> 'data'), PCM16 only; frombuffer reshape,
    no per-sample Python."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = data = None
    while pos + 8 <= n:
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV: fmt={audio_fmt} bits={bits} (need PCM16)")
    frames = len(data) // (2 * channels)
    arr = np.frombuffer(data, dtype="<i2", count=frames * channels).reshape(frames, channels)
    return arr, rate


# ---------------------------------------------------------------- RVID video

_RVID_MAGIC = b"RVID"


def encode_video(frames: list[np.ndarray]) -> bytes:
    """List of (H, W, 3) uint8 RGB frames -> RVID container bytes."""
    parts = [_RVID_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        bmp = encode_bmp(f)
        parts.append(struct.pack("<I", len(bmp)))
        parts.append(bmp)
    return b"".join(parts)


def decode_video(payload: bytes) -> list[np.ndarray]:
    """RVID bytes -> list of (H, W, 3) uint8 RGB frames (each a real BMP
    decode). The u32 length prefixes make frame k seekable in O(k) header
    reads without decoding earlier frames — frame-sampling never decodes
    unsampled frames (see iter_video_frames)."""
    return [decode_bmp(payload[s:e]) for s, e in _video_frame_spans(payload)]


def video_n_frames(payload: bytes) -> int:
    if len(payload) < 8 or payload[:4] != _RVID_MAGIC:
        raise ValueError("not an RVID payload")
    return struct.unpack_from("<I", payload, 4)[0]


def _video_frame_spans(payload: bytes) -> list[tuple[int, int]]:
    n_frames = video_n_frames(payload)
    spans, pos = [], 8
    for _ in range(n_frames):
        if pos + 4 > len(payload):
            raise ValueError("truncated RVID container")
        size = struct.unpack_from("<I", payload, pos)[0]
        spans.append((pos + 4, pos + 4 + size))
        pos += 4 + size
    if spans and spans[-1][1] > len(payload):
        raise ValueError("truncated RVID frame")
    return spans


def iter_video_frames(payload: bytes, indices: list[int]) -> list[np.ndarray]:
    """Decode ONLY the requested frame indices (sampling never pays for the
    frames it skips)."""
    spans = _video_frame_spans(payload)
    return [decode_bmp(payload[spans[i][0] : spans[i][1]]) for i in indices]
