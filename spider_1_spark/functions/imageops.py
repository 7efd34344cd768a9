"""Pure-numpy multimodal payload kernels: resize, video frames, PCM.

The sandbox has no Pillow/cv2/ffmpeg (SURVEY §0.5), so every kernel
here is a REAL numpy implementation over the synthetic codec layer
(functions/codecs.py) rather than a stub: nearest/bilinear resize,
a length-prefixed multi-frame video container, and headered int16
PCM audio with feature extraction.  A production deployment swaps
the codec layer for libjpeg/ffmpeg and keeps these signatures — the
Spark-side plumbing (schema, partitioning, Arrow batch shape) in
pipeline/queries.py is identical either way.

Determinism: everything is integer or IEEE-double arithmetic over
fixed-order numpy arrays — results are bit-identical at any
parallelism and on any platform (no libm transcendentals).
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------- resize

def resize_nearest(rgb: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resample (floor source-index mapping).

    Resizing to the source size is the identity (pinned in tests) —
    the index map (i*h)//out_h is exact integer math.
    """
    h, w = rgb.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return rgb[rows][:, cols]


def resize_bilinear(rgb: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resample, half-pixel-centers convention
    (align_corners=False, the TF/torch default).  Same-size resize is
    the identity: the sample coordinates land exactly on pixel centers
    so all fractional weights are 0.
    """
    h, w = rgb.shape[:2]
    ys = np.clip((np.arange(out_h) + 0.5) * (h / out_h) - 0.5, 0, h - 1)
    xs = np.clip((np.arange(out_w) + 0.5) * (w / out_w) - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    img = rgb.astype(np.float64)
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# ------------------------------------------------- video frame container

VID_MAGIC = b"VID1"


class ContainerError(ValueError):
    """Malformed video/audio container."""


def encode_video(frames: list[bytes]) -> bytes:
    """VID1 | u16 n_frames | (u32 len | frame bytes)* — frames are
    independently-encoded images (any functions/codecs.py format)."""
    if len(frames) > 0xFFFF:
        raise ContainerError("too many frames")
    parts = [VID_MAGIC, struct.pack("<H", len(frames))]
    for fb in frames:
        parts.append(struct.pack("<I", len(fb)))
        parts.append(fb)
    return b"".join(parts)


def decode_video(data: bytes) -> list[bytes]:
    if data[:4] != VID_MAGIC or len(data) < 6:
        raise ContainerError("bad magic or truncated header")
    (n,) = struct.unpack_from("<H", data, 4)
    frames, off = [], 6
    for _ in range(n):
        if off + 4 > len(data):
            raise ContainerError("truncated frame header")
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        if off + ln > len(data):
            raise ContainerError("truncated frame body")
        frames.append(data[off:off + ln])
        off += ln
    if off != len(data):
        raise ContainerError("trailing bytes")
    return frames


# ------------------------------------------------------------ PCM audio

PCM_MAGIC = b"PCM1"


def encode_pcm(rate: int, samples: np.ndarray) -> bytes:
    """PCM1 | u32 sample_rate | little-endian int16 samples."""
    return PCM_MAGIC + struct.pack("<I", rate) + \
        samples.astype("<i2").tobytes()


def decode_pcm(data: bytes) -> tuple[int, np.ndarray]:
    if data[:4] != PCM_MAGIC or len(data) < 8:
        raise ContainerError("bad magic or truncated header")
    (rate,) = struct.unpack_from("<I", data, 4)
    body = data[8:]
    if len(body) % 2:
        raise ContainerError("odd sample bytes")
    return rate, np.frombuffer(body, dtype="<i2")


def pcm_features(samples: np.ndarray) -> tuple[float, int]:
    """(rms, zero_crossings) — the classic cheap audio-quality gates.
    Integer products in int64 (no overflow at int16 range), RMS in
    float64 over the fixed sample order."""
    if samples.size == 0:
        return 0.0, 0
    s = samples.astype(np.int64)
    rms = float(np.sqrt(np.mean(s * s)))
    zcr = int(np.sum((s[1:] * s[:-1]) < 0))
    return rms, zcr
