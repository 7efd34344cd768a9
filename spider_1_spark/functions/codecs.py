"""Image codecs — SPEC-8 (FIXTURES.md §A4). numpy + zlib only.

The sandbox has no Pillow/OpenCV (SURVEY §0.5 [ENV]), so the three
formats the synthetic web serves are implemented here and shared by
the reference oracle and the engine's ``mapInPandas`` decode stage
(SURVEY §2 op A14).

Formats:
  * ``ppm``    — binary P6, 8-bit RGB. Lossless (exact allclose).
  * ``png``    — minimal real PNG: 8-bit RGB color type 2, zlib,
                 filter 0 scanlines, single IDAT. Lossless.
  * ``qlossy`` — toy lossy: per-pixel 6-bit/channel quantization,
                 zlib-compressed. Max abs error <= 2/channel ->
                 PSNR >= 40 dB guaranteed (BASELINE.json:15 bound;
                 asserted in tests/test_codecs.py).

``decode(data)`` sniffs the format and returns ``(rgb, fmt)`` or
raises ``DecodeError`` (rows failing decode are counted
``decode_failed`` and not appended, SPEC-8).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class DecodeError(ValueError):
    pass


# ---------------------------------------------------------------- ppm

def encode_ppm(rgb: np.ndarray) -> bytes:
    h, w = rgb.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.astype(np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise DecodeError("not a P6 ppm")
    # header: P6 <ws> w <ws> h <ws> maxval <single ws> raster
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i : i + 1] == b"#":  # comment line
            j = data.find(b"\n", i)
            if j == -1:
                raise DecodeError("truncated ppm header")
            i = j + 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        if i == j:
            raise DecodeError("truncated ppm header")
        fields.append(data[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    try:
        w, h, maxval = (int(f) for f in fields)
    except ValueError as e:
        raise DecodeError(f"bad ppm header: {e}") from e
    if maxval != 255 or w <= 0 or h <= 0:
        raise DecodeError(f"unsupported ppm maxval/dims {maxval} {w}x{h}")
    raster = data[i : i + w * h * 3]
    if len(raster) != w * h * 3:
        raise DecodeError("truncated ppm raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).copy()


# ---------------------------------------------------------------- png

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    h, w = rgb.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    rows = rgb.astype(np.uint8)
    raw = b"".join(b"\x00" + rows[r].tobytes() for r in range(h))  # filter 0
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise DecodeError("bad png signature")
    i = len(_PNG_SIG)
    w = h = None
    idat = b""
    while i + 8 <= len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        tag = data[i + 4 : i + 8]
        payload = data[i + 8 : i + 8 + length]
        if len(payload) != length:
            raise DecodeError("truncated png chunk")
        crc_bytes = data[i + 8 + length : i + 12 + length]
        if len(crc_bytes) != 4:
            raise DecodeError("truncated png crc")
        if struct.unpack(">I", crc_bytes)[0] != (zlib.crc32(tag + payload) & 0xFFFFFFFF):
            raise DecodeError("png crc mismatch")
        if tag == b"IHDR":
            w, h, bitdepth, ctype, comp, filt, ilace = struct.unpack(">IIBBBBB", payload)
            if bitdepth != 8 or ctype != 2 or comp != 0 or filt != 0 or ilace != 0:
                raise DecodeError("unsupported png variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        i += 12 + length
    if w is None or not idat:
        raise DecodeError("missing IHDR/IDAT")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        raise DecodeError(f"png zlib: {e}") from e
    stride = 1 + w * 3
    if len(raw) != stride * h:
        raise DecodeError("bad png raster size")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    if (arr[:, 0] != 0).any():
        raise DecodeError("unsupported png filter (only 0)")
    return arr[:, 1:].reshape(h, w, 3).copy()


# ------------------------------------------------------------- qlossy

_QL_MAGIC = b"QLSY"


def encode_qlossy(rgb: np.ndarray) -> bytes:
    h, w = rgb.shape[:2]
    q = ((rgb.astype(np.uint32) * 63 + 127) // 255).astype(np.uint8)  # round
    return _QL_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def decode_qlossy(data: bytes) -> np.ndarray:
    if not data.startswith(_QL_MAGIC):
        raise DecodeError("bad qlossy magic")
    if len(data) < 12:
        raise DecodeError("truncated qlossy header")
    w, h = struct.unpack(">II", data[4:12])
    if w <= 0 or h <= 0 or w * h > 1 << 26:
        raise DecodeError("bad qlossy dims")
    try:
        raw = zlib.decompress(data[12:])
    except zlib.error as e:
        raise DecodeError(f"qlossy zlib: {e}") from e
    if len(raw) != w * h * 3:
        raise DecodeError("bad qlossy raster size")
    q = np.frombuffer(raw, dtype=np.uint8).astype(np.uint32)
    rgb = ((q * 255 + 31) // 63).astype(np.uint8)  # round-trip dequant
    return rgb.reshape(h, w, 3).copy()


# ------------------------------------------------------------ generic

ENCODERS = {"ppm": encode_ppm, "png": encode_png, "qlossy": encode_qlossy}
LOSSLESS = {"ppm", "png"}


def encode(rgb: np.ndarray, fmt: str) -> bytes:
    return ENCODERS[fmt](rgb)


def decode(data: bytes) -> tuple[np.ndarray, str]:
    """Sniff + decode -> (rgb uint8 (h,w,3), fmt). Raises DecodeError."""
    if data is None or len(data) < 4:
        raise DecodeError("empty payload")
    if data.startswith(b"P6"):
        return decode_ppm(data), "ppm"
    if data.startswith(_PNG_SIG):
        return decode_png(data), "png"
    if data.startswith(_QL_MAGIC):
        return decode_qlossy(data), "qlossy"
    raise DecodeError("unknown format")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
