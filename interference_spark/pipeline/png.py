"""Minimal pure-Python PNG codec (stdlib ``zlib``/``struct`` + numpy).

Exists so the multimodal operators' ``decoder="real"`` path can do genuine
image decode/resize in this container (no PIL/libpng available). Implements
the PNG spec (RFC 2083): chunk parsing, IDAT inflate, scanline unfiltering
(types 0-4), and encoding with filter 0. Supported: bit depth 8, color
types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
non-interlaced. Anything else raises ``UnsupportedMedia``.

This is deliberately NOT a performance path — real deployments install
Pillow and the operators use it per Arrow batch; this codec keeps the
"real" plumbing honest where Pillow is absent.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class UnsupportedMedia(ValueError):
    """Payload is not a PNG this codec can handle."""


def is_png(data: bytes | None) -> bool:
    return bool(data) and data[:8] == _MAGIC


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8 array (C per color type; palette → RGB)."""
    if not is_png(data):
        raise UnsupportedMedia("not a PNG payload")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette: bytes | None = None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + body + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            palette = bytes(body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise UnsupportedMedia("missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise UnsupportedMedia(
            f"unsupported PNG (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace}); this codec handles 8-bit non-interlaced"
        )
    nch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise UnsupportedMedia("IDAT length mismatch")
    img = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub — serial in pixel units
            for x in range(nch, stride):
                line[x] = (int(line[x]) + int(line[x - nch])) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - nch]) if x >= nch else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - nch]) if x >= nch else 0
                c = int(prev[x - nch]) if x >= nch else 0
                line[x] = (
                    int(line[x]) + int(_paeth(np.uint8(a), prev[x], np.uint8(c)))
                ) & 0xFF
        else:
            raise UnsupportedMedia(f"unknown filter type {ftype}")
        img[y] = line
        prev = img[y]
    out = img.reshape(height, width, nch)
    if color_type == 3:
        if palette is None:
            raise UnsupportedMedia("palette image without PLTE")
        pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
        out = pal[out[:, :, 0]]
    return out


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W, C) uint8 array → PNG bytes (filter 0, one IDAT)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw.extend(arr[y].tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def png_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from IHDR without a full decode."""
    if not is_png(data) or data[12:16] != b"IHDR":
        raise UnsupportedMedia("not a PNG payload")
    w, h = struct.unpack(">II", data[16:24])
    return w, h


def resize_nearest(arr: np.ndarray, scale_div: int) -> np.ndarray:
    """Nearest-neighbor downscale by an integer factor (min size 1×1)."""
    h, w = arr.shape[:2]
    nh, nw = max(1, h // scale_div), max(1, w // scale_div)
    ys = (np.arange(nh) * h) // nh
    xs = (np.arange(nw) * w) // nw
    return arr[ys][:, xs]


# ------------------------------------------------------------------ APNG
# Animated PNG (the PNG third extension spec): acTL declares the animation,
# each frame is an fcTL control chunk followed by IDAT (first frame) or
# fdAT (subsequent; fdAT = 4-byte sequence number + deflate data). This
# gives the container a REAL pure-Python video container: frame extraction
# without pyav/ffmpeg. Only the subset the encoder below emits is decoded
# (full-canvas frames, offset 0/0, no dispose/blend compositing) — offset
# or composited APNGs raise UnsupportedMedia.


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _scanlines(arr: np.ndarray) -> bytes:
    raw = bytearray()
    for y in range(arr.shape[0]):
        raw.append(0)
        raw.extend(arr[y].tobytes())
    return bytes(raw)


def is_apng(data: bytes | None) -> bool:
    return bool(data) and is_png(data) and b"acTL" in data[:256]


def encode_apng(frames: list[np.ndarray], delay_ms: int = 100) -> bytes:
    """Full-canvas animated PNG from equal-shaped (H, W, C) uint8 frames."""
    if not frames:
        raise UnsupportedMedia("empty frame list")
    f0 = frames[0] if frames[0].ndim == 3 else frames[0][:, :, None]
    h, w, c = f0.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    out = bytearray(_MAGIC)
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for i, fr in enumerate(frames):
        fr = fr if fr.ndim == 3 else fr[:, :, None]
        if fr.shape != (h, w, c):
            raise UnsupportedMedia("APNG frames must share one shape")
        fctl = struct.pack(
            ">IIIIIHHBB", seq, w, h, 0, 0, delay_ms, 1000, 0, 0
        )
        out += _chunk(b"fcTL", fctl)
        seq += 1
        z = zlib.compress(_scanlines(fr), 6)
        if i == 0:
            out += _chunk(b"IDAT", z)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + z)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def decode_apng_frames(data: bytes) -> list[bytes]:
    """APNG bytes → list of standalone single-frame PNG byte strings
    (each decodable with :func:`decode_png`). A plain PNG yields itself
    as the single frame."""
    if not is_png(data):
        raise UnsupportedMedia("not a PNG payload")
    if not is_apng(data):
        return [bytes(data)]
    pos = 8
    ihdr = None
    frames: list[bytes] = []
    cur: bytearray | None = None
    w = h = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = bytes(body)
            w, h = struct.unpack(">II", body[:8])
        elif ctype == b"fcTL":
            fw, fh, fx, fy = struct.unpack(">IIII", body[4:20])
            if (fw, fh, fx, fy) != (w, h, 0, 0):
                raise UnsupportedMedia(
                    "offset/partial-canvas APNG frames are not supported"
                )
            if cur is not None:
                frames.append(bytes(cur))
            cur = bytearray()
        elif ctype == b"IDAT":
            if cur is None:  # non-animated leading IDAT (spec allows)
                cur = bytearray()
            cur += body
        elif ctype == b"fdAT":
            if cur is None:
                raise UnsupportedMedia("fdAT before any fcTL")
            cur += body[4:]  # strip the sequence number
        elif ctype == b"IEND":
            break
    if cur is not None:
        frames.append(bytes(cur))
    if ihdr is None or not frames:
        raise UnsupportedMedia("truncated APNG")
    return [
        _MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", z) + _chunk(b"IEND", b"")
        for z in frames
    ]
