"""Minimal pure-Python WAV (RIFF/PCM) codec (stdlib ``struct`` + numpy).

Counterpart of :mod:`.png` for audio: lets the multimodal operators'
``decoder="real"`` path do genuine audio decode in this container (no
soundfile/librosa available). Implements RIFF chunk walking and linear PCM
payloads: 8-bit unsigned, 16-bit and 32-bit signed little-endian, any
channel count. Compressed formats (MP3/AAC/float WAV) raise
``UnsupportedMedia`` — a real deployment swaps in soundfile per Arrow
batch, same operator plumbing.
"""

from __future__ import annotations

import struct

import numpy as np

from .png import UnsupportedMedia

_PCM_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def is_wav(data: bytes | None) -> bool:
    return bool(data) and len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def parse_wav(data: bytes) -> dict:
    """Parse a PCM WAV → {sample_rate, n_channels, bits, n_frames, samples}
    with ``samples`` a (n_frames, n_channels) int32 numpy array (8-bit
    input is re-centered to signed around 0)."""
    if not is_wav(data):
        raise UnsupportedMedia("not a RIFF/WAVE payload")
    pos, end = 12, len(data)
    fmt = None
    raw = None
    while pos + 8 <= end:
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise UnsupportedMedia("truncated fmt chunk")
            (audio_format, n_channels, sample_rate, _byte_rate, _align, bits) = (
                struct.unpack_from("<HHIIHH", body, 0)
            )
            if audio_format != 1:  # 1 = linear PCM
                raise UnsupportedMedia(f"non-PCM audio format {audio_format}")
            if bits not in _PCM_DTYPES:
                raise UnsupportedMedia(f"unsupported bit depth {bits}")
            fmt = (n_channels, sample_rate, bits)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise UnsupportedMedia("missing fmt/data chunk")
    n_channels, sample_rate, bits = fmt
    dt = _PCM_DTYPES[bits]
    usable = len(raw) - len(raw) % (n_channels * dt.itemsize)
    samples = np.frombuffer(raw[:usable], dtype=dt).astype(np.int32)
    if bits == 8:
        samples -= 128  # 8-bit WAV is unsigned, centered at 128
    frames = samples.reshape(-1, n_channels) if n_channels else samples.reshape(-1, 1)
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits": bits,
        "n_frames": frames.shape[0],
        "samples": frames,
    }


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an int16 (n_frames,) or (n_frames, n_channels) array as a
    16-bit PCM WAV (fixture generation / re-encode after a transform)."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_channels = arr.shape
    raw = arr.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * n_channels * 2, n_channels * 2, 16,
    )
    chunks = b"".join(
        [
            b"fmt ", struct.pack("<I", len(fmt)), fmt,
            b"data", struct.pack("<I", len(raw)), raw,
        ]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
