"""Minimal pure-Python baseline JPEG codec (stdlib ``struct`` + numpy).

Companion to :mod:`.png` — exists so the multimodal operators'
``decoder="real"`` path can genuinely decode/encode the other ubiquitous
image format in a container without PIL/libjpeg. Implements baseline
sequential JPEG (ITU-T T.81): marker parsing, DQT/DHT/SOF0/SOS, Huffman
entropy decode with byte-unstuffing and RSTn restart handling, dequantize →
inverse zigzag → IDCT (orthonormal 8×8 DCT as two matrix multiplies), and
JFIF YCbCr→RGB. The encoder emits baseline JPEG (4:4:4 by default; optional 4:2:2 / 4:2:0
chroma subsampling with box-filter downsampling) with IJG-scaled Annex-K
quantization tables and SELF-BUILT fixed-length canonical Huffman tables —
every symbol that occurs gets the same code length, the all-ones codeword
stays unused (as T.81 recommends), and the decoder reads whatever DHT
declares, so codec correctness never depends on transcribing the Annex-K
code tables.

Supported on decode: baseline (SOF0), 8-bit, 1 or 3 components, sampling
factors up to 2×2 (covers 4:4:4 / 4:2:2 / 4:2:0 — what camera and web
JPEGs use; single-component scans decode non-interleaved per T.81
regardless of declared factors). Progressive, 12-bit, >2× sampling, or
arithmetic-coded payloads raise :class:`~.png.UnsupportedMedia`.

Deliberately NOT a performance path — real deployments install Pillow and
swap the per-batch decode call; this codec keeps the "real" plumbing honest
where Pillow is absent.
"""

from __future__ import annotations

import struct

import numpy as np

from .png import UnsupportedMedia

# ------------------------------------------------------------ constants

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_QL = np.array(  # Annex K.1 luminance quantization
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

_QC = np.array(  # Annex K.2 chrominance quantization
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    d = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16.0) / 2.0
    d[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return d


_D = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for t in (_QL, _QC):
        s = (t * scale + 50) // 100
        out.append(np.clip(s, 1, 255).astype(np.int64))
    return out[0], out[1]


def is_jpeg(data: bytes | None) -> bool:
    return bool(data) and len(data) > 3 and data[:2] == b"\xff\xd8"


# ------------------------------------------------------------ bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per T.81


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn consumed by caller
                raise _RestartMarker(nxt)
            else:
                raise _SegmentEnd()
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_to_marker(self) -> None:
        """Drop partial byte and consume an expected RSTn marker."""
        self.acc = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1
        if 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


class _SegmentEnd(Exception):
    pass


# ------------------------------------------------------------ huffman


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """DHT (bits per length, values) → {symbol: (code, length)}."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """DHT → {(length, code): symbol} for bit-at-a-time decoding."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise UnsupportedMedia("invalid Huffman code in scan")


def _fixed_length_table(symbols: set[int]) -> tuple[list[int], list[int]]:
    """Uniform-length canonical table over the symbols that occur: every
    symbol gets length L = ceil(log2(n+1)), so codes 0..n-1 fit and the
    all-ones codeword is never assigned."""
    syms = sorted(symbols) or [0]
    n = len(syms)
    length = max(1, (n).bit_length() if n >= (1 << (n - 1).bit_length()) else (n - 1).bit_length())
    while (1 << length) - 1 < n:  # keep all-ones unused
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, syms


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _extend(t: int, s: int) -> int:
    return t - ((1 << s) - 1) if t < (1 << (s - 1)) else t


# ------------------------------------------------------------ encode


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane, H/W multiples of 8 → (n, 8, 8) blocks in
    raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _block_symbols(blk, prev: int):
    """One 8×8 zigzagged block → (dc_sym, dc_bits, [(ac_sym, bits, len)])."""
    diff = int(blk[0]) - prev
    s = _category(diff)
    dbits = (
        (diff if diff >= 0 else diff + (1 << s) - 1) & ((1 << s) - 1) if s else 0
    )
    acs = []
    run = 0
    nz = np.nonzero(blk[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, 0, 0))
            run -= 16
        sz = _category(v)
        vb = (v if v >= 0 else v + (1 << sz) - 1) & ((1 << sz) - 1)
        acs.append(((run << 4) | sz, vb, sz))
        run = 0
    if last < 63:
        acs.append((0x00, 0, 0))
    return s, dbits, acs


_SUBSAMPLING = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def encode_jpeg(
    arr: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """(H, W) or (H, W, 1|3) uint8 array → baseline JPEG bytes.

    ``subsampling``: ``"444"`` (no chroma subsampling, the exactness
    default), ``"422"`` (2×1) or ``"420"`` (2×2 — what camera/web JPEGs
    typically use; chroma is box-filter downsampled)."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3) or a.dtype != np.uint8:
        raise UnsupportedMedia("encode_jpeg expects (H,W[,1|3]) uint8")
    if subsampling not in _SUBSAMPLING:
        raise UnsupportedMedia(f"unknown subsampling {subsampling!r}")
    h, w, ncomp = a.shape
    if h == 0 or w == 0:
        raise UnsupportedMedia("empty image")
    hs, vs = _SUBSAMPLING[subsampling] if ncomp == 3 else (1, 1)
    ql, qc = _quality_tables(quality)
    planes = (
        [_rgb_to_ycbcr(a.astype(np.float64))[..., i] for i in range(3)]
        if ncomp == 3
        else [a[..., 0].astype(np.float64)]
    )
    # pad to whole MCUs by edge replication (MCU = 8·hs × 8·vs luma px)
    mh, mw = 8 * vs, 8 * hs
    ph, pw = (h + mh - 1) // mh * mh, (w + mw - 1) // mw * mw
    qtabs = [ql] + ([qc] if ncomp == 3 else [])
    comp_q = [0] + ([1, 1] if ncomp == 3 else [])
    samp = [(hs, vs)] + ([(1, 1), (1, 1)] if ncomp == 3 else [])
    grids = []  # per comp: (gh, gw, 64) zigzagged quantized coefficients
    for ci, plane in enumerate(planes):
        p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
        if ci > 0 and (hs, vs) != (1, 1):
            # box-filter chroma downsample to (ph/vs, pw/hs)
            p = p.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))
        p = p - 128.0
        bh, bw_ = p.shape[0] // 8, p.shape[1] // 8
        blocks = _blocks(p)
        f = np.einsum("ij,njk,lk->nil", _D, blocks, _D)
        qt = qtabs[comp_q[ci]].reshape(8, 8).astype(np.float64)
        qz = np.round(f / qt).astype(np.int64)
        grids.append(qz.reshape(bh, bw_, 64)[:, :, _ZIGZAG])
    # walk blocks in MCU scan order (DC prediction is scan-ordered)
    mcus_y, mcus_x = ph // mh, pw // mw
    ncls = 1 if ncomp == 1 else 2
    dc_syms: list[set[int]] = [set() for _ in range(ncls)]
    ac_syms: list[set[int]] = [set() for _ in range(ncls)]
    scan = []  # [(cls, dc_sym, dc_bits, acs)]
    pred = [0] * ncomp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                hi, vi = samp[ci]
                cls = 0 if ci == 0 else 1
                for iy in range(vi):
                    for ix in range(hi):
                        blk = grids[ci][my * vi + iy, mx * hi + ix]
                        s, dbits, acs = _block_symbols(blk, pred[ci])
                        pred[ci] = int(blk[0])
                        dc_syms[cls].add(s)
                        for sym, _vb, _sz in acs:
                            ac_syms[cls].add(sym)
                        scan.append((cls, s, dbits, acs))
    dc_tabs = [_fixed_length_table(dc_syms[c]) for c in range(ncls)]
    ac_tabs = [_fixed_length_table(ac_syms[c]) for c in range(ncls)]
    dc_codes = [_canonical_codes(*t) for t in dc_tabs]
    ac_codes = [_canonical_codes(*t) for t in ac_tabs]
    # ---- emit
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    for qi, qt in enumerate(qtabs):
        seg(0xDB, bytes([qi]) + bytes(int(x) for x in qt[_ZIGZAG]))
    comp_info = b"".join(
        struct.pack(
            ">BBB", ci + 1, (samp[ci][0] << 4) | samp[ci][1], comp_q[ci]
        )
        for ci in range(ncomp)
    )
    seg(0xC0, struct.pack(">BHHB", 8, h, w, ncomp) + comp_info)  # SOF0
    for cls in range(ncls):
        for tc, (bits, vals) in ((0, dc_tabs[cls]), (1, ac_tabs[cls])):
            seg(
                0xC4,
                bytes([(tc << 4) | cls])
                + bytes(bits)
                + bytes(vals),
            )
    sos_comp = b"".join(
        struct.pack(">BB", ci + 1, ((0 if ci == 0 else 1) << 4) | (0 if ci == 0 else 1))
        for ci in range(ncomp)
    )
    seg(0xDA, bytes([ncomp]) + sos_comp + b"\x00\x3f\x00")
    bw = _BitWriter()
    for cls, s, dbits, acs in scan:
        code, length = dc_codes[cls][s]
        bw.write(code, length)
        bw.write(dbits, s)
        for sym, vb, sz in acs:
            code, length = ac_codes[cls][sym]
            bw.write(code, length)
            bw.write(vb, sz)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# ------------------------------------------------------------ decode


def jpeg_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from the SOF marker without entropy decode."""
    if not is_jpeg(data):
        raise UnsupportedMedia("not a JPEG payload")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if marker in (0xC0, 0xC1, 0xC2):
            _, hgt, wid = struct.unpack(">BHH", data[pos + 4 : pos + 9])
            return wid, hgt
        pos += 2 + length
    raise UnsupportedMedia("missing SOF marker")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (H, W, C) uint8 (C = 1 or 3, RGB)."""
    if not is_jpeg(data):
        raise UnsupportedMedia("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qtab)
    h = w = None
    restart_interval = 0
    scan_comps: list[tuple[int, int, int]] = []  # (comp idx, dc tab, ac tab)
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise UnsupportedMedia("marker desync")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + length]
        if marker == 0xDB:
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0xF
                if pq != 0:
                    raise UnsupportedMedia("16-bit quant tables unsupported")
                tab = np.zeros(64, dtype=np.int64)
                tab[_ZIGZAG] = np.frombuffer(
                    body[bpos + 1 : bpos + 65], dtype=np.uint8
                ).astype(np.int64)
                qtabs[tq] = tab
                bpos += 65
        elif marker == 0xC4:
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0xF
                bits = list(body[bpos + 1 : bpos + 17])
                n = sum(bits)
                vals = list(body[bpos + 17 : bpos + 17 + n])
                htabs[(tc, th)] = _decode_table(bits, vals)
                bpos += 17 + n
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedMedia(
                f"unsupported JPEG mode (SOF{marker - 0xC0}); baseline only"
            )
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise UnsupportedMedia("only 8-bit precision")
            if nc not in (1, 3):
                raise UnsupportedMedia("1 or 3 components only")
            for ci in range(nc):
                cid, samp, tq = struct.unpack(
                    ">BBB", body[6 + 3 * ci : 9 + 3 * ci]
                )
                if (samp >> 4) not in (1, 2) or (samp & 0xF) not in (1, 2):
                    raise UnsupportedMedia(
                        "sampling factors beyond 2x2 unsupported"
                    )
                if nc == 1:
                    # T.81: a single-component scan is NON-interleaved —
                    # MCU is one 8×8 block in full-grid raster order, so
                    # the declared sampling factor must not drive MCU
                    # interleaving (some encoders emit 0x22 here)
                    samp = 0x11
                comps.append((cid, samp, tq))
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ns = body[0]
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                idx = next(
                    i for i, (cid, _, _) in enumerate(comps) if cid == cs
                )
                scan_comps.append((idx, tt >> 4, tt & 0xF))
            pos += 2 + length
            break
        pos += 2 + length
    if h is None or not scan_comps:
        raise UnsupportedMedia("missing SOF/SOS")
    nc = len(comps)
    hmax = max(c[1] >> 4 for c in comps)
    vmax = max(c[1] & 0xF for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component plane at ITS OWN resolution; upsampled after the scan
    planes = []
    for _, samp, _ in comps:
        hi, vi = samp >> 4, samp & 0xF
        planes.append(
            np.zeros((mcus_y * vi * 8, mcus_x * hi * 8), dtype=np.float64)
        )
    br = _BitReader(data, pos)
    pred = [0] * nc
    mcu = 0
    total = mcus_x * mcus_y
    while mcu < total:
        if restart_interval and mcu and mcu % restart_interval == 0:
            br.sync_to_marker()
            pred = [0] * nc
        my, mx = divmod(mcu, mcus_x)
        try:
            for idx, tdc, tac in scan_comps:
                hi, vi = comps[idx][1] >> 4, comps[idx][1] & 0xF
                for iy in range(vi):
                    for ix in range(hi):
                        blk = np.zeros(64, dtype=np.int64)
                        s = _read_symbol(br, htabs[(0, tdc)])
                        diff = _extend(br.read_bits(s), s) if s else 0
                        pred[idx] += diff
                        blk[0] = pred[idx]
                        k = 1
                        while k < 64:
                            sym = _read_symbol(br, htabs[(1, tac)])
                            if sym == 0x00:  # EOB
                                break
                            run, sz = sym >> 4, sym & 0xF
                            if sz == 0:
                                if run != 15:
                                    raise UnsupportedMedia("bad AC symbol")
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise UnsupportedMedia("AC overrun")
                            blk[k] = _extend(br.read_bits(sz), sz)
                            k += 1
                        qt = qtabs[comps[idx][2]]
                        f = np.zeros(64, dtype=np.float64)
                        f[_ZIGZAG] = (blk * qt).astype(np.float64)
                        b8 = _D.T @ f.reshape(8, 8) @ _D
                        by, bx = my * vi + iy, mx * hi + ix
                        planes[idx][
                            by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                        ] = b8
        except _RestartMarker:
            # tolerate encoders emitting RSTn without DRI bookkeeping drift
            br.sync_to_marker()
            pred = [0] * nc
            continue
        except (_SegmentEnd, IndexError) as exc:
            raise UnsupportedMedia("truncated scan data") from exc
        mcu += 1
    # nearest-neighbor chroma upsample to full resolution, then crop
    full = []
    for (_, samp, _), p in zip(comps, planes):
        hi, vi = samp >> 4, samp & 0xF
        if vi < vmax:
            p = np.repeat(p, vmax // vi, axis=0)
        if hi < hmax:
            p = np.repeat(p, hmax // hi, axis=1)
        full.append(p[:h, :w])
    out = np.stack([p + 128.0 for p in full], axis=-1)
    if nc == 3:
        y, cb, cr = out[..., 0], out[..., 1] - 128.0, out[..., 2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
