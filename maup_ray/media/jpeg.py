"""From-scratch baseline JPEG codec — numpy + stdlib only.

Closes the last compressed-image decode stub (VERDICT r2 "what's
missing" #3 second half; ROUND_NOTES round-4 candidate #1): the
container has no PIL/libjpeg, but baseline sequential JPEG (ITU T.81)
is implementable offline — 8×8 DCT-II as one einsum over all blocks,
Annex-K quantization + Huffman tables, JFIF YCbCr, byte-stuffed
entropy coding. The emitted stream is real interchange-format JPEG
(SOI/APP0/DQT/SOF0/DHT/SOS/EOI with the standard tables), so fixtures
round-trip through any external JPEG tool.

Scope (what the pipeline's image columns need):
* encode: 8-bit RGB or grayscale, 4:4:4 (no chroma subsampling —
  keeps the codec simple and the PSNR≥40dB fidelity invariant easy to
  honor at quality ≥ 90), libjpeg-compatible quality scaling of the
  Annex-K tables.
* decode: baseline sequential (SOF0), 1 or 3 components, any
  per-component sampling factors that equal each other (i.e. 4:4:4)
  or standard 4:2:0/4:2:2 (chroma upsampled by pixel replication),
  restart intervals (DRI/RSTn), APPn/COM skipped. Progressive (SOF2),
  arithmetic coding and 12-bit precision raise with explicit messages.

The lossy-fidelity contract: round-tripping our synthetic 16×16
pattern at quality 95 measures PSNR well above 40 dB
(tests/test_jpeg.py pins it).

DCT: the pixel-domain 2-D DCT used by JPEG is ``F = M @ B @ M.T`` with
the orthonormal 8-point DCT-II matrix M[u,x] =
0.5·c(u)·cos((2x+1)uπ/16), c(0)=1/√2 — inverse is the transpose
sandwich, both evaluated for ALL blocks of a component in one einsum.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]

# ---------------------------------------------------------------- tables

_QL_BASE = np.array(  # Annex K.1, luminance
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
_QC_BASE = np.array(  # Annex K.1, chrominance
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

_ZZ = np.array(  # zigzag scan order: index i holds the raster position
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
_UNZZ = np.argsort(_ZZ)

# Annex K.3 standard Huffman tables: (bits[1..16], values)
_DC_L = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_C = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II matrix (see module docstring)
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)
del _u, _x, _c


def _canonical_codes(bits, values):
    """(bits, values) → {symbol: (code, length)} per T.81 C.2."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _scale_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float, H/W multiples of 8 → (nb, 8, 8) in raster block
    order."""
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _unblocks(blocks: np.ndarray, hh: int, ww: int) -> np.ndarray:
    return (
        blocks.reshape(hh // 8, ww // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(hh, ww)
    )


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits


def _magnitude(v: int) -> tuple[int, int]:
    """signed value → (category, appended bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int, tabs) -> int:
    """Entropy-encode one zigzagged block; returns the new DC
    predictor."""
    dct, act = tabs
    s, bits = _magnitude(int(zz[0]) - pred)
    code, ln = dct[s]
    bw.put(code, ln)
    if s:
        bw.put(bits, s)
    nz = np.flatnonzero(zz[1:]) + 1
    prev = 0
    for k in nz:
        run = k - prev - 1
        while run > 15:
            code, ln = act[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        s, bits = _magnitude(int(zz[k]))
        code, ln = act[(run << 4) | s]
        bw.put(code, ln)
        bw.put(bits, s)
        prev = k
    if prev != 63:
        code, ln = act[0x00]  # EOB
        bw.put(code, ln)
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray, quality: int = 95, subsample: str = "444"
) -> bytes:
    """(h, w, 3) or (h, w) uint8 → baseline JFIF JPEG bytes.

    ``subsample``: "444" (default — every PSNR-sensitive pipeline
    fixture) or "420" (2×2 box-averaged chroma, the common camera
    layout — exercises the decoder's multi-block-MCU path)."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch not in (1, 3):
        raise ValueError(f"unsupported channel count {ch}")
    if subsample not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsample!r}")
    f = img.astype(np.float64)
    if ch == 3:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [f[:, :, 0]]
    sub = 2 if (subsample == "420" and ch == 3) else 1
    samp = [(sub, sub)] + [(1, 1)] * (ch - 1)  # (hs, vs) per component
    hmax = vmax = sub if ch == 3 else 1
    mcuw, mcuh = 8 * hmax, 8 * vmax
    mcux, mcuy = -(-w // mcuw), -(-h // mcuh)
    ql = _scale_qtable(_QL_BASE, quality)
    qc = _scale_qtable(_QC_BASE, quality)
    qts = [ql] + ([qc, qc] if ch == 3 else [])
    comp_zz = []  # per comp: (rows, cols, 64) zigzagged quantized blocks
    for ci, (plane, qt) in enumerate(zip(planes, qts)):
        hs, vs = samp[ci]
        if (hs, vs) != (hmax, vmax):  # box-average chroma downsample
            ph = np.pad(
                plane, ((0, h % 2), (0, w % 2)), mode="edge"
            )
            plane = (
                ph.reshape(ph.shape[0] // 2, 2, ph.shape[1] // 2, 2)
                .mean(axis=(1, 3))
            )
        ch_, cw_ = mcuy * vs * 8, mcux * hs * 8
        p = np.pad(
            plane,
            ((0, ch_ - plane.shape[0]), (0, cw_ - plane.shape[1])),
            mode="edge",
        )
        blk = _blocks(p) - 128.0
        coef = np.einsum("ux,nxy,vy->nuv", _M, blk, _M)
        q = np.round(coef / qt[None, :, :]).astype(np.int32)
        comp_zz.append(
            q.reshape(mcuy * vs, mcux * hs, 64)[:, :, _ZZ]
        )
    dc_l = _canonical_codes(*_DC_L)
    ac_l = _canonical_codes(*_AC_L)
    dc_c = _canonical_codes(*_DC_C)
    ac_c = _canonical_codes(*_AC_C)
    tabs = [(dc_l, ac_l)] + ([(dc_c, ac_c), (dc_c, ac_c)] if ch == 3 else [])

    bw = _BitWriter()
    pred = [0] * ch
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ch):
                hs, vs = samp[ci]
                for vy in range(vs):
                    for vx in range(hs):
                        pred[ci] = _encode_block(
                            bw,
                            comp_zz[ci][my * vs + vy, mx * hs + vx],
                            pred[ci],
                            tabs[ci],
                        )
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"  # APP0
    for tid, qt in enumerate([ql] + ([qc] if ch == 3 else [])):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(qt.reshape(64)[_ZZ].astype(np.uint8))
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ch, 8, h, w, ch)
    for ci in range(ch):
        hs, vs = samp[ci]
        out += struct.pack(
            "BBB", ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1
        )
    # DHT
    for cls, tid, (bits, vals) in [
        (0, 0, _DC_L),
        (1, 0, _AC_L),
    ] + ([(0, 1, _DC_C), (1, 1, _AC_C)] if ch == 3 else []):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(vals), (cls << 4) | tid
        )
        out += bytes(bits) + bytes(vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ch, ch)
    for ci in range(ch):
        out += struct.pack("BB", ci + 1, 0x00 if ci == 0 else 0x11)
    out += b"\x00\x3f\x00"
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    """Reads entropy-coded bits; un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker — consumed by reset(), pad for now
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
                else:  # real marker: pad with zeros, don't consume
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def get(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def peek16(self) -> tuple[int, int]:
        if self.nbits < 16:
            self._fill()
        got = min(self.nbits, 16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF, got

    def drop(self, n: int):
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def reset(self):
        """Byte-align and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


class _HuffTable:
    """Canonical Huffman decode via per-length first-code arithmetic
    (T.81 F.2.2.3) on a 16-bit peek."""

    def __init__(self, bits, values):
        self.maxcode = [-1] * 17
        self.mincode = [0] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1
        self.values = values

    def decode(self, br: _BitReader) -> int:
        word, _ = br.peek16()
        for ln in range(1, 17):
            code = word >> (16 - ln)
            if self.maxcode[ln] >= 0 and code <= self.maxcode[ln]:
                if code >= self.mincode[ln]:
                    br.drop(ln)
                    return self.values[
                        self.valptr[ln] + code - self.mincode[ln]
                    ]
        raise ValueError("bad Huffman code in JPEG scan")


def _extend(v: int, s: int) -> int:
    """appended bits → signed value (T.81 F.2.2.1 EXTEND)."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(buf) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) uint8 (grayscale expanded)."""
    data = bytes(buf)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = (
                    np.frombuffer(seg, dtype=np.uint8, count=64, offset=off + 1)
                    .astype(np.int32)[_UNZZ]
                    .reshape(8, 8)
                )
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                cls, tid = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nv])
                htables[(cls, tid)] = _HuffTable(bits, vals)
                off += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for ci in range(nc):
                cid, samp, tq = struct.unpack_from(
                    "BBB", seg, 6 + 3 * ci
                )
                comps.append(
                    {"id": cid, "hs": samp >> 4, "vs": samp & 0xF, "tq": tq}
                )
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                "progressive/extended JPEG not supported (baseline only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                sel.append({"cs": cs, "dc": tt >> 4, "ac": tt & 0xF})
            scan = (sel, pos + 2 + seglen)
            break
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    sel, scan_pos = scan
    comps = frame["comps"]
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = []  # (comp, dc_tab, ac_tab) per scan order
    for s in sel:
        c = by_id[s["cs"]]
        order.append((c, htables[(0, s["dc"])], htables[(1, s["ac"])]))
    coefs = {
        c["id"]: np.zeros(
            (mcuy * c["vs"] * mcux * c["hs"], 64), dtype=np.int32
        )
        for c in comps
    }
    br = _BitReader(data, scan_pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                br.reset()
                for k in pred:
                    pred[k] = 0
            for c, dct, act in order:
                for vy in range(c["vs"]):
                    for vx in range(c["hs"]):
                        zz = np.zeros(64, dtype=np.int32)
                        s = dct.decode(br)
                        diff = _extend(br.get(s), s) if s else 0
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = act.decode(br)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.get(s), s)
                            k += 1
                        bw_ = mcux * c["hs"]
                        row = my * c["vs"] + vy
                        col = mx * c["hs"] + vx
                        coefs[c["id"]][row * bw_ + col] = zz
            mcu_count += 1

    planes = []
    for c in comps:
        qt = qtables[c["tq"]]
        ch_, cw_ = mcuy * c["vs"] * 8, mcux * c["hs"] * 8
        deq = (
            coefs[c["id"]][:, _UNZZ].reshape(-1, 8, 8).astype(np.float64)
            * qt[None, :, :]
        )
        blk = np.einsum("ux,nuv,vy->nxy", _M, deq, _M) + 128.0
        plane = _unblocks(blk, ch_, cw_)
        if c["hs"] != hmax or c["vs"] != vmax:
            plane = np.repeat(
                np.repeat(plane, hmax // c["hs"], axis=1),
                vmax // c["vs"],
                axis=0,
            )
        planes.append(plane[:fh, :fw])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
