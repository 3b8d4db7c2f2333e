"""Pure-stdlib JPEG (ITU-T T.81) codec — the third real codec behind
the :func:`bqf_ray.sources.media.decode_payload` boundary (PNG and WAV
live in :mod:`bqf_ray.sources.codecs`).

Scope (documented, loudly enforced):

- **decode**: baseline sequential DCT (SOF0/1) AND full progressive
  (SOF2): spectral selection with EOBn runs plus successive
  approximation (first passes at any Al, DC/AC refinement scans per
  T.81 G.1.2 — the scan scripts real encoders emit); 8-bit samples,
  grayscale or YCbCr; any sampling factors (subsampled chroma is
  upsampled by sample replication); restart markers honored;
  arithmetic coding, 12-bit and hierarchical modes raise
  ``ValueError``.
- **encode**: grayscale or RGB 4:4:4, Annex K quantization tables
  scaled by the conventional quality formula, Annex K Huffman tables,
  optional restart interval; ``progressive=True`` emits a
  spectral-selection scan script and ``successive=N`` a full
  successive-approximation script — every variant carries the SAME
  quantized coefficients as the baseline stream and must decode
  bit-identically (the codec's differential self-check; format
  conformance against external decoders is untestable in this
  container — no image library exists here by design).

Everything is numpy + ``struct`` — no image library.  The DCT/IDCT is
the exact orthonormal 8×8 matrix form of the T.81 definition
(``S = D·(B−128)·Dᵀ``), vectorized over all blocks with one einsum.

Reference parity note: the reference engine (vicLeva/bqf) has no media
surface; this module exists for the multimodal suite's documented
real-codec boundary (`sources/media.py`).
"""

from __future__ import annotations

import struct
from math import cos, pi, sqrt

import numpy as np

# ---------------------------------------------------------------------------
# constants: zigzag, Annex K quantization + Huffman tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
    0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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
    0xF9, 0xFA]

# orthonormal 8x8 DCT basis: D[k, n] = 0.5 * c(k) * cos((2n+1)kπ/16)
_D = np.array([[0.5 * ((1 / sqrt(2)) if k == 0 else 1.0)
                * cos((2 * n + 1) * k * pi / 16)
                for n in range(8)] for k in range(8)])


def quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """Conventional quality scaling: 50 → Annex K verbatim."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _canonical_codes(bits, vals):
    """(BITS, HUFFVAL) → {symbol: (code, length)} per T.81 C.2."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_tables(bits, vals):
    """(BITS, HUFFVAL) → {(length, code): symbol} for the bit-walk."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# bit I/O with byte stuffing
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:                      # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)    # 1-pad to byte boundary


class _BitReader:
    def __init__(self, buf, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None                     # pending RST/EOI marker

    def _fill(self):
        if self.marker is not None:
            raise ValueError("jpeg: bit read past segment marker")
        if self.pos >= len(self.buf):
            raise ValueError("jpeg: truncated entropy stream")
        b = self.buf[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.buf[self.pos] if self.pos < len(self.buf) else None
            if nxt == 0x00:
                self.pos += 1                  # stuffed byte
            else:
                self.marker = nxt              # RSTn / EOI / next marker
                self.pos += 1
                raise ValueError("jpeg: bit read past segment marker")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self):
        """Consume up to the pending RSTn marker (after a ValueError
        from the 1-padded tail would be wrong — callers sync on MCU
        counts, so here we just drop partial bits and the marker)."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            # scan forward for the marker
            while self.pos + 1 < len(self.buf):
                if self.buf[self.pos] == 0xFF \
                        and self.buf[self.pos + 1] != 0x00:
                    self.marker = self.buf[self.pos + 1]
                    self.pos += 2
                    break
                self.pos += 1
        m = self.marker
        self.marker = None
        return m


def _huff_decode(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _blockify(plane: np.ndarray) -> np.ndarray:
    """(h, w) uint8 → (n_blocks_y, n_blocks_x, 8, 8) float64, edge-padded."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    H, W = plane.shape
    return (plane.reshape(H // 8, 8, W // 8, 8).swapaxes(1, 2)
            .astype(np.float64))


def _fdct_quant(blocks: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """blocks (by, bx, 8, 8) → zigzagged quantized int coeffs
    (n, 64)."""
    s = np.einsum("ki,yxij,lj->yxkl", _D, blocks - 128.0, _D)
    q = np.rint(s / qtable.reshape(8, 8)).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _encode_block(writer: _BitWriter, coeffs: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    dc = int(coeffs[0])
    diff = dc - pred
    size = _category(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(coeffs)[0])) if np.any(coeffs[1:]) \
        else 0
    for k in range(1, 64):
        v = int(coeffs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]      # ZRL
            writer.write(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]          # EOB
        writer.write(code, length)
    return dc


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.rint(np.stack([y, cb, cr], axis=-1)),
                   0, 255).astype(np.uint8)


def _dht_segment(tclass: int, tid: int, bits, vals) -> bytes:
    body = bytes([tclass << 4 | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def jpeg_encode(img: np.ndarray, quality: int = 50,
                restart_interval: int = 0,
                progressive: bool = False,
                successive: bool = False) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → JFIF bytes (4:4:4,
    Annex K tables scaled to ``quality``).  ``progressive=True`` emits
    spectral-selection progressive (SOF2): one interleaved DC scan,
    then two AC band scans (1-20, 21-63) per component — the SAME
    quantized coefficients as the baseline stream, so both decode to
    bit-identical pixels (the differential test the progressive
    decoder is held to).  Progressive + restart_interval is
    unsupported (raise)."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("jpeg_encode: need uint8 (h,w) or (h,w,3)")
    color = img.ndim == 3
    if color and img.shape[2] != 3:
        raise ValueError("jpeg_encode: color images must be (h,w,3)")
    h, w = img.shape[:2]
    if not (0 < h <= 65535 and 0 < w <= 65535):
        raise ValueError("jpeg_encode: dimensions out of range")
    ql = quality_scale(QUANT_LUMA, quality)
    qc = quality_scale(QUANT_CHROMA, quality)
    planes = ([_rgb_to_ycbcr(img)[..., i] for i in range(3)]
              if color else [img])
    qtabs = [ql, qc, qc] if color else [ql]

    out = bytearray(b"\xff\xd8")                        # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
            + bytes([0, 0]))                            # APP0
    for tid, qt in enumerate([ql] + ([qc] if color else [])):
        out += (b"\xff\xdb" + struct.pack(">H", 67)
                + bytes([tid]) + bytes(qt[ZIGZAG].astype(np.uint8)))
    ncomp = 3 if color else 1
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    progressive = progressive or successive
    if progressive and restart_interval:
        raise ValueError("jpeg_encode: progressive + restart_interval "
                         "unsupported")
    out += ((b"\xff\xc2" if progressive else b"\xff\xc0")
            + struct.pack(">H", len(sof) + 2) + sof)
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if color:
        out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += (b"\xff\xdd" + struct.pack(">H", 4)
                + struct.pack(">H", restart_interval))
    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    comp_coeffs = []
    for ci in range(ncomp):
        comp_coeffs.append(_fdct_quant(_blockify(planes[ci]), qtabs[ci]))
    nby, nbx = (h + 7) // 8, (w + 7) // 8

    def sos_header(comp_ids, Ss, Se, ahal=0):
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
        sos += bytes([Ss, Se, ahal])
        return b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    if not progressive:
        out += sos_header(list(range(ncomp)), 0, 63)
        writer = _BitWriter()
        preds = [0] * ncomp
        rst = 0
        mcu_since_rst = 0
        for bi in range(nby * nbx):            # 4:4:4 → MCU == block
            if restart_interval and mcu_since_rst == restart_interval:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                mcu_since_rst = 0
                preds = [0] * ncomp
            for ci in range(ncomp):
                dcc, acc = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                preds[ci] = _encode_block(writer, comp_coeffs[ci][bi],
                                          preds[ci], dcc, acc)
            mcu_since_rst += 1
        writer.flush()
        out += writer.out
    else:
        AL = int(successive)               # levels of refinement

        def dc_scan(al):
            nonlocal out
            out += sos_header(list(range(ncomp)), 0, 0, ahal=al)
            writer = _BitWriter()
            preds = [0] * ncomp
            for bi in range(nby * nbx):
                for ci in range(ncomp):
                    dcc = dc_l if ci == 0 else dc_c
                    dc = int(comp_coeffs[ci][bi][0]) >> al
                    diff = dc - preds[ci]
                    size = _category(diff)
                    code, length = dcc[size]
                    writer.write(code, length)
                    if size:
                        writer.write(diff if diff >= 0
                                     else diff + (1 << size) - 1, size)
                    preds[ci] = dc
            writer.flush()
            out += writer.out

        def ac_first_scan(ci, lo, hi, al):
            nonlocal out
            acc = ac_l if ci == 0 else ac_c
            out += sos_header([ci], lo, hi, ahal=al)
            writer = _BitWriter()
            for bi in range(nby * nbx):
                band = comp_coeffs[ci][bi]
                run = 0
                last_nz = -1
                for k in range(lo, hi + 1):
                    v = int(band[k])
                    if (v if v >= 0 else -v) >> al:
                        last_nz = k
                for k in range(lo, hi + 1):
                    v = int(band[k])
                    a = (v >> al) if v >= 0 else -((-v) >> al)
                    if a == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = acc[0xF0]
                        writer.write(code, length)
                        run -= 16
                    size = _category(a)
                    code, length = acc[(run << 4) | size]
                    writer.write(code, length)
                    writer.write(a if a >= 0
                                 else a + (1 << size) - 1, size)
                    run = 0
                if last_nz < hi:
                    code, length = acc[0x00]       # EOB (run of 1)
                    writer.write(code, length)
            writer.flush()
            out += writer.out

        def ac_refine_scan(ci, lo, hi, al):
            """G.1.2.3 refinement encoder — the libjpeg walk: the ZRL
            check runs at EVERY nonzero-temp position (so correction
            bits flush in the order the decoder consumes them), and
            ZRL never fires past the last newly-significant index."""
            nonlocal out
            acc = ac_l if ci == 0 else ac_c
            out += sos_header([ci], lo, hi, ahal=(al + 1) << 4 | al)
            writer = _BitWriter()
            for bi in range(nby * nbx):
                band = comp_coeffs[ci][bi]
                temp = [(int(band[k]) if band[k] >= 0
                         else -int(band[k])) >> al
                        for k in range(lo, hi + 1)]
                eob_idx = -1
                for j, t in enumerate(temp):
                    if t == 1:
                        eob_idx = j
                run = 0
                br = []
                for j, t in enumerate(temp):
                    if t == 0:
                        run += 1
                        continue
                    while run > 15 and j <= eob_idx:
                        code, length = acc[0xF0]
                        writer.write(code, length)
                        run -= 16
                        for b in br:
                            writer.write(b, 1)
                        br = []
                    if t > 1:
                        br.append(t & 1)
                        continue
                    code, length = acc[(run << 4) | 1]
                    writer.write(code, length)
                    writer.write(1 if int(band[lo + j]) > 0 else 0, 1)
                    for b in br:
                        writer.write(b, 1)
                    br = []
                    run = 0
                if run > 0 or br:
                    code, length = acc[0x00]       # EOB (run of 1)
                    writer.write(code, length)
                    for b in br:
                        writer.write(b, 1)
            writer.flush()
            out += writer.out

        def dc_refine_scan(al):
            nonlocal out
            out += sos_header(list(range(ncomp)), 0, 0,
                              ahal=(al + 1) << 4 | al)
            writer = _BitWriter()
            for bi in range(nby * nbx):
                for ci in range(ncomp):
                    writer.write(
                        (int(comp_coeffs[ci][bi][0]) >> al) & 1, 1)
            writer.flush()
            out += writer.out

        dc_scan(AL)
        for ci in range(ncomp):
            for lo, hi in ((1, 20), (21, 63)):
                ac_first_scan(ci, lo, hi, AL)
        for al in range(AL - 1, -1, -1):
            for ci in range(ncomp):
                for lo, hi in ((1, 20), (21, 63)):
                    ac_refine_scan(ci, lo, hi, al)
            dc_refine_scan(al)
    out += b"\xff\xd9"                                  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized → (n, 8, 8) float pixels (pre-clamp)."""
    return np.einsum("ki,nkl,lj->nij", _D, coeffs, _D) + 128.0


def _init_coef_storage(frame):
    """Allocate per-component zigzag coefficient arrays sized to the
    INTERLEAVED MCU grid (the superset); also records the
    non-interleaved block dims used by single-component scans."""
    comps = frame["comps"]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("jpeg_decode: bad sampling factors")
    h, w = frame["h"], frame["w"]
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["hs"]
        c["bh"] = mcuy * c["vs"]
        if c["bh"] * c["bw"] > (1 << 22):
            # corrupt dims would otherwise allocate a multi-GB
            # coefficient array before any entropy byte is validated
            raise ValueError("jpeg_decode: implausible dimensions")
        cw = (w * c["hs"] + hmax - 1) // hmax
        chh = (h * c["vs"] + vmax - 1) // vmax
        c["nbw"] = (cw + 7) // 8
        c["nbh"] = (chh + 7) // 8
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcux"], frame["mcuy"] = mcux, mcuy


def _decode_block_band(reader, zz, lo, hi, dct, act, pred, eobrun,
                       Al=0):
    """Decode one block's FIRST-PASS coefficients in band [lo, hi]
    (zigzag indices) at point-transform ``Al``.  Returns (new_pred,
    new_eobrun).  ``eobrun`` counts REMAINING all-zero-band blocks from
    a pending EOBn run (progressive spectral selection); baseline EOB
    is the r=0 special case."""
    k = lo
    if lo == 0:
        size = _huff_decode(reader, dct)
        pred += _extend(reader.bits(size), size)
        zz[0] = pred << Al                     # two's-complement shift
        k = 1
    while k <= hi:
        rs = _huff_decode(reader, act)
        r, size = rs >> 4, rs & 15
        if size == 0:
            if r == 15:                        # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.bits(r)
            break                              # band ends (EOBn)
        k += r
        if k > hi:
            raise ValueError("jpeg_decode: AC index overrun")
        zz[k] = _extend(reader.bits(size), size) << Al
        k += 1
    return pred, eobrun


def _refine_ac(reader, zz, lo, hi, act, Al, eobrun):
    """AC successive-approximation refinement for one block (T.81
    G.1.2.3 / the classic decode_mcu_AC_refine walk): newly-significant
    coefficients arrive as ±(1 << Al) after a run counted over
    ZERO-history positions only; every nonzero-history position passed
    (or remaining once the block enters an EOB run) reads one
    correction bit that, when set, grows the magnitude by 1 << Al."""
    p1 = 1 << Al
    m1 = -1 << Al
    k = lo
    if eobrun == 0:
        while k <= hi:
            rs = _huff_decode(reader, act)
            r, size = rs >> 4, rs & 15
            if size == 0:
                if r < 15:
                    eobrun = (1 << r)
                    if r:
                        eobrun += reader.bits(r)
                    break                      # EOB run starts HERE
                val = 0                        # ZRL: 16 zero-history
            else:
                if size != 1:
                    raise ValueError(
                        "jpeg_decode: AC refinement size must be 1")
                val = p1 if reader.bit() else m1
            while k <= hi:
                if zz[k] != 0:
                    if reader.bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= hi:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= hi:                         # EOB-run correction pass
            if zz[k] != 0 and reader.bit() and (zz[k] & p1) == 0:
                zz[k] += p1 if zz[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(buf, pos, frame, scomps, Ss, Se, Ah, Al,
                 dc_tabs, ac_tabs, restart_interval):
    """Entropy-decode one scan starting at ``pos`` (first byte after
    the SOS header), accumulating coefficients into each component's
    ``coef`` array.  Returns the position of the next marker's 0xFF.

    Interleaved (ns > 1) scans walk MCUs; single-component scans walk
    the component's NON-interleaved block raster (T.81 A.2.2).
    Spectral selection AND successive approximation are supported:
    Ah == 0 scans are first passes at point transform Al; Ah > 0 scans
    refine (DC: one raw bit per block; AC: the G.1.2.3 walk)."""
    refine = Ah != 0
    reader = _BitReader(buf, pos)
    preds = {c["id"]: 0 for c in scomps}
    eobrun = 0
    units = 0                                  # MCUs or blocks
    interleaved = len(scomps) > 1

    def do_block(c, zz):
        nonlocal eobrun
        if refine:
            if Ss == 0:                        # DC refinement bit
                if reader.bit():
                    zz[0] |= 1 << Al
            else:
                eobrun = _refine_ac(reader, zz, Ss, Se,
                                    c.get("ac_tab"), Al, eobrun)
        else:
            if eobrun > 0 and Ss > 0:
                eobrun -= 1
            else:
                preds[c["id"]], eobrun = _decode_block_band(
                    reader, zz, Ss, Se, c.get("dc_tab"),
                    c.get("ac_tab"), preds[c["id"]], eobrun, Al)

    def maybe_restart():
        nonlocal eobrun
        if restart_interval and units and units % restart_interval == 0:
            m = reader.align_restart()
            if m is None or not (0xD0 <= m <= 0xD7):
                raise ValueError("jpeg_decode: missing restart marker")
            for cid in preds:
                preds[cid] = 0
            eobrun = 0

    if interleaved:
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                maybe_restart()
                for c in scomps:
                    for by in range(c["vs"]):
                        for bx in range(c["hs"]):
                            row = (my * c["vs"] + by) * c["bw"] \
                                + (mx * c["hs"] + bx)
                            do_block(c, c["coef"][row])
                units += 1
    else:
        c = scomps[0]
        for by in range(c["nbh"]):
            for bx in range(c["nbw"]):
                maybe_restart()
                do_block(c, c["coef"][by * c["bw"] + bx])
                units += 1
    # locate the next marker (skip pad bits / stuffed bytes)
    p = reader.pos
    if reader.marker is not None:
        return p - 2
    while p + 1 < len(buf):
        if buf[p] == 0xFF and buf[p + 1] != 0x00:
            if 0xD0 <= buf[p + 1] <= 0xD7:     # stray RST
                p += 2
                continue
            return p
        p += 1
    raise ValueError("jpeg_decode: no marker after scan")


def jpeg_decode(blob) -> np.ndarray:
    """JFIF/JPEG bytes → uint8 (h, w) gray or (h, w, 3) RGB.

    The parser boundary is hardened for crawl data: any structural
    corruption surfaces as ``ValueError`` — byte-level parsers hit
    Index/Key/Attribute/Overflow errors on corrupt streams, and a
    non-ValueError escaping here would kill a whole decode job instead
    of one row (``DecodeMedia`` deliberately catches only the
    enumerated decode errors)."""
    try:
        return _jpeg_decode(blob)
    except ValueError:
        raise
    except (IndexError, KeyError, StopIteration, AttributeError,
            OverflowError, ZeroDivisionError, struct.error) as e:
        raise ValueError(
            f"jpeg_decode: malformed stream "
            f"({type(e).__name__}: {e})") from e


def _jpeg_decode(blob) -> np.ndarray:
    """JFIF/JPEG bytes → uint8 (h, w) gray or (h, w, 3) RGB.

    Baseline sequential (SOF0/1) and spectral-selection progressive
    (SOF2, Ah=Al=0) are decoded; successive-approximation progressive,
    arithmetic coding and 12-bit precision raise ``ValueError`` with a
    clear message.  Raises on truncated streams."""
    buf = bytes(blob)
    if buf[:2] != b"\xff\xd8":
        raise ValueError("jpeg_decode: not a JPEG (no SOI)")
    pos = 2
    qtables = {}
    dc_tabs = {}
    ac_tabs = {}
    frame = None
    restart_interval = 0
    saw_scan = False
    while pos + 2 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("jpeg_decode: marker sync lost")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:                     # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                           # parameterless
        if pos + 2 > len(buf):
            raise ValueError("jpeg_decode: truncated segment header")
        (seglen,) = struct.unpack(">H", buf[pos:pos + 2])
        seg = buf[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("jpeg_decode: truncated segment")
        if marker == 0xDB:                     # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 15
                if prec != 0:
                    raise ValueError("jpeg_decode: 16-bit DQT "
                                     "unsupported (baseline is 8)")
                tab = np.frombuffer(seg[p + 1:p + 65],
                                    dtype=np.uint8).astype(np.int64)
                qtables[tid] = tab[UNZIGZAG].reshape(8, 8)
                p += 65
        elif marker == 0xC4:                   # DHT
            p = 0
            while p < len(seg):
                tclass, tid = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                tab = _decode_tables(bits, vals)
                (dc_tabs if tclass == 0 else ac_tabs)[tid] = tab
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):     # SOF0/1 + progressive
            prec = seg[0]
            if prec != 8:
                raise ValueError("jpeg_decode: only 8-bit precision")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "hs": samp >> 4,
                              "vs": samp & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
            _init_coef_storage(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "jpeg_decode: only baseline sequential (SOF0/1) and "
                "spectral-selection progressive (SOF2) are supported, "
                f"got SOF marker 0x{marker:02X} "
                "(arithmetic/hierarchical out of scope)")
        elif marker == 0xDD:                   # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:                   # SOS
            if frame is None:
                raise ValueError("jpeg_decode: SOS before SOF")
            ns = seg[0]
            scomps = []
            for si in range(ns):
                cs, tabs = seg[1 + 2 * si], seg[2 + 2 * si]
                c = next(cc for cc in frame["comps"]
                         if cc["id"] == cs)
                if tabs >> 4 in dc_tabs:
                    c["dc_tab"] = dc_tabs[tabs >> 4]
                if tabs & 15 in ac_tabs:
                    c["ac_tab"] = ac_tabs[tabs & 15]
                scomps.append(c)
            Ss, Se, ahal = seg[1 + 2 * ns:4 + 2 * ns]
            if not frame["progressive"] and (Ss, Se) != (0, 63):
                raise ValueError("jpeg_decode: partial band in a "
                                 "baseline scan")
            saw_scan = True
            pos = _decode_scan(buf, pos + seglen, frame, scomps,
                               Ss, Se, ahal >> 4, ahal & 15,
                               dc_tabs, ac_tabs, restart_interval)
            continue
        pos += seglen
    if frame is None or not saw_scan:
        raise ValueError("jpeg_decode: missing SOF/SOS")

    comps = frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    h, w = frame["h"], frame["w"]
    planes = []
    for c in comps:
        q = qtables[c["tq"]]
        deq = np.zeros((c["coef"].shape[0], 64), dtype=np.float64)
        deq[:, ZIGZAG] = c["coef"] * q.reshape(-1)[ZIGZAG]
        px = _idct_blocks(deq.reshape(-1, 8, 8))
        px = np.clip(np.rint(px), 0, 255).astype(np.uint8)
        plane = (px.reshape(c["bh"], c["bw"], 8, 8).swapaxes(1, 2)
                 .reshape(c["bh"] * 8, c["bw"] * 8))
        # upsample subsampled components by replication
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0]
    if len(planes) != 3:
        raise ValueError("jpeg_decode: only 1- or 3-component scans")
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)
