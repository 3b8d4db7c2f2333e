"""Pure-stdlib PNG and WAV codecs — the real-format side of the media
stack.

The container has no PIL/ffmpeg, but PNG is just zlib (stdlib) plus
per-scanline filters, and WAV PCM is struct unpacking — so these two
REAL formats are decodable with public-stdlib code only, replacing the
"everything but RAWM raises" stub boundary for the two formats a crawl
actually carries most.  JPEG/MP3/H.264 remain behind the documented
``NotImplementedError`` (entropy coders need a codec library).

Coverage (loud ``ValueError`` outside it):
- PNG: 8-bit, color types 0 (gray), 2 (RGB), 3 (palette), 6 (RGBA),
  non-interlaced, all five scanline filters, multi-IDAT.
- WAV: RIFF/WAVE, PCM (format 1) 8-bit unsigned / 16-bit signed,
  any channel count.

The encoders exist so tests and fixtures can fabricate REAL blobs
deterministically (``png_encode`` spreads all five filter types across
scanlines on purpose — every decode path is exercised by every image).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def png_encode(img: np.ndarray) -> bytes:
    """(h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA uint8 → PNG bytes.

    Scanline filter = ``y % 5`` — deliberately cycles None/Sub/Up/
    Average/Paeth so a decoder roundtrip covers every filter."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        ctype, ch = 0, 1
        img = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        ctype, ch = 2, 3
    elif img.ndim == 3 and img.shape[2] == 4:
        ctype, ch = 6, 4
    else:
        raise ValueError(f"png_encode: unsupported shape {img.shape}")
    h, w = img.shape[:2]
    raw = bytearray()
    prior = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int64)
        left = np.concatenate([np.zeros(ch, dtype=np.int64),
                               line[:-ch]]) if w * ch > ch \
            else np.zeros_like(line)
        upl = np.concatenate([np.zeros(ch, dtype=np.int64),
                              prior[:-ch]]) if w * ch > ch \
            else np.zeros_like(line)
        f = y % 5
        if f == 0:
            filt = line
        elif f == 1:
            filt = line - left
        elif f == 2:
            filt = line - prior
        elif f == 3:
            filt = line - (left + prior) // 2
        else:                          # Paeth
            p = left + prior - upl
            pa_ = np.abs(p - left)
            pb = np.abs(p - prior)
            pc_ = np.abs(p - upl)
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, prior, upl))
            filt = line - pred
        raw.append(f)
        raw.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prior = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def png_decode(blob: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) gray or (h, w, ch).  Palette
    images come back expanded to (h, w, 3)."""
    if blob[:8] != PNG_MAGIC:
        raise ValueError("png_decode: not a PNG")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(blob):
        (ln,) = struct.unpack(">I", blob[pos:pos + 4])
        tag = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("png_decode: missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 \
            or ctype not in _CHANNELS:
        raise ValueError(
            f"png_decode: unsupported PNG (depth={depth}, "
            f"color={ctype}, interlace={interlace}) — only 8-bit "
            "non-interlaced gray/RGB/palette/RGBA")
    ch = _CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("png_decode: scanline size mismatch")
    out = np.zeros((h, stride), dtype=np.int64)
    prior = np.zeros(stride, dtype=np.int64)
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    for y in range(h):
        f = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int64)
        if f == 0:
            recon = line
        elif f == 2:
            recon = (line + prior) & 0xFF
        elif f in (1, 3, 4):
            recon = np.zeros(stride, dtype=np.int64)
            # sequential in x (left dependency); vectorized over the
            # channel lanes of each pixel
            for x in range(0, stride, ch):
                left = recon[x - ch:x] if x >= ch \
                    else np.zeros(ch, dtype=np.int64)
                up = prior[x:x + ch]
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                else:
                    upl = prior[x - ch:x] if x >= ch \
                        else np.zeros(ch, dtype=np.int64)
                    p = left + up - upl
                    pa_ = np.abs(p - left)
                    pb = np.abs(p - up)
                    pc_ = np.abs(p - upl)
                    pred = np.where(
                        (pa_ <= pb) & (pa_ <= pc_), left,
                        np.where(pb <= pc_, up, upl))
                recon[x:x + ch] = (line[x:x + ch] + pred) & 0xFF
        else:
            raise ValueError(f"png_decode: bad filter byte {f}")
        out[y] = recon
        prior = recon
    img = out.astype(np.uint8)
    if ctype == 3:
        if plte is None:
            raise ValueError("png_decode: palette image without PLTE")
        return plte[img.reshape(h, w)]
    if ch == 1:
        return img.reshape(h, w)
    return img.reshape(h, w, ch)


def wav_encode(samples: np.ndarray, rate: int = 16_000,
               bits: int = 16) -> bytes:
    """int array (n,) mono or (n, ch) → RIFF/WAVE PCM bytes."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if bits == 16:
        body = s.astype("<i2").tobytes()
    elif bits == 8:
        body = s.astype(np.uint8).tobytes()
    else:
        raise ValueError("wav_encode: bits must be 8 or 16")
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, bits)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)


def wav_decode(blob: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes → (samples int array (n,) or (n, ch), rate).
    8-bit returns uint8 values as stored; 16-bit returns int16."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("wav_decode: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(blob):
        tag = blob[pos:pos + 4]
        (ln,) = struct.unpack("<I", blob[pos + 4:pos + 8])
        chunk = blob[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)            # chunks are word-aligned
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif tag == b"data":
            data = chunk
    if fmt is None or data is None:
        raise ValueError("wav_decode: missing fmt/data chunk")
    audio_fmt, ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise ValueError(
            f"wav_decode: only PCM 8/16-bit supported "
            f"(format={audio_fmt}, bits={bits})")
    arr = (np.frombuffer(data, dtype="<i2") if bits == 16
           else np.frombuffer(data, dtype=np.uint8))
    if ch > 1:
        arr = arr[:len(arr) - len(arr) % ch].reshape(-1, ch)
    return arr, rate
