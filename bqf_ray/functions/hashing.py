"""Vectorized 64-bit hashing kernels for the sketch engine.

Three hash families, all pure numpy, all deterministic:

- ``xxhash64_array``: the XXH64 algorithm (Yann Collet's published spec)
  vectorized over an Arrow/numpy array of variable-length strings.  This is
  the default content hash for tokens / shingles / documents
  (cf. north_star: "shingles/hashes tokens and k-grams with
  xxhash64/MurmurHash3").
- ``fmix64``: the MurmurHash3 x64 finalizer — a cheap bijective mixer for
  already-numeric keys (used by HLL / Count-Min / Bloom row hashing).
- ``bfc_hash_64`` / ``bfc_hash_64_inv``: the invertible Thomas-Wang-style
  xorshift hash the reference uses so its filter stores elements losslessly
  (semantics of /root/reference/src/additional_methods.cpp:169-215 — the
  published lh3 "bfc" hash).  Masked to ``bits`` bits it is a bijection on
  [0, 2^bits), which gives the BQF its zero-false-positive property at the
  stored-hash level.

All scalar helpers exist alongside the vectorized kernels and are
cross-checked in tests/test_hashing.py.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)

# XXH64 primes (published constants)
_P1 = np.uint64(11400714785074694791)
_P2 = np.uint64(14029467366897019727)
_P3 = np.uint64(1609587929392839161)
_P4 = np.uint64(9650029242287828579)
_P5 = np.uint64(2870177450012600261)

_MASK64 = (1 << 64) - 1


# ---------------------------------------------------------------------------
# scalar XXH64 (pure-python reference used to validate the vectorized kernel)
# ---------------------------------------------------------------------------

def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * int(_P2)) & _MASK64
    acc = _rotl(acc, 31)
    return (acc * int(_P1)) & _MASK64


def xxhash64(data: bytes, seed: int = 0) -> int:
    """Scalar XXH64 of ``data`` (pure-python spec implementation)."""
    n = len(data)
    p = 0
    if n >= 32:
        v1 = (seed + int(_P1) + int(_P2)) & _MASK64
        v2 = (seed + int(_P2)) & _MASK64
        v3 = seed & _MASK64
        v4 = (seed - int(_P1)) & _MASK64
        while n - p >= 32:
            v1 = _round(v1, int.from_bytes(data[p : p + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[p + 8 : p + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[p + 16 : p + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[p + 24 : p + 32], "little"))
            p += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK64
        for v in (v1, v2, v3, v4):
            h ^= _round(0, v)
            h = (h * int(_P1) + int(_P4)) & _MASK64
    else:
        h = (seed + int(_P5)) & _MASK64
    h = (h + n) & _MASK64
    while n - p >= 8:
        k1 = _round(0, int.from_bytes(data[p : p + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * int(_P1) + int(_P4)) & _MASK64
        p += 8
    if n - p >= 4:
        h ^= (int.from_bytes(data[p : p + 4], "little") * int(_P1)) & _MASK64
        h = (_rotl(h, 23) * int(_P2) + int(_P3)) & _MASK64
        p += 4
    while p < n:
        h ^= (data[p] * int(_P5)) & _MASK64
        h = (_rotl(h, 11) * int(_P1)) & _MASK64
        p += 1
    # avalanche
    h ^= h >> 33
    h = (h * int(_P2)) & _MASK64
    h ^= h >> 29
    h = (h * int(_P3)) & _MASK64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# vectorized XXH64 over variable-length byte rows
# ---------------------------------------------------------------------------

def _vrotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _vround(acc: np.ndarray, lane: np.ndarray) -> np.ndarray:
    acc = acc + lane * _P2
    return _vrotl(acc, 31) * _P1


def _pad_rows(data: np.ndarray, offsets: np.ndarray, lens: np.ndarray,
              pad_to: int) -> np.ndarray:
    """Gather variable-length rows out of a flat uint8 buffer into an
    (n, pad_to) zero-padded matrix.  Scatters only the Σlens real bytes
    (1-D fancy indexing), never touching the padding — O(total bytes), not
    O(n × pad_to)."""
    n = len(lens)
    out = np.zeros((n, pad_to), dtype=np.uint8)
    if n == 0 or pad_to == 0:
        return out
    total = int(lens.sum())
    if total == 0:
        return out
    row_cum = np.concatenate([[0], np.cumsum(lens)])
    within = np.arange(total, dtype=np.int64) - np.repeat(row_cum[:-1], lens)
    src = np.repeat(offsets, lens) + within
    dest = np.repeat(np.arange(n, dtype=np.int64) * pad_to, lens) + within
    out.reshape(-1)[dest] = data[src]
    return out


def _xxh64_padded(padded: np.ndarray, lens: np.ndarray, seed: int) -> np.ndarray:
    """XXH64 over an (n, W)-byte zero-padded row matrix; lens gives true
    byte lengths.  Fully vectorized across rows; loops only over byte
    position (W/8 iterations)."""
    n, width = padded.shape
    assert width % 32 == 0 or width == 0
    words = padded.view("<u8") if width else np.zeros((n, 0), dtype=np.uint64)
    lens64 = lens.astype(np.uint64)
    seed_u = np.uint64(seed & _MASK64)

    n_stripes = width // 32
    has_long = bool(np.any(lens >= 32))
    seed_i = seed & _MASK64
    h = np.full(n, np.uint64((seed_i + int(_P5)) & _MASK64), dtype=np.uint64)
    if has_long:
        v1 = np.full(n, np.uint64((seed_i + int(_P1) + int(_P2)) & _MASK64), dtype=np.uint64)
        v2 = np.full(n, np.uint64((seed_i + int(_P2)) & _MASK64), dtype=np.uint64)
        v3 = np.full(n, seed_u, dtype=np.uint64)
        v4 = np.full(n, np.uint64((seed_i - int(_P1)) & _MASK64), dtype=np.uint64)
        for s in range(n_stripes):
            m = lens64 >= np.uint64(32 * (s + 1))
            if not m.any():
                break
            base = 4 * s
            v1 = np.where(m, _vround(v1, words[:, base + 0]), v1)
            v2 = np.where(m, _vround(v2, words[:, base + 1]), v2)
            v3 = np.where(m, _vround(v3, words[:, base + 2]), v3)
            v4 = np.where(m, _vround(v4, words[:, base + 3]), v4)
        hl = _vrotl(v1, 1) + _vrotl(v2, 7) + _vrotl(v3, 12) + _vrotl(v4, 18)
        for v in (v1, v2, v3, v4):
            hl = (hl ^ _vround(np.zeros(n, dtype=np.uint64), v)) * _P1 + _P4
        h = np.where(lens64 >= np.uint64(32), hl, h)

    h = h + lens64
    # tail begins at (len // 32) * 32
    tail_start = (lens64 >> np.uint64(5)) << np.uint64(5)
    rem = lens64 - tail_start          # 0..31
    tail_word0 = (tail_start >> np.uint64(3)).astype(np.int64)  # aligned
    n_tail_words = (rem >> np.uint64(3)).astype(np.int64)       # 0..3
    for i in range(4):
        m = n_tail_words > i
        if not m.any():
            continue
        idx = np.minimum(tail_word0 + i, max(words.shape[1] - 1, 0))
        w = words[np.arange(n), idx] if width else np.zeros(n, dtype=np.uint64)
        k1 = _vround(np.zeros(n, dtype=np.uint64), w)
        h = np.where(m, (_vrotl(h ^ k1, 27)) * _P1 + _P4, h)
    # 4-byte lane
    byte_pos = (tail_start + (n_tail_words.astype(np.uint64) << np.uint64(3))).astype(np.int64)
    rem2 = rem - (n_tail_words.astype(np.uint64) << np.uint64(3))  # 0..7
    m4 = rem2 >= np.uint64(4)
    if m4.any() and width:
        u32 = padded.view("<u4")
        idx4 = np.minimum(byte_pos >> 2, u32.shape[1] - 1)
        lane4 = u32[np.arange(n), idx4].astype(np.uint64)
        h = np.where(m4, _vrotl(h ^ (lane4 * _P1), 23) * _P2 + _P3, h)
    byte_pos = byte_pos + np.where(m4, 4, 0)
    rem2 = rem2 - np.where(m4, np.uint64(4), np.uint64(0))
    # final bytes (0..3)
    for i in range(3):
        m = rem2 > np.uint64(i)
        if not m.any():
            break
        idx = np.minimum(byte_pos + i, max(width - 1, 0))
        b = padded[np.arange(n), idx].astype(np.uint64) if width else np.zeros(n, dtype=np.uint64)
        h = np.where(m, _vrotl(h ^ (b * _P5), 11) * _P1, h)
    # avalanche
    h ^= h >> np.uint64(33)
    h *= _P2
    h ^= h >> np.uint64(29)
    h *= _P3
    h ^= h >> np.uint64(32)
    return h


def xxhash64_array(values, seed: int = 0, chunk_bytes: int = 1 << 26) -> np.ndarray:
    """Vectorized XXH64 over an array of strings/bytes.

    ``values`` may be a ``pyarrow.Array``/``ChunkedArray`` of
    string/large_string/binary, a numpy object array of str/bytes, or a
    list.  Returns ``np.ndarray[uint64]`` of the same length.  Strings are
    hashed as their UTF-8 bytes.  Rows are processed in slices so the padded
    row matrix stays under ``chunk_bytes``.
    """
    import pyarrow as pa

    if isinstance(values, pa.ChunkedArray):
        parts = [xxhash64_array(c, seed=seed, chunk_bytes=chunk_bytes)
                 for c in values.chunks]
        return np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
    if isinstance(values, pa.Array):
        if pa.types.is_large_string(values.type) or pa.types.is_large_binary(values.type):
            values = values.cast(pa.binary()) if pa.types.is_large_binary(values.type) \
                else values.cast(pa.string())
        if pa.types.is_string(values.type):
            values = values.cast(pa.binary())
        if not pa.types.is_binary(values.type):
            raise TypeError(f"unsupported arrow type {values.type}")
        if values.null_count:
            values = values.fill_null(b"")
        values = values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
        buf_off = np.frombuffer(values.buffers()[1], dtype=np.int32,
                                count=len(values) + values.offset + 1)
        data_buf = values.buffers()[2]
        data = np.frombuffer(data_buf, dtype=np.uint8) if data_buf is not None \
            else np.empty(0, dtype=np.uint8)
        offsets = buf_off[values.offset:values.offset + len(values)].astype(np.int64)
        lens = (buf_off[values.offset + 1:values.offset + len(values) + 1]
                - buf_off[values.offset:values.offset + len(values)]).astype(np.int64)
    else:
        rows = [v.encode("utf-8") if isinstance(v, str) else (bytes(v) if v is not None else b"")
                for v in values]
        lens = np.array([len(b) for b in rows], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64) \
            if rows else np.empty(0, dtype=np.int64)
        data = np.frombuffer(b"".join(rows), dtype=np.uint8)

    n = len(lens)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    # process rows in fixed-size slices sized off the global max length so
    # the padded matrix stays under chunk_bytes (vectorized — no per-row
    # python loop)
    budget = max(chunk_bytes, 1 << 16)
    global_max = int(lens.max())
    rows_per_chunk = int(max(256, min(n, budget // max(global_max, 32))))
    start = 0
    while start < n:
        end = min(n, start + rows_per_chunk)
        max_len = int(lens[start:end].max()) if end > start else 1
        pad_to = ((max(max_len, 1) + 31) // 32) * 32
        padded = _pad_rows(data, offsets[start:end], lens[start:end], pad_to)
        out[start:end] = _xxh64_padded(padded, lens[start:end], seed)
        start = end
    return out


def md5_hash64_array(values) -> np.ndarray:
    """64-bit hash = big-endian first 8 bytes of ``md5(utf8(value))``.

    Chosen for CROSS-ENGINE reproducibility, not speed: any ANSI-SQL
    engine computes the identical value as
    ``('0x' || substr(md5(v), 1, 16))::UBIGINT``, which makes md5-based
    fingerprints (e.g. SimHash) independently checkable outside this
    engine.  Each DISTINCT value is hashed once (dictionary-encode in
    Arrow C++, then a vocab-sized Python pass over the dictionary) and
    gathered back, so the Python cost is O(unique), not O(rows).
    """
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array(list(values), type=pa.string())
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if len(values) == 0:
        return np.empty(0, dtype=np.uint64)
    enc = pc.dictionary_encode(values)
    dic = enc.dictionary.to_pylist()
    uh = np.fromiter(
        (int.from_bytes(hashlib.md5(
            (s if isinstance(s, bytes) else str(s).encode("utf-8"))
            if s is not None else b"").digest()[:8], "big") for s in dic),
        dtype=np.uint64, count=len(dic))
    idx = np.asarray(enc.indices, dtype=np.int64)
    return uh[idx]


# ---------------------------------------------------------------------------
# MurmurHash3 x64 finalizer — integer mixer
# ---------------------------------------------------------------------------

def fmix64(x: np.ndarray | int):
    """MurmurHash3 64-bit finalizer (bijective mix). Vectorized for arrays."""
    if isinstance(x, np.ndarray):
        x = x.astype(np.uint64, copy=True)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xC4CEB9FE1A85EC53)
        x ^= x >> np.uint64(33)
        return x
    x &= _MASK64
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & _MASK64
    x ^= x >> 33
    x = (x * 0xC4CEB9FE1A85EC53) & _MASK64
    x ^= x >> 33
    return x


# ---------------------------------------------------------------------------
# invertible bfc hash (reference parity mode)
# ---------------------------------------------------------------------------

def bfc_hash_64(key, bits: int = 64):
    """Invertible Thomas-Wang/xorshift hash masked to ``bits`` bits.

    Same algorithm as the reference's ``bfc_hash_64``
    (/root/reference/src/additional_methods.cpp:169-178; the hash is the
    published lh3/bfc integer hash).  A bijection on [0, 2^bits) — storing
    the full hash therefore stores the key losslessly, which is the
    reference BQF's zero-FP property.  Vectorized when ``key`` is an array.
    """
    arr = isinstance(key, np.ndarray)
    mask = np.uint64((1 << bits) - 1) if arr else ((1 << bits) - 1)
    if arr:
        k = key.astype(np.uint64, copy=True)
        k = (~k + (k << np.uint64(21))) & mask
        k = k ^ (k >> np.uint64(24))
        k = (k + (k << np.uint64(3)) + (k << np.uint64(8))) & mask
        k = k ^ (k >> np.uint64(14))
        k = (k + (k << np.uint64(2)) + (k << np.uint64(4))) & mask
        k = k ^ (k >> np.uint64(28))
        k = (k + (k << np.uint64(31))) & mask
        return k
    k = key & _MASK64
    k = (~k + (k << 21)) & mask
    k = k ^ (k >> 24)
    k = (k + (k << 3) + (k << 8)) & mask
    k = k ^ (k >> 14)
    k = (k + (k << 2) + (k << 4)) & mask
    k = k ^ (k >> 28)
    k = (k + (k << 31)) & mask
    return k


def bfc_hash_64_inv(key, bits: int = 64):
    """Exact inverse of :func:`bfc_hash_64` (semantics of
    /root/reference/src/additional_methods.cpp:181-215)."""
    arr = isinstance(key, np.ndarray)
    if arr:
        mask = np.uint64((1 << bits) - 1)
        k = key.astype(np.uint64, copy=True)
        # invert k = (k + (k << 31)) & mask
        tmp = (k - (k << np.uint64(31)))
        k = (k - (tmp << np.uint64(31))) & mask
        # invert k ^= k >> 28
        tmp = k ^ (k >> np.uint64(28))
        k = k ^ (tmp >> np.uint64(28))
        # invert k *= 21
        k = (k * np.uint64(14933078535860113213)) & mask
        # invert k ^= k >> 14  (apply three rounds then final)
        tmp = k ^ (k >> np.uint64(14))
        tmp = k ^ (tmp >> np.uint64(14))
        tmp = k ^ (tmp >> np.uint64(14))
        k = k ^ (tmp >> np.uint64(14))
        # invert k *= 265
        k = (k * np.uint64(15244667743933553977)) & mask
        # invert k ^= k >> 24
        tmp = k ^ (k >> np.uint64(24))
        k = k ^ (tmp >> np.uint64(24))
        # invert k = (~k + (k << 21)) & mask
        tmp = ~k
        tmp = ~(k - (tmp << np.uint64(21)))
        tmp = ~(k - (tmp << np.uint64(21)))
        k = (~(k - (tmp << np.uint64(21)))) & mask
        return k
    mask = (1 << bits) - 1
    k = key & mask
    tmp = (k - (k << 31)) & _MASK64
    k = (k - ((tmp << 31) & _MASK64)) & mask
    tmp = k ^ (k >> 28)
    k = k ^ (tmp >> 28)
    k = (k * 14933078535860113213) & mask
    tmp = k ^ (k >> 14)
    tmp = k ^ (tmp >> 14)
    tmp = k ^ (tmp >> 14)
    k = k ^ (tmp >> 14)
    k = (k * 15244667743933553977) & mask
    tmp = k ^ (k >> 24)
    k = k ^ (tmp >> 24)
    tmp = (~k) & _MASK64
    tmp = (~((k - ((tmp << 21) & _MASK64)) & _MASK64)) & _MASK64
    tmp = (~((k - ((tmp << 21) & _MASK64)) & _MASK64)) & _MASK64
    k = ((~((k - ((tmp << 21) & _MASK64)) & _MASK64)) & _MASK64) & mask
    return k
