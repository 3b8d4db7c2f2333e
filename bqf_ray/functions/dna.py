"""DNA-domain codecs — reference-parity layer (vectorized numpy).

The reference's payload domain is DNA k-mers; our engine's is web text, but
the codec layer is kept (and tested against the reference's observable
behavior) so the genomic pipelines remain runnable:

- 2-bit encode/decode with the reference's mapping A=0, C=1, T=2, G=3 —
  derived from ``(char >> 1) & 0b11`` (/root/reference/src/bqf_cf.cpp:97,
  src/additional_methods.cpp:129-165).
- reverse complement / canonical form min(x, revcomp(x))
  (/root/reference/src/additional_methods.cpp:259-310).
- rolling canonical k-mer extraction with invalid-character window reset
  (/root/reference/src/bqf_cf.cpp:80-116).
- ``kmer_to_hash``/``hash_to_kmer`` via the invertible bfc hash masked to
  2k bits (/root/reference/src/additional_methods.cpp:218-228) — the
  zero-FP mechanism.
"""

from __future__ import annotations

import numpy as np

from bqf_ray.functions.hashing import bfc_hash_64, bfc_hash_64_inv

_DECODE = np.array(list(b"ACTG"), dtype=np.uint8)   # index = 2-bit code
_ENC_LUT = np.full(256, 255, dtype=np.uint8)
for _ch in b"ACGTacgt":
    _ENC_LUT[_ch] = (_ch >> 1) & 0b11


def encode(seq: str | bytes) -> int:
    """2-bit encode a DNA string (A=0,C=1,T=2,G=3), first char in the
    high bits — matches reference ``encode``."""
    b = seq.encode() if isinstance(seq, str) else bytes(seq)
    v = 0
    for ch in b:
        code = _ENC_LUT[ch]
        assert code != 255, f"invalid nucleotide {chr(ch)!r}"
        v = (v << 2) | int(code)
    return v


def decode(value: int, k: int) -> str:
    """Inverse of :func:`encode` for a k-mer."""
    out = bytearray(k)
    for i in range(k - 1, -1, -1):
        out[i] = _DECODE[value & 0b11]
        value >>= 2
    return out.decode()


def revcomp(value: int, k: int) -> int:
    """Reverse complement of a 2-bit-encoded k-mer (complement = XOR 0b10
    per the reference's mapping)."""
    out = 0
    for _ in range(k):
        out = (out << 2) | ((value & 0b11) ^ 0b10)
        value >>= 2
    return out


def canonical(value: int, k: int) -> int:
    """min(kmer, revcomp) — reference ``canonical``."""
    return min(value, revcomp(value, k))


def kmer_to_hash(value: int, k: int) -> int:
    return bfc_hash_64(value, 2 * k)


def hash_to_kmer(h: int, k: int) -> str:
    return decode(bfc_hash_64_inv(h, 2 * k), k)


def encode_batch(col, s: int) -> np.ndarray:
    """2-bit encode a pyarrow string column of fixed-length ``s`` DNA
    strings — fully vectorized: the column's UTF-8 buffer is viewed as an
    (n, s) byte matrix (equal lengths ⇒ contiguous) and folded with s
    shift-ors.  Replaces the per-string python ``encode`` loop in the
    counted-smer build path (r1 verdict #7)."""
    import pyarrow as pa
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset:col.offset + n + 1]
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    if not ((offs[1:] - offs[:-1]) == s).all():
        raise ValueError(f"smer length != s={s} in input")
    mat = data[offs[0]:offs[0] + n * s].reshape(n, s)
    codes = _ENC_LUT[mat]
    if (codes == 255).any():
        raise ValueError("invalid nucleotide in smer column")
    vals = np.zeros(n, dtype=np.uint64)
    for j in range(s):
        vals = (vals << np.uint64(2)) | codes[:, j].astype(np.uint64)
    return vals


def sequence_kmers(seq: str, k: int, canonical_form: bool = True) -> np.ndarray:
    """All k-mers of a sequence as encoded uint64s, rolling-window with
    reset on invalid characters (semantics of
    /root/reference/src/bqf_cf.cpp:80-116).  Vectorized: encode all chars,
    split at invalid positions, slide within valid runs."""
    b = np.frombuffer(seq.encode(), dtype=np.uint8)
    codes = _ENC_LUT[b]
    valid = codes != 255
    out = []
    # split into maximal valid runs
    edges = np.flatnonzero(np.diff(np.concatenate([[0], valid.view(np.int8),
                                                   [0]])))
    for start, end in zip(edges[::2], edges[1::2]):
        run = codes[start:end].astype(np.uint64)
        n = len(run)
        if n < k:
            continue
        # rolling encode: kmer_i = sum run[i+j] << 2*(k-1-j)
        kmers = np.zeros(n - k + 1, dtype=np.uint64)
        for j in range(k):
            kmers = (kmers << np.uint64(2)) | run[j:j + n - k + 1]
        if canonical_form:
            rc = np.zeros_like(kmers)
            v = kmers.copy()
            for _ in range(k):
                rc = (rc << np.uint64(2)) | ((v & np.uint64(3)) ^ np.uint64(2))
                v >>= np.uint64(2)
            kmers = np.minimum(kmers, rc)
        out.append(kmers)
    return np.concatenate(out) if out else np.empty(0, dtype=np.uint64)


def sequence_kmer_hashes(seq: str, k: int, canonical_form: bool = True
                         ) -> np.ndarray:
    """Canonical k-mer bfc hashes of a sequence — the reference's insert
    pipeline (``insert_kmer(canon)`` → ``kmer_to_hash``)."""
    kmers = sequence_kmers(seq, k, canonical_form)
    return bfc_hash_64(kmers, 2 * k)
