"""Compressed bitmap — EXACT mergeable distinct-count / membership state
over dense unsigned integer keys (Roaring-style container layout:
Chambi, Lemire, Kaser & Godin, "Better bitmap performance with Roaring
bitmaps", 2016).

Where HLL trades exactness for O(2^p) memory, a compressed bitmap is the
EXACT end of the same mergeable-UDAF spectrum for key domains that are
dense integers (user ids, doc ids, positions): memory is O(domain/8)
worst case but collapses to O(n_keys·2B) on sparse chunks.  Keys are
chunked by their high bits (chunk = key >> 16); each chunk holds either

- an ``array`` container: sorted unique ``uint16`` low-bits, used while
  the chunk has ≤ 4096 members (≤ 8 KiB), or
- a ``bitset`` container: a fixed 1024-word ``uint64`` bitset (8 KiB)
  once the chunk is denser — so no container ever exceeds 8 KiB.

``merge`` is per-chunk set union — associative, commutative and
IDEMPOTENT (re-delivered partials cannot change the answer), the same
contract the reference's filter merge surface provides for hashed keys
(/root/reference/src/headers/abstract_bqf.hpp:154-170) but lossless.

NOT for 64-bit *hashed* keys: hashing spreads keys uniformly over 2^64,
defeating chunk locality (every chunk holds ~1 key).  Use HLL /
BottomK for hashed domains; use this for natural dense ids, where it
returns exact answers with bit-exact SQL oracles.
"""

from __future__ import annotations

import numpy as np

from bqf_ray.sketches.base import MergeableSketch, register
from bqf_ray.sketches.rsqf import _popcount64

_ARRAY_MAX = 4096          # container flips array -> bitset above this
_WORDS = 1024              # 65536 bits / 64


def _array_to_bitset(lows: np.ndarray) -> np.ndarray:
    bits = np.zeros(_WORDS, dtype=np.uint64)
    np.bitwise_or.at(bits, (lows >> 6).astype(np.int64),
                     np.uint64(1) << (lows.astype(np.uint64) & np.uint64(63)))
    return bits


def _bitset_members(bits: np.ndarray) -> np.ndarray:
    """Bitset container -> sorted uint16 member array."""
    words = np.nonzero(bits)[0]
    out = []
    for w in words:
        b = int(bits[w])
        offs = []
        while b:
            low = b & -b
            offs.append(low.bit_length() - 1)
            b ^= low
        out.append(np.asarray(offs, dtype=np.int64) + (int(w) << 6))
    if not out:
        return np.empty(0, dtype=np.uint16)
    return np.concatenate(out).astype(np.uint16)


@register
class CompressedBitmap(MergeableSketch):
    config_fields = ()

    def __init__(self):
        # chunk id -> ("a", sorted unique uint16) | ("b", uint64[1024])
        self._chunks: dict[int, tuple[str, np.ndarray]] = {}

    # -- updates ------------------------------------------------------

    def update_batch(self, keys: np.ndarray, counts=None) -> None:
        """counts are ignored — membership semantics."""
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return
        keys = np.unique(keys)                      # sorted unique
        chunk = (keys >> np.uint64(16)).astype(np.int64)
        lows = (keys & np.uint64(0xFFFF)).astype(np.uint16)
        bounds = np.nonzero(np.diff(chunk))[0] + 1
        starts = np.concatenate(([0], bounds))
        stops = np.concatenate((bounds, [len(keys)]))
        for s, e in zip(starts, stops):
            self._union_into(int(chunk[s]), lows[s:e])

    def _union_into(self, cid: int, lows: np.ndarray) -> None:
        """Union sorted-unique uint16 ``lows`` into chunk ``cid``."""
        cur = self._chunks.get(cid)
        if cur is None:
            if len(lows) > _ARRAY_MAX:
                self._chunks[cid] = ("b", _array_to_bitset(lows))
            else:
                self._chunks[cid] = ("a", lows.copy())
            return
        kind, data = cur
        if kind == "b":
            np.bitwise_or.at(
                data, (lows >> 6).astype(np.int64),
                np.uint64(1) << (lows.astype(np.uint64) & np.uint64(63)))
        else:
            u = np.union1d(data, lows)              # stays sorted unique
            if len(u) > _ARRAY_MAX:
                self._chunks[cid] = ("b", _array_to_bitset(u))
            else:
                self._chunks[cid] = ("a", u.astype(np.uint16))

    # -- queries ------------------------------------------------------

    def count(self) -> int:
        """EXACT number of distinct keys inserted."""
        n = 0
        for kind, data in self._chunks.values():
            if kind == "a":
                n += len(data)
            else:
                n += int(_popcount64(data).sum())
        return n

    def estimate(self) -> float:                    # UDAF finalize="estimate"
        return float(self.count())

    def query_batch(self, keys: np.ndarray) -> np.ndarray:
        """Exact membership per key (bool array, input order)."""
        keys = np.asarray(keys, dtype=np.uint64)
        out = np.zeros(len(keys), dtype=bool)
        if len(keys) == 0:
            return out
        chunk = (keys >> np.uint64(16)).astype(np.int64)
        lows = keys & np.uint64(0xFFFF)
        order = np.argsort(chunk, kind="stable")
        c_sorted = chunk[order]
        bounds = np.nonzero(np.diff(c_sorted))[0] + 1
        starts = np.concatenate(([0], bounds))
        stops = np.concatenate((bounds, [len(keys)]))
        for s, e in zip(starts, stops):
            cur = self._chunks.get(int(c_sorted[s]))
            if cur is None:
                continue
            idx = order[s:e]
            lo = lows[idx]
            kind, data = cur
            if kind == "a":
                pos = np.searchsorted(data, lo.astype(np.uint16))
                ok = (pos < len(data)) & (data[np.minimum(pos, len(data) - 1)]
                                          == lo.astype(np.uint16))
            else:
                ok = (data[(lo >> np.uint64(6)).astype(np.int64)]
                      >> (lo & np.uint64(63))) & np.uint64(1) > 0
            out[idx] = ok
        return out

    def members(self) -> np.ndarray:
        """All keys, sorted ascending (exact enumerate — small domains)."""
        out = []
        for cid in sorted(self._chunks):
            kind, data = self._chunks[cid]
            lows = data if kind == "a" else _bitset_members(data)
            out.append((np.uint64(cid) << np.uint64(16))
                       | lows.astype(np.uint64))
        if not out:
            return np.empty(0, dtype=np.uint64)
        return np.concatenate(out)

    # -- merge --------------------------------------------------------

    def merge(self, other: "CompressedBitmap") -> "CompressedBitmap":
        self.check_mergeable(other)
        for cid, (kind, data) in other._chunks.items():
            mine = self._chunks.get(cid)
            if mine is None:
                self._chunks[cid] = (kind, data.copy())
            elif kind == "a":
                self._union_into(cid, data)
            elif mine[0] == "b":
                np.bitwise_or(mine[1], data, out=mine[1])
            else:                                   # mine array, other bitset
                bits = data.copy()
                np.bitwise_or.at(
                    bits, (mine[1] >> 6).astype(np.int64),
                    np.uint64(1) << (mine[1].astype(np.uint64)
                                     & np.uint64(63)))
                self._chunks[cid] = ("b", bits)
        return self

    # -- serde --------------------------------------------------------

    def _state_arrays(self) -> dict[str, np.ndarray]:
        cids = np.asarray(sorted(self._chunks), dtype=np.int64)
        kinds = np.asarray([0 if self._chunks[int(c)][0] == "a" else 1
                            for c in cids], dtype=np.uint8)
        arrs = [self._chunks[int(c)][1] for c in cids
                if self._chunks[int(c)][0] == "a"]
        bits = [self._chunks[int(c)][1] for c in cids
                if self._chunks[int(c)][0] == "b"]
        lens = np.asarray([len(a) for a in arrs], dtype=np.int64)
        return {
            "cids": cids, "kinds": kinds, "alens": lens,
            "adata": (np.concatenate(arrs) if arrs
                      else np.empty(0, dtype=np.uint16)),
            "bdata": (np.concatenate(bits) if bits
                      else np.empty(0, dtype=np.uint64)),
        }

    def _config(self) -> dict:
        return {}

    @classmethod
    def _from_state(cls, config: dict, arrays: dict) -> "CompressedBitmap":
        self = cls()
        cids = arrays["cids"]
        kinds = arrays["kinds"]
        aoff = np.concatenate(([0], np.cumsum(arrays["alens"])))
        ai = bi = 0
        for i, cid in enumerate(cids):
            if kinds[i] == 0:
                self._chunks[int(cid)] = (
                    "a", arrays["adata"][aoff[ai]:aoff[ai + 1]].copy())
                ai += 1
            else:
                self._chunks[int(cid)] = (
                    "b", arrays["bdata"][bi * _WORDS:(bi + 1) * _WORDS].copy())
                bi += 1
        return self
