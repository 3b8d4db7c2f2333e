"""Blocked Bloom filter (Putze, Sanders & Singler 2007).

All k probe bits for a key fall in one 512-bit (cache-line) block — one
memory touch per query at scale.  Published FP bound for a classic Bloom is
(1 − e^{−kn/m})^k; blocking adds a small penalty from uneven block loads
(tested with slack in tests/test_sketch_bounds.py).  Merge = bitwise OR of
the bit array (requires identical geometry) — associative/commutative/
idempotent.
"""

from __future__ import annotations

import numpy as np

from bqf_ray.functions.hashing import fmix64
from bqf_ray.sketches.base import MergeableSketch, register

_BLOCK_BITS = 512
_BLOCK_WORDS = _BLOCK_BITS // 64


@register
class BlockedBloom(MergeableSketch):
    config_fields = ("n_blocks", "k", "seed")

    def __init__(self, n_bits: int = 1 << 20, k: int = 7, seed: int = 0):
        self.n_blocks = max(1, int(n_bits) // _BLOCK_BITS)
        self.k = int(k)
        self.seed = int(seed)
        self.words = np.zeros(self.n_blocks * _BLOCK_WORDS, dtype=np.uint64)
        self.n_added = np.uint64(0)

    @classmethod
    def from_capacity(cls, n: int, fp: float = 0.01, seed: int = 0) -> "BlockedBloom":
        m = int(np.ceil(-n * np.log(fp) / (np.log(2) ** 2)))
        k = max(1, int(round(m / max(n, 1) * np.log(2))))
        return cls(n_bits=m, k=k, seed=seed)

    def _positions(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """block word index (n,) base + (k, n) in-block bit positions."""
        keys = np.asarray(keys, dtype=np.uint64)
        h1 = fmix64(keys ^ np.uint64(self.seed))
        h2 = fmix64(h1 ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
        block = (h1 % np.uint64(self.n_blocks)).astype(np.int64)
        bits = np.empty((self.k, len(keys)), dtype=np.uint64)
        for i in range(self.k):
            bits[i] = (h1 + np.uint64(i) * h2) % np.uint64(_BLOCK_BITS)
        return block * _BLOCK_WORDS, bits

    def update_batch(self, keys: np.ndarray, counts=None) -> None:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return
        base, bits = self._positions(keys)
        for i in range(self.k):
            widx = base + (bits[i] >> np.uint64(6)).astype(np.int64)
            np.bitwise_or.at(self.words, widx,
                             np.uint64(1) << (bits[i] & np.uint64(63)))
        self.n_added += np.uint64(len(keys))

    def query_batch(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return np.empty(0, dtype=bool)
        base, bits = self._positions(keys)
        out = np.ones(len(keys), dtype=bool)
        for i in range(self.k):
            widx = base + (bits[i] >> np.uint64(6)).astype(np.int64)
            mask = np.uint64(1) << (bits[i] & np.uint64(63))
            out &= (self.words[widx] & mask) != 0
        return out

    def merge(self, other: "BlockedBloom") -> "BlockedBloom":
        self.check_mergeable(other)
        np.bitwise_or(self.words, other.words, out=self.words)
        self.n_added += other.n_added
        return self

    def error_bound(self) -> float:
        """Classic Bloom FP estimate for current load (blocking adds a small
        extra factor — tests allow 3x slack)."""
        m = self.n_blocks * _BLOCK_BITS
        n = float(self.n_added)
        return float((1.0 - np.exp(-self.k * n / m)) ** self.k)

    def _state_arrays(self):
        return {"words": self.words,
                "n_added": np.array([self.n_added], dtype=np.uint64)}

    def _config(self):
        return {"n_bits": self.n_blocks * _BLOCK_BITS, "k": self.k,
                "seed": self.seed}

    @classmethod
    def _from_state(cls, config, arrays):
        s = cls(n_bits=int(config["n_bits"]), k=int(config["k"]),
                seed=int(config["seed"]))
        s.words = arrays["words"].astype(np.uint64)
        s.n_added = np.uint64(arrays["n_added"][0])
        return s
