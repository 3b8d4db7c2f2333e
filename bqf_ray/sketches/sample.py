"""Bottom-k (min-wise) sampling sketch — the distributed "sample K items
from 100 TB" primitive a training-data pipeline needs.

Keep the k keys with the SMALLEST ``fmix64(key ^ seed)``: a deterministic,
order-invariant, trivially mergeable (min-combine) uniform sample over
DISTINCT keys (Broder's min-wise independence argument; bottom-k sketches
per Cohen & Kaplan 2007).  Doubles as a distinct-count estimator:
``(k-1) / h_(k)`` scaled to the hash range.
"""

from __future__ import annotations

import numpy as np

from bqf_ray.functions.hashing import fmix64
from bqf_ray.sketches.base import MergeableSketch, register


@register
class BottomK(MergeableSketch):
    config_fields = ("k", "seed")

    def __init__(self, k: int = 1024, seed: int = 0):
        assert k >= 1
        self.k = int(k)
        self.seed = int(seed)
        self._hashes = np.empty(0, dtype=np.uint64)   # sorted ascending
        self._keys = np.empty(0, dtype=np.uint64)     # aligned with hashes

    def update_batch(self, keys: np.ndarray, counts=None) -> None:
        """counts ignored — the sample is over distinct keys."""
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return
        h = fmix64(keys ^ np.uint64(self.seed * 0x9E3779B97F4A7C15
                                    & 0xFFFFFFFFFFFFFFFF))
        allh = np.concatenate([self._hashes, h])
        allk = np.concatenate([self._keys, keys])
        order = np.argsort(allh, kind="stable")
        allh, allk = allh[order], allk[order]
        uniq = np.concatenate([[True], allh[1:] != allh[:-1]])
        allh, allk = allh[uniq], allk[uniq]
        self._hashes = allh[:self.k]
        self._keys = allk[:self.k]

    def merge(self, other: "BottomK") -> "BottomK":
        self.check_mergeable(other)
        allh = np.concatenate([self._hashes, other._hashes])
        allk = np.concatenate([self._keys, other._keys])
        order = np.argsort(allh, kind="stable")
        allh, allk = allh[order], allk[order]
        uniq = np.concatenate([[True], allh[1:] != allh[:-1]]) \
            if len(allh) else np.empty(0, dtype=bool)
        allh, allk = allh[uniq], allk[uniq]
        self._hashes = allh[:self.k]
        self._keys = allk[:self.k]
        return self

    def sample(self) -> np.ndarray:
        """The sampled keys (≤ k of them), in hash order."""
        return self._keys.copy()

    def estimate(self) -> float:
        """Distinct-count estimate (k-1)/h_(k) · 2^64; exact (=|sample|)
        while fewer than k distinct keys were seen."""
        if len(self._hashes) < self.k:
            return float(len(self._hashes))
        hk = float(self._hashes[-1])
        return (self.k - 1) * (2.0 ** 64) / max(hk, 1.0)

    def error_bound(self) -> float:
        """Relative standard error ≈ 1/sqrt(k-2) (Cohen & Kaplan)."""
        return 1.0 / np.sqrt(max(self.k - 2, 1))

    def _state_arrays(self):
        return {"hashes": self._hashes, "keys": self._keys}

    def _config(self):
        return {"k": self.k, "seed": self.seed}

    @classmethod
    def _from_state(cls, config, arrays):
        s = cls(k=int(config["k"]), seed=int(config["seed"]))
        s._hashes = arrays["hashes"].astype(np.uint64)
        s._keys = arrays["keys"].astype(np.uint64)
        return s
