"""Cuckoo filter (Fan, Andersen, Kaminsky & Mitzenmacher, CoNEXT 2014).

The DELETABLE membership sketch: fingerprints live in an m×b slot table;
key → fingerprint ``fp`` (f bits, never 0) with two candidate buckets
``i1 = h(key)`` and ``i2 = i1 XOR h'(fp)`` (partial-key cuckoo hashing —
the XOR makes ``alt()`` an involution, so either resident bucket can
derive the other without the key).  Published false-positive bound for a
query against a full table: ``1 − (1 − 2^{−f})^{2b} ≈ 2b/2^f``
(paper §3.2, eq. 2); zero false negatives as long as nothing is dropped
— this implementation NEVER drops: inserts that exhaust ``max_kicks``
land in a bounded stash (loud raise past ``stash_cap``, the resize
signal), so the zero-FN contract survives arbitrary merge orderings.

Complements the repo's other membership sketches: blocked Bloom (cheaper
build, no delete), BQF/RSQF (counting, resizable).  The cuckoo filter is
the revocation-friendly one: ``delete_batch`` removes one stored copy
per requested key (defined, per the paper, only for keys actually
inserted and not yet deleted).

Merge = re-insert every stored fingerprint of ``other`` using its
resident bucket and that bucket's alternate as the candidate pair —
query answers depend only on the stored (bucket-pair, fp) MULTISET, so
merge is associative/commutative in query semantics (property-tested via
sorted ``enumerate()`` equality in tests/test_new_sketches.py).

Insert hot path is vectorized: two bulk placement passes (group keys by
candidate bucket, rank-vs-free-slot scatter) land the overwhelming
majority; only keys whose BOTH buckets are full walk the sequential
cuckoo-kick loop (inherently order-dependent; bounded by ``max_kicks``
and rare below the 0.84 sizing load).  Duplicate keys are stored as
duplicate fingerprint copies (≤ 2b per pair before the stash absorbs
the rest) — feed DISTINCT keys (per partition) for set semantics, as the
semi-join pipelines do.
"""

from __future__ import annotations

import numpy as np

from bqf_ray.functions.hashing import fmix64
from bqf_ray.sketches.base import MergeableSketch, register

_PHI = np.uint64(0x9E3779B97F4A7C15)


@register
class CuckooFilter(MergeableSketch):
    config_fields = ("n_buckets", "slots", "fbits", "seed", "max_kicks",
                     "stash_cap")

    def __init__(self, n_buckets: int = 1 << 16, slots: int = 4,
                 fbits: int = 12, seed: int = 0, max_kicks: int = 500,
                 stash_cap: int = 128):
        m = int(n_buckets)
        if m & (m - 1) or m <= 0:
            raise ValueError(f"n_buckets must be a power of 2, got {m}")
        if not 1 <= int(fbits) <= 16:
            raise ValueError("fbits must be in [1, 16] (uint16 slots)")
        self.n_buckets = m
        self.slots = int(slots)
        self.fbits = int(fbits)
        self.seed = int(seed)
        self.max_kicks = int(max_kicks)
        self.stash_cap = int(stash_cap)
        self.table = np.zeros(m * self.slots, dtype=np.uint16)
        self.occ = np.zeros(m, dtype=np.int8)
        self.stash_bucket = np.empty(0, dtype=np.int64)  # canonical min
        self.stash_fp = np.empty(0, dtype=np.uint16)
        self.n_added = np.uint64(0)

    @classmethod
    def from_capacity(cls, n: int, fp: float = 0.01, seed: int = 0
                      ) -> "CuckooFilter":
        b = 4
        f = min(16, max(2, int(np.ceil(np.log2(2 * b / fp)))))
        m = 1
        while m * b * 0.84 < max(n, 1):
            m <<= 1
        return cls(n_buckets=m, slots=b, fbits=f, seed=seed)

    # --- hashing -----------------------------------------------------------

    def _fp_i1(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        keys = np.asarray(keys, dtype=np.uint64)
        fmask = np.uint64((1 << self.fbits) - 1)
        fp = (fmix64(keys ^ np.uint64(self.seed)) & fmask)
        fp = np.where(fp == 0, np.uint64(1), fp).astype(np.uint16)
        i1 = (fmix64(keys ^ np.uint64(self.seed) ^ _PHI)
              & np.uint64(self.n_buckets - 1)).astype(np.int64)
        return fp, i1

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        scalar = np.ndim(i) == 0
        h = fmix64(np.atleast_1d(np.asarray(fp, dtype=np.uint64))
                   ^ np.uint64(self.seed) ^ np.uint64(0xC2B2AE3D27D4EB4F))
        out = (np.atleast_1d(np.asarray(i, dtype=np.int64))
               ^ (h & np.uint64(self.n_buckets - 1)).astype(np.int64))
        return out[0] if scalar else out

    # --- insert ------------------------------------------------------------

    def _bulk_pass(self, idx: np.ndarray, buckets: np.ndarray,
                   fps: np.ndarray) -> np.ndarray:
        """Place as many of idx as fit in their ``buckets`` free slots;
        returns the boolean placed-mask (aligned to idx)."""
        b = self.slots
        order = np.argsort(buckets, kind="stable")
        bo = buckets[order]
        new = np.r_[True, bo[1:] != bo[:-1]]
        starts = np.flatnonzero(new)
        seg_n = np.diff(np.r_[starts, len(bo)])
        rank = (np.arange(len(bo), dtype=np.int64)
                - np.repeat(starts, seg_n))
        free = b - self.occ[bo].astype(np.int64)
        fits = rank < free
        tgt = bo[fits]
        # slot index = current occupancy + within-bucket rank
        slot = self.occ[tgt].astype(np.int64) + rank[fits]
        # occupied slots are always the low ones (eviction refills the
        # freed slot immediately), so occ+rank never collides
        self.table[tgt * b + slot] = fps[order][fits]
        np.add.at(self.occ, tgt, np.int8(1))
        placed = np.zeros(len(idx), dtype=bool)
        placed[order[fits]] = True
        return placed

    def _place(self, c1: np.ndarray, c2: np.ndarray, fps: np.ndarray
               ) -> None:
        """Insert fingerprints with candidate bucket pairs (c1, c2)."""
        n = len(fps)
        if n == 0:
            return
        idx = np.arange(n)
        placed = self._bulk_pass(idx, c1, fps)
        rem = ~placed
        if rem.any():
            placed2 = self._bulk_pass(idx[rem], c2[rem], fps[rem])
            rem2 = idx[rem][~placed2]
        else:
            rem2 = idx[:0]
        b = self.slots
        for j in rem2:                     # both buckets full: kick walk
            fp = fps[j]
            i = int(c1[j])
            kicked = False
            for kick in range(self.max_kicks):
                if self.occ[i] < b:        # freed along the walk
                    self.table[i * b + int(self.occ[i])] = fp
                    self.occ[i] += 1
                    kicked = True
                    break
                slot = (kick + int(fp)) % b
                victim = self.table[i * b + slot]
                self.table[i * b + slot] = fp
                fp = victim
                i = int(self._alt(np.int64(i), np.uint64(fp)))
                if self.occ[i] < b:
                    self.table[i * b + int(self.occ[i])] = fp
                    self.occ[i] += 1
                    kicked = True
                    break
            if not kicked:
                alt = int(self._alt(np.int64(i), np.uint64(fp)))
                canon = min(i, alt)
                self.stash_bucket = np.r_[self.stash_bucket, canon]
                self.stash_fp = np.r_[self.stash_fp,
                                      np.uint16(fp)].astype(np.uint16)
                if len(self.stash_fp) > self.stash_cap:
                    raise RuntimeError(
                        f"CuckooFilter overloaded: stash "
                        f"{len(self.stash_fp)} > cap {self.stash_cap} "
                        f"(size for more capacity: n_buckets="
                        f"{self.n_buckets}, load="
                        f"{float(self.occ.sum()) / self.table.size:.3f})")

    def update_batch(self, keys: np.ndarray, counts=None) -> None:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return
        fp, i1 = self._fp_i1(keys)
        self._place(i1, self._alt(i1, fp), fp)
        self.n_added += np.uint64(len(keys))

    # --- query / delete ------------------------------------------------

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1 = self._fp_i1(keys)
        i2 = self._alt(i1, fp)
        t = self.table.reshape(self.n_buckets, self.slots)
        hit = (t[i1] == fp[:, None]).any(axis=1)
        hit |= (t[i2] == fp[:, None]).any(axis=1)
        if len(self.stash_fp):
            canon = np.minimum(i1, i2).astype(np.uint64)
            probe = (canon << np.uint64(16)) | fp.astype(np.uint64)
            have = ((self.stash_bucket.astype(np.uint64) << np.uint64(16))
                    | self.stash_fp.astype(np.uint64))
            hit |= np.isin(probe, have)
        return hit

    def delete_batch(self, keys: np.ndarray) -> np.ndarray:
        """Remove ONE stored copy per key; returns per-key success.
        Defined (paper §2.2) only for keys previously inserted."""
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1 = self._fp_i1(keys)
        i2 = self._alt(i1, fp)
        ok = np.zeros(len(keys), dtype=bool)
        b = self.slots
        # group by (i1, fp): distinct targets walk once, copies count
        enc = (i1.astype(np.uint64) << np.uint64(16)) | fp.astype(np.uint64)
        uniq, inv, cnt = np.unique(enc, return_inverse=True,
                                   return_counts=True)
        first = np.zeros(len(uniq), dtype=np.int64)
        first[inv[::-1]] = np.arange(len(keys))[::-1]
        for u in range(len(uniq)):
            want = int(cnt[u])
            j = first[u]
            f_, a_, c_ = int(fp[j]), int(i1[j]), int(i2[j])
            removed = 0
            for bucket in (a_, c_):
                base = bucket * b
                s = 0
                while s < b and removed < want:
                    if self.table[base + s] == f_:
                        last = int(self.occ[bucket]) - 1
                        # keep occupancy low-packed: swap-with-last,
                        # then RE-EXAMINE slot s (the swapped-in value
                        # may be another copy of the same fingerprint)
                        self.table[base + s] = self.table[base + last]
                        self.table[base + last] = 0
                        self.occ[bucket] -= 1
                        removed += 1
                    else:
                        s += 1
            if removed < want and len(self.stash_fp):
                canon = min(a_, c_)
                m = np.flatnonzero((self.stash_bucket == canon)
                                   & (self.stash_fp == f_))
                take = m[:want - removed]
                if len(take):
                    keep = np.ones(len(self.stash_fp), dtype=bool)
                    keep[take] = False
                    self.stash_bucket = self.stash_bucket[keep]
                    self.stash_fp = self.stash_fp[keep]
                    removed += len(take)
            got = np.flatnonzero(inv == u)[:removed]
            ok[got] = True
        return ok

    def enumerate_slots(self) -> tuple[np.ndarray, np.ndarray]:
        """(bucket, fp) of every stored fingerprint, stash included
        (stash buckets are the canonical min of their pair)."""
        filled = np.flatnonzero(self.table)
        return (np.r_[filled // self.slots, self.stash_bucket],
                np.r_[self.table[filled], self.stash_fp].astype(np.uint16))

    # --- merge / serde -------------------------------------------------

    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        self.check_mergeable(other)
        buckets, fps = other.enumerate_slots()
        self._place(buckets.astype(np.int64),
                    self._alt(buckets.astype(np.int64), fps), fps)
        self.n_added += other.n_added
        return self

    def _state_arrays(self) -> dict:
        return {"table": self.table,
                "stash_bucket": self.stash_bucket,
                "stash_fp": self.stash_fp,
                "n_added": np.asarray([self.n_added], dtype=np.uint64)}

    def _config(self) -> dict:
        return {f: getattr(self, f) for f in self.config_fields}

    @classmethod
    def _from_state(cls, config: dict, arrays: dict) -> "CuckooFilter":
        self = cls(**config)
        self.table = arrays["table"].astype(np.uint16)
        self.stash_bucket = arrays["stash_bucket"].astype(np.int64)
        self.stash_fp = arrays["stash_fp"].astype(np.uint16)
        self.n_added = np.uint64(arrays["n_added"][0])
        self.occ = (self.table.reshape(self.n_buckets, self.slots) != 0
                    ).sum(axis=1).astype(np.int8)
        return self
