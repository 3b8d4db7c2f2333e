"""Theta-sketch set operations over :class:`~bqf_ray.sketches.sample.BottomK`.

A bottom-k (KMV) sketch IS a theta sketch (Dasgupta, Lang, Malkin,
Rhodes & Thaler, "Theta sketch framework", 2016): with
``theta = h_(k)`` (the k-th smallest hash; 2^64 while unsaturated),
the retained hashes below theta form a uniform sample of the distinct
keys at inclusion rate ``theta / 2^64``.  Set EXPRESSIONS then reduce
to set operations on the retained hash samples cut at the combined
``theta = min(theta_a, theta_b)``:

    |A ∪ B| ≈ |S_A ∪ S_B|_{<θ} / (θ/2^64)
    |A ∩ B| ≈ |S_A ∩ S_B|_{<θ} / (θ/2^64)
    |A \\ B| ≈ |S_A \\ S_B|_{<θ} / (θ/2^64)

each unbiased with relative standard error ≤ 1/sqrt(k-1) **relative to
the UNION size** for intersections/differences (the retained-sample
estimator errs in union units — small intersections of large sets carry
proportionally larger relative error; callers bound-check accordingly).
Both sketches must share the same hash seed so identical keys collide.

These are pure functions, not a new sketch class: the mergeable state
is BottomK itself (already a registered UDAF-ready sketch); set algebra
happens at finalize time on the tiny retained arrays.
"""

from __future__ import annotations

import numpy as np

from bqf_ray.sketches.sample import BottomK

_FULL = float(2.0 ** 64)


def _theta(sk: BottomK) -> float:
    """Exclusive inclusion threshold: the k-th smallest hash when
    saturated, else 2^64 (every seen hash retained)."""
    if len(sk._hashes) < sk.k:
        return _FULL
    return float(sk._hashes[-1])


def _check(a: BottomK, b: BottomK) -> float:
    if a.seed != b.seed:
        raise ValueError(f"seed mismatch: {a.seed} != {b.seed}")
    return min(_theta(a), _theta(b))


def _cut(sk: BottomK, theta: float) -> np.ndarray:
    h = sk._hashes
    return h[h.astype(np.float64) < theta]


def theta_set_estimates(a: BottomK, b: BottomK) -> dict[str, float]:
    """All four set-cardinality estimates in one pass:
    ``{"union", "intersection", "a_only", "b_only"}``."""
    theta = _check(a, b)
    ha, hb = _cut(a, theta), _cut(b, theta)
    inter = np.intersect1d(ha, hb, assume_unique=True)
    scale = _FULL / theta
    n_i = len(inter)
    n_u = len(ha) + len(hb) - n_i
    return {
        "union": n_u * scale,
        "intersection": n_i * scale,
        "a_only": (len(ha) - n_i) * scale,
        "b_only": (len(hb) - n_i) * scale,
    }


def theta_error_bound(a: BottomK, b: BottomK) -> float:
    """Relative standard error of each estimate w.r.t. the UNION size:
    1/sqrt(k'-1) where k' = retained distinct hashes at the combined
    theta (= the union sample size, ≤ min(a.k, b.k) + headroom)."""
    theta = _check(a, b)
    ha, hb = _cut(a, theta), _cut(b, theta)
    kk = len(np.union1d(ha, hb))
    return 1.0 / np.sqrt(max(kk - 1, 1))
