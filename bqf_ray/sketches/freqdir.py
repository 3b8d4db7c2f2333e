"""Frequent Directions — mergeable matrix (covariance) sketch
(Liberty, "Simple and deterministic matrix sketching", KDD 2013;
mergeability per Ghashami, Liberty, Phillips & Woodruff, SICOMP 2016).

Maintains an ℓ×d row sketch B of a tall n×d matrix A such that

    0 ≼ AᵀA − BᵀB   and   ‖AᵀA − BᵀB‖₂ ≤ Σ δ_shrink ≤ 2‖A‖²_F / ℓ

where each shrink step subtracts δ = σ²_ℓ from all squared singular
values (batched FD: one thin SVD per absorbed batch, not per row).
The sketch is deterministic for a fixed partition/merge tree, and the
bound holds under ARBITRARY merge trees (mergeable-summaries
guarantee) — the property tests randomize the tree.

Rows are expected in the library's quantized-integer embedding domain
(``q = floor(x·scale + 0.5)`` as float64, the
``embeddings.embedding_covariance`` convention): then ‖A‖²_F is an
EXACT int64 (Σ q²) that a SQL oracle recomputes order-independently,
making the published bound a driver-checkable flag against the exact
int64 Gram from ``embedding_covariance``.

``update_batch(rows)`` takes an (n, d) float64 matrix — the matrix
member of the MergeableSketch family (vector-valued updates; the keyed
``prepare=`` adapters do not apply)."""

from __future__ import annotations

import numpy as np

from bqf_ray.sketches.base import MergeableSketch, register


@register
class FrequentDirections(MergeableSketch):
    config_fields = ("ell", "d")

    def __init__(self, ell: int = 32, d: int = 64):
        if ell < 2:
            raise ValueError("ell >= 2")
        self.ell = int(ell)
        self.d = int(d)
        self.B = np.zeros((self.ell, self.d), dtype=np.float64)
        self.n = 0                       # rows absorbed
        self.frob_sq = 0                 # EXACT Σ q² (int64 domain)
        self.delta_sum = 0.0             # Σ shrink deltas (error certificate)

    # -- core ---------------------------------------------------------

    def _absorb(self, rows: np.ndarray) -> None:
        """One stacked thin SVD + shrink (batched FD step)."""
        stack = np.vstack([self.B[np.any(self.B != 0.0, axis=1)], rows])
        # thin SVD: stack is (m, d) with d small — O(m d²)
        _, s, vt = np.linalg.svd(stack, full_matrices=False)
        s2 = s * s
        if len(s2) <= self.ell - 1:
            delta = 0.0
            keep = s2
        else:
            delta = float(s2[self.ell - 1])
            keep = np.maximum(s2 - delta, 0.0)
        self.delta_sum += delta
        B = np.zeros((self.ell, self.d), dtype=np.float64)
        nz = min(self.ell, len(keep))
        B[:nz] = (np.sqrt(keep[:nz])[:, None] * vt[:nz])
        self.B = B

    def update_batch(self, rows: np.ndarray, counts=None) -> None:
        """rows: (n, d) float64 in the quantized-integer domain."""
        rows = np.asarray(rows, dtype=np.float64)
        if rows.ndim != 2 or rows.shape[1] != self.d:
            raise ValueError(f"expected (n, {self.d}) rows, got {rows.shape}")
        if len(rows) == 0:
            return
        q = np.rint(rows).astype(np.int64)
        if not np.array_equal(q.astype(np.float64), rows):
            raise ValueError("rows must be quantized integers (the "
                             "embedding_covariance q = floor(x·scale + .5) "
                             "domain) so ‖A‖²_F folds exactly")
        # same overflow envelope as embedding_covariance:
        # n · (scale·|x|_max)² < 2^63
        self.frob_sq += int((q * q).sum())
        self.n += len(rows)
        self._absorb(rows)

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        self.check_mergeable(other)
        if other.n == 0:
            return self
        nz = other.B[np.any(other.B != 0.0, axis=1)]
        if self.n == 0:
            self.B = other.B.copy()
        else:
            self._absorb(nz)
        self.n += other.n
        self.frob_sq += other.frob_sq
        self.delta_sum += other.delta_sum
        return self

    # -- estimates ----------------------------------------------------

    def cov_estimate(self) -> np.ndarray:
        """BᵀB ≼ AᵀA, with ‖AᵀA − BᵀB‖₂ ≤ published bound."""
        return self.B.T @ self.B

    def published_bound(self) -> float:
        return 2.0 * float(self.frob_sq) / self.ell

    def spectral_error_vs(self, gram_exact: np.ndarray) -> float:
        """‖AᵀA − BᵀB‖₂ via symmetric eigendecomposition (d×d)."""
        diff = np.asarray(gram_exact, dtype=np.float64) - self.cov_estimate()
        return float(np.abs(np.linalg.eigvalsh(diff)).max())

    # -- serde --------------------------------------------------------

    def _state_arrays(self) -> dict[str, np.ndarray]:
        return {"B": self.B,
                "meta_i": np.array([self.n, self.frob_sq], dtype=np.int64),
                "meta_f": np.array([self.delta_sum], dtype=np.float64)}

    def _config(self) -> dict:
        return {"ell": self.ell, "d": self.d}

    @classmethod
    def _from_state(cls, config: dict, arrays: dict) -> "FrequentDirections":
        self = cls(ell=int(config["ell"]), d=int(config["d"]))
        self.B = np.asarray(arrays["B"], dtype=np.float64).copy()
        self.n = int(arrays["meta_i"][0])
        self.frob_sq = int(arrays["meta_i"][1])
        self.delta_sum = float(arrays["meta_f"][0])
        return self
