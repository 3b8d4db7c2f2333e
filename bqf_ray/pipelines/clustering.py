"""Distributed k-means (Lloyd) over an embedding column — full-corpus,
bit-deterministic, no row materialization.

Every iteration is ONE ``map_batches`` pass emitting per-(batch, cluster)
partials: member count, an INTEGER-QUANTIZED coordinate sum
(``round(x · 2^s)`` per element) and an integer inertia.  Integer sums
are order-independent, so the reduced centroids — and therefore every
assignment, every iteration, and the final result — are bit-identical
regardless of batch boundaries, partitioning, or execution order.  This
is the same integer-units determinism trick the engine's float
aggregates use (``__ray_entry__`` module docstring), applied to an
iterative algorithm.  The driver-side reduce touches only ``k × dim``
integers per iteration (Python ints, so inertia never overflows).

Assignment rule shared by fit and assign: ``argmin_c ||x − c||²`` in
float64 with ties to the lowest cluster index; empty clusters keep
their previous centroid.  Init takes the first ``k`` distinct-looking
rows of a deterministic ``limit(sample)`` prefix via a seeded choice
(the :func:`bqf_ray.pipelines.knn.train_ivf_centroids` convention).

At 100 TB each iteration streams the input again (no cache); pass an
already-materialized Dataset (or a column-pruned parquet read — only
the embedding column rides) to trade object-store memory for re-reads.

The reference has no clustering (SURVEY.md §2.4); engine-defined
addition in the embedding family; k-means itself per Lloyd (1982).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from bqf_ray.pipelines.knn import _to_matrix


def _quantize(x: np.ndarray, scale: int) -> np.ndarray:
    """Quantize and enforce the exactness envelope: every term of the
    matmul expansion must stay an exact float64 integer, which needs
    ``dim * (2 * max|q|)^2 < 2^53`` — a DIM-DEPENDENT bound (at dim=32
    this is the old 2^23 cap; at dim=128 it is 2^22)."""
    q = np.rint(x * scale).astype(np.int64)
    if q.size:
        dim = q.shape[-1] if q.ndim > 1 else 1
        m = int(np.abs(q).max())
        if dim * (2 * m) ** 2 >= (1 << 53):
            raise ValueError(
                f"quantized coordinates (max |q|={m}, dim={dim}) exceed "
                "the float64 exactness envelope dim*(2*max|q|)^2 < 2^53 "
                "— lower scale_bits or normalize the embeddings")
    return q


def _assign_to(xq: np.ndarray, cents_q: np.ndarray) -> np.ndarray:
    """argmin_c ||xq − cq||² over int64-quantized points/centroids,
    computed exactly (ties → lowest index).  Uses the matmul expansion
    ``|x|² − 2x·c + |c|²`` in float64: the ``_quantize`` envelope
    (dim·(2·max|q|)² < 2^53) keeps every dot product, norm, and the
    3-term sum an exactly-representable float64 integer."""
    xf = xq.astype(np.float64)
    cf = cents_q.astype(np.float64)
    d2 = ((xf * xf).sum(axis=1)[:, None]
          - 2.0 * (xf @ cf.T)
          + (cf * cf).sum(axis=1)[None, :])
    return np.argmin(d2, axis=1).astype(np.int64)


def kmeans_fit(ds, k: int = 8, iters: int = 5, vec_col: str = "embedding",
               scale_bits: int = 20, sample: int = 4096, seed: int = 13):
    """Fit k-means; returns ``(centroids_q int64 (k, d), info)`` where
    ``info`` carries per-iteration ``inertia`` (exact Python ints in
    quantized units) and final ``sizes``.  Centroids stay in quantized
    integer space end-to-end — divide by ``2^scale_bits`` for floats."""
    scale = 1 << int(scale_bits)

    tbl = ds.limit(sample).take_batch(sample, batch_format="pyarrow")
    x0 = _to_matrix(tbl.column(vec_col))
    if len(x0) == 0:
        raise ValueError("kmeans_fit: empty input")
    rng = np.random.RandomState(seed)
    pick = rng.choice(len(x0), min(k, len(x0)), replace=False)
    cents_q = _quantize(x0[pick], scale)
    k_eff = len(cents_q)
    dim = cents_q.shape[1]

    inertia_hist: list[int] = []
    sizes = np.zeros(k_eff, dtype=np.int64)
    for _ in range(int(iters)):
        cq = cents_q            # rebind for closure capture per iteration

        def partials(batch: pa.Table) -> pa.Table:
            xq = _quantize(_to_matrix(batch.column(vec_col)), scale)
            if len(xq) == 0:
                return pa.table({
                    "cluster": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sum": pa.array([], pa.list_(pa.int64(), dim)),
                    "inertia": pa.array([], pa.int64())})
            a = _assign_to(xq, cq)
            diff = xq - cq[a]
            per_row_in = (diff.astype(np.float64) ** 2).sum(axis=1)
            u = np.unique(a)
            sums = np.zeros((len(u), dim), dtype=np.int64)
            iner = np.zeros(len(u), dtype=np.int64)
            n = np.zeros(len(u), dtype=np.int64)
            inv = np.searchsorted(u, a)
            np.add.at(sums, inv, xq)
            np.add.at(iner, inv, per_row_in.astype(np.int64))
            np.add.at(n, inv, 1)
            return pa.table({
                "cluster": pa.array(u),
                "n": pa.array(n),
                "sum": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.reshape(-1)), dim),
                "inertia": pa.array(iner)})

        part = (ds.select_columns([vec_col])
                .map_batches(partials, batch_format="pyarrow")
                .take_all())
        tot_n = np.zeros(k_eff, dtype=np.int64)
        tot_sum = np.zeros((k_eff, dim), dtype=object)   # python ints
        tot_in = 0
        for row in part:
            c = int(row["cluster"])
            tot_n[c] += int(row["n"])
            tot_sum[c] += np.asarray(row["sum"], dtype=np.int64)
            tot_in += int(row["inertia"])
        inertia_hist.append(tot_in)
        sizes = tot_n
        new_q = cents_q.copy()
        for c in range(k_eff):
            if tot_n[c] > 0:
                # exact integer mean in quantized units (round half away
                # from zero is irrelevant: floor-div of python ints,
                # identical everywhere)
                new_q[c] = np.array(
                    [int(s) // int(tot_n[c]) for s in tot_sum[c]],
                    dtype=np.int64)
        cents_q = new_q

    return cents_q, {"inertia": inertia_hist, "sizes": sizes,
                     "scale_bits": int(scale_bits)}


def kmeans_assign(ds, cents_q: np.ndarray, vec_col: str = "embedding",
                  scale_bits: int = 20, out_col: str = "cluster"):
    """Append the exact assignment column for fitted quantized
    centroids — the same argmin rule as fit, so fit→assign is
    self-consistent bit-for-bit."""
    scale = 1 << int(scale_bits)
    cq = np.asarray(cents_q, dtype=np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        xq = _quantize(_to_matrix(batch.column(vec_col)), scale)
        a = (_assign_to(xq, cq) if len(xq)
             else np.empty(0, dtype=np.int64))
        return batch.append_column(out_col, pa.array(a))

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_cluster_stats(ds, k: int = 8, iters: int = 5,
                         vec_col: str = "embedding", scale_bits: int = 20,
                         seed: int = 13):
    """End-to-end fit + final per-cluster stats:
    ``(cluster, n, inertia)`` with inertia in exact quantized integer
    units — deterministic across any partitioning."""
    from ray.data.aggregate import Sum

    cents_q, _ = kmeans_fit(ds, k=k, iters=iters, vec_col=vec_col,
                            scale_bits=scale_bits, seed=seed)
    scale = 1 << int(scale_bits)

    def partials(batch: pa.Table) -> pa.Table:
        xq = _quantize(_to_matrix(batch.column(vec_col)), scale)
        if len(xq) == 0:
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "pn": pa.array([], pa.int64()),
                             "pin": pa.array([], pa.int64())})
        a = _assign_to(xq, cents_q)
        diff = xq - cents_q[a]
        per_row = (diff.astype(np.float64) ** 2).sum(axis=1).astype(np.int64)
        u = np.unique(a)
        inv = np.searchsorted(u, a)
        n = np.zeros(len(u), dtype=np.int64)
        iner = np.zeros(len(u), dtype=np.int64)
        np.add.at(n, inv, 1)
        np.add.at(iner, inv, per_row)
        return pa.table({"cluster": pa.array(u), "pn": pa.array(n),
                         "pin": pa.array(iner)})

    return (ds.select_columns([vec_col])
            .map_batches(partials, batch_format="pyarrow")
            .groupby("cluster")
            .aggregate(Sum("pn", alias_name="n"),
                       Sum("pin", alias_name="inertia")))
