"""Embedding-column operators: per-vector stats, L2 normalization, int8
quantization — the embedding-table maintenance steps of a training-data
pipeline (shrink 4-byte floats to 1-byte codes for ANN at scale).

All stages are zero-copy Arrow FixedSizeList/List → numpy matrix reshapes
(`knn._to_matrix`) and vectorized kernels.  Float determinism for the SQL
oracle: sums of squares are SEQUENTIAL left-folds in float64
(`np.cumsum(..., axis=1)[:, -1]`), which matches DuckDB's `list_sum`
fold bit-for-bit (verified exact on the fixture embeddings); rounding is
`floor(x + 0.5)` on both sides (numpy `np.round` half-to-even would NOT
match DuckDB's `round`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from bqf_ray.pipelines.knn import _to_matrix


def embedding_stats(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                    bits: int = 8):
    """(vec_id, dim, l2_norm, max_abs, q_sum, q_min, q_max): per-vector
    geometry plus a checksum view of the ``bits``-bit symmetric
    quantization (codes in [-(2^(b-1)-1), 2^(b-1)-1] via
    ``floor(x·Q/max_abs + 0.5)``) — scalars, so the whole transform is
    SQL-oracle-checkable without list-column compares."""
    Q = float((1 << (bits - 1)) - 1)

    def stats(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch.column(vec_col)).astype(np.float64)
        sq = m * m
        ss = np.cumsum(sq, axis=1)[:, -1] if m.shape[1] else \
            np.zeros(len(m))
        ma = np.abs(m).max(axis=1) if m.shape[1] else np.zeros(len(m))
        scale = Q / np.maximum(ma, 1e-30)
        q = np.floor(m * scale[:, None] + 0.5)
        return pa.table({
            id_col: batch.column(id_col),
            "dim": pa.array(np.full(len(m), m.shape[1], dtype=np.int64)),
            "l2_norm": pa.array(np.sqrt(ss), pa.float64()),
            "max_abs": pa.array(ma, pa.float64()),
            "q_sum": pa.array(np.cumsum(q, axis=1)[:, -1].astype(np.int64)),
            "q_min": pa.array(q.min(axis=1).astype(np.int64)),
            "q_max": pa.array(q.max(axis=1).astype(np.int64)),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


def normalize_embeddings(ds, vec_col: str = "embedding"):
    """Replace the embedding column with its L2-normalized float32 form
    (zero vectors pass through unchanged)."""

    def norm(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch.column(vec_col)).astype(np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        out = (m / np.maximum(n, 1e-30)).astype(np.float32)
        d = out.shape[1]
        offs = np.arange(len(out) + 1, dtype=np.int32) * np.int32(d)
        col = pa.ListArray.from_arrays(pa.array(offs),
                                       pa.array(out.reshape(-1)))
        i = batch.schema.get_field_index(vec_col)
        return batch.set_column(i, vec_col, col)

    return ds.map_batches(norm, batch_format="pyarrow")


def quantize_embeddings(ds, vec_col: str = "embedding",
                        id_col: str = "vec_id", bits: int = 8):
    """(id, codes: list<int8>, scale: float64) — symmetric per-vector
    quantization; dequantize as ``codes * scale``.  Cosine distortion is
    bounded by ~1/Q per axis (pytest-checked against the exact values)."""
    assert 2 <= bits <= 8
    Q = float((1 << (bits - 1)) - 1)

    def quant(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch.column(vec_col)).astype(np.float64)
        ma = np.abs(m).max(axis=1) if m.shape[1] else np.zeros(len(m))
        scale_in = Q / np.maximum(ma, 1e-30)
        q = np.floor(m * scale_in[:, None] + 0.5).astype(np.int8)
        d = q.shape[1]
        offs = np.arange(len(q) + 1, dtype=np.int32) * np.int32(d)
        codes = pa.ListArray.from_arrays(pa.array(offs),
                                         pa.array(q.reshape(-1)))
        return pa.table({
            id_col: batch.column(id_col),
            "codes": codes,
            "scale": pa.array(np.maximum(ma, 1e-30) / Q, pa.float64()),
        })

    return ds.map_batches(quant, batch_format="pyarrow")
