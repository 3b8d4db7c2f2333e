"""Native Ray Data UDAF adapter for MergeableSketch.

``sketch_agg(factory, on)`` returns a ``ray.data.aggregate.AggregateFn``
whose accumulator IS the sketch, so any sketch in the library (BQF, HLL,
Count-Min, t-digest, KLL, blocked Bloom) plugs straight into the native
aggregation surface:

    ds.groupby("lang").aggregate(sketch_agg(lambda: HyperLogLog(p=12),
                                            on="token",
                                            finalize="estimate",
                                            name="distinct_est"))
    ds.aggregate(sketch_agg(...))                      # global (one group)

This rides Ray Data's sort-based aggregate: mappers pre-aggregate each
sorted block per key (``accumulate_block`` over the group's slice — one
vectorized ``update_batch``), reducers ``merge`` accumulators across
blocks.  That is exactly the partial-build → tree-merge plan of
``stages/sketch_stage.py``, obtained for free from the engine's own
shuffle — and because every sketch's ``merge`` is associative and
commutative (property-tested in tests/test_merge_properties.py), any
block partitioning yields the same answer (bit-identical for HLL/Bloom/
Count-Min whose states are order-invariant; within the published bound
for the compaction-based quantile sketches).

Key preparation (``prepare``):

- ``"hash"`` (default) — the sketch consumes 64-bit HASHES of the
  column (HLL, Bloom, Count-Min, BQF): strings/binary via xxhash64,
  ints/floats via the MurmurHash3 fmix64 finalizer of their 64-bit
  pattern.  Nulls are dropped.
- ``"value"`` — the sketch consumes the raw numeric VALUES (t-digest,
  KLL quantile sketches).  Nulls are dropped.
- any callable ``pa.Array -> np.ndarray`` for custom extraction.

The reference's UDAF surface is a C++ class hierarchy over one process
(/root/reference/src/headers/abstract_bqf.hpp:154-170); here the same
mergeable-state contract becomes a first-class distributed aggregate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from bqf_ray.functions.hashing import fmix64, xxhash64_array


def _to_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col


def prepare_hash(col) -> np.ndarray:
    """Column → uint64 hash keys (nulls dropped)."""
    arr = _to_array(col).drop_null()
    t = arr.type
    if (pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
        return xxhash64_array(arr)
    vals = arr.to_numpy(zero_copy_only=False)
    if np.issubdtype(vals.dtype, np.integer):
        return fmix64(vals.astype(np.int64).view(np.uint64))
    if np.issubdtype(vals.dtype, np.floating):
        return fmix64(vals.astype(np.float64).view(np.uint64))
    raise TypeError(f"cannot hash column of type {t}")


def prepare_value(col) -> np.ndarray:
    """Column → float64 values (nulls AND NaNs dropped — a NaN would
    poison every quantile-sketch comparison) for quantile sketches."""
    arr = _to_array(col).drop_null()
    vals = arr.to_numpy(zero_copy_only=False).astype(np.float64)
    return vals[~np.isnan(vals)]


def prepare_int(col) -> np.ndarray:
    """Column → raw uint64 of an integer column (nulls dropped) — for
    EXACT dense-domain sketches (CompressedBitmap) where hashing would
    destroy chunk locality and exactness is the point."""
    arr = _to_array(col).drop_null()
    vals = arr.to_numpy(zero_copy_only=False)
    if not np.issubdtype(vals.dtype, np.integer):
        raise TypeError(f"prepare='int' needs an integer column, got {arr.type}")
    v = vals.astype(np.int64)
    if (v < 0).any():
        raise ValueError("prepare='int' requires non-negative keys")
    return v.view(np.uint64)


_PREPARES = {"hash": prepare_hash, "value": prepare_value,
             "int": prepare_int}


def sketch_agg(factory, on: str, *, prepare="hash", weight_col: str | None = None,
               finalize="bytes", name: str | None = None):
    """Build an ``AggregateFn`` whose accumulator is ``factory()``.

    ``finalize``: ``"bytes"`` (the serialized sketch blob — feed it to
    ``MergeableSketch.from_bytes`` downstream), ``"estimate"``
    (``sketch.estimate()`` as float), or a callable ``sketch -> scalar``.
    ``weight_col``: optional int column passed as ``counts`` to
    ``update_batch`` (weighted streams; rows with a null key are
    dropped together with their weight).
    """
    from ray.data.aggregate import AggregateFn

    from bqf_ray.sketches.base import MergeableSketch

    prep = _PREPARES.get(prepare, prepare)
    if not callable(prep):
        raise ValueError(f"unknown prepare {prepare!r}")
    if finalize == "bytes":
        fin = lambda sk: sk.to_bytes()              # noqa: E731
    elif finalize == "estimate":
        fin = lambda sk: float(sk.estimate())       # noqa: E731
    elif callable(finalize):
        fin = finalize
    else:
        raise ValueError(f"unknown finalize {finalize!r}")

    # Accumulators travel as to_bytes() blobs, not live objects: the
    # engine stores partial-agg state in block columns between the map
    # and reduce sides, and a bytes accumulator is an Arrow-native
    # binary value (a live sketch object would force a pickled-object
    # column fallback).  Serde is numpy-buffer copies — cheap next to
    # the per-block update work.

    if weight_col is not None and prep not in (prepare_hash, prepare_value):
        raise ValueError("weight_col requires prepare='hash' or 'value' "
                         "(weights must drop exactly the rows the key "
                         "preparation drops)")

    def _keep_mask(col, wcol) -> pa.Array:
        """Rows the preparation keeps — weights must filter identically.
        A null WEIGHT also drops the row (SQL sum-of-weights semantics):
        letting it through would cast NaN→INT64_MIN in the numpy
        conversion and silently corrupt the sketch state."""
        import pyarrow.compute as pc
        keep = pc.and_(col.is_valid(), wcol.is_valid())
        if prep is prepare_value and pa.types.is_floating(col.type):
            keep = pc.and_(keep, pc.invert(pc.is_nan(
                col.fill_null(0.0))))    # NaN rows: prepare_value drops them
        return keep

    def accumulate_block(acc: bytes, block):
        if not isinstance(block, pa.Table):          # pandas fallback
            block = pa.Table.from_pandas(block)
        sk = MergeableSketch.from_bytes(acc)
        col = _to_array(block.column(on))
        if weight_col is None:
            sk.update_batch(prep(col))
        else:
            wcol = _to_array(block.column(weight_col))
            keep = _keep_mask(col, wcol)
            w = np.asarray(wcol.filter(keep), dtype=np.int64)
            sk.update_batch(prep(col.filter(keep)), w)
        return sk.to_bytes()

    return AggregateFn(
        init=lambda _k: factory().to_bytes(),
        merge=lambda a, b: MergeableSketch.from_bytes(a)
                           .merge(MergeableSketch.from_bytes(b)).to_bytes(),
        accumulate_block=accumulate_block,
        finalize=lambda acc: fin(MergeableSketch.from_bytes(acc)),
        name=name or f"sketch({on})",
    )
