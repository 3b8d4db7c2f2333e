"""Ray Data stages that turn any :class:`MergeableSketch` into a
distributed UDAF.

Three shapes (SURVEY.md §3.1 "Ray shape" / §7.3):

1. **Partial + tree-reduce** (`build_sketch`): stateless ``map_batches``
   emits one serialized partial sketch per input block, then
   :func:`tree_merge` reduces them level-by-level with a
   ``groupby(part_id // fanout)`` shuffle per level — the canonical
   mergeable-UDAF plan.  Works for any sketch; network cost per level is
   (#partials / fanout) × sketch_size.

2. **Partitioned build** (`build_partitioned`): one hash-partition shuffle
   on ``key % P`` co-locates every occurrence of a key, then one sketch is
   built per partition (``groupby("__part").map_groups``).  Keys are
   disjoint across shards, so the shard set IS the global sketch —
   probes route by the same ``key % P``.  This is the shape for sketches
   whose size grows with distinct keys (BQF), where a tree-merge of
   overlapping partials would thrash.

3. **Probe** (`ProbeStage`): broadcast the (shard) sketch blobs once via
   ``ray.put``; an actor pool deserializes in ``__init__`` and serves
   vectorized lookups per batch — the reference's query pipeline
   (/root/reference/src/abstract_bqf.cpp:169-191) as a data-parallel stage.

Hash-space partitioning by ``key % P`` is uniform for hashed tokens by
construction, so no salting is needed HERE; salting applies to
natural-key groupbys (see ``stages/partition.py``).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

from bqf_ray.sketches.base import MergeableSketch

KeyFn = Callable[[pa.Table], tuple[np.ndarray, np.ndarray | None]]
"""batch → (uint64 keys, optional counts). May emit any number of keys."""


# ---------------------------------------------------------------------------
# shape 1: partials + tree merge
# ---------------------------------------------------------------------------

def partial_sketches(ds, key_fn: KeyFn, factory: Callable[[], MergeableSketch],
                     batch_size: int | None = 4096, label: str = "sketch"):
    """Dataset → Dataset[(part_id: int64, blob: binary)] — one partial
    sketch per input batch, built inside stateless tasks."""

    def make_partial(batch: pa.Table) -> pa.Table:
        keys, counts = key_fn(batch)
        sk = factory()
        sk.update_batch(keys, counts)
        return pa.table({"blob": pa.array([sk.to_bytes()], pa.binary())})

    return ds.map_batches(make_partial, batch_format="pyarrow",
                          batch_size=batch_size)


def _merge_block(batch: pa.Table) -> pa.Table:
    blobs = batch.column("blob").to_pylist()
    sk = MergeableSketch.from_bytes(blobs[0])
    for b in blobs[1:]:
        sk.merge(MergeableSketch.from_bytes(b))
    return pa.table({"blob": pa.array([sk.to_bytes()], pa.binary())})


def tree_merge(blob_ds, fanout: int = 64):
    """Tree-reduce a Dataset of sketch blobs to ONE sketch: each level
    ``repartition(ceil(n/fanout))`` packs ~fanout blobs per block and a
    whole-block ``map_batches`` merges them.  Depth = log_fanout(n); each
    level moves only the partial blobs, never row data.  Returns the final
    sketch object.  fanout=64 keeps typical single-node runs to ONE merge
    level (each level is a barrier + driver sync); fixed-size sketches
    merge fast enough that wide fan-in is compute-cheap."""
    ds = blob_ds
    n = ds.count()
    while n > 1:
        levels = max(1, (n + fanout - 1) // fanout)
        ds = (ds.repartition(levels)
                .map_batches(_merge_block, batch_format="pyarrow",
                             batch_size=None))
        ds = ds.materialize()
        n = ds.count()
    rows = ds.take_all()
    assert len(rows) == 1, f"tree_merge ended with {len(rows)} blobs"
    return MergeableSketch.from_bytes(rows[0]["blob"])


def build_sketch(ds, key_fn: KeyFn, factory: Callable[[], MergeableSketch],
                 batch_size: int | None = 4096, fanout: int = 64
                 ) -> MergeableSketch:
    """read → partial per block → tree merge → one sketch."""
    return tree_merge(partial_sketches(ds, key_fn, factory, batch_size),
                      fanout=fanout)


# ---------------------------------------------------------------------------
# shape 2: partitioned build (disjoint key ranges)
# ---------------------------------------------------------------------------

def build_partitioned(ds, key_fn: KeyFn, factory: Callable[[], MergeableSketch],
                      num_partitions: int = 16, batch_size: int | None = 4096,
                      sink_dir: str | None = None,
                      skip_partitions: set[int] | None = None,
                      combine: bool = False,
                      partial_factory: Callable[[], MergeableSketch] | None = None):
    """One shuffle: route (key, count) rows by ``key % P``, build one sketch
    per partition → Dataset[(part, blob, n_keys, bytes)].

    Pre-aggregates (key, count) inside each map task before the shuffle so
    the exchange carries per-batch-unique keys, not raw occurrences
    (ray_guide 'Aggregation at scale').  With ``sink_dir`` set, shard blobs
    are written from inside the build tasks (atomic + idempotent) and the
    returned dataset carries metadata only — nothing big flows to the
    driver.  ``skip_partitions`` drops already-checkpointed partitions
    right after the pre-aggregation (resume path).
    """
    P = int(num_partitions)

    def to_kv(batch: pa.Table) -> pa.Table:
        keys, counts = key_fn(batch)
        keys = np.asarray(keys, dtype=np.uint64)
        if counts is None:
            counts = np.ones(len(keys), dtype=np.uint64)
        uniq, inv = np.unique(keys, return_inverse=True)
        agg = np.zeros(len(uniq), dtype=np.uint64)
        np.add.at(agg, inv, np.asarray(counts, dtype=np.uint64))
        return pa.table({
            "__part": pa.array((uniq % np.uint64(P)).astype(np.int64)),
            "key": pa.array(uniq.astype(np.int64)),   # arrow-friendly signed view
            "count": pa.array(agg.astype(np.int64)),
        })

    def build_group(batch: pa.Table) -> pa.Table:
        part = int(batch.column("__part")[0].as_py())
        keys = np.asarray(batch.column("key"), dtype=np.int64).astype(np.uint64)
        counts = np.asarray(batch.column("count"), dtype=np.int64).astype(np.uint64)
        sk = factory()
        sk.update_batch(keys, counts)
        blob = sk.to_bytes()
        n_keys = len(np.unique(keys))
        import hashlib
        size = len(blob)
        sha = hashlib.sha256(blob).hexdigest()
        if sink_dir is not None:
            # write the shard from inside the task (atomic, deterministic
            # name → idempotent under retries); only metadata flows back
            from bqf_ray.state.checkpoint import _atomic_write
            import os
            path = os.path.join(sink_dir, f"part-{part:05d}.sketch")
            _atomic_write(path, blob)
            blob = b""
        return pa.table({
            "part": pa.array([part], pa.int64()),
            "blob": pa.array([blob], pa.binary()),
            "n_keys": pa.array([n_keys], pa.int64()),
            "bytes": pa.array([size], pa.int64()),
            "sha256": pa.array([sha], pa.string()),
        })

    def to_partial_blobs(batch: pa.Table) -> pa.Table:
        """Combiner form: build one PARTIAL sketch per (task, partition) so
        the wide shuffle carries sketch blobs, not per-key rows — the
        mergeable-UDAF combiner (ray_guide 'Aggregation at scale')."""
        keys, counts = key_fn(batch)
        keys = np.asarray(keys, dtype=np.uint64)
        if counts is None:
            counts = np.ones(len(keys), dtype=np.uint64)
        else:
            counts = np.asarray(counts, dtype=np.uint64)
        part = (keys % np.uint64(P)).astype(np.int64)
        order = np.argsort(part, kind="stable")
        keys, counts, part = keys[order], counts[order], part[order]
        bounds = np.searchsorted(part, np.arange(P + 1))
        parts_out, blobs_out = [], []
        for p in range(P):
            lo, hi = bounds[p], bounds[p + 1]
            if lo == hi or (skip_partitions and p in skip_partitions):
                continue
            sk = (partial_factory or factory)()
            sk.update_batch(keys[lo:hi], counts[lo:hi])
            parts_out.append(p)
            blobs_out.append(sk.to_bytes())
        return pa.table({"__part": pa.array(parts_out, pa.int64()),
                         "blob": pa.array(blobs_out, pa.binary())})

    def merge_group(batch: pa.Table) -> pa.Table:
        part = int(batch.column("__part")[0].as_py())
        blobs = batch.column("blob").to_pylist()
        sk = MergeableSketch.from_bytes(blobs[0])
        sk.merge_many([MergeableSketch.from_bytes(b) for b in blobs[1:]])
        blob = sk.to_bytes()
        n_keys = sk.elements_inside
        size = len(blob)
        import hashlib
        sha = hashlib.sha256(blob).hexdigest()
        if sink_dir is not None:
            from bqf_ray.state.checkpoint import _atomic_write
            import os
            _atomic_write(os.path.join(sink_dir, f"part-{part:05d}.sketch"),
                          blob)
            blob = b""
        return pa.table({
            "part": pa.array([part], pa.int64()),
            "blob": pa.array([blob], pa.binary()),
            "n_keys": pa.array([n_keys], pa.int64()),
            "bytes": pa.array([size], pa.int64()),
            "sha256": pa.array([sha], pa.string()),
        })

    if combine:
        return (ds.map_batches(to_partial_blobs, batch_format="pyarrow",
                               batch_size=batch_size)
                .groupby("__part")
                .map_groups(merge_group, batch_format="pyarrow"))

    skip_fn = None
    if skip_partitions:
        skip = np.array(sorted(skip_partitions), dtype=np.int64)

        def skip_fn(batch: pa.Table) -> pa.Table:
            part = np.asarray(batch.column("__part"), dtype=np.int64)
            keep = ~np.isin(part, skip)
            return batch.filter(pa.array(keep))

    kv = ds.map_batches(to_kv, batch_format="pyarrow", batch_size=batch_size)
    if skip_fn is not None:
        kv = kv.map_batches(skip_fn, batch_format="pyarrow")
    # coalesce the many small kv blocks before the sort shuffle — the sort's
    # task count is O(blocks × reduce partitions), so hundreds of tiny map
    # outputs would dominate wall time with scheduling overhead
    kv = kv.repartition(min(P, 64))
    return kv.groupby("__part").map_groups(build_group, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# shape 4: grouped build (one merged sketch per group value)
# ---------------------------------------------------------------------------

def build_grouped(ds, group_col: str, value_fn, factory,
                  batch_size: int | None = 4096):
    """One merged sketch per distinct value of ``group_col`` — the grouped
    mergeable-UDAF plan: a per-batch combiner builds one partial sketch per
    (batch, group), then a single ``groupby(group_col)`` shuffle merges
    blobs per group.  Returns Dataset[(group_col, blob: binary)].

    ``value_fn(batch) -> np.ndarray`` must return one value per input ROW
    (aligned with ``group_col``).

    Scale note: raw rows never cross the exchange — shuffle volume is
    n_blocks × groups_per_block × sketch_size.  A skewed (hot) group costs
    nothing extra: each batch contributes one fixed-size partial for it no
    matter how many of the batch's rows it owns, so no salting is needed.
    """

    def partials(batch: pa.Table) -> pa.Table:
        vals = np.asarray(value_fn(batch))
        groups = batch.column(group_col).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(groups, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        bounds = np.searchsorted(inv[order], np.arange(len(uniq) + 1))
        blobs = []
        for i in range(len(uniq)):
            sk = factory()
            sk.update_batch(vals[order[bounds[i]:bounds[i + 1]]])
            blobs.append(sk.to_bytes())
        return pa.table({group_col: pa.array(list(uniq)),
                         "blob": pa.array(blobs, pa.binary())})

    def merge_group(batch: pa.Table) -> pa.Table:
        blobs = batch.column("blob").to_pylist()
        sk = MergeableSketch.from_bytes(blobs[0])
        sk.merge_many([MergeableSketch.from_bytes(b) for b in blobs[1:]])
        return pa.table({group_col: batch.column(group_col).slice(0, 1),
                         "blob": pa.array([sk.to_bytes()], pa.binary())})

    return (ds.map_batches(partials, batch_format="pyarrow",
                           batch_size=batch_size)
            .groupby(group_col)
            .map_groups(merge_group, batch_format="pyarrow"))


class PartitionedSketch:
    """P shard sketches over disjoint key ranges (key % P routing).

    ``num_partitions`` must be the P the build used: the build's groupby
    only emits partitions that received keys, so inferring P from the
    populated shard dict is wrong whenever the highest-numbered partition
    is empty (key%P would then misroute every probe).  Partitions absent
    from ``shards`` are genuinely empty and report count 0."""

    def __init__(self, shards: dict[int, MergeableSketch],
                 num_partitions: int | None = None):
        if num_partitions is None:
            num_partitions = max(shards) + 1 if shards else 0
        assert all(0 <= p < num_partitions for p in shards), \
            f"shard ids {sorted(shards)} out of range for P={num_partitions}"
        self.P = int(num_partitions)
        self.shards = shards

    @classmethod
    def from_dataset(cls, blob_ds, num_partitions: int) -> "PartitionedSketch":
        """``num_partitions`` is REQUIRED here: a build's groupby emits only
        non-empty partitions, so P cannot be inferred from the blob rows
        (an empty highest partition would silently shrink P and misroute
        every key%P probe)."""
        shards = {}
        for row in blob_ds.take_all():
            shards[int(row["part"])] = MergeableSketch.from_bytes(row["blob"])
        return cls(shards, num_partitions)

    def query_batch(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        out = np.zeros(len(keys), dtype=np.uint64)
        part = keys % np.uint64(self.P) if self.P else keys
        for p, sk in self.shards.items():
            m = part == p
            if m.any():
                out[m] = sk.query_batch(keys[m])
        return out

    def enumerate(self) -> tuple[np.ndarray, np.ndarray]:
        ks, cs = [], []
        for p in sorted(self.shards):
            k, c = self.shards[p].enumerate()
            ks.append(k)
            cs.append(c)
        return (np.concatenate(ks) if ks else np.empty(0, dtype=np.uint64),
                np.concatenate(cs) if cs else np.empty(0, dtype=np.uint64))

    @property
    def elements_inside(self) -> int:
        return sum(s.elements_inside for s in self.shards.values())


# ---------------------------------------------------------------------------
# shape 3: probe stage
# ---------------------------------------------------------------------------

class ProbeStage:
    """Actor-pool ``map_batches`` stage: look up a key column against a
    broadcast (partitioned) sketch; appends a ``count`` column.

    Pass ``sketch_ref = ray.put(partitioned_or_plain_sketch)`` from the
    driver — the blob ships to each actor ONCE (object-store broadcast),
    never per batch.
    """

    def __init__(self, sketch_ref, key_fn: KeyFn | None = None,
                 key_col: str = "key", out_col: str = "count"):
        import ray
        self.sketch = ray.get(sketch_ref)
        self.key_fn = key_fn
        self.key_col = key_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.key_fn is not None:
            keys, _ = self.key_fn(batch)
        else:
            keys = np.asarray(batch.column(self.key_col), dtype=np.int64).astype(np.uint64)
        counts = self.sketch.query_batch(keys)
        return batch.append_column(self.out_col,
                                   pa.array(counts.astype(np.int64)))
