"""Resumable partitioned Parquet sink.

Task-brief requirement: "write partitioned Parquet (one directory per
input shard / key range) so a failed run can skip finished partitions;
never one giant file."  Same discipline as the sketch checkpoints
(state/checkpoint.py): deterministic per-partition paths, atomic
tmp+rename writes, a ``_DONE`` marker carrying row count + sha256, and a
resume path that drops already-finished partitions BEFORE the shuffle so
they cost nothing on re-run.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _part_dir(root: str, value) -> str:
    return os.path.join(root, f"part={value}")


def finished_partitions(root: str) -> set[str]:
    """Partition values (as strings) whose ``_DONE`` marker exists and
    matches the data file's content hash."""
    done: set[str] = set()
    if not os.path.isdir(root):
        return done
    for name in os.listdir(root):
        if not name.startswith("part="):
            continue
        d = os.path.join(root, name)
        marker = os.path.join(d, "_DONE")
        data = os.path.join(d, "data.parquet")
        if not (os.path.exists(marker) and os.path.exists(data)):
            continue
        try:
            with open(marker) as f:
                meta = json.load(f)
            with open(data, "rb") as f:
                if hashlib.sha256(f.read()).hexdigest() != meta["sha256"]:
                    continue
        except (json.JSONDecodeError, KeyError, OSError):
            continue
        done.add(name[len("part="):])
    return done


def resumable_write_parquet(ds, root: str, partition_col: str,
                            num_buckets: int | None = None):
    """Write ``ds`` under ``root/part=<value>/data.parquet``, one
    directory per distinct ``partition_col`` value (or per
    ``value % num_buckets`` bucket when given — key-range style).

    Re-running after a crash skips every partition whose ``_DONE``
    marker verifies: the skip filter runs inside ``map_batches`` BEFORE
    the shuffle, so finished partitions are never recomputed or moved.
    Writes are atomic (tmp + rename) and deterministic, hence idempotent
    under task retries.  Returns a list of per-partition metadata dicts
    (part, rows, bytes).
    """
    os.makedirs(root, exist_ok=True)
    done = finished_partitions(root)

    def part_values(batch: pa.Table) -> np.ndarray:
        v = batch.column(partition_col)
        if num_buckets is not None:
            return (np.asarray(v, dtype=np.int64)
                    % np.int64(num_buckets)).astype(np.int64)
        return np.asarray(v.to_pylist(), dtype=object)

    def tag_and_skip(batch: pa.Table) -> pa.Table:
        vals = part_values(batch)
        keep = np.array([str(x) not in done for x in vals], dtype=bool)
        return (batch.append_column(
            "__outpart", pa.array([str(x) for x in vals]))
            .filter(pa.array(keep)))

    def write_group(group: pa.Table) -> pa.Table:
        part = group.column("__outpart")[0].as_py()
        tbl = group.drop_columns(["__outpart"])
        d = _part_dir(root, part)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".data.parquet.tmp.{os.getpid()}")
        pq.write_table(tbl, tmp)
        path = os.path.join(d, "data.parquet")
        os.replace(tmp, path)
        with open(path, "rb") as f:
            sha = hashlib.sha256(f.read()).hexdigest()
        size = os.path.getsize(path)
        marker_tmp = os.path.join(d, f"._DONE.tmp.{os.getpid()}")
        with open(marker_tmp, "w") as f:
            json.dump({"rows": len(tbl), "bytes": size, "sha256": sha}, f)
        os.replace(marker_tmp, os.path.join(d, "_DONE"))
        return pa.table({"part": pa.array([part]),
                         "rows": pa.array([len(tbl)], pa.int64()),
                         "bytes": pa.array([size], pa.int64())})

    meta = (ds.map_batches(tag_and_skip, batch_format="pyarrow")
            .groupby("__outpart")
            .map_groups(write_group, batch_format="pyarrow")
            .take_all())                       # one tiny row per partition
    return meta


def read_resumable_parquet(root: str):
    """Dataset over every finished partition (unfinished ones excluded)."""
    import ray
    paths = [os.path.join(_part_dir(root, v), "data.parquet")
             for v in sorted(finished_partitions(root))]
    return ray.data.read_parquet(paths)
