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


def compact_partitions(src_root: str, dst_root: str,
                       target_bytes: int = 128 << 20):
    """Small-files compaction for a resumable-sink directory: bin-pack
    finished ``part=`` directories (sizes from their verified ``_DONE``
    markers) into ~``target_bytes`` groups — the many-small-outputs →
    few-read-efficient-files maintenance step every partitioned sink
    eventually needs.  Deterministic (sorted parts, first-fit), atomic
    per group (tmp+rename + ``_DONE`` with member manifest), and
    RESUMABLE like the sink itself: re-running skips groups whose
    marker verifies, so a killed compaction continues where it
    stopped.  Each group is read+written inside one Ray task (groups
    are independent — the job parallelizes across them).

    Returns per-group metadata ``(group, parts, rows, bytes)``."""
    import ray

    if not os.path.isdir(src_root):
        raise FileNotFoundError(src_root)
    parts = sorted(finished_partitions(src_root))
    if not parts:
        return []
    sizes = {}
    for p in parts:
        with open(os.path.join(_part_dir(src_root, p), "_DONE")) as f:
            sizes[p] = int(json.load(f)["bytes"])
    groups: list[list[str]] = []
    cur: list[str] = []
    acc = 0
    for p in parts:                       # first-fit over sorted parts
        if cur and acc + sizes[p] > target_bytes:
            groups.append(cur)
            cur, acc = [], 0
        cur.append(p)
        acc += sizes[p]
    if cur:
        groups.append(cur)

    os.makedirs(dst_root, exist_ok=True)
    done = finished_partitions(dst_root)

    def write_group(batch: pa.Table) -> pa.Table:
        out = {"part": [], "parts": [], "rows": [], "bytes": []}
        for row in batch.to_pylist():
            gid = row["gid"]
            members = row["members"].split(",")
            if str(gid) in done:
                # Resume safety: positional gids are only valid if the
                # source partition set hasn't shifted since the partial
                # compaction — first-fit membership moves when src_root
                # gains partitions, so a stale gid would silently drop
                # the shifted-in parts.  Compare the recorded manifest
                # and REWRITE on mismatch instead of skipping.
                with open(os.path.join(_part_dir(dst_root, str(gid)),
                                       "_DONE")) as f:
                    prev = json.load(f).get("members")
                if prev == members:
                    continue
            tbl = pa.concat_tables([
                pq.read_table(os.path.join(_part_dir(src_root, p),
                                           "data.parquet"))
                for p in members], promote_options="default")
            d = _part_dir(dst_root, gid)
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
                json.dump({"rows": len(tbl), "bytes": size,
                           "sha256": sha, "members": members}, f)
            os.replace(marker_tmp, os.path.join(d, "_DONE"))
            out["part"].append(str(gid))
            out["parts"].append(len(members))
            out["rows"].append(len(tbl))
            out["bytes"].append(size)
        return pa.table({"part": pa.array(out["part"]),
                         "parts": pa.array(out["parts"], pa.int64()),
                         "rows": pa.array(out["rows"], pa.int64()),
                         "bytes": pa.array(out["bytes"], pa.int64())})

    items = ray.data.from_items(
        [{"gid": f"g{gi:05d}", "members": ",".join(g)}
         for gi, g in enumerate(groups)])
    return (items.map_batches(write_group, batch_format="pyarrow",
                              batch_size=1).take_all())
