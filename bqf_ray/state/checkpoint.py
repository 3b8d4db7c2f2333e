"""Per-partition sketch checkpoints with lineage manifests.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics" — a killed build must resume without recomputing
finished partitions.

Layout (all writes atomic: tmp file + rename):

    <dir>/
      manifest.json            # config hash, partition list, input lineage
      part-00000.sketch        # sketch blob for partition 0
      part-00001.sketch
      ...

The manifest records, per partition, the exact input fragments consumed
(the lineage) and metrics (n_keys, bytes).  ``resume_plan`` returns which
partitions are already done for an identical (config, input) pair, so the
build pipeline skips them; a retried/duplicate write of the same partition
is idempotent (same deterministic file name, rename-over).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field

from bqf_ray.sketches.base import MergeableSketch


def _config_hash(config: dict) -> str:
    return hashlib.sha256(
        json.dumps(config, sort_keys=True).encode()).hexdigest()[:16]


def _atomic_write(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


@dataclass
class CheckpointManifest:
    config: dict
    input_lineage: list[str]                       # fragment ids of the input
    partitions: dict[str, dict] = field(default_factory=dict)

    @property
    def config_hash(self) -> str:
        return _config_hash({"config": self.config,
                             "lineage": sorted(self.input_lineage)})


class SketchCheckpoint:
    def __init__(self, directory: str, config: dict,
                 input_lineage: list[str] | None = None):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        self.manifest = CheckpointManifest(config=config,
                                           input_lineage=input_lineage or [])

    # --- write side --------------------------------------------------------

    def part_path(self, part: int) -> str:
        return os.path.join(self.dir, f"part-{part:05d}.sketch")

    def write_partition(self, part: int, blob: bytes, n_keys: int,
                        fragments: list[str] | None = None) -> None:
        _atomic_write(self.part_path(part), blob)
        self.manifest.partitions[str(part)] = {
            "n_keys": int(n_keys),
            "bytes": len(blob),
            "sha256": hashlib.sha256(blob).hexdigest(),
            "fragments": fragments or [],
            "ts": time.time(),
        }

    def write_manifest(self) -> None:
        m = {
            "config": self.manifest.config,
            "config_hash": self.manifest.config_hash,
            "input_lineage": self.manifest.input_lineage,
            "partitions": self.manifest.partitions,
        }
        _atomic_write(os.path.join(self.dir, "manifest.json"),
                      json.dumps(m, indent=1).encode())

    # --- read / resume side -------------------------------------------------

    @classmethod
    def load_manifest(cls, directory: str) -> dict | None:
        p = os.path.join(directory, "manifest.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    @classmethod
    def resume_plan(cls, directory: str, config: dict,
                    input_lineage: list[str]) -> set[int]:
        """Partitions already completed for this exact (config, input);
        empty set if no/mismatching checkpoint."""
        m = cls.load_manifest(directory)
        if m is None:
            return set()
        want = _config_hash({"config": config,
                             "lineage": sorted(input_lineage)})
        if m.get("config_hash") != want:
            return set()
        done = set()
        for part, info in m.get("partitions", {}).items():
            path = os.path.join(directory, f"part-{int(part):05d}.sketch")
            if not (os.path.exists(path)
                    and os.path.getsize(path) == info["bytes"]):
                continue
            if "sha256" in info:
                # size alone accepts a corrupted same-size blob; content
                # hash is the real completion check
                with open(path, "rb") as f:
                    if hashlib.sha256(f.read()).hexdigest() != info["sha256"]:
                        continue
            done.add(int(part))
        return done

    @classmethod
    def load_partition(cls, directory: str, part: int,
                       expect_sha256: str | None = None) -> MergeableSketch:
        with open(os.path.join(directory, f"part-{part:05d}.sketch"), "rb") as f:
            blob = f.read()
        if expect_sha256 is not None:
            got = hashlib.sha256(blob).hexdigest()
            if got != expect_sha256:
                raise IOError(
                    f"checkpoint shard part-{part:05d} corrupted: "
                    f"sha256 {got[:12]} != manifest {expect_sha256[:12]}")
        return MergeableSketch.from_bytes(blob)

    @classmethod
    def load_all(cls, directory: str) -> dict[int, MergeableSketch]:
        m = cls.load_manifest(directory)
        assert m is not None, f"no manifest in {directory}"
        return {int(p): cls.load_partition(directory, int(p),
                                           info.get("sha256"))
                for p, info in m["partitions"].items()}
