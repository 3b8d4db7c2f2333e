"""Resumable partitioned Parquet sink (task-brief 'resumable output')."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from bqf_ray.state.output import (finished_partitions,
                                  read_resumable_parquet,
                                  resumable_write_parquet)


@pytest.fixture()
def events_ds(ray_session):
    import ray
    rng = np.random.RandomState(2)
    n = 4000
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(rng.choice(["a", "b", "c", "d"], n)),
        "user_id": pa.array(rng.randint(0, 500, n).astype(np.int64)),
        "value": pa.array(rng.rand(n)),
    })).repartition(4)


def test_write_then_resume_skips_finished(events_ds, tmp_path):
    root = str(tmp_path / "out")
    meta = resumable_write_parquet(events_ds, root, "event_type")
    assert {m["part"] for m in meta} == {"a", "b", "c", "d"}
    assert finished_partitions(root) == {"a", "b", "c", "d"}
    full = read_resumable_parquet(root).to_pandas()
    assert len(full) == 4000

    # corrupt one partition (same size) and delete another's marker
    bpath = os.path.join(root, "part=b", "data.parquet")
    blob = bytearray(open(bpath, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(bpath, "wb").write(bytes(blob))
    os.remove(os.path.join(root, "part=c", "_DONE"))
    assert finished_partitions(root) == {"a", "d"}

    mtimes = {p: os.path.getmtime(os.path.join(root, f"part={p}",
                                               "data.parquet"))
              for p in ["a", "d"]}
    meta2 = resumable_write_parquet(events_ds, root, "event_type")
    # only the broken partitions were rewritten
    assert {m["part"] for m in meta2} == {"b", "c"}
    for p in ["a", "d"]:
        assert os.path.getmtime(os.path.join(root, f"part={p}",
                                             "data.parquet")) == mtimes[p]
    full2 = read_resumable_parquet(root).to_pandas()
    assert len(full2) == 4000
    assert (full.sort_values(["event_type", "user_id", "value"])
            .reset_index(drop=True)
            .equals(full2.sort_values(["event_type", "user_id", "value"])
                    .reset_index(drop=True)))


def test_bucketed_write(events_ds, tmp_path):
    root = str(tmp_path / "bout")
    meta = resumable_write_parquet(events_ds, root, "user_id",
                                   num_buckets=8)
    assert len(meta) == 8
    assert sum(m["rows"] for m in meta) == 4000
    got = read_resumable_parquet(root).to_pandas()
    assert len(got) == 4000


def test_compact_partitions_resumable(ray_session, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from bqf_ray.state.output import (compact_partitions,
                                      finished_partitions,
                                      read_resumable_parquet,
                                      resumable_write_parquet)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    n = 5000
    t = pa.table({"k": pa.array(np.arange(n, dtype=np.int64) % 37),
                  "v": pa.array(np.arange(n, dtype=np.int64))})
    resumable_write_parquet(ray.data.from_arrow(t).repartition(6),
                            src, "k")
    assert len(finished_partitions(src)) == 37
    # bin-pack tiny parts into few groups
    meta = compact_partitions(src, dst, target_bytes=40_000)
    groups = finished_partitions(dst)
    assert 1 < len(groups) < 37
    assert sum(m["rows"] for m in meta) == n
    # content preserved exactly (multiset equality)
    back = read_resumable_parquet(dst).to_pandas()
    assert sorted(back["v"]) == list(range(n))
    # resume: re-running writes nothing new
    meta2 = compact_partitions(src, dst, target_bytes=40_000)
    assert meta2 == []
    # member manifest present
    gid = sorted(groups)[0]
    import json
    with open(os.path.join(dst, f"part={gid}", "_DONE")) as f:
        assert len(json.load(f)["members"]) >= 1
