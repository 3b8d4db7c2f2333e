"""Regression tests for the round-3 advisor findings (ADVICE.md r3):

1. ``MergeableSketch.from_bytes`` on a fresh worker must resolve EVERY
   registered sketch class (freqdir/misragries were missing from the
   static fallback import tuple).
2. ``window_heavy_hitters`` recount must share ``prepare_hash`` with the
   MG build — string keys crashed, float keys silently matched nothing.
3. ``compact_partitions`` resume must detect shifted group membership
   (src gained partitions after a partial compaction) and rewrite.
4. ``eh_window_counts`` / ``eh_window_counts_by_key`` must drop null
   timestamps like their ``_sums`` siblings.
"""
import collections
import json
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_from_bytes_fresh_worker_resolves_all_sketches():
    """Simulate a worker that never imported the sketch module: pop the
    class from the registry AND sys.modules, then deserialize."""
    from bqf_ray.sketches import base as b
    from bqf_ray.sketches.freqdir import FrequentDirections
    from bqf_ray.sketches.misragries import MisraGries

    rng = np.random.RandomState(0)
    fd = FrequentDirections(d=8, ell=4)
    fd.update_batch(rng.randint(-50, 50, (32, 8)).astype(np.float64))
    mg = MisraGries(m=4)
    mg.update_batch(rng.randint(0, 10, 100).astype(np.uint64))
    for obj, mod in ((fd, "bqf_ray.sketches.freqdir"),
                     (mg, "bqf_ray.sketches.misragries")):
        blob = obj.to_bytes()
        name = type(obj).__name__
        saved_cls = b._REGISTRY.pop(name)
        saved_mod = sys.modules.pop(mod)
        try:
            back = b.MergeableSketch.from_bytes(blob)
            assert type(back).__name__ == name
        finally:
            sys.modules[mod] = saved_mod
            b._REGISTRY[name] = saved_cls


@pytest.mark.parametrize("keykind", ["str", "float"])
def test_window_heavy_hitters_string_and_float_keys(ray_session, keykind):
    import ray

    from bqf_ray.pipelines.windowed import window_heavy_hitters
    rng = np.random.RandomState(3)
    n = 4000
    base = np.int64(1_700_000_000_000_000)
    us = base + rng.randint(0, 5 * 86_400_000_000, n, dtype=np.int64)
    raw = rng.zipf(1.3, n).clip(max=50).astype(np.int64)
    if keykind == "str":
        keys = np.array([f"user-{k}" for k in raw])
    else:
        keys = raw.astype(np.float64) + 0.5
    df = pd.DataFrame({"ts": us.astype("datetime64[us]"), "k": keys})
    m = 16
    w = 3 * 86400
    got = window_heavy_hitters(ray.data.from_pandas(df).repartition(5),
                               [w], "k", m=m)
    CELL = 86_400_000_000
    cells = (us // CELL) * CELL
    hi = int(cells.max())
    memb = cells > hi + CELL - 1 - w * 1_000_000
    nw = int(memb.sum())
    cnt = collections.Counter(keys[memb])
    exp = sorted((k, c) for k, c in cnt.items() if c > nw / (m + 1))
    assert exp, "fixture must produce at least one heavy hitter"
    assert sorted(zip(got["k"], got["cnt"])) == exp


def test_compact_partitions_rewrites_on_shifted_membership(ray_session,
                                                          tmp_path):
    import ray

    from bqf_ray.state.output import (compact_partitions,
                                      finished_partitions,
                                      read_resumable_parquet,
                                      resumable_write_parquet)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    n = 3000
    t = pa.table({"k": pa.array(np.arange(n, dtype=np.int64) % 11),
                  "v": pa.array(np.arange(n, dtype=np.int64))})
    resumable_write_parquet(ray.data.from_arrow(t).repartition(4), src, "k")
    compact_partitions(src, dst, target_bytes=30_000)
    # src gains partitions AFTER the compaction → first-fit membership
    # of every group can shift
    t2 = pa.table({"k": pa.array(np.full(500, 99, dtype=np.int64)),
                   "v": pa.array(np.arange(n, n + 500, dtype=np.int64))})
    resumable_write_parquet(ray.data.from_arrow(t2), src, "k")
    assert len(finished_partitions(src)) == 12
    compact_partitions(src, dst, target_bytes=30_000)
    back = read_resumable_parquet(dst).to_pandas()
    # no rows silently dropped, none duplicated
    assert sorted(back["v"]) == list(range(n + 500))
    # every _DONE manifest matches what is actually inside the group
    for gid in finished_partitions(dst):
        with open(os.path.join(dst, f"part={gid}", "_DONE")) as f:
            assert json.load(f)["members"]


def test_eh_window_counts_null_ts(ray_session):
    import ray

    from bqf_ray.pipelines.windowed import (eh_window_counts,
                                            eh_window_counts_by_key)
    base = np.int64(1_700_000_000_000_000)
    us = base + np.arange(1000, dtype=np.int64) * 1_000_000
    ts = pa.array(us, pa.timestamp("us"))
    ts = pa.concat_arrays([ts, pa.array([None] * 7, pa.timestamp("us"))])
    keys = pa.array(list(np.arange(1000, dtype=np.int64) % 3) + [0] * 7)
    ds = ray.data.from_arrow(pa.table({"ts": ts, "user_id": keys}))
    c = eh_window_counts(ds, [3600])
    assert int(c["n_exact"].iloc[0]) == 1000  # nulls excluded, no crash
    k = eh_window_counts_by_key(ds, "user_id", [3600])
    assert int(k["n_exact"].sum()) == 1000
