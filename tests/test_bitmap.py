"""CompressedBitmap — exact mergeable distinct/membership sketch.

Contract: exactness vs python sets under arbitrary partitioning and
merge trees (including IDEMPOTENT re-merges), array<->bitset container
transitions at the 4096 threshold, serde round-trips, and the grouped
UDAF path end-to-end on the native aggregate surface."""

import numpy as np
import pytest

from bqf_ray.sketches.base import MergeableSketch
from bqf_ray.sketches.bitmap import _ARRAY_MAX, CompressedBitmap


def _rand_keys(rng, n, hi):
    return rng.randint(0, hi, size=n).astype(np.uint64)


@pytest.mark.parametrize("hi", [500, 70_000, 1 << 21])
def test_exact_count_and_members(hi):
    rng = np.random.RandomState(7)
    keys = _rand_keys(rng, 50_000, hi)
    bm = CompressedBitmap()
    bm.update_batch(keys)
    truth = np.unique(keys)
    assert bm.count() == len(truth)
    assert np.array_equal(bm.members(), truth)


def test_membership_exact():
    rng = np.random.RandomState(3)
    keys = _rand_keys(rng, 20_000, 1 << 18)
    bm = CompressedBitmap()
    bm.update_batch(keys)
    probe = _rand_keys(rng, 10_000, 1 << 19)      # half outside inserted range
    got = bm.query_batch(probe)
    truth = np.isin(probe, keys)
    assert np.array_equal(got, truth)             # exact: no FPs, no FNs


def test_container_transition_array_to_bitset():
    bm = CompressedBitmap()
    # one chunk, just under the flip
    bm.update_batch(np.arange(_ARRAY_MAX, dtype=np.uint64))
    assert bm._chunks[0][0] == "a"
    bm.update_batch(np.arange(_ARRAY_MAX, _ARRAY_MAX + 10, dtype=np.uint64))
    assert bm._chunks[0][0] == "b"
    assert bm.count() == _ARRAY_MAX + 10
    assert np.array_equal(bm.members(),
                          np.arange(_ARRAY_MAX + 10, dtype=np.uint64))


@pytest.mark.parametrize("tree_seed", [0, 1])
def test_merge_trees_exact_and_idempotent(tree_seed):
    rng = np.random.RandomState(tree_seed)
    keys = _rand_keys(rng, 120_000, 1 << 20)      # dense: bitset containers
    chunks = np.array_split(keys, 13)
    parts = []
    for c in chunks:
        s = CompressedBitmap()
        s.update_batch(c)
        parts.append(s)
    # re-deliver one partial twice: union is idempotent
    dup = CompressedBitmap().merge(parts[4])
    parts.append(dup)
    work = list(parts)
    while len(work) > 1:
        a = work.pop(rng.randint(0, len(work)))
        b = work.pop(rng.randint(0, len(work)))
        work.append(a.merge(b))
    merged = work[0]
    truth = np.unique(keys)
    assert merged.count() == len(truth)
    assert np.array_equal(merged.members(), truth)


def test_merge_mixed_containers():
    a = CompressedBitmap()
    a.update_batch(np.arange(0, 6000, dtype=np.uint64))          # bitset
    b = CompressedBitmap()
    b.update_batch(np.arange(5000, 5100, dtype=np.uint64))       # array
    c = CompressedBitmap()
    c.update_batch(np.arange(100000, 100050, dtype=np.uint64))   # new chunk
    # array into bitset, bitset into array, and chunk-add, both directions
    m1 = CompressedBitmap().merge(a).merge(b).merge(c)
    m2 = CompressedBitmap().merge(c).merge(b).merge(a)
    truth = np.union1d(np.union1d(np.arange(6000), np.arange(5000, 5100)),
                       np.arange(100000, 100050)).astype(np.uint64)
    for m in (m1, m2):
        assert m.count() == len(truth)
        assert np.array_equal(m.members(), truth)


def test_serde_roundtrip():
    rng = np.random.RandomState(11)
    bm = CompressedBitmap()
    bm.update_batch(_rand_keys(rng, 80_000, 1 << 19))   # mixed containers
    bm.update_batch(np.array([1 << 40, (1 << 40) + 3], dtype=np.uint64))
    back = MergeableSketch.from_bytes(bm.to_bytes())
    assert back.count() == bm.count()
    assert np.array_equal(back.members(), bm.members())
    # serde of an empty sketch
    empty = MergeableSketch.from_bytes(CompressedBitmap().to_bytes())
    assert empty.count() == 0


def test_grouped_distinct_bitmap_exact(ray_session):
    import pandas as pd
    import ray

    from bqf_ray.pipelines.aggregates import grouped_distinct_bitmap

    rng = np.random.RandomState(5)
    n = 30_000
    df = pd.DataFrame({
        "event_type": rng.choice(["a", "b", "c"], size=n),
        "user_id": rng.randint(0, 4000, size=n).astype(np.int64)})
    got = grouped_distinct_bitmap(ray.data.from_pandas(df).repartition(7),
                                  "event_type", "user_id")
    truth = (df.groupby("event_type")["user_id"].nunique()
             .reset_index(name="n_distinct").sort_values("event_type"))
    assert list(got["event_type"]) == list(truth["event_type"])
    assert list(got["n_distinct"]) == list(truth["n_distinct"])
