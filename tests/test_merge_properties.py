"""Merge-order invariance (north_rule: estimates correct 'under arbitrary
merge orderings') + serde round-trips for every sketch.

Two strength tiers:
- exact-state sketches (HLL, CountMin, BlockedBloom): any merge tree is
  BITWISE equal to the single-sketch build;
- sample-based sketches (TDigest, KLL): any merge tree's estimates stay
  within the published bound of the exact answer.
"""

import numpy as np
import pytest

from bqf_ray.functions.hashing import fmix64
from bqf_ray.sketches.base import MergeableSketch
from bqf_ray.sketches.bitmap import CompressedBitmap
from bqf_ray.sketches.bloom import BlockedBloom
from bqf_ray.sketches.countmin import CountMin
from bqf_ray.sketches.hll import HyperLogLog
from bqf_ray.sketches.kll import KLL
from bqf_ray.sketches.tdigest import TDigest


def _keys(n, seed=0):
    return fmix64(np.arange(n, dtype=np.uint64) + np.uint64(seed * 1_000_003 + 7))


def _random_merge_tree(parts, rng):
    parts = list(parts)
    while len(parts) > 1:
        i = rng.randint(0, len(parts) - 1)
        a = parts.pop(i)
        b = parts.pop(rng.randint(0, len(parts)))
        parts.append(a.merge(b))
    return parts[0]


EXACT_FACTORIES = [
    lambda: HyperLogLog(p=10),
    # worst-case chunk layout for the bitmap: full-range hashed keys
    # make every chunk a singleton array container
    lambda: CompressedBitmap(),
    lambda: CountMin(width=512, depth=4, seed=2),
    lambda: BlockedBloom(n_bits=1 << 16, k=5, seed=2),
]


@pytest.mark.parametrize("factory", EXACT_FACTORIES)
@pytest.mark.parametrize("tree_seed", [0, 1, 2])
def test_exact_merge_tree_equals_single(factory, tree_seed):
    rng = np.random.RandomState(tree_seed)
    keys = _keys(30_000, seed=5)
    chunks = np.array_split(keys, 13)
    single = factory()
    single.update_batch(keys)
    parts = []
    for c in chunks:
        s = factory()
        s.update_batch(c)
        parts.append(s)
    merged = _random_merge_tree(parts, rng)
    for name, arr in single._state_arrays().items():
        np.testing.assert_array_equal(arr, merged._state_arrays()[name], err_msg=name)


@pytest.mark.parametrize("tree_seed", [0, 1, 2])
def test_quantile_merge_tree_within_bound(tree_seed):
    rng = np.random.RandomState(tree_seed)
    vals = np.random.RandomState(77).gamma(2.0, 10.0, 120_000)
    svals = np.sort(vals)
    chunks = np.array_split(vals, 17)
    for factory in (lambda: TDigest(delta=200), lambda: KLL(k=256, seed=tree_seed)):
        parts = []
        for c in chunks:
            s = factory()
            s.update_batch(c)
            parts.append(s)
        merged = _random_merge_tree(parts, rng)
        for q in [0.1, 0.5, 0.9]:
            r = np.searchsorted(svals, merged.quantile(q)) / len(svals)
            assert abs(r - q) <= merged.error_bound(), (type(merged).__name__, q, r)


ALL_FACTORIES = EXACT_FACTORIES + [lambda: TDigest(delta=150),
                                   lambda: KLL(k=128, seed=1)]


@pytest.mark.parametrize("factory", ALL_FACTORIES)
def test_serde_roundtrip(factory):
    s = factory()
    if isinstance(s, (TDigest, KLL)):
        s.update_batch(np.random.RandomState(3).normal(0, 5, 10_000))
    else:
        s.update_batch(_keys(10_000))
    blob = s.to_bytes()
    s2 = MergeableSketch.from_bytes(blob)
    assert type(s2) is type(s)
    for name, arr in s._state_arrays().items():
        np.testing.assert_array_equal(arr, s2._state_arrays()[name], err_msg=name)
    # blob is process-stable: serializing again is identical
    assert s2.to_bytes() == blob


def test_merge_config_mismatch_raises():
    a, b = HyperLogLog(p=10), HyperLogLog(p=12)
    with pytest.raises(ValueError):
        a.merge(b)
    with pytest.raises(TypeError):
        a.merge(CountMin())


def test_update_batch_permutation_invariance_exact():
    keys = _keys(20_000, seed=8)
    perm = np.random.RandomState(1).permutation(len(keys))
    for factory in EXACT_FACTORIES:
        a, b = factory(), factory()
        a.update_batch(keys)
        b.update_batch(keys[perm])
        for name, arr in a._state_arrays().items():
            np.testing.assert_array_equal(arr, b._state_arrays()[name])
