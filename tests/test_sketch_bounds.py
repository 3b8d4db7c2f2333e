"""Published-error-bound tests (BASELINE.md 'Other sketches' row):
HLL ±1.04/√m, Count-Min ε–δ, t-digest/KLL rank error, Bloom FP."""

import numpy as np
import pyarrow as pa
import pytest

from bqf_ray.functions.hashing import fmix64
from bqf_ray.sketches.bloom import BlockedBloom
from bqf_ray.sketches.countmin import CountMin
from bqf_ray.sketches.hll import HyperLogLog
from bqf_ray.sketches.kll import KLL
from bqf_ray.sketches.tdigest import TDigest


def _keys(n, seed=0):
    return fmix64(np.arange(n, dtype=np.uint64) + np.uint64(seed * 1_000_003 + 7))


@pytest.mark.parametrize("true_n", [100, 10_000, 500_000])
def test_hll_bound(true_n):
    h = HyperLogLog(p=12)  # rse ~ 1.6%
    h.update_batch(_keys(true_n))
    est = h.estimate()
    rse = h.error_bound()
    assert abs(est - true_n) / true_n < 4 * rse  # 4 sigma


def test_hll_duplicates_dont_count():
    h = HyperLogLog(p=12)
    ks = _keys(1000)
    for _ in range(5):
        h.update_batch(ks)
    assert abs(h.estimate() - 1000) / 1000 < 0.1


def test_countmin_eps_delta():
    cm = CountMin.from_error(eps=0.005, delta=0.01, seed=1)
    rng = np.random.RandomState(0)
    # zipf stream: heavy hitters + tail
    keys = fmix64(np.minimum(rng.zipf(1.3, 200_000), 50_000).astype(np.uint64))
    cm.update_batch(keys)
    uniq, true_counts = np.unique(keys, return_counts=True)
    est = cm.query_batch(uniq)
    err = est.astype(np.int64) - true_counts
    assert np.all(err >= 0)  # one-sided overestimate
    eps, delta = cm.error_bound()
    n = float(cm.total)
    frac_over = np.mean(err > eps * n)
    assert frac_over <= delta


def test_bloom_no_false_negatives_and_fp_bound():
    bb = BlockedBloom.from_capacity(50_000, fp=0.01, seed=3)
    present = _keys(50_000, seed=1)
    bb.update_batch(present)
    assert bool(np.all(bb.query_batch(present)))  # zero false negatives
    absent = _keys(100_000, seed=2)
    fp = float(np.mean(bb.query_batch(absent)))
    # blocked blooms pay a small penalty over the classic bound
    assert fp < 3 * max(bb.error_bound(), 0.01)


def test_tdigest_rank_error():
    rng = np.random.RandomState(5)
    vals = np.concatenate([rng.lognormal(0, 2, 100_000), rng.normal(50, 1, 50_000)])
    td = TDigest(delta=200)
    for chunk in np.array_split(vals, 37):
        td.update_batch(chunk)
    svals = np.sort(vals)
    for q in [0.01, 0.1, 0.5, 0.9, 0.99, 0.999]:
        est = td.quantile(q)
        # rank error: where does est fall in the true distribution
        r = np.searchsorted(svals, est) / len(svals)
        tol = td.error_bound() if 0.1 <= q <= 0.9 else 2e-3
        assert abs(r - q) <= tol, (q, r)


def test_kll_rank_error():
    rng = np.random.RandomState(9)
    vals = rng.exponential(3.0, 200_000)
    k = KLL(k=200, seed=4)
    for chunk in np.array_split(vals, 53):
        k.update_batch(chunk)
    svals = np.sort(vals)
    for q in [0.05, 0.25, 0.5, 0.75, 0.95]:
        est = k.quantile(q)
        r = np.searchsorted(svals, est) / len(svals)
        assert abs(r - q) <= k.error_bound(), (q, r)
    # rank() agrees with quantile() direction
    assert abs(k.rank(np.median(vals)) - 0.5) <= k.error_bound()


def test_tdigest_weighted():
    td = TDigest(delta=100)
    td.update_batch(np.array([1.0, 2.0, 3.0]), np.array([1, 98, 1]))
    assert abs(td.quantile(0.5) - 2.0) < 0.2


def test_bottomk_exact_and_merge():
    """Bottom-k must equal the brute-force k smallest hashes, regardless
    of arrival order or merge tree; estimator within published bound."""
    from bqf_ray.functions.hashing import fmix64
    from bqf_ray.sketches.base import MergeableSketch
    from bqf_ray.sketches.sample import BottomK

    rng = np.random.RandomState(4)
    keys = rng.randint(0, 2**63, size=20000).astype(np.uint64)
    keys = np.concatenate([keys, keys[:5000]])          # duplicates
    k = 256
    exp_h = np.sort(fmix64(np.unique(keys)))[:k]

    one = BottomK(k=k)
    one.update_batch(keys)
    np.testing.assert_array_equal(
        np.sort(fmix64(one.sample())), exp_h)

    # merged partials over shuffled thirds == single pass
    rng.shuffle(keys)
    parts = []
    for chunk in np.array_split(keys, 7):
        s = BottomK(k=k)
        s.update_batch(chunk)
        parts.append(s)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    np.testing.assert_array_equal(np.sort(fmix64(merged.sample())), exp_h)

    # serde roundtrip
    back = MergeableSketch.from_bytes(merged.to_bytes())
    np.testing.assert_array_equal(back.sample(), merged.sample())

    # distinct estimate within 4x the published RSE
    est = merged.estimate()
    true_n = len(np.unique(keys))
    assert abs(est - true_n) / true_n < 4 * merged.error_bound()

    # below-k regime is exact
    small = BottomK(k=k)
    small.update_batch(np.arange(100, dtype=np.uint64))
    assert small.estimate() == 100.0


def test_distinct_tokens_check_fused(ray_session):
    """One-pass exact+sketch distinct must equal the two-pass exact count,
    and both sketches must estimate within their published bounds."""
    import ray

    from bqf_ray.pipelines.aggregates import (distinct_tokens_check,
                                              distinct_tokens_exact)
    from bqf_ray.sketches.hll import HyperLogLog
    from bqf_ray.sketches.sample import BottomK

    rng = np.random.RandomState(5)
    texts = [" ".join(f"tok{v}" for v in rng.zipf(1.3, 60) % 5000)
             for _ in range(400)]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)})).repartition(7)
    n, sks = distinct_tokens_check(
        ds, {"hll": lambda: HyperLogLog(p=12),
             "bk": lambda: BottomK(k=256, seed=1)})
    want = int(distinct_tokens_exact(ds).to_pandas()["n_distinct"].iloc[0])
    assert n == want
    hll_est = sks["hll"].estimate()
    assert abs(hll_est - n) / n <= 4 * 1.04 / np.sqrt(2 ** 12)
    bk = sks["bk"]
    assert abs(bk.estimate() - n) / n <= 4 * bk.error_bound()
