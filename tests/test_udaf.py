"""sketch_agg: MergeableSketch as a native Ray Data AggregateFn.

Checks the adapter against driver-side reference sketches fed the same
stream — per group, across different partitionings (merge-order
invariance for order-invariant sketches), global path, weighted path,
and the bytes finalizer round-trip.
"""

import numpy as np
import pyarrow as pa
import pytest

from bqf_ray.sketches.base import MergeableSketch
from bqf_ray.sketches.bloom import BlockedBloom
from bqf_ray.sketches.countmin import CountMin
from bqf_ray.sketches.hll import HyperLogLog
from bqf_ray.sketches.kll import KLL
from bqf_ray.stages.udaf import prepare_hash, sketch_agg


def _fixture(n=4000, seed=0):
    rng = np.random.RandomState(seed)
    langs = rng.choice(["en", "de", "fr"], n)
    toks = np.array([f"tok{v}" for v in rng.zipf(1.5, n) % 997])
    vals = rng.gamma(2.0, 10.0, n)
    return pa.table({"lang": pa.array(langs.tolist()),
                     "token": pa.array(toks.tolist()),
                     "value": pa.array(vals)})


@pytest.mark.parametrize("parts", [1, 4, 16])
def test_hll_groupby_matches_driver_and_partition_invariant(ray_session,
                                                            parts):
    import ray
    tbl = _fixture()
    ds = ray.data.from_arrow(tbl).repartition(parts)
    out = {r["lang"]: r["distinct_est"] for r in
           ds.groupby("lang").aggregate(
               sketch_agg(lambda: HyperLogLog(p=12), on="token",
                          finalize="estimate", name="distinct_est"))
           .take_all()}
    # driver-side reference per group
    langs = np.asarray(tbl.column("lang"))
    for lang in ["en", "de", "fr"]:
        ref = HyperLogLog(p=12)
        ref.update_batch(prepare_hash(
            tbl.column("token").combine_chunks().filter(pa.array(langs == lang))))
        assert out[lang] == pytest.approx(float(ref.estimate()), abs=0), \
            (lang, parts)   # register-max is fully order-invariant


def test_global_aggregate_and_bytes_roundtrip(ray_session):
    import ray
    tbl = _fixture()
    ds = ray.data.from_arrow(tbl).repartition(6)
    row = ds.aggregate(sketch_agg(lambda: HyperLogLog(p=12), on="token",
                                  name="hll_blob"))
    sk = MergeableSketch.from_bytes(row["hll_blob"])
    ref = HyperLogLog(p=12)
    ref.update_batch(prepare_hash(tbl.column("token").combine_chunks()))
    assert float(sk.estimate()) == float(ref.estimate())
    exact = len(set(tbl.column("token").to_pylist()))
    assert abs(sk.estimate() - exact) <= 5 * 1.04 / np.sqrt(2 ** 12) * exact


def test_countmin_weighted_within_bound(ray_session):
    import ray
    tbl = _fixture()
    w = pa.array(np.arange(tbl.num_rows, dtype=np.int64) % 3 + 1)
    tbl = tbl.append_column("w", w)
    ds = ray.data.from_arrow(tbl).repartition(5)
    row = ds.aggregate(sketch_agg(lambda: CountMin(width=2048, depth=5),
                                  on="token", weight_col="w",
                                  name="cm_blob"))
    cm = MergeableSketch.from_bytes(row["cm_blob"])
    toks = tbl.column("token").to_pylist()
    wl = w.to_pylist()
    true = {}
    for t, ww in zip(toks, wl):
        true[t] = true.get(t, 0) + ww
    total = sum(true.values())
    keys = prepare_hash(pa.array(list(true)))
    est = cm.query_batch(keys)
    for i, t in enumerate(true):
        assert est[i] >= true[t]                      # never undercounts
        assert est[i] <= true[t] + 2 * np.e / 2048 * total * 5


def test_kll_quantiles_within_rank_bound(ray_session):
    import ray
    tbl = _fixture(n=20_000)
    ds = ray.data.from_arrow(tbl).repartition(8)
    row = ds.aggregate(sketch_agg(lambda: KLL(k=200), on="value",
                                  prepare="value", name="kll_blob"))
    kll = MergeableSketch.from_bytes(row["kll_blob"])
    vals = np.sort(np.asarray(tbl.column("value")))
    for q in [0.1, 0.5, 0.9]:
        got = kll.quantile(q)
        rank = np.searchsorted(vals, got) / len(vals)
        assert abs(rank - q) <= 3 * kll.error_bound()


def test_bloom_no_false_negatives(ray_session):
    import ray
    tbl = _fixture()
    ds = ray.data.from_arrow(tbl).repartition(4)
    row = ds.aggregate(sketch_agg(
        lambda: BlockedBloom(n_bits=1 << 16), on="token", name="bf"))
    bf = MergeableSketch.from_bytes(row["bf"])
    keys = prepare_hash(tbl.column("token").combine_chunks())
    assert bf.query_batch(keys).all()


def test_null_keys_dropped(ray_session):
    import ray
    tbl = pa.table({"g": pa.array(["a", "a", "b", "b"]),
                    "token": pa.array(["x", None, None, "y"])})
    ds = ray.data.from_arrow(tbl)
    out = {r["g"]: r["est"] for r in
           ds.groupby("g").aggregate(
               sketch_agg(lambda: HyperLogLog(p=10), on="token",
                          finalize="estimate", name="est")).take_all()}
    assert out["a"] == pytest.approx(1.0, rel=0.01)
    assert out["b"] == pytest.approx(1.0, rel=0.01)


def test_weighted_values_with_nans_stay_aligned(ray_session):
    """Review finding: a NaN in the value column desynchronized values
    from weights (prepare_value drops NaNs, the weight filter didn't)."""
    import ray
    from bqf_ray.sketches.tdigest import TDigest

    tbl = pa.table({"v": pa.array([1.0, float("nan"), 2.0, None, 3.0]),
                    "w": pa.array([2, 9, 3, 9, 1], pa.int64())})
    row = ray.data.from_arrow(tbl).aggregate(
        sketch_agg(lambda: TDigest(), on="v", prepare="value",
                   weight_col="w",
                   finalize=lambda sk: float(sk.quantile(0.5)),
                   name="p50"))
    # weighted stream = [1,1,2,2,2,3]; median (t-digest, tiny n) ≈ 2
    assert abs(row["p50"] - 2.0) < 0.75

    with pytest.raises(ValueError, match="weight_col requires"):
        sketch_agg(lambda: TDigest(), on="v", prepare=lambda c: c,
                   weight_col="w")
