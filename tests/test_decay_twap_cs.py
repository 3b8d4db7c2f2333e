"""interval_coalesce / time_weighted_avg / decayed_sum / CountSketch
brute-force and property tests (the session-3d operator batch)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl, parts=5):
    import ray
    return ray.data.from_arrow(tbl).repartition(parts)


# ---------------------------------------------------------------------------
# interval_coalesce
# ---------------------------------------------------------------------------

def _brute_coalesce(rows):
    """rows: (key, lo, hi) — merge overlapping-or-touching per key."""
    out = []
    bykey = {}
    for k, lo, hi in rows:
        bykey.setdefault(k, []).append((lo, hi))
    for k, ivs in bykey.items():
        ivs.sort()
        cur_lo, cur_hi, n = ivs[0][0], ivs[0][1], 1
        for lo, hi in ivs[1:]:
            if lo <= cur_hi:
                cur_hi = max(cur_hi, hi)
                n += 1
            else:
                out.append((k, cur_lo, cur_hi, n))
                cur_lo, cur_hi, n = lo, hi, 1
        out.append((k, cur_lo, cur_hi, n))
    return sorted(out)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_interval_coalesce_matches_brute(ray_session, seed):
    from bqf_ray.pipelines.windowed import interval_coalesce
    rng = np.random.default_rng(seed)
    n = 600
    k = rng.integers(0, 20, n)
    lo = rng.integers(0, 500, n).astype(np.int64)
    hi = lo + rng.integers(0, 40, n)
    tbl = pa.table({"k": pa.array(k.astype(np.int64)),
                    "lo": pa.array(lo), "hi": pa.array(hi)})
    got = interval_coalesce(_ds(tbl), "k", "lo", "hi").to_pandas()
    got_rows = sorted(zip(got["k"], got["span_start"], got["span_end"],
                          got["n"]))
    want = _brute_coalesce(list(zip(k.tolist(), lo.tolist(),
                                    hi.tolist())))
    assert got_rows == want


def test_interval_coalesce_touching_merges(ray_session):
    from bqf_ray.pipelines.windowed import interval_coalesce
    tbl = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                    "lo": pa.array([0, 10, 21], pa.int64()),
                    "hi": pa.array([10, 20, 30], pa.int64())})
    got = interval_coalesce(_ds(tbl, 2), "k", "lo", "hi").to_pandas()
    got = got.sort_values("span_start").reset_index(drop=True)
    assert list(got["span_start"]) == [0, 21]
    assert list(got["span_end"]) == [20, 30]
    assert list(got["n"]) == [2, 1]


def test_interval_coalesce_timestamps_and_errors(ray_session):
    from bqf_ray.pipelines.windowed import interval_coalesce
    ts = pa.array(np.array([0, 1000], dtype="datetime64[us]"),
                  pa.timestamp("us"))
    te = pa.array(np.array([500, 2000], dtype="datetime64[us]"),
                  pa.timestamp("us"))
    tbl = pa.table({"k": pa.array([7, 7], pa.int64()),
                    "lo": ts, "hi": te})
    got = interval_coalesce(_ds(tbl, 1), "k", "lo", "hi").to_pandas()
    assert got["span_start"].dtype.kind == "M" and len(got) == 2
    bad = pa.table({"k": pa.array([1], pa.int64()),
                    "lo": pa.array([5], pa.int64()),
                    "hi": pa.array([3], pa.int64())})
    with pytest.raises(Exception, match="hi < lo"):
        interval_coalesce(_ds(bad, 1), "k", "lo", "hi").materialize()


# ---------------------------------------------------------------------------
# time_weighted_avg
# ---------------------------------------------------------------------------

def test_time_weighted_avg_matches_pandas(ray_session):
    from bqf_ray.pipelines.windowed import time_weighted_avg
    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 37, n),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "value": np.where(rng.random(n) < 0.1, np.nan,
                          rng.random(n) * 500)})
    got = (time_weighted_avg(
        _ds(pa.Table.from_pandas(df, preserve_index=False), 7),
        "user_id", "ts", "event_id", "value").to_pandas()
        .sort_values("user_id").reset_index(drop=True))
    s = df.sort_values(["user_id", "ts", "event_id"])
    vc = np.floor(np.nan_to_num(s["value"].to_numpy()) * 100 + 0.5
                  ).astype(np.int64)
    t = s["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    u = s["user_id"].to_numpy()
    rows = {}
    for j in range(len(s)):
        rows.setdefault(u[j], []).append((t[j], vc[j]))
    recs = []
    for k, evs in sorted(rows.items()):
        num = sum(v * (evs[i + 1][0] - evs[i][0])
                  for i, (_, v) in enumerate(evs[:-1]))
        den = evs[-1][0] - evs[0][0]
        recs.append((k, num, den,
                     num / den if den > 0 else None))
    want = pd.DataFrame(recs, columns=["user_id", "num", "den", "twa"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_time_weighted_avg_single_event_and_ties(ray_session):
    from bqf_ray.pipelines.windowed import time_weighted_avg
    df = pd.DataFrame({
        "user_id": [1, 2, 2, 2],
        "event_id": [10, 20, 21, 22],
        "ts": pd.to_datetime([100, 200, 200, 300], unit="s"),
        "value": [5.0, 1.0, 3.0, 9.0]})
    got = (time_weighted_avg(
        _ds(pa.Table.from_pandas(df, preserve_index=False), 2),
        "user_id", "ts", "event_id", "value").to_pandas()
        .sort_values("user_id").reset_index(drop=True))
    assert got.loc[0, "den"] == 0 and pd.isna(got.loc[0, "twa"])
    # ties order by event_id: 100*0us + 300*100s + 900*0
    assert got.loc[1, "num"] == 300 * 100_000_000
    assert got.loc[1, "den"] == 100_000_000
    assert got.loc[1, "twa"] == 300.0


# ---------------------------------------------------------------------------
# decayed_sum
# ---------------------------------------------------------------------------

def test_decayed_sum_matches_brute(ray_session):
    from bqf_ray.pipelines.aggregates import decayed_sum
    rng = np.random.default_rng(11)
    n = 2000
    day = 86400
    df = pd.DataFrame({
        "user_id": rng.integers(0, 29, n),
        "ts": pd.to_datetime(rng.integers(0, 40 * day, n), unit="s"),
        "value": np.where(rng.random(n) < 0.1, np.nan,
                          rng.random(n) * 300)})
    got = (decayed_sum(
        _ds(pa.Table.from_pandas(df, preserve_index=False), 6),
        "user_id", "ts", "value", k_max=20).to_pandas()
        .sort_values("user_id").reset_index(drop=True))
    t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    dayno = t // (day * 10**6)
    age = dayno.max() - dayno
    vc = np.floor(np.nan_to_num(df["value"].to_numpy()) * 100 + 0.5
                  ).astype(np.int64)
    w = np.where(age <= 20, np.int64(1) << np.minimum(20 - age, 62),
                 np.int64(0))
    want = (pd.DataFrame({"user_id": df["user_id"],
                          "decayed": vc * w})
            .groupby("user_id", as_index=False)["decayed"].sum()
            .sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_decayed_sum_overflow_raises(ray_session):
    from bqf_ray.pipelines.aggregates import decayed_sum
    df = pd.DataFrame({
        "user_id": [1] * 4,
        "ts": pd.to_datetime([0] * 4, unit="s"),
        "value": [4e16] * 4})
    with pytest.raises(Exception, match="envelope"):
        decayed_sum(_ds(pa.Table.from_pandas(df, preserve_index=False),
                        1),
                    "user_id", "ts", "value", k_max=20).materialize()


# ---------------------------------------------------------------------------
# CountSketch
# ---------------------------------------------------------------------------

def test_countsketch_bound_and_merge_bit_identity():
    from bqf_ray.functions.hashing import fmix64
    from bqf_ray.sketches.countsketch import CountSketch
    rng = np.random.default_rng(3)
    # Zipf-ish stream over 5000 keys
    keys = rng.zipf(1.3, 60000)
    keys = keys[keys < 5000].astype(np.int64)
    hashed = fmix64(keys.view(np.uint64))
    one = CountSketch(width=4096, depth=7, seed=29)
    one.update_batch(hashed)
    # merge tree over 8 random partitions must be BIT-identical
    parts = np.array_split(hashed, 8)
    sketches = []
    for p in parts:
        s = CountSketch(width=4096, depth=7, seed=29)
        s.update_batch(p)
        sketches.append(s)
    while len(sketches) > 1:
        sketches = [sketches[i].merge(sketches[i + 1])
                    if i + 1 < len(sketches) else sketches[i]
                    for i in range(0, len(sketches), 2)]
    assert np.array_equal(one.table, sketches[0].table)
    # bound: |est - true| <= 4*sqrt(F2/w) for >= 99% of distinct keys
    uk, cnt = np.unique(keys, return_counts=True)
    f2 = float((cnt.astype(np.float64) ** 2).sum())
    est = one.query_batch(fmix64(uk.view(np.uint64)))
    bound = 4.0 * one.error_std(f2)
    frac = float((np.abs(est - cnt) <= bound).mean())
    assert frac >= 0.99


def test_countsketch_serde_and_even_depth_raises():
    from bqf_ray.sketches.countsketch import CountSketch
    s = CountSketch(width=128, depth=3, seed=1)
    s.update_batch(np.arange(50, dtype=np.uint64), 
                   np.arange(50, dtype=np.int64))
    t = CountSketch.from_bytes(s.to_bytes())
    assert np.array_equal(s.table, t.table) and s.total == t.total
    with pytest.raises(ValueError):
        CountSketch(width=16, depth=4)


def test_cs_heavy_counts_flags_true(ray_session):
    import ray
    from bqf_ray.pipelines.aggregates import cs_heavy_counts
    rng = np.random.default_rng(8)
    keys = np.concatenate([rng.integers(0, 2000, 20000),
                           np.full(3000, 42), np.full(2500, 7)])
    ds = ray.data.from_arrow(pa.table({
        "u": pa.array(keys.astype(np.int64))})).repartition(6)
    out = cs_heavy_counts(ds, "u", m=128, width=8192, depth=7, seed=29)
    n = len(keys)
    exact = pd.Series(keys).value_counts()
    heavy = exact[exact > n / 129.0]
    assert set(out["u"]) == set(heavy.index)
    assert out["within_bound"].all()
    got_counts = dict(zip(out["u"], out["cnt"]))
    assert got_counts[42] == int(exact[42])
    assert got_counts[7] == int(exact[7])
