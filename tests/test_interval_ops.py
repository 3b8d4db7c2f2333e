"""interval_self_join / skyline / grouped_mode / lag_autocorr_components
against brute-force references on seeded random data."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl):
    import ray
    return ray.data.from_arrow(tbl)


# ---------------------------------------------------------------------------
# interval_self_join
# ---------------------------------------------------------------------------

def _brute_pairs(df, exclude_equal=None):
    out = []
    rows = list(df.itertuples(index=False))
    order = sorted(range(len(rows)), key=lambda i: (rows[i].s, rows[i].u))
    for a in range(len(order)):
        for b in range(a + 1, len(order)):
            i, j = order[a], order[b]
            ri, rj = rows[i], rows[j]
            if ri.s <= rj.e and rj.s <= ri.e:
                if exclude_equal and getattr(ri, exclude_equal) == \
                        getattr(rj, exclude_equal):
                    continue
                out.append((ri.u, ri.s, ri.e, rj.u, rj.s, rj.e))
    return sorted(out)


@pytest.mark.parametrize("width_s", [1, 7, 1000])
def test_interval_self_join_brute(ray_session, width_s):
    from bqf_ray.pipelines.relational import interval_self_join
    rng = np.random.default_rng(42)
    n = 300
    s = rng.integers(0, 200, n)
    ln = rng.integers(0, 30, n)
    u = rng.integers(0, 12, n)
    # make (s, u) unique: perturb duplicates deterministically
    df = pd.DataFrame({"s": s * 1_000_000, "e": (s + ln) * 1_000_000,
                       "u": u})
    df = df.groupby(["s", "u"], as_index=False).first()
    tbl = pa.table({"u": pa.array(df.u.to_numpy(), pa.int64()),
                    "s": pa.array(df.s.to_numpy(), pa.int64()),
                    "e": pa.array(df.e.to_numpy(), pa.int64())})
    got = interval_self_join(_ds(tbl), "s", "e", tie_col="u",
                             bucket_width_s=width_s,
                             exclude_equal="u").to_pandas()
    got_t = sorted(map(tuple, got[["a_u", "a_s", "a_e",
                                   "b_u", "b_s", "b_e"]].to_numpy()))
    assert got_t == _brute_pairs(df, exclude_equal="u")


def test_interval_self_join_end_before_start_raises(ray_session):
    from bqf_ray.pipelines.relational import interval_self_join
    tbl = pa.table({"u": pa.array([1], pa.int64()),
                    "s": pa.array([10_000_000], pa.int64()),
                    "e": pa.array([5_000_000], pa.int64())})
    with pytest.raises(Exception):
        interval_self_join(_ds(tbl), "s", "e", tie_col="u",
                           bucket_width_s=1).materialize()


def test_interval_self_join_equal_start_ties(ray_session):
    from bqf_ray.pipelines.relational import interval_self_join
    # three intervals, identical spans, distinct tie values -> 3 pairs,
    # roles ordered by tie
    tbl = pa.table({"u": pa.array([3, 1, 2], pa.int64()),
                    "s": pa.array([0, 0, 0], pa.int64()),
                    "e": pa.array([5_000_000] * 3, pa.int64())})
    got = interval_self_join(_ds(tbl), "s", "e", tie_col="u",
                             bucket_width_s=2).to_pandas()
    pairs = sorted(map(tuple, got[["a_u", "b_u"]].to_numpy()))
    assert pairs == [(1, 2), (1, 3), (2, 3)]


# ---------------------------------------------------------------------------
# skyline
# ---------------------------------------------------------------------------

def _brute_skyline(x, y, maxx, maxy):
    keep = []
    for i in range(len(x)):
        dom = False
        for j in range(len(x)):
            if i == j:
                continue
            bx = x[j] >= x[i] if maxx else x[j] <= x[i]
            by = y[j] >= y[i] if maxy else y[j] <= y[i]
            sx = x[j] != x[i]
            sy = y[j] != y[i]
            if bx and by and (sx or sy):
                dom = True
                break
        if not dom:
            keep.append(i)
    return set(keep)


@pytest.mark.parametrize("maxx,maxy", [(True, True), (True, False),
                                       (False, True), (False, False)])
def test_skyline_brute(ray_session, maxx, maxy):
    from bqf_ray.pipelines.aggregates import skyline
    rng = np.random.default_rng(7)
    n = 400
    x = rng.integers(0, 25, n).astype(np.float64)
    y = rng.integers(0, 25, n).astype(np.float64)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"id": pa.array(ids), "x": pa.array(x),
                    "y": pa.array(y)})
    got = skyline(_ds(tbl), "x", "y",
                  maximize=(maxx, maxy)).to_pandas()
    assert set(got["id"]) == _brute_skyline(x, y, maxx, maxy)


def test_skyline_nulls_excluded(ray_session):
    from bqf_ray.pipelines.aggregates import skyline
    tbl = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                    "x": pa.array([1.0, None, float("nan")]),
                    "y": pa.array([1.0, 2.0, 3.0])})
    got = skyline(_ds(tbl), "x", "y").to_pandas()
    assert list(got["id"]) == [1]


# ---------------------------------------------------------------------------
# grouped_mode
# ---------------------------------------------------------------------------

def test_grouped_mode_brute(ray_session):
    from bqf_ray.pipelines.aggregates import grouped_mode
    rng = np.random.default_rng(3)
    k = rng.integers(0, 40, 5000)
    v = rng.choice(list("abcde"), 5000)
    tbl = pa.table({"k": pa.array(k, pa.int64()),
                    "v": pa.array(v, pa.string())})
    got = grouped_mode(_ds(tbl), "k", "v").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    df = pd.DataFrame({"k": k, "v": v})
    c = df.groupby(["k", "v"]).size().reset_index(name="n")
    ref = c.sort_values(["k", "n", "v"],
                        ascending=[True, False, True]) \
        .groupby("k", as_index=False).first()
    assert list(got["k"]) == list(ref["k"])
    assert list(got["v"]) == list(ref["v"])
    assert list(got["n"]) == list(ref["n"])


# ---------------------------------------------------------------------------
# lag_autocorr_components
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("width_s,key_buckets", [(1, 2), (10, 64)])
def test_lag_autocorr_brute(ray_session, width_s, key_buckets):
    from bqf_ray.pipelines.windowed import lag_autocorr_components
    rng = np.random.default_rng(11)
    n = 2000
    ts = rng.integers(0, 50, n) * 1_000_000
    key = rng.choice(["a", "b", "c"], n)
    val = rng.uniform(0, 10, n)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({
        "event_id": pa.array(ids),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "event_type": pa.array(key, pa.string()),
        "value": pa.array(val)})
    got = lag_autocorr_components(
        _ds(tbl), bucket_width_s=width_s,
        key_buckets=key_buckets).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    df = pd.DataFrame({"k": key, "t": ts, "i": ids,
                       "v": np.floor(val * 100 + 0.5).astype(np.int64)})
    rows = []
    for g, sub in df.sort_values(["k", "t", "i"]).groupby("k"):
        v = sub["v"].to_numpy()
        x, y = v[:-1].astype(np.int64), v[1:].astype(np.int64)
        rows.append((g, len(x), x.sum(), y.sum(), (x * y).sum(),
                     (x * x).sum(), (y * y).sum()))
    ref = pd.DataFrame(rows, columns=["event_type", "n_pairs", "sx",
                                      "sy", "sxy", "sxx", "syy"])
    for c in ref.columns[1:]:
        assert list(got[c].astype("int64")) == list(ref[c]), c


def test_lag_autocorr_null_values_dropped(ray_session):
    from bqf_ray.pipelines.windowed import lag_autocorr_components
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array(np.array([1, 2, 3, 4],
                                dtype="datetime64[us]")),
        "event_type": pa.array(["a"] * 4, pa.string()),
        "value": pa.array([1.0, None, float("nan"), 2.0])})
    got = lag_autocorr_components(_ds(tbl)).to_pandas()
    assert list(got["n_pairs"]) == [1]
    assert list(got["sxy"]) == [100 * 200]


@pytest.mark.parametrize("window", [1, 3, 8])
def test_rolling_median_matches_pandas(ray_session, window):
    from bqf_ray.pipelines.windowed import rolling_median
    rng = np.random.default_rng(23)
    n = 3000
    k = rng.integers(0, 25, n)
    ts = rng.integers(0, 500, n).astype("datetime64[s]") \
        .astype("datetime64[us]")
    v = rng.integers(0, 50, n).astype(np.float64)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"k": pa.array(k, pa.int64()), "ts": pa.array(ts),
                    "i": pa.array(ids), "v": pa.array(v)})
    got = rolling_median(_ds(tbl), "k", "ts", "i", "v",
                         window=window).to_pandas() \
        .sort_values("i").reset_index(drop=True)
    df = pd.DataFrame({"k": k, "ts": ts, "i": ids, "v": v}) \
        .sort_values(["k", "ts", "i"]).reset_index(drop=True)

    def lower_med(arr):
        s = np.sort(np.asarray(arr))
        return s[int(np.ceil(0.5 * len(s))) - 1]

    meds = {}
    for _, sub in df.groupby("k"):
        vals = sub["v"].to_numpy()
        for p, (idx, _) in enumerate(sub.iterrows()):
            lo = max(0, p - window + 1)
            meds[sub["i"].iloc[p]] = lower_med(vals[lo:p + 1])
    assert [meds[i] for i in got["i"]] == got["med"].tolist()


def test_activity_islands_brute(ray_session):
    from bqf_ray.pipelines.windowed import activity_islands
    rng = np.random.default_rng(29)
    n = 4000
    k = rng.integers(0, 30, n)
    day = rng.integers(0, 40, n)
    ts = (day * 86_400_000_000).astype("datetime64[us]")
    tbl = pa.table({"user_id": pa.array(k, pa.int64()),
                    "ts": pa.array(ts)})
    got = activity_islands(_ds(tbl), "user_id", "ts") \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    ref = {}
    for key in np.unique(k):
        days = np.unique(day[k == key])
        runs = np.split(days, np.flatnonzero(np.diff(days) != 1) + 1)
        ref[key] = (len(days), len(runs), max(len(r) for r in runs))
    assert {r.user_id: (r.n_periods, r.n_islands, r.max_run)
            for r in got.itertuples()} == ref


def test_activity_islands_pre_epoch_floor(ray_session):
    """Pre-epoch timestamps floor toward -inf (date_trunc semantics):
    1969-12-31 12:00 is day -1, adjacent to day 0."""
    from bqf_ray.pipelines.windowed import activity_islands
    ts = np.array(["1969-12-31T12:00:00", "1970-01-01T01:00:00",
                   "1970-01-03T00:00:00"], dtype="datetime64[us]")
    tbl = pa.table({"user_id": pa.array([7, 7, 7], pa.int64()),
                    "ts": pa.array(ts)})
    got = activity_islands(_ds(tbl), "user_id", "ts").to_pandas()
    assert got.iloc[0].tolist() == [7, 3, 2, 2]  # days -1,0 | 2
