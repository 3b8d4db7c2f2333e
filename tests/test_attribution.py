"""last_touch_attribution / daily_anomaly brute-force and edge tests
(the session-3e operator batch)."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl, parts=5):
    import ray
    return ray.data.from_arrow(tbl).repartition(parts)


# ---------------------------------------------------------------------------
# last_touch_attribution
# ---------------------------------------------------------------------------

def _brute_last_touch(rows, conv, touches, window):
    """rows: (id, key, ts, type).  Returns {conv_id: touch_id|None}."""
    out = {}
    for i, k, t, ty in rows:
        if ty != conv:
            continue
        best = None
        for j, k2, t2, ty2 in rows:
            if k2 != k or ty2 not in touches or not t2 < t:
                continue
            if window is not None and t2 < t - window:
                continue
            if best is None or (t2, j) > best:
                best = (t2, j)
        out[i] = None if best is None else best[1]
    return out


def _events(seed, n=400, nk=8, nt=50):
    rng = np.random.default_rng(seed)
    types = np.array(["purchase", "click", "view", "error"])
    ty = types[rng.integers(0, 4, n)]
    return list(zip(range(n),
                    rng.integers(0, nk, n).tolist(),
                    rng.integers(0, nt, n).tolist(),
                    ty.tolist()))


def _totbl(rows):
    i, k, t, ty = zip(*rows)
    return pa.table({
        "event_id": pa.array(list(i), pa.int64()),
        "user_id": pa.array(list(k), pa.int64()),
        "ts": pa.array(np.asarray(t, dtype="datetime64[us]"),
                       pa.timestamp("us")),
        "event_type": pa.array(list(ty), pa.string())})


@pytest.mark.parametrize("seed,window", [(0, None), (1, None),
                                         (2, 10), (3, 10)])
def test_last_touch_matches_brute(ray_session, seed, window):
    from bqf_ray.pipelines.windowed import last_touch_attribution
    rows = _events(seed)
    got = last_touch_attribution(
        _ds(_totbl(rows)), "user_id", "ts", "event_id", "event_type",
        "purchase", ["click", "view"], window_us=window).to_pandas()
    want = _brute_last_touch(rows, "purchase", {"click", "view"},
                             window)
    got_map = {int(r.conversion_id):
               (None if r.touch_id is None or np.isnan(r.touch_id)
                else int(r.touch_id))
               for r in got.itertuples()}
    assert got_map == want
    assert len(got) == len(want)


def test_last_touch_strictly_before_and_ties(ray_session):
    from bqf_ray.pipelines.windowed import last_touch_attribution
    # touch at the SAME ts as the purchase must not attribute;
    # two touches at the same earlier ts pick the larger event_id
    rows = [(0, 1, 100, "purchase"),
            (1, 1, 100, "click"),     # equal ts -> excluded
            (2, 1, 50, "view"),
            (3, 1, 50, "click"),      # tie at 50 -> id 3 wins
            (4, 2, 10, "purchase")]   # no touch -> NULLs
    got = last_touch_attribution(
        _ds(_totbl(rows), parts=2), "user_id", "ts", "event_id",
        "event_type", "purchase", ["click", "view"]).to_pandas()
    got = got.set_index("conversion_id")
    assert int(got.loc[0, "touch_id"]) == 3
    assert got.loc[0, "touch_type"] == "click"
    assert got.loc[4, ["touch_id", "touch_type", "touch_ts"]].isna().all()


def test_last_touch_window_excludes_stale(ray_session):
    from bqf_ray.pipelines.windowed import last_touch_attribution
    # touch exactly AT the window edge is included (>=), older is not
    rows = [(0, 1, 1000, "purchase"),
            (1, 1, 900, "click"),
            (2, 1, 899, "view")]
    got = last_touch_attribution(
        _ds(_totbl(rows), parts=2), "user_id", "ts", "event_id",
        "event_type", "purchase", ["click", "view"],
        window_us=100).to_pandas()
    assert int(got.loc[0, "touch_id"]) == 1
    got2 = last_touch_attribution(
        _ds(_totbl(rows), parts=2), "user_id", "ts", "event_id",
        "event_type", "purchase", ["click", "view"],
        window_us=99).to_pandas()
    assert got2.loc[0, "touch_id"] is None or \
        np.isnan(got2.loc[0, "touch_id"])


def test_last_touch_rejects_conv_in_touches(ray_session):
    from bqf_ray.pipelines.windowed import last_touch_attribution
    with pytest.raises(ValueError):
        last_touch_attribution(None, "k", "t", "i", "ty", "click",
                               ["click"])


# ---------------------------------------------------------------------------
# daily_anomaly
# ---------------------------------------------------------------------------

def test_daily_anomaly_matches_brute(ray_session):
    from bqf_ray.pipelines.aggregates import daily_anomaly
    rng = np.random.default_rng(7)
    n, nk = 2000, 12
    k = rng.integers(0, nk, n).astype(np.int64)
    day = rng.integers(0, 15, n).astype(np.int64)
    ts = day * 86_400_000_000 + rng.integers(0, 86_400_000_000, n)
    tbl = pa.table({"user_id": pa.array(k),
                    "ts": pa.array(ts.astype("datetime64[us]"),
                                   pa.timestamp("us"))})
    got = daily_anomaly(_ds(tbl), "user_id", "ts",
                        z_thresh=1.5).to_pandas()
    # brute per (key, day) counts + population z
    import collections
    cnt = collections.Counter(zip(k.tolist(), day.tolist()))
    bykey = collections.defaultdict(list)
    for (kk, dd), c in cnt.items():
        bykey[kk].append(c)
    assert len(got) == len(cnt)
    for r in got.itertuples():
        cs = bykey[int(r.user_id)]
        nn, s, q = len(cs), sum(cs), sum(c * c for c in cs)
        assert (r.n_days, r.s, r.q) == (nn, s, q)
        rad = nn * q - s * s
        if rad <= 0:
            assert r.z is None or np.isnan(r.z)
        else:
            want = (nn * r.cnt - s) / np.sqrt(float(rad))
            assert r.z == want            # bit-exact single division
            assert r.is_anomaly == (abs(want) > 1.5)


def test_daily_anomaly_constant_key_null_z(ray_session):
    from bqf_ray.pipelines.aggregates import daily_anomaly
    # one event per day -> all counts equal -> rad == 0 -> NULL z
    ts = np.arange(5, dtype=np.int64) * 86_400_000_000
    tbl = pa.table({"user_id": pa.array([3] * 5, pa.int64()),
                    "ts": pa.array(ts.astype("datetime64[us]"),
                                   pa.timestamp("us"))})
    got = daily_anomaly(_ds(tbl, parts=2), "user_id", "ts").to_pandas()
    assert len(got) == 5
    assert got["z"].isna().all() and got["is_anomaly"].isna().all()
    assert (got["cnt"] == 1).all() and (got["n_days"] == 5).all()


def test_daily_anomaly_rejects_null_key(ray_session):
    import ray
    from bqf_ray.pipelines.aggregates import daily_anomaly
    tbl = pa.table({"user_id": pa.array([1, None], pa.int64()),
                    "ts": pa.array([0, 0], pa.timestamp("us"))})
    with pytest.raises(Exception):
        daily_anomaly(ray.data.from_arrow(tbl), "user_id",
                      "ts").materialize()
