"""cusum_changepoint brute-force and envelope tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl, parts=5):
    import ray
    return ray.data.from_arrow(tbl).repartition(parts)


def _brute(df, scale=100):
    """Reference CUSUM split per key: argmax_t |n*S_t - t*S_n|,
    t in [1, n-1], earliest tie, (ts, id) order, nulls dropped."""
    df = df[df["value"].notna()]
    out = []
    for k, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        v = np.floor(g["value"].to_numpy() * scale + 0.5).astype(np.int64)
        n = len(v)
        if n < 2:
            continue
        s = np.cumsum(v)
        t = np.arange(1, n + 1)
        d = np.abs(n * s - t * s[-1])[:-1]
        pos = int(np.argmax(d))  # earliest max
        out.append((k, n, int(s[-1]), pos + 1,
                    g["ts"].iloc[pos], int(d[pos])))
    return pd.DataFrame(out, columns=["user_id", "n", "total", "t_star",
                                      "ts_split", "d_max"])


def _frame(seed, n=800, keys=25, with_nulls=True):
    rng = np.random.default_rng(seed)
    ts = pd.to_datetime(rng.integers(0, 500, n), unit="s")
    val = rng.normal(5, 3, n).round(2)
    if with_nulls:
        val[rng.random(n) < 0.05] = np.nan
    # a single-event key and duplicate timestamps
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts,
        "user_id": np.r_[rng.integers(0, keys, n - 1), [9999]],
        "value": val})


@pytest.mark.parametrize("seed,parts", [(0, 3), (1, 7), (2, 1)])
def test_cusum_matches_brute(ray_session, seed, parts):
    from bqf_ray.pipelines.windowed import cusum_changepoint
    df = _frame(seed)
    got = (cusum_changepoint(_ds(pa.Table.from_pandas(df), parts))
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    exp = _brute(df).sort_values("user_id").reset_index(drop=True)
    got["ts_split"] = pd.to_datetime(got["ts_split"])
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp,
                                  check_dtype=False)


def test_cusum_constant_series_earliest_tie(ray_session):
    from bqf_ray.pipelines.windowed import cusum_changepoint
    # constant values => every interior D_t equals 0 => t_star = 1
    df = pd.DataFrame({
        "event_id": np.arange(6, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(6), unit="s"),
        "user_id": np.zeros(6, dtype=np.int64),
        "value": np.full(6, 2.5)})
    got = cusum_changepoint(_ds(pa.Table.from_pandas(df))).to_pandas()
    assert len(got) == 1
    assert got["t_star"].iloc[0] == 1 and got["d_max"].iloc[0] == 0


def test_cusum_planted_shift_found(ray_session):
    from bqf_ray.pipelines.windowed import cusum_changepoint
    # clean level shift at position 50 of 100
    v = np.r_[np.zeros(50), np.full(50, 10.0)]
    df = pd.DataFrame({
        "event_id": np.arange(100, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(100), unit="s"),
        "user_id": np.zeros(100, dtype=np.int64),
        "value": v})
    got = cusum_changepoint(_ds(pa.Table.from_pandas(df))).to_pandas()
    assert got["t_star"].iloc[0] == 50


def test_cusum_envelope_raises(ray_session):
    from bqf_ray.pipelines.windowed import cusum_changepoint
    df = _frame(3, n=50, keys=2, with_nulls=False)
    with pytest.raises(Exception, match="max_rows_per_key"):
        cusum_changepoint(_ds(pa.Table.from_pandas(df)),
                          max_rows_per_key=4).to_pandas()


# ---------------------------------------------------------------------------
# grouped_ks (shares the ordered-per-key exchange family)
# ---------------------------------------------------------------------------

def _ks_brute(da, db):
    """scipy-free exact two-sample KS per key over tie-inclusive CDFs."""
    out = {}
    keys = set(da["k"]) & set(db["k"])
    for k in keys:
        va = np.sort(da[da["k"] == k]["v"].to_numpy())
        vb = np.sort(db[db["k"] == k]["v"].to_numpy())
        na, nb = len(va), len(vb)
        pts = np.unique(np.r_[va, vb])
        ca = np.searchsorted(va, pts, side="right")
        cb = np.searchsorted(vb, pts, side="right")
        d = np.abs(ca * nb - cb * na).max()
        out[k] = (na, nb, int(d), d / (na * nb))
    return out


@pytest.mark.parametrize("seed,parts", [(0, 4), (3, 1)])
def test_grouped_ks_matches_brute(ray_session, seed, parts):
    import ray

    from bqf_ray.pipelines.aggregates import grouped_ks
    rng = np.random.default_rng(seed)
    na, nb = 700, 500
    da = pd.DataFrame({"k": rng.integers(0, 12, na),
                       "v": rng.normal(0, 1, na).round(1)})
    db = pd.DataFrame({"k": rng.integers(0, 15, nb),   # some keys b-only
                       "v": rng.normal(0.4, 1.3, nb).round(1)})
    da.loc[rng.random(na) < 0.04, "v"] = np.nan
    dsa = ray.data.from_arrow(pa.Table.from_pandas(da)).repartition(parts)
    dsb = ray.data.from_arrow(pa.Table.from_pandas(db)).repartition(parts)
    got = grouped_ks(dsa, dsb, "k", "v").to_pandas()
    exp = _ks_brute(da[da["v"].notna()], db)
    assert set(got["k"]) == set(exp)
    for _, r in got.iterrows():
        ena, enb, ed, eks = exp[r["k"]]
        assert (r["n_a"], r["n_b"], r["d_int"]) == (ena, enb, ed)
        assert r["ks_stat"] == pytest.approx(eks, abs=0, rel=0)


def test_grouped_ks_identical_distributions_zero(ray_session):
    import ray

    from bqf_ray.pipelines.aggregates import grouped_ks
    df = pd.DataFrame({"k": np.zeros(50, dtype=np.int64),
                       "v": np.tile(np.arange(10.0), 5)})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    got = grouped_ks(ds, ds, "k", "v").to_pandas()
    assert len(got) == 1 and got["d_int"].iloc[0] == 0


def test_grouped_ks_envelope_raises(ray_session):
    import ray

    from bqf_ray.pipelines.aggregates import grouped_ks
    df = pd.DataFrame({"k": np.zeros(40, dtype=np.int64),
                       "v": np.arange(40.0)})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    with pytest.raises(Exception, match="max_rows_per_key"):
        grouped_ks(ds, ds, "k", "v", max_rows_per_key=8).to_pandas()
