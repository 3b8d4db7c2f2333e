"""grouped_ntile SQL tile semantics; grouped_kendall vs scipy-free brute
force; resample_locf vs a per-key pandas LOCF reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events(n=4000, keys=23, seed=5, dup_ts=True):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, keys, n)
    base = np.int64(1_700_000_000_000_000)
    t = base + rng.integers(0, 500_000, n) * np.int64(1_000_000)
    if dup_ts:                        # force equal-ts ties
        t[::7] = t[3::7][: len(t[::7])] if len(t[3::7]) >= len(t[::7]) \
            else t[::7]
    v = rng.normal(50, 20, n).round(2)
    return pa.table({
        "user_id": pa.array(u, pa.int64()),
        "ts": pa.array(t.astype("datetime64[us]")),
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "value": pa.array(v, pa.float64())})


@pytest.mark.parametrize("k", [1, 3, 7])
def test_grouped_ntile_sql_semantics(ray_session, k):
    import duckdb
    import ray

    from bqf_ray.pipelines.ranking import grouped_ntile
    tbl = _events()
    got = grouped_ntile(ray.data.from_arrow(tbl).repartition(6),
                        "user_id", "ts", "event_id", k).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("e", tbl)
    exp = con.execute(f"""
        SELECT event_id, NTILE({k}) OVER (PARTITION BY user_id
            ORDER BY ts, event_id)::BIGINT AS tile
        FROM e ORDER BY event_id""").fetch_df()
    pd.testing.assert_frame_equal(got, exp, check_exact=True)


def test_grouped_kendall_bruteforce(ray_session):
    import ray

    from bqf_ray.pipelines.aggregates import grouped_kendall
    tbl = _events(n=800, keys=9)
    # knock some rows to null / nan
    v = tbl.column("value").to_numpy(zero_copy_only=False).copy()
    v[::53] = np.nan
    tbl = tbl.set_column(3, "value", pa.array(v, pa.float64()))
    got = grouped_kendall(ray.data.from_arrow(tbl).repartition(5),
                          "user_id", "ts", "value").to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    df = tbl.to_pandas().dropna(subset=["value", "ts"])
    rows = []
    for uid, g in df.groupby("user_id"):
        x = g["ts"].astype("int64").to_numpy()
        y = g["value"].to_numpy()
        n = len(g)
        dx = np.sign(x[None, :] - x[:, None])
        dy = np.sign(y[None, :] - y[:, None])
        iu = np.triu_indices(n, 1)
        s = int((dx[iu] * dy[iu]).sum())
        n1 = int((dx[iu] == 0).sum())
        n2 = int((dy[iu] == 0).sum())
        npair = n * (n - 1) // 2
        if n >= 2 and npair > n1 and npair > n2:
            tau = np.float64(s) / (np.sqrt(np.float64(npair - n1))
                                   * np.sqrt(np.float64(npair - n2)))
        else:
            tau = np.nan
        rows.append((uid, n, s, tau))
    exp = pd.DataFrame(rows, columns=["user_id", "n", "s", "tau"]) \
        .sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_exact=True)


def test_grouped_kendall_envelope_raise(ray_session):
    import ray

    from bqf_ray.pipelines.aggregates import grouped_kendall
    tbl = _events(n=300, keys=1)
    with pytest.raises(Exception, match="max_group_rows"):
        grouped_kendall(ray.data.from_arrow(tbl), "user_id", "ts",
                        "value", max_group_rows=100).take_all()


@pytest.mark.parametrize("step_s", [1, 97, 50_000])
def test_resample_locf_reference(ray_session, step_s):
    import ray

    from bqf_ray.pipelines.windowed import resample_locf
    tbl = _events(n=1500, keys=11)
    got = resample_locf(ray.data.from_arrow(tbl).repartition(7),
                        step_s).to_pandas() \
        .sort_values(["user_id", "grid_ts"]).reset_index(drop=True)
    df = tbl.to_pandas()
    step = step_s * 1_000_000
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        tu = g["ts"].astype("int64").to_numpy()
        vv = g["value"].to_numpy()
        gf = -(-tu.min() // step) * step
        gl = (tu.max() // step) * step
        for gt in range(gf, gl + 1, step):
            sel = tu <= gt
            rows.append((uid, gt, vv[np.flatnonzero(sel)[-1]]))
    exp = pd.DataFrame(rows, columns=["user_id", "grid_ts", "value"])
    exp["grid_ts"] = exp["grid_ts"].astype("datetime64[us]")
    exp = exp.sort_values(["user_id", "grid_ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_exact=True)


def test_resample_locf_equal_ts_max_id_wins(ray_session):
    import ray

    from bqf_ray.pipelines.windowed import resample_locf
    t0 = np.int64(1_000_000_000_000_000)
    tbl = pa.table({
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array(np.array([t0, t0, t0 + 2_000_000],
                                dtype=np.int64).astype("datetime64[us]")),
        "event_id": pa.array([10, 11, 12], pa.int64()),
        "value": pa.array([5.0, 7.0, 9.0], pa.float64())})
    out = resample_locf(ray.data.from_arrow(tbl), 1).to_pandas() \
        .sort_values("grid_ts").reset_index(drop=True)
    assert list(out["value"]) == [7.0, 7.0, 9.0]   # max id at t0 wins


def test_resample_interp_matches_brute_force(ray_session):
    import pandas as pd
    import ray

    from bqf_ray.pipelines.windowed import resample_interp
    rng = np.random.RandomState(2)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.randint(0, 30, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": (np.int64(1_700_000_000_000_000)
               + rng.randint(0, 8 * 86_400_000_000, n)
               ).astype("datetime64[us]"),
        "value": np.round(rng.gamma(2, 20, n), 2)})
    # duplicate-ts rows exercise the max-id collapse
    dup = df.iloc[:50].copy()
    dup["event_id"] += n
    dup["value"] += 1.0
    df = pd.concat([df, dup], ignore_index=True)
    STEP = 21_600 * 1_000_000
    got = (resample_interp(ray.data.from_pandas(df).repartition(6), 21_600)
           .to_pandas().sort_values(["user_id", "grid_ts"])
           .reset_index(drop=True))
    rows = []
    for uid, g in df.groupby("user_id"):
        g = (g.sort_values(["ts", "event_id"])
             .drop_duplicates("ts", keep="last"))
        t = g["ts"].astype("int64").to_numpy()
        v = g["value"].to_numpy()
        lo, hi = -(-t.min() // STEP) * STEP, (t.max() // STEP) * STEP
        for gt in range(lo, hi + 1, STEP):
            j = np.searchsorted(t, gt, side="right") - 1
            if t[j] == gt:
                val = v[j]
            else:
                k = np.searchsorted(t, gt, side="left")
                ratio = np.float64(gt - t[j]) / (t[k] - t[j])
                val = v[j] + (v[k] - v[j]) * ratio
            rows.append((uid, gt, val))
    ref = pd.DataFrame(rows, columns=["user_id", "grid_ts", "value"])
    ref["grid_ts"] = ref["grid_ts"].astype("datetime64[us]")
    ref = (ref.sort_values(["user_id", "grid_ts"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, ref, check_exact=True)


def test_linear_attribution_matches_brute_force(ray_session):
    import pandas as pd
    import ray

    from bqf_ray.pipelines.windowed import linear_attribution
    rng = np.random.RandomState(9)
    n = 5000
    df = pd.DataFrame({
        "user_id": rng.randint(0, 40, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": (np.int64(1_700_000_000_000_000)
               + rng.randint(0, 10 * 86_400_000_000, n)
               ).astype("datetime64[us]"),
        "event_type": rng.choice(["click", "purchase", "view"], n,
                                 p=[0.5, 0.2, 0.3]),
        "value": np.round(rng.gamma(2, 20, n), 2)})
    W = 2 * 86400
    got = (linear_attribution(ray.data.from_pandas(df).repartition(6), W)
           .to_pandas()
           .sort_values(["conversion_id", "touch_id"])
           .reset_index(drop=True))
    tus = df["ts"].astype("int64")
    exp = []
    for _, p in df[df["event_type"] == "purchase"].iterrows():
        tp = int(tus[_])
        m = ((df["event_type"] == "click")
             & (df["user_id"] == p["user_id"])
             & (tus >= tp - W * 1_000_000) & (tus < tp))
        nw = int(m.sum())
        if nw == 0:
            continue
        cents = int(np.rint(p["value"] * 100))
        for cid in df.loc[m, "event_id"]:
            exp.append((p["user_id"], cid, p["event_id"], nw,
                        np.float64(cents) / nw))
    ref = (pd.DataFrame(exp, columns=["user_id", "touch_id",
                                      "conversion_id",
                                      "n_window_touches", "credit"])
           .sort_values(["conversion_id", "touch_id"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, ref, check_exact=True)


def test_grouped_kendall_binned_bound_holds(ray_session):
    """Quantized tau is within its emitted error bound of the exact
    tau on every key (random data, ties included)."""
    import pandas as pd
    import ray

    from bqf_ray.pipelines.aggregates import (grouped_kendall,
                                              grouped_kendall_binned)
    rng = np.random.RandomState(2)
    n = 6000
    df = pd.DataFrame({
        "k": rng.randint(0, 6, n),
        "x": rng.randint(0, 50, n).astype(np.float64),
        "y": rng.randn(n)})
    ds = ray.data.from_pandas(df).repartition(5)
    exact = grouped_kendall(ds, "k", "x", "y").to_pandas() \
        .set_index("k").sort_index()
    ds2 = ray.data.from_pandas(df).repartition(5)
    binned = grouped_kendall_binned(ds2, "k", "x", "y", bins=32) \
        .to_pandas().set_index("k").sort_index()
    assert list(exact.index) == list(binned.index)
    assert (binned["n"] == exact["n"]).all()
    gap = (binned["tau"] - exact["tau"]).abs()
    assert (gap <= binned["tau_err_bound"] + 1e-12).all()
    # binning at B=32 on 50 distinct x values loses little: sanity
    assert gap.max() < 0.2


def test_grouped_kendall_binned_constant_side(ray_session):
    import pandas as pd
    import ray

    from bqf_ray.pipelines.aggregates import grouped_kendall_binned
    df = pd.DataFrame({"k": [1, 1, 1, 2, 2],
                       "x": [3.0, 3.0, 3.0, 1.0, 2.0],
                       "y": [1.0, 2.0, 3.0, 4.0, 5.0]})
    out = grouped_kendall_binned(ray.data.from_pandas(df), "k", "x", "y",
                                 bins=8).to_pandas().set_index("k")
    assert np.isnan(out.loc[1, "tau"])          # constant x → all tied
    assert out.loc[2, "tau"] == 1.0
