"""nearest_join vs a brute-force per-row argmin reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _tables(seed=3, nl=700, nr=500, keys=13):
    rng = np.random.default_rng(seed)
    base = np.int64(1_600_000_000_000_000)
    lt = pa.table({
        "k": pa.array(rng.integers(0, keys, nl), pa.int64()),
        "ts": pa.array((base + rng.integers(0, 10_000, nl) * 1_000_000)
                       .astype("datetime64[us]")),
        "lid": pa.array(np.arange(nl, dtype=np.int64))})
    # right side unique on (k, ts)
    rk = rng.integers(0, keys, nr)
    rt = base + rng.integers(0, 10_000, nr) * np.int64(1_000_000)
    seen = set()
    mask = []
    for k, t in zip(rk, rt):
        mask.append((k, t) not in seen)
        seen.add((k, t))
    mask = np.array(mask)
    rk, rt = rk[mask], rt[mask]
    rt_tbl = pa.table({
        "k": pa.array(rk, pa.int64()),
        "ts": pa.array(rt.astype("datetime64[us]")),
        "rid": pa.array(np.arange(len(rk), dtype=np.int64))})
    return lt, rt_tbl


@pytest.mark.parametrize("how", ["inner", "left"])
def test_nearest_join_bruteforce(ray_session, how):
    import ray

    from bqf_ray.pipelines.relational import nearest_join
    lt, rt = _tables()
    got = nearest_join(ray.data.from_arrow(lt).repartition(6),
                       ray.data.from_arrow(rt).repartition(4),
                       on="ts", by="k", how=how).to_pandas() \
        .sort_values("lid").reset_index(drop=True)
    ld, rd = lt.to_pandas(), rt.to_pandas()
    rows = []
    for _, l in ld.iterrows():
        cand = rd[rd["k"] == l["k"]]
        if len(cand) == 0:
            if how == "left":
                rows.append((l["k"], l["ts"], l["lid"], pd.NaT, np.nan))
            continue
        d = (cand["ts"] - l["ts"]).abs()
        # tie: past (r.ts <= l.ts) wins
        best = cand.assign(d=d, fut=(cand["ts"] > l["ts"]).astype(int)) \
            .sort_values(["d", "fut"]).iloc[0]
        rows.append((l["k"], l["ts"], l["lid"], best["ts"], best["rid"]))
    exp = pd.DataFrame(rows, columns=["k", "ts", "lid", "ts_r", "rid_r"])
    exp = exp.sort_values("lid").reset_index(drop=True)
    got["rid_r"] = got["rid_r"].astype("float64")
    exp["rid_r"] = exp["rid_r"].astype("float64")
    for c in ("ts", "ts_r"):
        got[c] = got[c].astype("datetime64[us]")
        exp[c] = exp[c].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, exp, check_exact=True)


def test_nearest_join_equidistant_past_wins(ray_session):
    import ray

    from bqf_ray.pipelines.relational import nearest_join
    t0 = np.int64(1_000_000_000_000_000)
    lt = pa.table({"k": pa.array([1], pa.int64()),
                   "ts": pa.array(np.array([t0], dtype=np.int64)
                                  .astype("datetime64[us]")),
                   "lid": pa.array([0], pa.int64())})
    rt = pa.table({"k": pa.array([1, 1], pa.int64()),
                   "ts": pa.array(np.array([t0 - 5_000_000,
                                            t0 + 5_000_000],
                                           dtype=np.int64)
                                  .astype("datetime64[us]")),
                   "rid": pa.array([100, 200], pa.int64())})
    out = nearest_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                       on="ts", by="k").to_pandas()
    assert list(out["rid_r"]) == [100]
