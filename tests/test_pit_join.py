"""pit_join: point-in-time enrichment with expiring validity."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from bqf_ray.pipelines.relational import pit_join

T0 = np.datetime64("2024-01-01T00:00:00", "us")


def _ts(secs):
    return pa.array((T0 + np.asarray(secs, dtype=np.int64) * 1_000_000)
                    .astype("datetime64[us]"), pa.timestamp("us"))


def _ref(facts, dim, how):
    """Brute force: latest valid_from <= ts (ties: max tie id), then
    expiry check."""
    rows = []
    for f in facts.itertuples():
        cands = [d for d in dim.itertuples()
                 if d.k == f.k and d.vf <= f.ts]
        val = None
        if cands:
            best = max(cands, key=lambda d: (d.vf, d.tid))
            if pd.isna(best.vt) or f.ts < best.vt:
                val = best.attr
        if val is None and how == "inner":
            continue
        rows.append((f.fid, f.k, f.ts, val))
    return sorted(rows, key=lambda r: r[0])


@pytest.mark.parametrize("how", ["left", "inner"])
@pytest.mark.parametrize("seed", [0, 1])
def test_pit_join_matches_brute_force(ray_session, how, seed):
    import ray
    rng = np.random.RandomState(seed)
    nf, nd, nk = 300, 120, 12
    facts = pd.DataFrame({
        "fid": np.arange(nf, dtype=np.int64),
        "k": rng.randint(0, nk, nf).astype(np.int64),
        "ts": rng.randint(0, 1000, nf).astype(np.int64)})
    vf = rng.randint(0, 1000, nd).astype(np.int64)
    ttl = rng.randint(1, 200, nd).astype(np.int64)
    open_end = rng.rand(nd) < 0.25
    dim = pd.DataFrame({
        "tid": np.arange(nd, dtype=np.int64),
        "k": rng.randint(0, nk, nd).astype(np.int64),
        "vf": vf, "vt": np.where(open_end, np.nan, vf + ttl),
        "attr": rng.randint(100, 999, nd).astype(np.int64)})
    want = _ref(facts, dim, how)

    f_tbl = pa.table({"fid": pa.array(facts.fid), "k": pa.array(facts.k),
                      "ts": _ts(facts.ts)})
    vt_mask = dim.vt.isna().to_numpy()
    d_tbl = pa.table({
        "k": pa.array(dim.k), "tid": pa.array(dim.tid),
        "valid_from": _ts(dim.vf),
        "valid_to": pa.array(
            (T0 + np.where(vt_mask, 0, dim.vt.fillna(0).to_numpy())
             .astype(np.int64) * 1_000_000).astype("datetime64[us]"),
            pa.timestamp("us"), mask=vt_mask),
        "attr": pa.array(dim.attr)})
    got = pit_join(ray.data.from_arrow(f_tbl).repartition(5),
                   ray.data.from_arrow(d_tbl).repartition(3),
                   by="k", ts_col="ts", tie_col="tid", how=how,
                   num_buckets=5).to_pandas()
    got = got.sort_values("fid").reset_index(drop=True)
    have = [(int(r.fid), int(r.k), r.ts.to_datetime64(),
             None if pd.isna(r.attr_dim) else int(r.attr_dim))
            for r in got.itertuples()]
    want_t = [(fid, k, (T0 + ts * 1_000_000), val)
              for fid, k, ts, val in want]
    assert have == want_t


def test_pit_join_expired_does_not_fall_back(ray_session):
    import ray
    # two versions: v1 [0, 100) and v2 [50, 60). fact at ts=70:
    # latest-start winner v2 is expired -> NULL (no fallback to v1)
    f = pa.table({"fid": pa.array([1], pa.int64()),
                  "k": pa.array([7], pa.int64()), "ts": _ts([70])})
    d = pa.table({"k": pa.array([7, 7], pa.int64()),
                  "tid": pa.array([1, 2], pa.int64()),
                  "valid_from": _ts([0, 50]), "valid_to": _ts([100, 60]),
                  "attr": pa.array([11, 22], pa.int64())})
    got = pit_join(ray.data.from_arrow(f), ray.data.from_arrow(d),
                   by="k", ts_col="ts", tie_col="tid").to_pandas()
    assert len(got) == 1 and pd.isna(got["attr_dim"][0])
    got_i = pit_join(ray.data.from_arrow(f), ray.data.from_arrow(d),
                     by="k", ts_col="ts", tie_col="tid",
                     how="inner").to_pandas()
    assert len(got_i) == 0


def test_pit_join_validates_how(ray_session):
    import ray
    t = pa.table({"k": pa.array([1], pa.int64()), "ts": _ts([0])})
    with pytest.raises(ValueError):
        pit_join(ray.data.from_arrow(t), ray.data.from_arrow(t),
                 by="k", ts_col="ts", how="outer")
