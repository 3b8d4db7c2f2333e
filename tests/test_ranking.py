"""Exact-order statistics: value_histogram and exact_ntile_stats vs
sequential numpy/pandas references, including tie and edge cases."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from bqf_ray.pipelines.ranking import (_ntile_cuts, exact_ntile_stats,
                                       value_histogram)


def _ref_ntile_stats(vals, ids, k):
    """Sequential reference with SQL NTILE semantics (first n%k tiles get
    the extra row) over ORDER BY value, id."""
    df = pd.DataFrame({"v": vals, "i": ids}).dropna(subset=["v"])
    df = df.sort_values(["v", "i"], kind="mergesort").reset_index(drop=True)
    n = len(df)
    cuts = _ntile_cuts(n, k)
    df["tile"] = np.searchsorted(cuts, np.arange(n), side="right")
    out = (df.groupby("tile")["v"].agg(n="size", min_value="min",
                                       max_value="max").reset_index())
    return out


@pytest.fixture(scope="module")
def events_ds(ray_session):
    import ray
    rng = np.random.default_rng(7)
    n = 20_000
    vals = np.round(rng.exponential(80.0, n), 2)
    vals[rng.random(n) < 0.01] = np.nan          # nulls excluded everywhere
    vals[:500] = 42.0                            # a heavy tie block
    t = pa.table({"event_id": pa.array(np.arange(n, dtype=np.int64)),
                  "value": pa.array(vals)})
    return ray.data.from_arrow(t).repartition(16), vals


def test_histogram_exact(events_ds):
    ds, vals = events_ds
    lo, hi, bins = 0.0, 500.0, 25
    got = (value_histogram(ds, "value", lo, hi, bins).to_pandas()
           .sort_values("bin").reset_index(drop=True))
    v = vals[~np.isnan(vals)]
    v = v[(v >= lo) & (v <= hi)]
    idx = np.minimum(np.floor((v - lo) * bins / (hi - lo)).astype(np.int64),
                     bins - 1)
    ref = np.bincount(idx, minlength=bins)
    nz = np.nonzero(ref)[0]
    assert got["bin"].to_numpy().tolist() == nz.tolist()
    assert got["n"].to_numpy().tolist() == ref[nz].tolist()
    w = (hi - lo) / bins
    assert np.array_equal(got["bin_lo"].to_numpy(), lo + nz * w)
    # every in-range row lands in exactly one bin
    assert int(got["n"].sum()) == len(v)


def test_histogram_out_of_range_and_empty(ray_session):
    import ray
    t = pa.table({"value": pa.array([-1.0, 1000.1, None], pa.float64())})
    got = value_histogram(ray.data.from_arrow(t), "value", 0.0, 1000.0, 10)
    assert got.count() == 0


def test_ntile_cuts_match_sql_semantics():
    # N=7, k=5 -> NTILE sizes 2,2,1,1,1 (the case floor(r*k/N) gets wrong)
    cuts = _ntile_cuts(7, 5)
    sizes = np.diff(np.concatenate([[0], cuts]))
    assert sizes.tolist() == [2, 2, 1, 1, 1]
    tiles = np.searchsorted(cuts, np.arange(7), side="right")
    assert tiles.tolist() == [0, 0, 1, 1, 2, 3, 4]


@pytest.mark.parametrize("k,parts", [(10, 8), (7, 4), (3, 32)])
def test_ntile_stats_exact(events_ds, k, parts):
    ds, vals = events_ds
    got = (exact_ntile_stats(ds, "value", "event_id", k,
                             num_partitions=parts).to_pandas()
           .sort_values("tile").reset_index(drop=True))
    ref = _ref_ntile_stats(vals, np.arange(len(vals)), k)
    assert got["tile"].tolist() == ref["tile"].tolist()
    assert got["n"].tolist() == ref["n"].tolist()
    assert np.array_equal(got["min_value"].to_numpy(),
                          ref["min_value"].to_numpy())
    assert np.array_equal(got["max_value"].to_numpy(),
                          ref["max_value"].to_numpy())


def test_ntile_ties_straddle_partitions(ray_session):
    """All-equal values: every row ties; tiles must still be exact by
    (value, id) order regardless of how the range partitioner routes."""
    import ray
    n = 1000
    t = pa.table({"event_id": pa.array(np.arange(n, dtype=np.int64)),
                  "value": pa.array(np.full(n, 5.0))})
    ds = ray.data.from_arrow(t).repartition(8)
    got = (exact_ntile_stats(ds, "value", "event_id", 4, num_partitions=8)
           .to_pandas().sort_values("tile").reset_index(drop=True))
    assert got["n"].tolist() == [250, 250, 250, 250]
    assert (got["min_value"] == 5.0).all() and (got["max_value"] == 5.0).all()


def test_global_row_numbers_exact(events_ds):
    from bqf_ray.pipelines.ranking import global_row_numbers
    ds, vals = events_ds
    got = (global_row_numbers(ds, "value", "event_id").to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    df = pd.DataFrame({"event_id": np.arange(len(vals)), "v": vals}) \
        .dropna(subset=["v"]).sort_values(["v", "event_id"],
                                          kind="mergesort")
    df["rank"] = np.arange(1, len(df) + 1)
    ref = df.sort_values("event_id")[["event_id", "rank"]] \
        .reset_index(drop=True)
    assert got["event_id"].tolist() == ref["event_id"].tolist()
    assert got["rank"].tolist() == ref["rank"].tolist()


def test_grouped_row_numbers_exact(ray_session):
    import ray
    from bqf_ray.pipelines.windowed import grouped_row_numbers
    rng = np.random.default_rng(5)
    n = 5000
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.integers(0, 200, n).astype(np.int64)),
        "ts": pa.array(rng.integers(0, 10**9, n).astype("datetime64[us]"))})
    ds = ray.data.from_arrow(t).repartition(8)
    got = (grouped_row_numbers(ds).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"],
                                   kind="mergesort")
    df["rnk"] = df.groupby("user_id").cumcount() + 1
    ref = df.sort_values("event_id")[["event_id", "rnk"]] \
        .reset_index(drop=True)
    assert got["event_id"].tolist() == ref["event_id"].tolist()
    assert got["rnk"].tolist() == ref["rnk"].tolist()


def test_grouped_exact_quantiles(ray_session):
    """PERCENTILE_DISC rule (ceil(q*n)-1 selection) vs a pandas
    reference, string keys, NaN exclusion."""
    import math

    import ray
    from bqf_ray.pipelines.aggregates import grouped_exact_quantiles
    rng = np.random.default_rng(9)
    n = 8000
    keys = rng.choice(["a", "b", "c", "dd"], n)
    vals = np.round(rng.normal(50, 20, n), 3)
    vals[rng.random(n) < 0.02] = np.nan
    t = pa.table({"k": pa.array(keys), "value": pa.array(vals)})
    ds = ray.data.from_arrow(t).repartition(8)
    got = (grouped_exact_quantiles(ds, "k", "value", (0.25, 0.5, 0.9))
           .to_pandas().sort_values("k").reset_index(drop=True))
    df = pd.DataFrame({"k": keys, "v": vals}).dropna()
    for _, row in got.iterrows():
        g = np.sort(df[df["k"] == row["k"]]["v"].to_numpy())
        assert row["n"] == len(g)
        for q, name in [(0.25, "q_25"), (0.5, "q_50"), (0.9, "q_90")]:
            idx = max(math.ceil(q * len(g)) - 1, 0)
            assert row[name] == g[idx]


def test_iqr_outliers(ray_session):
    import ray
    from bqf_ray.pipelines.aggregates import iqr_outliers
    rng = np.random.default_rng(13)
    n = 6000
    keys = rng.choice(["a", "b"], n)
    vals = rng.normal(10, 2, n)
    vals[:20] = 100.0                       # planted outliers in group 'a'
    keys[:20] = "a"
    t = pa.table({"event_id": pa.array(np.arange(n, dtype=np.int64)),
                  "k": pa.array(keys), "value": pa.array(vals)})
    ds = ray.data.from_arrow(t).repartition(8)
    got = iqr_outliers(ds, "k", "value", "event_id").to_pandas()
    # reference via numpy quantile_disc rule
    import math
    df = pd.DataFrame({"k": keys, "v": vals, "i": np.arange(n)})
    flagged = set()
    for kk, g in df.groupby("k"):
        s = np.sort(g["v"].to_numpy())
        q25 = s[max(math.ceil(0.25 * len(s)) - 1, 0)]
        q75 = s[max(math.ceil(0.75 * len(s)) - 1, 0)]
        th = q75 + 1.5 * (q75 - q25)
        flagged |= set(g[g["v"] > th]["i"].tolist())
    assert set(got["event_id"].tolist()) == flagged
    assert set(range(20)) <= flagged        # planted ones all caught


def test_grouped_correlation(ray_session):
    """Components exact (integer), final r matches a numpy reference
    computed from the same integer components; planted linear relation
    detected."""
    import ray
    from bqf_ray.pipelines.aggregates import grouped_correlation
    rng = np.random.default_rng(21)
    n = 4000
    keys = rng.choice(["pos", "neg", "none"], n)
    x = np.round(rng.uniform(0, 100, n), 2)
    noise = rng.normal(0, 3, n)
    y = np.where(keys == "pos", 2 * x + noise,
                 np.where(keys == "neg", -x + noise,
                          rng.uniform(0, 100, n))).round(0)
    t = pa.table({"k": pa.array(keys), "x": pa.array(x),
                  "y": pa.array(y)})
    ds = ray.data.from_arrow(t).repartition(8)
    got = (grouped_correlation(ds, "k", "x", "y").to_pandas()
           .set_index("k"))
    for key in ("pos", "neg", "none"):
        m = keys == key
        xi = np.floor(x[m] * 100 + 0.5).astype(np.int64)
        yi = np.floor(y[m] + 0.5).astype(np.int64)
        nn = float(len(xi))
        num = nn * float((xi * yi).sum()) - float(xi.sum()) * float(yi.sum())
        den = np.sqrt(nn * float((xi * xi).sum()) - float(xi.sum()) ** 2) \
            * np.sqrt(nn * float((yi * yi).sum()) - float(yi.sum()) ** 2)
        assert got.loc[key, "corr"] == num / den
        assert got.loc[key, "n"] == len(xi)
    assert got.loc["pos", "corr"] > 0.99
    assert got.loc["neg", "corr"] < -0.99
    assert abs(got.loc["none", "corr"]) < 0.1


def test_grouped_regression(ray_session):
    """Slope/intercept equal the closed-form IEEE expressions over the
    exact integer components; planted y = 2x + 5 recovered; zero
    x-variance group emits NaN; partitioning-invariant."""
    import ray
    from bqf_ray.pipelines.aggregates import grouped_regression
    rng = np.random.default_rng(31)
    n = 4000
    keys = rng.choice(["lin", "flat"], n)
    x = rng.integers(0, 50, n).astype(np.float64)
    x[keys == "flat"] = 7.0             # zero variance group
    y = np.round(2 * x + 5 + rng.normal(0, 0.2, n), 2)
    t = pa.table({"k": pa.array(keys), "x": pa.array(x),
                  "y": pa.array(y)})
    outs = []
    for parts in (3, 11):
        ds = ray.data.from_arrow(t).repartition(parts)
        outs.append(grouped_regression(ds, "k", "x", "y",
                                       x_scale=1, y_scale=100)
                    .to_pandas().set_index("k").sort_index())
    assert outs[0].equals(outs[1])      # bit-identical across layouts
    got = outs[0]
    m = keys == "lin"
    xi = np.floor(x[m] + 0.5).astype(np.int64)
    yi = np.floor(y[m] * 100 + 0.5).astype(np.int64)
    nn = float(len(xi))
    num = nn * float((xi * yi).sum()) - float(xi.sum()) * float(yi.sum())
    den = nn * float((xi * xi).sum()) - float(xi.sum()) ** 2
    slope = num / den
    assert got.loc["lin", "slope"] == slope
    assert got.loc["lin", "intercept"] == \
        (float(yi.sum()) - slope * float(xi.sum())) / nn
    # cents scale: slope ≈ 200, intercept ≈ 500
    assert abs(got.loc["lin", "slope"] - 200.0) < 2.0
    assert abs(got.loc["lin", "intercept"] - 500.0) < 50.0
    assert np.isnan(got.loc["flat", "slope"])
    assert np.isnan(got.loc["flat", "intercept"])


def test_grouped_top_n_matches_pandas(ray_session):
    """grouped_top_n == pandas groupby-head reference under skew (one
    hot key = 60% of rows), ties (few distinct values), nulls in key
    and sort columns, and many partitions — and never holds a whole
    group in one task."""
    import pandas as pd
    import ray
    from bqf_ray.pipelines.aggregates import grouped_top_n

    rng = np.random.default_rng(7)
    n = 20_000
    keys = rng.choice(["hot"] * 6 + ["b", "c", "d", "e"], n).astype(object)
    keys[rng.choice(n, 50, replace=False)] = None
    vals = rng.integers(0, 40, n).astype("float64")      # heavy ties
    vals[rng.choice(n, 30, replace=False)] = np.nan
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals),
                  "id": pa.array(ids)})
    got = (grouped_top_n(ray.data.from_arrow(t).repartition(16),
                         "k", ["v", "id"], 5,
                         descending=[True, False], rank_col="rk")
           .to_pandas().sort_values(["k", "rk"]).reset_index(drop=True))

    df = pd.DataFrame({"k": keys, "v": vals, "id": ids})
    df = df[df["k"].notna() & df["v"].notna()]
    ref = (df.sort_values(["v", "id"], ascending=[False, True])
           .groupby("k").head(5))
    ref["rk"] = ref.groupby("k").cumcount() + 1
    ref = ref.sort_values(["k", "rk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "v", "id", "rk"]], ref[["k", "v", "id", "rk"]])


def test_grouped_value_histogram_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from bqf_ray.pipelines.ranking import grouped_value_histogram
    rng = np.random.default_rng(14)
    n = 8000
    g = rng.integers(0, 6, n)
    v = rng.uniform(-10, 110, n)
    v[rng.integers(0, n, 50)] = np.nan
    tbl = pa.table({"g": pa.array(g, pa.int64()), "v": pa.array(v)})
    got = (grouped_value_histogram(ray.data.from_arrow(tbl)
                                   .repartition(5), "g", "v",
                                   0.0, 100.0, 10)
           .to_pandas().sort_values(["g", "bin"]).reset_index(drop=True))
    ref = {}
    for gi, vi in zip(g, v):
        if np.isnan(vi) or vi < 0.0 or vi > 100.0:
            continue
        b = min(int(np.floor((vi - 0.0) * 10 / 100.0)), 9)
        ref[(gi, b)] = ref.get((gi, b), 0) + 1
    got_d = {(r.g, r.bin): r.n for r in got.itertuples()}
    assert got_d == ref
    assert (got["bin_lo"].to_numpy()
            == got["bin"].to_numpy() * 10.0).all()


def test_rrf_fuse_matches_pandas(ray_session):
    import pandas as pd
    import ray

    from bqf_ray.pipelines.ranking import rrf_fuse
    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "m1": rng.integers(0, 40, n),       # heavy ties
        "m2": rng.integers(0, 500, n)})
    ds = ray.data.from_pandas(df).repartition(7)
    got = rrf_fuse(ds, [("m1", True), ("m2", False)], "doc_id",
                   k0=60, top=50).to_pandas()
    r1 = df["m1"].rank(method="min", ascending=False).astype(np.int64)
    r2 = df["m2"].rank(method="min", ascending=True).astype(np.int64)
    score = 1.0 / (60 + r1.values) + 1.0 / (60 + r2.values)
    ref = (pd.DataFrame({"doc_id": df["doc_id"], "m1_rank": r1,
                         "m2_rank": r2, "rrf": score})
           .sort_values(["rrf", "doc_id"], ascending=[False, True])
           .head(50).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.sort_values(["rrf", "doc_id"],
                        ascending=[False, True]).reset_index(drop=True),
        ref, check_dtype=False)


def test_rrf_fuse_drops_null_metric_rows(ray_session):
    import pandas as pd
    import ray

    from bqf_ray.pipelines.ranking import rrf_fuse
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "m1": pa.array([10, None, 30, 40], pa.int64()),
        "m2": pa.array([1, 2, None, 4], pa.int64())})
    got = rrf_fuse(ray.data.from_arrow(tbl), [("m1", True), ("m2", True)],
                   "doc_id", top=10).to_pandas()
    # rows 2 and 3 excluded from BOTH rankings
    assert sorted(got["doc_id"]) == [1, 4]
    assert dict(zip(got["doc_id"], got["m1_rank"])) == {4: 1, 1: 2}
    assert dict(zip(got["doc_id"], got["m2_rank"])) == {4: 1, 1: 2}


def test_rrf_fuse_rejects_float_metrics(ray_session):
    import ray

    from bqf_ray.pipelines.ranking import rrf_fuse
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "s": pa.array([0.9, 0.1], pa.float64())})
    with pytest.raises((TypeError, Exception), match="must be integer"):
        rrf_fuse(ray.data.from_arrow(tbl), [("s", True)], "doc_id",
                 top=5).to_pandas()


def test_grouped_spearman_matches_pandas(ray_session):
    """Tie-heavy random groups vs pandas rank().corr(rank()) — the
    centered doubled-rank integer path must agree to float precision
    (bit-exactness vs SQL is the oracle's job)."""
    import ray

    from bqf_ray.pipelines.aggregates import grouped_spearman
    rng = np.random.default_rng(5)
    n = 12000
    k = rng.integers(0, 29, n)
    x = np.round(rng.normal(size=n), 1)
    y = np.round(x * 0.5 + rng.normal(size=n), 0)
    x[rng.random(n) < 0.05] = np.nan             # dropped rows
    tbl = pa.table({"k": pa.array(k), "x": pa.array(x),
                    "y": pa.array(y)})
    got = (grouped_spearman(ray.data.from_arrow(tbl).repartition(7),
                            "k", "x", "y")
           .to_pandas().sort_values("k").reset_index(drop=True))
    df = pd.DataFrame({"k": k, "x": x, "y": y}).dropna()
    ref = (df.groupby("k")
             .apply(lambda g: pd.Series(
                 {"n": len(g), "rho": g.x.rank().corr(g.y.rank())}),
                 include_groups=False).reset_index())
    m = got.merge(ref, on="k", suffixes=("", "_ref"))
    assert len(m) == 29 and (m.n == m.n_ref).all()
    assert np.allclose(m.rho, m.rho_ref, atol=1e-12)


def test_grouped_spearman_edges(ray_session):
    """Constant side → NULL rho; n=1 key → NULL; null keys ONE group;
    perfect monotone pair → rho exactly ±1.0."""
    import ray

    from bqf_ray.pipelines.aggregates import grouped_spearman
    tbl = pa.table({
        "k": pa.array([1, 1, 1, 2, 3, 3, None, None], pa.int64()),
        "x": pa.array([1.0, 2.0, 3.0, 5.0, 7.0, 7.0, 1.0, 2.0]),
        "y": pa.array([10.0, 20.0, 30.0, 1.0, 4.0, 9.0, 5.0, 3.0])})
    got = (grouped_spearman(ray.data.from_arrow(tbl), "k", "x", "y")
           .to_pandas())
    got["k"] = got["k"].astype("Int64")
    by = {(None if pd.isna(r.k) else int(r.k)): r
          for r in got.itertuples()}
    # rho = s/(√s·√s): IEEE √s·√s ≠ s for s=8, and the SQL replay
    # shares the exact expression — assert THAT value, not 1.0
    assert by[1].rho == 8.0 / (np.sqrt(8.0) * np.sqrt(8.0))
    assert pd.isna(by[2].rho)                    # n = 1
    assert pd.isna(by[3].rho)                    # constant x side
    assert by[None].rho == -2.0 / (np.sqrt(2.0) * np.sqrt(2.0))
    assert by[None].n == 2


def test_grouped_spearman_envelope_raise(ray_session):
    import ray

    from bqf_ray.pipelines.aggregates import grouped_spearman
    tbl = pa.table({"k": pa.array(np.zeros(50, np.int64)),
                    "x": pa.array(np.arange(50.0)),
                    "y": pa.array(np.arange(50.0))})
    with pytest.raises(Exception, match="max_group_rows"):
        (grouped_spearman(ray.data.from_arrow(tbl), "k", "x", "y",
                          max_group_rows=10).to_pandas())
