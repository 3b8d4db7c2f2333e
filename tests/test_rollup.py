"""grouping_sets / rollup / cube vs DuckDB GROUP BY GROUPING SETS —
exact rows incl. null key values (grp flags disambiguate) and all-null
aggregate groups."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from bqf_ray.pipelines.aggregates import cube, grouping_sets, rollup


def _fixture():
    rng = np.random.default_rng(7)
    n = 5000
    a = rng.choice(["x", "y", "z", None], n, p=[0.4, 0.3, 0.2, 0.1])
    b = rng.integers(0, 5, n).astype(np.int64)
    v = rng.integers(-50, 50, n).astype(np.int64)
    v_null = np.where(rng.random(n) < 0.15, None, v)
    return pd.DataFrame({"a": a, "b": b,
                         "v": pd.array(v_null, dtype="Int64")})


def _ref(df, sets_sql):
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(f"""
        SELECT a, b, GROUPING(a)::BIGINT AS grp_a,
               GROUPING(b)::BIGINT AS grp_b,
               count(v)::BIGINT AS n_v, sum(v)::BIGINT AS sum_v,
               min(v)::BIGINT AS min_v
        FROM t GROUP BY GROUPING SETS {sets_sql}""").df()


def _norm(df):
    return (df.astype({"n_v": "Int64", "sum_v": "Int64", "min_v": "Int64"})
            .sort_values(["grp_a", "grp_b", "a", "b"],
                         na_position="first")
            .reset_index(drop=True))


AGGS = [("v", "count", "n_v"), ("v", "sum", "sum_v"), ("v", "min", "min_v")]


@pytest.mark.parametrize("parts", [1, 7])
def test_rollup_matches_duckdb(ray_session, parts):
    import ray
    df = _fixture()
    got = rollup(ray.data.from_pandas(df).repartition(parts),
                 ["a", "b"], AGGS, num_buckets=8).to_pandas()
    ref = _ref(df, "((a, b), (a), ())")
    pd.testing.assert_frame_equal(_norm(got), _norm(ref),
                                  check_dtype=False)


def test_cube_and_explicit_sets(ray_session):
    import ray
    df = _fixture()
    ds = ray.data.from_pandas(df).repartition(5)
    got = cube(ds, ["a", "b"], AGGS, num_buckets=8).to_pandas()
    ref = _ref(df, "((a, b), (a), (b), ())")
    pd.testing.assert_frame_equal(_norm(got), _norm(ref),
                                  check_dtype=False)
    got2 = grouping_sets(ds, ["a", "b"], AGGS, [["b"]],
                         num_buckets=8).to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    ref2 = con.execute("""
        SELECT NULL AS a, b, 1::BIGINT AS grp_a, 0::BIGINT AS grp_b,
               count(v)::BIGINT AS n_v, sum(v)::BIGINT AS sum_v,
               min(v)::BIGINT AS min_v
        FROM t GROUP BY b""").df()
    pd.testing.assert_frame_equal(_norm(got2), _norm(ref2),
                                  check_dtype=False)


def test_grouping_sets_validation(ray_session):
    import ray
    ds = ray.data.from_pandas(_fixture())
    with pytest.raises(ValueError, match="outside key_cols"):
        grouping_sets(ds, ["a"], AGGS, [["b"]])
    with pytest.raises(ValueError, match="non-decomposable"):
        grouping_sets(ds, ["a"], [("v", "avg", "m")], [["a"]])


def test_superspreaders_exact_topk(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray

    from bqf_ray.pipelines.aggregates import superspreaders
    rng = np.random.RandomState(6)
    n = 20_000
    df = pd.DataFrame({
        "k": rng.zipf(1.5, n).clip(max=500).astype(np.int64),
        "p": rng.randint(0, 800, n).astype(np.int64)})
    got = superspreaders(ray.data.from_pandas(df).repartition(7),
                         "k", "p", k=15, num_buckets=8).to_pandas()
    truth = (df.drop_duplicates().groupby("k").size()
             .reset_index(name="n_partners")
             .sort_values(["n_partners", "k"], ascending=[False, True])
             .head(15).reset_index(drop=True))
    assert list(got["k"]) == list(truth["k"])
    assert list(got["n_partners"]) == list(truth["n_partners"])


def test_grouped_welch_matches_reference(ray_session):
    import pandas as pd
    import ray

    from bqf_ray.pipelines.aggregates import grouped_welch_ttest
    rng = np.random.RandomState(3)
    n = 8000
    df = pd.DataFrame({
        "k": rng.randint(0, 25, n).astype(np.int64),
        "grp": rng.choice(["x", "y", "z"], size=n),
        "v": np.round(rng.gamma(2, 15, n), 2)})
    got = (grouped_welch_ttest(
        ray.data.from_pandas(df).repartition(6), "k", "grp", "x", "y",
        "v", num_buckets=8).to_pandas()
        .sort_values("k").reset_index(drop=True))
    u = np.rint(df["v"].to_numpy() * 100).astype(np.int64)
    seen = 0
    for k in sorted(df["k"].unique()):
        ua = u[(df["k"] == k) & (df["grp"] == "x")]
        ub = u[(df["k"] == k) & (df["grp"] == "y")]
        if len(ua) < 2 or len(ub) < 2:
            continue
        row = got[got["k"] == k].iloc[0]
        assert (row["n_a"], row["s_a"], row["q_a"]) == \
            (len(ua), ua.sum(), (ua * ua).sum())
        # Welch t against the independent float reference
        va = ua.var(ddof=1)
        vb = ub.var(ddof=1)
        t_ref = (ua.mean() - ub.mean()) / np.sqrt(va / len(ua)
                                                  + vb / len(ub))
        assert row["t_stat"] == pytest.approx(t_ref, rel=1e-12)
        seen += 1
    assert seen == len(got) > 10


def test_grouped_normal_equations_solves_planted_relation(ray_session):
    """Components are exact ints AND the downstream solve recovers a
    planted linear relation."""
    import pandas as pd
    import ray

    from bqf_ray.pipelines.aggregates import grouped_normal_equations
    rng = np.random.RandomState(4)
    n = 20_000
    x0 = np.round(rng.uniform(0, 50, n), 2)
    x1 = np.round(rng.uniform(0, 0.1, n), 2)
    y = np.round(3.0 * x0 - 40.0 * x1 + 7.0
                 + rng.normal(0, 0.005, n), 2)
    df = pd.DataFrame({"k": rng.choice(["a", "b"], n), "y": y,
                       "x0": x0, "x1": x1})
    got = (grouped_normal_equations(
        ray.data.from_pandas(df).repartition(7), "k", "y",
        ["x0", "x1"], scales=[100, 100], y_scale=100,
        num_buckets=8).to_pandas().sort_values("k")
        .reset_index(drop=True))
    for _, row in got.iterrows():
        m = (df["k"] == row["k"]).to_numpy()
        q0 = np.rint(x0[m] * 100).astype(np.int64)
        q1 = np.rint(x1[m] * 100).astype(np.int64)
        qy = np.rint(y[m] * 100).astype(np.int64)
        assert row["n"] == m.sum()
        assert row["sxx_0_1"] == (q0 * q1).sum()
        assert row["sxy_1"] == (q1 * qy).sum()
        # solve the 3x3 normal system (unit domain): beta ~ planted
        A = np.array([[row["n"], row["sx_0"], row["sx_1"]],
                      [row["sx_0"], row["sxx_0_0"], row["sxx_0_1"]],
                      [row["sx_1"], row["sxx_0_1"], row["sxx_1_1"]]],
                     dtype=np.float64)
        b = np.array([row["sy"], row["sxy_0"], row["sxy_1"]],
                     dtype=np.float64)
        beta = np.linalg.solve(A, b)          # [intercept, b0, b1] in units
        assert beta[1] == pytest.approx(3.0, abs=0.01)
        assert beta[2] == pytest.approx(-40.0, abs=0.5)
        assert beta[0] == pytest.approx(700.0, abs=5.0)   # 7.00 in cents


def test_target_encode_loo_leakage_safe(ray_session):
    import pandas as pd
    import ray

    from bqf_ray.pipelines.aggregates import target_encode_loo
    rng = np.random.RandomState(5)
    n = 6000
    df = pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "k": rng.choice(["a", "b", "c", "solo"], n,
                        p=[0.5, 0.3, 0.1999, 0.0001]),
        "y": np.round(rng.gamma(3, 25, n), 2)})
    # force exactly one 'solo' row: its key must be dropped (n < 2)
    df.loc[df["k"] == "solo", "k"] = "a"
    df.loc[0, "k"] = "solo"
    got = (target_encode_loo(ray.data.from_pandas(df).repartition(6),
                             "k", "y", "rid", num_buckets=8)
           .to_pandas().sort_values("rid").reset_index(drop=True))
    u = np.rint(df["y"].to_numpy() * 100).astype(np.int64)
    assert "solo" not in set(got["k"])
    assert len(got) == n - 1
    for _, row in got.sample(200, random_state=0).iterrows():
        m = (df["k"] == row["k"]).to_numpy()
        i = int(row["rid"])
        exp = np.float64(u[m].sum() - u[i]) / (m.sum() - 1)
        assert row["target_loo"] == exp
        # leakage check: encoding differs from the naive all-rows mean
        naive = u[m].sum() / m.sum()
        assert row["target_loo"] != naive or u[i] == naive
