"""scd2_intervals / grouped_relative_ranks / category_purity
against pandas/brute references."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(tbl, parts=4):
    import ray
    return ray.data.from_arrow(tbl).repartition(parts)


def test_scd2_intervals_pandas(ray_session):
    from bqf_ray.pipelines.windowed import scd2_intervals
    rng = np.random.default_rng(2)
    n = 3000
    k = rng.integers(0, 50, n)
    ts = rng.integers(0, 100, n).astype("datetime64[s]") \
        .astype("datetime64[us]")
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"k": pa.array(k, pa.int64()), "ts": pa.array(ts),
                    "i": pa.array(ids)})
    got = scd2_intervals(_ds(tbl), "k", "ts", "i").to_pandas() \
        .sort_values("i").reset_index(drop=True)
    df = pd.DataFrame({"k": k, "ts": ts, "i": ids}) \
        .sort_values(["k", "ts", "i"]).reset_index(drop=True)
    df["valid_to"] = df.groupby("k")["ts"].shift(-1)
    ref = df.sort_values("i").reset_index(drop=True)
    assert (got["valid_from"].to_numpy() == ref["ts"].to_numpy()).all()
    a = got["valid_to"].to_numpy()
    b = ref["valid_to"].to_numpy()
    assert ((a == b) | (pd.isna(a) & pd.isna(b))).all()


def test_relative_ranks_ties(ray_session):
    from bqf_ray.pipelines.ranking import grouped_relative_ranks
    # key "a": values [1, 1, 2]  -> pr [0, 0, 1], cd [2/3, 2/3, 1]
    # key "b": single row        -> pr 0, cd 1
    tbl = pa.table({"k": pa.array(["a", "a", "a", "b"]),
                    "v": pa.array([1.0, 2.0, 1.0, 9.0]),
                    "i": pa.array([10, 11, 12, 13], pa.int64())})
    got = grouped_relative_ranks(_ds(tbl, 2), "k", "v", "i") \
        .to_pandas().sort_values("i").reset_index(drop=True)
    assert got["percent_rank"].tolist() == [0.0, 1.0, 0.0, 0.0]
    assert got["cume_dist"].tolist() == [2 / 3, 1.0, 2 / 3, 1.0]


def test_relative_ranks_matches_pandas(ray_session):
    from bqf_ray.pipelines.ranking import grouped_relative_ranks
    rng = np.random.default_rng(8)
    n = 5000
    k = rng.integers(0, 30, n)
    v = rng.integers(0, 40, n).astype(np.float64)  # many ties
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"k": pa.array(k, pa.int64()), "v": pa.array(v),
                    "i": pa.array(ids)})
    got = grouped_relative_ranks(_ds(tbl), "k", "v", "i").to_pandas() \
        .sort_values("i").reset_index(drop=True)
    df = pd.DataFrame({"k": k, "v": v, "i": ids})
    g = df.groupby("k")["v"]
    n_per = g.transform("size").to_numpy()
    rank_min = g.rank(method="min").to_numpy()
    rank_max = g.rank(method="max").to_numpy()
    pr = np.where(n_per > 1, (rank_min - 1) / np.maximum(n_per - 1, 1),
                  0.0)
    cd = rank_max / n_per
    ref = df.assign(pr=pr, cd=cd).sort_values("i").reset_index(drop=True)
    assert np.array_equal(got["percent_rank"].to_numpy(),
                          ref["pr"].to_numpy())
    assert np.array_equal(got["cume_dist"].to_numpy(),
                          ref["cd"].to_numpy())


def test_category_purity_pandas(ray_session):
    from bqf_ray.pipelines.aggregates import category_purity
    rng = np.random.default_rng(4)
    n = 4000
    k = rng.integers(0, 25, n)
    v = rng.choice(list("pqrs"), n)
    tbl = pa.table({"k": pa.array(k, pa.int64()),
                    "v": pa.array(v, pa.string())})
    got = category_purity(_ds(tbl), "k", "v").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    c = pd.DataFrame({"k": k, "v": v}).groupby(["k", "v"]).size() \
        .reset_index(name="n")
    ref = c.groupby("k").agg(n=("n", "sum"), n_distinct=("n", "size"),
                             sum_sq=("n", lambda s: (s * s).sum())) \
        .reset_index()
    for col in ("n", "n_distinct", "sum_sq"):
        assert got[col].astype("int64").tolist() == \
            ref[col].astype("int64").tolist(), col


def test_grouped_cont_quantiles_matches_duckdb(ray_session):
    import duckdb

    from bqf_ray.pipelines.aggregates import grouped_cont_quantiles
    rng = np.random.default_rng(17)
    n = 6000
    k = rng.integers(0, 15, n)
    v = rng.uniform(-1e6, 1e6, n)
    tbl = pa.table({"k": pa.array(k, pa.int64()), "v": pa.array(v)})
    got = grouped_cont_quantiles(_ds(tbl), "k", "v",
                                 qs=(0.1, 0.5, 0.9)).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"k": k, "v": v}))
    ref = con.execute("""
        SELECT k, count(*)::BIGINT AS n,
               quantile_cont(v, 0.1) AS q_10,
               quantile_cont(v, 0.5) AS q_50,
               quantile_cont(v, 0.9) AS q_90
        FROM t GROUP BY 1 ORDER BY 1""").fetch_df()
    for c in ("n", "q_10", "q_50", "q_90"):
        assert np.array_equal(got[c].to_numpy(), ref[c].to_numpy()), c


def test_impute_group_median(ray_session):
    from bqf_ray.pipelines.aggregates import impute_group_median
    tbl = pa.table({
        "k": pa.array(["a", "a", "a", "b", "b", "c"]),
        "v": pa.array([1.0, None, 5.0, float("nan"), 2.0, None])})
    got = impute_group_median(_ds(tbl, 2), "k", "v").to_pandas()
    got = got.sort_values(["k", "v"], na_position="first") \
        .reset_index(drop=True)
    # a: median of [1,5] -> 1 (lower); b: median of [2] -> 2;
    # c: no valid values -> stays null
    filled = got["v_filled"].tolist()
    by_k = {}
    for k, f in zip(got["k"], filled):
        by_k.setdefault(k, []).append(f)
    assert sorted(by_k["a"]) == [1.0, 1.0, 5.0]
    assert sorted(by_k["b"]) == [2.0, 2.0]
    assert pd.isna(by_k["c"][0])


def test_duplicate_keys(ray_session):
    from bqf_ray.pipelines.audit import duplicate_keys
    tbl = pa.table({"a": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
                    "b": pa.array([9, 9, 8, 7, 7, 6], pa.int64())})
    got = duplicate_keys(_ds(tbl, 3), ["a", "b"]).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    assert [tuple(r) for r in got.to_numpy()] == [(1, 9, 2), (2, 7, 2)]


def test_weighted_median_null_keys_sql_semantics(ray_session):
    """Regression: null keys must form their OWN group, not merge into
    the preceding key's run (r3 review finding #1)."""
    from bqf_ray.pipelines.aggregates import grouped_weighted_median
    tbl = pa.table({"k": pa.array(["z", None, None]),
                    "v": pa.array([10, 1000, 1000], pa.int64()),
                    "w": pa.array([1, 100, 100], pa.int64())})
    got = grouped_weighted_median(_ds(tbl, 1), "k", "v", "w",
                                  num_buckets=1).to_pandas()
    got = got.sort_values("k", na_position="last") \
        .reset_index(drop=True)
    assert len(got) == 2
    assert got.loc[0, "k"] == "z" and got.loc[0, "n"] == 1 \
        and got.loc[0, "wmedian"] == 10
    assert pd.isna(got.loc[1, "k"]) and got.loc[1, "n"] == 2 \
        and got.loc[1, "wmedian"] == 1000


def test_joint_mi_null_category_marginals(ray_session):
    """Regression: null categories get their own exact marginals
    (r3 review finding #2)."""
    from bqf_ray.pipelines.aggregates import joint_mi_counts
    tbl = pa.table({"x": pa.array(["a", "a", "b", None, None, None]),
                    "y": pa.array(["u"] * 6)})
    got = joint_mi_counts(_ds(tbl, 2), "x", "y",
                          num_buckets=1).to_pandas()
    by_x = {("<null>" if pd.isna(r.x) else r.x): (r.n_xy, r.n_x)
            for r in got.itertuples()}
    assert by_x == {"a": (2, 2), "b": (1, 1), "<null>": (3, 3)}
    assert set(got["n_y"]) == {6} and set(got["n"]) == {6}


def test_clip_to_quantiles_all_null_group(ray_session):
    """Regression: an empty threshold table must pass rows through
    unclipped, not IndexError (r3 review finding #4)."""
    from bqf_ray.pipelines.aggregates import clip_to_quantiles
    tbl = pa.table({"k": pa.array(["g1", "g1"]),
                    "v": pa.array([None, None], pa.float64())})
    got = clip_to_quantiles(_ds(tbl, 1), "k", "v", 0.05,
                            0.95).to_pandas()
    assert len(got) == 2 and got["v_clipped"].isna().all()
    # mixed: one group has thresholds, the other doesn't
    tbl2 = pa.table({"k": pa.array(["g1", "g1", "g2"]),
                     "v": pa.array([1.0, 9.0, None])})
    got2 = clip_to_quantiles(_ds(tbl2, 1), "k", "v", 0.0,
                             1.0).to_pandas() \
        .sort_values("v", na_position="last").reset_index(drop=True)
    assert got2["v_clipped"].tolist()[:2] == [1.0, 9.0]
    assert pd.isna(got2["v_clipped"].iloc[2])


def test_grouped_checksum_null_keys(ray_session):
    """Regression: null keys checksum as one group instead of raising
    TypeError (r3 review finding #5)."""
    from bqf_ray.pipelines.audit import grouped_checksum
    tbl = pa.table({"k": pa.array(["a", None, None, "b"]),
                    "v": pa.array([1, 2, 2, 3], pa.int64())})
    got = grouped_checksum(_ds(tbl, 2), "k", ["v"]).to_pandas()
    got = got.sort_values("k", na_position="last") \
        .reset_index(drop=True)
    assert got["n_rows"].tolist() == [1, 1, 2]
    assert pd.isna(got.loc[2, "k"])


def test_grouped_string_agg(ray_session):
    from bqf_ray.pipelines.aggregates import grouped_string_agg
    tbl = pa.table({"k": pa.array([1, 1, 2, 1, 2], pa.int64()),
                    "v": pa.array(["b", "a", "x", None, "y"]),
                    "o1": pa.array([2, 1, 5, 0, 4], pa.int64()),
                    "o2": pa.array([0, 0, 0, 0, 0], pa.int64())})
    got = grouped_string_agg(_ds(tbl, 2), "k", "v", ["o1", "o2"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert got["agg"].tolist() == ["a,b", "y,x"]
    assert got["n"].tolist() == [2, 2]


def test_grouped_first_last(ray_session):
    """first/second/last per key match a pandas window reference;
    single-row keys get NULL second; null keys / null order rows
    excluded; partial path never ships full groups."""
    import pandas as pd
    import ray
    from bqf_ray.pipelines.windowed import grouped_first_last
    rng = np.random.default_rng(17)
    n = 6000
    key = rng.integers(0, 40, n).astype(np.int64)
    ts = rng.permutation(n).astype("datetime64[us]")
    eid = np.arange(n, dtype=np.int64)
    val = np.array([f"v{x}" for x in rng.integers(0, 9, n)], dtype=object)
    t = pa.table({"user_id": pa.array(key), "ts": pa.array(ts),
                  "event_id": pa.array(eid),
                  "event_type": pa.array(list(val), pa.string())})
    # splice in a single-row key, a null key, a null ts
    extra = pa.table({"user_id": pa.array([999, None, 5], pa.int64()),
                      "ts": pa.array([np.datetime64("2025-01-01", "us"),
                                      np.datetime64("2025-01-01", "us"),
                                      None]),
                      "event_id": pa.array([n, n + 1, n + 2], pa.int64()),
                      "event_type": pa.array(["solo", "ghost", "late"])})
    t = pa.concat_tables([t, extra])
    outs = []
    for parts in (1, 13):
        ds = ray.data.from_arrow(t).repartition(parts)
        outs.append(grouped_first_last(ds, "user_id",
                                       ["ts", "event_id"], "event_type")
                    .to_pandas().sort_values("user_id")
                    .reset_index(drop=True))
    assert outs[0].equals(outs[1])
    got = outs[0].set_index("user_id")
    df = t.to_pandas().dropna(subset=["user_id", "ts"])
    df = df.sort_values(["user_id", "ts", "event_id"])
    for k, g in df.groupby("user_id"):
        row = got.loc[int(k)]
        assert row["n"] == len(g)
        assert row["first_val"] == g["event_type"].iloc[0]
        assert row["last_val"] == g["event_type"].iloc[-1]
        want2 = g["event_type"].iloc[1] if len(g) >= 2 else None
        got2 = row["second_val"]
        assert (got2 is None or got2 != got2) if want2 is None \
            else got2 == want2
    assert got.loc[999, "n"] == 1
    assert pd.isna(got.loc[999, "second_val"])
    assert None not in got.index                 # null key excluded


def test_new_keys_daily(ray_session):
    """new/cum counts match a pandas first-seen reference; days sorted;
    cum is a running sum; partitioning-invariant."""
    import pandas as pd
    import ray
    from bqf_ray.pipelines.windowed import new_keys_daily
    rng = np.random.default_rng(29)
    n = 8000
    uid = rng.integers(0, 300, n).astype(np.int64)
    base = np.datetime64("2025-03-01T00:00:00", "us").astype(np.int64)
    ts = (base + rng.integers(0, 20 * 86400_000_000, n)).astype(
        "datetime64[us]")
    t = pa.table({"user_id": pa.array(uid), "ts": pa.array(ts)})
    outs = []
    for parts in (1, 8):
        ds = ray.data.from_arrow(t).repartition(parts)
        outs.append(new_keys_daily(ds).to_pandas())
    assert outs[0].equals(outs[1])
    got = outs[0]
    df = pd.DataFrame({"user_id": uid, "ts": ts})
    first = df.groupby("user_id")["ts"].min()
    days = first.dt.floor("D").value_counts().sort_index()
    assert got["day"].tolist() == days.index.tolist()
    assert got["new_keys"].tolist() == days.values.tolist()
    assert got["cum_keys"].tolist() == days.values.cumsum().tolist()
    assert got["cum_keys"].iloc[-1] == 300
