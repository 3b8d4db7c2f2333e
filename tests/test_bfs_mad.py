"""bfs_hops and grouped_mad against brute-force references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl):
    import ray
    return ray.data.from_arrow(tbl)


def _brute_bfs(edges, seeds, max_hops):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    h = 0
    while frontier and h < max_hops:
        h += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    return dist


@pytest.mark.parametrize("max_hops", [1, 3, 16])
def test_bfs_hops_brute(ray_session, max_hops):
    from bqf_ray.pipelines.graph import bfs_hops
    rng = np.random.default_rng(5)
    m = 600
    a = rng.integers(0, 150, m)
    b = rng.integers(0, 150, m)
    tbl = pa.table({"a": pa.array(a, pa.int64()),
                    "b": pa.array(b, pa.int64())})
    seeds = np.array([0, 7, 140], dtype=np.int64)
    got = bfs_hops(_ds(tbl), seeds, max_hops=max_hops)
    got_d = dict(zip(got["node"].to_pylist(), got["hop"].to_pylist()))
    edges = {(x, y) for x, y in zip(a, b) if x != y}
    assert got_d == _brute_bfs(edges, seeds, max_hops)


def test_bfs_hops_disconnected_seed(ray_session):
    from bqf_ray.pipelines.graph import bfs_hops
    tbl = pa.table({"a": pa.array([1, 2], pa.int64()),
                    "b": pa.array([2, 3], pa.int64())})
    got = bfs_hops(_ds(tbl), np.array([99], dtype=np.int64), max_hops=4)
    assert got["node"].to_pylist() == [99]
    assert got["hop"].to_pylist() == [0]


def test_grouped_mad_brute(ray_session):
    from bqf_ray.pipelines.aggregates import grouped_mad
    rng = np.random.default_rng(9)
    k = rng.integers(0, 20, 4000)
    v = rng.integers(-500, 500, 4000)
    tbl = pa.table({"k": pa.array(k, pa.int64()),
                    "v": pa.array(v, pa.int64())})
    got = grouped_mad(_ds(tbl), "k", "v").to_pandas() \
        .sort_values("k").reset_index(drop=True)

    def disc_median(x):
        x = np.sort(np.asarray(x, dtype=np.float64))
        return x[int(np.ceil(0.5 * len(x))) - 1]

    df = pd.DataFrame({"k": k, "v": v.astype(np.float64)})
    for _, row in got.iterrows():
        sub = df[df.k == row.k]["v"].to_numpy()
        med = disc_median(sub)
        assert row["n"] == len(sub)
        assert row["med"] == med
        assert row["mad"] == disc_median(np.abs(sub - med))


def test_grouped_mad_nulls_and_string_keys(ray_session):
    from bqf_ray.pipelines.aggregates import grouped_mad
    tbl = pa.table({"k": pa.array(["x", "x", "x", "y", "y"]),
                    "v": pa.array([1.0, None, 5.0, 2.0, float("nan")])})
    got = grouped_mad(_ds(tbl), "k", "v").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    # x: values [1, 5] -> lower med 1, |dev| [0, 4] -> mad 0
    # y: values [2] -> med 2, mad 0
    assert list(got["k"]) == ["x", "y"]
    assert list(got["n"]) == [2, 1]
    assert list(got["med"]) == [1.0, 2.0]
    assert list(got["mad"]) == [0.0, 0.0]


def test_edge_triangle_support_brute(ray_session):
    from bqf_ray.pipelines.graph import edge_triangle_support
    rng = np.random.default_rng(21)
    m = 500
    a = rng.integers(0, 40, m)
    b = rng.integers(0, 40, m)
    tbl = pa.table({"a": pa.array(a, pa.int64()),
                    "b": pa.array(b, pa.int64())})
    got = edge_triangle_support(_ds(tbl)).to_pandas()
    got_d = {(r.a, r.b): r.support for r in got.itertuples()}
    E = {(min(x, y), max(x, y)) for x, y in zip(a, b) if x != y}
    adj = {}
    for x, y in E:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    assert got_d == {(x, y): len(adj[x] & adj[y]) for x, y in E}


def test_edge_triangle_support_past_budget_routes_bucketed(ray_session):
    # the former hard ceiling: past the broadcast budget the op now
    # routes to the fully-distributed bucketed tier instead of raising
    from bqf_ray.pipelines.graph import edge_triangle_support
    from bqf_ray.plans import recent_plans
    tbl = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                    "b": pa.array([2, 3, 1], pa.int64())})
    got = edge_triangle_support(_ds(tbl), broadcast_budget_bytes=8) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    assert [p["plan"] for p in recent_plans()
            if p["op"] == "edge_triangle_support"][-1] == "bucketed"
    assert list(got["support"]) == [1, 1, 1]


def test_clustering_components_brute(ray_session):
    from bqf_ray.pipelines.graph import clustering_components
    rng = np.random.default_rng(31)
    m = 400
    a = rng.integers(0, 35, m)
    b = rng.integers(0, 35, m)
    tbl = pa.table({"a": pa.array(a, pa.int64()),
                    "b": pa.array(b, pa.int64())})
    got = clustering_components(_ds(tbl)).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    E = {(min(x, y), max(x, y)) for x, y in zip(a, b) if x != y}
    adj = {}
    for x, y in E:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    for r in got.itertuples():
        nbrs = adj[r.node]
        tri = sum(1 for u in nbrs for v in nbrs
                  if u < v and v in adj[u])
        assert r.deg == len(nbrs)
        assert r.n_tri == tri
        assert r.n_wedges == len(nbrs) * (len(nbrs) - 1) // 2
    assert set(got["node"]) == set(adj)


def test_grouped_weighted_quantiles_brute(ray_session):
    from bqf_ray.pipelines.aggregates import grouped_weighted_quantiles
    rng = np.random.default_rng(33)
    n = 3000
    k = rng.integers(0, 12, n)
    v = rng.integers(-100, 100, n)
    w = rng.integers(0, 9, n)
    tbl = pa.table({"k": pa.array(k, pa.int64()),
                    "v": pa.array(v, pa.int64()),
                    "w": pa.array(w, pa.int64())})
    qs = (0.1, 0.5, 0.9)
    got = grouped_weighted_quantiles(_ds(tbl), "k", "v", "w",
                                     qs=qs).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    for r in got.itertuples():
        vv = v[k == r.k]
        ww = w[k == r.k]
        order = np.argsort(vv, kind="stable")
        vv, ww = vv[order], ww[order]
        cum = np.cumsum(ww)
        tot = cum[-1]
        assert r.tot_w == tot
        for q, name in zip(qs, ("wq_10", "wq_50", "wq_90")):
            idx = np.flatnonzero(cum >= q * tot)
            want = vv[idx[0]] if len(idx) else vv[-1]
            assert getattr(r, name) == want, (r.k, q)
