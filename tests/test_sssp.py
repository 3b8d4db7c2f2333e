"""Fixed-round Bellman-Ford SSSP vs a sequential relaxation reference."""

import numpy as np
import pyarrow as pa
import pytest


def _ref_sssp(edges, seeds, rounds):
    dist = {int(s): 0 for s in seeds}
    for _ in range(rounds):
        nxt = dict(dist)
        for a, b, w in edges:
            for x, y in ((a, b), (b, a)):
                if x in dist and dist[x] + w < nxt.get(y, 1 << 62):
                    nxt[y] = dist[x] + w
        if nxt == dist:
            break
        dist = nxt
    return dist


@pytest.mark.parametrize("rounds", [1, 3, 16])
def test_sssp_matches_reference(ray_session, rounds):
    import ray

    from bqf_ray.pipelines.graph import sssp
    rng = np.random.default_rng(13)
    m = 600
    a = rng.integers(0, 120, m)
    b = rng.integers(0, 120, m)
    keep = a != b
    a, b = a[keep], b[keep]
    w = rng.integers(1, 50, len(a))
    tbl = pa.table({"a": pa.array(a, pa.int64()),
                    "b": pa.array(b, pa.int64()),
                    "w": pa.array(w, pa.int64())})
    seeds = np.array([0, 7, 64], dtype=np.int64)
    got = sssp(ray.data.from_arrow(tbl).repartition(5), seeds,
               rounds=rounds).to_pandas()
    exp = _ref_sssp(list(zip(a.tolist(), b.tolist(), w.tolist())),
                    seeds, rounds)
    assert dict(zip(got["node"], got["dist"])) == exp


def test_sssp_rejects_nonpositive_weights(ray_session):
    import ray

    from bqf_ray.pipelines.graph import sssp
    tbl = pa.table({"a": pa.array([1], pa.int64()),
                    "b": pa.array([2], pa.int64()),
                    "w": pa.array([0], pa.int64())})
    with pytest.raises(Exception, match="positive"):
        sssp(ray.data.from_arrow(tbl), np.array([1]), rounds=2)


def test_sssp_empty_seeds(ray_session):
    import ray

    from bqf_ray.pipelines.graph import sssp
    tbl = pa.table({"a": pa.array([1], pa.int64()),
                    "b": pa.array([2], pa.int64()),
                    "w": pa.array([3], pa.int64())})
    out = sssp(ray.data.from_arrow(tbl), np.array([], dtype=np.int64))
    assert out.num_rows == 0


def _rand_wgraph(seed, E=2500, N=300):
    rng = np.random.default_rng(seed)
    return pa.table({
        "a": pa.array(rng.integers(0, N, E).astype(np.int64)),
        "b": pa.array(rng.integers(0, N, E).astype(np.int64)),
        "w": pa.array(rng.integers(1, 9, E).astype(np.int64))})


def test_sssp_sharded_equals_broadcast(ray_session):
    import ray

    from bqf_ray.pipelines.graph import sssp
    tbl = _rand_wgraph(21)
    seeds = np.array([0, 7], dtype=np.int64)
    a = sssp(ray.data.from_arrow(tbl).repartition(5), seeds, rounds=5,
             mode="broadcast").to_pandas().sort_values("node")
    b = sssp(ray.data.from_arrow(tbl).repartition(5), seeds, rounds=5,
             mode="sharded", num_shards=6).to_pandas().sort_values("node")
    assert a["node"].tolist() == b["node"].tolist()
    assert a["dist"].tolist() == b["dist"].tolist()


def test_sssp_auto_handoff_equals_broadcast(ray_session):
    """node_budget=10 forces the mid-run handoff to the sharded
    continuation; the final table must still be identical."""
    import ray

    from bqf_ray.pipelines.graph import sssp
    tbl = _rand_wgraph(33, E=1500, N=200)
    seeds = np.array([3], dtype=np.int64)
    a = sssp(ray.data.from_arrow(tbl), seeds, rounds=6,
             mode="broadcast").to_pandas().sort_values("node")
    b = sssp(ray.data.from_arrow(tbl), seeds, rounds=6, mode="auto",
             node_budget=10, num_shards=4).to_pandas().sort_values("node")
    assert a["node"].tolist() == b["node"].tolist()
    assert a["dist"].tolist() == b["dist"].tolist()
