"""random_walks vs an independent hashlib/dict sequential reference."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:16], 16)


def _ref_walks(edges, seeds, L, W, salt):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    adj = {k: sorted(v) for k, v in adj.items()}
    rows = set()
    for s in seeds:
        for j in range(W):
            wid = s * W + j
            cur = s
            rows.add((wid, s, 0, s))
            for k in range(1, L + 1):
                nbrs = adj.get(cur, [])
                if not nbrs:
                    break
                cur = nbrs[_h64(f"{wid}|{k}|{cur}|{salt}") % len(nbrs)]
                rows.add((wid, s, k, cur))
    return rows


@pytest.mark.parametrize("algo", ["md5", "xx64"])
def test_random_walks_deterministic_and_md5_exact(ray_session, algo):
    import ray

    from bqf_ray.pipelines.graph import random_walks
    rng = np.random.default_rng(29)
    m = 500
    a = rng.integers(0, 60, m).astype(np.int64)
    b = rng.integers(0, 60, m).astype(np.int64)
    tbl = pa.table({"a": pa.array(a), "b": pa.array(b)})
    seeds = np.array([0, 7, 13, 59], dtype=np.int64)
    got = random_walks(ray.data.from_arrow(tbl).repartition(4), seeds,
                       walk_len=6, walks_per_seed=3, salt="t",
                       algo=algo).to_pandas()
    got_set = set(map(tuple, got.to_numpy().tolist()))
    if algo == "md5":
        exp = _ref_walks(list(zip(a.tolist(), b.tolist())), seeds,
                         6, 3, "t")
        assert got_set == exp
    # partitioning invariance for both algos
    got2 = random_walks(ray.data.from_arrow(tbl).repartition(11), seeds,
                        walk_len=6, walks_per_seed=3, salt="t",
                        algo=algo).to_pandas()
    assert got_set == set(map(tuple, got2.to_numpy().tolist()))


def test_random_walks_isolated_seed_and_budget(ray_session):
    import ray

    from bqf_ray.pipelines.graph import random_walks
    tbl = pa.table({"a": pa.array([1, 2], pa.int64()),
                    "b": pa.array([2, 3], pa.int64())})
    out = random_walks(ray.data.from_arrow(tbl),
                       np.array([99], dtype=np.int64),
                       walk_len=3, walks_per_seed=2).to_pandas()
    # isolated seed: only the two step-0 rows
    assert sorted(map(tuple, out.to_numpy().tolist())) \
        == [(198, 99, 0, 99), (199, 99, 0, 99)]
    # explicit broadcast mode still raises past the budget; the auto
    # default routes to the sharded tier instead (tested below)
    with pytest.raises(ValueError, match="budget"):
        random_walks(ray.data.from_arrow(tbl), np.array([1]),
                     broadcast_budget_bytes=8,
                     mode="broadcast").take_all()


def test_walks_sharded_equals_broadcast(ray_session):
    """The sharded tier must emit the bit-identical corpus (same hash
    rule over the same sorted adjacency)."""
    import ray

    from bqf_ray.pipelines.graph import random_walks
    rng = np.random.default_rng(5)
    E, N = 3000, 200
    tbl = pa.table({
        "a": pa.array(rng.integers(0, N, E).astype(np.int64)),
        "b": pa.array(rng.integers(0, N, E).astype(np.int64))})
    seeds = np.array([0, 3, 77], dtype=np.int64)
    cols = ["walk_id", "step", "node"]
    a = (random_walks(ray.data.from_arrow(tbl), seeds, walk_len=4,
                      walks_per_seed=2, mode="broadcast")
         .to_pandas().sort_values(["walk_id", "step"])
         .reset_index(drop=True))
    b = (random_walks(ray.data.from_arrow(tbl), seeds, walk_len=4,
                      walks_per_seed=2, mode="sharded", num_shards=5)
         .to_pandas().sort_values(["walk_id", "step"])
         .reset_index(drop=True))
    assert a[cols].equals(b[cols])


def test_walks_auto_routes_past_budget(ray_session):
    import ray

    from bqf_ray.pipelines.graph import random_walks
    rng = np.random.default_rng(9)
    tbl = pa.table({
        "a": pa.array(rng.integers(0, 60, 500).astype(np.int64)),
        "b": pa.array(rng.integers(0, 60, 500).astype(np.int64))})
    seeds = np.array([1, 2], dtype=np.int64)
    a = (random_walks(ray.data.from_arrow(tbl), seeds, walk_len=3,
                      walks_per_seed=1, mode="broadcast")
         .to_pandas().sort_values(["walk_id", "step"])
         .reset_index(drop=True))
    # budget of 1 byte forces the sharded tier through auto
    b = (random_walks(ray.data.from_arrow(tbl), seeds, walk_len=3,
                      walks_per_seed=1, mode="auto",
                      broadcast_budget_bytes=1, num_shards=3)
         .to_pandas().sort_values(["walk_id", "step"])
         .reset_index(drop=True))
    assert a[["walk_id", "step", "node"]].equals(
        b[["walk_id", "step", "node"]])
