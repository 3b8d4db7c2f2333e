"""Fixed-round k-truss peel vs a sequential peel reference."""

import numpy as np
import pyarrow as pa
import pytest


def _ref_ktruss(edges, k, rounds):
    cur = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    for _ in range(rounds):
        if not cur:
            break
        adj = {}
        for a, b in cur:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        nxt = {(a, b) for a, b in cur
               if len(adj[a] & adj[b]) >= k - 2}
        if nxt == cur:
            break
        cur = nxt
    return cur


@pytest.mark.parametrize("k,rounds", [(3, 1), (3, 3), (4, 16)])
def test_ktruss_matches_reference(ray_session, k, rounds):
    import ray

    from bqf_ray.pipelines.graph import ktruss
    rng = np.random.default_rng(17)
    m = 900
    a = rng.integers(0, 90, m).astype(np.int64)
    b = rng.integers(0, 90, m).astype(np.int64)
    tbl = pa.table({"a": pa.array(a), "b": pa.array(b)})
    got = ktruss(ray.data.from_arrow(tbl).repartition(5), k,
                 rounds=rounds).to_pandas()
    got_set = {tuple(x) for x in got[["a", "b"]].to_numpy()} \
        if len(got) else set()
    exp = _ref_ktruss(list(zip(a.tolist(), b.tolist())), k, rounds)
    assert got_set == exp


def test_ktruss_k2_is_identity(ray_session):
    import ray

    from bqf_ray.pipelines.graph import canonical_edges, ktruss
    tbl = pa.table({"a": pa.array([1, 2, 5], pa.int64()),
                    "b": pa.array([2, 3, 5], pa.int64())})
    got = ktruss(ray.data.from_arrow(tbl), 2, rounds=4).to_pandas()
    exp = canonical_edges(ray.data.from_arrow(tbl)).to_pandas()
    assert sorted(map(tuple, got.to_numpy().tolist())) \
        == sorted(map(tuple, exp.to_numpy().tolist()))
