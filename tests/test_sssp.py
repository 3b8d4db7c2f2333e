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
