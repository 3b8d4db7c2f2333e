"""Sharded plans for kcore / label_propagation / hits: identical
results vs the broadcast plans on random graphs, plus auto dispatch."""

import numpy as np
import pyarrow as pa
import pytest

from bqf_ray.pipelines.graph import hits, kcore, label_propagation


def _edges(seed, E=2500, N=250):
    rng = np.random.default_rng(seed)
    return pa.table({
        "a": pa.array(rng.integers(0, N, E).astype(np.int64)),
        "b": pa.array(rng.integers(0, N, E).astype(np.int64))})


@pytest.mark.parametrize("k", [2, 4])
def test_kcore_sharded_equals_broadcast(ray_session, k):
    import ray
    tbl = _edges(31)
    a = kcore(ray.data.from_arrow(tbl).repartition(5), k, rounds=5,
              mode="broadcast").to_pandas().sort_values("node")
    b = kcore(ray.data.from_arrow(tbl).repartition(5), k, rounds=5,
              mode="sharded", num_shards=6).to_pandas().sort_values("node")
    assert a["node"].tolist() == b["node"].tolist()
    assert a["core_deg"].tolist() == b["core_deg"].tolist()


def test_kcore_sharded_unconverged_rounds(ray_session):
    """rounds=1 exercises the final extra-degree-pass path."""
    import ray
    tbl = _edges(37, E=900, N=120)
    a = kcore(ray.data.from_arrow(tbl), 3, rounds=1,
              mode="broadcast").to_pandas().sort_values("node")
    b = kcore(ray.data.from_arrow(tbl), 3, rounds=1,
              mode="sharded", num_shards=4).to_pandas().sort_values("node")
    assert a["node"].tolist() == b["node"].tolist()
    assert a["core_deg"].tolist() == b["core_deg"].tolist()


def test_kcore_auto_dispatch(ray_session):
    import ray
    tbl = _edges(41, E=600, N=80)
    a = kcore(ray.data.from_arrow(tbl), 2, rounds=4, mode="broadcast")
    b = kcore(ray.data.from_arrow(tbl), 2, rounds=4, mode="auto",
              node_budget=5, num_shards=3)
    pa_, pb = (a.to_pandas().sort_values("node").reset_index(drop=True),
               b.to_pandas().sort_values("node").reset_index(drop=True))
    assert pa_.equals(pb)


@pytest.mark.parametrize("rounds", [1, 3])
def test_lpa_sharded_equals_broadcast(ray_session, rounds):
    import ray
    tbl = _edges(43)
    a = label_propagation(ray.data.from_arrow(tbl).repartition(4),
                          rounds=rounds, mode="broadcast"
                          ).to_pandas().sort_values("node")
    b = label_propagation(ray.data.from_arrow(tbl).repartition(4),
                          rounds=rounds, mode="sharded", num_shards=5
                          ).to_pandas().sort_values("node")
    assert a["node"].tolist() == b["node"].tolist()
    assert a["community"].tolist() == b["community"].tolist()


def test_lpa_auto_dispatch(ray_session):
    import ray
    tbl = _edges(47, E=500, N=60)
    a = label_propagation(ray.data.from_arrow(tbl), rounds=2,
                          mode="broadcast").to_pandas().sort_values("node")
    b = label_propagation(ray.data.from_arrow(tbl), rounds=2,
                          mode="auto", node_budget=5, num_shards=3
                          ).to_pandas().sort_values("node")
    assert a["community"].tolist() == b["community"].tolist()


@pytest.mark.parametrize("rounds", [1, 2])
def test_hits_sharded_equals_broadcast(ray_session, rounds):
    import ray
    tbl = _edges(53)
    an, ah, aa = hits(ray.data.from_arrow(tbl).repartition(6),
                      "a", "b", rounds=rounds, mode="broadcast")
    bn, bh, ba = hits(ray.data.from_arrow(tbl).repartition(6),
                      "a", "b", rounds=rounds, mode="sharded",
                      num_shards=5)
    assert list(an) == list(bn)
    assert list(ah) == list(bh)
    assert list(aa) == list(ba)


def test_hits_sharded_dataset_output(ray_session):
    import ray
    tbl = _edges(59, E=800, N=90)
    an, ah, aa = hits(ray.data.from_arrow(tbl), "a", "b", rounds=2,
                      mode="broadcast")
    ds = hits(ray.data.from_arrow(tbl), "a", "b", rounds=2,
              mode="sharded", num_shards=4, output="dataset")
    df = ds.to_pandas().sort_values("node").reset_index(drop=True)
    assert df["node"].tolist() == list(an)
    assert df["hub"].tolist() == list(ah)
    assert df["auth"].tolist() == list(aa)


def test_hits_auto_dispatch(ray_session):
    import ray
    tbl = _edges(61, E=500, N=70)
    a = hits(ray.data.from_arrow(tbl), "a", "b", rounds=1,
             mode="broadcast")
    b = hits(ray.data.from_arrow(tbl), "a", "b", rounds=1,
             mode="auto", node_budget=5, num_shards=3)
    assert list(a[0]) == list(b[0])
    assert list(a[1]) == list(b[1])
    assert list(a[2]) == list(b[2])


def test_bfs_sharded_equals_broadcast(ray_session):
    import ray

    from bqf_ray.pipelines.graph import bfs_hops
    tbl = _edges(67, E=2000, N=300)
    seeds = np.array([0, 5], dtype=np.int64)
    a = bfs_hops(ray.data.from_arrow(tbl), seeds, max_hops=4,
                 mode="broadcast").to_pandas().sort_values("node")
    b = bfs_hops(ray.data.from_arrow(tbl), seeds, max_hops=4,
                 mode="sharded", num_shards=5
                 ).to_pandas().sort_values("node")
    assert a["node"].tolist() == b["node"].tolist()
    assert a["hop"].tolist() == b["hop"].tolist()


def test_bfs_auto_handoff(ray_session):
    import ray

    from bqf_ray.pipelines.graph import bfs_hops
    tbl = _edges(71, E=1200, N=200)
    seeds = np.array([3], dtype=np.int64)
    a = bfs_hops(ray.data.from_arrow(tbl), seeds, max_hops=5,
                 mode="broadcast").to_pandas().sort_values("node")
    b = bfs_hops(ray.data.from_arrow(tbl), seeds, max_hops=5,
                 mode="auto", node_budget=10, num_shards=3
                 ).to_pandas().sort_values("node")
    assert a["node"].tolist() == b["node"].tolist()
    assert a["hop"].tolist() == b["hop"].tolist()
