"""Node-sharded PageRank plan: bit-identity vs the broadcast plan
(uniform and personalized), dataset output, and the auto dispatch."""

import numpy as np
import pyarrow as pa
import pytest

from bqf_ray.pipelines.graph import pagerank


def _rand_graph(seed, E=3000, N=200):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, N, E).astype(np.int64)
    t = rng.integers(0, N, E).astype(np.int64)
    w = rng.integers(1, 7, E).astype(np.int64)
    return pa.table({"src": pa.array(s), "dst": pa.array(t),
                     "w": pa.array(w)})


@pytest.mark.parametrize("weighted", [False, True])
def test_sharded_bit_equals_broadcast(ray_session, weighted):
    import ray
    tbl = _rand_graph(5)
    wc = "w" if weighted else None
    a = pagerank(ray.data.from_arrow(tbl).repartition(6), "src", "dst",
                 iters=5, weight_col=wc, mode="broadcast")
    b = pagerank(ray.data.from_arrow(tbl).repartition(6), "src", "dst",
                 iters=5, weight_col=wc, mode="sharded", num_shards=7)
    assert list(a[0]) == list(b[0])
    assert a[2] == b[2]
    assert all(int(x) == int(y) for x, y in zip(a[1], b[1]))
    assert int(np.sum(b[1])) == len(b[0]) * b[2]   # exact mass


def test_sharded_ppr_bit_equals_broadcast(ray_session):
    import ray
    tbl = _rand_graph(9)
    seeds = np.array([3, 77, 130], dtype=np.int64)
    a = pagerank(ray.data.from_arrow(tbl).repartition(4), "src", "dst",
                 iters=4, restart_nodes=seeds, mode="broadcast")
    b = pagerank(ray.data.from_arrow(tbl).repartition(4), "src", "dst",
                 iters=4, restart_nodes=seeds, mode="sharded",
                 num_shards=5)
    assert list(a[0]) == list(b[0]) and a[2] == b[2]
    assert all(int(x) == int(y) for x, y in zip(a[1], b[1]))


def test_sharded_ppr_missing_seed_raises(ray_session):
    import ray
    tbl = _rand_graph(2)
    with pytest.raises(ValueError, match="absent"):
        pagerank(ray.data.from_arrow(tbl), "src", "dst", iters=2,
                 restart_nodes=np.array([10_000], dtype=np.int64),
                 mode="sharded", num_shards=3)


def test_sharded_dataset_output(ray_session):
    """output='dataset' returns per-shard Arrow refs — nothing
    node-sized on the driver — matching the arrays output exactly."""
    import ray
    tbl = _rand_graph(11)
    nodes, ranks, unit = pagerank(
        ray.data.from_arrow(tbl), "src", "dst", iters=3,
        mode="broadcast")
    ds = pagerank(ray.data.from_arrow(tbl), "src", "dst", iters=3,
                  mode="sharded", num_shards=4, output="dataset")
    df = ds.to_pandas().sort_values("node").reset_index(drop=True)
    assert df["node"].tolist() == list(nodes)
    assert df["rank"].tolist() == [int(r) for r in ranks]
    assert (df["unit"] == unit).all()


def test_auto_dispatch_uses_sharded_past_budget(ray_session):
    """node_budget=1 forces the sharded plan through the auto path;
    results still bit-match broadcast."""
    import ray
    tbl = _rand_graph(13, E=800, N=60)
    a = pagerank(ray.data.from_arrow(tbl), "src", "dst", iters=3,
                 mode="broadcast")
    b = pagerank(ray.data.from_arrow(tbl), "src", "dst", iters=3,
                 mode="auto", node_budget=1, num_shards=3)
    assert list(a[0]) == list(b[0])
    assert all(int(x) == int(y) for x, y in zip(a[1], b[1]))


def test_sharded_single_shard(ray_session):
    import ray
    tbl = _rand_graph(17, E=400, N=40)
    a = pagerank(ray.data.from_arrow(tbl), "src", "dst", iters=3,
                 mode="broadcast")
    b = pagerank(ray.data.from_arrow(tbl), "src", "dst", iters=3,
                 mode="sharded", num_shards=1)
    assert all(int(x) == int(y) for x, y in zip(a[1], b[1]))


@pytest.mark.parametrize("mode,shards", [("broadcast", 0), ("sharded", 4)])
def test_pagerank_checkpoint_resume(ray_session, tmp_path, mode, shards):
    """3 checkpointed iterations + a resumed run to 6 must equal a
    direct 6-iteration run bit-for-bit (both plans)."""
    import ray
    tbl = _rand_graph(23, E=1500, N=150)
    kw = dict(mode=mode)
    if shards:
        kw["num_shards"] = shards
    ck = str(tmp_path / f"ck_{mode}")
    direct = pagerank(ray.data.from_arrow(tbl), "src", "dst", iters=6,
                      **kw)
    pagerank(ray.data.from_arrow(tbl), "src", "dst", iters=3,
             checkpoint_dir=ck, **kw)
    resumed = pagerank(ray.data.from_arrow(tbl), "src", "dst", iters=6,
                       checkpoint_dir=ck, **kw)
    assert list(direct[0]) == list(resumed[0])
    assert all(int(x) == int(y) for x, y in zip(direct[1], resumed[1]))
    # stale/foreign checkpoints are ignored (different damping → fresh)
    other = pagerank(ray.data.from_arrow(tbl), "src", "dst", iters=2,
                     d_num=4, d_den=5, checkpoint_dir=ck, **kw)
    ref = pagerank(ray.data.from_arrow(tbl), "src", "dst", iters=2,
                   d_num=4, d_den=5, **kw)
    assert all(int(x) == int(y) for x, y in zip(other[1], ref[1]))
