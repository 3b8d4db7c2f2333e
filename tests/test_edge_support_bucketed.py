"""Bucketed (distributed) edge-triangle-support tier: bit-identical to
the broadcast plan, and the consumers (ktruss, clustering) produce the
same answers on either plan."""
import numpy as np
import pyarrow as pa
import ray


def _ds(tbl, parts=5):
    return ray.data.from_arrow(tbl).repartition(parts)


def _rand_graph(seed, m=2000, n=120):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    return pa.table({"a": pa.array(a, pa.int64()),
                     "b": pa.array(b, pa.int64())})


def _support(tbl, mode, **kw):
    from bqf_ray.pipelines.graph import edge_triangle_support
    df = edge_triangle_support(_ds(tbl), mode=mode, **kw).to_pandas()
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def test_bucketed_support_bit_identical(ray_session):
    for seed in (7, 99):
        tbl = _rand_graph(seed)
        bc = _support(tbl, "broadcast")
        bk = _support(tbl, "bucketed", num_buckets=13)
        assert bc.equals(bk)


def test_bucketed_support_empty_and_tiny(ray_session):
    from bqf_ray.pipelines.graph import edge_triangle_support
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
    assert edge_triangle_support(_ds(empty), mode="bucketed").count() == 0
    # a single triangle, plus a dangling support-0 edge
    tbl = pa.table({"a": pa.array([1, 2, 3, 3], pa.int64()),
                    "b": pa.array([2, 3, 1, 9], pa.int64())})
    bk = _support(tbl, "bucketed")
    assert list(bk["support"]) == [1, 1, 1, 0]


def test_ktruss_same_on_either_plan(ray_session):
    from bqf_ray.pipelines.graph import ktruss
    tbl = _rand_graph(17, m=1500, n=80)
    outs = []
    for mode in ("broadcast", "bucketed"):
        df = ktruss(_ds(tbl), 4, rounds=4, mode=mode).to_pandas() \
            .sort_values(["a", "b"]).reset_index(drop=True)
        outs.append(df)
    assert outs[0].equals(outs[1])
    assert len(outs[0]) > 0


def test_clustering_coefficients_same_on_either_plan(ray_session):
    from bqf_ray.pipelines.graph import clustering_coefficients
    tbl = _rand_graph(23, m=1200, n=70)
    outs = []
    for mode in ("broadcast", "bucketed"):
        df = clustering_coefficients(_ds(tbl), mode=mode).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        outs.append(df)
    assert outs[0].equals(outs[1])
    assert len(outs[0]) > 0


def test_bucketed_partitioning_invariance(ray_session):
    from bqf_ray.pipelines.graph import edge_triangle_support
    tbl = _rand_graph(41, m=1200, n=60)
    outs = []
    for parts in (1, 4, 11):
        df = edge_triangle_support(
            ray.data.from_arrow(tbl).repartition(parts),
            mode="bucketed", num_buckets=7).to_pandas() \
            .sort_values(["a", "b"]).reset_index(drop=True)
        outs.append(df)
    assert outs[0].equals(outs[1]) and outs[0].equals(outs[2])
    assert len(outs[0]) > 0
