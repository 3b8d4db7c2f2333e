"""Distributed k-means: bit-exact equality with a sequential reference
(integer-quantized Lloyd is order-independent by construction), plus
partitioning-invariance and guard tests."""

import numpy as np
import pyarrow as pa
import pytest

from bqf_ray.pipelines.clustering import (_assign_to, _quantize,
                                          kmeans_assign,
                                          kmeans_cluster_stats, kmeans_fit)


def _seq_kmeans(x, k, iters, scale_bits, seed, sample=4096):
    """Sequential reference: the same quantized Lloyd, no Ray."""
    scale = 1 << scale_bits
    x0 = x[:sample]
    rng = np.random.RandomState(seed)
    pick = rng.choice(len(x0), min(k, len(x0)), replace=False)
    cents_q = _quantize(x0[pick], scale)
    xq = _quantize(x, scale)
    inertia = []
    for _ in range(iters):
        a = _assign_to(xq, cents_q)
        diff = (xq - cents_q[a]).astype(np.float64)
        inertia.append(int((diff ** 2).sum()))
        new = cents_q.copy()
        for c in range(len(cents_q)):
            m = a == c
            if m.any():
                new[c] = np.array([int(s) // int(m.sum())
                                   for s in xq[m].sum(axis=0,
                                                      dtype=np.int64)])
        cents_q = new
    return cents_q, inertia


@pytest.fixture(scope="module")
def blobs(ray_session):
    import ray
    rng = np.random.default_rng(11)
    centers = rng.normal(0, 0.3, size=(5, 16))
    x = np.concatenate([c + rng.normal(0, 0.05, size=(400, 16))
                        for c in centers])
    x = np.clip(x, -0.99, 0.99).astype(np.float64)
    t = pa.table({
        "vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(x.reshape(-1), pa.float32()), 16).cast(
            pa.list_(pa.float32()))})
    return ray.data.from_arrow(t).repartition(7), x


def test_fit_bit_equals_sequential(blobs):
    ds, x = blobs
    # reference sees the float32-roundtripped values the Dataset holds
    x32 = x.astype(np.float32).astype(np.float64)
    got_c, got_info = kmeans_fit(ds, k=5, iters=4, seed=3)
    ref_c, ref_inertia = _seq_kmeans(x32, k=5, iters=4, scale_bits=20,
                                     seed=3)
    assert np.array_equal(got_c, ref_c)
    assert got_info["inertia"] == ref_inertia
    # inertia is monotone non-increasing under Lloyd
    assert all(a >= b for a, b in zip(ref_inertia, ref_inertia[1:]))


def test_partitioning_invariance(blobs):
    ds, _ = blobs
    a_c, a_i = kmeans_fit(ds, k=5, iters=3, seed=3)
    b_c, b_i = kmeans_fit(ds.repartition(23), k=5, iters=3, seed=3)
    assert np.array_equal(a_c, b_c)
    assert a_i["inertia"] == b_i["inertia"]


def test_assign_and_stats_consistent(blobs):
    ds, x = blobs
    cents_q, _ = kmeans_fit(ds, k=5, iters=3, seed=3)
    assigned = kmeans_assign(ds, cents_q).to_pandas()
    stats = (kmeans_cluster_stats(ds, k=5, iters=3, seed=3).to_pandas()
             .sort_values("cluster").reset_index(drop=True))
    sizes = assigned["cluster"].value_counts().sort_index()
    assert stats["n"].tolist() == sizes.tolist()
    assert int(stats["n"].sum()) == len(x)
    # well-separated blobs: clusters are balanced around 400
    assert stats["n"].min() > 200


def test_quantize_guard():
    with pytest.raises(ValueError, match="exactness envelope"):
        _quantize(np.array([[100.0] * 32]), 1 << 20)
    # dim=128 trips at |x| ≥ 4.0 (m = 2^22 → 128·(2m)² = 2^53) while
    # dim=32 only trips at |x| ≥ 8.0 — the bound scales with dim
    with pytest.raises(ValueError, match="exactness envelope"):
        _quantize(np.full((1, 128), 4.0), 1 << 20)
    _quantize(np.full((1, 32), 4.0), 1 << 20)    # same |x|, smaller dim: ok
    _quantize(np.full((1, 128), 0.9), 1 << 20)   # inside the envelope


def _brute_dbscan(x, sim_threshold, min_pts):
    """Numpy reference for the deterministic DBSCAN label rule:
    core components labeled by MIN core id, borders take the MIN
    core-neighbor label, everything else noise."""
    n = len(x)
    m = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
    sim = m @ m.T
    adj = (sim >= sim_threshold)
    np.fill_diagonal(adj, False)
    deg = adj.sum(axis=1)
    is_core = deg >= min_pts
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        if not is_core[i]:
            continue
        for j in np.nonzero(adj[i] & is_core)[0]:
            ri, rj = find(i), find(int(j))
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
    roles, labels = [], []
    for i in range(n):
        if is_core[i]:
            roles.append("core")
            labels.append(find(i))
        else:
            cores = np.nonzero(adj[i] & is_core)[0]
            if len(cores):
                roles.append("border")
                labels.append(min(find(int(c)) for c in cores))
            else:
                roles.append("noise")
                labels.append(None)
    return roles, labels


@pytest.mark.parametrize("min_pts,thr", [(3, 0.8), (1, 0.9), (50, 0.5)])
def test_dbscan_matches_brute(ray_session, min_pts, thr):
    import ray

    from bqf_ray.pipelines.clustering import dbscan_embeddings
    rng = np.random.default_rng(7)
    centers = rng.normal(0, 1.0, size=(4, 12))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = [c + rng.normal(0, 0.12, size=(60, 12)) for c in centers]
    # add isolated outliers (noise / singleton-core candidates)
    pts.append(rng.normal(0, 1.0, size=(12, 12)))
    x = np.concatenate(pts).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(x.reshape(-1), pa.float32()), 12).cast(
            pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t).repartition(5)
    got = (dbscan_embeddings(ds, sim_threshold=thr, min_pts=min_pts,
                             mode="exact")
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    roles, labels = _brute_dbscan(x.astype(np.float64), thr, min_pts)
    assert got["role"].tolist() == roles
    got_lab = [None if pd_isna else int(v)
               for v, pd_isna in zip(got["cluster_id"],
                                     got["cluster_id"].isna())]
    assert got_lab == labels


def test_dbscan_isolated_core_singleton(ray_session):
    """min_pts=0 makes every point core; points with no neighbor at all
    must still form singleton clusters labeled by their own id."""
    import ray

    from bqf_ray.pipelines.clustering import dbscan_embeddings
    x = np.eye(4, dtype=np.float32)        # orthogonal: cosine 0 apart
    t = pa.table({
        "vec_id": pa.array(np.arange(4, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(x.reshape(-1), pa.float32()), 4).cast(
            pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    got = (dbscan_embeddings(ds, sim_threshold=0.5, min_pts=0,
                             mode="exact")
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert got["role"].tolist() == ["core"] * 4
    assert got["cluster_id"].tolist() == [0, 1, 2, 3]
