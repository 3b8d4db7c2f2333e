"""Embedding ops: normalization, quantization roundtrip distortion."""

import numpy as np
import pyarrow as pa
import pytest

from bqf_ray.pipelines.embeddings import (embedding_stats,
                                          normalize_embeddings,
                                          quantize_embeddings)


@pytest.fixture(scope="module")
def vecs(ray_session):
    import ray
    rng = np.random.RandomState(3)
    m = rng.normal(size=(300, 32)).astype(np.float32)
    m[0] = 0                                   # zero vector edge case
    offs = np.arange(301, dtype=np.int32) * 32
    col = pa.ListArray.from_arrays(pa.array(offs), pa.array(m.reshape(-1)))
    t = pa.table({"vec_id": pa.array(np.arange(300, dtype=np.int64)),
                  "embedding": col})
    return m, ray.data.from_arrow(t).repartition(3)


def test_normalize_unit_norm(vecs):
    m, ds = vecs
    out = normalize_embeddings(ds).take_all()
    for r in out:
        n = np.linalg.norm(r["embedding"])
        if r["vec_id"] == 0:
            assert n == 0.0
        else:
            assert abs(n - 1.0) < 1e-5


def test_quantize_roundtrip_cosine(vecs):
    m, ds = vecs
    rows = {r["vec_id"]: r for r in quantize_embeddings(ds).take_all()}
    deq = np.stack([np.asarray(rows[i]["codes"], dtype=np.float64)
                    * rows[i]["scale"] for i in range(len(m))])
    a = m[1:51].astype(np.float64)
    b = deq[1:51]
    for x, y in zip(a, b):
        cos = x @ y / (np.linalg.norm(x) * np.linalg.norm(y))
        assert cos > 0.995, cos                # int8 keeps cosine ≈ 1
    # codes bounded
    for r in rows.values():
        c = np.asarray(r["codes"], dtype=np.int64)
        assert c.min() >= -127 and c.max() <= 127


def test_stats_match_numpy(vecs):
    m, ds = vecs
    out = {r["vec_id"]: r for r in embedding_stats(ds).take_all()}
    md = m.astype(np.float64)
    for i in [0, 1, 7, 299]:
        ss = np.cumsum(md[i] * md[i])[-1]
        assert out[i]["l2_norm"] == np.sqrt(ss)
        assert out[i]["dim"] == 32
        assert out[i]["max_abs"] == np.abs(md[i]).max()


def test_embedding_covariance_partition_invariant(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from bqf_ray.pipelines.embeddings import embedding_covariance
    rng = np.random.default_rng(6)
    n, d = 500, 8
    vecs = rng.normal(0, 0.3, (n, d)).astype(np.float32)
    tbl = pa.table({"embedding": pa.array(list(vecs),
                                          pa.list_(pa.float32()))})

    def run(parts):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        df = embedding_covariance(ds).to_pandas() \
            .sort_values(["i", "j"]).reset_index(drop=True)
        return df

    a, b = run(1), run(7)
    assert a.equals(b)
    # reference: quantized numpy
    q = np.floor(vecs.astype(np.float64) * 1000 + 0.5).astype(np.int64)
    S = q.T @ q
    got = {(r.i, r.j): r.s for r in a.itertuples()}
    assert got[(-1, -1)] == n
    for i in range(d):
        assert got[(i, -1)] == q[:, i].sum()
        for j in range(i, d):
            assert got[(i, j)] == S[i, j]


def test_pca_fit_matches_sequential_and_invariant(ray_session):
    """Eigenspectrum is bit-identical to a sequential numpy reference
    computed from the SAME quantized integers, partitioning-invariant,
    and the planted dominant direction is recovered."""
    import ray
    from bqf_ray.pipelines.embeddings import pca_fit
    rng = np.random.default_rng(11)
    n, d = 3000, 8
    direction = rng.normal(size=d)
    direction /= np.linalg.norm(direction)
    vecs = (rng.normal(0, 5, (n, 1)) * direction
            + rng.normal(0, 0.3, (n, d))).astype(np.float32)
    tbl = pa.table({"embedding": pa.array(list(vecs),
                                          pa.list_(pa.float32()))})
    outs = []
    for parts in (1, 9):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        outs.append(pca_fit(ds))
    ev_a, comp_a, mean_a, n_a = outs[0]
    ev_b, comp_b, mean_b, n_b = outs[1]
    assert np.array_equal(ev_a, ev_b) and np.array_equal(comp_a, comp_b)
    assert n_a == n_b == n
    # sequential reference over the same quantization
    q = np.floor(vecs.astype(np.float64) * 1000 + 0.5).astype(np.int64)
    S = q.T @ q
    si = q.sum(axis=0)
    cov = (n * S - np.outer(si, si)).astype(np.float64) \
        / (float(n) * n * 1000 * 1000)
    # eigh, not eigvalsh: the two use different LAPACK drivers and
    # differ in the last ulp — pca_fit pins the eigh path
    ref = np.sort(np.linalg.eigh(cov)[0])[::-1]
    assert np.array_equal(ev_a, ref)
    # planted 1-D structure dominates; top component aligns
    assert ev_a[0] / ev_a.sum() > 0.9
    assert abs(np.dot(comp_a[0], direction)) > 0.99
    assert np.allclose(mean_a, q.sum(axis=0) / (n * 1000.0))


def test_pca_summary_and_project(ray_session):
    """Bound flags hold; projection separates two planted clusters
    along the top component."""
    import ray
    from bqf_ray.pipelines.embeddings import (pca_fit, pca_project,
                                              pca_summary)
    rng = np.random.default_rng(13)
    n, d = 2000, 6
    labels = rng.integers(0, 2, n)
    centers = np.array([[3.0] + [0.0] * (d - 1),
                        [-3.0] + [0.0] * (d - 1)])
    vecs = (centers[labels] + rng.normal(0, 0.4, (n, d))
            ).astype(np.float32)
    tbl = pa.table({"vid": pa.array(np.arange(n), pa.int64()),
                    "embedding": pa.array(list(vecs),
                                          pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(tbl).repartition(5)
    summ = pca_summary(ds).to_pandas()
    assert summ.eig_sum_ok.iloc[0] and summ.psd_ok.iloc[0]
    assert summ.n.iloc[0] == n and summ.d.iloc[0] == d
    assert summ.trace.iloc[0] > 0
    ev, comps, mean, _ = pca_fit(ds)
    out = pca_project(ds, comps, mean, k=2).to_pandas()
    proj = np.array(out.pca.tolist())
    assert proj.shape == (n, 2)
    lab = out.vid.to_numpy() % 0 + labels[out.vid.to_numpy()]
    m0, m1 = proj[lab == 0, 0].mean(), proj[lab == 1, 0].mean()
    assert abs(m0 - m1) > 4           # clusters split on component 0
    assert np.sign(m0) != np.sign(m1)
