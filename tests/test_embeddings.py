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
