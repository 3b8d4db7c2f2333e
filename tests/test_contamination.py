"""Decontamination operator: the three execution shapes agree with a
brute-force oracle (broadcast/semijoin exact; bloom an upper bound that
never misses a contaminated doc)."""

import numpy as np
import pyarrow as pa
import pytest

from bqf_ray.pipelines.contamination import (benchmark_shingle_set,
                                             decontaminate)
from bqf_ray.sources.pages import generate_pages

N = 3


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray
    t = generate_pages(600, seed=33, dup_frac=0.1, near_dup_frac=0.1)
    t = t.append_column("doc_id", pa.array(np.arange(len(t), dtype=np.int64)))
    bench_mask = np.arange(len(t)) % 10 == 0
    bench = t.filter(pa.array(bench_mask))
    corp = t.filter(pa.array(~bench_mask))
    return (ray.data.from_arrow(corp).repartition(4),
            ray.data.from_arrow(bench).repartition(2), corp, bench)


def _brute(corp: pa.Table, bench: pa.Table) -> dict[int, int]:
    def grams(text):
        toks = text.split()
        return {" ".join(toks[i:i + N]) for i in range(len(toks) - N + 1)}

    bset = set()
    for txt in bench.column("text").to_pylist():
        bset |= grams(txt)
    out = {}
    for did, txt in zip(corp.column("doc_id").to_pylist(),
                        corp.column("text").to_pylist()):
        k = len(grams(txt) & bset)
        if k:
            out[did] = k
    return out


def test_broadcast_matches_bruteforce(corpus):
    ds, bds, corp, bench = corpus
    want = _brute(corp, bench)
    got = {int(r["doc_id"]): int(r["n_contaminated"])
           for r in decontaminate(ds, bds, n=N).take_all()}
    assert got == want
    assert len(want) > 20          # the fixture genuinely overlaps


def test_semijoin_matches_broadcast(corpus):
    ds, bds, corp, bench = corpus
    want = _brute(corp, bench)
    got = {int(r["doc_id"]): int(r["n_contaminated"])
           for r in decontaminate(ds, bds, n=N,
                                  method="semijoin").take_all()}
    assert got == want


def test_bloom_is_upper_bound_with_full_recall(corpus):
    ds, bds, corp, bench = corpus
    want = _brute(corp, bench)
    got = {int(r["doc_id"]): int(r["n_contaminated"])
           for r in decontaminate(ds, bds, n=N, method="bloom",
                                  bloom_fp=0.001).take_all()}
    # no contaminated doc escapes, and no count is undercounted
    for did, k in want.items():
        assert got.get(did, 0) >= k
    # FP inflation stays small at fp=1e-3
    extra = sum(got.values()) - sum(want.values())
    assert extra <= max(10, 0.01 * sum(want.values()))


def test_benchmark_set_is_sorted_distinct(corpus):
    _, bds, _, _ = corpus
    keys = benchmark_shingle_set(bds, n=N)
    assert keys.dtype == np.uint64
    assert np.all(keys[:-1] < keys[1:])


def _vec_fixture(n=400, dim=16, seed=9):
    rng = np.random.RandomState(seed)
    m = rng.normal(size=(n, dim))
    # plant near-copies of the "benchmark" rows (ids divisible by 20)
    for i in range(0, n, 20):
        j = i + 7
        if j < n:
            m[j] = m[i] + rng.normal(scale=0.01, size=dim)
    return m


def test_embedding_decontaminate_broadcast_exact(ray_session):
    import ray

    from bqf_ray.pipelines.contamination import embedding_decontaminate
    m = _vec_fixture()
    ids = np.arange(len(m), dtype=np.int64)
    bench_mask = ids % 20 == 0
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(m.astype(np.float64)))})
    full = ray.data.from_arrow(t).repartition(4)

    def _part(keep_bench):
        def f(b):
            vid = np.asarray(b.column("vec_id"))
            mask = (vid % 20 == 0) if keep_bench else (vid % 20 != 0)
            return b.filter(pa.array(mask))
        return f

    corpus = full.map_batches(_part(False), batch_format="pyarrow")
    bench = full.map_batches(_part(True), batch_format="pyarrow")
    got = (embedding_decontaminate(corpus, bench, threshold=0.95)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    n = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = n @ n[bench_mask].T
    want_max = cos[~bench_mask].max(axis=1)
    assert len(got) == int((~bench_mask).sum())
    np.testing.assert_allclose(got["max_cos"].to_numpy(), want_max,
                               rtol=0, atol=1e-12)
    assert (got["contaminated"].to_numpy()
            == (want_max >= 0.95)).all()
    assert got["contaminated"].sum() >= 15   # the planted near-copies


def test_embedding_decontaminate_blocked_subset(ray_session):
    import ray

    from bqf_ray.pipelines.contamination import embedding_decontaminate
    m = _vec_fixture()
    ids = np.arange(len(m), dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(m.astype(np.float64)))})
    full = ray.data.from_arrow(t).repartition(4)

    def _part(keep_bench):
        def f(b):
            vid = np.asarray(b.column("vec_id"))
            mask = (vid % 20 == 0) if keep_bench else (vid % 20 != 0)
            return b.filter(pa.array(mask))
        return f

    corpus = full.map_batches(_part(False), batch_format="pyarrow")
    bench = full.map_batches(_part(True), batch_format="pyarrow")
    exact = embedding_decontaminate(corpus, bench, 0.95).to_pandas()
    exact_ids = set(exact[exact["contaminated"]]["vec_id"])
    got = embedding_decontaminate(corpus, bench, 0.95,
                                  method="blocked").to_pandas()
    assert set(got["vec_id"]) <= exact_ids        # no false flags
    assert len(got) >= 0.9 * len(exact_ids)       # multi-table recall
