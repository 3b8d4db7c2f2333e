"""Dataset-to-Dataset similarity join (knn_join)."""
import numpy as np
import pyarrow as pa


def _two_corpora(seed=3, nl=60, nr=300, dim=12):
    rng = np.random.RandomState(seed)
    lm = rng.normal(size=(nl, dim))
    rm = rng.normal(size=(nr, dim))
    rm[10] = rm[11]                  # exact duplicate → cosine ties
    return lm, rm


def test_knn_join_exact_at_full_probe(ray_session):
    import ray

    from bqf_ray.pipelines.knn import knn_bruteforce, knn_join
    lm, rm = _two_corpora()
    lt = pa.table({"vec_id": pa.array(np.arange(len(lm), dtype=np.int64)),
                   "embedding": pa.array(list(lm))})
    rt = pa.table({"vec_id": pa.array(np.arange(len(rm), dtype=np.int64)),
                   "embedding": pa.array(list(rm))})
    left = ray.data.from_arrow(lt).repartition(3)
    right = ray.data.from_arrow(rt).repartition(4)
    got = (knn_join(left, right, k=5, n_cells=8, nprobe=8)
           .to_pandas().sort_values(["query_id", "rank"])
           .reset_index(drop=True))
    want = (knn_bruteforce(right, np.arange(len(lm), dtype=np.int64),
                           lm, k=5, exclude_self=False)
            .to_pandas().sort_values(["query_id", "rank"])
            .reset_index(drop=True))
    assert got.equals(want[["query_id", "neighbor_id", "rank"]]
                      .reset_index(drop=True))


def test_knn_join_recall_at_partial_probe(ray_session):
    import ray

    from bqf_ray.pipelines.knn import knn_bruteforce, knn_join
    lm, rm = _two_corpora(seed=5)
    lt = pa.table({"vec_id": pa.array(np.arange(len(lm), dtype=np.int64)),
                   "embedding": pa.array(list(lm))})
    rt = pa.table({"vec_id": pa.array(np.arange(len(rm), dtype=np.int64)),
                   "embedding": pa.array(list(rm))})
    left = ray.data.from_arrow(lt).repartition(3)
    right = ray.data.from_arrow(rt).repartition(4)
    got = knn_join(left, right, k=5, n_cells=8, nprobe=4).to_pandas()
    want = knn_bruteforce(right, np.arange(len(lm), dtype=np.int64),
                          lm, k=5, exclude_self=False).to_pandas()
    gset = set(map(tuple, got[["query_id", "neighbor_id"]].to_numpy()))
    wset = set(map(tuple, want[["query_id", "neighbor_id"]].to_numpy()))
    assert len(gset & wset) / len(wset) >= 0.5   # half the cells probed
    # every query still returns k rows
    assert (got.groupby("query_id").size() == 5).all()


def test_pq_recall_clustered(ray_session):
    """PQ with exact re-rank reaches ~1.0 recall on clustered data and
    the codes give 32x compression (8 bytes vs 256)."""
    import ray

    from bqf_ray.pipelines.knn import (_to_matrix, build_pq_index,
                                       knn_bruteforce, knn_pq, train_pq)
    rng = np.random.default_rng(17)
    centers = rng.normal(0, 1, size=(12, 64))
    x = np.concatenate([c + rng.normal(0, 0.15, size=(150, 64))
                        for c in centers]).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(x.reshape(-1)), 64).cast(pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t).repartition(6)
    qids = np.arange(5, dtype=np.int64)
    qv = x[:5].astype(np.float64)
    exact = knn_bruteforce(ds, qids, qv, k=10).to_pandas()
    books = train_pq(ds, m=8, ks=32)
    assert books.shape == (8, 32, 8)
    idx = build_pq_index(ds, books)
    code_col = idx.schema().base_schema.field("__pq_code").type
    assert pa.types.is_fixed_size_list(code_col) and code_col.list_size == 8
    # tight clusters collapse to one code per cluster, so ADC ties:
    # refine must cover the tie group (cluster size 150 < k*16)
    approx = knn_pq(ds, qids, qv, k=10, books=books, index=idx,
                    refine=16).to_pandas()
    ex = exact.groupby("query_id")["neighbor_id"].apply(set)
    ap = approx.groupby("query_id")["neighbor_id"].apply(set)
    recs = [len(ex[q] & ap[q]) / len(ex[q]) for q in ex.index]
    assert min(recs) >= 0.8 and sum(recs) / len(recs) >= 0.9


def test_pq_deterministic_across_partitioning(ray_session):
    import ray

    from bqf_ray.pipelines.knn import _to_matrix, knn_pq, train_pq
    rng = np.random.default_rng(23)
    x = rng.normal(0, 1, size=(600, 32)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(x.reshape(-1)), 32).cast(pa.list_(pa.float32()))})
    qids = np.arange(3, dtype=np.int64)
    qv = x[:3].astype(np.float64)
    outs = []
    for parts in (4, 13):
        ds = ray.data.from_arrow(t).repartition(parts)
        books = train_pq(ds, m=8, ks=16)   # prefix sample: same either way
        out = (knn_pq(ds, qids, qv, k=5, books=books, refine=4)
               .to_pandas().sort_values(["query_id", "rank"])
               .reset_index(drop=True))
        outs.append(out)
    assert outs[0].equals(outs[1])


def test_ivfpq_recall_and_determinism(ray_session):
    """IVF-PQ (residual codes, cell-probed ADC + exact re-rank) on
    clustered data: recall >= 0.8, bit-identical across partitionings."""
    import ray

    from bqf_ray.pipelines.knn import (build_ivfpq_index, knn_bruteforce,
                                       knn_ivfpq)
    rng = np.random.default_rng(31)
    centers = rng.normal(0, 1, size=(10, 64))
    x = np.concatenate([c + rng.normal(0, 0.3, size=(120, 64))
                        for c in centers]).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(x.reshape(-1)), 64).cast(pa.list_(pa.float32()))})
    qids = np.arange(4, dtype=np.int64)
    qv = x[:4].astype(np.float64)
    outs = []
    for parts in (5, 11):
        ds = ray.data.from_arrow(t).repartition(parts)
        idx = build_ivfpq_index(ds, n_cells=16, m=8, ks=16)
        out = (knn_ivfpq(ds, qids, qv, k=10, nprobe=4, refine=16,
                         index=idx).to_pandas()
               .sort_values(["query_id", "rank"]).reset_index(drop=True))
        outs.append(out)
    assert outs[0].equals(outs[1])
    ds = ray.data.from_arrow(t).repartition(5)
    exact = knn_bruteforce(ds, qids, qv, k=10).to_pandas()
    ex = exact.groupby("query_id")["neighbor_id"].apply(set)
    ap = outs[0].groupby("query_id")["neighbor_id"].apply(set)
    recs = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex.index]
    assert sum(recs) / len(recs) >= 0.8
