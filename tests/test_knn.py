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
