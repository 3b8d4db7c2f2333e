"""Similarity search over an embedding column (list<float>).

- :func:`knn_bruteforce` — exact cosine top-k: the query matrix is
  broadcast once via ``ray.put`` and every corpus batch matmuls against it
  (numpy float64), emitting its local top-k per query; a final small
  reduce keeps the global top-k.  Zero shuffle of the corpus; exact and
  SQL-oracle-checkable.
- :func:`knn_lsh` — the scale path: random-hyperplane LSH buckets both
  sides (b-bit signatures, optional multi-probe), exact re-rank inside
  buckets.  Approximate recall, same output schema.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    lst = col.to_pylist()
    return np.asarray(lst, dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def knn_bruteforce(ds, query_ids: np.ndarray, query_vecs: np.ndarray,
                   k: int = 10, vec_col: str = "embedding",
                   id_col: str = "vec_id", exclude_self: bool = True,
                   concurrency: int = 2):
    """Exact cosine top-k of each query against the corpus Dataset.

    Returns Dataset[(query_id, neighbor_id, rank)] with rank 1..k ordered
    by (-cosine, neighbor_id) — a deterministic tie-break shared with the
    SQL oracle."""
    import ray

    qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    ref = ray.put((qids, qn))

    class LocalTopK:
        def __init__(self):
            self.qids, self.qn = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cids = np.asarray(batch.column(id_col), dtype=np.int64)
            cm = _normalize(_to_matrix(batch.column(vec_col)))
            cos = self.qn @ cm.T                     # (nq, nb)
            if exclude_self:
                same = self.qids[:, None] == cids[None, :]
                cos[same] = -np.inf
            kk = min(k, cos.shape[1])
            idx = np.argpartition(-cos, kk - 1, axis=1)[:, :kk]
            rows_q = np.repeat(self.qids, kk)
            rows_c = cids[idx.reshape(-1)]
            rows_s = np.take_along_axis(cos, idx, axis=1).reshape(-1)
            keep = np.isfinite(rows_s)
            return pa.table({
                "query_id": pa.array(rows_q[keep]),
                "neighbor_id": pa.array(rows_c[keep]),
                "cosine": pa.array(rows_s[keep]),
            })

    def global_topk(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        cid = np.asarray(group.column("neighbor_id"))
        cos = np.asarray(group.column("cosine"))
        order = np.lexsort((cid, -cos))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid, dtype=np.int64)),
            "neighbor_id": pa.array(cid[order]),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        })

    local = ds.map_batches(LocalTopK, batch_format="pyarrow", batch_size=1024,
                           concurrency=concurrency)
    return local.groupby("query_id").map_groups(global_topk,
                                                batch_format="pyarrow")


def train_ivf_centroids(ds, n_cells: int = 64, sample: int = 4096,
                        iters: int = 10, seed: int = 13,
                        vec_col: str = "embedding") -> np.ndarray:
    """Deterministic k-means (seeded init, fixed iterations) on a corpus
    sample → (n_cells, dim) L2-normalized centroids.  The IVF coarse
    quantizer's training pass; at 10^12 scale the sample comes from
    ``ds.random_sample`` with a fixed seed."""
    tbl = ds.limit(sample).to_pandas()
    x = _normalize(np.stack(tbl[vec_col].to_numpy()).astype(np.float64))
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def knn_ivf(ds, query_ids: np.ndarray, query_vecs: np.ndarray, k: int = 10,
            n_cells: int = 64, nprobe: int = 8, seed: int = 13,
            vec_col: str = "embedding", id_col: str = "vec_id",
            exclude_self: bool = True):
    """IVF approximate top-k: corpus rows route to their nearest centroid
    cell; each query exact-ranks only rows in its ``nprobe`` nearest cells.
    Fraction of corpus scanned ≈ nprobe/n_cells; recall grows with nprobe
    (tested vs brute force).  Same output schema as :func:`knn_bruteforce`
    (query_id, neighbor_id, rank)."""
    import ray

    cents = train_ivf_centroids(ds, n_cells, seed=seed, vec_col=vec_col)
    qv = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    # each query's probe cells
    qcell = np.argsort(-(qv @ cents.T), axis=1)[:, :nprobe]
    ref = ray.put((qids, qv, qcell, cents))

    class CellRank:
        def __init__(self):
            self.qids, self.qv, self.qcell, self.cents = ray.get(ref)
            self.probe_sets = [set(row.tolist()) for row in self.qcell]

        def __call__(self, batch: pa.Table) -> pa.Table:
            cids = np.asarray(batch.column(id_col), dtype=np.int64)
            cm = _normalize(_to_matrix(batch.column(vec_col)))
            cell = np.argmax(cm @ self.cents.T, axis=1)
            rows_q, rows_c, rows_s = [], [], []
            for qi in range(len(self.qids)):
                m = np.isin(cell, self.qcell[qi])
                if not m.any():
                    continue
                cos = self.qv[qi] @ cm[m].T
                ids_m = cids[m]
                if exclude_self:
                    cos = np.where(ids_m == self.qids[qi], -np.inf, cos)
                kk = min(k, len(cos))
                idx = np.argpartition(-cos, kk - 1)[:kk]
                rows_q.append(np.full(kk, self.qids[qi], dtype=np.int64))
                rows_c.append(ids_m[idx])
                rows_s.append(cos[idx])
            if not rows_q:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            q = np.concatenate(rows_q)
            c = np.concatenate(rows_c)
            sc = np.concatenate(rows_s)
            keep = np.isfinite(sc)
            return pa.table({"query_id": pa.array(q[keep]),
                             "neighbor_id": pa.array(c[keep]),
                             "cosine": pa.array(sc[keep])})

    def global_topk(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        cid = np.asarray(group.column("neighbor_id"))
        cos = np.asarray(group.column("cosine"))
        order = np.lexsort((cid, -cos))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid, dtype=np.int64)),
            "neighbor_id": pa.array(cid[order]),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        })

    local = ds.map_batches(CellRank, batch_format="pyarrow", batch_size=1024,
                           concurrency=2, num_cpus=0.5)
    return local.groupby("query_id").map_groups(global_topk,
                                                batch_format="pyarrow")


def knn_lsh(ds, query_ids: np.ndarray, query_vecs: np.ndarray, k: int = 10,
            bits: int = 12, dim: int | None = None, seed: int = 7,
            vec_col: str = "embedding", id_col: str = "vec_id",
            exclude_self: bool = True, multi_probe: int = 1):
    """Approximate top-k: b-bit random-hyperplane signatures bucket the
    corpus (one groupby); queries probe their bucket (plus ``multi_probe``
    single-bit flips) and exact-rank inside.  Recall grows with
    multi_probe; documented tradeoff, tested vs brute force."""
    import ray

    qv = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    d = dim or qv.shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(d, bits))
    qsig = (qv @ planes > 0).astype(np.uint64)
    qcode = (qsig << np.arange(bits, dtype=np.uint64)[None, :]).sum(axis=1)
    # multi-probe: original bucket + single-bit flips
    probes = [qcode]
    for b in range(min(multi_probe, bits)):
        probes.append(qcode ^ (np.uint64(1) << np.uint64(b)))
    probe_codes = np.unique(np.concatenate(probes))
    pref = ray.put((qids, qv, set(probe_codes.tolist())))
    planes_ref = ray.put(planes)

    class BucketRank:
        def __init__(self):
            self.qids, self.qv, self.codes = ray.get(pref)
            self.planes = ray.get(planes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cids = np.asarray(batch.column(id_col), dtype=np.int64)
            cm = _normalize(_to_matrix(batch.column(vec_col)))
            sig = (cm @ self.planes > 0).astype(np.uint64)
            code = (sig << np.arange(sig.shape[1], dtype=np.uint64)[None, :]).sum(axis=1)
            in_probe = np.array([c in self.codes for c in code.tolist()])
            if not in_probe.any():
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            cids, cm = cids[in_probe], cm[in_probe]
            cos = self.qv @ cm.T
            if exclude_self:
                cos[self.qids[:, None] == cids[None, :]] = -np.inf
            kk = min(k, cos.shape[1])
            idx = np.argpartition(-cos, kk - 1, axis=1)[:, :kk]
            rows_q = np.repeat(self.qids, kk)
            rows_c = cids[idx.reshape(-1)]
            rows_s = np.take_along_axis(cos, idx, axis=1).reshape(-1)
            keep = np.isfinite(rows_s)
            return pa.table({"query_id": pa.array(rows_q[keep]),
                             "neighbor_id": pa.array(rows_c[keep]),
                             "cosine": pa.array(rows_s[keep])})

    def global_topk(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        cid = np.asarray(group.column("neighbor_id"))
        cos = np.asarray(group.column("cosine"))
        order = np.lexsort((cid, -cos))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid, dtype=np.int64)),
            "neighbor_id": pa.array(cid[order]),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "cosine": pa.array(cos[order]),
        })

    local = ds.map_batches(BucketRank, batch_format="pyarrow", batch_size=1024,
                           concurrency=2)
    return local.groupby("query_id").map_groups(global_topk,
                                                batch_format="pyarrow")
