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
    """Arrow list<float> column → (n, d) float64 matrix, zero python:
    flatten the list buffer and reshape (fixed dim enforced)."""
    import pyarrow as _pa
    if isinstance(col, _pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = np.asarray(col.flatten(), dtype=np.float64)
    lens = np.diff(np.asarray(col.offsets))
    d = int(lens[0])
    assert (lens == d).all(), "embedding column has ragged dimensions"
    return flat.reshape(-1, d)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def _train_subspace_codebooks(x: np.ndarray, m: int, ks: int, seed: int,
                              iters: int = 8) -> np.ndarray:
    """(m, ks, d/m) codebooks: per-subspace Lloyd on the given matrix
    (raw vectors for PQ, residuals for IVF-PQ) — seeded init,
    empty-cluster keep, pad-by-repetition when the sample is tiny."""
    d = x.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    dsub = d // m
    books = np.empty((m, ks, dsub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * dsub:(j + 1) * dsub]
        rng = np.random.RandomState(seed + j)
        cents = xs[rng.choice(len(xs), min(ks, len(xs)), replace=False)]
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            for c in range(len(cents)):
                mask = a == c
                if mask.any():
                    cents[c] = xs[mask].mean(axis=0)
        if len(cents) < ks:
            cents = np.tile(cents, (int(np.ceil(ks / len(cents))), 1))[:ks]
        books[j] = cents
    return books


def _tie_round(c: np.ndarray) -> np.ndarray:
    """Cosines quantized for ORDERING (8 decimals): numpy matmul and a
    SQL engine's summation order disagree in the last ~1 ulp, so exact
    float comparisons make ranks of near-tied neighbors
    nondeterministic across engines (fuzz seed 424242 surfaced this in
    knn_join).  Quantizing turns sub-1e-8 differences into exact ties
    broken by neighbor id on BOTH sides — the oracles rank by
    round(s, 8) to match.  Raw cosines still ride unrounded in every
    output that carries them."""
    return np.round(c, 8)


def _global_topk_reducer(k: int):
    """The shared (query_id-grouped) final top-k reducer every ANN
    method funnels through: lexsort((neighbor_id, -cosine))[:k] with the
    (query_id, neighbor_id, rank) output schema."""
    def global_topk(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        cid = np.asarray(group.column("neighbor_id"))
        cos = np.asarray(group.column("cosine"))
        order = np.lexsort((cid, -_tie_round(cos)))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid, dtype=np.int64)),
            "neighbor_id": pa.array(cid[order]),
            "rank": pa.array(np.arange(1, len(order) + 1,
                                       dtype=np.int64)),
        })
    return global_topk


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
            # local selection must use the SAME (-rounded, id) order as
            # the global reducer, else a rounded-tie straddling the
            # local-kk boundary drops the smaller-id neighbor
            cr = _tie_round(cos)
            idx = np.empty((cos.shape[0], kk), dtype=np.int64)
            for qi in range(cos.shape[0]):
                idx[qi] = np.lexsort((cids, -cr[qi]))[:kk]
            rows_q = np.repeat(self.qids, kk)
            rows_c = cids[idx.reshape(-1)]
            rows_s = np.take_along_axis(cos, idx, axis=1).reshape(-1)
            keep = np.isfinite(rows_s)
            return pa.table({
                "query_id": pa.array(rows_q[keep]),
                "neighbor_id": pa.array(rows_c[keep]),
                "cosine": pa.array(rows_s[keep]),
            })

    global_topk = _global_topk_reducer(k)

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
    tbl = ds.limit(sample).take_batch(sample, batch_format="pyarrow")
    x = _normalize(_to_matrix(tbl.column(vec_col)))
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


def build_ivf_index(ds, n_cells: int = 64, seed: int = 13,
                    vec_col: str = "embedding"):
    """(centroids, materialized Dataset[(.., __ivf_cell)]) — the persisted
    IVF index: train the coarse quantizer and assign every corpus row to
    its cell ONCE; probes reuse the assignment across query sets.  At
    cluster scale, write_parquet partitioned by cell."""
    cents = train_ivf_centroids(ds, n_cells, seed=seed, vec_col=vec_col)

    def assign(batch: pa.Table) -> pa.Table:
        cm = _normalize(_to_matrix(batch.column(vec_col)))
        cell = np.argmax(cm @ cents.T, axis=1).astype(np.int64)
        return batch.append_column("__ivf_cell", pa.array(cell))

    return cents, ds.map_batches(assign, batch_format="pyarrow").materialize()


def knn_ivf(ds, query_ids: np.ndarray, query_vecs: np.ndarray, k: int = 10,
            n_cells: int = 64, nprobe: int = 8, seed: int = 13,
            vec_col: str = "embedding", id_col: str = "vec_id",
            exclude_self: bool = True, index=None):
    """IVF approximate top-k: corpus rows route to their nearest centroid
    cell; each query exact-ranks only rows in its ``nprobe`` nearest cells.
    Fraction of corpus scanned ≈ nprobe/n_cells; recall grows with nprobe
    (tested vs brute force).  Same output schema as :func:`knn_bruteforce`
    (query_id, neighbor_id, rank).  Pass ``index=build_ivf_index(ds, ...)``
    to reuse a persisted cell assignment."""
    import ray

    if index is not None:
        cents, src = index
        have_index = True
    else:
        cents = train_ivf_centroids(ds, n_cells, seed=seed, vec_col=vec_col)
        src, have_index = ds, False
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
            if have_index:
                cell = np.asarray(batch.column("__ivf_cell"))
            else:
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

    global_topk = _global_topk_reducer(k)

    local = src.map_batches(CellRank, batch_format="pyarrow",
                            batch_size=1024, concurrency=2, num_cpus=0.5)
    return local.groupby("query_id").map_groups(global_topk,
                                                batch_format="pyarrow")


def _lsh_planes(dim: int, bits: int, seed: int,
                tables: int = 1) -> np.ndarray:
    """(tables, dim, bits) hyperplane tensor (deterministic per seed)."""
    return np.random.RandomState(seed).normal(size=(tables, dim, bits))


def _lsh_codes(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, tables) int64 code matrix for a (tables, dim, bits) tensor."""
    tables, _, bits = planes.shape
    out = np.empty((len(mat), tables), dtype=np.int64)
    for t in range(tables):
        sig = (mat @ planes[t] > 0).astype(np.uint64)
        out[:, t] = (sig << np.arange(bits, dtype=np.uint64)[None, :]
                     ).sum(axis=1).astype(np.int64)
    return out


def build_lsh_index(ds, bits: int = 12, seed: int = 7, tables: int = 1,
                    vec_col: str = "embedding", id_col: str = "vec_id"):
    """Materialized Dataset[(id, vec, __lsh_codes list)] — the persisted
    ANN index: bucket assignments are computed ONCE and reused across
    query sets (r1 verdict #5: the corpus was re-bucketed per probe
    call).  ``tables`` > 1 stores one code per table — the multi-table
    recall lever.  At cluster scale, write_parquet this dataset
    partitioned by code range and read it back filtered."""
    sample = ds.take_batch(1, batch_format="pyarrow")
    dim = _to_matrix(sample.column(vec_col)).shape[1]
    planes = _lsh_planes(dim, bits, seed, tables)

    def assign(batch: pa.Table) -> pa.Table:
        cm = _normalize(_to_matrix(batch.column(vec_col)))
        codes = _lsh_codes(cm, planes)
        offs = np.arange(len(cm) + 1, dtype=np.int32) * np.int32(tables)
        lst = pa.ListArray.from_arrays(pa.array(offs),
                                       pa.array(codes.reshape(-1)))
        return batch.append_column("__lsh_codes", lst)

    return ds.map_batches(assign, batch_format="pyarrow").materialize()


def knn_lsh(ds, query_ids: np.ndarray, query_vecs: np.ndarray, k: int = 10,
            bits: int = 12, dim: int | None = None, seed: int = 7,
            vec_col: str = "embedding", id_col: str = "vec_id",
            exclude_self: bool = True, multi_probe: int = 1,
            tables: int = 1, index=None):
    """Approximate top-k: b-bit random-hyperplane signatures bucket the
    corpus; queries probe their bucket (plus ``multi_probe`` single-bit
    flips) in each of ``tables`` independent tables and exact-rank the
    union.  Recall grows with multi_probe and tables (candidate volume
    ≈ tables·(1+multi_probe)/2^bits of the corpus); documented tradeoff,
    tested vs brute force.  Pass ``index=build_lsh_index(ds, ...)``
    (same bits/seed/tables) to reuse a persisted bucket assignment
    instead of re-hashing the corpus."""
    import ray

    qv = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    d = dim or qv.shape[1]
    planes = _lsh_planes(d, bits, seed, tables)
    qcode = _lsh_codes(qv, planes).astype(np.uint64)      # (nq, tables)
    # multi-probe: original bucket + single-bit flips, per table
    probe_sets = []
    for t in range(tables):
        probes = [qcode[:, t]]
        for b in range(min(multi_probe, bits)):
            probes.append(qcode[:, t] ^ (np.uint64(1) << np.uint64(b)))
        probe_sets.append(np.unique(np.concatenate(probes))
                          .astype(np.int64))
    pref = ray.put((qids, qv, probe_sets))
    planes_ref = ray.put(planes)
    have_index = index is not None
    src = index if have_index else ds

    class BucketRank:
        def __init__(self):
            self.qids, self.qv, self.probe_sets = ray.get(pref)  # sorted
            self.planes = ray.get(planes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cids = np.asarray(batch.column(id_col), dtype=np.int64)
            cm = _normalize(_to_matrix(batch.column(vec_col)))
            if have_index:
                col = batch.column("__lsh_codes")
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                codes = np.asarray(col.flatten()).reshape(len(cids), -1)
            else:
                codes = _lsh_codes(cm, self.planes)
            in_probe = np.zeros(len(cids), dtype=bool)
            for t, ps in enumerate(self.probe_sets):
                ct = codes[:, t]
                pos = np.searchsorted(ps, ct)
                hit = pos < len(ps)
                hit &= ps[np.minimum(pos, max(len(ps) - 1, 0))] == ct
                in_probe |= hit
            if not in_probe.any():
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            cids, cm = cids[in_probe], cm[in_probe]
            cos = self.qv @ cm.T
            if exclude_self:
                cos[self.qids[:, None] == cids[None, :]] = -np.inf
            kk = min(k, cos.shape[1])
            # local selection must use the SAME (-rounded, id) order as
            # the global reducer, else a rounded-tie straddling the
            # local-kk boundary drops the smaller-id neighbor
            cr = _tie_round(cos)
            idx = np.empty((cos.shape[0], kk), dtype=np.int64)
            for qi in range(cos.shape[0]):
                idx[qi] = np.lexsort((cids, -cr[qi]))[:kk]
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

    local = src.map_batches(BucketRank, batch_format="pyarrow",
                            batch_size=1024, concurrency=2)
    return local.groupby("query_id").map_groups(global_topk,
                                                batch_format="pyarrow")


def knn_join(left_ds, right_ds, k: int = 10, n_cells: int = 64,
             nprobe: int = 8, seed: int = 13, vec_col: str = "embedding",
             id_col: str = "vec_id", index=None, chunk_rows: int = 1024):
    """Dataset-to-Dataset top-k cosine join: for EVERY left row, its k
    nearest right rows.  Unlike the ``knn_*`` probes (driver-supplied
    query matrix), both sides are Datasets — the corpus-scale similarity
    join (e.g. align two embedded corpora, k-NN feature lookup).

    Plan: train (or reuse via ``index=build_ivf_index(right_ds, ...)``)
    the right side's IVF; left rows fan out to their ``nprobe`` nearest
    cells (≈ nprobe/n_cells of the right side scanned per left row);
    both sides co-partition by cell in ONE union groupby shuffle; each
    cell exact-ranks left×right cosine locally (left side chunked to
    bound the matmul); a final ``groupby(query_id)`` merges cell-local
    candidates (≤ nprobe·k rows per query) into the global top-k.
    ``nprobe = n_cells`` makes the join exact.  Ties break by ascending
    neighbor id (the knn_bruteforce rule).  Output
    (query_id, neighbor_id, rank).
    """
    import ray

    if index is not None:
        cents, right_idx = index
    else:
        cents, right_idx = build_ivf_index(right_ds, n_cells, seed=seed,
                                           vec_col=vec_col)
    n_cells = len(cents)
    nprobe = min(int(nprobe), n_cells)
    cref = ray.put(cents)

    def _vec_list(m: np.ndarray) -> pa.Array:
        return pa.FixedSizeListArray.from_arrays(
            pa.array(m.astype(np.float64).reshape(-1)), m.shape[1])

    def left_rows(batch: pa.Table) -> pa.Table:
        cents_ = ray.get(cref)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        m = _normalize(_to_matrix(batch.column(vec_col)))
        cells = np.argsort(-(m @ cents_.T), axis=1)[:, :nprobe]
        rep = np.repeat(np.arange(len(ids)), nprobe)
        return pa.table({
            "__cell": pa.array(cells.reshape(-1)),
            id_col: pa.array(ids[rep]),
            "__vec": _vec_list(m[rep]),
            "__side": pa.array(np.zeros(len(rep), dtype=np.int8))})

    def right_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        m = _normalize(_to_matrix(batch.column(vec_col)))
        return pa.table({
            "__cell": batch.column("__ivf_cell"),
            id_col: pa.array(ids),
            "__vec": _vec_list(m),
            "__side": pa.array(np.ones(len(ids), dtype=np.int8))})

    def rank_cell(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("__side"), dtype=np.int8)
        if (side == 0).sum() == 0 or (side == 1).sum() == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        va = group.column("__vec")
        if isinstance(va, pa.ChunkedArray):
            va = va.combine_chunks()
        vecs = np.asarray(va.flatten()).reshape(len(group), -1)
        ids = np.asarray(group.column(id_col), dtype=np.int64)
        lids, lm = ids[side == 0], vecs[side == 0]
        rids, rm = ids[side == 1], vecs[side == 1]
        # right side sorted by id: a STABLE argsort of -rounded-cos
        # then breaks tie-rounded cosines by ascending neighbor id —
        # the same composite order the global merge and knn_bruteforce
        # use, so ties straddling the per-cell top-k boundary stay
        # exact
        rorder = np.argsort(rids)
        rids, rm = rids[rorder], rm[rorder]
        kk = min(k, len(rids))
        qs, ns, cs = [], [], []
        for s in range(0, len(lids), int(chunk_rows)):
            cos = lm[s:s + chunk_rows] @ rm.T
            part = np.argsort(-_tie_round(cos), axis=1,
                              kind="stable")[:, :kk]
            rows = np.repeat(np.arange(cos.shape[0]), part.shape[1])
            qs.append(np.repeat(lids[s:s + chunk_rows], part.shape[1]))
            ns.append(rids[part.reshape(-1)])
            cs.append(cos[rows, part.reshape(-1)])
        return pa.table({"query_id": pa.array(np.concatenate(qs)),
                         "neighbor_id": pa.array(np.concatenate(ns)),
                         "cos": pa.array(np.concatenate(cs))})

    def merge_topk(group: pa.Table) -> pa.Table:
        q = np.asarray(group.column("query_id"), dtype=np.int64)
        n = np.asarray(group.column("neighbor_id"), dtype=np.int64)
        c = np.asarray(group.column("cos"), dtype=np.float64)
        # a neighbor can reach a query via several probed cells — dedupe
        cr = _tie_round(c)
        order = np.lexsort((n, -cr, q))
        q, n, cr = q[order], n[order], cr[order]
        first = np.concatenate([[True],
                                (q[1:] != q[:-1]) | (n[1:] != n[:-1])])
        q, n, cr = q[first], n[first], cr[first]
        order = np.lexsort((n, -cr, q))
        q, n = q[order], n[order]
        new_q = np.concatenate([[True], q[1:] != q[:-1]])
        starts = np.flatnonzero(new_q)
        rank = np.arange(len(q)) - np.repeat(starts, np.diff(
            np.concatenate([starts, [len(q)]]))) + 1
        keep = rank <= k
        return pa.table({"query_id": pa.array(q[keep]),
                         "neighbor_id": pa.array(n[keep]),
                         "rank": pa.array(rank[keep].astype(np.int64))})

    cand = (left_ds.map_batches(left_rows, batch_format="pyarrow")
            .union(right_idx.map_batches(right_rows,
                                         batch_format="pyarrow"))
            .groupby("__cell")
            .map_groups(rank_cell, batch_format="pyarrow"))
    return (cand.repartition(16).groupby("query_id")
            .map_groups(merge_topk, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the billion-scale ANN path (Jégou et al.
# 2011, "Product Quantization for Nearest Neighbor Search")
# ---------------------------------------------------------------------------

def train_pq(ds, m: int = 8, ks: int = 16, iters: int = 8,
             sample: int = 4096, seed: int = 29,
             vec_col: str = "embedding") -> np.ndarray:
    """(m, ks, d/m) PQ codebooks: split the (normalized) vector into
    ``m`` subspaces, k-means each on a deterministic corpus-prefix
    sample (the :func:`train_ivf_centroids` convention).  Codebooks are
    driver-sized (m·ks·d/m floats) and ship by closure."""
    tbl = ds.limit(sample).take_batch(sample, batch_format="pyarrow")
    x = _normalize(_to_matrix(tbl.column(vec_col)))
    return _train_subspace_codebooks(x, m, ks, seed, iters)


def _pq_codes(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes: per subspace argmin-L2 centroid."""
    n = len(x)
    m, ks, dsub = books.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        xs = x[:, j * dsub:(j + 1) * dsub]
        # |x|^2 - 2 x·c + |c|^2; |x|^2 constant per row for argmin
        d2 = (-2.0 * (xs @ books[j].T)
              + (books[j] ** 2).sum(axis=1)[None, :])
        codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def build_pq_index(ds, books: np.ndarray, vec_col: str = "embedding"):
    """Materialized Dataset with a ``__pq_code`` fixed-size binary column
    (m bytes/row — e.g. 8 bytes vs 256 for a float32[64] vector): the
    persisted PQ index, encode once / probe many.  At cluster scale,
    ``write_parquet`` the (id, code) projection instead."""
    m = books.shape[0]

    def encode(batch: pa.Table) -> pa.Table:
        x = _normalize(_to_matrix(batch.column(vec_col)))
        codes = _pq_codes(x, books) if len(x) else \
            np.empty((0, m), dtype=np.uint8)
        return batch.append_column(
            "__pq_code", pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1)), m))

    return ds.map_batches(encode, batch_format="pyarrow").materialize()


def knn_pq(ds, query_ids: np.ndarray, query_vecs: np.ndarray, k: int = 10,
           books: np.ndarray | None = None, refine: int = 4,
           m: int = 8, ks: int = 16, seed: int = 29,
           vec_col: str = "embedding", id_col: str = "vec_id",
           exclude_self: bool = True, index=None):
    """PQ approximate top-k with exact re-rank: asymmetric-distance
    (ADC) tables score every corpus row from its m-byte code (m table
    gathers per batch — no full-dim math on the corpus), the top
    ``k·refine`` ADC candidates per (query, batch) get EXACT cosine from
    the batch's true vectors, and the brute-force global reduce keeps
    the final k.  Same output schema as :func:`knn_bruteforce`; recall
    rises with ``refine`` at linear extra cost.  Caveat: very tight
    clusters collapse to one code, making ADC scores tie across the
    whole cluster — size ``refine`` so ``k·refine`` covers the largest
    expected tie group (the exact re-rank then resolves it)."""
    import ray

    if books is None:
        books = train_pq(ds, m=m, ks=ks, seed=seed, vec_col=vec_col)
    corpus = index if index is not None else build_pq_index(ds, books,
                                                            vec_col)
    mm, kss, dsub = books.shape
    qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    # ADC inner-product tables: (nq, m, ks)
    qsplit = qn.reshape(len(qn), mm, dsub)
    tables = np.einsum("qmd,mkd->qmk", qsplit, books)
    ref = ray.put((qids, qn, tables))

    R = max(k * int(refine), k)

    class AdcTopR:
        def __init__(self):
            self.qids, self.qn, self.tables = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cids = np.asarray(batch.column(id_col), dtype=np.int64)
            code_col = batch.column("__pq_code")
            if isinstance(code_col, pa.ChunkedArray):
                code_col = code_col.combine_chunks()
            codes = np.asarray(code_col.flatten(), dtype=np.uint8
                               ).reshape(-1, mm)
            nq, nb = len(self.qids), len(cids)
            if nb == 0:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            approx = np.zeros((nq, nb), dtype=np.float64)
            for j in range(mm):
                approx += self.tables[:, j, codes[:, j]]
            if exclude_self:
                approx[self.qids[:, None] == cids[None, :]] = -np.inf
            rr = min(R, nb)
            cand = np.argpartition(-approx, rr - 1, axis=1)[:, :rr]
            # exact re-rank of the survivors from the batch's true vectors
            cm = _normalize(_to_matrix(batch.column(vec_col)))
            gathered = cm[cand]                      # (nq, rr, d)
            exact = np.einsum("qd,qrd->qr", self.qn, gathered)
            finite = np.isfinite(
                np.take_along_axis(approx, cand, axis=1))
            rows_q = np.repeat(self.qids, rr)
            rows_c = cids[cand.reshape(-1)]
            rows_s = exact.reshape(-1)
            keep = finite.reshape(-1)
            return pa.table({"query_id": pa.array(rows_q[keep]),
                             "neighbor_id": pa.array(rows_c[keep]),
                             "cosine": pa.array(rows_s[keep])})

    global_topk = _global_topk_reducer(k)

    local = corpus.map_batches(AdcTopR, batch_format="pyarrow",
                               batch_size=2048, concurrency=2)
    return local.groupby("query_id").map_groups(global_topk,
                                                batch_format="pyarrow")


def build_ivfpq_index(ds, n_cells: int = 64, m: int = 8, ks: int = 32,
                      seed: int = 13, sample: int = 4096,
                      vec_col: str = "embedding"):
    """(centroids, books, materialized Dataset[.., __ivf_cell,
    __pq_code]) — the IVF-PQ index (Jégou et al. 2011 §IV): rows route
    to their nearest coarse centroid and store the PQ code of their
    RESIDUAL (x − centroid), the decomposition that keeps codebooks
    cell-agnostic while the residual magnitudes stay small.  One encode
    pass; at cluster scale write the (id, cell, code) projection as
    cell-partitioned parquet."""
    cents = train_ivf_centroids(ds, n_cells, seed=seed, vec_col=vec_col,
                                sample=sample)
    # residual sample for codebook training
    tbl = ds.limit(sample).take_batch(sample, batch_format="pyarrow")
    x = _normalize(_to_matrix(tbl.column(vec_col)))
    cell0 = np.argmax(x @ cents.T, axis=1)
    books = _train_subspace_codebooks(x - cents[cell0], m, ks,
                                      seed + 101)
    d = x.shape[1]
    dsub = d // m

    def encode(batch: pa.Table) -> pa.Table:
        xb = _normalize(_to_matrix(batch.column(vec_col)))
        if len(xb) == 0:
            cell = np.empty(0, dtype=np.int64)
            codes = np.empty((0, m), dtype=np.uint8)
        else:
            cell = np.argmax(xb @ cents.T, axis=1).astype(np.int64)
            codes = _pq_codes(xb - cents[cell], books)
        return (batch.append_column("__ivf_cell", pa.array(cell))
                .append_column("__pq_code",
                               pa.FixedSizeListArray.from_arrays(
                                   pa.array(codes.reshape(-1)), m)))

    return cents, books, ds.map_batches(encode,
                                        batch_format="pyarrow").materialize()


def knn_ivfpq(ds, query_ids: np.ndarray, query_vecs: np.ndarray,
              k: int = 10, n_cells: int = 64, nprobe: int = 8,
              m: int = 8, ks: int = 32, refine: int = 8, seed: int = 13,
              vec_col: str = "embedding", id_col: str = "vec_id",
              exclude_self: bool = True, index=None):
    """IVF-PQ approximate top-k: each query scans only its ``nprobe``
    nearest cells, scoring rows from m-byte residual codes —
    ``q·x̂ = q·centroid[cell] + Σ_j table[j, code_j]`` (the residual
    decomposition makes the ADC table cell-independent) — then the top
    ``k·refine`` get exact cosine from the batch's true vectors.  The
    compute shape of billion-scale ANN: nprobe/n_cells of the corpus
    touched, 8 bytes per touched row, full-dim math only on survivors."""
    import ray

    if index is None:
        index = build_ivfpq_index(ds, n_cells=n_cells, m=m, ks=ks,
                                  seed=seed, vec_col=vec_col)
    cents, books, corpus = index
    mm, kss, dsub = books.shape
    qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    qcell = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]
    q_cent_ip = qn @ cents.T                       # (nq, n_cells)
    tables = np.einsum("qmd,mkd->qmk", qn.reshape(len(qn), mm, dsub),
                       books)
    ref = ray.put((qids, qn, qcell, q_cent_ip, tables))
    R = max(k * int(refine), k)

    class AdcCellTopR:
        def __init__(self):
            (self.qids, self.qn, self.qcell, self.q_cent_ip,
             self.tables) = ray.get(ref)
            n_cells_total = self.q_cent_ip.shape[1]
            self.cell_mask = np.zeros((len(self.qids), n_cells_total),
                                      dtype=bool)
            self.cell_mask[np.arange(len(self.qids))[:, None],
                           self.qcell] = True

        def __call__(self, batch: pa.Table) -> pa.Table:
            empty = pa.table({"query_id": pa.array([], pa.int64()),
                              "neighbor_id": pa.array([], pa.int64()),
                              "cosine": pa.array([], pa.float64())})
            cids = np.asarray(batch.column(id_col), dtype=np.int64)
            if len(cids) == 0:
                return empty
            cell = np.asarray(batch.column("__ivf_cell"), dtype=np.int64)
            code_col = batch.column("__pq_code")
            if isinstance(code_col, pa.ChunkedArray):
                code_col = code_col.combine_chunks()
            codes = np.asarray(code_col.flatten(), dtype=np.uint8
                               ).reshape(-1, mm)
            nq = len(self.qids)
            # residual ADC: base term q·cent[cell] + code table sum
            adc = np.zeros((nq, len(cids)), dtype=np.float64)
            for j in range(mm):
                adc += self.tables[:, j, codes[:, j]]
            adc += self.q_cent_ip[:, cell]
            # mask rows outside each query's probed cells: one fancy
            # index against the precomputed (nq, n_cells) lookup
            adc[~self.cell_mask[:, cell]] = -np.inf
            if exclude_self:
                adc[self.qids[:, None] == cids[None, :]] = -np.inf
            rr = min(R, adc.shape[1])
            cand = np.argpartition(-adc, rr - 1, axis=1)[:, :rr]
            cm = _normalize(_to_matrix(batch.column(vec_col)))
            exact = np.einsum("qd,qrd->qr", self.qn, cm[cand])
            keep = np.isfinite(
                np.take_along_axis(adc, cand, axis=1)).reshape(-1)
            if not keep.any():
                return empty
            return pa.table({
                "query_id": pa.array(np.repeat(self.qids, rr)[keep]),
                "neighbor_id": pa.array(cids[cand.reshape(-1)][keep]),
                "cosine": pa.array(exact.reshape(-1)[keep])})

    global_topk = _global_topk_reducer(k)

    local = corpus.map_batches(AdcCellTopR, batch_format="pyarrow",
                               batch_size=2048, concurrency=2)
    return local.groupby("query_id").map_groups(global_topk,
                                                batch_format="pyarrow")
