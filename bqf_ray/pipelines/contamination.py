"""Test-set decontamination: flag corpus documents that share token
n-grams with a benchmark ("held-out") document set.

The canonical training-data hygiene pass: before training on a web
corpus, remove every document that overlaps the evaluation benchmarks at
the n-gram level.  Three execution shapes, all over the same shingle
machinery the BQF index uses (``functions/tokenize.shingle_hashes`` — the
web-text analog of the reference's rolling s-mer register,
/root/reference/src/bqf_cf.cpp:80-116):

- ``method="broadcast"`` (default): the benchmark side is SMALL by
  construction (test sets are thousands of documents, the corpus is
  billions), so its distinct shingle-hash set is collected once, sorted,
  and broadcast via ``ray.put``; corpus batches probe it with a
  vectorized ``searchsorted``.  Zero shuffles; the only data movement is
  one small sorted array to each worker.
- ``method="semijoin"``: both sides stay distributed — corpus
  (doc, shingle) rows and benchmark (shingle) rows are bucket
  co-partitioned on ``shingle % B`` (one groupby shuffle), hits are
  counted per doc in-bucket, then one tiny groupby(doc) sum.  The shape
  for benchmark sets too large to broadcast.
- ``method="bloom"``: a blocked Bloom filter over the benchmark shingles
  (built distributedly via partial sketches + tree merge) is broadcast
  instead of the exact set — ~1 byte/element instead of 8.  Counts are
  an UPPER bound (Bloom false positives only over-flag, never
  under-flag: no contaminated document escapes), with FP rate ≤ the
  filter's published ``(1-e^{-kn/m})^k`` bound.

Matching is on 64-bit shingle hashes, so two distinct n-grams collide
with probability ~2^-64 — the same contract every dedup operator here
uses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from bqf_ray.functions.tokenize import shingle_hashes, token_hashes


def _doc_distinct_shingles(batch: pa.Table, text_col: str, id_col: str,
                           n: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc DISTINCT shingle hashes: (doc_ids_repeated, shingles)."""
    th, offs = token_hashes(batch.column(text_col), seed=seed)
    sh, soffs = shingle_hashes(th, offs, n) if n > 1 else (th, offs)
    doc_ids = np.asarray(batch.column(id_col))
    did = np.repeat(doc_ids, np.diff(soffs))
    if len(sh) == 0:
        return did.astype(np.int64), sh
    order = np.lexsort((sh, did))
    did, sh = did[order], sh[order]
    first = np.concatenate([[True],
                            (did[1:] != did[:-1]) | (sh[1:] != sh[:-1])])
    return did[first].astype(np.int64), sh[first]


def benchmark_shingle_set(bench_ds, n: int = 3, text_col: str = "text",
                          seed: int = 0) -> np.ndarray:
    """Sorted distinct uint64 shingle hashes of the benchmark corpus.

    The benchmark is the SMALL side (a test set); per-batch distinct
    happens in parallel tasks, only deduped hash arrays reach the driver.
    """

    def keys(batch: pa.Table) -> pa.Table:
        th, offs = token_hashes(batch.column(text_col), seed=seed)
        sh, _ = shingle_hashes(th, offs, n) if n > 1 else (th, offs)
        return pa.table({"key": pa.array(np.unique(sh).astype(np.int64))})

    parts = [np.asarray(b.column("key"), dtype=np.int64)
             for b in bench_ds.map_batches(keys, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts).astype(np.uint64))


def decontaminate(ds, bench_ds, n: int = 3, text_col: str = "text",
                  id_col: str = "doc_id", seed: int = 0,
                  method: str = "broadcast", num_buckets: int = 32,
                  bloom_fp: float = 0.001):
    """Dataset[(doc_id, n_contaminated)] — corpus docs sharing ≥1 token
    ``n``-gram with ``bench_ds``, with the count of DISTINCT shared
    n-grams per doc.  See module docstring for the three methods."""
    import ray

    if method == "broadcast":
        bench = benchmark_shingle_set(bench_ds, n, text_col, seed)
        ref = ray.put(bench)

        class Probe:
            def __init__(self):
                self.bench = ray.get(ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                did, sh = _doc_distinct_shingles(batch, text_col, id_col,
                                                 n, seed)
                if len(sh) == 0:
                    return pa.table({id_col: pa.array([], pa.int64()),
                                     "n_contaminated": pa.array([], pa.int64())})
                pos = np.searchsorted(self.bench, sh)
                hit = pos < len(self.bench)
                hit &= self.bench[np.minimum(pos, len(self.bench) - 1)] == sh
                u, inv = np.unique(did, return_inverse=True)
                cnt = np.zeros(len(u), dtype=np.int64)
                np.add.at(cnt, inv[hit], 1)
                keep = cnt > 0
                return pa.table({id_col: pa.array(u[keep]),
                                 "n_contaminated": pa.array(cnt[keep])})

        return ds.map_batches(Probe, batch_format="pyarrow",
                              concurrency=(1, 8), num_cpus=0.5)

    if method == "bloom":
        from bqf_ray.sketches.bloom import BlockedBloom
        from bqf_ray.stages.sketch_stage import build_sketch

        def key_fn(batch: pa.Table):
            th, offs = token_hashes(batch.column(text_col), seed=seed)
            sh, _ = shingle_hashes(th, offs, n) if n > 1 else (th, offs)
            return sh.astype(np.uint64), None

        n_bench = max(int(bench_ds.count()), 1)
        # rough distinct-shingle upper bound: docs × avg shingles; the
        # filter only needs an order-of-magnitude capacity figure
        bloom = build_sketch(
            bench_ds, key_fn,
            lambda: BlockedBloom.from_capacity(n_bench * 256, fp=bloom_fp,
                                               seed=seed))
        ref = ray.put(bloom)

        class BloomProbe:
            def __init__(self):
                self.bloom = ray.get(ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                did, sh = _doc_distinct_shingles(batch, text_col, id_col,
                                                 n, seed)
                if len(sh) == 0:
                    return pa.table({id_col: pa.array([], pa.int64()),
                                     "n_contaminated": pa.array([], pa.int64())})
                hit = self.bloom.query_batch(sh.astype(np.uint64)) > 0
                u, inv = np.unique(did, return_inverse=True)
                cnt = np.zeros(len(u), dtype=np.int64)
                np.add.at(cnt, inv[hit], 1)
                keep = cnt > 0
                return pa.table({id_col: pa.array(u[keep]),
                                 "n_contaminated": pa.array(cnt[keep])})

        return ds.map_batches(BloomProbe, batch_format="pyarrow",
                              concurrency=(1, 8), num_cpus=0.5)

    if method == "semijoin":
        from ray.data.aggregate import Sum
        B = int(num_buckets)

        def corpus_rows(batch: pa.Table) -> pa.Table:
            did, sh = _doc_distinct_shingles(batch, text_col, id_col, n, seed)
            s = sh.astype(np.int64)
            return pa.table({
                id_col: pa.array(did),
                "__sh": pa.array(s),
                "__bucket": pa.array(s % np.int64(B)),
                "__side": pa.array(np.zeros(len(did), dtype=np.int8)),
            })

        def bench_rows(batch: pa.Table) -> pa.Table:
            th, offs = token_hashes(batch.column(text_col), seed=seed)
            sh, _ = shingle_hashes(th, offs, n) if n > 1 else (th, offs)
            s = np.unique(sh).astype(np.int64)
            return pa.table({
                id_col: pa.array(np.zeros(len(s), dtype=np.int64)),
                "__sh": pa.array(s),
                "__bucket": pa.array(s % np.int64(B)),
                "__side": pa.array(np.ones(len(s), dtype=np.int8)),
            })

        def count_hits(group: pa.Table) -> pa.Table:
            side = np.asarray(group.column("__side"))
            sh = np.asarray(group.column("__sh"))
            did = np.asarray(group.column(id_col))
            bench = np.unique(sh[side == 1])
            lmask = side == 0
            lsh, ldid = sh[lmask], did[lmask]
            pos = np.searchsorted(bench, lsh)
            hit = pos < len(bench)
            hit &= bench[np.minimum(pos, len(bench) - 1)] == lsh
            u, inv = np.unique(ldid[hit], return_inverse=True)
            cnt = np.zeros(len(u), dtype=np.int64)
            np.add.at(cnt, inv, 1)
            return pa.table({id_col: pa.array(u.astype(np.int64)),
                             "n": pa.array(cnt)})

        hits = (ds.map_batches(corpus_rows, batch_format="pyarrow")
                .union(bench_ds.map_batches(bench_rows,
                                            batch_format="pyarrow"))
                .repartition(16)
                .groupby("__bucket")
                .map_groups(count_hits, batch_format="pyarrow"))
        # a doc's shingles span buckets — one tiny groupby(doc) sum
        return (hits.groupby(id_col)
                .aggregate(Sum("n", alias_name="n_contaminated")))

    raise ValueError(f"unknown method {method!r}")
