"""Distributed n-gram language-model quality scoring (CCNet-style).

The missing classic among the training-data quality signals: score every
document by the average log-probability of its token bigrams under a
bigram LM trained on a (possibly different) corpus — the Wenzek et al.
CCNet / Radford et al. WebText filtering recipe, re-expressed Ray-Data-
first:

1. **Train** (:func:`train_bigram_counts`): one ``map_batches`` pass
   tokenizes and pre-aggregates per-batch (kind, key, count) rows —
   kind 0 = unigram, 1 = bigram pair, 2 = context (non-final token) —
   then ONE native ``groupby(["kind","key"]).aggregate(Sum)`` shuffle
   produces the model table.  Bigrams are 64-bit pair hashes
   (``fmix64(prev*GOLD ^ tok)``); no bigram strings are ever built.
   ``min_count`` prunes rare bigram rows (contexts/unigrams stay exact,
   so Laplace probabilities remain proper).

2. **Score** (:func:`score_with_model`): the model is assembled ONCE
   into sorted lookup arrays by a Ray task over the model Dataset's
   Arrow block refs (zero-copy, nothing through the driver) and shared
   by every scorer actor; each batch then scores with two vectorized
   ``searchsorted`` lookups.  Laplace smoothing:
   ``P(w|prev) = (c(prev,w)+1) / (c(prev)+V)`` with V = exact distinct
   unigram count of the training corpus.

   Per-token log-probs are quantized to integer micro-nats
   (``floor(ln(p)*1e6+0.5)``) BEFORE the per-doc sum, so the document
   score is an integer sum — bit-identical regardless of summation
   order, and exactly reproducible by the DuckDB oracle.

At 10^12 docs the broadcast model is the budget-gated path (a
``min_count``-pruned bigram table is ~16 B/row; CCNet's English model is
tens of millions of rows ≈ hundreds of MB — comfortably one ``ray.put``).
Past that, the same Score stage runs against a :class:`PartitionedSketch`
count store (``backend="bqf"``) — per-shard BQF filters hold the counts,
the probe routes by key%P, and per-actor memory is model/P: the
reference's own counting filter as the LM backing store.  BQF counts
saturate at 2^count_size−1 and may alias (bounded FP rate), so the bqf
backend is the approximate scale path; pytest asserts it matches the
exact backend bit-for-bit while counts sit below the cap on
collision-free fixtures.

Output per document: (doc_id, n_tokens, n_bigrams, oov_bigrams,
sum_lp_micro, avg_logprob) where ``avg_logprob =
(sum_lp_micro/1e6)/n_bigrams`` (0.0 for docs with < 2 tokens) and
``oov_bigrams`` counts scored bigrams absent from the model (always 0
when self-scoring with min_count=1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from bqf_ray.functions.hashing import fmix64
from bqf_ray.functions.tokenize import token_hashes

GOLD = np.uint64(0x9E3779B97F4A7C15)

KIND_UNIGRAM = 0
KIND_BIGRAM = 1
KIND_CONTEXT = 2


def _bigram_arrays(h: np.ndarray, offs: np.ndarray
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(prev, tok) hash arrays for every within-doc bigram + per-doc
    bigram offsets.  Documents with < 2 tokens contribute nothing."""
    offs = np.asarray(offs, dtype=np.int64)
    lens = np.diff(offs)
    bl = np.maximum(lens - 1, 0)
    boffs = np.concatenate([[0], np.cumsum(bl)]).astype(np.int64)
    total = int(boffs[-1])
    if total == 0:
        e = np.empty(0, dtype=np.uint64)
        return e, e, boffs
    within = np.arange(total, dtype=np.int64) - np.repeat(boffs[:-1], bl)
    start = np.repeat(offs[:-1], bl) + within
    return h[start], h[start + 1], boffs


def _pair_key(prev: np.ndarray, tok: np.ndarray) -> np.ndarray:
    return fmix64((prev * GOLD) ^ tok)


def train_bigram_counts(ds, text_col: str = "text", seed: int = 0,
                        min_count: int = 1):
    """Dataset[(kind:int64, key:int64, cnt:int64)] — the bigram LM model
    table.  One pre-aggregated pass + one native groupby-Sum shuffle; the
    exchange carries per-batch-unique (kind, key) rows only."""
    from ray.data.aggregate import Sum

    def pre(batch: pa.Table) -> pa.Table:
        h, offs = token_hashes(batch.column(text_col), seed=seed)
        prev, tok, _ = _bigram_arrays(h, offs)
        pair = _pair_key(prev, tok)
        kinds, keys, cnts = [], [], []
        for kind, arr in ((KIND_UNIGRAM, h), (KIND_BIGRAM, pair),
                          (KIND_CONTEXT, prev)):
            u, c = np.unique(arr, return_counts=True)
            kinds.append(np.full(len(u), kind, dtype=np.int64))
            keys.append(u.astype(np.int64))
            cnts.append(c.astype(np.int64))
        return pa.table({
            "kind": pa.array(np.concatenate(kinds) if kinds else []),
            "key": pa.array(np.concatenate(keys)),
            "cnt": pa.array(np.concatenate(cnts)),
        })

    from bqf_ray.stages.partition import bucketed_sum
    model = bucketed_sum(ds.map_batches(pre, batch_format="pyarrow"),
                         ["kind", "key"], {"cnt": "cnt"})

    if min_count > 1:
        mc = int(min_count)

        def prune(batch: pa.Table) -> pa.Table:
            kind = np.asarray(batch.column("kind"))
            cnt = np.asarray(batch.column("cnt"))
            keep = (kind != KIND_BIGRAM) | (cnt >= mc)
            return batch.filter(pa.array(keep))

        model = model.map_batches(prune, batch_format="pyarrow")
    return model


def _build_model_index(refs: list):
    """Assemble sorted (pair, context) lookup arrays + V from the model
    Dataset's Arrow block refs — runs ONCE in a Ray task; the result
    lives in the object store and is shared zero-copy by every scorer
    actor."""
    import ray
    tables = [t for t in ray.get(list(refs)) if t.num_rows]
    if tables:
        kind = np.concatenate([np.asarray(t.column("kind"), dtype=np.int64)
                               for t in tables])
        key = np.concatenate([np.asarray(t.column("key"), dtype=np.int64)
                              for t in tables])
        cnt = np.concatenate([np.asarray(t.column("cnt"), dtype=np.int64)
                              for t in tables])
    else:
        kind = key = cnt = np.empty(0, dtype=np.int64)
    out = []
    for k in (KIND_BIGRAM, KIND_CONTEXT):
        m = kind == k
        kk, cc = key[m], cnt[m]
        order = np.argsort(kk)
        out.append((kk[order], cc[order]))
    V = int((kind == KIND_UNIGRAM).sum())
    (pk, pc), (ck, cc) = out
    return V, pk, pc, ck, cc


def _lookup(sorted_keys: np.ndarray, counts: np.ndarray, probes: np.ndarray
            ) -> np.ndarray:
    """count per probe key; 0 where absent."""
    if len(sorted_keys) == 0 or len(probes) == 0:
        return np.zeros(len(probes), dtype=np.int64)
    pos = np.searchsorted(sorted_keys, probes)
    hit = pos < len(sorted_keys)
    posc = np.minimum(pos, len(sorted_keys) - 1)
    hit &= sorted_keys[posc] == probes
    out = np.zeros(len(probes), dtype=np.int64)
    out[hit] = counts[posc[hit]]
    return out


def _score_table(batch: pa.Table, text_col: str, id_col: str, seed: int,
                 V: int, cb_of, cp_of) -> pa.Table:
    """Shared scoring kernel: ``cb_of(pair_keys) / cp_of(prev_keys)``
    supply the counts (exact arrays or BQF probes)."""
    h, offs = token_hashes(batch.column(text_col), seed=seed)
    prev, tok, boffs = _bigram_arrays(h, offs)
    pair = _pair_key(prev, tok)
    cb = cb_of(pair)
    cp = cp_of(prev)
    lp = np.log((cb + 1.0) / (cp + np.int64(V)))
    lpm = np.floor(lp * 1e6 + 0.5).astype(np.int64)
    oov = (cb == 0).astype(np.int64)
    bl = np.diff(boffs)
    n_docs = len(bl)
    sums = np.zeros(n_docs, dtype=np.int64)
    oovs = np.zeros(n_docs, dtype=np.int64)
    nz = bl > 0
    if nz.any():
        starts = boffs[:-1][nz]
        sums[nz] = np.add.reduceat(lpm, starts)
        oovs[nz] = np.add.reduceat(oov, starts)
    n_tokens = np.diff(np.asarray(offs, dtype=np.int64))
    avg = np.where(nz, (sums / 1e6) / np.maximum(bl, 1), 0.0)
    return pa.table({
        id_col: batch.column(id_col),
        "n_tokens": pa.array(n_tokens),
        "n_bigrams": pa.array(bl.astype(np.int64)),
        "oov_bigrams": pa.array(oovs),
        "sum_lp_micro": pa.array(sums),
        "avg_logprob": pa.array(avg, pa.float64()),
    })


def score_with_model(ds, model_ds, text_col: str = "text",
                     id_col: str = "doc_id", seed: int = 0,
                     concurrency=(1, 8)):
    """Score every document of ``ds`` against a trained model Dataset
    (broadcast-index path; see module docstring for the scale story)."""
    import ray

    refs = model_ds.materialize().to_arrow_refs()
    index_ref = (ray.remote(num_cpus=1)(_build_model_index)
                 .remote(refs))

    class ScoreLM:
        def __init__(self):
            self.V, self.pk, self.pc, self.ck, self.cc = ray.get(index_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            return _score_table(
                batch, text_col, id_col, seed, self.V,
                lambda pair: _lookup(self.pk, self.pc,
                                     pair.astype(np.int64)),
                lambda prev: _lookup(self.ck, self.cc,
                                     prev.astype(np.int64)))

    return ds.map_batches(ScoreLM, batch_format="pyarrow",
                          concurrency=concurrency, num_cpus=1)


def ngram_lm_score(ds, text_col: str = "text", id_col: str = "doc_id",
                   seed: int = 0, min_count: int = 1):
    """Self-scoring convenience: train the bigram LM on ``ds`` and score
    ``ds`` with it (the driver-oracle entry point)."""
    model = train_bigram_counts(ds, text_col=text_col, seed=seed,
                                min_count=min_count)
    return score_with_model(ds, model, text_col=text_col, id_col=id_col,
                            seed=seed)


def ngram_lm_score_bqf(ds, text_col: str = "text", id_col: str = "doc_id",
                       seed: int = 0, q: int = 16, count_size: int = 16,
                       num_partitions: int = 8):
    """The BQF-backed LM: bigram and context counts live in partitioned
    counting filters (key%P shards) instead of exact arrays — the
    reference's own sketch as the LM count store.  Counts saturate at
    2^count_size−1 and carry the filter's bounded FP rate; V (distinct
    unigrams) stays exact via one tiny count.  Matches the exact backend
    wherever counts sit below the cap and no fingerprints collide."""
    import ray
    from bqf_ray.sketches.bqf import BqfEc
    from bqf_ray.stages.sketch_stage import (PartitionedSketch,
                                             build_partitioned)

    def pair_fn(batch: pa.Table):
        h, offs = token_hashes(batch.column(text_col), seed=seed)
        prev, tok, _ = _bigram_arrays(h, offs)
        return _pair_key(prev, tok), None

    def ctx_fn(batch: pa.Table):
        h, offs = token_hashes(batch.column(text_col), seed=seed)
        prev, _, _ = _bigram_arrays(h, offs)
        return prev, None

    P = int(num_partitions)
    factory = lambda: BqfEc(q=q, count_size=count_size)  # noqa: E731
    pair_sk = PartitionedSketch.from_dataset(
        build_partitioned(ds, pair_fn, factory, num_partitions=P), P)
    ctx_sk = PartitionedSketch.from_dataset(
        build_partitioned(ds, ctx_fn, factory, num_partitions=P), P)

    from bqf_ray.pipelines.aggregates import distinct_values
    V = distinct_values(ds, text_col).count()

    pair_ref = ray.put(pair_sk)
    ctx_ref = ray.put(ctx_sk)

    class ScoreBqf:
        def __init__(self):
            self.pair_sk = ray.get(pair_ref)
            self.ctx_sk = ray.get(ctx_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            return _score_table(
                batch, text_col, id_col, seed, V,
                lambda pair: self.pair_sk.query_batch(pair).astype(np.int64),
                lambda prev: self.ctx_sk.query_batch(prev).astype(np.int64))

    return ds.map_batches(ScoreBqf, batch_format="pyarrow",
                          concurrency=(1, 8), num_cpus=1)
