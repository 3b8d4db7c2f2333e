"""Deterministic sampling / splitting / mixture rebalancing.

Training-data pipelines sample and split by CONTENT-STABLE hashes, not
RNG state: a rerun (or a resumed partition) must pick the same rows, and
an auditor must be able to recompute membership outside the engine.
Every operator here derives a uniform u64 from a key column:

- ``algo="xxh64"`` (default) — fast vectorized path for production;
- ``algo="md5"`` — the cross-engine form: any ANSI-SQL engine computes
  the identical value as ``('0x' || substr(md5(key), 1, 16))::UBIGINT``,
  which is what the driver oracles check bit-exactly.

All thresholds are exact integer comparisons against ``floor(p·2^64)``
— no float round-trip ambiguity between engines.

Scale notes: each operator is a single stateless ``map_batches`` pass
(sampling, splitting) or one tiny counts aggregate broadcast back into a
stateless pass (rebalancing) — no shuffle of the payload rows at all,
so they compose freely with the wide stages around them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from bqf_ray.functions.hashing import md5_hash64_array, xxhash64_array

_U64 = np.uint64
_TWO64 = 1 << 64


def _key_u64(batch: pa.Table, key_col: str, salt: str, algo: str) -> np.ndarray:
    """Uniform u64 per row from utf8(key) (+ salt suffix)."""
    keys = pc.cast(batch.column(key_col), pa.string())
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if salt:
        keys = pc.binary_join_element_wise(keys, salt, "")
    if algo == "md5":
        return md5_hash64_array(keys)
    if algo == "xxh64":
        return xxhash64_array(keys)
    raise ValueError(f"unknown algo {algo!r}")


def _threshold(p: float) -> int:
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"rate {p} outside [0, 1]")
    return min(int(p * _TWO64), _TWO64 - 1) if p < 1.0 else _TWO64 - 1


def hash_sample(ds, rate: float, key_col: str = "doc_id", salt: str = "",
                algo: str = "xxh64"):
    """Keep rows where hash(key) < rate·2^64 — a deterministic Bernoulli
    sample that is stable across reruns, resume, and repartitioning."""
    if rate >= 1.0:
        _threshold(rate)               # still validates rate <= 1
        return ds
    thr = _U64(_threshold(rate))

    def keep(batch: pa.Table) -> pa.Table:
        u = _key_u64(batch, key_col, salt, algo)
        return batch.filter(pa.array(u < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds, rates: dict, strat_col: str,
                      key_col: str = "doc_id", default_rate: float = 0.0,
                      salt: str = "", algo: str = "xxh64"):
    """Per-stratum deterministic sampling: row kept iff
    ``hash(key) < rates[stratum]·2^64`` (``default_rate`` for strata not
    listed).  ``rates`` is tiny (one entry per domain/language) and ships
    inside the task closure — no shuffle."""
    thr = {k: _threshold(v) for k, v in rates.items()}
    dflt = _threshold(default_rate)

    def keep(batch: pa.Table) -> pa.Table:
        u = _key_u64(batch, key_col, salt, algo)
        strat = pc.cast(batch.column(strat_col), pa.string())
        if isinstance(strat, pa.ChunkedArray):
            strat = strat.combine_chunks()
        enc = pc.dictionary_encode(strat)
        per_dict = np.array([thr.get(s, dflt) for s in
                             enc.dictionary.to_pylist()], dtype=np.uint64)
        row_thr = per_dict[np.asarray(enc.indices, dtype=np.int64)] \
            if len(batch) else np.empty(0, dtype=np.uint64)
        return batch.filter(pa.array(u < row_thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def split_cutpoints(weights: dict) -> tuple[list[str], np.ndarray]:
    """(labels, integer u64 cutpoints) for :func:`split_dataset`.
    Exposed so external checkers (e.g. a SQL oracle) can embed the
    EXACT integers the engine compares against."""
    labels = list(weights)
    w = np.array([float(weights[k]) for k in labels], dtype=np.float64)
    if (w < 0).any() or w.sum() <= 0:
        raise ValueError("weights must be nonnegative with a positive sum")
    cum = np.cumsum(w / w.sum())
    # integer cutpoints; force the last to cover the full hash range
    cuts = np.array([min(int(c * _TWO64), _TWO64 - 1) for c in cum],
                    dtype=np.uint64)
    cuts[-1] = _U64(_TWO64 - 1)
    return labels, cuts


def split_dataset(ds, weights: dict, key_col: str = "doc_id",
                  salt: str = "", algo: str = "xxh64",
                  out_col: str = "split"):
    """Append a deterministic split label (e.g. train/valid/test) chosen
    by where ``hash(key)`` lands in the cumulative weight ranges.
    ``weights`` maps label → nonnegative weight (normalized here); dict
    insertion order defines the ranges, so the assignment is fully
    reproducible from (weights, salt, algo)."""
    labels, cuts = split_cutpoints(weights)

    def assign(batch: pa.Table) -> pa.Table:
        u = _key_u64(batch, key_col, salt, algo)
        idx = np.searchsorted(cuts, u, side="right")
        idx = np.minimum(idx, len(labels) - 1)
        lab = pa.DictionaryArray.from_arrays(
            pa.array(idx, pa.int32()), pa.array(labels, pa.string()))
        return batch.append_column(out_col, pc.cast(lab, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def rebalance_mixture(ds, target: dict, strat_col: str,
                      key_col: str = "doc_id", total_rows: int | None = None,
                      salt: str = "", algo: str = "xxh64",
                      copy_col: str = "copy_idx"):
    """Up-/down-sample each stratum to a TARGET mixture (domain/language
    weighting for LM training, à la fixed-weight data mixing).  For
    stratum s with observed count ``n_s`` and target share ``t_s`` of an
    output of ``total_rows`` rows (default: the input size), each row is
    emitted ``r_s = t_s·total/n_s`` times: ``floor(r_s)`` full copies
    plus one more iff ``hash(key) < frac(r_s)·2^64`` — deterministic
    fractional repetition.  Output carries ``copy_col`` (0-based copy
    index) so downstream shuffles can separate the copies.

    Plan: one counts aggregate over the (tiny) stratum column, then a
    single stateless pass over the payload — the rows themselves are
    never shuffled.  Strata absent from ``target`` are dropped.
    """
    from ray.data.aggregate import Sum

    def pre_counts(batch: pa.Table) -> pa.Table:
        strat = pc.cast(batch.column(strat_col), pa.string())
        t = pa.table({"stratum": strat,
                      "n": np.ones(len(batch), dtype=np.int64)})
        return (t.group_by(["stratum"]).aggregate([("n", "sum")])
                .rename_columns(["stratum", "partial"]))

    counts = {r["stratum"]: r["cnt"] for r in
              (ds.map_batches(pre_counts, batch_format="pyarrow")
               .groupby("stratum")
               .aggregate(Sum("partial", alias_name="cnt"))
               .take_all())}
    total = int(total_rows) if total_rows is not None else \
        int(sum(counts.values()))
    tw = {k: float(v) for k, v in target.items() if k in counts}
    norm = sum(tw.values())
    if norm <= 0:
        raise ValueError("no target stratum present in the input")
    rates = {k: (v / norm) * total / counts[k] for k, v in tw.items()}
    whole = {k: int(np.floor(r)) for k, r in rates.items()}
    frac_thr = {k: _threshold(min(rates[k] - whole[k], 1.0))
                for k in rates}

    def expand(batch: pa.Table) -> pa.Table:
        u = _key_u64(batch, key_col, salt, algo)
        strat = pc.cast(batch.column(strat_col), pa.string())
        if isinstance(strat, pa.ChunkedArray):
            strat = strat.combine_chunks()
        enc = pc.dictionary_encode(strat)
        dic = enc.dictionary.to_pylist()
        d_whole = np.array([whole.get(s, 0) for s in dic], dtype=np.int64)
        d_frac = np.array([frac_thr.get(s, 0) for s in dic],
                          dtype=np.uint64)
        idx = (np.asarray(enc.indices, dtype=np.int64) if len(batch)
               else np.empty(0, dtype=np.int64))
        n_copies = d_whole[idx] + (u < d_frac[idx]).astype(np.int64)
        take = np.repeat(np.arange(len(batch), dtype=np.int64), n_copies)
        out = batch.take(pa.array(take))
        offs = np.concatenate([[0], np.cumsum(n_copies)])
        copy_idx = (np.arange(len(take), dtype=np.int64)
                    - np.repeat(offs[:-1], n_copies))
        return out.append_column(copy_col, pa.array(copy_idx))

    return ds.map_batches(expand, batch_format="pyarrow")


def priority_sample(ds, weight_col: str, k: int, key_col: str = "doc_id",
                    salt: str = "", algo: str = "md5",
                    rank_col: str = "rk", est_col: str = "est_weight"):
    """Priority sampling (Duffield-Lund-Thorup, JACM 2007): a weighted
    k-sample whose Horvitz-Thompson subset-sum estimator is unbiased
    with near-optimal variance.

    Each row gets a deterministic uniform ``u = (h(key||salt)+1)/2^64``
    and priority ``pri = weight / u``; the sample is the k rows of
    largest priority, and every sampled row carries the estimator
    ``est_weight = max(weight, tau)`` where ``tau`` is the (k+1)-th
    largest priority — ``SUM(est_weight)`` over any selected subset of
    the sample estimates that subset's true weight sum, unbiased.

    Distributed shape: the priority column is added per batch
    (vectorized), then :func:`global_top_n` keeps k+1 rows via
    per-block partials — no global sort, the exchange carries at most
    (k+1) rows per block.  With ``algo="md5"`` every value (u, pri,
    tau, est_weight) is bit-identical to the ANSI-SQL replay
    ``('0x'||substr(md5(key||salt),1,16))::UBIGINT`` — all arithmetic
    is IEEE-754 double in both engines — so the whole sample is
    EXACTLY checkable by an oracle, not just within a bound.

    Returns a small in-memory pyarrow Table (k rows): key, weight,
    ``pri``, ``est_col``, ``rank_col`` (1..k by descending priority,
    key-ascending tie-break).
    """
    from bqf_ray.pipelines.aggregates import global_top_n

    kk = int(k)
    assert kk >= 1

    def add_pri(batch: pa.Table) -> pa.Table:
        u64 = _key_u64(batch, key_col, salt, algo)
        u = (u64.astype(np.float64) + 1.0) / float(_TWO64)
        w = np.asarray(batch.column(weight_col).to_numpy(
            zero_copy_only=False), dtype=np.float64)
        return pa.table({
            key_col: batch.column(key_col),
            "weight": pa.array(w, type=pa.float64()),
            "pri": pa.array(w / u, type=pa.float64()),
        })

    top = global_top_n(ds.map_batches(add_pri, batch_format="pyarrow"),
                       ["pri", key_col], kk + 1,
                       descending=[True, False])
    tbl = pa.concat_tables(
        [t for t in ray.get(top.materialize().to_arrow_refs())],
        promote_options="default")
    order = np.lexsort((np.asarray(tbl.column(key_col)),
                        -np.asarray(tbl.column("pri"))))
    tbl = tbl.take(pa.array(order))
    tau = (float(tbl.column("pri")[kk].as_py())
           if len(tbl) > kk else 0.0)
    tbl = tbl.slice(0, kk)
    est = np.maximum(np.asarray(tbl.column("weight")), tau)
    return (tbl.append_column(est_col, pa.array(est, type=pa.float64()))
               .append_column(rank_col,
                              pa.array(np.arange(1, len(tbl) + 1))))


def grouped_priority_sample(ds, group_col: str, weight_col: str, k: int,
                            key_col: str = "doc_id", salt: str = "",
                            algo: str = "md5", rank_col: str = "rk",
                            est_col: str = "est_weight",
                            num_buckets: int = 32):
    """Per-group priority sampling: k weighted representatives PER KEY
    of ``group_col``, each group carrying its own (k+1)-th-priority
    threshold estimator.  Rides :func:`grouped_top_n` (per-block
    per-key partial top-(k+1) + ONE bucketed exchange) so a hot group
    never lands on one worker, then a vectorized per-group tau/max —
    the result is groups x k rows, small by construction."""
    from bqf_ray.pipelines.aggregates import grouped_top_n

    kk = int(k)
    assert kk >= 1

    def add_pri(batch: pa.Table) -> pa.Table:
        u64 = _key_u64(batch, key_col, salt, algo)
        u = (u64.astype(np.float64) + 1.0) / float(_TWO64)
        w = np.asarray(batch.column(weight_col).to_numpy(
            zero_copy_only=False), dtype=np.float64)
        return pa.table({
            group_col: batch.column(group_col),
            key_col: batch.column(key_col),
            "weight": pa.array(w, type=pa.float64()),
            "pri": pa.array(w / u, type=pa.float64()),
        })

    top = grouped_top_n(ds.map_batches(add_pri, batch_format="pyarrow"),
                        group_col, ["pri", key_col], kk + 1,
                        descending=[True, False], rank_col=rank_col,
                        num_buckets=num_buckets)
    tbl = pa.concat_tables(
        [t for t in ray.get(top.materialize().to_arrow_refs())],
        promote_options="default")
    grp = np.asarray(pc.cast(tbl.column(group_col), pa.string()))
    order = np.lexsort((np.asarray(tbl.column(rank_col)), grp))
    tbl = tbl.take(pa.array(order))
    grp = grp[order]
    rk = np.asarray(tbl.column(rank_col), dtype=np.int64)
    pri = np.asarray(tbl.column("pri"), dtype=np.float64)
    # per-group tau = priority of the rank-(k+1) row, 0 when the group
    # has <= k rows; vectorized via segment boundaries
    starts = np.concatenate([[True], grp[1:] != grp[:-1]])
    seg_id = np.cumsum(starts) - 1
    n_seg = seg_id[-1] + 1 if len(seg_id) else 0
    tau = np.zeros(n_seg, dtype=np.float64)
    is_kp1 = rk == kk + 1
    tau[seg_id[is_kp1]] = pri[is_kp1]
    keep = rk <= kk
    est = np.maximum(np.asarray(tbl.column("weight"))[keep],
                     tau[seg_id[keep]])
    tbl = tbl.filter(pa.array(keep))
    return tbl.append_column(est_col, pa.array(est, type=pa.float64()))
