"""Sequence packing: group documents into fixed-token-budget training
chunks — the standard LLM data-prep step between curation and
tokenizer/batching.

Two deterministic strategies over docs sorted by ``doc_id`` within each
``by`` group (one groupby shuffle; each group packs independently, so
partitioning by language/source both parallelizes and keeps chunks
monolingual):

- ``strategy="chunk"`` (concat-and-chunk): documents are concatenated in
  id order and cut every ``budget`` tokens; a document belongs to the
  chunk where it STARTS, so chunk token sums hover around the budget
  (the straddling doc spills its tail).  One window-function expression —
  SQL-oracle-checkable.
- ``strategy="greedy"`` (strict budget): a document that would overflow
  the current pack starts a new one, so every pack holds ≤ budget tokens
  unless a single oversize document forces its own pack.  The boundary
  recurrence is inherently sequential per group; the loop below is
  O(#packs) Python iterations with vectorized interior (searchsorted on
  the token cumsum), not O(#docs).

Output: one row per pack — (group, pack_seq, n_docs, n_tokens,
first_doc).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from bqf_ray.functions.tokenize import tokenize_column


def pack_sequences(ds, budget: int = 256, text_col: str = "text",
                   id_col: str = "doc_id", by: str = "lang",
                   strategy: str = "chunk", shard_size: int | None = None):
    """``shard_size`` sub-partitions each ``by`` group on
    ``doc_id // shard_size`` and packs each (group, shard) independently —
    REQUIRED at scale: packing is sequential within a partition, so
    without sharding one language's whole corpus lands in a single task.
    Sharding is deterministic (ids are stable), so the output is still
    reproducible and SQL-checkable; packs simply never span a shard
    boundary, wasting at most one under-full pack per shard."""
    if strategy not in ("chunk", "greedy"):
        raise ValueError(f"unknown strategy {strategy!r}")
    budget = int(budget)
    assert budget > 0

    def tok_counts(batch: pa.Table) -> pa.Table:
        _, offs = tokenize_column(batch.column(text_col))
        t = pa.table({
            by: batch.column(by),
            id_col: batch.column(id_col),
            "n_tokens": pa.array(np.diff(offs).astype(np.int64)),
        })
        if shard_size is not None:
            ids = np.asarray(batch.column(id_col), dtype=np.int64)
            t = t.append_column("shard",
                                pa.array(ids // np.int64(shard_size)))
        return t

    def pack_group(group: pa.Table) -> pa.Table:
        key = group.column(by)[0]
        ids = np.asarray(group.column(id_col), dtype=np.int64)
        nt = np.asarray(group.column("n_tokens"), dtype=np.int64)
        order = np.argsort(ids)
        ids, nt = ids[order], nt[order]
        cum = np.concatenate([[0], np.cumsum(nt)])
        if strategy == "chunk":
            # pack = which budget-aligned chunk the doc STARTS in
            pack = cum[:-1] // budget
            new = np.concatenate([[True], pack[1:] != pack[:-1]])
            starts = np.flatnonzero(new)
            bounds = np.concatenate([starts, [len(ids)]])
            pack_seq = pack[starts]
        else:
            starts_l = [0]
            i = 0
            n = len(ids)
            while i < n:
                j = int(np.searchsorted(cum, cum[i] + budget, "right")) - 1
                j = max(j, i + 1)        # oversize doc → its own pack
                starts_l.append(j)
                i = j
            bounds = np.array(starts_l, dtype=np.int64)
            pack_seq = np.arange(len(bounds) - 1, dtype=np.int64)
        lo, hi = bounds[:-1], bounds[1:]
        n_packs = len(lo)
        out = {by: pa.array([key.as_py()] * n_packs,
                            type=group.column(by).type)}
        if shard_size is not None:
            out["shard"] = pa.array(
                [group.column("shard")[0].as_py()] * n_packs, pa.int64())
        out.update({
            "pack_seq": pa.array(pack_seq.astype(np.int64)),
            "n_docs": pa.array((hi - lo).astype(np.int64)),
            "n_tokens": pa.array((cum[hi] - cum[lo]).astype(np.int64)),
            "first_doc": pa.array(ids[lo]),
        })
        return pa.table(out)

    keys = [by] if shard_size is None else [by, "shard"]
    return (ds.map_batches(tok_counts, batch_format="pyarrow")
            .groupby(keys)
            .map_groups(pack_group, batch_format="pyarrow"))


def chunk_documents(ds, chunk: int = 256, overlap: int = 0,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Split each document into overlapping token windows — the
    context-window prep step for LM training (long doc → multiple
    training sequences sharing ``overlap`` boundary tokens).

    Window ``j`` covers whitespace tokens ``[j·stride, j·stride+chunk)``
    with ``stride = chunk - overlap``; generation stops at the first
    window reaching the end, so a document of ``n`` tokens yields
    ``1 + ceil(max(n-chunk, 0)/stride)`` chunks (0 for empty docs) and
    no fully-redundant tail window.  Chunks rejoin tokens with single
    spaces (whitespace-normalizing, like every token op here).

    A stateless vectorized single pass (token gather + ``binary_join``)
    — no shuffle; composes with `pack_sequences` downstream.
    Output: (id, chunk_idx, text, n_tokens).
    """
    import pyarrow.compute as pc

    chunk, overlap = int(chunk), int(overlap)
    if not 0 <= overlap < chunk:
        raise ValueError(f"need 0 <= overlap < chunk, got {overlap}/{chunk}")
    stride = chunk - overlap

    def expand(batch: pa.Table) -> pa.Table:
        flat, offs = tokenize_column(batch.column(text_col))
        n = np.diff(offs)
        k = np.where(
            n > 0,
            1 + np.ceil(np.maximum(n - chunk, 0) / stride).astype(np.int64),
            0).astype(np.int64)
        doc_rep = np.repeat(np.arange(len(n), dtype=np.int64), k)
        koffs = np.concatenate([[0], np.cumsum(k)])
        j = (np.arange(int(k.sum()), dtype=np.int64)
             - np.repeat(koffs[:-1], k))
        starts = offs[:-1][doc_rep] + j * stride
        ends = np.minimum(starts + chunk, offs[1:][doc_rep])
        lens = ends - starts
        loffs = np.concatenate([[0], np.cumsum(lens)])
        gather = (np.arange(int(lens.sum()), dtype=np.int64)
                  - np.repeat(loffs[:-1], lens) + np.repeat(starts, lens))
        toks = flat.take(pa.array(gather, pa.int64()))
        out_list = pa.ListArray.from_arrays(pa.array(loffs, pa.int32()),
                                            toks)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        return pa.table({
            id_col: pa.array(ids[doc_rep]),
            "chunk_idx": pa.array(j),
            text_col: pc.binary_join(out_list, " "),
            "n_tokens": pa.array(lens.astype(np.int64))})

    return ds.map_batches(expand, batch_format="pyarrow")
