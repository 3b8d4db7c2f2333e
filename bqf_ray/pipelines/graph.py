"""Graph operators for duplicate-cluster resolution.

Near-dup pair generators (:mod:`bqf_ray.pipelines.dedup`) emit EDGES
(doc_a, doc_b); corpus curation needs COMPONENTS — "these k documents
are all the same article; keep one".  :func:`connected_components`
closes that gap, and :func:`near_dup_removal` composes pairs →
components → survivor anti-join into the end-to-end operator
(the cluster step of MinHash dedup as described in Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better" §4.1).

Scale notes (100 TB): the pair graph of a near-dup pass is sparse and
its components are small (duplicate clusters), but the TOTAL edge count
grows with the corpus.  The auto plan mirrors the repo's established
row-vs-combiner crossover: below ``driver_edge_budget`` edges the
component labeling runs as a driver-local union-find (single pass, no
rounds — the common case, since pairs ≪ docs); above it, a distributed
min-label propagation with pointer jumping runs entirely as
co-partitioned Ray Data shuffles (two per round, O(log diameter)
rounds — the shape of Kiveris et al. 2014's alternating algorithm).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from bqf_ray.plans import plan_log


def _uf_components(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Union-find over edge arrays → (nodes, min-node-id label per node).

    ``np.unique`` returns nodes ascending, so "union into the smaller
    root index" makes every root the minimum node id of its component —
    no relabeling pass needed."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:          # path compression
            parent[x], x = root, parent[x]
        return root

    ea, eb = inv[: len(a)], inv[len(a):]
    for i in range(len(ea)):
        ra, rb = find(ea[i]), find(eb[i])
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    labels = np.array([nodes[find(i)] for i in range(len(nodes))],
                      dtype=np.int64)
    return nodes.astype(np.int64), labels


def connected_components(pairs, a_col: str = "doc_a", b_col: str = "doc_b",
                         mode: str = "auto",
                         driver_edge_budget: int = 2_000_000,
                         num_buckets: int = 32, max_rounds: int = 64):
    """Label every node of the pair graph with the MINIMUM node id of its
    connected component.  Returns Dataset[(doc_id, cluster_id)] with one
    row per distinct node appearing in ``pairs``.

    ``mode``: ``driver`` (union-find over collected edges), ``dist``
    (min-label propagation, no driver materialization), or ``auto``
    (count edges — a metadata-only pass — and pick by
    ``driver_edge_budget``).
    """
    import ray
    from ray.data.aggregate import Min, Sum

    if mode == "auto":
        pairs = pairs.materialize()    # counted then re-read: execute once
        n_edges = pairs.count()
        mode = "driver" if n_edges <= int(driver_edge_budget) else "dist"
        plan_log("connected_components", mode, n_edges=n_edges,
                 budget=int(driver_edge_budget))

    if mode == "driver":
        tbls = [b.select([a_col, b_col])
                for b in pairs.iter_batches(batch_format="pyarrow")]
        t = (pa.concat_tables(tbls) if tbls else
             pa.table({a_col: pa.array([], pa.int64()),
                       b_col: pa.array([], pa.int64())}))
        nodes, labels = _uf_components(
            np.asarray(t.column(a_col), dtype=np.int64),
            np.asarray(t.column(b_col), dtype=np.int64))
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(nodes), "cluster_id": pa.array(labels)}))

    if mode != "dist":
        raise ValueError(f"unknown mode {mode!r}")

    NB = int(num_buckets)

    def sym(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column(a_col), dtype=np.int64)
        b = np.asarray(batch.column(b_col), dtype=np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    # symmetrized edges are re-read every round — materialize once
    edges = pairs.map_batches(sym, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("src"), dtype=np.int64)
        dst = np.asarray(batch.column("dst"), dtype=np.int64)
        # seed label = min(self, smallest direct neighbor): one free hop
        t = pa.table({"node": pa.array(src),
                      "label": pa.array(np.minimum(src, dst))})
        return (t.group_by(["node"]).aggregate([("label", "min")])
                .rename_columns(["node", "label"]))

    labels = (edges.map_batches(init_labels, batch_format="pyarrow")
              .groupby("node").aggregate(Min("label", alias_name="label"))
              .materialize())

    def tag_edges(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("src"), dtype=np.int64)
        return pa.table({
            "__key": batch.column("src"), "__dst": batch.column("dst"),
            "__label": pa.array(np.full(len(src), -1, dtype=np.int64)),
            "__bucket": pa.array(src % np.int64(NB)),
            "__side": pa.array(np.zeros(len(src), dtype=np.int8))})

    def tag_labels(batch: pa.Table) -> pa.Table:
        node = np.asarray(batch.column("node"), dtype=np.int64)
        lab = np.asarray(batch.column("label"), dtype=np.int64)
        label_rows = pa.table({
            "__key": batch.column("node"), "__dst": batch.column("node"),
            "__label": batch.column("label"),
            "__bucket": pa.array(node % np.int64(NB)),
            "__side": pa.array(np.ones(len(node), dtype=np.int8))})
        # pointer-jumping edges (label(v) → v): v also learns
        # label(label(v)) this round, so convergence is O(log diameter)
        # rounds instead of O(diameter).  Label values are node ids, and
        # every node has a label row, so the src lookup always resolves.
        jump = node != lab
        jl, jn = lab[jump], node[jump]
        jump_rows = pa.table({
            "__key": pa.array(jl), "__dst": pa.array(jn),
            "__label": pa.array(np.full(len(jl), -1, dtype=np.int64)),
            "__bucket": pa.array(jl % np.int64(NB)),
            "__side": pa.array(np.zeros(len(jl), dtype=np.int8))})
        return pa.concat_tables([label_rows, jump_rows])

    def propagate(group: pa.Table) -> pa.Table:
        """Within one src-bucket: map each edge src → its current label,
        emit (dst, label(src)) messages plus the bucket's own (node,
        label) rows so no label is lost."""
        side = np.asarray(group.column("__side"), dtype=np.int8)
        key = np.asarray(group.column("__key"), dtype=np.int64)
        dst = np.asarray(group.column("__dst"), dtype=np.int64)
        lab = np.asarray(group.column("__label"), dtype=np.int64)
        ln, ll = key[side == 1], lab[side == 1]
        order = np.argsort(ln)
        ln, ll = ln[order], ll[order]
        esrc, edst = key[side == 0], dst[side == 0]
        pos = np.searchsorted(ln, esrc)
        # every edge src has a label row in this bucket by construction
        msg_node = np.concatenate([edst, ln])
        msg_label = np.concatenate([ll[pos], ll])
        return pa.table({"node": pa.array(msg_node),
                         "label": pa.array(msg_label)})

    checksum = None
    for _ in range(int(max_rounds)):
        both = (edges.map_batches(tag_edges, batch_format="pyarrow")
                .union(labels.map_batches(tag_labels,
                                          batch_format="pyarrow")))
        labels = (both.groupby("__bucket")
                  .map_groups(propagate, batch_format="pyarrow")
                  .groupby("node").aggregate(Min("label",
                                                 alias_name="label"))
                  .materialize())
        # labels only decrease, so a stable sum ⇔ a fixed point
        new_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if new_sum == checksum:
            break
        checksum = new_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds")

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["doc_id", "cluster_id"])

    return labels.map_batches(rename, batch_format="pyarrow")


def near_dup_removal(ds, pairs, id_col: str = "doc_id",
                     cc_mode: str = "auto", num_buckets: int = 32):
    """Cluster-aware near-dup removal: from each connected component of
    the pair graph keep only the minimum-id document; documents in no
    pair survive untouched.  Returns the surviving rows of ``ds``
    (all columns).

    The removal set (nodes with ``cluster_id != doc_id``) flows into a
    co-partitioned distributed anti-join — never through the driver."""
    from bqf_ray.pipelines.relational import semi_join

    cc = connected_components(pairs, mode=cc_mode,
                              num_buckets=num_buckets)
    removed = cc.filter(expr="doc_id != cluster_id") \
                .select_columns(["doc_id"])
    return semi_join(ds, removed, left_key=id_col, right_key="doc_id",
                     num_buckets=num_buckets, anti=True)


def transition_counts(ds, key_col: str = "user_id", ts_col: str = "ts",
                      id_col: str = "event_id",
                      label_col: str = "event_type",
                      num_buckets: int = 32):
    """Markov transition counts: ``(from_type, to_type, n)`` over each
    key's consecutive events in ``(ts, id)`` order — the edge-extraction
    pass for behavior graphs / Markov-chain fitting.  Exactly the n=2
    case of :func:`path_ngram_counts` (one key-bucketed lexsort, run
    windows, label-pair-sized final exchange) and delegates to it, so
    the two stay a single implementation.
    """
    return path_ngram_counts(ds, n=2, key_col=key_col, ts_col=ts_col,
                             id_col=id_col, label_col=label_col,
                             out_cols=["from_type", "to_type"],
                             num_buckets=num_buckets)

def _pr_ckpt_config(n, unit, d_num, d_den, weight_col, restart_nodes):
    """Checkpoint identity: the integer scheme is fully determined by
    these (plus the input graph, whose identity (n, unit) proxies —
    the caller owns input lineage, same as the sketch checkpoints)."""
    import hashlib
    import json
    seeds = (np.unique(np.asarray(restart_nodes,
                                  dtype=np.int64)).tolist()
             if restart_nodes is not None else None)
    blob = json.dumps({"n": int(n), "unit": int(unit),
                       "d_num": int(d_num), "d_den": int(d_den),
                       "weight_col": weight_col, "seeds": seeds},
                      sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()


def pagerank(edges_ds, src_col: str, dst_col: str, d_num: int = 17,
             d_den: int = 20, iters: int = 10,
             weight_col: str | None = None,
             restart_nodes: "np.ndarray | None" = None,
             mode: str = "auto", node_budget: int = 20_000_000,
             num_shards: int = 16, output: str = "arrays",
             checkpoint_dir: str | None = None,
             checkpoint_every: int = 1):
    """Bit-deterministic distributed PageRank over an edge Dataset.

    Integer-unit power iteration (damping ``d = d_num/d_den``, default
    0.85): every quantity is an exact integer — per-edge contribution
    ``(r_u · d_num · w) // (d_den · deg_u)`` (``w`` = edge weight,
    ``deg_u`` = Σ weights out of u) floor-divides BEFORE the sum, so
    per-batch partial sums are order-independent and the result is
    bit-identical under any partitioning (the k-means determinism trick
    applied to graph iteration).  Dangling/rounding mass is respread
    uniformly each round (exact remainder division), so total mass is
    conserved exactly.

    Overflow safety: the unit is auto-scaled so the hottest possible
    rank (all mass on one node) times ``d_num`` and the largest weight
    stays under 2^62 — ``unit = min(2^40, 2^62 // (n · d_num · w_max))``
    — keeping every worker-side int64 product exact; ≥ 2^20 units of
    per-node precision survive up to ~4·10^12 node·weight, far past the
    ranks-fit-in-driver-RAM envelope (~10^8 nodes) this plan targets.
    Edges stream through ``map_batches`` each round and never
    materialize beyond the one cached (s, t, w) projection.  Returns
    ``(node_ids, ranks_int, unit)`` with ranks summing to
    ``n_nodes · unit``.

    ``restart_nodes`` personalizes the walk (PPR): the initial mass
    AND every round's undelivered mass (teleport + dangling + floor
    residue) respread over the SEED set only — exact divmod, the +1
    remainder going to the lowest-id seeds — instead of uniformly over
    all nodes.  Seeds must exist in the graph (loud raise).  Total
    mass stays exactly ``n_nodes · unit`` either way.

    **Plans** (``mode``): ``"broadcast"`` holds the (node, rank, deg)
    vector on the driver and re-``ray.put``s it each round — fastest
    while vertex-sized arrays fit driver RAM.  ``"sharded"`` holds the
    vector in ``num_shards`` range-partitioned shard ACTORS: edges are
    co-bucketed by source range once, each contribution task reads only
    the shard(s) its batch touches, and per-round contributions flow
    through one partial-aggregated exchange to the destination shards —
    nothing node-sized ever lands on the driver (web-graph node
    counts).  ``"auto"`` (default) picks sharded past ``node_budget``
    nodes.  Both plans are BIT-IDENTICAL: same integer units, same
    floor-div-before-sum contributions, same lowest-id remainder
    respread (asserted by tests/test_graph_iter.py).

    ``checkpoint_dir`` makes the iteration RESUMABLE: every
    ``checkpoint_every`` rounds the rank state persists (broadcast: one
    atomic npz from the driver; sharded: each shard actor writes its
    own file, nothing node-sized through the driver) under a config
    hash — a killed job re-run with the same arguments resumes from
    the last completed round bit-exactly, a mismatched config starts
    fresh (the sketch-checkpoint contract applied to iteration state).

    ``output="dataset"`` returns a ``ray.data.Dataset`` of
    ``(node, rank)`` (plus the unit as an attribute-free second return)
    built from per-shard Arrow refs — use it at scale so the result
    never materializes on the driver; ``"arrays"`` (default) returns
    the legacy ``(node_ids, ranks_int, unit)`` tuple.
    """
    import ray

    from bqf_ray.stages.partition import bucketed_agg, bucketed_sum

    def edge_cols(batch: pa.Table) -> pa.Table:
        w = (np.asarray(batch.column(weight_col), dtype=np.int64)
             if weight_col else np.ones(len(batch), dtype=np.int64))
        return pa.table({
            "s": pa.array(np.asarray(batch.column(src_col),
                                     dtype=np.int64)),
            "t": pa.array(np.asarray(batch.column(dst_col),
                                     dtype=np.int64)),
            "w": pa.array(w)})

    edges = edges_ds.map_batches(edge_cols,
                                 batch_format="pyarrow").materialize()

    # node universe + weighted out-degrees (exact, one pass)
    def node_partials(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("s"), dtype=np.int64)
        t = np.asarray(batch.column("t"), dtype=np.int64)
        w = np.asarray(batch.column("w"), dtype=np.int64)
        su, inv = np.unique(s, return_inverse=True)
        sw = np.zeros(len(su), dtype=np.int64)
        np.add.at(sw, inv, w)
        tu = np.unique(t)
        return pa.table({
            "node": pa.array(np.concatenate([su, tu])),
            "deg": pa.array(np.concatenate(
                [sw, np.zeros(len(tu), dtype=np.int64)])),
            "wmax": pa.array(np.concatenate(
                [np.full(len(su), int(w.max(initial=1))),
                 np.ones(len(tu), dtype=np.int64)]))})

    # node-sized folds ride the 1-int hash-bucket exchange (the HITS
    # port measured 12.5x over the native sort-based groupby at 10M
    # edges — same shape here)
    nd_ds = bucketed_agg(
        edges.map_batches(node_partials, batch_format="pyarrow"),
        ["node"], [("deg", "sum", "deg"), ("wmax", "max", "wmax")])
    if mode not in ("auto", "broadcast", "sharded"):
        raise ValueError(f"pagerank: unknown mode {mode!r}")
    if mode != "broadcast":
        nd_ds = nd_ds.materialize()
        n_nodes = nd_ds.count()
        if mode == "sharded" or n_nodes > int(node_budget):
            plan_log("pagerank", "sharded", n_nodes=n_nodes,
                     node_budget=int(node_budget),
                     forced=int(mode == "sharded"))
            return _pagerank_sharded(
                edges, nd_ds, n_nodes, d_num=d_num, d_den=d_den,
                iters=iters, restart_nodes=restart_nodes,
                num_shards=num_shards, output=output,
                checkpoint_dir=checkpoint_dir,
                checkpoint_every=checkpoint_every,
                weight_col=weight_col)
    nd = nd_ds.to_pandas()
    if len(nd) == 0:                 # empty groupby: no columns at all
        empty = (np.empty(0, dtype=np.int64),
                 np.empty(0, dtype=np.int64), 1 << 40)
        return (_rank_arrays_to_dataset(*empty)
                if output == "dataset" else empty)
    nodes = nd["node"].to_numpy()
    order = np.argsort(nodes)
    nodes = nodes[order]
    deg = nd["deg"].to_numpy()[order].astype(np.int64)
    n = len(nodes)
    if n == 0:
        return nodes, np.empty(0, dtype=np.int64), 1 << 40
    w_max = max(int(nd["wmax"].max()), 1)
    UNIT = min(1 << 40, (1 << 62) // (n * d_num * w_max))
    if UNIT < (1 << 20):
        raise ValueError(
            f"pagerank: n·d_num·w_max = {n * d_num * w_max} leaves "
            "< 2^20 integer precision per node — shard the rank vector "
            "instead of the broadcast plan")

    # int64 is exact end-to-end: UNIT is scaled so n·UNIT·d_num·w_max
    # ≤ 2^62, hence every per-edge product, per-node sum, and the total
    # mass n·UNIT stay < 2^63 — object-dtype/python-int arithmetic buys
    # nothing and costs O(n) Python per iteration (r2 verdict #4).
    spos = None
    if restart_nodes is not None:
        seeds = np.unique(np.asarray(restart_nodes, dtype=np.int64))
        if not len(seeds):
            raise ValueError("pagerank: empty restart_nodes")
        spos = np.searchsorted(nodes, seeds)
        ok = (spos < n) & (nodes[np.minimum(spos, n - 1)] == seeds)
        if not ok.all():
            raise ValueError("pagerank: restart node(s) absent from "
                             f"the graph: {seeds[~ok][:5].tolist()}")
        ranks = np.zeros(n, dtype=np.int64)
        base, rem = divmod(n * UNIT, len(seeds))
        ranks[spos] = base
        ranks[spos[:rem]] += 1
    else:
        ranks = np.full(n, UNIT, dtype=np.int64)
    start_iter = 0
    ck_cfg = None
    if checkpoint_dir is not None:
        import io
        import json
        import os
        ck_cfg = _pr_ckpt_config(n, UNIT, d_num, d_den, weight_col,
                                 restart_nodes)
        meta_p = os.path.join(checkpoint_dir, "pr_meta.json")
        st_p = os.path.join(checkpoint_dir, "pr_state.npz")
        if os.path.exists(meta_p) and os.path.exists(st_p):
            with open(meta_p) as f:
                meta = json.load(f)
            if (meta.get("config") == ck_cfg
                    and 0 < int(meta.get("iter", 0)) <= int(iters)):
                dat = np.load(st_p)
                if np.array_equal(dat["nodes"], nodes):
                    ranks = dat["ranks"].astype(np.int64)
                    start_iter = int(meta["iter"])

    def _save_ckpt(it_done: int) -> None:
        import io
        import json
        import os

        from bqf_ray.state.checkpoint import _atomic_write
        buf = io.BytesIO()
        np.savez(buf, nodes=nodes, ranks=ranks)
        _atomic_write(os.path.join(checkpoint_dir, "pr_state.npz"),
                      buf.getvalue())
        _atomic_write(os.path.join(checkpoint_dir, "pr_meta.json"),
                      json.dumps({"config": ck_cfg,
                                  "iter": it_done}).encode())

    for _it in range(start_iter, int(iters)):
        ref = ray.put((nodes, ranks, deg))

        def contrib(batch: pa.Table) -> pa.Table:
            nn, rr, dd = ray.get(ref)
            s = np.asarray(batch.column("s"), dtype=np.int64)
            t = np.asarray(batch.column("t"), dtype=np.int64)
            w = np.asarray(batch.column("w"), dtype=np.int64)
            si = np.searchsorted(nn, s)
            c = (rr[si] * d_num * w) // (d_den * dd[si])
            tu, inv = np.unique(t, return_inverse=True)
            sums = np.zeros(len(tu), dtype=np.int64)
            np.add.at(sums, inv, c)
            return pa.table({"node": pa.array(tu),
                             "partial": pa.array(sums)})

        got = bucketed_sum(
            edges.map_batches(contrib, batch_format="pyarrow"),
            ["node"], {"partial": "r"}).to_pandas()
        new = np.zeros(n, dtype=np.int64)
        if len(got):
            gi = np.searchsorted(nodes, got["node"].to_numpy())
            new[gi] = got["r"].to_numpy().astype(np.int64)
        # conserve mass exactly: respread everything not delivered
        # (teleport + dangling + floor-div residue) uniformly —
        # vectorized divmod respread, bit-identical to per-node divmod
        delivered = int(new.sum())          # ≤ n·UNIT < 2^63: exact
        if spos is not None:                # PPR: respread to seeds
            base, rem = divmod(n * UNIT - delivered, len(spos))
            new[spos] += np.int64(base)
            new[spos[:rem]] += 1            # lowest-id seeds get the +1
        else:
            base, rem = divmod(n * UNIT - delivered, n)
            new += np.int64(base)
            new[:rem] += 1                  # pos < rem gets the +1
        ranks = new
        if checkpoint_dir is not None and (
                (_it + 1) % int(checkpoint_every) == 0
                or _it + 1 == int(iters)):
            _save_ckpt(_it + 1)

    if output == "dataset":
        return _rank_arrays_to_dataset(nodes, ranks, UNIT)
    return nodes, ranks, UNIT


def _rank_arrays_to_dataset(nodes, ranks, unit):
    import ray
    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "rank": pa.array(ranks, pa.int64()),
        "unit": pa.array(np.full(len(nodes), unit, dtype=np.int64))}))


class _PRShard:
    """One range-partitioned shard of the PageRank node state.

    Holds ``(nodes_sorted, deg, ranks)`` for its node-id range plus the
    shard's global offset (count of nodes in lower shards), so the
    "lowest-id ``rem`` nodes get the +1" respread is local arithmetic.
    Mutations are sequenced by the driver: ``stage_contribs`` (from the
    destination-bucket reduce groups) → ``commit`` (zeros + staged
    sums, returns delivered mass) → ``respread`` — each phase behind a
    ``ray.get`` barrier, so reads (``get_state``) only ever see fully
    committed rounds."""

    def __init__(self):
        self.nodes = np.empty(0, dtype=np.int64)
        self.deg = np.empty(0, dtype=np.int64)
        self.ranks = np.empty(0, dtype=np.int64)
        self._wmax = 1
        self._pend_nodes = None
        self._pend_sums = None
        self._new = None
        self._spos = None           # PPR: positions of seeds, sorted

    def init_shard(self, nodes, deg, wmax):
        order = np.argsort(nodes)
        self.nodes = nodes[order].astype(np.int64)
        self.deg = deg[order].astype(np.int64)
        self._wmax = int(wmax.max(initial=1))
        return len(self.nodes), self._wmax

    def set_seeds(self, seeds):
        """Sorted seed ids claimed for this shard → positions; returns
        the ids NOT found so the driver can raise with names."""
        pos = np.searchsorted(self.nodes, seeds)
        ok = (pos < len(self.nodes)) \
            & (self.nodes[np.minimum(pos, len(self.nodes) - 1)] == seeds)
        self._spos = pos[ok]
        return seeds[~ok]

    def init_ranks(self, fill, seed_base=0, seed_plus1=0):
        if self._spos is None:
            self.ranks = np.full(len(self.nodes), fill, dtype=np.int64)
        else:
            self.ranks = np.zeros(len(self.nodes), dtype=np.int64)
            self.ranks[self._spos] = seed_base
            self.ranks[self._spos[:seed_plus1]] += 1

    def get_state(self):
        return self.nodes, self.ranks, self.deg

    def stage_contribs(self, nodes, sums):
        self._pend_nodes = nodes
        self._pend_sums = sums

    def commit(self):
        new = np.zeros(len(self.nodes), dtype=np.int64)
        if self._pend_nodes is not None and len(self._pend_nodes):
            idx = np.searchsorted(self.nodes, self._pend_nodes)
            new[idx] = self._pend_sums
        self._pend_nodes = self._pend_sums = None
        self._new = new
        return int(new.sum())

    def respread(self, base, plus1):
        """Uniform respread: +base everywhere, +1 to the first
        ``plus1`` (lowest-id) nodes of this shard (driver pre-clips
        ``plus1`` by shard offsets)."""
        self._new += np.int64(base)
        self._new[:plus1] += 1
        self.ranks, self._new = self._new, None

    def respread_seeds(self, base, plus1):
        self._new[self._spos] += np.int64(base)
        self._new[self._spos[:plus1]] += 1
        self.ranks, self._new = self._new, None

    def n_seeds(self):
        return 0 if self._spos is None else len(self._spos)

    def state_table(self, unit):
        return pa.table({
            "node": pa.array(self.nodes),
            "rank": pa.array(self.ranks),
            "unit": pa.array(np.full(len(self.nodes), unit,
                                     dtype=np.int64))})

    def save_state(self, dir_, p):
        """Shard writes its OWN checkpoint file (atomic, deterministic
        name) — node-sized bytes never pass through the driver.  On a
        multi-node cluster ``dir_`` must be shared storage, same as the
        sketch checkpoints."""
        import io
        import os

        from bqf_ray.state.checkpoint import _atomic_write
        buf = io.BytesIO()
        np.savez(buf, nodes=self.nodes, ranks=self.ranks)
        _atomic_write(os.path.join(dir_, f"pr_shard_{p:05d}.npz"),
                      buf.getvalue())

    def load_state(self, dir_, p):
        import os
        path = os.path.join(dir_, f"pr_shard_{p:05d}.npz")
        if not os.path.exists(path):
            return False
        dat = np.load(path)
        if not np.array_equal(dat["nodes"], self.nodes):
            return False
        self.ranks = dat["ranks"].astype(np.int64)
        return True


# per-worker-process shard-state cache for the sharded-plan contribution
# tasks: keyed (round_token, shard); a token change (new round) clears
# it, so a worker holds at most the shards its current round's batches
# touch (edges are co-bucketed by source range, so that is ~P/W shards,
# not the whole vector)
_PR_SHARD_CACHE: dict = {}


def _make_shards(cls, P):
    """P shard actors, num_cpus=0 (short RPC handlers, never compute-
    bound) and SPREAD-scheduled so a multi-node cluster spreads the
    node-state memory across nodes instead of stacking it on the head
    node (single-node: no-op)."""
    import ray
    Shard = ray.remote(num_cpus=0)(cls)
    return [Shard.options(
        scheduling_strategy="SPREAD").remote() for _ in range(P)]


def _shard_run_id() -> str:
    """Per-run token component for the worker-side shard cache — a
    uuid, NOT ``id(actor)``: worker processes outlive queries and a
    recycled CPython id would silently serve a previous run's cached
    shard state."""
    import uuid
    return uuid.uuid4().hex


def _shard_route(ds, col: str, P: int):
    """Range router over ``ds[col]``: quantile boundaries once →
    ``route(values) -> shard id`` (monotone, identical everywhere)."""
    from bqf_ray.stages.partition import quantile_boundaries

    bounds = (quantile_boundaries(ds, col, P)
              if P > 1 else np.empty(0, dtype=np.float64))

    def route(arr):
        return np.searchsorted(
            bounds, np.asarray(arr, dtype=np.int64).astype(np.float64)
        ).astype(np.int64)

    return route


def _cobucket(ds, route, col: str, part_col: str):
    """Materialized co-bucket of ``ds`` by ``route(col)`` — the
    once-per-plan edge exchange every sharded graph plan shares."""
    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            part_col, pa.array(route(batch.column(col))))

    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby(part_col)
            .map_groups(lambda t: t, batch_format="pyarrow")
            .materialize())


def _shard_scaffold(ed, col: str, P: int, part_col: str):
    """One-dataset composition of the above: materialize the (possibly
    doubled) edge projection ONCE (the boundaries pass AND the
    co-bucket both read it), route, co-bucket — returns
    ``(run_id, route, edges_bucketed)``."""
    ed = ed.materialize()
    route = _shard_route(ed, col, P)
    return _shard_run_id(), route, _cobucket(ed, route, col, part_col)


def _pr_cached_state(actors, token, p, max_entries: int = 8):
    import ray
    stale = [k for k in _PR_SHARD_CACHE if k[0] != token]
    for k in stale:
        del _PR_SHARD_CACHE[k]
    key = (token, p)
    if key not in _PR_SHARD_CACHE:
        # bound worker residency: a static token (e.g. the walk plan's
        # CSR shards) would otherwise accumulate every shard a worker
        # ever touches — evict oldest entries FIFO past the cap
        while len(_PR_SHARD_CACHE) >= max_entries:
            del _PR_SHARD_CACHE[next(iter(_PR_SHARD_CACHE))]
        _PR_SHARD_CACHE[key] = ray.get(actors[p].get_state.remote())
    return _PR_SHARD_CACHE[key]


def _pagerank_sharded(edges, nd_ds, n, *, d_num, d_den, iters,
                      restart_nodes, num_shards, output,
                      checkpoint_dir=None, checkpoint_every=1,
                      weight_col=None):
    """Node-sharded PageRank plan: see :func:`pagerank` docstring.

    Driver state is O(num_shards); the rank/deg vector lives in shard
    actors; edges shuffle ONCE (co-bucket by source range); each round
    is one edge scan + one partial-aggregated contribution exchange +
    O(P) actor RPCs."""
    import ray

    if n == 0:
        empty = (np.empty(0, dtype=np.int64),
                 np.empty(0, dtype=np.int64), 1 << 40)
        return (_rank_arrays_to_dataset(*empty)
                if output == "dataset" else empty)
    P = max(1, min(int(num_shards), n))
    route = _shard_route(nd_ds, "node", P)
    run_id = _shard_run_id()

    actors = _make_shards(_PRShard, P)

    def init_groups(group: pa.Table) -> pa.Table:
        p = int(group.column("__sp")[0].as_py())
        cnt, wmax = ray.get(actors[p].init_shard.remote(
            np.asarray(group.column("node"), dtype=np.int64),
            np.asarray(group.column("deg"), dtype=np.int64),
            np.asarray(group.column("wmax"), dtype=np.int64)))
        return pa.table({"p": pa.array([p], pa.int64()),
                         "cnt": pa.array([cnt], pa.int64()),
                         "wmax": pa.array([wmax], pa.int64())})

    def add_sp(col_name):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__sp", pa.array(route(batch.column(col_name))))
        return fn

    init = (nd_ds.map_batches(add_sp("node"), batch_format="pyarrow")
            .groupby("__sp").map_groups(init_groups,
                                        batch_format="pyarrow")
            .to_pandas())
    counts = np.zeros(P, dtype=np.int64)
    counts[init["p"].to_numpy()] = init["cnt"].to_numpy()
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    assert int(counts.sum()) == n
    w_max = max(int(init["wmax"].max()), 1)
    UNIT = min(1 << 40, (1 << 62) // (n * d_num * w_max))
    if UNIT < (1 << 20):
        raise ValueError(
            f"pagerank: n·d_num·w_max = {n * d_num * w_max} leaves "
            "< 2^20 integer precision per node even sharded — lower "
            "d_num or split the graph")

    # PPR seed registration: shards claim their sorted-seed slices, so
    # "lowest-id seeds get the +1" is (seed_offset, clip) arithmetic
    n_seeds = 0
    seed_offsets = np.zeros(P, dtype=np.int64)
    if restart_nodes is not None:
        seeds = np.unique(np.asarray(restart_nodes, dtype=np.int64))
        if not len(seeds):
            raise ValueError("pagerank: empty restart_nodes")
        sp = route(seeds)
        missing = ray.get([
            actors[p].set_seeds.remote(seeds[sp == p])
            for p in range(P)])
        bad = np.concatenate(missing)
        if len(bad):
            raise ValueError("pagerank: restart node(s) absent from "
                             f"the graph: {bad[:5].tolist()}")
        per_shard = np.asarray(
            ray.get([a.n_seeds.remote() for a in actors]))
        n_seeds = int(per_shard.sum())
        seed_offsets = np.concatenate([[0], np.cumsum(per_shard)[:-1]])

    def init_all_ranks():
        if restart_nodes is not None:
            base, rem = divmod(n * UNIT, n_seeds)
            ray.get([actors[p].init_ranks.remote(
                0, seed_base=base,
                seed_plus1=int(np.clip(rem - seed_offsets[p], 0,
                                       per_shard[p])))
                for p in range(P)])
        else:
            ray.get([a.init_ranks.remote(UNIT) for a in actors])

    init_all_ranks()

    # co-bucket edges by source range ONCE; every round's contribution
    # tasks then touch only the shard(s) their batch's bucket covers
    edges_b = _cobucket(edges, route, "s", "__sp")

    start_iter = 0
    ck_cfg = None
    if checkpoint_dir is not None:
        import json
        import os

        from bqf_ray.state.checkpoint import _atomic_write
        ck_cfg = _pr_ckpt_config(n, UNIT, d_num, d_den, weight_col,
                                 restart_nodes)
        meta_p = os.path.join(checkpoint_dir, "pr_sharded_meta.json")
        if os.path.exists(meta_p):
            with open(meta_p) as f:
                meta = json.load(f)
            if (meta.get("config") == ck_cfg and meta.get("P") == P
                    and 0 < int(meta.get("iter", 0)) <= int(iters)):
                loaded = ray.get([
                    actors[p].load_state.remote(checkpoint_dir, p)
                    for p in range(P)])
                if all(loaded):
                    start_iter = int(meta["iter"])
                elif any(loaded):
                    # PARTIAL load (a shard's file lost/damaged): the
                    # loaded shards now hold checkpointed ranks while
                    # the rest hold the fresh init — re-init everything
                    # so the from-scratch recompute starts consistent
                    init_all_ranks()

    for it in range(start_iter, int(iters)):
        token = f"pr-{run_id}-{it}"

        def contrib(batch: pa.Table) -> pa.Table:
            sp = np.asarray(batch.column("__sp"), dtype=np.int64)
            s = np.asarray(batch.column("s"), dtype=np.int64)
            t = np.asarray(batch.column("t"), dtype=np.int64)
            w = np.asarray(batch.column("w"), dtype=np.int64)
            outs_n, outs_c = [], []
            for p in np.unique(sp):
                m = sp == p
                nn, rr, dd = _pr_cached_state(actors, token, int(p))
                si = np.searchsorted(nn, s[m])
                c = (rr[si] * d_num * w[m]) // (d_den * dd[si])
                tu, inv = np.unique(t[m], return_inverse=True)
                sums = np.zeros(len(tu), dtype=np.int64)
                np.add.at(sums, inv, c)
                outs_n.append(tu)
                outs_c.append(sums)
            node = np.concatenate(outs_n) if outs_n \
                else np.empty(0, dtype=np.int64)
            csum = np.concatenate(outs_c) if outs_c \
                else np.empty(0, dtype=np.int64)
            return pa.table({"node": pa.array(node),
                             "partial": pa.array(csum),
                             "__tp": pa.array(route(node))})

        def reduce_stage(group: pa.Table) -> pa.Table:
            p = int(group.column("__tp")[0].as_py())
            gn = np.asarray(group.column("node"), dtype=np.int64)
            gs = np.asarray(group.column("partial"), dtype=np.int64)
            tu, inv = np.unique(gn, return_inverse=True)
            sums = np.zeros(len(tu), dtype=np.int64)
            np.add.at(sums, inv, gs)
            ray.get(actors[p].stage_contribs.remote(tu, sums))
            return pa.table({"p": pa.array([p], pa.int64())})

        (edges_b.map_batches(contrib, batch_format="pyarrow")
         .groupby("__tp")
         .map_groups(reduce_stage, batch_format="pyarrow")
         .materialize())
        delivered = sum(ray.get([a.commit.remote() for a in actors]))
        if restart_nodes is not None:
            base, rem = divmod(n * UNIT - delivered, n_seeds)
            per_shard_seeds = np.asarray(
                ray.get([a.n_seeds.remote() for a in actors]))
            ray.get([actors[p].respread_seeds.remote(
                base, int(np.clip(rem - seed_offsets[p], 0,
                                  per_shard_seeds[p])))
                for p in range(P)])
        else:
            base, rem = divmod(n * UNIT - delivered, n)
            ray.get([actors[p].respread.remote(
                base, int(np.clip(rem - offsets[p], 0, counts[p])))
                for p in range(P)])
        if checkpoint_dir is not None and (
                (it + 1) % int(checkpoint_every) == 0
                or it + 1 == int(iters)):
            import json
            import os

            from bqf_ray.state.checkpoint import _atomic_write
            ray.get([actors[p].save_state.remote(checkpoint_dir, p)
                     for p in range(P)])
            _atomic_write(
                os.path.join(checkpoint_dir, "pr_sharded_meta.json"),
                json.dumps({"config": ck_cfg, "P": P,
                            "iter": it + 1}).encode())

    refs = [a.state_table.remote(UNIT) for a in actors]
    if output == "dataset":
        return ray.data.from_arrow_refs(refs)
    tables = ray.get(refs)
    tbl = pa.concat_tables(tables)
    return (np.asarray(tbl.column("node"), dtype=np.int64),
            np.asarray(tbl.column("rank"), dtype=np.int64), UNIT)


def _packed_pair_set(a: np.ndarray, b: np.ndarray):
    """Sorted membership structure over (a, b) pairs using PLAIN int64
    keys: node ids compress to vocabulary codes and each pair packs as
    ``code_a·n + code_b``.  A structured-dtype ``searchsorted`` does
    per-element void compares — measured ~10-30× slower than the int64
    probe at the 41M-wedge copurchase scale — so every
    wedge-closure membership test goes through this instead."""
    if not len(a):
        return (np.empty(0, dtype=np.int64), 0,
                np.empty(0, dtype=np.int64))
    vu, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    n = len(vu)
    packed = np.sort(inv[:len(a)].astype(np.int64) * n + inv[len(a):])
    return vu, n, packed


def _packed_pair_probe(ps, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Membership of (x, y) pairs in a :func:`_packed_pair_set`."""
    vu, n, packed = ps
    if not len(packed) or not len(x):
        return np.zeros(len(x), dtype=bool)
    cx = np.searchsorted(vu, x)
    cy = np.searchsorted(vu, y)
    ok = ((cx < n) & (vu[np.minimum(cx, n - 1)] == x)
          & (cy < n) & (vu[np.minimum(cy, n - 1)] == y))
    q = (np.minimum(cx, n - 1).astype(np.int64) * n
         + np.minimum(cy, n - 1))
    pos = np.minimum(np.searchsorted(packed, q), len(packed) - 1)
    return ok & (packed[pos] == q)


def _segment_pairs(sort_key: np.ndarray, values: np.ndarray
                   ) -> tuple[np.ndarray, np.ndarray]:
    """All unordered within-segment value pairs, fully vectorized:
    sort by segment key, then for each DISTINCT segment size d gather
    the segments into one (k, d) matrix and apply a single
    ``triu_indices`` fancy-index — no per-segment Python loop (the loop
    is over distinct sizes, bounded by max segment length)."""
    order = np.lexsort((values, sort_key))
    k, v = sort_key[order], values[order]
    starts = np.concatenate([[True], k[1:] != k[:-1]]) \
        if len(k) else np.empty(0, dtype=bool)
    seg_off = np.flatnonzero(starts)
    seg_cnt = np.diff(np.append(seg_off, len(k)))
    xs, ys = [], []
    for d in np.unique(seg_cnt):
        if d < 2:
            continue
        offs = seg_off[seg_cnt == d]
        mat = v[(offs[:, None] + np.arange(d)[None, :])]
        iu, ju = np.triu_indices(int(d), 1)
        xs.append(mat[:, iu].ravel())
        ys.append(mat[:, ju].ravel())
    if not xs:
        e = np.empty(0, dtype=values.dtype)
        return e, e.copy()
    return np.concatenate(xs), np.concatenate(ys)


def cooccurrence_edges(ds, group_col: str, item_col: str,
                       num_buckets: int = 64):
    """Undirected co-occurrence edges: one (min, max) item pair for
    every two DISTINCT items sharing a ``group_col`` value (the
    co-purchase / co-citation projection of a bipartite table).  One
    group-hash bucketed exchange; pair generation inside the bucket is
    the vectorized :func:`_segment_pairs`.  Emits duplicates when a
    pair co-occurs in several groups — feed :func:`triangle_count` (or
    any consumer that dedups) downstream."""
    from bqf_ray.functions.hashing import fmix64

    B = int(num_buckets)

    def tag(batch: pa.Table) -> pa.Table:
        g = np.asarray(batch.column(group_col), dtype=np.int64)
        return pa.table({
            "g": pa.array(g),
            "i": pa.array(np.asarray(batch.column(item_col),
                                     dtype=np.int64)),
            "__bucket": pa.array((fmix64(g.view(np.uint64))
                                  % np.uint64(B)).astype(np.int64))})

    def gen(grp: pa.Table) -> pa.Table:
        g = np.asarray(grp.column("g"), dtype=np.int64)
        i = np.asarray(grp.column("i"), dtype=np.int64)
        # dedupe (group, item) so a repeated item in one group doesn't
        # emit self-pairs
        order = np.lexsort((i, g))
        g, i = g[order], i[order]
        uniq = np.concatenate([[True], (g[1:] != g[:-1]) | (i[1:] != i[:-1])]) \
            if len(g) else np.empty(0, dtype=bool)
        g, i = g[uniq], i[uniq]
        x, y = _segment_pairs(g, i)
        return pa.table({"a": pa.array(np.minimum(x, y)),
                         "b": pa.array(np.maximum(x, y))})

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__bucket").map_groups(gen, batch_format="pyarrow"))


def _pair_hash64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    from bqf_ray.functions.hashing import fmix64
    GOLD = np.uint64(0x9E3779B97F4A7C15)
    return fmix64(a.astype(np.int64).view(np.uint64) * GOLD
                  ^ fmix64(b.astype(np.int64).view(np.uint64)))


def canonical_edges(edges_ds, a_col: str = "a", b_col: str = "b",
                    num_buckets: int = 64):
    """Canonicalize an undirected edge stream to distinct (min, max)
    pairs: per-block pre-dedupe, ONE pair-hash bucket exchange, exact
    in-bucket dedupe.  Self-loops dropped.  Returns a MATERIALIZED
    (a, b) dataset (downstream graph ops consume it several times)."""
    B = int(num_buckets)

    def canon(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch.column(a_col), dtype=np.int64)
        y = np.asarray(batch.column(b_col), dtype=np.int64)
        keep = x != y
        x, y = x[keep], y[keep]
        a = np.minimum(x, y)
        b = np.maximum(x, y)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        uniq = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])]) \
            if len(a) else np.empty(0, dtype=bool)
        a, b = a[uniq], b[uniq]
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "__bucket": pa.array(
                             (_pair_hash64(a, b) % np.uint64(B))
                             .astype(np.int64))})

    def dedup_bucket(g: pa.Table) -> pa.Table:
        a = np.asarray(g.column("a"), dtype=np.int64)
        b = np.asarray(g.column("b"), dtype=np.int64)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        uniq = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])]) \
            if len(a) else np.empty(0, dtype=bool)
        return pa.table({"a": pa.array(a[uniq]), "b": pa.array(b[uniq])})

    return (edges_ds.map_batches(canon, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(dedup_bucket, batch_format="pyarrow")
            .materialize())


def attach_degrees(edges, num_buckets: int = 64, mode: str = "auto",
                   broadcast_budget_bytes: int = 1 << 30,
                   deg_edges=None):
    """Exact vertex degrees over canonical edges, attached to BOTH
    endpoints (``deg_a``, ``deg_b``).  With ``deg_edges`` given,
    degrees are counted over THAT edge set instead while still
    attaching to ``edges``'s endpoints (e.g. candidate pairs scored
    against the original graph's degrees in :func:`link_prediction`);
    every ``edges`` endpoint must then appear in ``deg_edges``.

    Two plans, budget-gated like ``dedup.verify_pairs``:

    - ``broadcast`` (vertex-degree table ≤ ``broadcast_budget_bytes``,
      16 B/vertex): sort the degree table once on the driver,
      ``ray.put`` it, and attach both endpoint degrees in ONE
      zero-copy searchsorted map — no exchange at all.  Co-occurrence
      projections have vertex count ≪ edge count, so this is the
      common case.
    - ``bucketed`` (scale path): two key-bucketed co-partitions
      (union tag + per-bucket searchsorted) — no driver collect, the
      degree table stays distributed.
    """
    import ray

    from bqf_ray.functions.hashing import fmix64
    from bqf_ray.stages.partition import bucketed_sum

    B = int(num_buckets)

    def endpoints(batch: pa.Table) -> pa.Table:
        v = np.concatenate([np.asarray(batch.column("a"), dtype=np.int64),
                            np.asarray(batch.column("b"), dtype=np.int64)])
        uv, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uv),
                         "c": pa.array(cnt.astype(np.int64))})

    deg = bucketed_sum((deg_edges if deg_edges is not None else edges)
                       .map_batches(endpoints, batch_format="pyarrow"),
                       ["v"], {"c": "deg"},
                       num_buckets=B).materialize()

    if mode == "auto":
        n_deg = deg.count()
        mode = ("broadcast"
                if 16 * n_deg <= int(broadcast_budget_bytes)
                else "bucketed")
        plan_log("attach_degrees", mode, deg_bytes=16 * n_deg,
                 budget_bytes=int(broadcast_budget_bytes))

    if mode == "broadcast":
        blocks = [t for t in ray.get(deg.to_arrow_refs()) if t.num_rows]
        dv = (np.concatenate([np.asarray(t.column("v"), dtype=np.int64)
                              for t in blocks])
              if blocks else np.empty(0, dtype=np.int64))
        dd = (np.concatenate([np.asarray(t.column("deg"), dtype=np.int64)
                              for t in blocks])
              if blocks else np.empty(0, dtype=np.int64))
        order = np.argsort(dv)
        ref = ray.put((dv[order], dd[order]))

        def lookup(batch: pa.Table) -> pa.Table:
            vs, ds_ = ray.get(ref)  # zero-copy plasma reads
            a = np.asarray(batch.column("a"), dtype=np.int64)
            b = np.asarray(batch.column("b"), dtype=np.int64)
            # every endpoint has a degree row by construction
            da = ds_[np.searchsorted(vs, a)]
            db = ds_[np.searchsorted(vs, b)]
            return (batch.append_column("deg_a", pa.array(da))
                    .append_column("deg_b", pa.array(db)))

        return edges.map_batches(lookup, batch_format="pyarrow")

    def _attach(es, key: str, out: str):
        cols = list(es.schema().names)

        def tag_e(batch: pa.Table) -> pa.Table:
            k = np.asarray(batch.column(key), dtype=np.int64)
            bkt = (fmix64(k.view(np.uint64)) % np.uint64(B)).astype(np.int64)
            t = batch.append_column("__bucket", pa.array(bkt))
            t = t.append_column("__deg", pa.array(
                np.zeros(len(batch), dtype=np.int64)))
            return t.append_column("__side", pa.array(
                np.zeros(len(batch), dtype=np.int8)))

        def tag_d(batch: pa.Table) -> pa.Table:
            v = np.asarray(batch.column("v"), dtype=np.int64)
            bkt = (fmix64(v.view(np.uint64)) % np.uint64(B)).astype(np.int64)
            cols_d = {c: pa.array(np.zeros(len(v), dtype=np.int64))
                      for c in cols if c != key}
            cols_d[key] = pa.array(v)
            cols_d["__bucket"] = pa.array(bkt)
            cols_d["__deg"] = batch.column("deg")
            cols_d["__side"] = pa.array(np.ones(len(v), dtype=np.int8))
            return pa.table(cols_d).select([*cols, "__bucket", "__deg",
                                            "__side"])

        def join_bucket(g: pa.Table) -> pa.Table:
            side = np.asarray(g.column("__side"))
            k = np.asarray(g.column(key), dtype=np.int64)
            dv = k[side == 1]
            dd = np.asarray(g.column("__deg"))[side == 1]
            order = np.argsort(dv)
            dv, dd = dv[order], dd[order]
            emask = side == 0
            ek = k[emask]
            pos = np.searchsorted(dv, ek)
            # every edge endpoint has a degree row by construction
            got = dd[pos]
            out_t = g.filter(pa.array(emask)).select(cols)
            return out_t.append_column(out, pa.array(got.astype(np.int64)))

        return (es.map_batches(tag_e, batch_format="pyarrow")
                .union(deg.map_batches(tag_d, batch_format="pyarrow"))
                .groupby("__bucket")
                .map_groups(join_bucket, batch_format="pyarrow"))

    return _attach(_attach(edges, "a", "deg_a"), "b", "deg_b")


def _triangle_count_broadcast(edges, n_edges: int, num_buckets: int):
    """Broadcast fast path of :func:`triangle_count`: the canonical
    edge list fits the broadcast budget, so collect it ONCE, compute
    degrees + orientation + the sorted membership array on the driver
    (three vectorized passes over ≤ budget/16 rows), ``ray.put`` the
    result, and fan the wedge-generate-and-close work out over source
    hash buckets — zero further exchanges, every task reads the
    broadcast zero-copy."""
    import ray
    import ray.data

    from bqf_ray.functions.hashing import fmix64

    B = int(num_buckets)
    blocks = [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows]
    a = (np.concatenate([np.asarray(t.column("a"), dtype=np.int64)
                         for t in blocks])
         if blocks else np.empty(0, dtype=np.int64))
    b = (np.concatenate([np.asarray(t.column("b"), dtype=np.int64)
                         for t in blocks])
         if blocks else np.empty(0, dtype=np.int64))
    vu, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    deg = np.bincount(inv).astype(np.int64)
    da, db = deg[inv[:len(a)]], deg[inv[len(a):]]
    a_first = (da < db) | ((da == db) & (a < b))
    u = np.where(a_first, a, b)
    v = np.where(a_first, b, a)
    ubkt = (fmix64(u.view(np.uint64)) % np.uint64(B)).astype(np.int64)
    ps = _packed_pair_set(a, b)
    ref = ray.put((u, v, ubkt, ps))

    def bucket_task(batch: pa.Table) -> pa.Table:
        bu, bv, bbkt, bps = ray.get(ref)  # zero-copy plasma reads
        tri = wed = 0
        for i in np.asarray(batch.column("id"), dtype=np.int64):
            m = bbkt == i
            x, y = _segment_pairs(bu[m], bv[m])
            if not len(x):
                continue
            wed += len(x)
            wa, wb = np.minimum(x, y), np.maximum(x, y)
            # dedupe to (pair, count) before the membership probe
            order = np.lexsort((wb, wa))
            wa, wb = wa[order], wb[order]
            new = np.concatenate([[True], (wa[1:] != wa[:-1])
                                  | (wb[1:] != wb[:-1])])
            idx = np.flatnonzero(new)
            cnt = np.diff(np.append(idx, len(wa)))
            wa, wb = wa[idx], wb[idx]
            hit = _packed_pair_probe(bps, wa, wb)
            tri += int(cnt[hit].sum())
        return pa.table({"tri": pa.array([tri], type=pa.int64()),
                         "wed": pa.array([wed], type=pa.int64())})

    closed = (ray.data.range(B, override_num_blocks=B)
              .map_batches(bucket_task, batch_format="pyarrow")
              .materialize())
    return pa.table({
        "n_edges": pa.array([int(n_edges)], type=pa.int64()),
        "n_wedges": pa.array([int(closed.sum("wed") or 0)],
                             type=pa.int64()),
        "n_triangles": pa.array([int(closed.sum("tri") or 0)],
                                type=pa.int64())})


def triangle_count(edges_ds, a_col: str = "a", b_col: str = "b",
                   num_buckets: int = 64, mode: str = "auto",
                   broadcast_budget_bytes: int = 1 << 30):
    """EXACT distributed triangle count over an undirected edge stream
    (self-loops and duplicate/reversed edges tolerated) — the classic
    node-iterator-with-degree-orientation algorithm cast as bucketed
    exchanges:

    1. canonicalize (min,max), dedupe via one pair-hash bucket exchange;
    2. exact degrees via :func:`bucketed_sum`; attach deg to both
       endpoints with two key-bucketed co-partitions (union + per-bucket
       searchsorted — no driver collect, no broadcast: the degree table
       is vertex-sized);
    3. orient every edge from its (degree, id)-smaller endpoint — the
       standard bound: every out-degree is at most ~sqrt(2E), so wedge
       generation is O(E^1.5) worst case and per-hub work collapses;
    4. generate wedges per source INSIDE u-hash buckets, fully
       vectorized by grouping same-out-degree sources into (k, d)
       matrices + one triu_indices gather per distinct degree,
       pre-aggregated to (pair, count) before leaving the bucket;
    5. close wedges against the edge set in one pair-hash bucketed
       semi-join (structured-array searchsorted membership).

    Every exchange key is a single int hash bucket (memory/shuffle-key
    lesson of ``stages/partition.bucketed_agg``).  Returns a one-row
    table ``(n_edges, n_wedges, n_triangles)`` — each column exactly
    SQL-recomputable, so the whole operator is oracle-checkable.

    ``mode="auto"`` routes to :func:`_triangle_count_broadcast` when
    the canonical edge list fits ``broadcast_budget_bytes`` (16 B per
    edge): one driver collect + zero-copy broadcast replaces the five
    post-canonicalization exchanges.  Past the budget (or with
    ``mode="bucketed"``) the fully-distributed plan below runs — no
    stage of it ever holds more than one bucket."""
    from bqf_ray.functions.hashing import fmix64

    B = int(num_buckets)
    _pair_hash = _pair_hash64

    edges = canonical_edges(edges_ds, a_col, b_col, num_buckets=B)
    n_edges = edges.count()
    if mode == "auto":
        mode = ("broadcast"
                if 16 * n_edges <= int(broadcast_budget_bytes)
                else "bucketed")
        plan_log("triangle_count", mode, edge_bytes=16 * n_edges,
                 budget_bytes=int(broadcast_budget_bytes))
    if mode == "broadcast":
        return _triangle_count_broadcast(edges, n_edges, B)
    attached = attach_degrees(edges, num_buckets=B, mode="bucketed")

    # -- 3 + 4. orient, bucket by source, vectorized wedge gen -------
    def orient(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"), dtype=np.int64)
        b = np.asarray(batch.column("b"), dtype=np.int64)
        da = np.asarray(batch.column("deg_a"), dtype=np.int64)
        db = np.asarray(batch.column("deg_b"), dtype=np.int64)
        a_first = (da < db) | ((da == db) & (a < b))
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        return pa.table({"u": pa.array(u), "v": pa.array(v),
                         "__bucket": pa.array(
                             (fmix64(u.view(np.uint64)) % np.uint64(B))
                             .astype(np.int64))})

    def wedges_bucket(g: pa.Table) -> pa.Table:
        u = np.asarray(g.column("u"), dtype=np.int64)
        v = np.asarray(g.column("v"), dtype=np.int64)
        x, y = _segment_pairs(u, v)
        if len(x):
            wa, wb = np.minimum(x, y), np.maximum(x, y)
            # pre-aggregate (pair -> count) before leaving the bucket
            order = np.lexsort((wb, wa))
            wa, wb = wa[order], wb[order]
            new = np.concatenate([[True], (wa[1:] != wa[:-1])
                                  | (wb[1:] != wb[:-1])])
            idx = np.flatnonzero(new)
            cnt = np.diff(np.append(idx, len(wa)))
            wa, wb = wa[idx], wb[idx]
        else:
            wa = wb = np.empty(0, dtype=np.int64)
            cnt = np.empty(0, dtype=np.int64)
        return pa.table({"a": pa.array(wa), "b": pa.array(wb),
                         "wcnt": pa.array(cnt.astype(np.int64))})

    wedges = (attached.map_batches(orient, batch_format="pyarrow")
              .groupby("__bucket")
              .map_groups(wedges_bucket, batch_format="pyarrow"))

    # -- 5. close against the edge set -------------------------------
    def tag_w(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"), dtype=np.int64)
        b = np.asarray(batch.column("b"), dtype=np.int64)
        return pa.table({"a": batch.column("a"), "b": batch.column("b"),
                         "wcnt": batch.column("wcnt"),
                         "__bucket": pa.array(
                             (_pair_hash(a, b) % np.uint64(B))
                             .astype(np.int64)),
                         "__side": pa.array(
                             np.zeros(len(batch), dtype=np.int8))})

    def tag_edge(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"), dtype=np.int64)
        b = np.asarray(batch.column("b"), dtype=np.int64)
        return pa.table({"a": batch.column("a"), "b": batch.column("b"),
                         "wcnt": pa.array(np.zeros(len(batch),
                                                   dtype=np.int64)),
                         "__bucket": pa.array(
                             (_pair_hash(a, b) % np.uint64(B))
                             .astype(np.int64)),
                         "__side": pa.array(
                             np.ones(len(batch), dtype=np.int8))})

    def close_bucket(g: pa.Table) -> pa.Table:
        side = np.asarray(g.column("__side"))
        a = np.asarray(g.column("a"), dtype=np.int64)
        b = np.asarray(g.column("b"), dtype=np.int64)
        w = np.asarray(g.column("wcnt"), dtype=np.int64)
        ps = _packed_pair_set(a[side == 1], b[side == 1])
        wm = side == 0
        hit = _packed_pair_probe(ps, a[wm], b[wm])
        return pa.table({
            "tri": pa.array([int(w[wm][hit].sum())], type=pa.int64()),
            "wed": pa.array([int(w[wm].sum())], type=pa.int64())})

    closed = (wedges.map_batches(tag_w, batch_format="pyarrow")
              .union(edges.map_batches(tag_edge, batch_format="pyarrow"))
              .groupby("__bucket")
              .map_groups(close_bucket, batch_format="pyarrow")
              .materialize())
    n_tri = int(closed.sum("tri") or 0)
    n_wed = int(closed.sum("wed") or 0)
    return pa.table({"n_edges": pa.array([int(n_edges)], type=pa.int64()),
                     "n_wedges": pa.array([n_wed], type=pa.int64()),
                     "n_triangles": pa.array([n_tri], type=pa.int64())})


def degree_assortativity(edges_ds, a_col: str = "a", b_col: str = "b",
                         num_buckets: int = 64, mode: str = "auto",
                         broadcast_budget_bytes: int = 1 << 30):
    """Degree-assortativity components of an undirected graph (Newman
    2002) as EXACT INTEGER sums — the repo's established pattern for
    making a floating-point statistic oracle-exact (cf. the per-group
    Pearson components of ``value_k_correlation``): the Pearson
    correlation over the directed-edge degree sequence is

        r = (m2*s11 - s1^2) / (m2*s2 - s1^2)

    where over each undirected edge {u, v}: m2 += 2, s1 += du + dv,
    s2 += du^2 + dv^2, s11 += 2*du*dv.  All four are int64-exact, so
    the oracle replays them bit-for-bit; callers derive float r.

    One canonical-edge exchange + :func:`attach_degrees` (broadcast
    degree lookup under the budget, two bucketed co-partitions past
    it), then a pure per-batch integer fold."""
    edges = canonical_edges(edges_ds, a_col, b_col, num_buckets=num_buckets)
    attached = attach_degrees(edges, num_buckets=num_buckets, mode=mode,
                              broadcast_budget_bytes=broadcast_budget_bytes)

    def fold(batch: pa.Table) -> pa.Table:
        da = np.asarray(batch.column("deg_a"), dtype=np.int64)
        db = np.asarray(batch.column("deg_b"), dtype=np.int64)
        return pa.table({
            "m2": pa.array([2 * len(da)], type=pa.int64()),
            "s1": pa.array([int((da + db).sum())], type=pa.int64()),
            "s2": pa.array([int((da * da + db * db).sum())],
                           type=pa.int64()),
            "s11": pa.array([int(2 * (da * db).sum())], type=pa.int64())})

    parts = attached.map_batches(fold, batch_format="pyarrow").materialize()
    return pa.table({
        "m2": pa.array([int(parts.sum("m2") or 0)], type=pa.int64()),
        "s1": pa.array([int(parts.sum("s1") or 0)], type=pa.int64()),
        "s2": pa.array([int(parts.sum("s2") or 0)], type=pa.int64()),
        "s11": pa.array([int(parts.sum("s11") or 0)], type=pa.int64())})


def butterfly_count(ds, group_col: str, item_col: str,
                    num_buckets: int = 64):
    """EXACT butterfly (bipartite 4-cycle) count of a (group, item)
    bipartite table: butterflies = sum over item pairs {a, b} of
    C(c_ab, 2), where c_ab = number of distinct groups containing both
    — the bipartite clustering primitive (Wang et al., "Butterfly
    counting in bipartite networks", 2014).

    Plan: :func:`cooccurrence_edges` emits one (a, b) row per
    co-occurring group (multiplicity preserved), ONE pair-bucketed
    exact count (:func:`bucketed_sum` over the pair), then a per-batch
    integer fold of C(c, 2) — no driver-side loop.  Returns one row
    ``(n_item_pairs, n_butterflies)``, both int64-exact."""
    from bqf_ray.stages.partition import bucketed_sum

    pairs = cooccurrence_edges(ds, group_col, item_col,
                               num_buckets=num_buckets)

    def tag_one(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "one", pa.array(np.ones(len(batch), dtype=np.int64)))

    counts = bucketed_sum(pairs.map_batches(tag_one, batch_format="pyarrow"),
                          ["a", "b"], {"one": "c"},
                          num_buckets=num_buckets)

    def fold(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch.column("c"), dtype=np.int64)
        return pa.table({
            "np_": pa.array([len(c)], type=pa.int64()),
            "bf": pa.array([int((c * (c - 1) // 2).sum())],
                           type=pa.int64())})

    parts = counts.map_batches(fold, batch_format="pyarrow").materialize()
    return pa.table({
        "n_item_pairs": pa.array([int(parts.sum("np_") or 0)],
                                 type=pa.int64()),
        "n_butterflies": pa.array([int(parts.sum("bf") or 0)],
                                  type=pa.int64())})


def _attach_value(es, lookup, key: str, out: str, num_buckets: int = 64):
    """Attach ``lookup`` — an int64 ``(v, val)`` dataset, unique per
    ``v``, covering every ``es[key]`` — to ``es`` as column ``out`` via
    ONE key-bucketed co-partition (union tag + per-bucket searchsorted).
    The distributed-side generalization of ``attach_degrees``'s
    bucketed plan; use a ``ray.put`` broadcast instead when the lookup
    fits the budget."""
    from bqf_ray.functions.hashing import fmix64

    B = int(num_buckets)
    cols = list(es.schema().names)

    def tag_e(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch.column(key), dtype=np.int64)
        bkt = (fmix64(k.view(np.uint64)) % np.uint64(B)).astype(np.int64)
        t = batch.append_column("__bucket", pa.array(bkt))
        t = t.append_column("__val", pa.array(
            np.zeros(len(batch), dtype=np.int64)))
        return t.append_column("__side", pa.array(
            np.zeros(len(batch), dtype=np.int8)))

    def tag_l(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column("v"), dtype=np.int64)
        bkt = (fmix64(v.view(np.uint64)) % np.uint64(B)).astype(np.int64)
        cols_d = {c: pa.array(np.zeros(len(v), dtype=np.int64))
                  for c in cols if c != key}
        cols_d[key] = pa.array(v)
        cols_d["__bucket"] = pa.array(bkt)
        cols_d["__val"] = batch.column("val")
        cols_d["__side"] = pa.array(np.ones(len(v), dtype=np.int8))
        return pa.table(cols_d).select([*cols, "__bucket", "__val",
                                        "__side"])

    def join_bucket(g: pa.Table) -> pa.Table:
        side = np.asarray(g.column("__side"))
        k = np.asarray(g.column(key), dtype=np.int64)
        lv = k[side == 1]
        lval = np.asarray(g.column("__val"))[side == 1]
        order = np.argsort(lv)
        lv, lval = lv[order], lval[order]
        emask = side == 0
        ek = k[emask]
        pos = np.searchsorted(lv, ek)
        got = lval[pos]  # caller guarantees full coverage
        out_t = g.filter(pa.array(emask)).select(cols)
        return out_t.append_column(out, pa.array(got.astype(np.int64)))

    return (es.map_batches(tag_e, batch_format="pyarrow")
            .union(lookup.map_batches(tag_l, batch_format="pyarrow"))
            .groupby("__bucket")
            .map_groups(join_bucket, batch_format="pyarrow"))


def frequent_itemsets(ds, group_col: str, item_col: str,
                      min_support: int = 2, num_buckets: int = 64,
                      mode: str = "auto",
                      broadcast_budget_bytes: int = 1 << 30):
    """Frequent item-PAIR mining over a (group, item) basket table —
    the A-priori 2-itemset step with association-rule components, all
    int64-exact so the whole operator is SQL-oracle-checkable:

    output one row per unordered item pair {a < b} co-occurring in
    ``c_ab >= min_support`` distinct groups, with the marginals needed
    for confidence/lift: ``(a, b, c_ab, c_a, c_b, n_groups)`` where
    ``c_i`` counts distinct groups containing item i.  Float
    ``lift = c_ab * n_groups / (c_a * c_b)`` derives downstream.

    Plan: :func:`cooccurrence_edges` (g-bucket exchange, in-bucket
    (g, item) dedupe + vectorized pair gen) → pair-bucketed exact count
    (``bucketed_sum``) → support filter (shrinks the pair table BEFORE
    marginals attach) → item supports from a second g-bucketed pass
    (in-bucket distinct-(g, i) is exact: g partitions by bucket) →
    marginals attached by ``ray.put`` broadcast under
    ``broadcast_budget_bytes`` (16 B/item), else two
    :func:`_attach_value` co-partitions.  ``n_groups`` is an exact
    distinct count of g (per-batch unique partials → one tiny bucketed
    dedupe)."""
    import ray

    from bqf_ray.functions.hashing import fmix64
    from bqf_ray.stages.partition import bucketed_agg, bucketed_sum

    B = int(num_buckets)

    pairs = cooccurrence_edges(ds, group_col, item_col, num_buckets=B)

    def one(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "one", pa.array(np.ones(len(batch), dtype=np.int64)))

    c_ab = bucketed_sum(pairs.map_batches(one, batch_format="pyarrow"),
                        ["a", "b"], {"one": "c_ab"}, num_buckets=B)

    ms = int(min_support)

    def keep(batch: pa.Table) -> pa.Table:
        m = np.asarray(batch.column("c_ab"), dtype=np.int64) >= ms
        return batch.filter(pa.array(m))

    frequent = c_ab.map_batches(keep, batch_format="pyarrow")

    # --- item supports: distinct groups per item ---------------------
    def tag_g(batch: pa.Table) -> pa.Table:
        g = np.asarray(batch.column(group_col), dtype=np.int64)
        return pa.table({
            "g": pa.array(g),
            "i": pa.array(np.asarray(batch.column(item_col),
                                     dtype=np.int64)),
            "__bucket": pa.array((fmix64(g.view(np.uint64))
                                  % np.uint64(B)).astype(np.int64))})

    def support_bucket(grp: pa.Table) -> pa.Table:
        g = np.asarray(grp.column("g"), dtype=np.int64)
        i = np.asarray(grp.column("i"), dtype=np.int64)
        if not len(g):
            return pa.table({"v": pa.array([], pa.int64()),
                             "val": pa.array([], pa.int64())})
        pair = np.stack([g, i], axis=1)
        uniq = np.unique(pair, axis=0)
        iv, cnt = np.unique(uniq[:, 1], return_counts=True)
        return pa.table({"v": pa.array(iv),
                         "val": pa.array(cnt.astype(np.int64))})

    # per-g-bucket partials are per-item PARTIAL counts (an item spans
    # many g-buckets) — combine with one tiny item-keyed bucketed sum
    support = bucketed_sum(
        (ds.map_batches(tag_g, batch_format="pyarrow")
         .groupby("__bucket")
         .map_groups(support_bucket, batch_format="pyarrow")),
        ["v"], {"val": "val"}, num_buckets=B).materialize()

    # --- n_groups: exact distinct count of g -------------------------
    def g_partial(batch: pa.Table) -> pa.Table:
        g = np.unique(np.asarray(batch.column(group_col), dtype=np.int64))
        return pa.table({"g": pa.array(g)})

    n_groups = int(bucketed_agg(
        ds.map_batches(g_partial, batch_format="pyarrow"),
        ["g"], [("g", "count", "c")], num_buckets=B).count())

    if mode == "auto":
        n_sup = support.count()
        mode = ("broadcast"
                if 16 * n_sup <= int(broadcast_budget_bytes)
                else "bucketed")
        plan_log("frequent_itemsets", mode, support_bytes=16 * n_sup,
                 budget_bytes=int(broadcast_budget_bytes))

    if mode == "broadcast":
        blocks = [t for t in ray.get(support.to_arrow_refs())
                  if t.num_rows]
        sv = (np.concatenate([np.asarray(t.column("v"), dtype=np.int64)
                              for t in blocks])
              if blocks else np.empty(0, dtype=np.int64))
        sc = (np.concatenate([np.asarray(t.column("val"), dtype=np.int64)
                              for t in blocks])
              if blocks else np.empty(0, dtype=np.int64))
        order = np.argsort(sv)
        ref = ray.put((sv[order], sc[order]))

        def attach(batch: pa.Table) -> pa.Table:
            vs, cs = ray.get(ref)  # zero-copy plasma reads
            a = np.asarray(batch.column("a"), dtype=np.int64)
            b = np.asarray(batch.column("b"), dtype=np.int64)
            ca = cs[np.searchsorted(vs, a)]
            cb = cs[np.searchsorted(vs, b)]
            t = batch.append_column("c_a", pa.array(ca))
            t = t.append_column("c_b", pa.array(cb))
            return t.append_column("n_groups", pa.array(
                np.full(len(batch), n_groups, dtype=np.int64)))

        return frequent.map_batches(attach, batch_format="pyarrow")

    with_a = _attach_value(frequent, support, "a", "c_a", num_buckets=B)
    with_b = _attach_value(with_a, support, "b", "c_b", num_buckets=B)

    def add_ng(batch: pa.Table) -> pa.Table:
        return batch.append_column("n_groups", pa.array(
            np.full(len(batch), n_groups, dtype=np.int64)))

    return with_b.map_batches(add_ng, batch_format="pyarrow")


def association_rules(ds, group_col: str, item_col: str,
                      min_support: int = 2, min_conf: float = 0.0,
                      num_buckets: int = 64):
    """Directed association rules from the A-priori pair table: each
    frequent unordered pair {a, b} yields both rules a⇒b and b⇒a with

        confidence = c_ab / c_ante          (one IEEE division of exact ints)
        lift       = (c_ab·n_groups) / (c_ante·c_cons)

    computed from :func:`frequent_itemsets`'s exact int64 supports, so
    both floats are single-expression IEEE over exact integers —
    bit-identical to a SQL recompute (no order-dependent float sums).
    The rule expansion and filtering run as a zero-shuffle
    ``map_batches`` over the (already small) frequent-pair table.

    Output ``(antecedent, consequent, c_ab, c_ante, c_cons, n_groups,
    confidence, lift)`` with ``confidence >= min_conf``."""
    pairs = frequent_itemsets(ds, group_col, item_col,
                              min_support=min_support,
                              num_buckets=num_buckets)
    mc = float(min_conf)

    def expand(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"), dtype=np.int64)
        b = np.asarray(batch.column("b"), dtype=np.int64)
        c_ab = np.asarray(batch.column("c_ab"), dtype=np.int64)
        c_a = np.asarray(batch.column("c_a"), dtype=np.int64)
        c_b = np.asarray(batch.column("c_b"), dtype=np.int64)
        n = np.asarray(batch.column("n_groups"), dtype=np.int64)
        ante = np.concatenate([a, b])
        cons = np.concatenate([b, a])
        cab2 = np.concatenate([c_ab, c_ab])
        c_ante = np.concatenate([c_a, c_b])
        c_cons = np.concatenate([c_b, c_a])
        n2 = np.concatenate([n, n])
        conf = cab2.astype(np.float64) / c_ante
        lift = (cab2 * n2).astype(np.float64) / (c_ante * c_cons)
        keep = conf >= mc
        return pa.table({
            "antecedent": pa.array(ante[keep]),
            "consequent": pa.array(cons[keep]),
            "c_ab": pa.array(cab2[keep]),
            "c_ante": pa.array(c_ante[keep]),
            "c_cons": pa.array(c_cons[keep]),
            "n_groups": pa.array(n2[keep]),
            "confidence": pa.array(conf[keep]),
            "lift": pa.array(lift[keep])})

    return pairs.map_batches(expand, batch_format="pyarrow")


def bfs_hops(edges_ds, seeds: np.ndarray, max_hops: int = 8,
             a_col: str = "a", b_col: str = "b",
             pre_canonical: bool = False, mode: str = "auto",
             node_budget: int = 20_000_000, num_shards: int = 16):
    """Multi-source BFS hop distances over an UNDIRECTED edge Dataset:
    ``(node, hop)`` for every vertex reachable from ``seeds`` within
    ``max_hops`` (min-hop semantics, the recursive-CTE shortest
    unweighted path).  The traversal primitive behind influence
    radius, contamination blast-radius, and graph-sampled curation.

    Plan (broadcast-frontier, the :func:`pagerank` envelope): edges
    are canonicalized + MATERIALIZED once, then each round streams one
    ``map_batches`` pass over them with the current frontier broadcast
    as a sorted array (``ray.put``, zero-copy in plasma); per-batch
    candidates dedupe locally before the driver folds them against the
    visited array (vertex-table-sized).  Rounds = eccentricity ≤
    ``max_hops``; each is one linear edge scan, no shuffle after the
    canonicalization.  Past ``node_budget`` visited nodes the ``auto``
    plan hands off to the sharded SSSP machinery with unit weights
    (``mode="sharded"`` starts there) — identical (node, hop) table,
    driver state O(num_shards)."""
    import ray

    if mode not in ("auto", "broadcast", "sharded"):
        raise ValueError(f"bfs_hops: unknown mode {mode!r}")
    edges = (edges_ds if pre_canonical
             else canonical_edges(edges_ds, a_col=a_col, b_col=b_col))
    ca, cb = (a_col, b_col) if pre_canonical else ("a", "b")
    visited = np.unique(np.asarray(seeds, dtype=np.int64))
    if mode == "sharded":
        # hop distance ≡ SSSP with unit weights: reuse the sharded
        # dist-vector machinery (min-fold ⇒ identical tables)
        def unit_w(batch: pa.Table) -> pa.Table:
            a = np.asarray(batch.column(ca), dtype=np.int64)
            b = np.asarray(batch.column(cb), dtype=np.int64)
            return pa.table({
                "x": pa.array(np.concatenate([a, b])),
                "y": pa.array(np.concatenate([b, a])),
                "w": pa.array(np.ones(2 * len(a), dtype=np.int64))})

        if not len(visited):
            return pa.table({"node": pa.array([], pa.int64()),
                             "hop": pa.array([], pa.int64())})
        t = _sssp_sharded(
            edges.map_batches(unit_w, batch_format="pyarrow"),
            visited, np.zeros(len(visited), dtype=np.int64),
            int(max_hops), num_shards)
        return t.rename_columns(["node", "hop"])
    out_nodes = [visited]
    out_hops = [np.zeros(len(visited), dtype=np.int64)]
    frontier = visited
    for h in range(1, int(max_hops) + 1):
        if mode == "auto" and len(visited) > int(node_budget):
            plan_log("bfs_hops", "sharded", n_visited=len(visited),
                     node_budget=int(node_budget))
            t = _sssp_sharded(
                edges.map_batches(lambda batch: pa.table({
                    "x": pa.array(np.concatenate(
                        [np.asarray(batch.column(ca), dtype=np.int64),
                         np.asarray(batch.column(cb), dtype=np.int64)])),
                    "y": pa.array(np.concatenate(
                        [np.asarray(batch.column(cb), dtype=np.int64),
                         np.asarray(batch.column(ca), dtype=np.int64)])),
                    "w": pa.array(np.ones(2 * batch.num_rows,
                                          dtype=np.int64))}),
                    batch_format="pyarrow"),
                np.concatenate(out_nodes),
                np.concatenate(out_hops).astype(np.int64),
                int(max_hops) - h + 1, num_shards)
            return t.rename_columns(["node", "hop"])
        if not len(frontier):
            break
        ref = ray.put(np.sort(frontier))

        def reach(batch: pa.Table) -> pa.Table:
            fr = ray.get(ref)
            a = np.asarray(batch.column(ca), dtype=np.int64)
            b = np.asarray(batch.column(cb), dtype=np.int64)
            ia = np.searchsorted(fr, a)
            ib = np.searchsorted(fr, b)
            hit_a = (ia < len(fr)) & (fr[np.minimum(ia, len(fr) - 1)] == a)
            hit_b = (ib < len(fr)) & (fr[np.minimum(ib, len(fr) - 1)] == b)
            cand = np.unique(np.concatenate([b[hit_a], a[hit_b]]))
            return pa.table({"node": pa.array(cand)})

        got = edges.map_batches(reach, batch_format="pyarrow").to_pandas()
        cand = np.unique(got["node"].to_numpy().astype(np.int64)) \
            if len(got) else np.empty(0, dtype=np.int64)
        new = cand[np.isin(cand, visited, invert=True,
                           assume_unique=True)]
        if not len(new):
            break
        out_nodes.append(new)
        out_hops.append(np.full(len(new), h, dtype=np.int64))
        visited = np.union1d(visited, new)
        frontier = new
    return pa.table({"node": pa.array(np.concatenate(out_nodes)),
                     "hop": pa.array(np.concatenate(out_hops))})


def _segment_pairs_keyed(sort_key: np.ndarray, values: np.ndarray):
    """:func:`_segment_pairs` plus the segment key per pair (the wedge
    CENTER for adjacency segments)."""
    order = np.lexsort((values, sort_key))
    k, v = sort_key[order], values[order]
    starts = np.concatenate([[True], k[1:] != k[:-1]]) \
        if len(k) else np.empty(0, dtype=bool)
    seg_off = np.flatnonzero(starts)
    seg_cnt = np.diff(np.append(seg_off, len(k)))
    xs, ys, ks = [], [], []
    for d in np.unique(seg_cnt):
        if d < 2:
            continue
        offs = seg_off[seg_cnt == d]
        mat = v[(offs[:, None] + np.arange(d)[None, :])]
        iu, ju = np.triu_indices(int(d), 1)
        xs.append(mat[:, iu].ravel())
        ys.append(mat[:, ju].ravel())
        ks.append(np.repeat(k[offs], len(iu)))
    if not xs:
        e = np.empty(0, dtype=values.dtype)
        return e, e.copy(), e.copy()
    return (np.concatenate(xs), np.concatenate(ys),
            np.concatenate(ks))


def edge_triangle_support(edges_ds, a_col: str = "a", b_col: str = "b",
                          num_buckets: int = 64,
                          broadcast_budget_bytes: int = 1 << 30,
                          pre_canonical: bool = False,
                          mode: str = "auto"):
    """Per-EDGE triangle support (how many triangles contain each
    edge) over an undirected edge stream — the cohesion signal k-truss
    peeling, spam-cluster detection, and strong-tie filtering start
    from.  Output: one row per canonical edge ``(a, b, support)``,
    support 0 included.

    Two plans, both exact and bit-identical:

    - ``"broadcast"``: the :func:`triangle_count` broadcast layout
      (degrees + orientation + sorted membership computed once on the
      driver and ``ray.put``) with the closure step emitting PER-EDGE
      partials instead of a scalar: each closed wedge (x, c, y)
      credits edges (c,x), (c,y), (x,y); per-bucket partials pre-sum
      locally, then ONE edge-table-sized ``bucketed_sum`` folds them
      and a final union restores support-0 edges.  Requires the
      canonical edge list to fit ``broadcast_budget_bytes``
      (16 B/edge — 1 GiB ≈ 67M edges).
    - ``"bucketed"``: the fully-distributed tier — no driver collect,
      no broadcast: degrees attach via :func:`attach_degrees`'s
      bucketed co-partition, wedges generate inside source-hash
      buckets CARRYING THEIR CENTER (24 B/wedge vs triangle_count's
      pre-aggregated 16 — the center is what per-edge credit needs),
      close against the edge set in one pair-hash bucketed exchange
      that emits locally pre-summed per-edge credits, and ONE
      ``bucketed_sum`` folds credits + support-0 zeros.  No stage
      holds more than one bucket; scale ``num_buckets`` with the
      graph so a bucket's wedge slice fits a worker.

    ``mode="auto"`` picks broadcast under the budget (fewer
    exchanges), bucketed past it — the former hard ceiling is gone."""
    B = int(num_buckets)
    # materialize the canonical edge list ONCE: count(), the broadcast
    # collection / degree attach, and the support-0 union below would
    # otherwise each re-execute the upstream edge construction (a
    # shuffle)
    edges = (edges_ds if pre_canonical
             else canonical_edges(edges_ds, a_col=a_col,
                                  b_col=b_col)).materialize()
    n_edges = edges.count()
    if mode == "auto":
        mode = ("broadcast"
                if 16 * n_edges <= int(broadcast_budget_bytes)
                else "bucketed")
        plan_log("edge_triangle_support", mode,
                 edge_bytes=16 * n_edges,
                 budget_bytes=int(broadcast_budget_bytes))
    if mode == "bucketed":
        return _edge_support_bucketed(edges, n_edges, B)
    if mode != "broadcast":
        raise ValueError(f"edge_triangle_support: unknown mode {mode!r}")
    return _edge_support_broadcast(edges, n_edges, B)


def _edge_support_bucketed(edges, n_edges: int, B: int):
    """Distributed per-edge support: the :func:`triangle_count`
    bucketed wedge exchange extended to carry wedge CENTERS so closure
    can credit all three member edges.  ``edges`` is canonical and
    materialized; every exchange key is a single int hash bucket."""
    import ray.data

    from bqf_ray.functions.hashing import fmix64
    from bqf_ray.stages.partition import bucketed_sum

    if n_edges == 0:
        z = pa.array([], pa.int64())
        return ray.data.from_arrow(
            pa.table({"a": z, "b": z, "support": z}))
    attached = attach_degrees(edges, num_buckets=B, mode="bucketed")

    def orient(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"), dtype=np.int64)
        b = np.asarray(batch.column("b"), dtype=np.int64)
        da = np.asarray(batch.column("deg_a"), dtype=np.int64)
        db = np.asarray(batch.column("deg_b"), dtype=np.int64)
        a_first = (da < db) | ((da == db) & (a < b))
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        return pa.table({"u": pa.array(u), "v": pa.array(v),
                         "__bucket": pa.array(
                             (fmix64(u.view(np.uint64)) % np.uint64(B))
                             .astype(np.int64))})

    def wedges_bucket(g: pa.Table) -> pa.Table:
        u = np.asarray(g.column("u"), dtype=np.int64)
        v = np.asarray(g.column("v"), dtype=np.int64)
        x, y, c = _segment_pairs_keyed(u, v)
        wa, wb = np.minimum(x, y), np.maximum(x, y)
        return pa.table({"a": pa.array(wa), "b": pa.array(wb),
                         "c": pa.array(c),
                         "__bucket": pa.array(
                             (_pair_hash64(wa, wb) % np.uint64(B))
                             .astype(np.int64)),
                         "__side": pa.array(
                             np.zeros(len(wa), dtype=np.int8))})

    def tag_edge(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"), dtype=np.int64)
        b = np.asarray(batch.column("b"), dtype=np.int64)
        return pa.table({"a": batch.column("a"), "b": batch.column("b"),
                         "c": pa.array(np.zeros(len(a), dtype=np.int64)),
                         "__bucket": pa.array(
                             (_pair_hash64(a, b) % np.uint64(B))
                             .astype(np.int64)),
                         "__side": pa.array(
                             np.ones(len(a), dtype=np.int8))})

    def close_bucket(g: pa.Table) -> pa.Table:
        side = np.asarray(g.column("__side"))
        a = np.asarray(g.column("a"), dtype=np.int64)
        b = np.asarray(g.column("b"), dtype=np.int64)
        c = np.asarray(g.column("c"), dtype=np.int64)
        ps = _packed_pair_set(a[side == 1], b[side == 1])
        wm = side == 0
        wa, wb, wc = a[wm], b[wm], c[wm]
        hit = _packed_pair_probe(ps, wa, wb)
        if not hit.any():
            z = pa.array([], pa.int64())
            return pa.table({"a": z, "b": z, "s": z})
        cx, cy, cc = wa[hit], wb[hit], wc[hit]
        ea = np.concatenate([np.minimum(cc, cx), np.minimum(cc, cy),
                             np.minimum(cx, cy)])
        eb = np.concatenate([np.maximum(cc, cx), np.maximum(cc, cy),
                             np.maximum(cx, cy)])
        # local pre-sum before the credit exchange
        pairs = np.stack([ea, eb], axis=1)
        upair, cnt = np.unique(pairs, axis=0, return_counts=True)
        return pa.table({"a": pa.array(upair[:, 0]),
                         "b": pa.array(upair[:, 1]),
                         "s": pa.array(cnt.astype(np.int64))})

    wedges = (attached.map_batches(orient, batch_format="pyarrow")
              .groupby("__bucket")
              .map_groups(wedges_bucket, batch_format="pyarrow"))
    partials = (wedges
                .union(edges.map_batches(tag_edge,
                                         batch_format="pyarrow"))
                .groupby("__bucket")
                .map_groups(close_bucket, batch_format="pyarrow"))
    zeros = edges.map_batches(
        lambda t: pa.table({"a": t.column("a"), "b": t.column("b"),
                            "s": pa.array(np.zeros(t.num_rows,
                                                   dtype=np.int64))}),
        batch_format="pyarrow")
    return bucketed_sum(partials.union(zeros), ["a", "b"],
                        {"s": "support"}, num_buckets=B)


def _edge_support_broadcast(edges, n_edges: int, B: int):
    """Driver-collected broadcast plan (see
    :func:`edge_triangle_support`); ``edges`` canonical+materialized,
    list bounded by the caller's broadcast budget."""
    import ray
    import ray.data

    from bqf_ray.functions.hashing import fmix64
    from bqf_ray.stages.partition import bucketed_sum

    blocks = [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows]
    a = (np.concatenate([np.asarray(t.column("a"), dtype=np.int64)
                         for t in blocks])
         if blocks else np.empty(0, dtype=np.int64))
    b = (np.concatenate([np.asarray(t.column("b"), dtype=np.int64)
                         for t in blocks])
         if blocks else np.empty(0, dtype=np.int64))
    vu, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    deg = np.bincount(inv).astype(np.int64)
    da, db = deg[inv[:len(a)]], deg[inv[len(a):]]
    a_first = (da < db) | ((da == db) & (a < b))
    u = np.where(a_first, a, b)
    v = np.where(a_first, b, a)
    ubkt = (fmix64(u.view(np.uint64)) % np.uint64(B)).astype(np.int64)
    ps = _packed_pair_set(a, b)
    ref = ray.put((u, v, ubkt, ps))

    def bucket_task(batch: pa.Table) -> pa.Table:
        bu, bv, bbkt, bps = ray.get(ref)  # zero-copy plasma reads
        ea, eb = [], []
        for i in np.asarray(batch.column("id"), dtype=np.int64):
            m = bbkt == i
            x, y, c = _segment_pairs_keyed(bu[m], bv[m])
            if not len(x):
                continue
            wa, wb = np.minimum(x, y), np.maximum(x, y)
            hit = _packed_pair_probe(bps, wa, wb)
            if not hit.any():
                continue
            cx, cy, cc = x[hit], y[hit], c[hit]
            # credit all three edges of each closed wedge, canonical
            ea.append(np.concatenate([
                np.minimum(cc, cx), np.minimum(cc, cy),
                np.minimum(cx, cy)]))
            eb.append(np.concatenate([
                np.maximum(cc, cx), np.maximum(cc, cy),
                np.maximum(cx, cy)]))
        if not ea:
            z = pa.array([], pa.int64())
            return pa.table({"a": z, "b": z, "s": z})
        eaa, ebb = np.concatenate(ea), np.concatenate(eb)
        # local pre-sum before the exchange
        pairs = np.stack([eaa, ebb], axis=1)
        upair, cnt = np.unique(pairs, axis=0, return_counts=True)
        return pa.table({"a": pa.array(upair[:, 0]),
                         "b": pa.array(upair[:, 1]),
                         "s": pa.array(cnt.astype(np.int64))})

    partials = (ray.data.range(B, override_num_blocks=B)
                .map_batches(bucket_task, batch_format="pyarrow"))
    zeros = edges.map_batches(
        lambda t: pa.table({"a": t.column("a"), "b": t.column("b"),
                            "s": pa.array(np.zeros(t.num_rows,
                                                   dtype=np.int64))}),
        batch_format="pyarrow")
    return bucketed_sum(partials.union(zeros), ["a", "b"],
                        {"s": "support"}, num_buckets=B)


def clustering_components(edges_ds, a_col: str = "a", b_col: str = "b",
                          num_buckets: int = 64,
                          broadcast_budget_bytes: int = 1 << 30,
                          mode: str = "auto"):
    """Per-NODE local-clustering-coefficient components: ``(node, deg,
    n_tri, n_wedges)`` with ``coefficient = n_tri / n_wedges``
    deriving downstream in float — the node-level cohesion profile
    (spam rings cluster high, crawl hubs low).  Composes
    :func:`edge_triangle_support` (each triangle contributes 2 to the
    sum of supports over a member node's incident edges, so ``n_tri =
    Σ support / 2`` exactly) with one endpoint-exploded
    map-side-combined fold.  Integer-exact throughout."""
    from bqf_ray.stages.partition import bucketed_agg

    sup = edge_triangle_support(
        edges_ds, a_col=a_col, b_col=b_col, num_buckets=num_buckets,
        broadcast_budget_bytes=broadcast_budget_bytes, mode=mode)

    def explode(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"), dtype=np.int64)
        b = np.asarray(batch.column("b"), dtype=np.int64)
        s = np.asarray(batch.column("support"), dtype=np.int64)
        return pa.table({
            "node": pa.array(np.concatenate([a, b])),
            "s": pa.array(np.concatenate([s, s])),
            "one": pa.array(np.ones(2 * len(a), dtype=np.int64))})

    fold = bucketed_agg(sup.map_batches(explode, batch_format="pyarrow"),
                        ["node"],
                        [("one", "sum", "deg"), ("s", "sum", "s2")],
                        num_buckets=num_buckets, combine_local=True)

    def finish(batch: pa.Table) -> pa.Table:
        deg = np.asarray(batch.column("deg"), dtype=np.int64)
        s2 = np.asarray(batch.column("s2"), dtype=np.int64)
        return pa.table({"node": batch.column("node"),
                         "deg": pa.array(deg),
                         "n_tri": pa.array(s2 // 2),
                         "n_wedges": pa.array(deg * (deg - 1) // 2)})

    return fold.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# behavior-path n-grams (length-n event sequences per key)
# ---------------------------------------------------------------------------

def path_ngram_counts(ds, n: int = 3, key_col: str = "user_id",
                      ts_col: str = "ts", id_col: str = "event_id",
                      label_col: str = "event_type",
                      out_cols: list[str] | None = None,
                      num_buckets: int = 32):
    """Length-``n`` behavior paths: counts of every n-long run of
    CONSECUTIVE events per key in ``(ts, id)`` order — the n-gram
    generalization of :func:`transition_counts` (n=2); n=3 is the
    path-trigram table behind "what do users do between A and C".

    Plan is identical to :func:`transition_counts`: key-bucketed
    shuffle (runs never split across buckets), ONE lexsort per bucket,
    window validity = first and last row of the window share the key
    (rows between are equal too — the sort is key-major), per-bucket
    pre-aggregation, then a label-tuple-sized final exchange.
    """
    import pyarrow.compute as pc

    from bqf_ray.stages.partition import bucketed_agg

    N = int(n)
    assert N >= 2, "path n-grams need n >= 2"
    NB = int(num_buckets)
    cols = out_cols or [f"step_{j}" for j in range(N)]
    assert len(cols) == N

    def bucket(batch: pa.Table) -> pa.Table:
        uid = np.asarray(batch.column(key_col), dtype=np.int64)
        ts = np.asarray(batch.column(ts_col)).astype("datetime64[us]"
                                                     ).astype(np.int64)
        return pa.table({
            "u": pa.array(uid), "t": pa.array(ts),
            "i": pc.cast(batch.column(id_col), pa.int64()),
            "l": batch.column(label_col),
            "__bucket": pa.array((uid % NB).astype(np.int64))})

    def windows_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table({**{c: pa.array([], pa.string()) for c in cols},
                          "partial": pa.array([], pa.int64())})
        u = np.asarray(group.column("u"), dtype=np.int64)
        if len(u) < N:
            return empty
        t = np.asarray(group.column("t"), dtype=np.int64)
        i = np.asarray(group.column("i"), dtype=np.int64)
        lab = group.column("l")
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        order = np.lexsort((i, t, u))
        us = u[order]
        starts = np.flatnonzero(us[:len(us) - N + 1] == us[N - 1:])
        if not len(starts):
            return empty
        tt = pa.table({
            **{cols[j]: lab.take(pa.array(order[starts + j]))
               for j in range(N)},
            "n": pa.array(np.ones(len(starts), dtype=np.int64))})
        return (tt.group_by(cols).aggregate([("n", "sum")])
                .rename_columns(cols + ["partial"]))

    return bucketed_agg(
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(windows_bucket, batch_format="pyarrow"),
        cols, [("partial", "sum", "n")])


# ---------------------------------------------------------------------------
# k-core decomposition (fixed-round synchronous peel)
# ---------------------------------------------------------------------------

class _KcoreShard:
    """Range-partitioned shard of the k-core alive/degree state.

    Each round the driver sequences: ``stage`` (summed neighbor-alive
    indicators for this shard's nodes, from the reduce groups) →
    ``commit(K)`` (restricted degree = staged where still alive; peel;
    report changed) — both behind ``ray.get`` barriers, so reads only
    see fully committed rounds."""

    def __init__(self):
        self.nodes = np.empty(0, dtype=np.int64)
        self.alive = np.empty(0, dtype=bool)
        self.deg = np.empty(0, dtype=np.int64)
        self._pend = None

    def init_shard(self, nodes):
        self.nodes = np.sort(np.unique(nodes.astype(np.int64)))
        self.alive = np.ones(len(self.nodes), dtype=bool)
        self.deg = np.zeros(len(self.nodes), dtype=np.int64)

    def get_state(self):
        return self.nodes, self.alive

    def stage(self, nodes, sums):
        self._pend = (nodes, sums)

    def commit(self, K, peel=True):
        deg = np.zeros(len(self.nodes), dtype=np.int64)
        if self._pend is not None and len(self._pend[0]):
            idx = np.searchsorted(self.nodes, self._pend[0])
            deg[idx] = self._pend[1]
        self._pend = None
        deg[~self.alive] = 0          # restricted to both-alive edges
        self.deg = deg
        if not peel:
            return False, int(self.alive.sum())
        nxt = self.alive & (deg >= K)
        changed = bool((nxt != self.alive).any())
        self.alive = nxt
        return changed, int(nxt.sum())

    def state_table(self, min_deg):
        keep = self.alive & (self.deg >= min_deg)
        return pa.table({"node": pa.array(self.nodes[keep]),
                         "core_deg": pa.array(self.deg[keep])})


def _kcore_sharded(edges, K, rounds, ca, cb, num_shards):
    """Sharded k-core peel: alive/degree vectors in range-partitioned
    shard actors; doubled edges co-bucketed by source range once; each
    round one edge scan (emit 1 per alive source) + one summed
    exchange + O(P) RPCs.  Mirrors the broadcast plan's round
    semantics exactly (restricted degree, synchronous peel, early
    convergence, final extra degree pass)."""
    import ray

    P = max(1, int(num_shards))

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column(ca), dtype=np.int64)
        b = np.asarray(batch.column(cb), dtype=np.int64)
        return pa.table({"x": pa.array(np.concatenate([a, b])),
                         "y": pa.array(np.concatenate([b, a]))})

    run_id, route, edges_b = _shard_scaffold(
        edges.map_batches(both_dirs, batch_format="pyarrow"),
        "x", P, "__xp")
    actors = _make_shards(_KcoreShard, P)

    def init_groups(group: pa.Table) -> pa.Table:
        p = int(group.column("__xp")[0].as_py())
        ray.get(actors[p].init_shard.remote(
            np.asarray(group.column("x"), dtype=np.int64)))
        return pa.table({"p": pa.array([p], pa.int64())})

    (edges_b.select_columns(["x", "__xp"])
     .groupby("__xp").map_groups(init_groups, batch_format="pyarrow")
     .materialize())

    def one_pass(token, peel):
        def contrib(batch: pa.Table) -> pa.Table:
            xp = np.asarray(batch.column("__xp"), dtype=np.int64)
            x = np.asarray(batch.column("x"), dtype=np.int64)
            y = np.asarray(batch.column("y"), dtype=np.int64)
            outs_n, outs_c = [], []
            for p in np.unique(xp):
                m = xp == p
                nn, al = _pr_cached_state(actors, token, int(p))
                ok = al[np.searchsorted(nn, x[m])]
                tu, cnt = np.unique(y[m][ok], return_counts=True)
                outs_n.append(tu)
                outs_c.append(cnt.astype(np.int64))
            node = (np.concatenate(outs_n) if outs_n
                    else np.empty(0, dtype=np.int64))
            c = (np.concatenate(outs_c) if outs_c
                 else np.empty(0, dtype=np.int64))
            return pa.table({"node": pa.array(node),
                             "c": pa.array(c),
                             "__yp": pa.array(route(node))})

        def fold(group: pa.Table) -> pa.Table:
            p = int(group.column("__yp")[0].as_py())
            gn = np.asarray(group.column("node"), dtype=np.int64)
            gc = np.asarray(group.column("c"), dtype=np.int64)
            tu, inv = np.unique(gn, return_inverse=True)
            sums = np.zeros(len(tu), dtype=np.int64)
            np.add.at(sums, inv, gc)
            ray.get(actors[p].stage.remote(tu, sums))
            return pa.table({"p": pa.array([p], pa.int64())})

        (edges_b.map_batches(contrib, batch_format="pyarrow")
         .groupby("__yp")
         .map_groups(fold, batch_format="pyarrow")
         .materialize())
        res = ray.get([a.commit.remote(K, peel) for a in actors])
        return (any(ch for ch, _ in res),
                sum(na for _, na in res))

    for it in range(int(rounds)):
        changed, n_alive = one_pass(f"kc-{run_id}-{it}", True)
        if not n_alive:
            return pa.table({"node": pa.array([], pa.int64()),
                             "core_deg": pa.array([], pa.int64())})
        if not changed:
            # converged: deg was computed within alive == next alive,
            # so it already IS the in-core degree — emit survivors
            return pa.concat_tables(ray.get(
                [a.state_table.remote(K) for a in actors]))
    # not converged within R rounds: one more restricted degree pass
    one_pass(f"kc-{run_id}-final", False)
    return pa.concat_tables(ray.get(
        [a.state_table.remote(1) for a in actors]))


def kcore(edges_ds, k: int, rounds: int = 6,
          a_col: str = "a", b_col: str = "b", pre_canonical: bool = False,
          mode: str = "auto", node_budget: int = 20_000_000,
          num_shards: int = 16):
    """R-round synchronous k-core peel over an UNDIRECTED edge Dataset:
    each round drops — all at once — every surviving node whose degree
    among survivors is < ``k``; after ``rounds`` rounds, emit
    ``(node, core_deg)`` for the survivors, ``core_deg`` = degree
    within the surviving set.

    Peeling is MONOTONE (the alive set only shrinks, and once it stops
    shrinking every later round is a no-op), so the fixed-round result
    equals the true k-core whenever peeling converges within ``rounds``
    — and fixing R is exactly what makes the operator SQL-replayable:
    the oracle unrolls the same R HAVING rounds as CTEs (the
    ``bpe_merges`` unrolled-CTE pattern).  Convergence is detected and
    rounds stop early with an identical result.

    Plan: canonical edges materialized ONCE (R linear scans), then each
    round = one broadcast-membership edge scan (sorted alive array in
    plasma via ``ray.put``) emitting per-batch endpoint-count partials,
    folded into a vertex-sized degree table on the driver — the same
    documented ~10^8-node driver envelope as :func:`bfs_hops` /
    :func:`pagerank`.  No shuffle after the canonicalization.
    ``mode="sharded"`` (or ``auto`` past ``node_budget`` vertices)
    replays the peel with the alive/degree vectors in range-partitioned
    shard actors (:func:`_kcore_sharded`) — identical output, driver
    state O(num_shards).
    """
    import ray

    K = int(k)
    assert K >= 1, "k-core needs k >= 1"
    if mode not in ("auto", "broadcast", "sharded"):
        raise ValueError(f"kcore: unknown mode {mode!r}")
    edges = (edges_ds if pre_canonical
             else canonical_edges(edges_ds, a_col=a_col, b_col=b_col))
    ca, cb = (a_col, b_col) if pre_canonical else ("a", "b")
    edges = edges.materialize()
    if mode == "sharded":
        return _kcore_sharded(edges, K, rounds, ca, cb, num_shards)

    def degrees(alive_ref):
        """Vertex degree table restricted to alive nodes (None = all)."""
        def part(batch: pa.Table) -> pa.Table:
            a = np.asarray(batch.column(ca), dtype=np.int64)
            b = np.asarray(batch.column(cb), dtype=np.int64)
            if alive_ref is not None:
                al = ray.get(alive_ref)
                ka = np.searchsorted(al, a)
                kb = np.searchsorted(al, b)
                ok = ((ka < len(al)) & (al[np.minimum(ka, len(al) - 1)] == a)
                      & (kb < len(al))
                      & (al[np.minimum(kb, len(al) - 1)] == b))
                a, b = a[ok], b[ok]
            nodes, cnt = np.unique(np.concatenate([a, b]),
                                   return_counts=True)
            return pa.table({"node": pa.array(nodes),
                             "d": pa.array(cnt.astype(np.int64))})

        got = edges.map_batches(part, batch_format="pyarrow").to_pandas()
        if not len(got):
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.int64))
        nd = got["node"].to_numpy().astype(np.int64)
        dd = got["d"].to_numpy().astype(np.int64)
        nodes, inv = np.unique(nd, return_inverse=True)
        deg = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(deg, inv, dd)
        return nodes, deg

    alive_ref = None
    alive = None
    for _ in range(int(rounds)):
        nodes, deg = degrees(alive_ref)
        if mode == "auto" and len(nodes) > int(node_budget):
            plan_log("kcore", "sharded", n_nodes=len(nodes),
                     node_budget=int(node_budget))
            # vertex table outgrew the driver envelope: replay the
            # peel sharded from the start (peeling is deterministic,
            # so the replay is free of divergence; the one wasted
            # degree pass is the price of late detection)
            return _kcore_sharded(edges, K, rounds, ca, cb, num_shards)
        nxt = nodes[deg >= K]                      # already sorted
        if alive is not None and len(nxt) == len(alive) \
                and np.array_equal(nxt, alive):
            # converged: deg was computed within alive == nxt, so it
            # already IS the in-core degree — emit directly.
            keep = deg >= K
            return pa.table({"node": pa.array(nodes[keep]),
                             "core_deg": pa.array(deg[keep])})
        alive = nxt
        if not len(alive):
            return pa.table({"node": pa.array([], pa.int64()),
                             "core_deg": pa.array([], pa.int64())})
        alive_ref = ray.put(alive)
    # not converged within R rounds (or R==1): one more restricted
    # degree pass gives the survivors' in-core degrees.
    nodes, deg = degrees(alive_ref)
    return pa.table({"node": pa.array(nodes),
                     "core_deg": pa.array(deg)})


# ---------------------------------------------------------------------------
# label propagation communities (fixed-round synchronous LPA)
# ---------------------------------------------------------------------------

class _LpaShard:
    """Range-partitioned shard of the LPA label vector: sorted node
    ids + current labels.  ``stage`` receives the per-node argmax
    picks for this shard's range; ``commit`` applies them
    synchronously and reports whether anything moved."""

    def __init__(self):
        self.nodes = np.empty(0, dtype=np.int64)
        self.labels = np.empty(0, dtype=np.int64)
        self._pend = None

    def init_shard(self, nodes):
        self.nodes = np.sort(np.unique(nodes.astype(np.int64)))
        self.labels = self.nodes.copy()

    def get_state(self):
        return self.nodes, self.labels

    def stage(self, v, lab):
        self._pend = (v, lab)

    def commit(self):
        new = self.labels.copy()
        if self._pend is not None and len(self._pend[0]):
            new[np.searchsorted(self.nodes, self._pend[0])] = \
                self._pend[1]
        self._pend = None
        changed = bool((new != self.labels).any())
        self.labels = new
        return changed

    def state_table(self):
        return pa.table({"node": pa.array(self.nodes),
                         "community": pa.array(self.labels)})


def _lpa_sharded(edges, rounds, ca, cb, num_shards):
    """Sharded synchronous LPA: label vector in range-partitioned
    shard actors; doubled edges co-bucketed by source range once; each
    round one edge scan emitting pre-counted ``(neighbor, my_label)``
    partials + ONE exchange keyed by the neighbor's shard, with the
    per-node argmax (max count, ties → smallest label — identical to
    the broadcast plan's ``grouped_top_n`` ordering) computed inside
    the reduce group."""
    import ray

    P = max(1, int(num_shards))

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column(ca), dtype=np.int64)
        b = np.asarray(batch.column(cb), dtype=np.int64)
        return pa.table({"x": pa.array(np.concatenate([a, b])),
                         "y": pa.array(np.concatenate([b, a]))})

    run_id, route, edges_b = _shard_scaffold(
        edges.map_batches(both_dirs, batch_format="pyarrow"),
        "x", P, "__xp")
    actors = _make_shards(_LpaShard, P)

    def init_groups(group: pa.Table) -> pa.Table:
        p = int(group.column("__xp")[0].as_py())
        ray.get(actors[p].init_shard.remote(
            np.asarray(group.column("x"), dtype=np.int64)))
        return pa.table({"p": pa.array([p], pa.int64())})

    got = (edges_b.select_columns(["x", "__xp"])
           .groupby("__xp")
           .map_groups(init_groups, batch_format="pyarrow")
           .to_pandas())
    if not len(got):
        return pa.table({"node": pa.array([], pa.int64()),
                         "community": pa.array([], pa.int64())})

    for it in range(int(rounds)):
        token = f"lpa-{run_id}-{it}"

        def emit(batch: pa.Table) -> pa.Table:
            xp = np.asarray(batch.column("__xp"), dtype=np.int64)
            x = np.asarray(batch.column("x"), dtype=np.int64)
            y = np.asarray(batch.column("y"), dtype=np.int64)
            outs_v, outs_l, outs_c = [], [], []
            for p in np.unique(xp):
                m = xp == p
                nn, lb = _pr_cached_state(actors, token, int(p))
                nl = lb[np.searchsorted(nn, x[m])]
                key = np.stack([y[m], nl], axis=1)
                uk, cnt = np.unique(key, axis=0, return_counts=True)
                outs_v.append(uk[:, 0])
                outs_l.append(uk[:, 1])
                outs_c.append(cnt.astype(np.int64))
            v = (np.concatenate(outs_v) if outs_v
                 else np.empty(0, dtype=np.int64))
            lab = (np.concatenate(outs_l) if outs_l
                   else np.empty(0, dtype=np.int64))
            c = (np.concatenate(outs_c) if outs_c
                 else np.empty(0, dtype=np.int64))
            return pa.table({"v": pa.array(v), "lab": pa.array(lab),
                             "c": pa.array(c),
                             "__vp": pa.array(route(v))})

        def pick(group: pa.Table) -> pa.Table:
            p = int(group.column("__vp")[0].as_py())
            v = np.asarray(group.column("v"), dtype=np.int64)
            lab = np.asarray(group.column("lab"), dtype=np.int64)
            c = np.asarray(group.column("c"), dtype=np.int64)
            # fold partials to exact (v, lab) counts
            key = np.stack([v, lab], axis=1)
            uk, inv = np.unique(key, axis=0, return_inverse=True)
            sums = np.zeros(len(uk), dtype=np.int64)
            np.add.at(sums, inv, c)
            uv, ul = uk[:, 0], uk[:, 1]
            # per-v argmax: max count, ties → smallest label
            order = np.lexsort((ul, -sums, uv))
            uv, ul = uv[order], ul[order]
            first = np.concatenate([[True], uv[1:] != uv[:-1]]) \
                if len(uv) else np.empty(0, dtype=bool)
            ray.get(actors[p].stage.remote(uv[first], ul[first]))
            return pa.table({"p": pa.array([p], pa.int64())})

        (edges_b.map_batches(emit, batch_format="pyarrow")
         .groupby("__vp")
         .map_groups(pick, batch_format="pyarrow")
         .materialize())
        changed = ray.get([a.commit.remote() for a in actors])
        if not any(changed):          # fixpoint: identity rounds
            break
    return pa.concat_tables(
        ray.get([a.state_table.remote() for a in actors]))


def label_propagation(edges_ds, rounds: int = 3,
                      a_col: str = "a", b_col: str = "b",
                      pre_canonical: bool = False, num_buckets: int = 32,
                      mode: str = "auto", node_budget: int = 20_000_000,
                      num_shards: int = 16):
    """Fixed-round SYNCHRONOUS label propagation (Raghavan et al. 2007,
    made deterministic): labels start as node ids; each round EVERY
    node simultaneously adopts the most frequent label among its
    neighbors, ties broken by the smallest label.  Returns
    ``(node, community)`` after exactly ``rounds`` rounds — the fixed
    round count (not convergence, which synchronous LPA does not
    guarantee — bipartite graphs oscillate) is what makes the operator
    bit-deterministic AND SQL-replayable: the oracle unrolls the same
    R rounds as join+QUALIFY CTEs.  If labels reach a fixpoint earlier,
    later rounds are identity and the loop early-stops with the same
    result.

    Plan: canonical edges materialized once.  Per round: the label
    array broadcasts via ``ray.put`` (vertex-sized, the documented
    :func:`pagerank` driver envelope); ONE edge scan emits pre-counted
    ``(node, neighbor_label)`` partials; a ``(node, label)``-bucketed
    exchange sums them; per-node argmax rides
    :func:`bqf_ray.pipelines.aggregates.grouped_top_n` (per-block
    top-1 partials, no whole group materialized).  Two bucketed
    exchanges per round, both bounded by the edge count.
    ``mode="sharded"`` (or ``auto`` past ``node_budget`` vertices)
    holds the label vector in range-partitioned shard actors instead
    (:func:`_lpa_sharded`) — identical labels, driver state O(P).
    """
    import ray

    from bqf_ray.pipelines.aggregates import grouped_top_n
    from bqf_ray.stages.partition import bucketed_agg

    if mode not in ("auto", "broadcast", "sharded"):
        raise ValueError(f"label_propagation: unknown mode {mode!r}")
    edges = (edges_ds if pre_canonical
             else canonical_edges(edges_ds, a_col=a_col, b_col=b_col))
    ca, cb = (a_col, b_col) if pre_canonical else ("a", "b")
    edges = edges.materialize()
    if mode == "sharded":
        return _lpa_sharded(edges, rounds, ca, cb, num_shards)

    # vertex table: per-block unique endpoints folded once (driver
    # envelope, same as bfs_hops' visited array)
    parts = []
    for t in ray.get(edges.to_arrow_refs()):
        if t.num_rows:
            parts.append(np.unique(np.asarray(t.column(ca),
                                              dtype=np.int64)))
            parts.append(np.unique(np.asarray(t.column(cb),
                                              dtype=np.int64)))
    if not parts:
        return pa.table({"node": pa.array([], pa.int64()),
                         "community": pa.array([], pa.int64())})
    nodes = np.unique(np.concatenate(parts))
    if mode == "auto" and len(nodes) > int(node_budget):
        plan_log("label_propagation", "sharded", n_nodes=len(nodes),
                 node_budget=int(node_budget))
        return _lpa_sharded(edges, rounds, ca, cb, num_shards)
    labels = nodes.copy()

    for _ in range(int(rounds)):
        ref = ray.put(labels)
        nodes_ref = ray.put(nodes)

        def emit(batch: pa.Table) -> pa.Table:
            nd = ray.get(nodes_ref)
            lb = ray.get(ref)
            a = np.asarray(batch.column(ca), dtype=np.int64)
            b = np.asarray(batch.column(cb), dtype=np.int64)
            v = np.concatenate([a, b])
            nl = np.concatenate([lb[np.searchsorted(nd, b)],
                                 lb[np.searchsorted(nd, a)]])
            key = np.stack([v, nl], axis=1)
            uk, cnt = np.unique(key, axis=0, return_counts=True)
            return pa.table({"v": pa.array(uk[:, 0]),
                             "lab": pa.array(uk[:, 1]),
                             "c": pa.array(cnt.astype(np.int64))})

        counts = bucketed_agg(
            edges.map_batches(emit, batch_format="pyarrow"),
            ["v", "lab"], [("c", "sum", "c")], num_buckets=num_buckets)
        picked = grouped_top_n(counts, "v", ["c", "lab"], 1,
                               descending=[True, False], rank_col=None,
                               num_buckets=num_buckets).to_pandas()
        new = labels.copy()
        pv = picked["v"].to_numpy().astype(np.int64)
        pl = picked["lab"].to_numpy().astype(np.int64)
        new[np.searchsorted(nodes, pv)] = pl
        if np.array_equal(new, labels):      # fixpoint: identity rounds
            break
        labels = new

    return pa.table({"node": pa.array(nodes),
                     "community": pa.array(labels)})


def transition_probs(ds, key_col: str = "user_id", ts_col: str = "ts",
                     id_col: str = "event_id",
                     label_col: str = "event_type",
                     num_buckets: int = 32):
    """Markov transition probabilities: :func:`transition_counts` plus
    ``n_from`` (total outgoing transitions per source label) and
    ``p = n / n_from``.  The counts table is label-pair-sized, so the
    share computation runs on ONE block (``repartition(1)`` is the
    right plan at label cardinality, the ``new_keys_daily`` argument);
    the single int64/int64 IEEE division is bit-exact vs SQL's
    ``n / SUM(n) OVER (PARTITION BY from_type)``."""
    counts = transition_counts(ds, key_col=key_col, ts_col=ts_col,
                               id_col=id_col, label_col=label_col,
                               num_buckets=num_buckets)

    def finish(batch: pa.Table) -> pa.Table:
        frm = batch.column("from_type")
        if isinstance(frm, pa.ChunkedArray):
            frm = frm.combine_chunks()
        n = np.asarray(batch.column("n"), dtype=np.int64)
        codes = frm.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        tot = np.zeros(codes.max() + 1 if len(codes) else 0,
                       dtype=np.int64)
        np.add.at(tot, codes, n)
        n_from = tot[codes]
        return pa.table({"from_type": frm,
                         "to_type": batch.column("to_type"),
                         "n": pa.array(n),
                         "n_from": pa.array(n_from),
                         "p": pa.array(n / n_from)})

    return counts.repartition(1).map_batches(finish,
                                             batch_format="pyarrow",
                                             batch_size=None)


class _HitsShard:
    """Range-partitioned shard of the HITS hub/auth vectors."""

    def __init__(self):
        self.nodes = np.empty(0, dtype=np.int64)
        self.hub = np.empty(0, dtype=np.int64)
        self.auth = np.empty(0, dtype=np.int64)
        self._pend = None
        self._out = None

    def init_shard(self, nodes):
        self.nodes = np.sort(np.unique(nodes.astype(np.int64)))
        self.hub = np.ones(len(self.nodes), dtype=np.int64)
        self.auth = np.zeros(len(self.nodes), dtype=np.int64)

    def get_vec(self, which):
        return self.nodes, (self.hub if which == "hub" else self.auth)

    def stage(self, nodes, sums):
        self._pend = (nodes, sums)

    def commit_half(self):
        out = np.zeros(len(self.nodes), dtype=np.int64)
        if self._pend is not None and len(self._pend[0]):
            out[np.searchsorted(self.nodes, self._pend[0])] = \
                self._pend[1]
        self._pend = None
        self._out = out
        return int(out.max(initial=0))

    def scale_into(self, q, which):
        v = self._out // np.int64(q)
        self._out = None
        if which == "hub":
            self.hub = v
        else:
            self.auth = v

    def state_table(self):
        return pa.table({"node": pa.array(self.nodes),
                         "hub": pa.array(self.hub),
                         "auth": pa.array(self.auth)})


def _hits_sharded(edges, rounds, scale_bits, num_shards, output):
    """Sharded HITS: hub/auth vectors in range-partitioned shard
    actors; the edge projection is co-bucketed TWICE, once by source
    range and once by destination range (the two half-steps read
    opposite sides), each half-step is one edge scan + one summed
    exchange + a P-sized max fold for the deterministic integer
    rescale — bit-identical to the broadcast plan."""
    import ray

    P = max(1, int(num_shards))
    edges = edges.materialize()      # read by boundaries + two buckets

    def endpoints(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("s"), dtype=np.int64)
        t = np.asarray(batch.column("t"), dtype=np.int64)
        return pa.table({"node": pa.array(np.concatenate([s, t]))})

    route = _shard_route(
        edges.map_batches(endpoints, batch_format="pyarrow"),
        "node", P)
    run_id = _shard_run_id()

    actors = _make_shards(_HitsShard, P)

    edges_bs = _cobucket(edges, route, "s", "__fp")  # auth←hub reads hub(s)
    edges_bt = _cobucket(edges, route, "t", "__fp")  # hub←auth reads auth(t)

    def init_groups(group: pa.Table) -> pa.Table:
        p = int(group.column("__np")[0].as_py())
        ray.get(actors[p].init_shard.remote(
            np.asarray(group.column("node"), dtype=np.int64)))
        return pa.table({"p": pa.array([p], pa.int64())})

    def add_np(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__np", pa.array(route(batch.column("node"))))

    got = (edges.map_batches(endpoints, batch_format="pyarrow")
           .map_batches(add_np, batch_format="pyarrow")
           .groupby("__np")
           .map_groups(init_groups, batch_format="pyarrow")
           .to_pandas())
    if not len(got):
        z = np.empty(0, dtype=np.int64)
        if output == "dataset":
            return ray.data.from_arrow(pa.table({
                "node": pa.array(z), "hub": pa.array(z),
                "auth": pa.array(z)}))
        return z, z.copy(), z.copy()

    def half(ebs, from_col, to_col, which_read, which_write, token):
        def contrib(batch: pa.Table) -> pa.Table:
            fp = np.asarray(batch.column("__fp"), dtype=np.int64)
            f = np.asarray(batch.column(from_col), dtype=np.int64)
            t = np.asarray(batch.column(to_col), dtype=np.int64)
            outs_n, outs_c = [], []
            for p in np.unique(fp):
                m = fp == p
                # token embeds the half-step AND the vector read, so
                # the shared (token, p) cache key is unambiguous
                stale = [k for k in _PR_SHARD_CACHE if k[0] != token]
                for k in stale:
                    del _PR_SHARD_CACHE[k]
                key = (token, int(p))
                if key not in _PR_SHARD_CACHE:
                    _PR_SHARD_CACHE[key] = ray.get(
                        actors[int(p)].get_vec.remote(which_read))
                nn, vv = _PR_SHARD_CACHE[key]
                c = vv[np.searchsorted(nn, f[m])]
                tu, inv = np.unique(t[m], return_inverse=True)
                sums = np.zeros(len(tu), dtype=np.int64)
                np.add.at(sums, inv, c)
                outs_n.append(tu)
                outs_c.append(sums)
            node = (np.concatenate(outs_n) if outs_n
                    else np.empty(0, dtype=np.int64))
            c = (np.concatenate(outs_c) if outs_c
                 else np.empty(0, dtype=np.int64))
            return pa.table({"node": pa.array(node),
                             "partial": pa.array(c),
                             "__tp": pa.array(route(node))})

        def fold(group: pa.Table) -> pa.Table:
            p = int(group.column("__tp")[0].as_py())
            gn = np.asarray(group.column("node"), dtype=np.int64)
            gs = np.asarray(group.column("partial"), dtype=np.int64)
            tu, inv = np.unique(gn, return_inverse=True)
            sums = np.zeros(len(tu), dtype=np.int64)
            np.add.at(sums, inv, gs)
            ray.get(actors[p].stage.remote(tu, sums))
            return pa.table({"p": pa.array([p], pa.int64())})

        (ebs.map_batches(contrib, batch_format="pyarrow")
         .groupby("__tp")
         .map_groups(fold, batch_format="pyarrow")
         .materialize())
        gmax = max(ray.get([a.commit_half.remote() for a in actors]))
        q = max(1, gmax >> scale_bits)
        ray.get([a.scale_into.remote(q, which_write) for a in actors])

    for it in range(int(rounds)):
        half(edges_bs, "s", "t", "hub", "auth",
             f"hits-{run_id}-{it}a")
        half(edges_bt, "t", "s", "auth", "hub",
             f"hits-{run_id}-{it}b")

    refs = [a.state_table.remote() for a in actors]
    if output == "dataset":
        return ray.data.from_arrow_refs(refs)
    tbl = pa.concat_tables(ray.get(refs))
    return (np.asarray(tbl.column("node"), dtype=np.int64),
            np.asarray(tbl.column("hub"), dtype=np.int64),
            np.asarray(tbl.column("auth"), dtype=np.int64))


def hits(edges_ds, src_col: str, dst_col: str, rounds: int = 2,
         scale_bits: int = 20, mode: str = "auto",
         node_budget: int = 20_000_000, num_shards: int = 16,
         output: str = "arrays"):
    """Bit-deterministic HITS hubs/authorities (Kleinberg 1999, JACM
    46(5)) over a directed edge Dataset, fixed-round like
    :func:`label_propagation` / :func:`kcore`.

    The float L2 normalization of textbook HITS is replaced by a
    DETERMINISTIC integer rescale after every half-step:
    ``v ← v // max(1, max(v) >> scale_bits)`` — every quantity stays an
    exact int64 (values cap at ~2^(scale_bits+1), so each Σ over a
    node's edges stays < 2^62 under the loud degree guard), scores stay
    PROPORTIONAL to HITS' up to floor rounding, and each round unrolls
    to a (join → sum → max → div) SQL CTE the oracle replays bit-exactly
    (the pagerank/bpe-merges strategy).  Multi-edges each contribute
    (no implicit dedup — feed :func:`canonical_edges` output if simple-
    graph semantics are wanted).

    Plan: one cached (s, t) edge projection; per round two edge scans
    with the current score vector broadcast via ``ray.put`` and two
    node-sized ``bucketed_sum`` folds (1-int hash-bucket exchange;
    the plain ``groupby().Sum`` form was 12× slower at 10M edges,
    BASELINE.md) — the rank-vector-on-driver
    envelope documented at :func:`pagerank`.  ``mode="sharded"`` (or
    ``auto`` past ``node_budget`` nodes) holds hub/auth in
    range-partitioned shard actors (:func:`_hits_sharded`) —
    bit-identical, driver state O(P).  Returns ``(nodes, hub, auth)``
    int64 arrays (hub init = 1, so round-1 authority = in-degree), or
    a Dataset with ``output="dataset"``.
    """
    import ray

    from bqf_ray.stages.partition import bucketed_sum

    def edge_cols(batch: pa.Table) -> pa.Table:
        return pa.table({
            "s": pa.array(np.asarray(batch.column(src_col),
                                     dtype=np.int64)),
            "t": pa.array(np.asarray(batch.column(dst_col),
                                     dtype=np.int64))})

    edges = edges_ds.map_batches(edge_cols,
                                 batch_format="pyarrow").materialize()

    def node_partials(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("s"), dtype=np.int64)
        t = np.asarray(batch.column("t"), dtype=np.int64)
        su, sc = np.unique(s, return_counts=True)
        tu, tc = np.unique(t, return_counts=True)
        return pa.table({
            "node": pa.array(np.concatenate([su, tu])),
            "dout": pa.array(np.concatenate(
                [sc.astype(np.int64), np.zeros(len(tu), np.int64)])),
            "din": pa.array(np.concatenate(
                [np.zeros(len(su), np.int64), tc.astype(np.int64)]))})

    if mode not in ("auto", "broadcast", "sharded"):
        raise ValueError(f"hits: unknown mode {mode!r}")
    nd_ds = bucketed_sum(edges.map_batches(node_partials,
                                           batch_format="pyarrow"),
                         ["node"], {"dout": "dout", "din": "din"})
    if mode != "broadcast":
        nd_ds = nd_ds.materialize()
        n_nodes = nd_ds.count()
        if mode == "sharded" or n_nodes > int(node_budget):
            if mode == "auto":
                plan_log("hits", "sharded", n_nodes=n_nodes,
                         node_budget=int(node_budget))
            from ray.data.aggregate import Max
            env = nd_ds.aggregate(Max("dout", alias_name="o"),
                                  Max("din", alias_name="i"))
            deg_max = max(int(env["o"] or 0), int(env["i"] or 0), 1)
            if deg_max >= (1 << (62 - scale_bits - 1)):
                raise ValueError(
                    f"hits: max degree {deg_max} ≥ "
                    f"2^{62 - scale_bits - 1} breaks the int64 "
                    "half-step sum envelope — lower scale_bits or "
                    "pre-aggregate parallel edges")
            return _hits_sharded(edges, rounds, scale_bits,
                                 num_shards, output)
    nd = nd_ds.to_pandas()
    if len(nd) == 0:                 # empty groupby: no columns at all
        z = np.empty(0, dtype=np.int64)
        if output == "dataset":
            import ray
            return ray.data.from_arrow(pa.table({
                "node": pa.array(z), "hub": pa.array(z),
                "auth": pa.array(z)}))
        return z, z.copy(), z.copy()
    nodes = np.sort(nd["node"].to_numpy().astype(np.int64))
    n = len(nodes)
    deg_max = max(int(nd["dout"].max()), int(nd["din"].max()), 1)
    if deg_max >= (1 << (62 - scale_bits - 1)):
        raise ValueError(
            f"hits: max degree {deg_max} ≥ 2^{62 - scale_bits - 1} "
            "breaks the int64 half-step sum envelope — lower "
            "scale_bits or pre-aggregate parallel edges")

    def _half(vec: np.ndarray, from_col: str, to_col: str) -> np.ndarray:
        """out(to) = Σ vec[from] over edges, then integer rescale."""
        ref = ray.put((nodes, vec))

        def contrib(batch: pa.Table) -> pa.Table:
            nn, vv = ray.get(ref)
            f = np.asarray(batch.column(from_col), dtype=np.int64)
            t = np.asarray(batch.column(to_col), dtype=np.int64)
            c = vv[np.searchsorted(nn, f)]
            tu, inv = np.unique(t, return_inverse=True)
            sums = np.zeros(len(tu), dtype=np.int64)
            np.add.at(sums, inv, c)
            return pa.table({"node": pa.array(tu),
                             "partial": pa.array(sums)})

        got = bucketed_sum(edges.map_batches(contrib,
                                             batch_format="pyarrow"),
                           ["node"], {"partial": "v"}).to_pandas()
        out = np.zeros(n, dtype=np.int64)
        gi = np.searchsorted(nodes, got["node"].to_numpy())
        out[gi] = got["v"].to_numpy().astype(np.int64)
        q = max(1, int(out.max()) >> scale_bits)
        return out // np.int64(q)

    hub = np.ones(n, dtype=np.int64)
    auth = np.zeros(n, dtype=np.int64)
    for _ in range(int(rounds)):
        auth = _half(hub, "s", "t")      # authority ← Σ hub over in-edges
        hub = _half(auth, "t", "s")      # hub ← Σ auth over out-edges
    if output == "dataset":
        import ray
        return ray.data.from_arrow(pa.table({
            "node": pa.array(nodes), "hub": pa.array(hub),
            "auth": pa.array(auth)}))
    return nodes, hub, auth


def link_prediction(edges_ds, a_col: str = "a", b_col: str = "b",
                    min_cn: int = 2, num_buckets: int = 64,
                    max_degree: int | None = None,
                    mode: str = "auto",
                    broadcast_budget_bytes: int = 1 << 30):
    """Common-neighbor link prediction over an undirected graph: for
    every NON-edge pair ``(a, b)`` with at least ``min_cn`` shared
    neighbors, emit exact ``(a, b, cn, deg_a, deg_b, jaccard)`` where
    ``jaccard = cn / (deg_a + deg_b - cn)`` is the neighborhood-Jaccard
    score in ONE IEEE division (bit-matches the SQL replay).

    Plan (all exchanges 1-int hash buckets, no global sort):

    1. canonicalize edges once (materialized — consumed three times:
       wedges, anti-join tags, degrees);
    2. wedge pairs per CENTER vertex (center-hash bucketed, the
       vectorized :func:`_segment_pairs`), locally pre-summed to
       ``(pair, cn)`` partials before leaving the bucket task;
    3. ONE pair-hash exchange folds exact ``cn`` AND removes existing
       edges in the same bucket (edges ride the union tagged — the
       anti-join costs no extra shuffle);
    4. degrees attach via :func:`attach_degrees`'s budget-gated
       broadcast / bucketed plans.

    ``max_degree`` (optional) skips wedge generation at hub centers
    with more neighbors — the standard hub cutoff that bounds the
    deg² wedge blowup; ``cn`` then UNDERCOUNTS pairs whose only shared
    neighbors are hubs (documented estimator bias; leave ``None`` for
    the exact/oracle path).  Candidate volume is bounded by
    Σ_c deg(c)² over kept centers; size ``min_cn`` to the graph.

    Reference scope: the reference engine has no graph surface — this
    is part of the training-data/graph suite (SURVEY.md §2 additions).
    """
    import ray  # noqa: F401  (dataset ops only)

    from bqf_ray.functions.hashing import fmix64

    B = int(num_buckets)
    if min_cn < 1:
        raise ValueError("min_cn must be >= 1")
    edges = canonical_edges(edges_ds, a_col, b_col, num_buckets=B)

    def wedges(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"), dtype=np.int64)
        b = np.asarray(batch.column("b"), dtype=np.int64)
        ctr = np.concatenate([a, b])
        nbr = np.concatenate([b, a])
        bkt = (fmix64(ctr.view(np.uint64)) % np.uint64(B)).astype(np.int64)
        return pa.table({"c": pa.array(ctr), "n": pa.array(nbr),
                         "__bucket": pa.array(bkt)})

    def gen_pairs(grp: pa.Table) -> pa.Table:
        c = np.asarray(grp.column("c"), dtype=np.int64)
        n = np.asarray(grp.column("n"), dtype=np.int64)
        if max_degree is not None:
            # drop whole hub centers (not a truncated sample of their
            # neighbors — truncation would make cn partition-dependent)
            order = np.lexsort((n, c))
            c, n = c[order], n[order]
            starts = np.concatenate([[True], c[1:] != c[:-1]]) \
                if len(c) else np.empty(0, dtype=bool)
            seg = np.cumsum(starts) - 1
            sizes = np.bincount(seg) if len(c) else np.empty(0, np.int64)
            keep = sizes[seg] <= int(max_degree)
            c, n = c[keep], n[keep]
        x, y = _segment_pairs(c, n)
        wa, wb = np.minimum(x, y), np.maximum(x, y)
        # local pre-sum: (pair, count) partials leave the task, not
        # raw wedges
        order = np.lexsort((wb, wa))
        wa, wb = wa[order], wb[order]
        new = np.concatenate([[True], (wa[1:] != wa[:-1])
                              | (wb[1:] != wb[:-1])]) \
            if len(wa) else np.empty(0, dtype=bool)
        idx = np.flatnonzero(new)
        cnt = np.diff(np.append(idx, len(wa))).astype(np.int64)
        wa, wb = wa[idx], wb[idx]
        bkt = (_pair_hash64(wa, wb) % np.uint64(B)).astype(np.int64)
        return pa.table({
            "a": pa.array(wa), "b": pa.array(wb), "cn": pa.array(cnt),
            "__side": pa.array(np.zeros(len(wa), dtype=np.int8)),
            "__bucket": pa.array(bkt)})

    def tag_edges(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"), dtype=np.int64)
        b = np.asarray(batch.column("b"), dtype=np.int64)
        bkt = (_pair_hash64(a, b) % np.uint64(B)).astype(np.int64)
        return pa.table({
            "a": pa.array(a), "b": pa.array(b),
            "cn": pa.array(np.zeros(len(a), dtype=np.int64)),
            "__side": pa.array(np.ones(len(a), dtype=np.int8)),
            "__bucket": pa.array(bkt)})

    thresh = np.int64(min_cn)

    def fold_bucket(g: pa.Table) -> pa.Table:
        side = np.asarray(g.column("__side"))
        a = np.asarray(g.column("a"), dtype=np.int64)
        b = np.asarray(g.column("b"), dtype=np.int64)
        cn = np.asarray(g.column("cn"), dtype=np.int64)
        em = side == 1
        ea, eb = a[em], b[em]
        pm = ~em
        a, b, cn = a[pm], b[pm], cn[pm]
        if not len(a):
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "cn": pa.array([], pa.int64())})
        order = np.lexsort((b, a))
        a, b, cn = a[order], b[order], cn[order]
        new = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        seg = np.cumsum(new) - 1
        tot = np.zeros(int(seg[-1]) + 1, dtype=np.int64)
        np.add.at(tot, seg, cn)
        ua, ub = a[new], b[new]
        keep = tot >= thresh
        if len(ea):
            keep &= ~_packed_pair_probe(_packed_pair_set(ea, eb),
                                        ua, ub)
        return pa.table({"a": pa.array(ua[keep]), "b": pa.array(ub[keep]),
                         "cn": pa.array(tot[keep])})

    pairs = (edges.map_batches(wedges, batch_format="pyarrow")
             .groupby("__bucket")
             .map_groups(gen_pairs, batch_format="pyarrow")
             .union(edges.map_batches(tag_edges, batch_format="pyarrow"))
             .groupby("__bucket")
             .map_groups(fold_bucket, batch_format="pyarrow"))

    scored = attach_degrees(pairs, num_buckets=B, mode=mode,
                            broadcast_budget_bytes=broadcast_budget_bytes,
                            deg_edges=edges)

    def score(batch: pa.Table) -> pa.Table:
        cn = np.asarray(batch.column("cn"), dtype=np.int64)
        da = np.asarray(batch.column("deg_a"), dtype=np.int64)
        db = np.asarray(batch.column("deg_b"), dtype=np.int64)
        jac = cn.astype(np.float64) / (da + db - cn).astype(np.float64)
        return batch.append_column("jaccard", pa.array(jac))

    out = scored.map_batches(score, batch_format="pyarrow")
    # schema floor: with zero candidate pairs no task ever runs and the
    # result would surface schema-less (fuzz finding) — union a typed
    # empty block so downstream always sees the contract columns
    import ray
    z = pa.array([], pa.int64())
    floor = pa.table({"a": z, "b": z, "cn": z, "deg_a": z, "deg_b": z,
                      "jaccard": pa.array([], pa.float64())})
    return out.union(ray.data.from_arrow(floor))


class _SsspShard:
    """One range-partitioned shard of the SSSP distance vector: sorted
    node ids + best-known dist for this id range.  ``merge`` min-folds
    a candidate batch (order-independent, so sharded results are
    bit-identical to the broadcast fold) and reports whether anything
    improved — the driver's convergence signal."""

    def __init__(self):
        self.nodes = np.empty(0, dtype=np.int64)
        self.dist = np.empty(0, dtype=np.int64)

    def init_shard(self, nodes, dist):
        order = np.argsort(nodes)
        self.nodes = nodes[order].astype(np.int64)
        self.dist = dist[order].astype(np.int64)

    def get_state(self):
        return self.nodes, self.dist

    def merge(self, cn, cd):
        merged = np.union1d(self.nodes, cn)
        nd_new = np.full(len(merged), np.iinfo(np.int64).max)
        nd_new[np.searchsorted(merged, self.nodes)] = self.dist
        pos = np.searchsorted(merged, cn)
        np.minimum.at(nd_new, pos, cd)
        changed = (len(merged) != len(self.nodes)
                   or not np.array_equal(
                       nd_new[np.searchsorted(merged, self.nodes)],
                       self.dist))
        self.nodes, self.dist = merged, nd_new
        return bool(changed)

    def state_table(self):
        return pa.table({"node": pa.array(self.nodes),
                         "dist": pa.array(self.dist)})


def _sssp_sharded(edges, nodes0, dist0, rounds, num_shards):
    """Sharded continuation of :func:`sssp`: the dist vector lives in
    range-partitioned shard actors, edges are doubled (one row per
    direction) and co-bucketed by source range ONCE, and each round is
    one edge scan + one min-folded candidate exchange.  Driver state is
    O(num_shards)."""
    import ray

    P = max(1, int(num_shards))
    edges = edges.materialize()      # boundaries + co-bucket read it
    # boundaries must cover the FULL endpoint space (the frontier grows
    # into ids the current state has never seen)
    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays([
            batch.column("x").combine_chunks()
            if isinstance(batch.column("x"), pa.ChunkedArray)
            else batch.column("x"),
            batch.column("y").combine_chunks()
            if isinstance(batch.column("y"), pa.ChunkedArray)
            else batch.column("y")])})

    route = _shard_route(
        edges.map_batches(endpoints, batch_format="pyarrow"),
        "node", P)
    run_id = _shard_run_id()

    actors = _make_shards(_SsspShard, P)
    sp = route(nodes0)
    ray.get([actors[p].init_shard.remote(nodes0[sp == p],
                                         dist0[sp == p])
             for p in range(P)])
    edges_b = _cobucket(edges, route, "x", "__xp")

    for it in range(int(rounds)):
        token = f"sssp-{run_id}-{it}"

        def relax(batch: pa.Table) -> pa.Table:
            xp = np.asarray(batch.column("__xp"), dtype=np.int64)
            x = np.asarray(batch.column("x"), dtype=np.int64)
            y = np.asarray(batch.column("y"), dtype=np.int64)
            w = np.asarray(batch.column("w"), dtype=np.int64)
            outs_n, outs_d = [], []
            for p in np.unique(xp):
                m = xp == p
                nn, dd = _pr_cached_state(actors, token, int(p))
                if not len(nn):       # shard not yet reached
                    continue
                ix = np.searchsorted(nn, x[m])
                hit = (ix < len(nn)) \
                    & (nn[np.minimum(ix, len(nn) - 1)] == x[m])
                outs_n.append(y[m][hit])
                outs_d.append(dd[ix[hit]] + w[m][hit])
            cn = (np.concatenate(outs_n) if outs_n
                  else np.empty(0, dtype=np.int64))
            cd = (np.concatenate(outs_d) if outs_d
                  else np.empty(0, dtype=np.int64))
            if len(cn):                      # local min-fold per node
                order = np.lexsort((cd, cn))
                cn, cd = cn[order], cd[order]
                first = np.concatenate([[True], cn[1:] != cn[:-1]])
                cn, cd = cn[first], cd[first]
            return pa.table({"node": pa.array(cn), "d": pa.array(cd),
                             "__yp": pa.array(route(cn))})

        def fold(group: pa.Table) -> pa.Table:
            p = int(group.column("__yp")[0].as_py())
            gn = np.asarray(group.column("node"), dtype=np.int64)
            gd = np.asarray(group.column("d"), dtype=np.int64)
            order = np.lexsort((gd, gn))
            gn, gd = gn[order], gd[order]
            first = np.concatenate([[True], gn[1:] != gn[:-1]])
            ch = ray.get(actors[p].merge.remote(gn[first], gd[first]))
            return pa.table({"p": pa.array([p], pa.int64()),
                             "changed": pa.array([ch])})

        got = (edges_b.map_batches(relax, batch_format="pyarrow")
               .groupby("__yp")
               .map_groups(fold, batch_format="pyarrow")
               .to_pandas())
        if not len(got) or not got["changed"].any():
            break                            # converged = true SSSP
    tbl = pa.concat_tables(
        ray.get([a.state_table.remote() for a in actors]))
    return tbl


def sssp(edges_ds, seeds: "np.ndarray", rounds: int = 4,
         a_col: str = "a", b_col: str = "b", w_col: str = "w",
         mode: str = "auto", node_budget: int = 20_000_000,
         num_shards: int = 16):
    """Fixed-round Bellman-Ford single-source (multi-seed) shortest
    paths over an UNDIRECTED weighted edge Dataset: after R rounds,
    ``(node, dist)`` holds the exact min-cost path using ≤ R edges
    from the seed set — the bounded-recursion SSSP a SQL unrolled-CTE
    replay computes, and (early-stop detected) the true Dijkstra
    distances once no round improves anything.  Weights must be
    POSITIVE int64 (loud raise on null/≤0 — zero/negative cycles void
    the fixed-round equality).

    Plan (the :func:`bfs_hops` / :func:`pagerank` envelope): the
    ``(nodes, dist)`` vector broadcasts once per round (``ray.put``);
    each round is ONE linear ``map_batches`` scan over the edges
    emitting per-batch MIN-folded candidate relaxations, and the
    driver folds candidates against the current vector (vertex-sized
    arrays).  No shuffle after edge materialization.

    Past ``node_budget`` settled nodes the ``auto`` plan hands the
    remaining rounds to a SHARDED continuation (``mode="sharded"``
    starts there): the dist vector lives in ``num_shards``
    range-partitioned :class:`_SsspShard` actors, edges are doubled
    and co-bucketed by source range once, and each round is one edge
    scan + one min-folded candidate exchange — driver state O(P).
    Min-folds are order-independent, so both plans return identical
    tables (asserted in tests)."""
    import ray

    R = int(rounds)
    nodes = np.unique(np.asarray(seeds, dtype=np.int64))
    dist = np.zeros(len(nodes), dtype=np.int64)
    if not len(nodes):
        return pa.table({"node": pa.array([], pa.int64()),
                         "dist": pa.array([], pa.int64())})
    if mode not in ("auto", "broadcast", "sharded"):
        raise ValueError(f"sssp: unknown mode {mode!r}")

    def both_dirs(batch: pa.Table) -> pa.Table:
        if batch.column(w_col).null_count:
            raise ValueError("sssp: null weight")
        a = np.asarray(batch.column(a_col), dtype=np.int64)
        b = np.asarray(batch.column(b_col), dtype=np.int64)
        w = np.asarray(batch.column(w_col), dtype=np.int64)
        if len(w) and w.min() <= 0:
            raise ValueError("sssp: weights must be positive "
                             "(zero/negative edges void the "
                             "fixed-round contract)")
        return pa.table({"x": pa.array(np.concatenate([a, b])),
                         "y": pa.array(np.concatenate([b, a])),
                         "w": pa.array(np.concatenate([w, w]))})

    if mode == "sharded":
        return _sssp_sharded(
            edges_ds.map_batches(both_dirs, batch_format="pyarrow"),
            nodes, dist, R, num_shards)
    edges = edges_ds.materialize()
    for rnd in range(R):
        if mode == "auto" and len(nodes) > int(node_budget):
            plan_log("sssp", "sharded", n_nodes=len(nodes),
                     node_budget=int(node_budget))
            # dist vector outgrew the driver envelope: hand the
            # remaining rounds to the sharded continuation (same
            # min-fold semantics → same result)
            return _sssp_sharded(
                edges.map_batches(both_dirs, batch_format="pyarrow"),
                nodes, dist, R - rnd, num_shards)
        ref = ray.put((nodes, dist))

        def relax(batch: pa.Table) -> pa.Table:
            nd, dd = ray.get(ref)
            if batch.column(w_col).null_count:
                raise ValueError("sssp: null weight")
            a = np.asarray(batch.column(a_col), dtype=np.int64)
            b = np.asarray(batch.column(b_col), dtype=np.int64)
            w = np.asarray(batch.column(w_col), dtype=np.int64)
            if len(w) and w.min() <= 0:
                raise ValueError("sssp: weights must be positive "
                                 "(zero/negative edges void the "
                                 "fixed-round contract)")
            outs, outd = [], []
            for x, y in ((a, b), (b, a)):
                ix = np.searchsorted(nd, x)
                hit = (ix < len(nd)) \
                    & (nd[np.minimum(ix, len(nd) - 1)] == x)
                outs.append(y[hit])
                outd.append(dd[ix[hit]] + w[hit])
            cn = np.concatenate(outs)
            cd = np.concatenate(outd)
            if len(cn):                      # local min-fold per node
                order = np.lexsort((cd, cn))
                cn, cd = cn[order], cd[order]
                first = np.concatenate([[True], cn[1:] != cn[:-1]])
                cn, cd = cn[first], cd[first]
            return pa.table({"node": pa.array(cn), "d": pa.array(cd)})

        got = edges.map_batches(relax, batch_format="pyarrow") \
            .to_pandas()
        if not len(got):
            break
        cn = got["node"].to_numpy().astype(np.int64)
        cd = got["d"].to_numpy().astype(np.int64)
        order = np.lexsort((cd, cn))
        cn, cd = cn[order], cd[order]
        first = np.concatenate([[True], cn[1:] != cn[:-1]])
        cn, cd = cn[first], cd[first]
        merged = np.union1d(nodes, cn)
        nd_new = np.full(len(merged), np.iinfo(np.int64).max)
        pos_old = np.searchsorted(merged, nodes)
        nd_new[pos_old] = dist
        pos_c = np.searchsorted(merged, cn)
        nd_new[pos_c] = np.minimum(nd_new[pos_c], cd)
        if len(merged) == len(nodes) and (nd_new == dist).all():
            break                            # converged = true SSSP
        nodes, dist = merged, nd_new
    return pa.table({"node": pa.array(nodes), "dist": pa.array(dist)})


def ktruss(edges_ds, k: int, rounds: int = 3,
           a_col: str = "a", b_col: str = "b", num_buckets: int = 64,
           broadcast_budget_bytes: int = 1 << 30, mode: str = "auto"):
    """Fixed-round k-truss peel: each round recomputes per-edge
    triangle support over the SURVIVING edges
    (:func:`edge_triangle_support`) and drops edges with support
    < k − 2.  The peel is monotone, so the fixed-round result is a
    superset of the true k-truss that EQUALS it once converged —
    detected and early-stopped when a round drops nothing (the
    :func:`kcore` contract, lifted from vertices to edges).  Returns
    the surviving canonical ``(a, b)`` edge Dataset.

    Per round: one broadcast wedge-closure pass + one edge-table fold
    (the edge_triangle_support plan and its ``broadcast_budget_bytes``
    envelope) + a stateless filter; the edge set only shrinks."""
    import pyarrow.compute as pc

    K = int(k)
    if K < 2:
        raise ValueError("ktruss: k must be >= 2")
    thr = K - 2
    # materialized once: every round's support pass + the count would
    # otherwise re-execute the upstream edge construction per use
    cur = canonical_edges(edges_ds, a_col=a_col,
                          b_col=b_col).materialize()
    n_cur = cur.count()

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(batch.column("support"),
                             pa.scalar(thr))).select(["a", "b"])

    for _ in range(int(rounds)):
        if n_cur == 0:
            break
        # cur is already canonical (canonicalized once before the
        # loop; the peel filter preserves canonical form) — skip the
        # two dedup sorts per round
        sup = edge_triangle_support(
            cur, num_buckets=num_buckets,
            broadcast_budget_bytes=broadcast_budget_bytes,
            pre_canonical=True, mode=mode)
        cur = sup.map_batches(keep, batch_format="pyarrow") \
            .materialize()
        n_new = cur.count()
        if n_new == n_cur:
            break                            # converged = true k-truss
        n_cur = n_new
    return cur


class _CsrShard:
    """Range-partitioned CSR slice for the sharded walk plan: each
    shard holds the COMPLETE sorted neighbor list of every node in its
    range (edges arrive doubled and co-bucketed by source range), so
    the hash-chosen step rule sees the same sorted adjacency the
    broadcast CSR would."""

    def __init__(self):
        self.nodes = np.empty(0, dtype=np.int64)
        self.indptr = np.zeros(1, dtype=np.int64)
        self.nbrs = np.empty(0, dtype=np.int64)

    def init_shard(self, src, dst):
        order = np.lexsort((dst, src))
        src, self.nbrs = src[order], dst[order]
        self.nodes = np.unique(src)
        self.indptr = np.searchsorted(
            src, np.append(self.nodes, np.iinfo(np.int64).max)
        ).astype(np.int64)

    def get_state(self):
        return self.nodes, self.indptr, self.nbrs


def _random_walks_sharded(edges, seeds, L, W, salt, algo, num_shards):
    """Sharded walk tier (past the CSR broadcast budget): adjacency in
    range-partitioned :class:`_CsrShard` actors, the walk frontier
    routed to its current node's shard each step — L frontier-sized
    exchanges instead of an edge-sized broadcast; the step rule is the
    same ``H(walk_id|k|v|salt) % deg(v)`` over the same sorted
    neighbor order, so the corpus is bit-identical to the broadcast
    plan."""
    import ray

    from bqf_ray.functions.hashing import (md5_hash64_array,
                                           xxhash64_array)

    hash_fn = {"md5": md5_hash64_array, "xx64": xxhash64_array}[algo]
    P = max(1, int(num_shards))

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"), dtype=np.int64)
        b = np.asarray(batch.column("b"), dtype=np.int64)
        return pa.table({"x": pa.array(np.concatenate([a, b])),
                         "y": pa.array(np.concatenate([b, a]))})

    run_id, route, ed2b = _shard_scaffold(
        edges.map_batches(both_dirs, batch_format="pyarrow"),
        "x", P, "__xp")
    token = f"walks-{run_id}"
    actors = _make_shards(_CsrShard, P)

    def init_groups(group: pa.Table) -> pa.Table:
        p = int(group.column("__xp")[0].as_py())
        ray.get(actors[p].init_shard.remote(
            np.asarray(group.column("x"), dtype=np.int64),
            np.asarray(group.column("y"), dtype=np.int64)))
        return pa.table({"p": pa.array([p], pa.int64())})

    (ed2b.groupby("__xp")
     .map_groups(init_groups, batch_format="pyarrow")
     .materialize())

    seeds = np.unique(np.asarray(seeds, dtype=np.int64))
    wid = (seeds[:, None] * W
           + np.arange(W, dtype=np.int64)[None, :]).ravel()
    step0 = pa.table({
        "walk_id": pa.array(wid),
        "seed": pa.array(np.repeat(seeds, W)),
        "step": pa.array(np.zeros(len(wid), dtype=np.int64)),
        "node": pa.array(np.repeat(seeds, W))})
    outs = [ray.data.from_arrow(step0)]
    frontier = outs[0]

    for k in range(1, L + 1):
        def add_cp(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__cp", pa.array(route(batch.column("node"))))

        def step(group: pa.Table, k=k) -> pa.Table:
            p = int(group.column("__cp")[0].as_py())
            nd, ip, nb = _pr_cached_state(actors, token, p)
            w = np.asarray(group.column("walk_id"), dtype=np.int64)
            sd = np.asarray(group.column("seed"), dtype=np.int64)
            cur = np.asarray(group.column("node"), dtype=np.int64)
            if not len(nd):
                return step0.slice(0, 0)
            pos = np.searchsorted(nd, cur)
            ok = (pos < len(nd)) \
                & (nd[np.minimum(pos, len(nd) - 1)] == cur)
            deg = np.where(ok, ip[np.minimum(pos + 1, len(ip) - 1)]
                           - ip[np.minimum(pos, len(ip) - 1)], 0)
            ok &= deg > 0
            if not ok.any():
                return step0.slice(0, 0)
            keys = np.array([f"{a}|{k}|{b}|{salt}" for a, b in
                             zip(w[ok], cur[ok])], dtype=object)
            h = hash_fn(pa.array(keys, pa.string()))
            idx = h % deg[ok].astype(np.uint64)
            nxt = nb[ip[pos[ok]] + idx.astype(np.int64)]
            return pa.table({
                "walk_id": pa.array(w[ok]),
                "seed": pa.array(sd[ok]),
                "step": pa.array(np.full(int(ok.sum()), k,
                                         dtype=np.int64)),
                "node": pa.array(nxt)})

        frontier = (frontier.map_batches(add_cp, batch_format="pyarrow")
                    .groupby("__cp")
                    .map_groups(step, batch_format="pyarrow")
                    .materialize())
        if frontier.count() == 0:
            break
        outs.append(frontier)
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def random_walks(edges_ds, seeds: "np.ndarray", walk_len: int = 5,
                 walks_per_seed: int = 4, salt: str = "w",
                 algo: str = "md5", a_col: str = "a", b_col: str = "b",
                 broadcast_budget_bytes: int = 1 << 30,
                 mode: str = "auto", num_shards: int = 16):
    """Deterministic node2vec-style random-walk corpus over an
    UNDIRECTED graph: ``walks_per_seed`` walks of ``walk_len`` steps
    from every seed, where step ``k`` at node ``v`` moves to sorted
    neighbor ``H(walk_id|k|v|salt) % deg(v)`` — hash-chosen, so the
    corpus is BIT-DETERMINISTIC under any partitioning and (with
    ``algo="md5"``) replayable in ANSI SQL via the
    ``('0x' || substr(md5(s), 1, 16))::UBIGINT`` identity the sampling
    family uses.  ``algo="xx64"`` swaps in the vectorized xxhash64 for
    the scale path (same structure, not SQL-replayable).  Walks that
    reach a degree-0 / absent node stop early; every walk emits its
    step-0 seed row.  ``walk_id = seed · walks_per_seed + j``.

    Plan: walks are embarrassingly parallel GIVEN the adjacency — the
    canonical edge list folds into a CSR (sorted nodes, indptr, sorted
    neighbors) under ``broadcast_budget_bytes`` (16 B/edge; past it the
    ``auto`` plan routes to :func:`_random_walks_sharded` — adjacency
    in range-partitioned shard actors, one frontier-sized exchange per
    step, bit-identical corpus), ships ONCE
    via ``ray.put``, and ONE ``map_batches`` pass advances each walk
    partition all ``walk_len`` steps locally (a numpy loop over steps,
    vectorized across walks).  No per-step exchange at all.  Output
    ``(walk_id, seed, step, node)``."""
    import ray

    from bqf_ray.functions.hashing import (md5_hash64_array,
                                           xxhash64_array)

    L, W = int(walk_len), int(walks_per_seed)
    if L < 1 or W < 1:
        raise ValueError("walk_len and walks_per_seed must be >= 1")
    if mode not in ("auto", "broadcast", "sharded"):
        raise ValueError(f"random_walks: unknown mode {mode!r}")
    hash_fn = {"md5": md5_hash64_array, "xx64": xxhash64_array}[algo]
    edges = canonical_edges(edges_ds, a_col=a_col, b_col=b_col)
    if mode == "sharded":
        return _random_walks_sharded(edges.materialize(), seeds, L, W,
                                     salt, algo, num_shards)

    # fold adjacency to a CSR under the broadcast budget
    n_edges = edges.count()
    if 16 * n_edges > broadcast_budget_bytes:
        if mode == "auto":
            plan_log("random_walks", "sharded",
                     edge_bytes=16 * n_edges,
                     budget_bytes=int(broadcast_budget_bytes))
            return _random_walks_sharded(edges.materialize(), seeds,
                                         L, W, salt, algo, num_shards)
        raise ValueError(
            f"random_walks: {n_edges} edges × 16 B exceed the "
            f"{broadcast_budget_bytes} B broadcast budget — use "
            "mode='sharded' (per-step co-partitioned frontier "
            "exchange) for the larger tier")
    parts = [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows]
    if parts:
        at = pa.concat_tables(parts)
        ea = np.asarray(at.column("a"), dtype=np.int64)
        eb = np.asarray(at.column("b"), dtype=np.int64)
        src = np.concatenate([ea, eb])
        dst = np.concatenate([eb, ea])
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        nodes = np.unique(src)
        indptr = np.searchsorted(src, np.append(nodes,
                                                np.iinfo(np.int64).max))
    else:
        nodes = np.empty(0, dtype=np.int64)
        dst = np.empty(0, dtype=np.int64)
        indptr = np.zeros(1, dtype=np.int64)
    ref = ray.put((nodes, indptr.astype(np.int64), dst))

    seeds = np.unique(np.asarray(seeds, dtype=np.int64))
    if not len(seeds):
        # typed empty: a map over an empty dataset never executes its
        # UDF, so the output schema would be lost downstream
        z = pa.array([], pa.int64())
        return ray.data.from_arrow(pa.table({
            "walk_id": z, "seed": z, "step": z, "node": z}))
    wid = (seeds[:, None] * W
           + np.arange(W, dtype=np.int64)[None, :]).ravel()
    walks = ray.data.from_arrow(pa.table({
        "walk_id": pa.array(wid),
        "seed": pa.array(np.repeat(seeds, W))}))

    def advance(batch: pa.Table) -> pa.Table:
        nd, ip, nb = ray.get(ref)
        w = np.asarray(batch.column("walk_id"), dtype=np.int64)
        sd = np.asarray(batch.column("seed"), dtype=np.int64)
        out_w, out_s, out_k, out_n = [w], [sd], \
            [np.zeros(len(w), dtype=np.int64)], [sd]
        cur = sd
        alive = np.ones(len(w), dtype=bool)
        for k in range(1, L + 1):
            pos = np.searchsorted(nd, cur)
            ok = alive & (pos < len(nd)) \
                & (nd[np.minimum(pos, max(len(nd) - 1, 0))] == cur) \
                if len(nd) else np.zeros(len(w), dtype=bool)
            deg = np.where(ok, ip[np.minimum(pos + 1, len(ip) - 1)]
                           - ip[np.minimum(pos, len(ip) - 1)], 0)
            ok &= deg > 0
            if not ok.any():
                break
            keys = np.array([f"{a}|{k}|{b}|{salt}" for a, b in
                             zip(w[ok], cur[ok])], dtype=object)
            h = hash_fn(pa.array(keys, pa.string()))
            idx = h % deg[ok].astype(np.uint64)
            nxt = cur.copy()
            nxt[ok] = nb[ip[pos[ok]] + idx.astype(np.int64)]
            out_w.append(w[ok])
            out_s.append(sd[ok])
            out_k.append(np.full(int(ok.sum()), k, dtype=np.int64))
            out_n.append(nxt[ok])
            cur, alive = nxt, ok
        return pa.table({"walk_id": pa.array(np.concatenate(out_w)),
                         "seed": pa.array(np.concatenate(out_s)),
                         "step": pa.array(np.concatenate(out_k)),
                         "node": pa.array(np.concatenate(out_n))})

    return walks.map_batches(advance, batch_format="pyarrow")


def clustering_coefficients(edges_ds, a_col: str = "a", b_col: str = "b",
                            num_buckets: int = 64,
                            broadcast_budget_bytes: int = 1 << 30,
                            mode: str = "auto"):
    """Per-node local clustering coefficient — Watts–Strogatz
    ``c(v) = 2·t(v) / (d(v)·(d(v)−1))`` with ``t(v)`` the triangles
    through v, computed WITHOUT per-node neighbor sets: per-edge
    triangle support already satisfies ``Σ_{(v,u)} support = 2·t(v)``,
    so one endpoint-explode of :func:`edge_triangle_support`'s output
    carrying ``(support, 1)`` partials and ONE node-bucketed sum give
    both ``2t(v)`` and ``d(v)`` in the same exchange.  The coefficient
    is a single IEEE division of exact int64s — SQL-replayable.
    Nodes with ``d < 2`` have no defined coefficient and are dropped
    (mirror ``WHERE degree >= 2``).  Output ``(node, degree,
    sum_support, clustering)``."""
    from bqf_ray.stages.partition import bucketed_sum

    sup = edge_triangle_support(
        edges_ds, a_col=a_col, b_col=b_col, num_buckets=num_buckets,
        broadcast_budget_bytes=broadcast_budget_bytes, mode=mode)

    def explode(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column(a_col), dtype=np.int64)
        b = np.asarray(batch.column(b_col), dtype=np.int64)
        s = np.asarray(batch.column("support"), dtype=np.int64)
        return pa.table({
            "node": pa.array(np.concatenate([a, b])),
            "ps": pa.array(np.concatenate([s, s])),
            "pd": pa.array(np.ones(2 * len(a), dtype=np.int64))})

    sums = bucketed_sum(sup.map_batches(explode, batch_format="pyarrow"),
                        ["node"], {"ps": "sum_support", "pd": "degree"},
                        num_buckets=num_buckets)

    def finish(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch.column("degree"), dtype=np.int64)
        ss = np.asarray(batch.column("sum_support"), dtype=np.int64)
        keep = d >= 2
        d, ss = d[keep], ss[keep]
        return pa.table({
            "node": pa.array(np.asarray(batch.column("node"),
                                        dtype=np.int64)[keep]),
            "degree": pa.array(d),
            "sum_support": pa.array(ss),
            "clustering": pa.array(ss.astype(np.float64) / (d * (d - 1)))})

    return sums.map_batches(finish, batch_format="pyarrow")
