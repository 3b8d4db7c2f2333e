"""transition_counts vs pandas LEAD; pagerank bit-determinism, mass
conservation, and ranking sanity on a hub graph."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from bqf_ray.pipelines.graph import pagerank, transition_counts


def test_transition_counts_matches_pandas(ray_session):
    import ray
    rng = np.random.default_rng(4)
    n = 4000
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.integers(0, 150, n).astype(np.int64)),
        "ts": pa.array(rng.integers(0, 10**9, n).astype("datetime64[us]")),
        "event_type": pa.array(rng.choice(["a", "b", "c"], n))})
    ds = ray.data.from_arrow(t).repartition(8)
    got = (transition_counts(ds).to_pandas()
           .sort_values(["from_type", "to_type"]).reset_index(drop=True))
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"],
                                   kind="mergesort")
    df["to_type"] = df.groupby("user_id")["event_type"].shift(-1)
    ref = (df.dropna(subset=["to_type"])
           .groupby(["event_type", "to_type"]).size().reset_index(name="n")
           .rename(columns={"event_type": "from_type"})
           .sort_values(["from_type", "to_type"]).reset_index(drop=True))
    assert got["from_type"].tolist() == ref["from_type"].tolist()
    assert got["to_type"].tolist() == ref["to_type"].tolist()
    assert got["n"].tolist() == ref["n"].tolist()


def test_pagerank_hub_and_invariance(ray_session):
    """Star graph: the hub must outrank every leaf; ranks are
    bit-identical across partitionings and conserve mass exactly."""
    import ray
    leaves = np.arange(1, 40, dtype=np.int64)
    s = np.concatenate([leaves, np.zeros(10, dtype=np.int64)])
    t = np.concatenate([np.zeros(len(leaves), dtype=np.int64),
                        leaves[:10]])
    tbl = pa.table({"src": pa.array(s), "dst": pa.array(t)})
    a = pagerank(ray.data.from_arrow(tbl).repartition(3),
                 "src", "dst", iters=8)
    b = pagerank(ray.data.from_arrow(tbl).repartition(9),
                 "src", "dst", iters=8)
    nodes, ranks, unit = a
    assert list(a[0]) == list(b[0])
    assert all(int(x) == int(y) for x, y in zip(a[1], b[1]))
    assert sum(int(x) for x in ranks) == len(nodes) * unit
    hub = int(ranks[list(nodes).index(0)])
    assert all(hub > int(r) for nd, r in zip(nodes, ranks) if nd != 0)


def _seq_pagerank(s, t, w, iters, d_num=17, d_den=20):
    """Independent sequential reference with the identical integer
    rules (weighted contributions, uniform exact respread)."""
    nn = np.unique(np.concatenate([s, t]))
    deg = np.zeros(len(nn), dtype=np.int64)
    si = np.searchsorted(nn, s)
    np.add.at(deg, si, w)
    w_max = max(int(w.max(initial=1)), 1)
    unit = min(1 << 40, (1 << 62) // (len(nn) * d_num * w_max))
    r = np.full(len(nn), unit, dtype=object)
    ti = np.searchsorted(nn, t)
    for _ in range(iters):
        rr = np.array([int(x) for x in r], dtype=np.int64)
        c = (rr[si] * d_num * w) // (d_den * deg[si])
        new = np.zeros(len(nn), dtype=object)
        for a, b in zip(ti, c):
            new[a] = int(new[a]) + int(b)
        leftover = len(nn) * unit - sum(int(x) for x in new)
        base, rem = divmod(leftover, len(nn))
        for p in range(len(nn)):
            new[p] = int(new[p]) + base + (1 if p < rem else 0)
        r = new
    return nn, r, unit


def test_pagerank_bit_equals_sequential(ray_session):
    import ray
    rng = np.random.default_rng(8)
    E = 2500
    s = rng.integers(0, 180, E).astype(np.int64)
    t = rng.integers(0, 180, E).astype(np.int64)
    w = rng.integers(1, 9, E).astype(np.int64)
    tbl = pa.table({"src": pa.array(s), "dst": pa.array(t),
                    "w": pa.array(w)})
    nodes, ranks, unit = pagerank(
        ray.data.from_arrow(tbl).repartition(7), "src", "dst",
        iters=6, weight_col="w")
    rn, rr, ru = _seq_pagerank(s, t, w, 6)
    assert list(nodes) == list(rn) and unit == ru
    assert all(int(a) == int(b) for a, b in zip(ranks, rr))


def test_pagerank_overflow_guard():
    """The auto-scaled unit keeps worker products under 2^62; a
    node-weight product too large to leave 2^20 precision must raise,
    not wrap."""
    from bqf_ray.pipelines.graph import pagerank as _pr  # signature only
    # direct check of the unit formula at the documented envelope
    n, d_num, w_max = 10 ** 8, 17, 1
    unit = min(1 << 40, (1 << 62) // (n * d_num * w_max))
    assert unit >= 1 << 20                    # 10^8 nodes still safe
    assert n * unit * d_num * w_max <= 1 << 62


def _seq_hits(s, t, rounds, scale_bits=20):
    """Sequential reference for graph.hits with identical integer
    arithmetic (np.add.at scatter instead of the distributed fold)."""
    nodes = np.unique(np.concatenate([s, t]))

    def half(vec, f, to):
        out = np.zeros(len(nodes), np.int64)
        np.add.at(out, np.searchsorted(nodes, to),
                  vec[np.searchsorted(nodes, f)])
        q = max(1, int(out.max()) >> scale_bits)
        return out // np.int64(q)

    hub = np.ones(len(nodes), np.int64)
    auth = np.zeros(len(nodes), np.int64)
    for _ in range(rounds):
        auth = half(hub, s, t)
        hub = half(auth, t, s)
    return nodes, hub, auth


def test_hits_bit_equals_sequential(ray_session):
    """Random directed multigraph (parallel edges included on purpose):
    distributed hits() is bit-identical to the sequential reference
    under two different partitionings."""
    import ray

    from bqf_ray.pipelines.graph import hits
    rng = np.random.default_rng(11)
    m = 5000
    s = rng.integers(0, 120, m).astype(np.int64)
    t = rng.integers(200, 290, m).astype(np.int64)
    tbl = pa.table({"src": pa.array(s), "dst": pa.array(t)})
    rn, rh, ra = _seq_hits(s, t, rounds=3)
    for parts in (3, 11):
        nodes, hub, auth = hits(ray.data.from_arrow(tbl).repartition(parts),
                                "src", "dst", rounds=3)
        assert list(nodes) == list(rn)
        assert list(hub) == list(rh)
        assert list(auth) == list(ra)


def test_hits_star_ranking(ray_session):
    """All sources point at node 0 plus one stray edge: node 0 must be
    the top authority, the multi-edge source the top hub; parallel
    edges each contribute (documented multigraph semantics)."""
    import ray

    from bqf_ray.pipelines.graph import hits
    s = np.array([1, 2, 3, 4, 4, 9], dtype=np.int64)
    t = np.array([0, 0, 0, 0, 0, 5], dtype=np.int64)
    nodes, hub, auth = hits(
        ray.data.from_arrow(pa.table({"src": pa.array(s),
                                      "dst": pa.array(t)})),
        "src", "dst", rounds=2)
    nl = list(nodes)
    assert auth[nl.index(0)] == max(auth)
    assert hub[nl.index(4)] == max(hub)          # two parallel edges
    assert hub[nl.index(4)] > hub[nl.index(1)]
    rn, rh, ra = _seq_hits(s, t, rounds=2)
    assert list(auth) == list(ra) and list(hub) == list(rh)


def test_hits_empty_and_degree_guard(ray_session):
    import ray

    from bqf_ray.pipelines.graph import hits
    empty = ray.data.from_arrow(pa.table({
        "src": pa.array([], type=pa.int64()),
        "dst": pa.array([], type=pa.int64())}))
    nodes, hub, auth = hits(empty, "src", "dst", rounds=2)
    assert len(nodes) == len(hub) == len(auth) == 0
    one = ray.data.from_arrow(pa.table({
        "src": pa.array([1], type=pa.int64()),
        "dst": pa.array([2], type=pa.int64())}))
    with pytest.raises(ValueError, match="degree"):
        hits(one, "src", "dst", rounds=1, scale_bits=61)


def _seq_ppr(s, t, w, seeds, iters, d_num=17, d_den=20):
    """Sequential PPR reference: restart + leftover respread over the
    seed set only (exact divmod, +1 to lowest seed positions)."""
    nn = np.unique(np.concatenate([s, t]))
    deg = np.zeros(len(nn), dtype=np.int64)
    si = np.searchsorted(nn, s)
    np.add.at(deg, si, w)
    w_max = max(int(w.max(initial=1)), 1)
    unit = min(1 << 40, (1 << 62) // (len(nn) * d_num * w_max))
    sp = np.searchsorted(nn, np.unique(seeds))
    r = np.zeros(len(nn), dtype=np.int64)
    base, rem = divmod(len(nn) * unit, len(sp))
    r[sp] = base
    r[sp[:rem]] += 1
    ti = np.searchsorted(nn, t)
    for _ in range(iters):
        c = (r[si] * d_num * w) // (d_den * deg[si])
        new = np.zeros(len(nn), dtype=np.int64)
        np.add.at(new, ti, c)
        leftover = len(nn) * unit - int(new.sum())
        base, rem = divmod(leftover, len(sp))
        new[sp] += base
        new[sp[:rem]] += 1
        r = new
    return nn, r, unit


def test_ppr_bit_equals_sequential_and_invariance(ray_session):
    import ray
    rng = np.random.default_rng(21)
    E = 2200
    s = rng.integers(0, 150, E).astype(np.int64)
    t = rng.integers(0, 150, E).astype(np.int64)
    w = rng.integers(1, 7, E).astype(np.int64)
    seeds = np.array([3, 77], dtype=np.int64)
    tbl = pa.table({"src": pa.array(s), "dst": pa.array(t),
                    "w": pa.array(w)})
    nodes, ranks, unit = pagerank(
        ray.data.from_arrow(tbl).repartition(6), "src", "dst",
        iters=5, weight_col="w", restart_nodes=seeds)
    rn, rr, ru = _seq_ppr(s, t, w, seeds, 5)
    assert list(nodes) == list(rn) and unit == ru
    np.testing.assert_array_equal(np.asarray(ranks, dtype=np.int64), rr)
    # mass conservation + partitioning invariance
    assert int(np.asarray(ranks, dtype=np.int64).sum()) \
        == len(nodes) * unit
    n2, r2, _ = pagerank(ray.data.from_arrow(tbl).repartition(13),
                         "src", "dst", iters=5, weight_col="w",
                         restart_nodes=seeds)
    np.testing.assert_array_equal(np.asarray(ranks, dtype=np.int64),
                                  np.asarray(r2, dtype=np.int64))


def test_ppr_rejects_absent_seed(ray_session):
    import ray
    import pytest as _pt
    tbl = pa.table({"src": pa.array([1, 2], pa.int64()),
                    "dst": pa.array([2, 3], pa.int64())})
    with _pt.raises(ValueError, match="absent"):
        pagerank(ray.data.from_arrow(tbl), "src", "dst", iters=2,
                 restart_nodes=np.array([99]))
