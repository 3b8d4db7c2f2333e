"""Connected components + cluster-aware near-dup removal."""
import numpy as np
import pyarrow as pa
import pytest

from bqf_ray.pipelines.graph import connected_components, near_dup_removal


def _ref_components(edges):
    """Brute-force reference: repeated relaxation until fixpoint."""
    lab = {}
    for a, b in edges:
        lab.setdefault(a, a)
        lab.setdefault(b, b)
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            m = min(lab[a], lab[b])
            if lab[a] != m or lab[b] != m:
                lab[a] = lab[b] = m
                changed = True
    return lab


def _rand_edges(seed, n_nodes=400, n_edges=300):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, n_nodes, n_edges).astype(np.int64)
    b = rng.randint(0, n_nodes, n_edges).astype(np.int64)
    keep = a != b
    return a[keep], b[keep]


@pytest.mark.parametrize("mode", ["driver", "dist"])
@pytest.mark.parametrize("seed", [0, 1])
def test_components_match_reference(ray_session, mode, seed):
    import ray
    a, b = _rand_edges(seed)
    want = _ref_components(list(zip(a.tolist(), b.tolist())))
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array(a), "doc_b": pa.array(b)})).repartition(5)
    got = connected_components(pairs, mode=mode).to_pandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert want[int(r["doc_id"])] == int(r["cluster_id"])


def test_components_long_chain_dist(ray_session):
    """A 64-node path graph forces many propagation rounds — the worst
    case for min-label propagation (diameter = n-1)."""
    import ray
    n = 64
    a = np.arange(n - 1, dtype=np.int64) + 1   # edges (i+1, i): min flows up
    b = np.arange(n - 1, dtype=np.int64)
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array(a), "doc_b": pa.array(b)})).repartition(4)
    got = connected_components(pairs, mode="dist").to_pandas()
    assert len(got) == n
    assert (got["cluster_id"] == 0).all()


def test_components_empty_and_selfcontained(ray_session):
    import ray
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64())}))
    got = connected_components(pairs, mode="auto").to_pandas()
    assert len(got) == 0


@pytest.mark.parametrize("cc_mode", ["driver", "dist"])
def test_near_dup_removal(ray_session, cc_mode):
    """Clusters {1,3,7} and {2,9}; docs 0,4,5,6,8 untouched → survivors
    keep min-id per cluster."""
    import ray
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(10, dtype=np.int64)),
        "text": pa.array([f"doc {i}" for i in range(10)])}))
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([1, 3, 9], pa.int64()),
        "doc_b": pa.array([3, 7, 2], pa.int64())}))
    out = near_dup_removal(docs, pairs, cc_mode=cc_mode).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 1, 2, 4, 5, 6, 8]
    assert set(out.columns) == {"doc_id", "text"}


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------

def _brute_triangles(pairs):
    es = set()
    for x, y in pairs:
        if x != y:
            es.add((min(x, y), max(x, y)))
    tri = 0
    esl = sorted(es)
    for i, (a, b) in enumerate(esl):
        for (c, d) in esl[i + 1:]:
            if c == a and (min(b, d), max(b, d)) in es:
                tri += 1
    return len(es), tri


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("mode", ["broadcast", "bucketed"])
def test_triangle_count_matches_brute_force(ray_session, seed, mode):
    import ray

    from bqf_ray.pipelines.graph import triangle_count
    rng = np.random.RandomState(seed)
    E = rng.randint(0, 50, (600, 2)).astype(np.int64)
    t = pa.table({"a": pa.array(E[:, 0]), "b": pa.array(E[:, 1])})
    n_e, n_t = _brute_triangles(E)
    for parts, buckets in ((2, 4), (16, 32)):
        got = triangle_count(ray.data.from_arrow(t).repartition(parts),
                             "a", "b", num_buckets=buckets,
                             mode=mode).to_pydict()
        assert got["n_edges"] == [n_e]
        assert got["n_triangles"] == [n_t]


def test_triangle_count_edge_cases(ray_session):
    import ray

    from bqf_ray.pipelines.graph import triangle_count
    # self-loops + duplicate and reversed edges; a single triangle
    t = pa.table({"a": pa.array([1, 2, 3, 3, 1, 7], type=pa.int64()),
                  "b": pa.array([2, 3, 1, 1, 2, 7], type=pa.int64())})
    got = triangle_count(ray.data.from_arrow(t), "a", "b").to_pydict()
    assert got == {"n_edges": [3], "n_wedges": [1], "n_triangles": [1]}
    # no triangles
    path = pa.table({"a": pa.array([1, 2, 3], type=pa.int64()),
                     "b": pa.array([2, 3, 4], type=pa.int64())})
    got = triangle_count(ray.data.from_arrow(path), "a", "b").to_pydict()
    assert got["n_triangles"] == [0]


def test_cooccurrence_edges_matches_reference(ray_session):
    import ray

    from bqf_ray.pipelines.graph import cooccurrence_edges
    rng = np.random.RandomState(3)
    g = rng.randint(0, 40, 500).astype(np.int64)
    i = rng.randint(0, 30, 500).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"grp": pa.array(g),
                                       "item": pa.array(i)}))
    got = cooccurrence_edges(ds.repartition(8), "grp", "item").to_pandas()
    # reference: per group distinct items, all unordered pairs (multiset
    # across groups)
    import itertools
    exp = []
    for gv in np.unique(g):
        items = sorted(set(i[g == gv]))
        exp.extend((a, b) for a, b in itertools.combinations(items, 2))
    got_pairs = sorted(zip(got["a"], got["b"]))
    assert got_pairs == sorted(exp)


@pytest.mark.parametrize("mode", ["broadcast", "bucketed"])
def test_degree_assortativity_matches_reference(ray_session, mode):
    import ray

    from bqf_ray.pipelines.graph import degree_assortativity
    rng = np.random.RandomState(5)
    E = rng.randint(0, 40, (400, 2)).astype(np.int64)
    t = pa.table({"a": pa.array(E[:, 0]), "b": pa.array(E[:, 1])})
    got = degree_assortativity(ray.data.from_arrow(t).repartition(8),
                               "a", "b", mode=mode).to_pydict()
    es = sorted({(min(x, y), max(x, y)) for x, y in E if x != y})
    from collections import Counter
    deg = Counter()
    for a, b in es:
        deg[a] += 1
        deg[b] += 1
    m2 = 2 * len(es)
    s1 = sum(deg[a] + deg[b] for a, b in es)
    s2 = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in es)
    s11 = sum(2 * deg[a] * deg[b] for a, b in es)
    assert got == {"m2": [m2], "s1": [s1], "s2": [s2], "s11": [s11]}
    # derived r must be a valid correlation
    r = (m2 * s11 - s1 ** 2) / (m2 * s2 - s1 ** 2)
    assert -1.0 <= r <= 1.0


def test_butterfly_count_matches_reference(ray_session):
    import ray

    from bqf_ray.pipelines.graph import butterfly_count
    rng = np.random.RandomState(6)
    g = rng.randint(0, 30, 600).astype(np.int64)
    i = rng.randint(0, 25, 600).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"grp": pa.array(g),
                                       "item": pa.array(i)}))
    got = butterfly_count(ds.repartition(8), "grp", "item").to_pydict()
    from collections import Counter
    per_group = {}
    for gv, iv in zip(g, i):
        per_group.setdefault(gv, set()).add(iv)
    pc = Counter()
    import itertools
    for items in per_group.values():
        for a, b in itertools.combinations(sorted(items), 2):
            pc[(a, b)] += 1
    exp_bf = sum(c * (c - 1) // 2 for c in pc.values())
    assert got == {"n_item_pairs": [len(pc)], "n_butterflies": [exp_bf]}


# ---------------------------------------------------------------------------
# frequent itemsets
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["broadcast", "bucketed"])
def test_frequent_itemsets_matches_brute_force(ray_session, mode):
    import itertools
    from collections import Counter

    import ray

    from bqf_ray.pipelines.graph import frequent_itemsets
    rng = np.random.RandomState(9)
    g = rng.randint(0, 60, 800).astype(np.int64)
    i = rng.randint(0, 25, 800).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"g": pa.array(g),
                                       "i": pa.array(i)})).repartition(6)
    got = frequent_itemsets(ds, "g", "i", min_support=3, num_buckets=8,
                            mode=mode).to_pandas()
    baskets = {gv: sorted(set(i[g == gv])) for gv in np.unique(g)}
    c_ab = Counter()
    c_i = Counter()
    for items in baskets.values():
        for it in items:
            c_i[it] += 1
        for a, b in itertools.combinations(items, 2):
            c_ab[(a, b)] += 1
    exp = sorted((a, b, c, c_i[a], c_i[b], len(baskets))
                 for (a, b), c in c_ab.items() if c >= 3)
    got_rows = sorted(zip(got["a"], got["b"], got["c_ab"], got["c_a"],
                          got["c_b"], got["n_groups"]))
    assert got_rows == exp


def test_association_rules_matches_brute_force(ray_session):
    import itertools
    from collections import Counter

    import ray

    from bqf_ray.pipelines.graph import association_rules
    rng = np.random.RandomState(4)
    g = rng.randint(0, 50, 700).astype(np.int64)
    i = rng.randint(0, 20, 700).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"g": pa.array(g),
                                       "i": pa.array(i)})).repartition(5)
    got = association_rules(ds, "g", "i", min_support=3,
                            min_conf=0.25, num_buckets=8).to_pandas()
    baskets = {gv: sorted(set(i[g == gv])) for gv in np.unique(g)}
    c_ab = Counter()
    c_i = Counter()
    for items in baskets.values():
        for it in items:
            c_i[it] += 1
        for a, b in itertools.combinations(items, 2):
            c_ab[(a, b)] += 1
    n = len(baskets)
    exp = []
    for (a, b), c in c_ab.items():
        if c < 3:
            continue
        for ante, cons in ((a, b), (b, a)):
            conf = c / c_i[ante]
            if conf >= 0.25:
                exp.append((ante, cons, c, c_i[ante], c_i[cons], n,
                            conf, (c * n) / (c_i[ante] * c_i[cons])))
    got_rows = sorted(zip(got["antecedent"], got["consequent"], got["c_ab"],
                          got["c_ante"], got["c_cons"], got["n_groups"],
                          got["confidence"], got["lift"]))
    assert got_rows == sorted(exp)         # floats bit-exact: same IEEE exprs


def _brute_kcore(edges: set[tuple[int, int]], k: int):
    """Sequential synchronous peel to convergence; returns
    {node: in_core_degree} (nodes with >=1 in-core edge)."""
    alive = {v for e in edges for v in e}
    while True:
        deg = {}
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        nxt = {v for v, d in deg.items() if d >= k}
        if nxt == alive:
            return {v: deg[v] for v in alive if v in deg}
        alive = nxt
        if not alive:
            return {}


@pytest.mark.parametrize("seed,k", [(0, 2), (1, 3), (2, 4), (3, 2)])
def test_kcore_matches_brute_force(ray_session, seed, k):
    import ray

    from bqf_ray.pipelines.graph import kcore
    rng = np.random.default_rng(seed)
    n = 60
    m = 220
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    keep = a != b
    pairs = {(min(int(x), int(y)), max(int(x), int(y)))
             for x, y in zip(a[keep], b[keep])}
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], pa.int64()),
        "b": pa.array([p[1] for p in pairs], pa.int64())})).repartition(5)
    got = kcore(ds, k=k, rounds=64).to_pandas()
    want = _brute_kcore(pairs, k)
    assert dict(zip(got["node"], got["core_deg"])) == want


def test_kcore_fixed_rounds_match_sql_semantics(ray_session):
    """rounds=1 must equal ONE HAVING round (possibly not converged),
    with output degrees restricted to the survivors."""
    import ray

    from bqf_ray.pipelines.graph import kcore
    # path graph 0-1-2-3-4: one k=2 round peels endpoints (deg 1);
    # survivors {1,2,3} have in-core degrees 1,2,1 after ONE round.
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array([0, 1, 2, 3], pa.int64()),
        "b": pa.array([1, 2, 3, 4], pa.int64())}))
    got = kcore(ds, k=2, rounds=1).to_pandas()
    assert dict(zip(got["node"], got["core_deg"])) == {1: 1, 2: 2, 3: 1}
    # converged (empty) k=2 core once rounds run to fixpoint
    got2 = kcore(ds, k=2, rounds=8).to_pandas()
    assert len(got2) == 0


def test_path_ngram_counts_matches_pandas(ray_session):
    import pandas as pd
    import ray

    from bqf_ray.pipelines.graph import path_ngram_counts
    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 37, n),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(rng.integers(0, 1_000_000, n), unit="s"),
        "event_type": rng.choice(["a", "b", "c", "d"], n)})
    ds = ray.data.from_pandas(df).repartition(9)
    got = (path_ngram_counts(ds, n=3,
                             out_cols=["x", "y", "z"]).to_pandas()
           .sort_values(["x", "y", "z"]).reset_index(drop=True))
    s = df.sort_values(["user_id", "ts", "event_id"])
    same3 = (s["user_id"].values[:-2] == s["user_id"].values[2:])
    want = (pd.DataFrame({"x": s["event_type"].values[:-2][same3],
                          "y": s["event_type"].values[1:-1][same3],
                          "z": s["event_type"].values[2:][same3]})
            .groupby(["x", "y", "z"]).size().rename("n").reset_index())
    pd.testing.assert_frame_equal(
        got, want.sort_values(["x", "y", "z"]).reset_index(drop=True),
        check_dtype=False)


def _brute_lpa(pairs: set[tuple[int, int]], rounds: int):
    """Sequential synchronous LPA: max-count min-label neighbor vote."""
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v, nbrs in adj.items():
            cnt = {}
            for w in nbrs:
                cnt[labels[w]] = cnt.get(labels[w], 0) + 1
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == labels:
            break
        labels = new
    return labels


@pytest.mark.parametrize("seed,rounds", [(0, 1), (1, 3), (2, 5)])
def test_label_propagation_matches_brute_force(ray_session, seed, rounds):
    import ray

    from bqf_ray.pipelines.graph import label_propagation
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 50, 150)
    b = rng.integers(0, 50, 150)
    keep = a != b
    pairs = {(min(int(x), int(y)), max(int(x), int(y)))
             for x, y in zip(a[keep], b[keep])}
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], pa.int64()),
        "b": pa.array([p[1] for p in pairs], pa.int64())})).repartition(4)
    got = label_propagation(ds, rounds=rounds).to_pandas()
    want = _brute_lpa(pairs, rounds)
    assert dict(zip(got["node"], got["community"])) == want


def test_label_propagation_oscillation_is_fixed_round_exact(ray_session):
    """Synchronous LPA on a single edge oscillates (each endpoint
    adopts the other's label every round) — fixed-round semantics must
    reproduce the round-parity result exactly, not 'converge'."""
    import ray

    from bqf_ray.pipelines.graph import label_propagation
    ds = ray.data.from_arrow(pa.table({"a": pa.array([1], pa.int64()),
                                       "b": pa.array([2], pa.int64())}))
    r1 = label_propagation(ds, rounds=1).to_pandas()
    assert dict(zip(r1["node"], r1["community"])) == {1: 2, 2: 1}
    r2 = label_propagation(ds, rounds=2).to_pandas()
    assert dict(zip(r2["node"], r2["community"])) == {1: 1, 2: 2}


def test_transition_probs_matches_pandas(ray_session):
    import pandas as pd
    import ray

    from bqf_ray.pipelines.graph import transition_probs
    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 23, n),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(rng.integers(0, 500_000, n), unit="s"),
        "event_type": rng.choice(["x", "y", "z"], n)})
    ds = ray.data.from_pandas(df).repartition(6)
    got = (transition_probs(ds).to_pandas()
           .sort_values(["from_type", "to_type"]).reset_index(drop=True))
    s = df.sort_values(["user_id", "ts", "event_id"])
    same = s["user_id"].values[:-1] == s["user_id"].values[1:]
    ref = (pd.DataFrame({"from_type": s["event_type"].values[:-1][same],
                         "to_type": s["event_type"].values[1:][same]})
           .groupby(["from_type", "to_type"]).size().rename("n")
           .reset_index())
    ref["n_from"] = ref.groupby("from_type")["n"].transform("sum")
    ref["p"] = ref["n"].values.astype(np.float64) / ref["n_from"].values
    pd.testing.assert_frame_equal(
        got, ref.sort_values(["from_type", "to_type"])
        .reset_index(drop=True), check_dtype=False)
    assert np.allclose(got.groupby("from_type")["p"].sum(), 1.0)


def _ref_link_prediction(a, b, min_cn, max_degree=None):
    """Brute-force: neighbor sets, candidate = non-edge pair sharing
    >= min_cn neighbors (through non-hub centers when capped)."""
    edges = set()
    nbr = {}
    for x, y in zip(a.tolist(), b.tolist()):
        if x == y:
            continue
        edges.add((min(x, y), max(x, y)))
        nbr.setdefault(x, set()).add(y)
        nbr.setdefault(y, set()).add(x)
    deg = {v: len(s) for v, s in nbr.items()}
    from collections import Counter
    cn = Counter()
    for c, s in nbr.items():
        if max_degree is not None and len(s) > max_degree:
            continue
        ss = sorted(s)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                cn[(ss[i], ss[j])] += 1
    out = {}
    for (u, w), c in cn.items():
        if c >= min_cn and (u, w) not in edges:
            out[(u, w)] = (c, deg[u], deg[w],
                           float(c) / float(deg[u] + deg[w] - c))
    return out


@pytest.mark.parametrize("mode", ["broadcast", "bucketed"])
@pytest.mark.parametrize("seed,min_cn", [(0, 1), (1, 2), (2, 3)])
def test_link_prediction_matches_brute_force(ray_session, mode, seed,
                                             min_cn):
    import ray

    from bqf_ray.pipelines.graph import link_prediction
    a, b = _rand_edges(seed, n_nodes=60, n_edges=150)
    want = _ref_link_prediction(a, b, min_cn)
    ds = ray.data.from_arrow(pa.table({"a": pa.array(a),
                                       "b": pa.array(b)}))
    got = link_prediction(ds, min_cn=min_cn, num_buckets=7,
                          mode=mode).to_pandas()
    have = {(int(r.a), int(r.b)): (int(r.cn), int(r.deg_a),
                                   int(r.deg_b), float(r.jaccard))
            for r in got.itertuples()}
    assert have == want
    assert len(got) == len(got.drop_duplicates(["a", "b"]))


def test_link_prediction_max_degree_hub_cutoff(ray_session):
    import ray

    from bqf_ray.pipelines.graph import link_prediction
    # hub 0 -> 1..9 (deg 9, above the cutoff), plus 1-2, 10-1, 10-2:
    # leaf-leaf pairs through the hub vanish, but (0, 10) survives via
    # the small centers 1 and 2 (cn = 2)
    a = np.array([0] * 9 + [1, 10, 10], dtype=np.int64)
    b = np.array(list(range(1, 10)) + [2, 1, 2], dtype=np.int64)
    want = _ref_link_prediction(a, b, 1, max_degree=5)
    assert (0, 10) in want and want[(0, 10)][0] == 2  # test is non-vacuous
    assert all(u != 0 or w == 10 for (u, w) in want)  # hub wedges gone
    ds = ray.data.from_arrow(pa.table({"a": pa.array(a),
                                       "b": pa.array(b)}))
    got = link_prediction(ds, min_cn=1, max_degree=5,
                          num_buckets=3).to_pandas()
    have = {(int(r.a), int(r.b)): (int(r.cn), int(r.deg_a),
                                   int(r.deg_b), float(r.jaccard))
            for r in got.itertuples()}
    assert have == want


def test_link_prediction_min_cn_validation(ray_session):
    import ray

    from bqf_ray.pipelines.graph import link_prediction
    ds = ray.data.from_arrow(pa.table({"a": pa.array([1]),
                                       "b": pa.array([2])}))
    with pytest.raises(ValueError):
        link_prediction(ds, min_cn=0)


def test_clustering_coefficients_matches_brute_force(ray_session):
    import itertools

    import ray

    from bqf_ray.pipelines.graph import clustering_coefficients
    rng = np.random.RandomState(8)
    a = rng.randint(0, 40, 400).astype(np.int64)
    b = rng.randint(0, 40, 400).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    ds = ray.data.from_arrow(pa.table({"a": pa.array(a),
                                       "b": pa.array(b)})).repartition(4)
    got = (clustering_coefficients(ds, num_buckets=8).to_pandas()
           .sort_values("node").reset_index(drop=True))
    edges = {(min(x, y), max(x, y)) for x, y in zip(a, b)}
    adj = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    for _, row in got.iterrows():
        v = row["node"]
        nb = adj[v]
        d = len(nb)
        t = sum(1 for x, y in itertools.combinations(sorted(nb), 2)
                if (min(x, y), max(x, y)) in edges)
        assert d >= 2 and row["degree"] == d
        assert row["sum_support"] == 2 * t
        assert row["clustering"] == np.float64(2 * t) / (d * (d - 1))
    # every node with degree >= 2 present
    assert set(got["node"]) == {v for v in adj if len(adj[v]) >= 2}
