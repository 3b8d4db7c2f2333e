"""Deterministic sampling / splitting / mixture rebalancing."""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from bqf_ray.functions.hashing import md5_hash64_array, xxhash64_array
from bqf_ray.pipelines.sampling import (hash_sample, rebalance_mixture,
                                        split_dataset, stratified_sample)

TWO64 = 1 << 64


def _docs_tbl(n=2000, seed=3):
    rng = np.random.RandomState(seed)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array(rng.choice(["en", "fr", "de"], n,
                                    p=[0.6, 0.3, 0.1])),
        "text": pa.array([f"text {i}" for i in range(n)])})


def _u(ids, salt="", algo="xxh64"):
    keys = pc.cast(pa.array(ids), pa.string())
    if salt:
        keys = pc.binary_join_element_wise(keys, salt, "")
    return (md5_hash64_array if algo == "md5" else xxhash64_array)(keys)


@pytest.mark.parametrize("algo", ["xxh64", "md5"])
def test_hash_sample_matches_manual(ray_session, algo):
    import ray
    t = _docs_tbl()
    ds = ray.data.from_arrow(t).repartition(4)
    rate = 0.3
    got = sorted(hash_sample(ds, rate, salt="s1", algo=algo)
                 .to_pandas()["doc_id"])
    u = _u(t.column("doc_id"), salt="s1", algo=algo)
    want = sorted(np.asarray(t.column("doc_id"))[
        u < np.uint64(int(rate * TWO64))].tolist())
    assert got == want
    assert 0.2 < len(got) / len(t) < 0.4


def test_hash_sample_edges(ray_session):
    import ray
    ds = ray.data.from_arrow(_docs_tbl(100))
    assert hash_sample(ds, 1.0).count() == 100
    assert hash_sample(ds, 0.0).count() == 0
    with pytest.raises(ValueError):
        hash_sample(ds, 1.5)


def test_stratified_sample_rates(ray_session):
    import ray
    t = _docs_tbl()
    ds = ray.data.from_arrow(t).repartition(4)
    rates = {"en": 0.1, "fr": 0.9}      # de falls to default 0.0
    out = stratified_sample(ds, rates, strat_col="lang").to_pandas()
    u = _u(t.column("doc_id"))
    lang = np.asarray(t.column("lang"))
    want = set()
    for i, (uu, lg) in enumerate(zip(u, lang)):
        thr = int(rates.get(lg, 0.0) * TWO64)
        if int(uu) < thr:
            want.add(i)
    assert set(out["doc_id"]) == want
    assert (out["lang"] != "de").all()


def test_split_dataset_partition_and_determinism(ray_session):
    import ray
    t = _docs_tbl(5000)
    ds = ray.data.from_arrow(t).repartition(4)
    w = {"train": 0.8, "valid": 0.1, "test": 0.1}
    a = split_dataset(ds, w, salt="v1").to_pandas().sort_values("doc_id")
    b = split_dataset(ds, w, salt="v1").to_pandas().sort_values("doc_id")
    assert (a["split"].values == b["split"].values).all()
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03
    assert set(a["split"]) == set(w)
    assert len(a) == 5000                     # every row assigned once
    c = split_dataset(ds, w, salt="v2").to_pandas().sort_values("doc_id")
    assert (a["split"].values != c["split"].values).any()  # salt matters


def test_rebalance_mixture_counts_and_copies(ray_session):
    import ray
    t = _docs_tbl(3000)
    ds = ray.data.from_arrow(t).repartition(5)
    target = {"en": 0.5, "de": 0.5}     # upsample rare de, drop fr
    out = rebalance_mixture(ds, target, strat_col="lang").to_pandas()
    assert (out["lang"] != "fr").all()
    lang = np.asarray(t.column("lang"))
    n = {lg: int((lang == lg).sum()) for lg in ["en", "de"]}
    total = 3000
    u = _u(t.column("doc_id"))
    for lg in ["en", "de"]:
        r = 0.5 * total / n[lg]
        whole, fr = int(np.floor(r)), r - np.floor(r)
        ids = np.asarray(t.column("doc_id"))[lang == lg]
        uu = u[lang == lg]
        want = whole * len(ids) + int(
            (uu < np.uint64(int(min(fr, 1.0) * TWO64))).sum())
        assert int((out["lang"] == lg).sum()) == want
    # copy indexes are 0..k-1 per doc
    g = out.groupby("doc_id")["copy_idx"]
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.count()).all()
    # mixture is close to target among kept strata
    mix = out["lang"].value_counts(normalize=True)
    assert abs(mix["en"] - 0.5) < 0.02 and abs(mix["de"] - 0.5) < 0.02


def test_rebalance_total_rows_scaling(ray_session):
    import ray
    ds = ray.data.from_arrow(_docs_tbl(1000))
    out = rebalance_mixture(ds, {"en": 1.0}, strat_col="lang",
                            total_rows=5000).to_pandas()
    assert abs(len(out) - 5000) < 100


def _weighted_tbl(n=3000, seed=7):
    rng = np.random.RandomState(seed)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "source": pa.array(rng.choice(["a", "b", "c", "d"], n)),
        "w": pa.array(rng.exponential(100.0, n))})


def test_priority_sample_partition_invariant_and_exact(ray_session):
    """Same k-sample under any partitioning; when k >= n the estimator
    degenerates to the exact weights (tau = 0) and the subset-sum
    estimate is the exact total."""
    import ray

    from bqf_ray.pipelines.sampling import priority_sample
    t = _weighted_tbl()
    outs = []
    for parts in (1, 16):
        ds = ray.data.from_arrow(t).repartition(parts)
        outs.append(priority_sample(ds, "w", 50, key_col="doc_id",
                                    salt="s").to_pandas())
    assert outs[0].equals(outs[1])
    got = outs[0]
    # reference: numpy replay of the same md5 priorities
    u = (_u(np.arange(len(t)), salt="s", algo="md5").astype(np.float64)
         + 1.0) / TWO64
    w = np.asarray(t.column("w"), dtype=np.float64)
    pri = w / u
    order = np.lexsort((np.arange(len(t)), -pri))
    top = order[:50]
    tau = pri[order[50]]
    assert list(got["doc_id"]) == list(top)
    assert np.array_equal(got["est_weight"].to_numpy(),
                          np.maximum(w[top], tau))
    # k >= n: exact
    small = pa.table({"doc_id": pa.array(np.arange(10, dtype=np.int64)),
                      "w": pa.array(np.arange(1.0, 11.0))})
    ds = ray.data.from_arrow(small).repartition(3)
    full = priority_sample(ds, "w", 64, key_col="doc_id").to_pandas()
    assert len(full) == 10
    assert full["est_weight"].sum() == 55.0


def test_grouped_priority_sample_matches_pandas(ray_session):
    """Per-group sample + per-group tau estimator == a pandas replay."""
    import ray

    from bqf_ray.pipelines.sampling import grouped_priority_sample
    t = _weighted_tbl()
    got = (grouped_priority_sample(
               ray.data.from_arrow(t).repartition(16), "source", "w", 7,
               key_col="doc_id", salt="s")
           .to_pandas().sort_values(["source", "rk"])
           .reset_index(drop=True))
    import pandas as pd
    df = t.to_pandas()
    u = (_u(df["doc_id"].to_numpy(), salt="s", algo="md5")
         .astype(np.float64) + 1.0) / TWO64
    df["pri"] = df["w"] / u
    df = df.sort_values(["pri", "doc_id"], ascending=[False, True])
    df["rk"] = df.groupby("source").cumcount() + 1
    tau = (df[df["rk"] == 8].set_index("source")["pri"]
           .reindex(df["source"].unique()).fillna(0.0))
    keep = df[df["rk"] <= 7].copy()
    keep["est_weight"] = np.maximum(
        keep["w"].to_numpy(), tau.reindex(keep["source"]).to_numpy())
    keep = keep.sort_values(["source", "rk"]).reset_index(drop=True)
    assert list(got["doc_id"]) == list(keep["doc_id"])
    assert np.array_equal(got["est_weight"].to_numpy(),
                          keep["est_weight"].to_numpy())


def test_bootstrap_mean_ci_matches_brute_force_replay(ray_session):
    """The whole statistic is deterministic: a pandas replay of the
    same md5 replicate predicates reproduces mean/ci_lo/ci_hi
    bit-exactly, regardless of partitioning."""
    import pandas as pd
    import pyarrow as pa
    import ray

    from bqf_ray.pipelines.aggregates import bootstrap_mean_ci
    from bqf_ray.pipelines.sampling import _key_u64, _threshold

    rng = np.random.RandomState(8)
    n = 4000
    df = pd.DataFrame({
        "k": rng.choice(["x", "y"], size=n),
        "rid": np.arange(n, dtype=np.int64),
        "v": np.round(rng.gamma(3.0, 10.0, size=n), 2)})
    B, rate = 16, 0.5
    got = bootstrap_mean_ci(
        ray.data.from_pandas(df).repartition(7), "k", "v", "rid",
        n_reps=B, rate=rate, salt="t", lo_rank=2, hi_rank=15)

    thr = np.uint64(_threshold(rate))
    units = np.rint(df["v"].to_numpy() * 100).astype(np.int64)
    for _, row in got.iterrows():
        m = (df["k"] == row["k"]).to_numpy()
        assert row["n"] == m.sum()
        assert row["mean"] == float(units[m].sum()) / m.sum()
        means = []
        for b in range(B):
            u = _key_u64(pa.table({"rid": pa.array(df["rid"])}),
                         "rid", f"t{b}", "md5")
            keep = m & (u < thr)
            means.append(float(units[keep].sum()) / keep.sum())
        means.sort()
        assert row["ci_lo"] == means[1] and row["ci_hi"] == means[14]
        assert row["ci_lo"] <= row["mean"] <= row["ci_hi"]


def test_bootstrap_mean_ci_raises_on_sparse_key(ray_session):
    import pandas as pd
    import pytest
    import ray

    from bqf_ray.pipelines.aggregates import bootstrap_mean_ci
    df = pd.DataFrame({"k": ["solo"], "rid": [1], "v": [5.0]})
    with pytest.raises(ValueError, match="replicates non-empty"):
        bootstrap_mean_ci(ray.data.from_pandas(df), "k", "v", "rid",
                          n_reps=8, rate=0.5)
