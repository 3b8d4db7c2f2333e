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
