"""KMV-sketch containment estimator: exact in the full-set regime,
internally exact (c, m) in the truncated regime, calibrated on planted
overlaps, robust on empty input."""
import numpy as np
import pyarrow as pa
import ray

from bqf_ray.pipelines.dedup import (containment_pairs,
                                     containment_pairs_kmv,
                                     _doc_shingles)


def _corpus(seed, n_docs=120, vocab=300, lo=8, hi=40):
    rng = np.random.default_rng(seed)
    texts, ids = [], []
    for i in range(n_docs):
        n = rng.integers(lo, hi)
        texts.append(" ".join(f"w{j}"
                              for j in rng.integers(0, vocab, n)))
        ids.append(i)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts)})


def test_full_set_regime_equals_exact(ray_session):
    tbl = _corpus(3)
    # plant contained docs (prefix halves) so pairs actually exist
    texts = tbl.column("text").to_pylist()
    ids = tbl.column("doc_id").to_pylist()
    for i in range(10):
        toks = texts[i].split()
        texts.append(" ".join(toks[:max(6, len(toks) // 2)]))
        ids.append(1000 + i)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    ds = ray.data.from_arrow(tbl).repartition(5)
    ex = containment_pairs(ds, threshold=0.5, s=3).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    km = containment_pairs_kmv(ds, threshold=0.5, s=3,
                               k=512).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert km["is_exact"].all()
    assert list(ex["doc_a"]) == list(km["doc_a"])
    assert list(ex["doc_b"]) == list(km["doc_b"])
    assert (ex["inter"].to_numpy() == km["inter"].to_numpy()).all()
    assert (ex["n_a"].to_numpy() == km["n_a"].to_numpy()).all()
    assert np.allclose(ex["containment"], km["containment"])
    assert (km["m"].to_numpy() == km["n_a"].to_numpy()).all()


def test_truncated_c_and_m_internally_exact(ray_session):
    """In the k-truncated regime every emitted (c, m) must equal the
    definition computed directly from the bottom-k sketches."""
    K = 8
    tbl = _corpus(7, n_docs=25, vocab=50, lo=15, hi=40)
    ds = ray.data.from_arrow(tbl).repartition(3)
    km = containment_pairs_kmv(ds, threshold=0.0, s=1,
                               k=K).to_pandas()
    t = _doc_shingles(tbl, "text", "doc_id", 1, seed=0)
    did = np.asarray(t.column("doc_id"))
    sh = np.asarray(t.column("shingle"), dtype=np.int64)
    sk = {}
    for d in np.unique(did):
        vu = np.sort(sh[did == d].view(np.uint64))
        sk[d] = (vu[:K], len(vu),
                 int(vu[K - 1]) if len(vu) > K
                 else int(np.uint64(0xFFFFFFFFFFFFFFFF)))
    assert len(km) > 50
    for r in km.itertuples():
        A, nA, tA = sk[r.doc_a]
        B, nB, tB = sk[r.doc_b]
        t_ = np.uint64(min(tA, tB))
        assert r.inter == len(np.intersect1d(A, B))
        assert r.m == int(np.searchsorted(A, t_, side="right"))
        assert r.n_a == nA
        assert r.is_exact == (nA <= K and nB <= K)
        assert abs(r.containment - r.inter / max(r.m, 1)) < 1e-12


def test_planted_overlap_calibration(ray_session):
    rng = np.random.default_rng(9)
    vocab = np.array([f"tok{i}" for i in range(20000)])
    texts, ids, bases = [], [], []
    for i in range(25):
        base = rng.choice(20000, 1200, replace=False)
        bases.append(base)
        texts.append(" ".join(vocab[base]))
        ids.append(i)
    for i in range(8):       # doc 100+i holds 70% of doc i + fresh
        take = rng.choice(bases[i], 840, replace=False)
        fresh = rng.choice(np.arange(20000, 24000), 360, replace=False)
        toks = np.concatenate([take, fresh])
        rng.shuffle(toks)
        texts.append(" ".join(f"tok{t}" for t in toks))
        ids.append(100 + i)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts)})).repartition(4)
    km = containment_pairs_kmv(ds, threshold=0.3, s=1,
                               k=256).to_pandas()
    assert not km["is_exact"].any()          # sets 1200 > k
    errs = [abs(r.containment - 0.7) for r in km.itertuples()
            if r.doc_a >= 100 and r.doc_b == r.doc_a - 100]
    assert len(errs) == 8                    # recall on planted pairs
    assert max(errs) < 0.15                  # ~5 sigma at m≈250


def test_empty_and_degenerate(ray_session):
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["", "one two"])})
    ds = ray.data.from_arrow(tbl)
    out = containment_pairs_kmv(ds, threshold=0.5, s=3, k=16)
    assert out.count() == 0


def test_partitioning_invariance(ray_session):
    """KMV containment output must not depend on input partitioning
    (per-doc sketches are batch-local and deterministic; candidate
    gen, prefilter and attach are partition-free)."""
    tbl = _corpus(13, n_docs=80, vocab=150, lo=10, hi=35)
    outs = []
    for parts in (1, 3, 9):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        df = containment_pairs_kmv(ds, threshold=0.2, s=2,
                                   k=16, min_m=4).to_pandas() \
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        outs.append(df)
    assert outs[0].equals(outs[1])
    assert outs[0].equals(outs[2])
    assert len(outs[0]) > 0
