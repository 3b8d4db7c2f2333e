"""Fuzzy matching: lev_le1_mask vs a DP reference; edit1_pairs vs brute
force, including empty strings, unicode, and dedup-across-buckets."""

import numpy as np
import pyarrow as pa
import pytest

from bqf_ray.pipelines.fuzzy import edit1_pairs, lev_le1_mask


def _lev(a: str, b: str) -> int:
    a, b = a.encode(), b.encode()
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def test_mask_matches_dp_reference():
    import random
    random.seed(3)
    pool = ["".join(random.choices("abz", k=random.randint(0, 6)))
            for _ in range(300)]
    A = [random.choice(pool) for _ in range(4000)]
    B = [random.choice(pool) for _ in range(4000)]
    got = lev_le1_mask(pa.array(A), pa.array(B))
    ref = np.array([_lev(x, y) <= 1 for x, y in zip(A, B)])
    assert np.array_equal(got, ref)


def test_mask_edges():
    A = ["", "", "x", "abc", "abc", "abc", "héllo"]
    B = ["", "x", "", "abc", "abcd", "axc", "hello"]
    got = lev_le1_mask(pa.array(A), pa.array(B))
    # byte-level: 'é' is 2 bytes, so héllo→hello is one sub + one del = 2
    ref = [True, True, True, True, True, True, False]
    assert got.tolist() == ref


def _brute_pairs(vals):
    vals = sorted(set(vals))
    return sorted((a, b) for i, a in enumerate(vals)
                  for b in vals[i + 1:] if _lev(a, b) == 1)


def test_edit1_pairs_exact(ray_session):
    import random
    import ray
    random.seed(7)
    vals = ["".join(random.choices("abcd", k=random.randint(1, 8)))
            for _ in range(600)]
    vals += vals[:50]                       # duplicates must collapse
    vals += ["", "a"]                       # empty-string edge
    t = pa.table({"name": pa.array(vals)})
    ds = ray.data.from_arrow(t).repartition(8)
    got = edit1_pairs(ds, "name").to_pandas()
    got_pairs = sorted(zip(got["val_a"], got["val_b"]))
    assert got_pairs == _brute_pairs(vals)


def test_edit1_pairs_max_len_guard(ray_session):
    import ray
    t = pa.table({"name": pa.array(["short", "shore", "x" * 100,
                                    "x" * 101])})
    got = edit1_pairs(ray.data.from_arrow(t), "name", max_len=10).to_pandas()
    # the long strings are excluded entirely, not silently paired
    assert sorted(zip(got["val_a"], got["val_b"])) == [("shore", "short")]


def test_containment_planted_quote(ray_session):
    """A short doc fully contained in a long doc: containment 1.0 one
    way, low the other; Jaccard would miss it."""
    import ray
    from bqf_ray.pipelines.dedup import containment_pairs
    quote = "alpha beta gamma delta epsilon zeta"
    long_doc = ("intro words here " + quote +
                " and then a very long tail " +
                " ".join(f"w{i}" for i in range(80)))
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array([quote, long_doc])})
    ds = ray.data.from_arrow(t)
    out = (containment_pairs(ds, threshold=0.9, s=3).to_pandas()
           .set_index("doc_a"))
    assert 1 in out.index                  # quote ⊂ long doc
    assert out.loc[1, "containment"] == 1.0
    assert 2 not in out.index              # long doc not ⊂ quote


def test_containment_df_cap_lower_bound(ray_session):
    """df_cap drops hot shingles from the intersection only → capped
    containment never exceeds the exact one."""
    import ray
    from bqf_ray.pipelines.dedup import containment_pairs
    import random
    random.seed(2)
    base = " ".join(random.choices("abcdefgh", k=40))        # df=6: capped
    mids = [" ".join(f"m{p}_{j}" for j in range(10)) for p in range(3)]
    texts = [base + " " + mids[i // 2] + f" tail{i} x{i} y{i}"
             for i in range(6)]                              # mids: df=2
    t = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "text": pa.array(texts)})
    ds = ray.data.from_arrow(t)
    exact = (containment_pairs(ds, threshold=0.0, s=3).to_pandas()
             .set_index(["doc_a", "doc_b"])["containment"])
    capped = (containment_pairs(ds, threshold=0.0, s=3, df_cap=3)
              .to_pandas().set_index(["doc_a", "doc_b"])["containment"])
    assert len(capped) > 0                  # the df=2 mids still pair
    for k, v in capped.items():
        assert v <= exact[k] + 1e-12
    # the hot base is capped away: pairs across different mids vanish
    assert (0, 2) not in capped.index and (0, 2) in exact.index


def _brute_cosine_pairs(texts, threshold):
    """Exact float-free reference: Counter tf vectors + Python-int test."""
    from collections import Counter
    from fractions import Fraction
    fr = Fraction(str(threshold))
    tn, td = fr.numerator, fr.denominator
    tfs = [Counter(t.split()) for t in texts]
    n2 = [sum(v * v for v in c.values()) for c in tfs]
    out = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            dot = sum(v * tfs[b][k] for k, v in tfs[a].items())
            if dot and dot * dot * td * td >= tn * tn * n2[a] * n2[b]:
                out[(a, b)] = (dot, n2[a], n2[b])
    return out


def test_cosine_tf_pairs_matches_brute(ray_session):
    """Pairs + exact integer components match a Counter reference;
    partitioning-invariant; repeated terms matter (tf, not set)."""
    import ray
    from bqf_ray.pipelines.dedup import cosine_tf_pairs
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(40):
        k = rng.integers(5, 40)
        texts.append(" ".join(rng.choice(vocab, k)))
    texts.append(texts[0])                       # exact dup: cosine 1
    texts.append(texts[1] + " " + texts[1])      # doubled tfs: cosine 1
    want = _brute_cosine_pairs(texts, 0.8)
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    for parts in (1, 7):
        ds = ray.data.from_arrow(t).repartition(parts)
        got = cosine_tf_pairs(ds, threshold=0.8).to_pandas()
        pairs = {(a, b): (d, na, nb) for a, b, d, na, nb in
                 zip(got["doc_a"], got["doc_b"], got["dot"],
                     got["n2_a"], got["n2_b"])}
        assert pairs == want
    assert (0, 40) in want                       # the planted dup
    assert (1, 41) in want                       # tf-doubled dup


def test_cosine_tf_pairs_bigint_fallback(ray_session):
    """A tf large enough to overflow the int64 filter envelope routes
    through the exact big-int path and still matches the reference."""
    import ray
    from bqf_ray.pipelines.dedup import cosine_tf_pairs
    texts = ["hot " * 70000 + "x", "hot " * 69999 + "y", "cold only"]
    want = _brute_cosine_pairs(texts, 0.8)
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(texts)})
    got = cosine_tf_pairs(ray.data.from_arrow(t),
                          threshold=0.8).to_pandas()
    pairs = {(a, b): (d, na, nb) for a, b, d, na, nb in
             zip(got["doc_a"], got["doc_b"], got["dot"],
                 got["n2_a"], got["n2_b"])}
    assert pairs == want and (0, 1) in pairs


def test_cosine_tf_pairs_df_cap_lower_bound(ray_session):
    """df_cap drops a stop token from the dot product only — capped
    cosine is a conservative lower bound of the exact one."""
    import ray
    from bqf_ray.pipelines.dedup import cosine_tf_pairs
    texts = [f"the doc{i} unique{i} the the" for i in range(6)]
    texts += ["near dup pair one", "near dup pair two"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    ds = ray.data.from_arrow(t)
    exact = cosine_tf_pairs(ds, threshold=0.1).to_pandas()
    capped = cosine_tf_pairs(ds, threshold=0.1, df_cap=4).to_pandas()
    ek = {(a, b): c for a, b, c in
          zip(exact["doc_a"], exact["doc_b"], exact["cosine"])}
    ck = {(a, b): c for a, b, c in
          zip(capped["doc_a"], capped["doc_b"], capped["cosine"])}
    assert ck                                    # df=2 pair survives
    for k, v in ck.items():
        assert v <= ek[k] + 1e-12
    # 'the'-only overlaps vanish under the cap
    assert any(k not in ck for k in ek)
