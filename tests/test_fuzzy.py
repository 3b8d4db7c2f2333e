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
