"""Hypothesis property tests for the continuation-batch kernels:
lev_le1_mask vs DP reference, NTILE cuts vs SQL remainder semantics,
deletion-neighborhood completeness, histogram conservation."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from bqf_ray.pipelines.fuzzy import _deletion_keys, lev_le1_mask
from bqf_ray.pipelines.ranking import _ntile_cuts


def _lev(a: bytes, b: bytes) -> int:
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


short = st.text(alphabet="abz", min_size=0, max_size=7)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(short, short), min_size=1, max_size=30))
def test_lev_mask_matches_dp(pairs):
    A = [a for a, _ in pairs]
    B = [b for _, b in pairs]
    got = lev_le1_mask(pa.array(A, pa.string()), pa.array(B, pa.string()))
    ref = [_lev(a.encode(), b.encode()) <= 1 for a, b in pairs]
    assert got.tolist() == ref


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 10_000), st.integers(1, 64))
def test_ntile_cuts_sql_semantics(n, k):
    cuts = _ntile_cuts(n, k)
    sizes = np.diff(np.concatenate([[0], cuts]))
    assert sizes.sum() == n
    # SQL NTILE: first n%k tiles get ceil(n/k), the rest floor(n/k)
    base, rem = divmod(n, k)
    assert (sizes[:rem] == base + 1).all()
    assert (sizes[rem:] == base).all()
    assert (np.diff(sizes) <= 0).all()      # never increasing


@settings(max_examples=100, deadline=None)
@given(st.lists(short, min_size=2, max_size=25, unique=True))
def test_deletion_neighborhood_complete(vals):
    """Every true lev<=1 pair must share at least one neighborhood key —
    the blocking is complete (no false negatives by construction)."""
    arr = pa.array(vals, pa.string())
    rows, keys = _deletion_keys(arr, max_len=64)
    per_val = {}
    for r, kk in zip(rows, keys):
        per_val.setdefault(int(r), set()).add(int(kk))
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            if _lev(vals[i].encode(), vals[j].encode()) <= 1:
                assert per_val[i] & per_val[j], (vals[i], vals[j])
