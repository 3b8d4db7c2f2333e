"""profile_table — per-column n / null / exact distinct / min-max /
HLL bound flag."""
import numpy as np
import pyarrow as pa

from bqf_ray.pipelines.profile import profile_table


def _run(ray, rows, **kw):
    out = profile_table(ray.data.from_items(rows), **kw).take_all()
    return {r["col_name"]: r for r in out}


def test_profile_exact_stats(ray_session):
    import ray
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 50, size=1000)
    rows = [{"x": int(v), "s": f"v{v % 7}"} for v in vals]
    prof = _run(ray, rows)
    x = prof["x"]
    assert (x["n"], x["n_null"]) == (1000, 0)
    assert x["n_distinct"] == len(np.unique(vals))
    assert x["min_v"] == str(vals.min()) and x["max_v"] == str(vals.max())
    assert x["hll_ok"]
    s = prof["s"]
    assert s["n_distinct"] == 7
    assert s["min_v"] == "v0" and s["max_v"] == "v6"


def test_profile_numeric_min_not_string_order(ray_session):
    # "10" < "9" lexicographically — numeric columns must fold through
    # the real type across batch partials
    import ray
    rows = [{"x": v} for v in [9, 10, 1000, 2]] * 50
    prof = _run(ray, rows)
    assert prof["x"]["min_v"] == "2"
    assert prof["x"]["max_v"] == "1000"


def test_profile_nulls_and_all_null(ray_session):
    import ray
    rows = [{"a": (None if i % 3 == 0 else i), "b": None}
            for i in range(99)]
    prof = _run(ray, rows)
    a = prof["a"]
    assert a["n"] == 99 and a["n_null"] == 33
    assert a["n_distinct"] == 66          # nulls excluded, SQL semantics
    b = prof["b"]
    assert (b["n"], b["n_null"], b["n_distinct"]) == (99, 99, 0)
    assert b["min_v"] is None and b["max_v"] is None


def test_profile_column_subset_and_unknown(ray_session):
    import ray
    import pytest
    rows = [{"x": 1, "y": "a"}]
    ds = ray.data.from_items(rows)
    out = profile_table(ds, columns=["y"]).take_all()
    assert [r["col_name"] for r in out] == ["y"]
    with pytest.raises(ValueError):
        profile_table(ds, columns=["nope"])


def test_profile_hll_accuracy_large(ray_session):
    # 20k distinct values: p=12 rel error ~1.6%, must sit inside 10%
    import ray
    rows = [{"u": f"user-{i}"} for i in range(20_000)]
    prof = _run(ray, rows, columns=["u"])
    assert prof["u"]["n_distinct"] == 20_000
    assert prof["u"]["hll_ok"]


def test_profile_long_values_digest_exact(ray_session):
    # >64-byte values travel as 128-bit digests: distinct counts must
    # stay exact (regression: NUL-prefixed digests collapsed to '')
    import ray
    rows = [{"t": f"{'x' * 100} doc {i // 2}"} for i in range(400)]
    rows.append({"t": "short"})
    prof = _run(ray, rows, columns=["t"])
    assert prof["t"]["n_distinct"] == 201
    assert prof["t"]["min_v"].startswith("short") or \
        prof["t"]["min_v"].startswith("x")   # min/max fold raw strings
