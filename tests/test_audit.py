"""Audit operators: checksum order/partition invariance and sensitivity;
regex field extraction typing and null handling."""

import numpy as np
import pyarrow as pa
import pytest

from bqf_ray.pipelines.audit import dataset_checksum, extract_fields


@pytest.fixture(scope="module")
def tbl():
    rng = np.random.default_rng(2)
    n = 3000
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "s": pa.array([f"v{int(x)}" for x in rng.integers(0, 50, n)])})


def test_checksum_invariant_to_order_and_partitioning(ray_session, tbl):
    import ray
    a = dataset_checksum(ray.data.from_arrow(tbl), ["id", "s"]).take_all()
    perm = np.random.default_rng(3).permutation(len(tbl))
    shuffled = tbl.take(pa.array(perm))
    b = dataset_checksum(ray.data.from_arrow(shuffled).repartition(11),
                         ["id", "s"]).take_all()
    assert a == b


def test_checksum_detects_single_cell_change(ray_session, tbl):
    import ray
    a = dataset_checksum(ray.data.from_arrow(tbl), ["id", "s"]).take_all()
    tampered = tbl.set_column(1, "s", pa.array(
        ["X" if i == 1234 else v for i, v in enumerate(
            tbl.column("s").to_pylist())]))
    b = dataset_checksum(ray.data.from_arrow(tampered),
                         ["id", "s"]).take_all()
    assert a[0]["n_rows"] == b[0]["n_rows"]
    assert a[0]["checksum"] != b[0]["checksum"]


def test_checksum_encoding_unambiguous(ray_session):
    """Length-prefixed cells: separator injection and null-vs-literal
    cannot alias."""
    import ray
    # ('a\x1f', 'b') vs ('a', '\x1fb') — same concatenation without
    # length prefixes
    t1 = pa.table({"x": pa.array(["a\x1f"]), "y": pa.array(["b"])})
    t2 = pa.table({"x": pa.array(["a"]), "y": pa.array(["\x1fb"])})
    a = dataset_checksum(ray.data.from_arrow(t1), ["x", "y"]).take_all()
    b = dataset_checksum(ray.data.from_arrow(t2), ["x", "y"]).take_all()
    assert a[0]["checksum"] != b[0]["checksum"]
    # null is distinct from any literal, including 'N'
    t3 = pa.table({"s": pa.array(["a", None])})
    t4 = pa.table({"s": pa.array(["a", "N"])})
    c = dataset_checksum(ray.data.from_arrow(t3), ["s"]).take_all()
    d = dataset_checksum(ray.data.from_arrow(t4), ["s"]).take_all()
    assert c[0]["checksum"] != d[0]["checksum"]


def test_extract_fields_types_and_nulls(ray_session):
    import ray
    t = pa.table({"text": pa.array(["dur=15 code=200", "dur=7 code=500",
                                    "malformed", None])})
    out = extract_fields(
        ray.data.from_arrow(t),
        r"dur=(?P<dur>\d+) code=(?P<code>\d+)",
        {"dur": "int64", "code": "string"}).to_pandas()
    assert out["dur"].tolist()[:2] == [15, 7]
    assert out["code"].tolist()[:2] == ["200", "500"]
    assert out["dur"].isna().tolist() == [False, False, True, True]


def test_cli_checksum(ray_session, capsys):
    from bqf_ray import cli
    cli.main(["checksum", "-i", "/root/testdata/sf0.001/orders.parquet",
              "--cols", "o_orderkey,o_orderstatus"])
    out = capsys.readouterr().out
    assert "rows=1500 checksum=" in out


def test_table_diff_multiset(ray_session):
    import pandas as pd
    import ray
    from bqf_ray.pipelines.audit import table_diff
    rng = np.random.default_rng(31)
    # side A: random multiset; side B: A with planted edits
    a = pd.DataFrame({
        "k": rng.integers(0, 400, size=5000),
        "s": rng.choice(["x", "y", "z"], size=5000)})
    b = pd.concat([
        a.iloc[:-7],                             # 7 rows missing from B
        pd.DataFrame({"k": [10**6, 10**6], "s": ["new", "new"]}),
    ], ignore_index=True)
    out = table_diff(ray.data.from_pandas(a).repartition(5),
                     ray.data.from_pandas(b).repartition(3),
                     ["k", "s"]).to_pandas()
    ca = a.groupby(["k", "s"]).size()
    cb = b.groupby(["k", "s"]).size()
    expect = {}
    for key in set(ca.index) | set(cb.index):
        na, nb = int(ca.get(key, 0)), int(cb.get(key, 0))
        if na != nb:
            expect[key] = (na, nb)
    got = {(r["k"], r["s"]): (r["n_a"], r["n_b"])
           for _, r in out.iterrows()}
    assert got == expect
    # identical inputs → empty diff
    same = table_diff(ray.data.from_pandas(a), ray.data.from_pandas(a),
                      ["k", "s"]).to_pandas()
    assert len(same) == 0


def test_table_diff_nulls_and_types(ray_session):
    import ray
    from bqf_ray.pipelines.audit import table_diff
    ta = pa.table({"v": pa.array([1.5, None, None, 2.0])})
    tb = pa.table({"v": pa.array([1.5, None, 2.0, 2.0])})
    out = table_diff(ray.data.from_arrow(ta), ray.data.from_arrow(tb),
                     ["v"]).to_pandas()
    got = {(None if pd_isna(r["v"]) else r["v"]): (r["n_a"], r["n_b"])
           for _, r in out.iterrows()}
    assert got == {None: (2, 1), 2.0: (1, 2)}


def pd_isna(v):
    import pandas as pd
    return pd.isna(v)


def test_grouped_checksum_invariance_and_tamper(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from bqf_ray.pipelines.audit import grouped_checksum
    rng = np.random.default_rng(19)
    n = 3000
    k = rng.integers(0, 9, n)
    v = rng.integers(0, 1000, n)
    tbl = pa.table({"k": pa.array(k, pa.int64()),
                    "v": pa.array(v, pa.int64())})

    def run(t, parts):
        return grouped_checksum(ray.data.from_arrow(t)
                                .repartition(parts), "k", ["v"]) \
            .to_pandas().sort_values("k").reset_index(drop=True)

    a = run(tbl, 1)
    b = run(tbl, 8)
    assert a.equals(b)                       # partitioning-invariant
    perm = np.random.default_rng(1).permutation(n)
    c = run(tbl.take(pa.array(perm)), 5)
    assert a.equals(c)                       # order-invariant
    v2 = v.copy()
    v2[17] += 1
    d = run(pa.table({"k": pa.array(k, pa.int64()),
                      "v": pa.array(v2, pa.int64())}), 5)
    changed = a["checksum"] != d["checksum"]
    assert changed.sum() == 1                # only the tampered key
    assert a.loc[changed, "k"].iloc[0] == k[17]


def test_validate_rows_reasons_exact(ray_session):
    import pyarrow.compute as pc
    import ray

    from bqf_ray.pipelines.audit import validate_rows
    rng = np.random.default_rng(7)
    n = 2000
    q = rng.integers(1, 51, n)
    d = rng.integers(0, 11, n) / 100.0
    tbl = pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                    "q": pa.array(q, pa.int64()),
                    "d": pa.array(d, pa.float64())})
    rules = [
        ("bulk", lambda b: np.asarray(
            pc.greater_equal(b.column("q"), 45), dtype=bool)),
        ("deep", lambda b: np.asarray(
            pc.greater(b.column("d"), 0.08), dtype=bool)),
    ]
    out = validate_rows(ray.data.from_arrow(tbl).repartition(7),
                        rules, ["id"]).to_pandas()
    expect = {}
    for i in range(n):
        rs = [nm for nm, cond in (("bulk", q[i] >= 45),
                                  ("deep", d[i] > 0.08)) if cond]
        if rs:
            expect[i] = ",".join(rs)
    got = dict(zip(out["id"], out["reasons"]))
    assert got == expect
    with pytest.raises(ValueError):
        validate_rows(ray.data.from_arrow(tbl), [], ["id"])
    with pytest.raises(ValueError):
        validate_rows(ray.data.from_arrow(tbl),
                      [("a", rules[0][1]), ("a", rules[1][1])], ["id"])


def test_benford_digits_matches_bruteforce(ray_session):
    import ray

    from bqf_ray.pipelines.audit import benford_digits
    rng = np.random.default_rng(11)
    n = 5000
    v = np.exp(rng.uniform(0, 12, n))          # spans many magnitudes
    v[::97] = 0.0                               # excluded (non-positive)
    v[::101] = -3.5                             # excluded
    vals = pa.array(v, pa.float64())
    vals = pa.concat_arrays([vals.combine_chunks() if hasattr(
        vals, "combine_chunks") else vals, pa.array([None], pa.float64())])
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(9)
    out = benford_digits(ds, "v", scale=100).to_pandas() \
        .sort_values("digit").reset_index(drop=True)
    # brute force: half-even fixed-point, leading decimal digit
    cents = np.float64(v) * 100.0
    ints = np.asarray(
        pa.compute.round(pa.array(cents), ndigits=0,
                         round_mode="half_to_even").cast(pa.int64()))
    ints = ints[ints > 0]
    lead = np.array([int(str(x)[0]) for x in ints])
    cnt = np.bincount(lead, minlength=10)[1:10]
    assert list(out["digit"]) == list(range(1, 10))
    assert list(out["cnt"]) == list(cnt)
    assert out["n"].nunique() == 1 and out["n"][0] == cnt.sum()
    np.testing.assert_array_equal(
        out["share"].to_numpy(), cnt.astype(np.float64) / float(cnt.sum()))


# ---------------------------------------------------------------------------
# fd_discover
# ---------------------------------------------------------------------------

def _fd_brute(df, cols):
    import itertools
    rows = []
    for a, b in itertools.permutations(cols, 2):
        c = df.groupby([a, b], dropna=False).size().reset_index(name="n")
        per = c.groupby(a, dropna=False)["n"]
        s, mx, npair = per.sum(), per.max(), per.size()
        viol = int((s - mx).sum())
        rows.append((a, b, int(s.sum()), len(s), int(npair.sum()),
                     viol, int(viol == 0)))
    import pandas as pd
    return pd.DataFrame(rows, columns=["det_col", "dep_col", "n_total",
                                       "n_det", "n_pairs", "violations",
                                       "holds"])


def test_fd_discover_matches_brute(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from bqf_ray.pipelines.audit import fd_discover
    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame({
        "a": rng.integers(0, 8, n),
        "b": rng.choice(["x", "y", None], n),           # null dep/det
        "c": rng.integers(0, 8, n) * 10})               # c = f(a)? no
    df["d"] = df["a"] * 2                               # a -> d holds
    cols = ["a", "b", "c", "d"]
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    got = (fd_discover(ds, cols).to_pandas()
           .sort_values(["det_col", "dep_col"]).reset_index(drop=True))
    exp = (_fd_brute(df, cols)
           .sort_values(["det_col", "dep_col"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp,
                                  check_dtype=False)
    assert got.set_index(["det_col", "dep_col"])["holds"]["a", "d"] == 1


def test_fd_discover_validation():
    import pytest

    from bqf_ray.pipelines.audit import fd_discover
    with pytest.raises(ValueError, match="at least 2"):
        fd_discover(None, ["a"])
    with pytest.raises(ValueError, match="duplicate"):
        fd_discover(None, ["a", "a"])
    with pytest.raises(ValueError, match="ordered pairs"):
        fd_discover(None, list("abcdefg"))


def test_cli_curate_e2e(ray_session, capsys, tmp_path):
    import pyarrow.parquet as pq

    from bqf_ray import cli
    out_dir = str(tmp_path / "curated")
    cli.main(["curate", "-i", "/root/testdata/sf0.001/documents.parquet",
              "-o", out_dir, "--partitions", "4"])
    out = capsys.readouterr().out
    lines = dict(ln.split(": ") for ln in out.strip().splitlines()
                 if ": " in ln)
    assert int(lines["input"]) == 500
    assert (int(lines["input"]) >= int(lines["lang_quality"])
            >= int(lines["exact_dedup"]) >= int(lines["near_dedup"]) > 0)
    import glob
    files = glob.glob(f"{out_dir}/part=*/*.parquet")
    n_rows = sum(pq.read_metadata(f).num_rows for f in files)
    assert n_rows == int(lines["near_dedup"])


def test_chi2_cells_matches_scipy_shape(ray_session):
    """Per-cell terms sum to the classic chi² statistic (recomputed
    with pandas crosstab), marginals exact, null category kept."""
    import pandas as pd
    import ray

    from bqf_ray.pipelines.audit import chi2_cells
    rng = np.random.RandomState(4)
    n = 5000
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], n, p=[0.5, 0.3, 0.2]),
        "b": rng.choice(["u", "v"], n)})
    df.loc[:20, "b"] = None
    out = chi2_cells(ray.data.from_pandas(df).repartition(4),
                     "a", "b").to_pandas()
    ct = df.fillna("__null__").groupby(["a", "b"]).size()
    assert len(out) == len(ct)
    n_tot = out["n"].iloc[0]
    assert n_tot == n
    # exact marginals per cell
    for _, r in out.iterrows():
        akey = r["a"]
        bkey = r["b"] if r["b"] is not None else "__null__"
        assert r["o"] == ct[(akey, bkey)]
    # Σ term == chi² from expected counts
    exp_chi2 = 0.0
    for (ak, bk), o in ct.items():
        ra = ct.groupby(level=0).sum()[ak]
        cb = ct.groupby(level=1).sum()[bk]
        e = ra * cb / n
        exp_chi2 += (o - e) ** 2 / e
    assert abs(out["term"].sum() - exp_chi2) < 1e-6 * max(exp_chi2, 1)
