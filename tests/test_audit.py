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
