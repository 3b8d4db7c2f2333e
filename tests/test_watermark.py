"""watermark_scan: global strict-prefix running max + late flags."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from bqf_ray.pipelines.windowed import watermark_scan

EPOCH = np.datetime64("2024-01-01T00:00:00", "us")


def _ref(order, ts_us, late_us):
    idx = np.argsort(order)
    o, t = order[idx], ts_us[idx]
    wm = np.empty(len(t), dtype=np.int64)
    wm[0] = np.iinfo(np.int64).min
    if len(t) > 1:
        wm[1:] = np.maximum.accumulate(t[:-1])
    known = wm != np.iinfo(np.int64).min
    is_late = known & (t < np.where(known, wm, t) - late_us)
    return pd.DataFrame({
        "o": o, "t": t,
        "wm": np.where(known, wm, 0), "known": known,
        "is_late": is_late}).sort_values("o").reset_index(drop=True)


@pytest.mark.parametrize("cell_bits,buckets", [(3, 5), (20, 64), (0, 3)])
@pytest.mark.parametrize("seed", [0, 1])
def test_watermark_scan_matches_reference(ray_session, cell_bits,
                                          buckets, seed):
    import ray
    rng = np.random.RandomState(seed)
    n = 700
    order = rng.permutation(np.arange(n)).astype(np.int64) * 37
    ts_us = rng.randint(0, 10**7, n).astype(np.int64)
    late = 10**5
    tbl = pa.table({
        "seq": pa.array(order),
        "ts": pa.array((EPOCH + ts_us).astype("datetime64[us]"),
                       pa.timestamp("us"))})
    got = (watermark_scan(
        ray.data.from_arrow(tbl).repartition(6), "seq", "ts", late,
        cell_bits=cell_bits, num_buckets=buckets)
        .to_pandas().sort_values("seq").reset_index(drop=True))
    base = (EPOCH - np.datetime64(0, "us")).astype(np.int64)
    ref = _ref(order, ts_us + base, late)
    assert (got["seq"].to_numpy() == ref["o"].to_numpy()).all()
    assert (got["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            == ref["t"].to_numpy()).all()
    known = got["watermark"].notna().to_numpy()
    assert (known == ref["known"].to_numpy()).all()
    gw = got["watermark"].to_numpy().astype("datetime64[us]"
                                            ).astype(np.int64)
    assert (gw[known] == ref["wm"].to_numpy()[known]).all()
    assert (got["is_late"].to_numpy() == ref["is_late"].to_numpy()).all()
    assert got["is_late"].sum() > 0          # non-vacuous
    assert (~known).sum() == 1               # exactly the first row


def test_watermark_scan_duplicate_order_raises(ray_session):
    import ray
    tbl = pa.table({
        "seq": pa.array([1, 2, 2], pa.int64()),
        "ts": pa.array([EPOCH] * 3, pa.timestamp("us"))})
    with pytest.raises(Exception, match="duplicate"):
        watermark_scan(ray.data.from_arrow(tbl), "seq", "ts",
                       0).to_pandas()


def test_watermark_scan_in_order_stream_never_late(ray_session):
    import ray
    n = 100
    tbl = pa.table({
        "seq": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array((EPOCH + np.arange(n, dtype=np.int64) * 1000)
                       .astype("datetime64[us]"), pa.timestamp("us"))})
    got = watermark_scan(ray.data.from_arrow(tbl).repartition(4),
                         "seq", "ts", 0, cell_bits=4).to_pandas()
    assert not got["is_late"].any()
    assert got["watermark"].isna().sum() == 1


def test_ohlc_window_matches_pandas(ray_session):
    import pandas as pd
    import ray

    from bqf_ray.pipelines.windowed import ohlc_window
    rng = np.random.RandomState(3)
    n = 8000
    base = np.int64(1_700_000_000_000_000)
    ts = base + rng.randint(0, 3 * 86_400_000_000, n).astype(np.int64)
    df = pd.DataFrame({
        "ts": ts.astype("datetime64[us]"),
        "event_type": rng.choice(["a", "b", "c"], n),
        "event_id": np.arange(n, dtype=np.int64),
        "value": rng.randn(n)})
    got = (ohlc_window(ray.data.from_pandas(df).repartition(7),
                       size_s=21600).to_pandas()
           .sort_values(["window_start", "event_type"])
           .reset_index(drop=True))
    d = df.copy()
    d["w"] = ((d["ts"].astype("int64") // 21_600_000_000)
              * 21_600_000_000).astype("datetime64[us]")
    d = d.sort_values(["w", "event_type", "ts", "event_id"])
    ref = d.groupby(["w", "event_type"]).agg(
        open=("value", "first"), high=("value", "max"),
        low=("value", "min"), close=("value", "last"),
        n=("value", "size")).reset_index().rename(
        columns={"w": "window_start"})
    ref = ref.sort_values(["window_start", "event_type"]) \
        .reset_index(drop=True)
    assert got["window_start"].tolist() == ref["window_start"].tolist()
    assert got["event_type"].tolist() == ref["event_type"].tolist()
    for c in ("open", "high", "low", "close"):
        assert (got[c] == ref[c]).all(), c
    assert (got["n"] == ref["n"]).all()
