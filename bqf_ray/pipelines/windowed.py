"""Windowed aggregates over the events stream table.

Ray Data is a (streaming-)batch engine with no event-time watermarks; the
events table is treated as a partitioned log (ray_guide
'Streaming-shaped workloads').  Tumbling windows are a pure groupby on the
window start; sliding windows fan each event out to the windows containing
it inside ``map_batches`` (vectorized) before the same groupby; session
windows sort per user inside ``groupby(user).map_groups``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _window_start_us(ts_us: np.ndarray, size_s: int) -> np.ndarray:
    size_us = np.int64(size_s) * 1_000_000
    return (ts_us // size_us) * size_us


def tumbling_window(ds, size_s: int = 3600, ts_col: str = "ts",
                    key_col: str = "event_type", value_col: str = "value"):
    """Per (window_start, key): count + sum(value).  One shuffle, with
    per-batch pre-aggregation so only partials move."""

    def pre(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch.column(ts_col)).astype("datetime64[us]").astype(np.int64)
        ws = _window_start_us(ts, size_s)
        # micro-unit integer accumulation → order-independent float result
        mv = np.floor(np.asarray(batch.column(value_col)) * 1_000_000 + 0.5
                      ).astype(np.int64)
        t = pa.table({
            "window_start": pa.array(ws),
            key_col: batch.column(key_col),
            "n": pa.array(np.ones(len(batch), dtype=np.int64)),
            "mv": pa.array(mv),
        })
        return t.group_by(["window_start", key_col]).aggregate(
            [("n", "sum"), ("mv", "sum")]).rename_columns(
            ["window_start", key_col, "n", "mv"])

    def final(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "window_start": group.column("window_start").slice(0, 1),
            key_col: group.column(key_col).slice(0, 1),
            "n_events": pa.array([pc.sum(group.column("n")).as_py()], pa.int64()),
            "sum_value": pa.array(
                [pc.sum(group.column("mv")).as_py() / 1_000_000.0],
                pa.float64()),
        })

    out = (ds.map_batches(pre, batch_format="pyarrow")
           .groupby(["window_start", key_col])
           .map_groups(final, batch_format="pyarrow"))

    def to_ts(batch: pa.Table) -> pa.Table:
        ws = np.asarray(batch.column("window_start"), dtype=np.int64)
        return batch.set_column(0, "window_start",
                                pa.array(ws.astype("datetime64[us]")))

    return out.map_batches(to_ts, batch_format="pyarrow")


def sliding_window(ds, size_s: int = 3600, slide_s: int = 900,
                   ts_col: str = "ts", key_col: str = "event_type",
                   value_col: str = "value"):
    """Sliding windows via vectorized fan-out: each event replicates to the
    ``size/slide`` windows covering it, then the tumbling plan runs on the
    expanded rows."""
    reps = int(np.ceil(size_s / slide_s))

    def expand(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch.column(ts_col)).astype("datetime64[us]").astype(np.int64)
        slide_us = np.int64(slide_s) * 1_000_000
        size_us = np.int64(size_s) * 1_000_000
        last = (ts // slide_us) * slide_us          # latest window containing ts
        offs = (np.arange(reps, dtype=np.int64) * slide_us)[None, :]
        starts = last[:, None] - offs               # candidate window starts
        valid = (starts + size_us > ts[:, None]) & (starts >= 0)
        ridx = np.repeat(np.arange(len(batch)), reps)[valid.reshape(-1)]
        ws = starts.reshape(-1)[valid.reshape(-1)]
        t = batch.take(pa.array(ridx))
        mv = np.floor(np.asarray(t.column(value_col)) * 1_000_000 + 0.5
                      ).astype(np.int64)
        return pa.table({
            "window_start": pa.array(ws),
            key_col: t.column(key_col),
            "n": pa.array(np.ones(len(ws), dtype=np.int64)),
            "mv": pa.array(mv),
        }).group_by(["window_start", key_col]).aggregate(
            [("n", "sum"), ("mv", "sum")]).rename_columns(
            ["window_start", key_col, "n", "mv"])

    def final(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "window_start": group.column("window_start").slice(0, 1),
            key_col: group.column(key_col).slice(0, 1),
            "n_events": pa.array([pc.sum(group.column("n")).as_py()], pa.int64()),
            "sum_value": pa.array(
                [pc.sum(group.column("mv")).as_py() / 1_000_000.0],
                pa.float64()),
        })

    out = (ds.map_batches(expand, batch_format="pyarrow")
           .groupby(["window_start", key_col])
           .map_groups(final, batch_format="pyarrow"))

    def to_ts(batch: pa.Table) -> pa.Table:
        ws = np.asarray(batch.column("window_start"), dtype=np.int64)
        return batch.set_column(0, "window_start",
                                pa.array(ws.astype("datetime64[us]")))

    return out.map_batches(to_ts, batch_format="pyarrow")


def windowed_distinct(ds, size_s: int = 3600, ts_col: str = "ts",
                      key_col: str = "event_type", id_col: str = "user_id",
                      exact: bool = True, hll_p: int = 12):
    """Distinct ids per (window, key) — exact (pre-distinct per batch, one
    native groupby) or HLL-approximate (one sketch per (window, key) built
    from per-batch partials merged in a second tiny groupby; the shuffle
    carries sketch blobs, not ids — the mergeable-UDAF win at scale)."""
    from ray.data.aggregate import Count

    if exact:
        def pre(batch: pa.Table) -> pa.Table:
            ts = np.asarray(batch.column(ts_col)).astype("datetime64[us]").astype(np.int64)
            ws = _window_start_us(ts, size_s)
            t = pa.table({"window_start": pa.array(ws),
                          key_col: batch.column(key_col),
                          id_col: batch.column(id_col)})
            return (t.group_by(["window_start", key_col, id_col])
                    .aggregate([]))

        distinct = (ds.map_batches(pre, batch_format="pyarrow")
                    .groupby(["window_start", key_col, id_col])
                    .aggregate(Count(alias_name="__c")))

        def count_ids(batch: pa.Table) -> pa.Table:
            t = pa.table({"window_start": batch.column("window_start"),
                          key_col: batch.column(key_col),
                          "n": pa.array(np.ones(len(batch), dtype=np.int64))})
            return t.group_by(["window_start", key_col]).aggregate(
                [("n", "sum")]).rename_columns(
                ["window_start", key_col, "n"])

        def final(group: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.table({
                "window_start": group.column("window_start").slice(0, 1),
                key_col: group.column(key_col).slice(0, 1),
                "n_distinct": pa.array(
                    [pc.sum(group.column("n")).as_py()], pa.int64()),
            })

        out = (distinct.map_batches(count_ids, batch_format="pyarrow")
               .groupby(["window_start", key_col])
               .map_groups(final, batch_format="pyarrow"))
    else:
        from bqf_ray.functions.hashing import fmix64
        from bqf_ray.sketches.base import MergeableSketch
        from bqf_ray.sketches.hll import HyperLogLog

        def partials(batch: pa.Table) -> pa.Table:
            import pandas as pd
            ts = np.asarray(batch.column(ts_col)).astype("datetime64[us]").astype(np.int64)
            ws = _window_start_us(ts, size_s)
            keys = batch.column(key_col).to_pylist()
            ids = fmix64(np.asarray(batch.column(id_col)).astype(np.uint64))
            df = pd.DataFrame({"w": ws, "k": keys})
            rows_w, rows_k, rows_b = [], [], []
            for (w, k), idx in df.groupby(["w", "k"]).groups.items():
                h = HyperLogLog(p=hll_p)
                h.update_batch(ids[np.asarray(idx)])
                rows_w.append(w)
                rows_k.append(k)
                rows_b.append(h.to_bytes())
            return pa.table({"window_start": pa.array(rows_w, pa.int64()),
                             key_col: pa.array(rows_k, pa.string()),
                             "blob": pa.array(rows_b, pa.binary())})

        def merge_final(group: pa.Table) -> pa.Table:
            blobs = group.column("blob").to_pylist()
            sk = MergeableSketch.from_bytes(blobs[0])
            sk.merge_many([MergeableSketch.from_bytes(b) for b in blobs[1:]])
            return pa.table({
                "window_start": group.column("window_start").slice(0, 1),
                key_col: group.column(key_col).slice(0, 1),
                "n_distinct_est": pa.array([float(sk.estimate())],
                                           pa.float64()),
            })

        out = (ds.map_batches(partials, batch_format="pyarrow")
               .groupby(["window_start", key_col])
               .map_groups(merge_final, batch_format="pyarrow"))

    def to_ts(batch: pa.Table) -> pa.Table:
        ws = np.asarray(batch.column("window_start"), dtype=np.int64)
        return batch.set_column(0, "window_start",
                                pa.array(ws.astype("datetime64[us]")))

    return out.map_batches(to_ts, batch_format="pyarrow")


def session_windows(ds, gap_s: int = 1800, ts_col: str = "ts",
                    user_col: str = "user_id", value_col: str = "value"):
    """Per-user session windows (gap-based): one shuffle on user, per-group
    sort + gap split in pandas.  Output: (user_id, session_start,
    session_end, n_events, sum_value)."""
    import pandas as pd

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(ts_col)
        ts = g[ts_col].astype("datetime64[us]")
        gap = ts.diff().dt.total_seconds().fillna(np.inf)
        sid = (gap > gap_s).cumsum()
        agg = g.groupby(sid).agg(
            session_start=(ts_col, "min"), session_end=(ts_col, "max"),
            n_events=(value_col, "size"), sum_value=(value_col, "sum"))
        agg[user_col] = g[user_col].iloc[0]
        return agg.reset_index(drop=True)[
            [user_col, "session_start", "session_end", "n_events", "sum_value"]]

    return ds.groupby(user_col).map_groups(sessions, batch_format="pandas")
