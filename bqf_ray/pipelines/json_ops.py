"""Semi-structured (JSON) column extraction — the web-pipeline stage
that turns a string column of JSON payloads (event props, API blobs,
crawler metadata) into typed Arrow columns.

Vectorization trick: a batch's JSON strings are joined with newlines
into ONE buffer and parsed by ``pyarrow.json.read_json`` (Arrow's C++
NDJSON reader) — no Python-level ``json.loads`` loop.  JSON string
literals escape raw newlines, so the delimiter can never occur inside a
value and row alignment is exact.  Nulls / empty strings are
substituted with ``{}`` before the join and come back as all-null rows.

At 100 TB this is a pure per-batch map stage: zero shuffle, linear in
input bytes; the Arrow JSON reader is the same kernel a ``read_json``
datasource uses, so throughput matches native NDJSON ingest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _parse_ndjson(col: pa.ChunkedArray | pa.Array) -> pa.Table:
    """Parse a string column of JSON objects into one column-per-field
    table via the Arrow C++ NDJSON reader.  Row-aligned with the input
    (nulls/empties become all-null rows)."""
    from pyarrow import json as pj

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_null(col.type):          # all-null block
        col = col.cast(pa.string())
    safe = pc.coalesce(col, pa.scalar("{}", pa.string()))
    safe = pc.if_else(pc.equal(pc.utf8_trim_whitespace(safe), ""),
                      pa.scalar("{}", pa.string()), safe)
    # flat array -> one-element large_list -> C++ join (int64 offsets:
    # a multi-GB batch must not overflow int32)
    wrapped = pa.LargeListArray.from_arrays(
        pa.array([0, len(safe)], pa.int64()),
        safe.cast(pa.large_string()))
    # .as_buffer(): the joined large_string scalar's bytes feed the
    # reader zero-copy (an .as_py().encode() round-trip would allocate
    # two batch-sized temporaries — first-touch cost dominates on this
    # host, see BASELINE.md)
    payload = pc.binary_join(
        wrapped, pa.scalar("\n", pa.large_string()))[0]
    tbl = pj.read_json(
        pa.BufferReader(payload.as_buffer()),
        parse_options=pj.ParseOptions(newlines_in_values=False),
        read_options=pj.ReadOptions(use_threads=False))
    if tbl.num_rows != len(col):
        raise ValueError(
            f"JSON rows ({tbl.num_rows}) != input rows ({len(col)}): "
            "input contains non-object or multi-line JSON")
    return tbl


def _get_path(tbl: pa.Table, path: str) -> pa.Array:
    """Column for a dotted path ('a.b.c') into the parsed table;
    all-null if any component is missing."""
    parts = path.split(".")
    if parts[0] not in tbl.schema.names:
        return pa.nulls(tbl.num_rows)
    cur = tbl.column(parts[0])
    if isinstance(cur, pa.ChunkedArray):
        cur = cur.combine_chunks()
    for p in parts[1:]:
        if not pa.types.is_struct(cur.type) or cur.type.get_field_index(p) < 0:
            return pa.nulls(tbl.num_rows)
        cur = pc.struct_field(cur, p)
    return cur


def extract_json(ds, col: str = "props",
                 fields: dict[str, pa.DataType] | None = None,
                 prefix: str = "", drop_source: bool = False):
    """Append typed columns extracted from a JSON-string column.

    ``fields`` maps dotted JSON paths to Arrow types, e.g.
    ``{"k": pa.int64(), "meta.lang": pa.string()}`` → output columns
    ``k`` / ``meta.lang`` (dots kept; set ``prefix`` to namespace them).
    Missing paths yield nulls; values are cast (``safe=False`` mirrors
    SQL CAST so the DuckDB oracle agrees on e.g. float→int).
    """
    if not fields:
        raise ValueError("fields: at least one dotted path -> DataType")
    items = sorted(fields.items())

    def extract(batch: pa.Table) -> pa.Table:
        parsed = _parse_ndjson(batch.column(col))
        out = batch.drop_columns([col]) if drop_source else batch
        for path, typ in items:
            arr = _get_path(parsed, path)
            out = out.append_column(prefix + path, arr.cast(typ, safe=False))
        return out

    return ds.map_batches(extract, batch_format="pyarrow")


def json_rollup(ds, col: str = "props", field: str = "k",
                group_col: str = "event_type"):
    """Group-aggregate an integer JSON field: per ``group_col`` emit
    (n_events, n_null, total, avg_val).  The field is extracted as
    int64 so ``total`` is an exact integer sum and ``avg_val`` an exact
    integer ratio — deterministic under any shuffle/merge order (the
    repo's oracle float convention).  Per-batch pre-aggregation → one
    small groupby shuffle (the token_counts shape): group cardinality,
    not corpus size, bounds the exchange."""
    from ray.data.aggregate import Sum

    keyed = extract_json(ds.select_columns([group_col, col]),
                         col=col, fields={field: pa.int64()})

    def pre(batch: pa.Table) -> pa.Table:
        vals = batch.column(field)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        t = pa.table({
            group_col: batch.column(group_col),
            "n": np.ones(batch.num_rows, dtype=np.int64),
            "nv": np.asarray(pc.is_valid(vals), dtype=np.int64),
            "tot": np.asarray(vals.fill_null(0), dtype=np.int64),
        })
        return (t.group_by([group_col])
                .aggregate([("n", "sum"), ("nv", "sum"), ("tot", "sum")])
                .rename_columns([group_col, "pn", "pnv", "ptot"]))

    agg = (keyed.map_batches(pre, batch_format="pyarrow")
           .groupby(group_col)
           .aggregate(Sum("pn", alias_name="n_events"),
                      Sum("pnv", alias_name="n_valid"),
                      Sum("ptot", alias_name="total")))

    def finish(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch.column("n_events"), dtype=np.int64)
        nv = np.asarray(batch.column("n_valid"), dtype=np.int64)
        tot = np.asarray(batch.column("total"), dtype=np.int64)
        return pa.table({
            group_col: batch.column(group_col),
            "n_events": pa.array(n),
            "n_null": pa.array(n - nv),
            "total": pa.array(tot),
            "avg_val": pa.array(
                np.where(nv > 0, tot / np.maximum(nv, 1), 0.0), pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")
