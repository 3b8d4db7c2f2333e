"""Data-quality / migration-audit operators.

``dataset_checksum`` — an ORDER-INDEPENDENT content checksum of selected
columns: per-row 64-bit digest (md5-derived, so any ANSI SQL engine can
recompute it), wrapping-summed per batch and reduced to one row.  Because
addition mod 2^63 is commutative, the checksum is invariant to row
order, partitioning, and execution plan — the cheap way to verify that a
copy / migration / rewrite preserved content at 100 TB without a sort or
a shuffle (partials are single integers per batch).

``extract_fields`` — vectorized RE2 named-group scraping of a text
column into typed columns (log parsing, scraping semi-structured text);
DuckDB's regexp_extract replays it exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MOD = 1 << 63


def dataset_checksum(ds, cols: list[str], sep: str = "\x1f"):
    """One-row Dataset ``(n_rows, checksum)``: checksum = Σ row_digest
    mod 2^63 where ``row_digest = md5_hash64(enc(col1) || sep ||
    enc(col2) ...)`` and ``enc(v) = length(v) || ':' || v`` (``'N'`` for
    null).  The length prefix makes cell boundaries unambiguous — values
    containing the separator byte cannot alias across columns, and null
    is distinct from every string.  Order/partitioning-invariant by
    construction."""
    from bqf_ray.functions.hashing import md5_hash64_array

    def pre(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"pn": pa.array([], pa.int64()),
                             "psum": pa.array([], pa.int64())})
        parts = []
        for c in cols:
            s = pc.cast(batch.column(c), pa.string())
            ln = pc.cast(pc.utf8_length(s), pa.string())
            enc = pc.binary_join_element_wise(ln, s, ":")
            parts.append(pc.fill_null(enc, "N"))
        joined = parts[0]
        for p in parts[1:]:
            joined = pc.binary_join_element_wise(joined, p, sep)
        h = md5_hash64_array(joined)
        total = int(h.astype(object).sum()) % _MOD   # python ints: no wrap
        return pa.table({"pn": pa.array([len(batch)], pa.int64()),
                         "psum": pa.array([total], pa.int64())})

    rows = ds.map_batches(pre, batch_format="pyarrow").take_all()
    n = sum(int(r["pn"]) for r in rows)
    s = sum(int(r["psum"]) for r in rows) % _MOD
    import ray
    return ray.data.from_arrow(pa.table({
        "n_rows": pa.array([n], pa.int64()),
        "checksum": pa.array([s], pa.int64())}))


def extract_fields(ds, pattern: str, fields: dict[str, str],
                   text_col: str = "text", keep: list[str] | None = None):
    """Scrape ``fields`` (name → arrow type name: 'string' | 'int64' |
    'float64') out of ``text_col`` with ONE vectorized RE2 pass.  The
    pattern must use named groups matching ``fields`` keys; rows that
    don't match yield nulls (SQL regexp_extract's '' → NULL via NULLIF).
    Stateless single pass."""
    types = {"string": pa.string(), "int64": pa.int64(),
             "float64": pa.float64()}

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col)
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        ex = pc.extract_regex(t, pattern)
        if isinstance(ex, pa.ChunkedArray):
            ex = ex.combine_chunks()
        # flatten() merges the parent (no-match) validity into children;
        # .field() would leave '' placeholders that break numeric casts
        flat = ex.flatten()
        names = [ex.type.field(i).name for i in range(ex.type.num_fields)]
        out = {c: batch.column(c) for c in (keep or [])}
        for name, typ in fields.items():
            col = flat[names.index(name)]
            out[name] = pc.cast(col, types[typ])
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow")
