"""Mimic the driver's correctness gate: run every oracle-checked query from
__ray_entry__ at sf0.001 and compare against its DuckDB oracle —
row count + schema + order-insensitive exact values."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
        if df.shape == (0, 0):
            # ray to_pandas drops schema on fully-empty datasets
            try:
                df = res.schema().base_schema.empty_table().to_pandas()
            except Exception:
                pass
        return df
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLE_NAMES = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(ray_session, con, name):
    ray_res = _canon(_to_pandas(entrymod.queries()[name](SF_DIR)))
    sql_res = _canon(con.execute(entrymod.oracle_sql()[name]).fetch_df())
    assert list(ray_res.columns) == list(sql_res.columns), \
        f"schema mismatch: {list(ray_res.columns)} vs {list(sql_res.columns)}"
    assert len(ray_res) == len(sql_res), \
        f"row count {len(ray_res)} vs {len(sql_res)}"
    pd.testing.assert_frame_equal(ray_res, sql_res, check_exact=True)


WEAK_NAMES = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", WEAK_NAMES)
def test_weak_queries_run(ray_session, name):
    df = _to_pandas(entrymod.queries()[name](SF_DIR))
    assert df is not None and len(df.columns) > 0


def test_entry_smoke(ray_session):
    df = _to_pandas(entrymod.entry())
    assert len(df) > 0
