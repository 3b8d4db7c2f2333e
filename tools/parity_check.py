import sys, time, duckdb, numpy as np, pandas as pd
sys.path.insert(0, "/root/repo")

import ray
ray.init(address="local", num_cpus=int(__import__("os").environ.get("PAR_CPUS", "16")), include_dashboard=False)
import __ray_entry__ as em
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"): df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object: df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer): df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.floating): df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)

def topd(res):
    import pyarrow as pa
    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
        if df.shape == (0, 0):
            # ray to_pandas drops the schema on fully-empty datasets;
            # rebuild the typed empty frame from the dataset schema
            try:
                df = res.schema().base_schema.empty_table().to_pandas()
            except Exception:
                pass
        return df
    if isinstance(res, pa.Table): return res.to_pandas()
    return res

only = __import__("os").environ.get("PAR_ONLY")
names = sorted(em.oracle_sql()) if not only else \
    [n for n in sorted(em.oracle_sql()) if n in only.split(",")]
fails = 0
for name in names:
    t0 = time.time()
    try:
        r = canon(topd(em.queries()[name](SF)))
        o = canon(con.execute(em.oracle_sql()[name]).fetch_df())
        ok = list(r.columns)==list(o.columns) and len(r)==len(o)
        if ok:
            try: pd.testing.assert_frame_equal(r, o, check_exact=True); status="MATCH"
            except AssertionError as e: status=f"VALUE-MISMATCH {str(e)[:120]}"; fails+=1
        else:
            status=f"SHAPE {r.shape} vs {o.shape} cols {list(r.columns)} vs {list(o.columns)}"; fails+=1
    except Exception as e:
        status = f"ERROR {type(e).__name__}: {str(e)[:150]}"; fails += 1
    print(f"{name:24s} {time.time()-t0:6.1f}s  {status}")
print("FAILS:", fails)
ray.shutdown()
