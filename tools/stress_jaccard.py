"""Near-dup pipeline stress at 10x the sf0.1 document count: the
distributed jaccard/minhash paths must hold their shape when the corpus
no longer fits a driver dataframe (the r1 versions materialized it
twice).  Run: python tools/stress_jaccard.py [n_docs]."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402
import ray  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
ray.init(address="local", num_cpus=CPUS, include_dashboard=False)

from bqf_ray.pipelines.dedup import (jaccard_dup_pairs,  # noqa: E402
                                     minhash_lsh_pairs)
from bqf_ray.sources.pages import pages_dataset  # noqa: E402

cache = f"/tmp/bqf_bench/docs_{N}"
if not os.path.exists(os.path.join(cache, "_DONE")):
    os.makedirs(cache, exist_ok=True)
    ds = pages_dataset(N, seed=7, parallelism=CPUS)

    def to_docs(batch):
        import pyarrow as pa
        from bqf_ray.functions.hashing import xxhash64_array
        ids = (xxhash64_array(batch.column("url"))
               >> np.uint64(1)).astype(np.int64)   # unique per url
        return pa.table({"doc_id": pa.array(ids),
                         "text": batch.column("text")})

    ds.map_batches(to_docs, batch_format="pyarrow").write_parquet(cache)
    open(os.path.join(cache, "_DONE"), "w").write(str(N))

from tools.canary import print_canary  # noqa: E402

docs = ray.data.read_parquet(cache, columns=["doc_id", "text"])

print_canary()
t0 = time.time()
if os.environ.get("STRESS_SKIP_EXACT") != "1":
    nj = jaccard_dup_pairs(docs, threshold=0.8, s=3).count()
    t1 = time.time()
    print(f"jaccard  n={N} pairs={nj} sec={t1 - t0:.1f} "
          f"docs_per_sec={N / (t1 - t0):,.0f}")
    print_canary()
else:
    t1 = t0
nm = minhash_lsh_pairs(docs, threshold=0.8, s=3).count()
t2 = time.time()
print(f"minhash  n={N} pairs={nm} sec={t2 - t1:.1f} "
      f"docs_per_sec={N / (t2 - t1):,.0f}")
print_canary()
ray.shutdown()
